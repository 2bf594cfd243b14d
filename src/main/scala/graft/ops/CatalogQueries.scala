package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.catalog.GraftCatalog

/** Queries routed through the GraftCatalog DSv2 path, so the
  * catalog→Catalyst→vectorized-parquet pipeline (SURVEY.md §3.1's
  * Spark-native CreateTable/LoadTable lifecycle) is exercised inside the
  * driver's DuckDB correctness gate, not only in unit tests. */
object CatalogQueries {

  private val warmed = new graft.SessionMemo[Unit]

  /** One-time per (session, sfDir): register the catalog, CREATE the two
    * tables, INSERT-commit the testdata. Split out of the query body so
    * the bench times the DSv2 SCAN, not namespace/table DDL + two commits
    * + a temp-dir mkdir (Bench calls this during warmup). */
  def ensureWarehouse(s: SparkSession, dir: String): Unit =
    warmed.getOrBuild(s, dir) {
      val wh = java.nio.file.Files.createTempDirectory("graft-wh-q13").toString
      s.conf.set("spark.sql.catalog.graft_q13", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.graft_q13.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_q13.tpch")
      s.sql("DROP TABLE IF EXISTS graft_q13.tpch.nation")
      s.sql("DROP TABLE IF EXISTS graft_q13.tpch.region")
      s.sql("CREATE TABLE graft_q13.tpch.nation (n_nationkey INT, n_name STRING, n_regionkey INT)")
      s.sql("CREATE TABLE graft_q13.tpch.region (r_regionkey INT, r_name STRING)")
      Tables.nation(s, dir).writeTo("graft_q13.tpch.nation").append()
      Tables.region(s, dir).writeTo("graft_q13.tpch.region").append()
    }

  /** Answers a join query through `spark.table("graft...")` DSv2 scans
    * (warehouse setup memoized in [[ensureWarehouse]]). */
  def q13CatalogScan(s: SparkSession, dir: String): DataFrame = {
    ensureWarehouse(s, dir)
    s.table("graft_q13.tpch.nation")
      .join(broadcast(s.table("graft_q13.tpch.region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_nations"),
        min(col("n_name")).as("first_nation"))
      .orderBy(col("r_name"))
  }

  val q13Sql: String =
    """SELECT r_name, COUNT(*) AS n_nations, MIN(n_name) AS first_nation
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** The MICRO_BATCH_READ streaming source inside the correctness gate:
    * `readStream.table` tails the catalog table (the whole existing
    * table arrives as the first version-delta batch), a stateful agg
    * folds it, and the result must hash-match the batch oracle — proving
    * the stream's file-delta planning loses and duplicates nothing. */
  def q83StreamCatalogSource(s: SparkSession, dir: String): DataFrame = {
    ensureWarehouse(s, dir)
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, math.min(prev.toInt, 8).toString)
    try {
      val qname = "q83_" + java.util.UUID.randomUUID().toString.take(8)
      val agg = s.readStream.table("graft_q13.tpch.nation")
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("n"), min(col("n_name")).as("first_nation"))
      val q = agg.writeStream.outputMode("complete")
        .format("memory").queryName(qname).start()
      try q.processAllAvailable() finally q.stop()
      s.table(qname).orderBy(col("n_regionkey"))
    } finally s.conf.set(key, prev)
  }

  val q83Sql: String =
    """SELECT n_regionkey, COUNT(*) AS n, MIN(n_name) AS first_nation
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  /** One-time per (session, sfDir): a second warehouse whose orders and
    * lineitem are CO-PARTITIONED — both `bucket(8, orderkey)` — so the
    * storage-partitioned-join query can prove its plan. Setup is DDL +
    * two bucketed write commits; memoized so the bench times the JOIN. */
  def ensureSpjWarehouse(s: SparkSession, dir: String): Unit =
    warmed.getOrBuild(s, "spj:" + dir) {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh-q89").toString
    s.conf.set("spark.sql.catalog.graft_q89", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_q89.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_q89.tpch")
    s.sql("DROP TABLE IF EXISTS graft_q89.tpch.orders")
    s.sql("DROP TABLE IF EXISTS graft_q89.tpch.lineitem")
    s.sql("""CREATE TABLE graft_q89.tpch.orders
      (o_orderkey BIGINT, o_totalprice DOUBLE)
      PARTITIONED BY (bucket(8, o_orderkey))""")
    s.sql("""CREATE TABLE graft_q89.tpch.lineitem
      (l_orderkey BIGINT, l_extendedprice DOUBLE)
      PARTITIONED BY (bucket(8, l_orderkey))""")
    Tables.orders(s, dir).select("o_orderkey", "o_totalprice")
      .writeTo("graft_q89.tpch.orders").append()
    Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice")
      .writeTo("graft_q89.tpch.lineitem").append()
  }

  def ensureSortedSpjWarehouse(s: SparkSession, dir: String): Unit =
    warmed.getOrBuild(s, "spjsort:" + dir) {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh-q102").toString
    s.conf.set("spark.sql.catalog.graft_q102", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_q102.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_q102.tpch")
    s.sql("DROP TABLE IF EXISTS graft_q102.tpch.orders")
    s.sql("DROP TABLE IF EXISTS graft_q102.tpch.lineitem")
    // declared sort order + ONE hash-distributed append = one
    // SORTED, stamp-proven file per bucket
    s.sql("""CREATE TABLE graft_q102.tpch.orders
      (o_orderkey BIGINT, o_totalprice DOUBLE)
      PARTITIONED BY (bucket(8, o_orderkey))
      TBLPROPERTIES ('write.sort-order' = 'o_orderkey asc')""")
    s.sql("""CREATE TABLE graft_q102.tpch.lineitem
      (l_orderkey BIGINT, l_extendedprice DOUBLE)
      PARTITIONED BY (bucket(8, l_orderkey))
      TBLPROPERTIES ('write.sort-order' = 'l_orderkey asc')""")
    Tables.orders(s, dir).select("o_orderkey", "o_totalprice")
      .writeTo("graft_q102.tpch.orders").append()
    Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice")
      .writeTo("graft_q102.tpch.lineitem").append()
  }

  /** The sorted refinement of q89: both sides ALSO declare
    * `write.sort-order` on the join key, every bucket is one
    * stamp-proven sorted file, and the scans report the ordering
    * (SupportsReportOrdering) — so the merge join plans with ZERO
    * exchanges AND ZERO Sort nodes. At 100 TB that removes the last
    * per-task cost SPJ left: no re-sort of a terabyte-scale bucket
    * before merging. Enforced, not hoped for: the query refuses a plan
    * containing either an exchange or a sort. */
  def q102SortedSpj(s: SparkSession, dir: String): DataFrame = {
    ensureSortedSpjWarehouse(s, dir)
    val df = s.table("graft_q102.tpch.orders").hint("merge")
      .join(s.table("graft_q102.tpch.lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("l_extendedprice"), col("o_totalprice"))
      .orderBy(col("o_orderkey"), col("l_extendedprice"))
      .limit(100)
    val plan = df.queryExecution.executedPlan.toString
    val nEx = plan.linesIterator.count(_.contains("Exchange"))
    // "Sort [" matches SortExec nodes only (SortMergeJoin prints
    // "SortMergeJoin ["; TakeOrderedAndProject prints "orderBy=[")
    val nSort = plan.linesIterator.count(_.contains("Sort ["))
    require(nEx == 0 && nSort == 0,
      s"q102 expected a sort-free storage-partitioned merge join, found " +
        s"$nEx exchange(s) and $nSort sort(s):\n$plan")
    require(plan.contains("SortMergeJoin"),
      s"q102 expected a merge join:\n$plan")
    df
  }

  val q102Sql: String =
    """SELECT o_orderkey, l_extendedprice, o_totalprice
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |ORDER BY o_orderkey, l_extendedprice LIMIT 100""".stripMargin

  /** Storage-partitioned join through the correctness gate: both sides
    * laid out by the same bucket function, the scan reports
    * KeyGroupedPartitioning (KeyGroupedRead.scala), and the merge join
    * PLUS its orderkey-keyed aggregation run with ZERO exchanges — the
    * plan shape that makes a 100 TB fact-fact join feasible. The shape
    * is enforced, not hoped for: the query refuses to return a plan
    * with any shuffle in it. */
  def q89SpjJoin(s: SparkSession, dir: String): DataFrame = {
    ensureSpjWarehouse(s, dir)
    val df = s.table("graft_q89.tpch.orders").hint("merge")
      .join(s.table("graft_q89.tpch.lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(Exact.sumMoney(col("l_extendedprice")).as("rev"),
        max(col("o_totalprice")).as("tp"))
      .orderBy(col("rev").desc, col("o_orderkey"))
      .limit(10)
    val plan = df.queryExecution.executedPlan.toString
    val nEx = plan.linesIterator.count(_.contains("Exchange"))
    require(nEx == 0,
      s"q89 expected a shuffle-free storage-partitioned join, found $nEx exchange(s):\n$plan")
    df
  }

  val q89Sql: String =
    s"""SELECT o_orderkey, ${Exact.sqlSumMoney("l_extendedprice")} AS rev,
      |  MAX(o_totalprice) AS tp
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderkey ORDER BY rev DESC, o_orderkey LIMIT 10""".stripMargin

  /** Row-level DML inside the correctness gate: a catalog table takes a
    * copy-on-write DELETE, UPDATE, and MERGE, and the final contents
    * must hash-match the oracle's relational recomputation of the same
    * three mutations. Rebuilt from scratch each call (idempotent across
    * the warmup+timed bench runs). */
  def q84RowLevelDml(s: SparkSession, dir: String): DataFrame = {
    ensureWarehouse(s, dir)
    s.sql("DROP TABLE IF EXISTS graft_q13.tpch.nation_dml")
    s.sql("""CREATE TABLE graft_q13.tpch.nation_dml
      (n_nationkey INT, n_name STRING, n_regionkey INT)""")
    Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .writeTo("graft_q13.tpch.nation_dml").append()
    s.sql("DELETE FROM graft_q13.tpch.nation_dml WHERE n_regionkey = 2")
    s.sql("""UPDATE graft_q13.tpch.nation_dml
      SET n_name = concat(n_name, '!') WHERE n_nationkey < 5""")
    s.sql("""MERGE INTO graft_q13.tpch.nation_dml t
      USING (SELECT * FROM VALUES (0, 'ZERO'), (99, 'NEWLAND') AS s(k, nm)) s
      ON t.n_nationkey = s.k
      WHEN MATCHED THEN UPDATE SET t.n_name = s.nm
      WHEN NOT MATCHED THEN INSERT (n_nationkey, n_name, n_regionkey)
        VALUES (s.k, s.nm, -1)""")
    s.table("graft_q13.tpch.nation_dml").orderBy(col("n_nationkey"))
  }

  val q84Sql: String =
    """WITH afterdel AS (
      |  SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey <> 2),
      |afterupd AS (
      |  SELECT n_nationkey,
      |    CASE WHEN n_nationkey < 5 THEN n_name || '!' ELSE n_name END AS n_name,
      |    n_regionkey FROM afterdel),
      |src(k, nm) AS (SELECT * FROM (VALUES (0, 'ZERO'), (99, 'NEWLAND'))),
      |merged AS (
      |  SELECT a.n_nationkey, COALESCE(s.nm, a.n_name) AS n_name, a.n_regionkey
      |  FROM afterupd a LEFT JOIN src s ON a.n_nationkey = s.k
      |  UNION ALL
      |  SELECT k, nm, -1 FROM src
      |  WHERE k NOT IN (SELECT n_nationkey FROM afterupd))
      |SELECT * FROM merged ORDER BY n_nationkey""".stripMargin

  /** Partition-spec evolution inside the correctness gate: half the
    * rows land BEFORE the table is partitioned, half after, and a
    * partition-filtered read over the mixed layout must hash-match the
    * oracle — proving old-layout files are never wrongly pruned and
    * new-layout files prune correctly. Rebuilt each call (idempotent
    * across the warmup+timed bench runs). */
  def q85PartitionEvolution(s: SparkSession, dir: String): DataFrame = {
    ensureWarehouse(s, dir)
    s.sql("DROP TABLE IF EXISTS graft_q13.tpch.nation_evo")
    s.sql("""CREATE TABLE graft_q13.tpch.nation_evo
      (n_nationkey INT, n_name STRING, n_regionkey INT)""")
    val nation = Tables.nation(s, dir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    nation.filter(col("n_regionkey") < 2)
      .writeTo("graft_q13.tpch.nation_evo").append()      // old layout
    val cat = s.sessionState.catalogManager.catalog("graft_q13")
      .asInstanceOf[GraftCatalog]
    cat.evolvePartitionSpec(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("tpch"), "nation_evo"),
      Array(org.apache.spark.sql.connector.expressions.Expressions
        .identity("n_regionkey")))
    nation.filter(col("n_regionkey") >= 2)
      .writeTo("graft_q13.tpch.nation_evo").append()      // new layout
    s.table("graft_q13.tpch.nation_evo")
      .filter(col("n_regionkey").isin(1, 3))
      .orderBy(col("n_nationkey"))
  }

  val q85Sql: String =
    """SELECT n_nationkey, n_name, n_regionkey FROM nation
      |WHERE n_regionkey IN (1, 3) ORDER BY n_nationkey""".stripMargin

  /** q84's exact DELETE/UPDATE/MERGE sequence on a MERGE-ON-READ table:
    * the mutations commit as equality-delete files + new row versions
    * (SupportsDelta — kilobytes of keys, zero data files rewritten;
    * [[graft.catalog.GraftDeltaOperation]]), and the final read
    * reconstructs the exact state the copy-on-write path materializes —
    * both gated by the SAME DuckDB oracle, so the two DML modes are
    * provably indistinguishable to a reader. */
  def q86MorDml(s: SparkSession, dir: String): DataFrame = {
    ensureWarehouse(s, dir)
    s.sql("DROP TABLE IF EXISTS graft_q13.tpch.nation_mor")
    s.sql("""CREATE TABLE graft_q13.tpch.nation_mor
      (n_nationkey INT NOT NULL, n_name STRING, n_regionkey INT)
      TBLPROPERTIES ('identifier-fields' = 'n_nationkey',
        'write.delete.mode' = 'merge-on-read',
        'write.update.mode' = 'merge-on-read',
        'write.merge.mode' = 'merge-on-read')""")
    Tables.nation(s, dir).select(
        coalesce(col("n_nationkey"), lit(-1)).as("n_nationkey"),
        col("n_name"), col("n_regionkey"))
      .writeTo("graft_q13.tpch.nation_mor").append()
    s.sql("DELETE FROM graft_q13.tpch.nation_mor WHERE n_regionkey = 2")
    s.sql("""UPDATE graft_q13.tpch.nation_mor
      SET n_name = concat(n_name, '!') WHERE n_nationkey < 5""")
    s.sql("""MERGE INTO graft_q13.tpch.nation_mor t
      USING (SELECT * FROM VALUES (0, 'ZERO'), (99, 'NEWLAND') AS s(k, nm)) s
      ON t.n_nationkey = s.k
      WHEN MATCHED THEN UPDATE SET t.n_name = s.nm
      WHEN NOT MATCHED THEN INSERT (n_nationkey, n_name, n_regionkey)
        VALUES (s.k, s.nm, -1)""")
    s.table("graft_q13.tpch.nation_mor").orderBy(col("n_nationkey"))
  }

  /** Row-level CDC through the oracle gate: a merge-on-read table takes
    * an append, a MoR DELETE, and a MoR UPDATE; the changes feed
    * ([[graft.catalog.Changes]]) must reproduce every insert, the
    * deleted rows, and the update as preimage/postimage pairs —
    * hash-checked against the oracle's recomputation of the same three
    * steps from the source table. `_change_seq` is the commit offset
    * from the table's creation version, so the oracle is independent of
    * absolute metadata version numbers. */
  def q90ChangesFeed(s: SparkSession, dir: String): DataFrame = {
    ensureWarehouse(s, dir)
    s.sql("DROP TABLE IF EXISTS graft_q13.tpch.nation_cdc")
    s.sql("""CREATE TABLE graft_q13.tpch.nation_cdc
      (n_nationkey INT NOT NULL, n_name STRING, n_regionkey INT)
      TBLPROPERTIES ('identifier-fields' = 'n_nationkey',
        'write.delete.mode' = 'merge-on-read',
        'write.update.mode' = 'merge-on-read',
        'write.merge.mode' = 'merge-on-read')""")
    val cat = s.sessionState.catalogManager.catalog("graft_q13")
      .asInstanceOf[GraftCatalog]
    val v0 = cat.metadataStore.currentVersion(Seq("tpch"), "nation_cdc")
    Tables.nation(s, dir).select(
        coalesce(col("n_nationkey"), lit(-1)).as("n_nationkey"),
        col("n_name"), col("n_regionkey"))
      .writeTo("graft_q13.tpch.nation_cdc").append()
    s.sql("DELETE FROM graft_q13.tpch.nation_cdc WHERE n_regionkey = 2")
    s.sql("""UPDATE graft_q13.tpch.nation_cdc
      SET n_name = concat(n_name, '?') WHERE n_nationkey < 3""")
    graft.catalog.Changes.between(s, "graft_q13.tpch.nation_cdc", v0)
      .select(col("n_nationkey"), col("n_name"), col("_change_type"),
        (col("_commit_version") - lit(v0)).cast("int").as("_change_seq"))
      .orderBy(col("_change_seq"), col("_change_type"), col("n_nationkey"))
  }

  val q90Sql: String =
    """SELECT * FROM (
      |  SELECT n_nationkey, n_name, 'insert' AS _change_type, 1 AS _change_seq
      |  FROM nation
      |  UNION ALL
      |  SELECT n_nationkey, n_name, 'delete', 2 FROM nation WHERE n_regionkey = 2
      |  UNION ALL
      |  SELECT n_nationkey, n_name, 'update_preimage', 3 FROM nation
      |  WHERE n_nationkey < 3 AND n_regionkey <> 2
      |  UNION ALL
      |  SELECT n_nationkey, n_name || '?', 'update_postimage', 3 FROM nation
      |  WHERE n_nationkey < 3 AND n_regionkey <> 2
      |) ORDER BY _change_seq, _change_type, n_nationkey""".stripMargin

  /** Write-audit-publish through the oracle gate: half of nation lands
    * on main, half is STAGED on an `audit` branch (main provably never
    * moves), the staged state is audited by reading
    * `VERSION AS OF 'audit'`, and only then fast-forward-published. The
    * final read must hash-match plain nation — proving the
    * branch-stage-publish loop loses and duplicates nothing. */
  def q87Wap(s: SparkSession, dir: String): DataFrame = {
    ensureWarehouse(s, dir)
    s.sql("DROP TABLE IF EXISTS graft_q13.tpch.nation_wap")
    s.sql("""CREATE TABLE graft_q13.tpch.nation_wap
      (n_nationkey INT, n_name STRING, n_regionkey INT)""")
    val nation = Tables.nation(s, dir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    nation.filter(col("n_regionkey") < 2)
      .writeTo("graft_q13.tpch.nation_wap").append()
    val cat = s.sessionState.catalogManager.catalog("graft_q13")
      .asInstanceOf[GraftCatalog]
    val id = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("tpch"), "nation_wap")
    cat.createBranch(id, "audit")
    nation.filter(col("n_regionkey") >= 2)
      .writeTo("graft_q13.tpch.nation_wap").option("branch", "audit").append()
    // AUDIT: staged branch must carry the full row set while main still
    // holds only the first half — else we refuse to publish
    val staged = s.sql(
      "SELECT count(*) FROM graft_q13.tpch.nation_wap VERSION AS OF 'audit'")
      .head().getLong(0)
    val mainRows = s.table("graft_q13.tpch.nation_wap").count()
    require(staged == nation.count() && mainRows < staged,
      s"audit failed: staged=$staged main=$mainRows")
    cat.fastForward(id, "audit")
    cat.dropRef(id, "audit")
    s.table("graft_q13.tpch.nation_wap").orderBy(col("n_nationkey"))
  }

  val q87Sql: String =
    """SELECT n_nationkey, n_name, n_regionkey FROM nation
      |ORDER BY n_nationkey""".stripMargin

  /** Temporal storage-partitioned aggregation through the oracle gate:
    * a `days(o_orderdate)`-partitioned table reports the temporal V2
    * transform ([[graft.catalog.TemporalFunctions]]), so the
    * date-keyed revenue rollup plans ZERO exchanges (asserted,
    * q89-style) — the 100 TB time-series shape where the daily rollup
    * of a day-laid-out events table costs no shuffle at all. */
  /** One-time setup for q95 (Bench warms it so the measured query times
    * the shuffle-free SCAN, not a partitioned write + commit). */
  def ensureTemporalWarehouse(s: SparkSession, dir: String): Unit = {
    ensureWarehouse(s, dir)
    if (!s.catalog.tableExists("graft_q13.tpch.orders_bymonth")) {
      // month granularity: ~84 partition-key groups over TPC-H's seven
      // years — same-date rows are co-located, planning stays cheap
      s.sql("""CREATE TABLE graft_q13.tpch.orders_bymonth
        (o_orderdate DATE, o_totalprice DOUBLE)
        PARTITIONED BY (months(o_orderdate))""")
      Tables.orders(s, dir).select(col("o_orderdate"), col("o_totalprice"))
        .writeTo("graft_q13.tpch.orders_bymonth").append()
    }
  }

  def q95TemporalSpj(s: SparkSession, dir: String): DataFrame = {
    ensureTemporalWarehouse(s, dir)
    // no ORDER BY: the gate compares sorted rows, and a global sort
    // would plan its own (legitimate) range exchange
    val df = s.table("graft_q13.tpch.orders_bymonth")
      .groupBy(col("o_orderdate"))
      .agg(count(lit(1)).as("n"), Exact.sumMoney(col("o_totalprice")).as("rev"))
      // DATE output breaks the driver compare — render as timestamp_ntz
      .select(col("o_orderdate").cast("timestamp_ntz").as("od"),
        col("n"), col("rev"))
    val plan = df.queryExecution.executedPlan.toString
    val nEx = plan.linesIterator.count(_.contains("Exchange"))
    require(nEx == 0,
      s"q95 expected a shuffle-free date-keyed rollup, found $nEx exchange(s):\n$plan")
    df
  }

  val q95Sql: String =
    s"""SELECT CAST(o_orderdate AS TIMESTAMP) AS od, COUNT(*) AS n,
      |  ${Exact.sqlSumMoney("o_totalprice")} AS rev
      |FROM orders GROUP BY o_orderdate""".stripMargin

  /** Keyless merge-on-read DELETE through the oracle gate: a table with
    * NO identifier fields (so the equality-delete delta path has no row
    * id) takes two DELETEs; both land as POSITION-delete files —
    * (file, row) marks written by `GraftTable.positionDeleteWhere` —
    * with zero data files rewritten (asserted below, q89-style), and
    * the read through the whole-file counting readers reconstructs
    * exactly the oracle's surviving rows. */
  def q94PositionDelete(s: SparkSession, dir: String): DataFrame = {
    ensureWarehouse(s, dir)
    s.sql("DROP TABLE IF EXISTS graft_q13.tpch.nation_posd")
    s.sql("""CREATE TABLE graft_q13.tpch.nation_posd
      (n_nationkey INT, n_name STRING, n_regionkey INT)
      TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')""")
    Tables.nation(s, dir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .writeTo("graft_q13.tpch.nation_posd").append()
    val cat = s.sessionState.catalogManager.catalog("graft_q13")
      .asInstanceOf[GraftCatalog]
    val before = cat.metadataStore.load(Seq("tpch"), "nation_posd")._1
      .currentSnapshot.get.files
    s.sql("DELETE FROM graft_q13.tpch.nation_posd WHERE n_regionkey = 2")
    s.sql("DELETE FROM graft_q13.tpch.nation_posd WHERE n_nationkey >= 20")
    val snap = cat.metadataStore.load(Seq("tpch"), "nation_posd")._1
      .currentSnapshot.get
    require(snap.files == before,
      "position DELETE must not rewrite data files")
    require(snap.deleteFiles.nonEmpty &&
      snap.deleteFiles.forall(_.keyFieldIds.isEmpty),
      "expected position-delete files")
    s.table("graft_q13.tpch.nation_posd").orderBy(col("n_nationkey"))
  }

  val q94Sql: String =
    """SELECT n_nationkey, n_name, n_regionkey FROM nation
      |WHERE n_regionkey <> 2 AND n_nationkey < 20
      |ORDER BY n_nationkey""".stripMargin

  /** Keyless merge-on-read UPDATE + MERGE through the oracle gate: with
    * no identifier fields the row id is the physical (file, pos)
    * coordinate ([[graft.catalog.GraftPositionDeltaOperation]]) — both
    * commands commit position-delete marks plus new row versions in one
    * RowDelta, rewriting zero existing data files (asserted below), and
    * the merge-on-read scan reconstructs exactly the oracle's view of
    * the same edit sequence. */
  def q96KeylessDml(s: SparkSession, dir: String): DataFrame = {
    ensureWarehouse(s, dir)
    s.sql("DROP TABLE IF EXISTS graft_q13.tpch.nation_posu")
    s.sql("""CREATE TABLE graft_q13.tpch.nation_posu
      (n_nationkey INT, n_name STRING, n_regionkey INT)
      TBLPROPERTIES (
        'write.delete.mode' = 'merge-on-read',
        'write.update.mode' = 'merge-on-read',
        'write.merge.mode' = 'merge-on-read')""")
    Tables.nation(s, dir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .writeTo("graft_q13.tpch.nation_posu").append()
    val cat = s.sessionState.catalogManager.catalog("graft_q13")
      .asInstanceOf[GraftCatalog]
    val before = cat.metadataStore.load(Seq("tpch"), "nation_posu")._1
      .currentSnapshot.get.files.toSet
    s.sql("""UPDATE graft_q13.tpch.nation_posu
      SET n_regionkey = n_regionkey + 10 WHERE n_nationkey < 5""")
    s.sql("""MERGE INTO graft_q13.tpch.nation_posu t
      USING (
        SELECT n_nationkey, concat(n_name, '_M') AS n_name, n_regionkey
        FROM graft_q13.tpch.nation
        WHERE n_nationkey BETWEEN 10 AND 12
        UNION ALL
        SELECT n_nationkey + 100, n_name, n_regionkey
        FROM graft_q13.tpch.nation WHERE n_nationkey < 2) s
      ON t.n_nationkey = s.n_nationkey
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val snap = cat.metadataStore.load(Seq("tpch"), "nation_posu")._1
      .currentSnapshot.get
    require(before.subsetOf(snap.files.toSet),
      "position-delta DML must not rewrite existing data files")
    require(snap.operation == "delta" && snap.deleteFiles.nonEmpty &&
      snap.deleteFiles.forall(_.keyFieldIds.isEmpty),
      "expected position-flavored delta commits")
    s.table("graft_q13.tpch.nation_posu").orderBy(col("n_nationkey"))
  }

  val q96Sql: String =
    """WITH updated AS (
      |  SELECT n_nationkey,
      |         CASE WHEN n_nationkey BETWEEN 10 AND 12
      |              THEN n_name || '_M' ELSE n_name END AS n_name,
      |         CASE WHEN n_nationkey < 5
      |              THEN n_regionkey + 10 ELSE n_regionkey END AS n_regionkey
      |  FROM nation)
      |SELECT * FROM updated
      |UNION ALL
      |SELECT n_nationkey + 100 AS n_nationkey, n_name, n_regionkey
      |FROM nation WHERE n_nationkey < 2
      |ORDER BY n_nationkey""".stripMargin

  /** Zero-copy onboarding through the oracle gate: the supplier table
    * is materialized as a FOREIGN parquet dir (plain write — no field
    * ids inside), registered into a fresh catalog table with
    * `CALL graft.system.add_files` (hard links + ONE AppendFiles
    * commit, no data rewrite), and aggregated through the DSv2 scan —
    * proving id-less imported files serve exact values by name. The
    * aggregates are count/min/max only: order-independent, so the
    * comparison is exact without the cents pattern. */
  def q99AddFiles(s: SparkSession, dir: String): DataFrame = {
    ensureWarehouse(s, dir) // registers the graft_q13 catalog
    s.sql("DROP TABLE IF EXISTS graft_q13.tpch.supplier_imp")
    val sup = Tables.supplier(s, dir)
    s.sql(s"CREATE TABLE graft_q13.tpch.supplier_imp (${sup.schema.toDDL})")
    val src = java.nio.file.Files.createTempDirectory("graft-q99-src").toString
    sup.write.mode("overwrite").parquet(src)
    val res = s.sql(
      s"CALL graft_q13.system.add_files('tpch.supplier_imp', '$src')").collect()
    require(res(0).getInt(1) > 0, "add_files registered no files")
    s.table("graft_q13.tpch.supplier_imp")
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        min(col("s_acctbal")).as("min_bal"),
        max(col("s_acctbal")).as("max_bal"),
        min(col("s_name")).as("first_name"))
      .orderBy(col("s_nationkey"))
  }

  val q99Sql: String =
    """SELECT s_nationkey, count(*) AS n_suppliers,
      |       min(s_acctbal) AS min_bal, max(s_acctbal) AS max_bal,
      |       min(s_name) AS first_name
      |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  /** Partitioned zero-copy onboarding: the supplier table is written as
    * a HIVE-layout lake (`partitionBy` — the partition column lives in
    * the directories, NOT in the files), registered with `add_files`
    * into an identity-partitioned catalog table, and queried WITH a
    * partition-column filter and grouping — which only answers right if
    * the identity overlay serves the dir values ([[graft.catalog
    * .ImportOverlay]]): a null-filled column would group everything
    * under null and the filter would drop every row. */
  def q103AddFilesPartitioned(s: SparkSession, dir: String): DataFrame = {
    ensureWarehouse(s, dir)
    s.sql("DROP TABLE IF EXISTS graft_q13.tpch.supplier_part")
    val sup = Tables.supplier(s, dir)
    s.sql(s"CREATE TABLE graft_q13.tpch.supplier_part (${sup.schema.toDDL}) " +
      "PARTITIONED BY (s_nationkey)")
    val src = java.nio.file.Files.createTempDirectory("graft-q103-src").toString
    sup.write.partitionBy("s_nationkey").mode("overwrite").parquet(src)
    val res = s.sql(
      s"CALL graft_q13.system.add_files('tpch.supplier_part', '$src')").collect()
    require(res(0).getInt(1) > 0, "add_files registered no files")
    s.table("graft_q13.tpch.supplier_part")
      .filter(col("s_nationkey") < 10)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        min(col("s_acctbal")).as("min_bal"),
        max(col("s_acctbal")).as("max_bal"),
        min(col("s_name")).as("first_name"))
      .orderBy(col("s_nationkey"))
  }

  val q103Sql: String =
    """SELECT s_nationkey, count(*) AS n_suppliers,
      |       min(s_acctbal) AS min_bal, max(s_acctbal) AS max_bal,
      |       min(s_name) AS first_name
      |FROM supplier WHERE s_nationkey < 10
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  /** q105: zero-copy onboarding of a Spark `bucketBy` lake. The
    * table's bucket(4, s_suppkey) spec is witnessed by the bucketBy
    * file names (part-..._NNNNN...) and PROVEN by add_files' per-row
    * pmod(murmur3, n) verification; files register under `__part_`
    * bucket dirs so SPJ and bucket pruning treat them natively. The
    * filtered aggregation reads the data columns straight from the
    * imported files — a lost/duplicated file or a mis-bucketed
    * registration fails the hash. */
  def q105AddFilesBucketed(s: SparkSession, dir: String): DataFrame = {
    ensureWarehouse(s, dir)
    s.sql("DROP TABLE IF EXISTS graft_q13.tpch.supplier_bk")
    val sup = Tables.supplier(s, dir)
    s.sql(s"CREATE TABLE graft_q13.tpch.supplier_bk (${sup.schema.toDDL}) " +
      "PARTITIONED BY (bucket(4, s_suppkey))")
    val src = java.nio.file.Files.createTempDirectory("graft-q105-src")
      .toString + "/t"
    sup.write.bucketBy(4, "s_suppkey").option("path", src)
      .mode("overwrite").saveAsTable("graft_q105_src_tmp")
    val res = s.sql(
      s"CALL graft_q13.system.add_files('tpch.supplier_bk', '$src')").collect()
    require(res(0).getInt(1) > 0, "add_files registered no files")
    s.sql("DROP TABLE IF EXISTS graft_q105_src_tmp") // external: files stay
    s.table("graft_q13.tpch.supplier_bk")
      .filter(col("s_suppkey") % 7 === 0)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n"), sum(col("s_suppkey")).as("key_sum"),
        min(col("s_name")).as("first_name"))
      .orderBy(col("s_nationkey"))
  }

  val q105Sql: String =
    """SELECT s_nationkey, count(*) AS n,
      |       CAST(sum(s_suppkey) AS BIGINT) AS key_sum,
      |       min(s_name) AS first_name
      |FROM supplier WHERE s_suppkey % 7 = 0
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  /** q109: zero-copy onboarding of a hive TEMPORAL lake. The table's
    * month(o_orderdate) spec is witnessed by the source's nested
    * year=/month= dirs and PROVEN by add_files' per-row native-dirExpr
    * rendering job; files register under `__part_` month dirs (the
    * data column stays in the footers — no overlay, reads vectorized)
    * so replay pruning and temporal SPJ treat them natively. The
    * monthly rollup reads the imported files through a month-range
    * filter — a lost/duplicated file or a mis-registered month fails
    * the hash. */
  // the q109 source lake is a FIXTURE (the hive layout being onboarded),
  // not part of the measured operation — memoized per (session, sf) like
  // the warehouse DDL, so the bench times the import + rollup, not a
  // repeated partitionBy write of the same 80-file lake
  private val q109Lakes = new graft.SessionMemo[String]

  def q109AddFilesTemporal(s: SparkSession, dir: String): DataFrame = {
    ensureWarehouse(s, dir)
    s.sql("DROP TABLE IF EXISTS graft_q13.tpch.orders_tm")
    val ord = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
    s.sql(s"CREATE TABLE graft_q13.tpch.orders_tm (${ord.schema.toDDL}) " +
      "PARTITIONED BY (months(o_orderdate))")
    val src = q109Lakes.getOrBuild(s, dir) {
      val p = java.nio.file.Files.createTempDirectory("graft-q109-src")
        .toString + "/t"
      ord.withColumn("year", year(col("o_orderdate")))
        .withColumn("month", month(col("o_orderdate")))
        .write.partitionBy("year", "month").mode("overwrite").parquet(p)
      p
    }
    val res = s.sql(
      s"CALL graft_q13.system.add_files('tpch.orders_tm', '$src')").collect()
    require(res(0).getInt(1) > 0, "add_files registered no files")
    s.table("graft_q13.tpch.orders_tm")
      .filter(col("o_orderdate") >= to_date(lit("1995-01-01")) &&
        col("o_orderdate") < to_date(lit("1996-01-01")))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("om"))
      .agg(count(lit(1)).as("n"), Exact.sumMoney(col("o_totalprice")).as("rev"))
      .orderBy(col("om"))
  }

  val q109Sql: String =
    s"""SELECT strftime(o_orderdate, '%Y-%m') AS om, COUNT(*) AS n,
      |  ${Exact.sqlSumMoney("o_totalprice")} AS rev
      |FROM orders
      |WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
      |GROUP BY 1 ORDER BY om""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q13_catalog_scan" -> q13CatalogScan _,
    "q109_add_files_temporal" -> q109AddFilesTemporal _,
    "q99_add_files" -> q99AddFiles _,
    "q103_add_files_partitioned" -> q103AddFilesPartitioned _,
    "q105_add_files_bucketed" -> q105AddFilesBucketed _,
    "q83_stream_catalog_source" -> q83StreamCatalogSource _,
    "q84_row_level_dml" -> q84RowLevelDml _,
    "q85_partition_evolution" -> q85PartitionEvolution _,
    "q86_mor_dml" -> q86MorDml _,
    "q87_wap" -> q87Wap _,
    "q89_spj_join" -> q89SpjJoin _,
    "q102_sorted_spj" -> q102SortedSpj _,
    "q90_changes_feed" -> q90ChangesFeed _,
    "q94_position_delete" -> q94PositionDelete _,
    "q95_temporal_spj" -> q95TemporalSpj _,
    "q96_keyless_dml" -> q96KeylessDml _)
  val oracle: Map[String, String] = Map(
    "q13_catalog_scan" -> q13Sql,
    "q109_add_files_temporal" -> q109Sql,
    "q99_add_files" -> q99Sql,
    "q105_add_files_bucketed" -> q105Sql,
    "q103_add_files_partitioned" -> q103Sql,
    "q83_stream_catalog_source" -> q83Sql,
    "q84_row_level_dml" -> q84Sql,
    "q85_partition_evolution" -> q85Sql,
    // same oracle as q84 on purpose: merge-on-read and copy-on-write
    // must produce byte-identical results
    "q86_mor_dml" -> q84Sql,
    "q87_wap" -> q87Sql,
    "q89_spj_join" -> q89Sql,
    "q102_sorted_spj" -> q102Sql,
    "q90_changes_feed" -> q90Sql,
    "q94_position_delete" -> q94Sql,
    "q95_temporal_spj" -> q95Sql,
    "q96_keyless_dml" -> q96Sql)
}
