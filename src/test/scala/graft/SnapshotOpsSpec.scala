package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Identifier
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.GraftCatalog

/** Snapshot-level pipeline operations: incremental (changes-since)
  * reads and rollback — the two table-maintenance verbs an append-heavy
  * 100 TB pipeline leans on daily. */
class SnapshotOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val wh = Files.createTempDirectory("graft-snap-wh").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.snap", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.snap.warehouse", wh)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def catalog: GraftCatalog =
    spark.sessionState.catalogManager.catalog("snap").asInstanceOf[GraftCatalog]

  test("from-version reads scan only the files added since that version") {
    spark.sql("CREATE NAMESPACE snap.inc")
    spark.sql("CREATE TABLE snap.inc.ev (id BIGINT)")            // v1
    spark.sql("INSERT INTO snap.inc.ev VALUES (1), (2)")          // v2
    spark.sql("INSERT INTO snap.inc.ev VALUES (3)")               // v3
    spark.sql("INSERT INTO snap.inc.ev VALUES (4), (5)")          // v4

    def since(v: Int): Seq[Long] =
      spark.read.option("from-version", v.toString).table("snap.inc.ev")
        .collect().map(_.getLong(0)).sorted.toSeq

    assert(since(2) == Seq(3L, 4L, 5L)) // everything after the first commit
    assert(since(3) == Seq(4L, 5L))
    assert(since(4) == Seq())           // caught up: the delta is empty
    assert(since(1) == Seq(1L, 2L, 3L, 4L, 5L)) // v1 = empty table
    // the plain read is unaffected
    assert(spark.table("snap.inc.ev").count() == 5)
  }

  test("DELETE on partition boundaries is a metadata-only snapshot commit") {
    spark.sql("CREATE NAMESPACE snap.del")
    spark.sql("""CREATE TABLE snap.del.ev (id BIGINT, cat STRING)
      PARTITIONED BY (cat)""")
    spark.sql("INSERT INTO snap.del.ev VALUES (1,'a'),(2,'b'),(3,'c')")
    spark.sql("INSERT INTO snap.del.ev VALUES (4,'b')")
    val filesBefore = catalog.metadataStore.load(Seq("del"), "ev")
      ._1.currentSnapshot.get.files.toSet

    spark.sql("DELETE FROM snap.del.ev WHERE cat = 'b'")
    assert(spark.table("snap.del.ev").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L))
    val (m, _) = catalog.metadataStore.load(Seq("del"), "ev")
    val filesAfter = m.currentSnapshot.get.files.toSet
    // metadata-only: the surviving files are the SAME physical files
    // (no rewrite), only the cat=b ones left the snapshot
    assert(filesAfter.subsetOf(filesBefore), "delete rewrote data files")
    assert(filesBefore.diff(filesAfter).forall(_.contains("__part_cat=b")))
    assert(m.currentSnapshot.get.summary.get("deleted-files").contains("2"))
    // history intact: the pre-delete state is still time-travelable
    assert(spark.sql("SELECT count(*) FROM snap.del.ev VERSION AS OF 3")
      .head.getLong(0) == 4L)

    // a non-partition predicate takes the copy-on-write path instead:
    // correct rows survive, and the commit is a "rewrite" (not metadata)
    spark.sql("DELETE FROM snap.del.ev WHERE id = 1")
    assert(spark.table("snap.del.ev").collect().map(_.getLong(0)).toSeq ==
      Seq(3L))
    assert(catalog.metadataStore.load(Seq("del"), "ev")
      ._1.currentSnapshot.get.operation == "rewrite")
  }

  test("$history and $files inspection tables serve the metadata document") {
    spark.sql("CREATE NAMESPACE snap.ins")
    spark.sql("CREATE TABLE snap.ins.t (id BIGINT, cat STRING) PARTITIONED BY (cat)")
    spark.sql("INSERT INTO snap.ins.t VALUES (1,'a'),(2,'b')")
    spark.sql("INSERT INTO snap.ins.t VALUES (3,'a')")

    val hist = spark.sql("SELECT * FROM snap.ins.`t$history` ORDER BY snapshot_id")
      .collect()
    assert(hist.length == 2)
    assert(hist.map(_.getString(2)).toSeq == Seq("append", "append"))
    assert(hist.map(_.getBoolean(4)).toSeq == Seq(false, true)) // is_current
    assert(hist.last.getInt(3) == 3, "current snapshot should hold 3 files")

    val files = spark.sql("SELECT * FROM snap.ins.`t$files`").collect()
    assert(files.length == 3)
    assert(files.forall(r => r.getAs[String]("content") == "data"))
    assert(files.forall(r => r.getAs[String]("partition").startsWith("cat=")))
    assert(files.forall(r => r.getAs[Int]("n_stat_cols") > 0),
      "manifest stats missing from $files")
    assert(files.forall(r => r.getAs[Long]("seq") > 0L))

    // plans stay driver-local — an inspection query must never launch
    // a distributed scan over data files
    val plan = spark.sql("SELECT * FROM snap.ins.`t$history`")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"), s"expected LocalTableScan:\n$plan")
  }

  test("partition overwrite replaces exactly the targeted partitions") {
    spark.sql("CREATE NAMESPACE snap.po")
    spark.sql("CREATE TABLE snap.po.ev (id BIGINT, cat STRING) PARTITIONED BY (cat)")
    spark.sql("INSERT INTO snap.po.ev VALUES (1,'a'),(2,'b'),(3,'c')")
    val untouched = catalog.metadataStore.load(Seq("po"), "ev")
      ._1.currentSnapshot.get.files.filterNot(_.contains("__part_cat=b")).toSet

    // static: INSERT OVERWRITE ... PARTITION (cat='b') replaces only b
    spark.sql("INSERT OVERWRITE snap.po.ev PARTITION (cat='b') VALUES (20)")
    val rows = spark.table("snap.po.ev").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1).toSeq
    assert(rows == Seq(1L -> "a", 3L -> "c", 20L -> "b"), s"got $rows")
    val (m1, _) = catalog.metadataStore.load(Seq("po"), "ev")
    // untouched partitions kept the SAME physical files (metadata-only)
    assert(untouched.subsetOf(m1.currentSnapshot.get.files.toSet))
    assert(m1.currentSnapshot.get.summary.get("replaced-files").contains("1"))

    // dynamic (write option): a full-table overwrite under
    // partitionOverwriteMode=dynamic replaces only the partitions in
    // the NEW data (a and b), leaving c alone
    import spark.implicits._
    Seq((100L, "a"), (200L, "b")).toDF("id", "cat")
      .writeTo("snap.po.ev")
      .option("partitionOverwriteMode", "dynamic")
      .overwrite(org.apache.spark.sql.functions.lit(true))
    val rows2 = spark.table("snap.po.ev").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1).toSeq
    assert(rows2 == Seq(3L -> "c", 100L -> "a", 200L -> "b"), s"got $rows2")

    // dynamic (session conf): a writeTo full-table overwrite under the
    // dynamic conf also keeps untouched partitions. (SQL INSERT
    // OVERWRITE under that conf is planned as OverwritePartitionsDynamic
    // before capabilities are consulted, and Spark ships no V1 fallback
    // exec for it — so the conf is honored on the writeTo path only.)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      Seq((300L, "b")).toDF("id", "cat")
        .writeTo("snap.po.ev")
        .overwrite(org.apache.spark.sql.functions.lit(true))
      val rows3 = spark.table("snap.po.ev").collect()
        .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1).toSeq
      assert(rows3 == Seq(3L -> "c", 100L -> "a", 300L -> "b"), s"got $rows3")
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")

    // racing append to an UNTOUCHED partition survives the overwrite's
    // retry (the kept/new split recomputes against the fresh base)
    spark.sql("INSERT INTO snap.po.ev VALUES (4,'d')")
    assert(spark.table("snap.po.ev").count() == 4)

    // a non-decidable condition refuses rather than approximating
    intercept[Exception] {
      Seq((9L, "z")).toDF("id", "cat")
        .writeTo("snap.po.ev").overwrite(org.apache.spark.sql.functions.col("id") === 9L)
    }

    // an EMPTY dynamic batch replaces nothing (a truncate here would
    // wipe the table on a zero-row reprocess run)
    val before = spark.table("snap.po.ev").count()
    Seq.empty[(Long, String)].toDF("id", "cat")
      .writeTo("snap.po.ev")
      .option("partitionOverwriteMode", "dynamic")
      .overwrite(org.apache.spark.sql.functions.lit(true))
    assert(spark.table("snap.po.ev").count() == before,
      "empty dynamic overwrite mutated the table")

    // an unsatisfiable condition (cat='a' AND cat='b') selects no
    // partition: nothing replaced, the new rows just land
    import org.apache.spark.sql.functions.col
    Seq((500L, "q")).toDF("id", "cat")
      .writeTo("snap.po.ev")
      .overwrite(col("cat") === "a" && col("cat") === "b")
    assert(spark.table("snap.po.ev").count() == before + 1)
    assert(spark.sql("SELECT count(*) FROM snap.po.ev WHERE cat IN ('a','b')")
      .head.getLong(0) == 2L, "unsatisfiable condition wiped a partition")

    // compaction preserves the partition layout, so partition overwrite
    // still works on a compacted table
    catalog.compact(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("po"), "ev"),
      targetFileCount = 2)
    spark.sql("INSERT OVERWRITE snap.po.ev PARTITION (cat='b') VALUES (999)")
    assert(spark.sql("SELECT id FROM snap.po.ev WHERE cat = 'b'")
      .collect().map(_.getLong(0)).toSeq == Seq(999L))
    assert(spark.sql("SELECT count(*) FROM snap.po.ev WHERE cat <> 'b'")
      .head.getLong(0) == 4L, "compacted non-b rows lost")
  }

  test("timestamp identity partitions: no wrong prune, no silent delete") {
    // Timestamp.toString ('…00.0') != the partition-dir rendering
    // ('…00'), so equality on a timestamp identity partition must
    // neither constrain the scan pruner nor be delete-decidable
    spark.sql("CREATE NAMESPACE snap.tsid")
    spark.sql("""CREATE TABLE snap.tsid.ev (id BIGINT, ts TIMESTAMP)
      PARTITIONED BY (ts)""")
    spark.sql("INSERT INTO snap.tsid.ev VALUES " +
      "(1, timestamp'2020-01-01 00:00:00'), (2, timestamp'2020-06-01 12:00:00')")
    // the filter must return its row (a wrong prune would yield 0 rows)
    assert(spark.sql("SELECT id FROM snap.tsid.ev WHERE ts = timestamp'2020-01-01 00:00:00'")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // the delete must refuse (silently dropping zero files while
    // reporting success would be worse)
    intercept[Exception] {
      spark.sql("DELETE FROM snap.tsid.ev WHERE ts = timestamp'2020-01-01 00:00:00'")
    }
    assert(spark.table("snap.tsid.ev").count() == 2)
  }

  test("compaction preserves the declared sort order and stats skipping") {
    spark.sql("CREATE NAMESPACE snap.cp")
    spark.sql("""CREATE TABLE snap.cp.t (id BIGINT, v DOUBLE)
      TBLPROPERTIES ('write.sort-order'='id')""")
    // three overlapping-range commits → after a sorted compact into 3
    // files, ranges must be disjoint again so min/max stats still skip
    spark.sql("INSERT INTO snap.cp.t SELECT id, CAST(id AS DOUBLE) FROM range(0, 300, 3)")
    spark.sql("INSERT INTO snap.cp.t SELECT id, CAST(id AS DOUBLE) FROM range(1, 300, 3)")
    spark.sql("INSERT INTO snap.cp.t SELECT id, CAST(id AS DOUBLE) FROM range(2, 300, 3)")
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("cp"), "t")
    catalog.compact(ident, targetFileCount = 3)
    assert(spark.table("snap.cp.t").count() == 300)
    val table = catalog.loadTable(ident)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
    val builder = table.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(java.util.Map.of()))
      .asInstanceOf[graft.catalog.GraftScanBuilder]
    val all = builder.prunedRelFiles.size
    builder.pushFilters(Array(org.apache.spark.sql.sources.LessThan("id", 50L)))
    val pruned = builder.prunedRelFiles.size
    assert(all == 3 && pruned == 1,
      s"sorted compact should leave disjoint ranges: $all -> $pruned files")
    assert(spark.sql("SELECT count(*) FROM snap.cp.t WHERE id < 50").head.getLong(0) == 50L)
  }

  test("partition-scoped compaction rewrites only the targeted partition") {
    spark.sql("CREATE NAMESPACE snap.pcp")
    spark.sql("""CREATE TABLE snap.pcp.t (dt STRING, id BIGINT, v DOUBLE)
      PARTITIONED BY (dt)""")
    // three commits → three files per dt value
    for (i <- 0 until 3)
      spark.sql(s"INSERT INTO snap.pcp.t SELECT dt, id, CAST(id AS DOUBLE) " +
        s"FROM (SELECT explode(array('a','b')) dt, ${i * 100} + id AS id " +
        s"FROM (SELECT explode(sequence(0, 9)) id))")
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("pcp"), "t")
    def filesOf(dt: String): Seq[String] = {
      val snap = catalog.metadataStore.load(Seq("pcp"), "t")._1.currentSnapshot.get
      snap.files.filter(_.contains(s"__part_dt=$dt"))
    }
    val aBefore = filesOf("a"); val bBefore = filesOf("b")
    assert(aBefore.size == 3 && bBefore.size == 3)
    val before = spark.table("snap.pcp.t").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(x => (x._1, x._2))

    catalog.compactPartition(ident, Map("dt" -> "a"))

    // partition a collapsed to one file; partition b's files are the
    // EXACT same paths; the commit is a layout-only rewrite
    val aAfter = filesOf("a"); val bAfter = filesOf("b")
    assert(aAfter.size == 1, s"a: $aAfter")
    assert(bAfter.toSet == bBefore.toSet, s"b changed: $bBefore -> $bAfter")
    val snap = catalog.metadataStore.load(Seq("pcp"), "t")._1.currentSnapshot.get
    assert(snap.operation == "rewrite" &&
      snap.summary.get("rewrite-kind").contains("compaction"))
    val after = spark.table("snap.pcp.t").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(x => (x._1, x._2))
    assert(after.toSeq == before.toSeq)
    // the changelog stays silent for the layout-only step
    val v = catalog.metadataStore.currentVersion(Seq("pcp"), "t")
    assert(graft.catalog.Changes.between(spark, "snap.pcp.t", v - 1).count() == 0)
    // unknown dir value refuses instead of rewriting nothing
    intercept[IllegalArgumentException](
      catalog.compactPartition(ident, Map("dt" -> "zz")))
  }

  test("small-file compaction merges only the fragments") {
    spark.sql("CREATE NAMESPACE snap.sfc")
    spark.sql("CREATE TABLE snap.sfc.t (id BIGINT, v DOUBLE)")
    // one big commit, then three tiny ones
    spark.sql("INSERT INTO snap.sfc.t SELECT id, CAST(id AS DOUBLE) FROM range(0, 20000)")
    for (i <- 0 until 3)
      spark.sql(s"INSERT INTO snap.sfc.t VALUES (${100000 + i}, 0.5)")
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("sfc"), "t")
    def files = catalog.metadataStore.load(Seq("sfc"), "t")._1
      .currentSnapshot.get.files
    val before = files
    val dataDir = catalog.metadataStore.dataDir(Seq("sfc"), "t")
    def len(f: String): Long =
      catalog.metadataStore.fileSizeBytes(s"$dataDir/$f").getOrElse(0L)
    val (small, big) = before.partition(len(_) < (16L << 10))
    assert(small.size == 3 && big.nonEmpty, s"layout: $before")

    catalog.compactSmallFiles(ident, smallerThanBytes = 16L << 10)

    val after = files
    // the three tiny files merged into one; every big file untouched
    assert(after.size == big.size + 1, after.toString)
    assert(big.forall(after.contains), s"big files must keep paths: $after")
    assert(spark.table("snap.sfc.t").count() == 20003)
    // re-run: fewer than two small files remain → no new commit
    val vBefore = catalog.metadataStore.currentVersion(Seq("sfc"), "t")
    catalog.compactSmallFiles(ident, smallerThanBytes = 16L << 10)
    assert(catalog.metadataStore.currentVersion(Seq("sfc"), "t") == vBefore)
  }

  test("partition-scoped compaction reads THROUGH live equality deletes") {
    spark.sql("CREATE NAMESPACE snap.pcd")
    spark.sql("""CREATE TABLE snap.pcd.t (dt STRING, id BIGINT NOT NULL, v DOUBLE)
      PARTITIONED BY (dt)
      TBLPROPERTIES ('identifier-fields'='id',
        'write.delete.mode'='merge-on-read')""")
    spark.sql("INSERT INTO snap.pcd.t VALUES ('a', 1, 1.0), ('a', 2, 2.0), ('b', 3, 3.0)")
    spark.sql("INSERT INTO snap.pcd.t VALUES ('a', 4, 4.0), ('b', 5, 5.0)")
    spark.sql("DELETE FROM snap.pcd.t WHERE id = 2")
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("pcd"), "t")
    assert(catalog.metadataStore.load(Seq("pcd"), "t")._1
      .currentSnapshot.get.deleteFiles.nonEmpty)

    catalog.compactPartition(ident, Map("dt" -> "a"))

    // the masked row must NOT resurrect in the rewritten partition, and
    // the delete files stay live for the untouched partition's files
    val rows = spark.table("snap.pcd.t").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2).toSeq
    assert(rows == Seq(("a", 1L), ("b", 3L), ("a", 4L), ("b", 5L)).sortBy(_._2),
      rows.toString)
    val snap = catalog.metadataStore.load(Seq("pcd"), "t")._1.currentSnapshot.get
    assert(snap.deleteFiles.nonEmpty, "delete files must survive for kept files")
    assert(snap.files.count(_.contains("__part_dt=a")) == 1)
  }

  test("Z-order compaction gives multi-dimensional file skipping") {
    import org.apache.spark.sql.functions._
    spark.sql("CREATE NAMESPACE snap.zord")
    spark.sql("CREATE TABLE snap.zord.t (x BIGINT, y BIGINT, payload STRING)")
    // 8 input files, each covering the FULL range of both dimensions
    spark.range(4096)
      .selectExpr("id % 64 AS x", "id DIV 64 AS y", "repeat('p', 8) AS payload")
      .orderBy(rand(42)).repartition(8)
      .writeTo("snap.zord.t").append()

    def prunedCount(fs: Array[org.apache.spark.sql.sources.Filter]): Int = {
      val table = catalog
        .loadTable(Identifier.of(Array("zord"), "t"))
        .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      val b = table.newScanBuilder(
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(java.util.Map.of()))
        .asInstanceOf[graft.catalog.GraftScanBuilder]
      b.pushFilters(fs)
      b.prunedRelFiles.size
    }
    import org.apache.spark.sql.sources.LessThan
    val before = prunedCount(Array())
    assert(before == 8, s"expected 8 input files, got $before")
    // wide per-file ranges: a narrow filter on either dimension skips nothing
    assert(prunedCount(Array(LessThan("x", 16L))) == before)
    assert(prunedCount(Array(LessThan("y", 16L))) == before)

    catalog.compactZOrder(Identifier.of(Array("zord"), "t"), Seq("x", "y"),
      targetFileCount = 8)

    val total = prunedCount(Array())
    assert(total >= 4, s"compaction produced $total files")
    // the z-curve narrows BOTH dimensions' per-file ranges — a filter on
    // either one now skips files (a single-key sort only narrows one)
    val xPruned = prunedCount(Array(LessThan("x", 16L)))
    val yPruned = prunedCount(Array(LessThan("y", 16L)))
    assert(xPruned < total, s"x filter pruned nothing ($xPruned of $total)")
    assert(yPruned < total, s"y filter pruned nothing ($yPruned of $total)")
    // and the data is intact
    assert(spark.table("snap.zord.t").count() == 4096L)
    assert(spark.sql("SELECT count(*) FROM snap.zord.t WHERE x < 16 AND y < 16")
      .head().getLong(0) == 16L * 16L)
  }

  test("rollback re-points the current snapshot; appends stack on top") {
    spark.sql("CREATE NAMESPACE snap.rb")
    spark.sql("CREATE TABLE snap.rb.t (id BIGINT)")               // v1
    spark.sql("INSERT INTO snap.rb.t VALUES (1)")                 // v2, snap 1
    spark.sql("INSERT INTO snap.rb.t VALUES (2)")                 // v3, snap 2
    assert(spark.table("snap.rb.t").count() == 2)

    catalog.rollback(Identifier.of(Array("rb"), "t"), snapshotId = 1) // v4
    assert(spark.table("snap.rb.t").collect().map(_.getLong(0)).toSeq == Seq(1L))
    // history intact: the rolled-back-FROM state is still time-travelable
    assert(spark.sql("SELECT * FROM snap.rb.t VERSION AS OF 3").count() == 2)

    // an append after rollback builds on the rolled-back state — row 2
    // stays dropped
    spark.sql("INSERT INTO snap.rb.t VALUES (9)")                 // v5, snap 3
    assert(spark.table("snap.rb.t").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 9L))
    // rolling back to an unknown snapshot is a terminal commit failure
    intercept[Exception] {
      catalog.rollback(Identifier.of(Array("rb"), "t"), snapshotId = 99)
    }
  }

  test("copy-on-write DELETE rewrites only the files that can match") {
    spark.sql("CREATE NAMESPACE snap.cow")
    spark.sql("CREATE TABLE snap.cow.t (id BIGINT, v BIGINT)")
    // three separate commits → three files with disjoint stats ranges
    spark.sql("INSERT INTO snap.cow.t VALUES (1, 10), (2, 20)")
    spark.sql("INSERT INTO snap.cow.t VALUES (3, 150), (4, 80)")
    spark.sql("INSERT INTO snap.cow.t VALUES (5, 300)")
    val snapBefore = catalog.metadataStore.load(Seq("cow"), "t")
      ._1.currentSnapshot.get
    // stats decide the affected set: a file whose max(v) <= 100 can't
    // match the predicate and must keep its exact path
    def maxV(rel: String): Long = snapBefore.fileStats(rel)
      .find(_.name == "v").get.max.toLong
    val untouchable = snapBefore.files.filter(maxV(_) <= 100)
    val affected = snapBefore.files.filter(maxV(_) > 100)
    assert(untouchable.nonEmpty && affected.nonEmpty, "bad test layout")

    spark.sql("DELETE FROM snap.cow.t WHERE v > 100")
    val rows = spark.table("snap.cow.t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
    assert(rows == Seq(1L -> 10L, 2L -> 20L, 4L -> 80L), s"got $rows")

    val (m, _) = catalog.metadataStore.load(Seq("cow"), "t")
    val after = m.currentSnapshot.get.files
    assert(untouchable.forall(after.contains),
      s"untouched file was rewritten: $untouchable vs $after")
    assert(affected.forall(f => !after.contains(f)),
      s"affected file kept its path: $affected vs $after")
    assert(m.currentSnapshot.get.operation == "rewrite")
    assert(m.currentSnapshot.get.summary.get("rewritten-files")
      .contains(affected.size.toString))
    // rewritten files carry harvested stats like any committed file
    assert(after.toSet.subsetOf(m.currentSnapshot.get.fileStats.keySet ++
      snapBefore.files.toSet))
    // history intact: pre-delete state still time-travelable
    assert(spark.sql("SELECT count(*) FROM snap.cow.t VERSION AS OF 4")
      .head.getLong(0) == 5L)
    // no orphans: disk holds exactly the live + historical files
    val kept = catalog.metadataStore
      .listParquetUnder(catalog.metadataStore.dataDir(Seq("cow"), "t"))
    assert(after.forall(kept.contains))
  }

  test("row-level DELETE on a partitioned table preserves the dir layout") {
    spark.sql("CREATE NAMESPACE snap.cowp")
    spark.sql("""CREATE TABLE snap.cowp.t (id BIGINT, cat STRING, v BIGINT)
      PARTITIONED BY (cat)""")
    spark.sql("INSERT INTO snap.cowp.t VALUES (1,'a',10),(2,'a',200),(3,'b',30)")

    spark.sql("DELETE FROM snap.cowp.t WHERE v > 100")
    assert(spark.table("snap.cowp.t").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L))
    val (m, _) = catalog.metadataStore.load(Seq("cowp"), "t")
    // every current file still carries its partition dir — rewritten
    // files included — so pruning and partition-boundary ops keep working
    assert(m.currentSnapshot.get.files.forall(_.contains("__part_cat=")),
      s"layout lost: ${m.currentSnapshot.get.files}")
    // ...proof: a partition-boundary DELETE is still metadata-only
    val filesBefore = m.currentSnapshot.get.files.toSet
    spark.sql("DELETE FROM snap.cowp.t WHERE cat = 'b'")
    val (m2, _) = catalog.metadataStore.load(Seq("cowp"), "t")
    assert(m2.currentSnapshot.get.files.toSet.subsetOf(filesBefore),
      "partition delete rewrote data after a row-level rewrite")
    assert(spark.table("snap.cowp.t").collect().map(_.getLong(0)).toSeq ==
      Seq(1L))
  }

  test("UPDATE and MERGE ride the same copy-on-write rewrite") {
    spark.sql("CREATE NAMESPACE snap.dml")
    spark.sql("CREATE TABLE snap.dml.t (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO snap.dml.t VALUES (1, 10), (2, 20)")
    spark.sql("INSERT INTO snap.dml.t VALUES (3, 30)")

    spark.sql("UPDATE snap.dml.t SET v = v + 1 WHERE id = 2")
    val afterUpdate = spark.table("snap.dml.t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
    assert(afterUpdate == Seq(1L -> 10L, 2L -> 21L, 3L -> 30L), s"got $afterUpdate")

    spark.sql("""MERGE INTO snap.dml.t t
      USING (SELECT * FROM VALUES (3, 300L), (9, 900L) AS s(id, v)) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET t.v = s.v
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")
    val afterMerge = spark.table("snap.dml.t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
    assert(afterMerge == Seq(1L -> 10L, 2L -> 21L, 3L -> 300L, 9L -> 900L),
      s"got $afterMerge")
  }

  test("a rewrite computed against a stale snapshot fails, never merges") {
    import graft.commit._
    spark.sql("CREATE NAMESPACE snap.race")
    spark.sql("CREATE TABLE snap.race.t (id BIGINT)")
    spark.sql("INSERT INTO snap.race.t VALUES (1)")
    val (m1, _) = catalog.metadataStore.load(Seq("race"), "t")
    // an append lands between the rewrite's scan and its commit
    spark.sql("INSERT INTO snap.race.t VALUES (2)")
    val ex = intercept[CommitFailedException] {
      catalog.metadataStore.commitOps(Seq("race"), "t",
        Seq(Requirement.AssertCurrentSnapshotId(m1.currentSnapshotId)),
        Seq(MetadataUpdate.RewriteFiles(
          m1.currentSnapshot.get.files, Nil, System.currentTimeMillis())))
    }
    assert(ex.getMessage.contains("snapshot changed"))
    assert(spark.table("snap.race.t").count() == 2)
    // ...and removing files the current snapshot doesn't hold is refused
    // even without the guard (belt and braces)
    intercept[Exception] {
      catalog.metadataStore.commitOps(Seq("race"), "t", Nil,
        Seq(MetadataUpdate.RewriteFiles(
          List("commit-nonexistent/x.parquet"), Nil,
          System.currentTimeMillis())))
    }
  }

  test("partition-spec evolution: new layout for new writes, old files intact") {
    import org.apache.spark.sql.connector.expressions.Expressions
    spark.sql("CREATE NAMESPACE snap.evo")
    spark.sql("CREATE TABLE snap.evo.t (id BIGINT, cat STRING)")
    spark.sql("INSERT INTO snap.evo.t VALUES (1,'a'),(2,'b')") // pre-evolution

    catalog.evolvePartitionSpec(Identifier.of(Array("evo"), "t"),
      Array(Expressions.identity("cat")))
    spark.sql("INSERT INTO snap.evo.t VALUES (3,'a'),(4,'c')") // post-evolution

    val (m, _) = catalog.metadataStore.load(Seq("evo"), "t")
    val files = m.currentSnapshot.get.files
    // mixed layout: old files untouched (no dirs), new files partitioned
    assert(files.exists(!_.contains("__part_cat=")), "old files were rewritten")
    assert(files.exists(_.contains("__part_cat=a")), "new writes not partitioned")
    // both layouts serve queries correctly — a cat filter must reach
    // rows in BOTH (old files are never pruned on a key they lack)
    assert(spark.sql("SELECT id FROM snap.evo.t WHERE cat = 'a'")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))

    // partition-boundary DELETE refuses on the mixed table (old files
    // can't be decided), and the row-level copy-on-write path covers it
    spark.sql("DELETE FROM snap.evo.t WHERE cat = 'b'")
    assert(catalog.metadataStore.load(Seq("evo"), "t")
      ._1.currentSnapshot.get.operation == "rewrite")
    assert(spark.table("snap.evo.t").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L, 4L))

    // compaction rewrites everything under the NEW spec; boundary ops
    // work from then on (metadata-only delete again)
    catalog.compact(Identifier.of(Array("evo"), "t"), targetFileCount = 1)
    val (m2, _) = catalog.metadataStore.load(Seq("evo"), "t")
    assert(m2.currentSnapshot.get.files.forall(_.contains("__part_cat=")),
      "compaction did not restore a uniform layout")
    spark.sql("DELETE FROM snap.evo.t WHERE cat = 'c'")
    val (m3, _) = catalog.metadataStore.load(Seq("evo"), "t")
    assert(m3.currentSnapshot.get.summary.contains("deleted-files"),
      "expected a metadata-only partition delete after compaction")
    assert(spark.table("snap.evo.t").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L))

    // racing evolutions: the loser's stale default-spec guard fails
    val (b2, _) = catalog.metadataStore.load(Seq("evo"), "t")
    catalog.evolvePartitionSpec(Identifier.of(Array("evo"), "t"),
      Array(Expressions.bucket(4, "id")))
    intercept[graft.commit.CommitFailedException] {
      catalog.metadataStore.commitOps(Seq("evo"), "t",
        Seq(graft.commit.Requirement.AssertDefaultSpecId(b2.defaultSpecId)),
        Seq(graft.commit.MetadataUpdate.AddPartitionSpec(
          graft.meta.PartitionSpecDef(99, Nil))))
    }

    // changing a transform's PARAMETER may not reuse the old dir-key
    // name: old bucket[4] dirs would replay under mod-8 and wrongly
    // prune (or overwrite) their files — the new field gets a
    // spec-qualified name old files simply don't carry
    catalog.evolvePartitionSpec(Identifier.of(Array("evo"), "t"),
      Array(Expressions.bucket(8, "id")))
    val (m4, _) = catalog.metadataStore.load(Seq("evo"), "t")
    val defSpec = m4.specs.find(_.specId == m4.defaultSpecId).get
    assert(defSpec.fields.head.name.startsWith("id_bucket_v"),
      s"colliding bucket dir key not spec-qualified: ${defSpec.fields}")
    assert(spark.table("snap.evo.t").count() == 2) // rows all still served

    // duplicate spec ids are rejected at the commit algebra
    intercept[Exception] {
      catalog.metadataStore.commitOps(Seq("evo"), "t", Nil,
        Seq(graft.commit.MetadataUpdate.AddPartitionSpec(
          graft.meta.PartitionSpecDef(m4.defaultSpecId, Nil))))
    }
  }

  test("TIMESTAMP AS OF loads the state committed at or before that instant") {
    spark.sql("CREATE NAMESPACE snap.tt")
    spark.sql("CREATE TABLE snap.tt.t (id BIGINT)")
    spark.sql("INSERT INTO snap.tt.t VALUES (1)")
    Thread.sleep(1100) // mtime granularity: put a clear gap between commits
    val between = java.time.Instant.now()
    Thread.sleep(1100)
    spark.sql("INSERT INTO snap.tt.t VALUES (2)")

    assert(spark.sql(
      s"SELECT count(*) FROM snap.tt.t TIMESTAMP AS OF '$between'")
      .head.getLong(0) == 1L, "timestamp travel must see only the first commit")
    assert(spark.table("snap.tt.t").count() == 2)
    // before the table existed: a clear refusal, not an empty result
    intercept[Exception] {
      spark.sql("SELECT * FROM snap.tt.t TIMESTAMP AS OF '2001-01-01 00:00:00'")
        .collect()
    }
    // the travelled snapshot is frozen: writes refuse
    intercept[Exception] {
      spark.sql(s"INSERT INTO snap.tt.t TIMESTAMP AS OF '$between' VALUES (9)")
    }
  }

  test("$snapshots serves per-snapshot detail including the summary map") {
    spark.sql("CREATE NAMESPACE snap.sn")
    spark.sql("CREATE TABLE snap.sn.t (id BIGINT, cat STRING) PARTITIONED BY (cat)")
    spark.sql("INSERT INTO snap.sn.t VALUES (1,'a'),(2,'b')")
    spark.sql("INSERT OVERWRITE snap.sn.t PARTITION (cat='b') VALUES (20)")

    val rows = spark.sql(
      """SELECT snapshot_id, operation, n_files, added_files, replaced_files,
        |       summary['added-files'] AS sa, is_current
        |FROM snap.sn.`t$snapshots` ORDER BY snapshot_id""".stripMargin).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(1)).toSeq == Seq("append", "overwrite-partitions"))
    assert(rows.head.getInt(3) == 2)            // first append added 2 files
    assert(rows.last.getInt(4) == 1)            // overwrite replaced the b file
    assert(rows.map(_.getString(5)).toSeq == Seq("2", "1")) // raw summary map
    assert(rows.map(_.getBoolean(6)).toSeq == Seq(false, true))

    // driver-local, like the other inspection tables
    val plan = spark.sql("SELECT * FROM snap.sn.`t$snapshots`")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"), s"expected LocalTableScan:\n$plan")
  }

  test("$partitions rolls up the current snapshot by partition value") {
    spark.sql("CREATE NAMESPACE snap.pt")
    spark.sql("CREATE TABLE snap.pt.t (id BIGINT, cat STRING) PARTITIONED BY (cat)")
    spark.sql("INSERT INTO snap.pt.t VALUES (1,'a'),(2,'b')")
    spark.sql("INSERT INTO snap.pt.t VALUES (3,'a')")

    val rows = spark.sql("SELECT * FROM snap.pt.`t$partitions` ORDER BY partition")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toSeq
    assert(rows == Seq("cat=a" -> 2, "cat=b" -> 1), s"got $rows")
    val plan = spark.sql("SELECT * FROM snap.pt.`t$partitions`")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"), s"expected LocalTableScan:\n$plan")
  }

  test("many-file appends still harvest stats for every file") {
    spark.sql("CREATE NAMESPACE snap.mf")
    spark.sql("CREATE TABLE snap.mf.t (id BIGINT, v DOUBLE)")
    // 16 files > the driver-harvest threshold → the distributed path
    import spark.implicits._
    (1L to 160L).map(i => (i, i * 1.5)).toDF("id", "v")
      .repartition(16).writeTo("snap.mf.t").append()

    val (m, _) = catalog.metadataStore.load(Seq("mf"), "t")
    val snap = m.currentSnapshot.get
    assert(snap.files.size == 16)
    assert(snap.fileStats.keySet == snap.files.toSet,
      "every committed file must carry harvested stats")
    // the stats are real min/max (id is a plain INT64 column)
    val idMins = snap.fileStats.values.flatMap(_.find(_.name == "id")).map(_.min.toLong)
    assert(idMins.min == 1L)
    // …and they feed file skipping exactly like the driver-side harvest
    val pruned = spark.table("snap.mf.t").where($"id" === 1L)
    assert(pruned.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("write.parquet.bloom-filter-columns embeds per-row-group bloom filters") {
    import scala.jdk.CollectionConverters._
    spark.sql("CREATE NAMESPACE snap.bf")
    spark.sql("""CREATE TABLE snap.bf.t (k BIGINT, v STRING)
      TBLPROPERTIES ('write.parquet.bloom-filter-columns' = 'k')""")
    import spark.implicits._
    (1L to 1000L).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1).writeTo("snap.bf.t").append()

    val dataDir = catalog.metadataStore.dataDir(Seq("bf"), "t")
    val (m, _) = catalog.metadataStore.load(Seq("bf"), "t")
    val rel = m.currentSnapshot.get.files.head
    val conf = spark.sessionState.newHadoopConf()
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(s"$dataDir/$rel"), conf))
    try {
      val block = reader.getRowGroups.get(0)
      val byName = block.getColumns.asScala
        .map(c => c.getPath.toDotString -> c).toMap
      val bfReader = reader.getBloomFilterDataReader(block)
      assert(bfReader.readBloomFilter(byName("k")) != null,
        "declared column must carry a bloom filter")
      assert(bfReader.readBloomFilter(byName("v")) == null,
        "undeclared column must not pay for one")
    } finally reader.close()
    // reads through the catalog still serve every row
    assert(spark.table("snap.bf.t").count() == 1000L)
    assert(spark.table("snap.bf.t").where($"k" === 77L).count() == 1L)
  }
}
