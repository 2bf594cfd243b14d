package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.GraftCatalog

/** Physical-plan quality gates: the properties that make these plans
  * survive a 100× scale-up (SURVEY.md §4). Each assertion inspects the
  * formatted explain output, the same thing a human would check before
  * shipping a plan to a 1000-executor cluster. */
class PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val wh = Files.createTempDirectory("graft-plan-wh").toString
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.graft.warehouse", wh)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filters and column pruning push into the raw parquet scan") {
    val df = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") >= 45)
      .select(col("l_orderkey"), col("l_quantity"))
    val plan = planOf(df)
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,45.0)]"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"columns not pruned:\n$plan")
  }

  test("filters push through the GraftCatalog DSv2 scan (ParquetTable delegate)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.plans")
    spark.sql("CREATE TABLE IF NOT EXISTS graft.plans.li (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.plans.li SELECT l_orderkey, l_quantity " +
      s"FROM parquet.`$sf/lineitem.parquet` LIMIT 1000")
    val df = spark.table("graft.plans.li").filter(col("k") === 5L).select(col("v"))
    val plan = planOf(df)
    assert(plan.contains("PushedFilters: [IsNotNull(k), EqualTo(k,5)]"),
      s"filter not pushed through catalog scan:\n$plan")
  }

  test("scan statistics report manifest row counts, narrowed by pruning") {
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mrows")
    spark.sql("""CREATE TABLE graft.mrows.t (id BIGINT, cat STRING)
      PARTITIONED BY (cat)""")
    spark.sql(
      "INSERT INTO graft.mrows.t VALUES (1,'a'),(2,'a'),(3,'a'),(4,'b'),(5,'b')")
    def rowCountOf(df: org.apache.spark.sql.DataFrame): Option[BigInt] =
      df.queryExecution.optimizedPlan.collectFirst {
        case r: DataSourceV2ScanRelation => r.stats.rowCount
      }.flatten
    // full scan: the harvested per-file counts sum to the table size
    assert(rowCountOf(spark.table("graft.mrows.t")) == Some(BigInt(5)),
      "manifest row counts must reach the plan's statistics")
    // partition-pruned scan: cardinality narrows with the file list —
    // this is what makes a pruned fact-side provably broadcastable
    assert(rowCountOf(spark.table("graft.mrows.t")
      .where(col("cat") === "b")) == Some(BigInt(2)),
      "pruned scans must report the pruned cardinality")
  }

  test("identity-partition filters prune snapshot files before the scan") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.prune")
    spark.sql("""CREATE TABLE graft.prune.ev (id BIGINT, cat STRING)
      PARTITIONED BY (cat)""")
    spark.sql("INSERT INTO graft.prune.ev VALUES (1,'a'),(2,'b'),(3,'c')")
    val table = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("prune"), "ev"))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
    val builder = table.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(java.util.Map.of()))
      .asInstanceOf[graft.catalog.GraftScanBuilder]
    val all = builder.prunedRelFiles.size
    builder.pushFilters(Array(org.apache.spark.sql.sources.EqualTo("cat", "b")))
    val pruned = builder.prunedRelFiles
    assert(all == 3 && pruned.size == 1, s"expected 3 -> 1 files, got $all -> ${pruned.size}")
    assert(pruned.head.contains("__part_cat=b"))
    // behavior end-to-end: the filter still returns the right rows
    val rows = spark.sql("SELECT id FROM graft.prune.ev WHERE cat = 'b'").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("manifest min/max stats skip files on range predicates") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.stats")
    spark.sql("""CREATE TABLE graft.stats.t (id BIGINT, v DOUBLE)
      TBLPROPERTIES ('write.sort-order'='id')""")
    // three commits with disjoint id ranges → three file groups whose
    // manifest stats don't overlap
    spark.sql("INSERT INTO graft.stats.t SELECT id, CAST(id AS DOUBLE) FROM range(1, 11)")
    spark.sql("INSERT INTO graft.stats.t SELECT id, CAST(id AS DOUBLE) FROM range(100, 111)")
    spark.sql("INSERT INTO graft.stats.t SELECT id, CAST(id AS DOUBLE) FROM range(1000, 1011)")
    val table = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("stats"), "t"))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
    val builder = table.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(java.util.Map.of()))
      .asInstanceOf[graft.catalog.GraftScanBuilder]
    val all = builder.prunedRelFiles.size
    builder.pushFilters(Array(org.apache.spark.sql.sources.GreaterThan("id", 500L)))
    val pruned = builder.prunedRelFiles.size
    assert(pruned < all, s"stats did not prune: $all -> $pruned files")
    // behavior unchanged
    assert(spark.sql("SELECT count(*) FROM graft.stats.t WHERE id > 500")
      .head.getLong(0) == 11L)
    assert(spark.sql("SELECT count(*) FROM graft.stats.t").head.getLong(0) == 32L)
  }

  test("small dimension join is broadcast, not shuffled") {
    val plan = planOf(ops.Relational.q03TopRevenue(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("global top-k plans as TakeOrderedAndProject (no full sort)") {
    val plan = planOf(ops.Relational.q11TopK(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not heap-based:\n$plan")
  }

  test("aggregation is partial+final (map-side combine before shuffle)") {
    val plan = planOf(ops.Relational.q01PricingSummary(spark, sf))
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"no partial aggregation:\n$plan")
  }

  test("whole-stage codegen covers the scan->filter->agg pipeline") {
    val df = ops.Relational.q01PricingSummary(spark, sf)
    df.collect() // AQE finalizes the plan only on execution
    val plan = planOf(df)
    // codegen stages render as "*(n) Operator" in the finalized AQE plan
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      s"no codegen span:\n$plan")
  }

  test("bucketed tables co-locate the join: no exchange on either side") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      Tables.orders(spark, sf).write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").mode("overwrite").saveAsTable("b_orders")
      Tables.lineitem(spark, sf)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lines")
      val joined = spark.table("b_orders")
        .join(spark.table("b_lines"), col("o_orderkey") === col("l_orderkey"))
      joined.collect()
      val plan = planOf(joined)
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffled:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lines")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("dynamic partition pruning reaches a partitioned fact scan") {
    val dir = Files.createTempDirectory("graft-dpp").toString
    Tables.events(spark, sf).write.partitionBy("event_type").parquet(s"$dir/ev")
    val fact = spark.read.parquet(s"$dir/ev")
    // dim filtered on a NON-key attribute (length is not invertible, so
    // the optimizer cannot rewrite it into a static partition predicate —
    // pruning must come from the broadcast result at runtime)
    val dim = Tables.events(spark, sf).select(col("event_type")).distinct()
      .filter(length(col("event_type")) === 5)
    val joined = fact.join(dim, Seq("event_type")).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
    val plan = planOf(joined)
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in:\n$plan")
  }

  test("runtime In filters prune catalog files; DPP reaches the DSv2 scan") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.rtf")
    spark.sql("CREATE TABLE graft.rtf.fact (id BIGINT, cat STRING) PARTITIONED BY (cat)")
    spark.sql("INSERT INTO graft.rtf.fact VALUES (1,'a'),(2,'b'),(3,'c'),(4,'d')")
    spark.sql("CREATE TABLE graft.rtf.dim (cat STRING, flag INT)")
    spark.sql("INSERT INTO graft.rtf.dim VALUES ('b', 1), ('c', 0)")

    // unit surface: BatchScanExec hands runtime join-key values to the
    // scan as an In filter — the manifest re-prunes to the matching file
    val table = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("rtf"), "fact"))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
    val builder = table.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(java.util.Map.of()))
      .asInstanceOf[graft.catalog.GraftScanBuilder]
    val scan = builder.build()
    val attrs = scan.asInstanceOf[
        org.apache.spark.sql.connector.read.SupportsRuntimeFiltering]
      .filterAttributes().map(_.describe).toSeq
    assert(attrs == Seq("cat"), s"runtime-filterable attrs: $attrs")
    val before = builder.prunedRelFiles.size
    scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsRuntimeFiltering]
      .filter(Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.In("cat", Array[Any]("b"))))
    val after = builder.prunedRelFiles
    assert(before == 4 && after.size == 1,
      s"expected 4 -> 1 files, got $before -> ${after.size}")
    assert(after.head.contains("__part_cat=b"), after.mkString("\n"))
    assert(scan.toBatch.planInputPartitions().nonEmpty)

    // end-to-end: a selective dim join injects dynamic pruning on the
    // fact scan (dim filter on a non-key attribute — not statically
    // rewritable), and the join result is right
    val df = spark.table("graft.rtf.fact")
      .join(spark.table("graft.rtf.dim").filter(col("flag") === 1), Seq("cat"))
    val plan = planOf(df)
    assert(plan.contains("dynamicpruning") || plan.contains("RuntimeFilters"),
      s"no runtime filter injected on the catalog scan:\n$plan")
    assert(df.select(col("id")).collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("COUNT/MIN/MAX push to parquet footers through the catalog scan") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.aggpd")
    spark.sql("CREATE TABLE graft.aggpd.t (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.aggpd.t SELECT id, id * 1.5 FROM range(0, 1000)")
    spark.sql("INSERT INTO graft.aggpd.t SELECT id, id * 1.5 FROM range(1000, 1500)")

    val cnt = spark.sql("SELECT count(*) FROM graft.aggpd.t")
    val cntPlan = planOf(cnt)
    assert(cntPlan.contains("PushedAggregation: [COUNT(*)]"),
      s"count(*) not answered from footers:\n$cntPlan")
    assert(cnt.head().getLong(0) == 1500L)

    val mm = spark.sql("SELECT min(k), max(k) FROM graft.aggpd.t")
    assert(planOf(mm).contains("PushedAggregation: [MIN(k), MAX(k)]"),
      s"min/max not pushed:\n${planOf(mm)}")
    assert(mm.head().getLong(0) == 0L && mm.head().getLong(1) == 1499L)

    // a table with LIVE equality-delete files must refuse: footer counts
    // include the masked rows
    spark.sql("""CREATE TABLE graft.aggpd.m (id BIGINT NOT NULL, v DOUBLE)
      TBLPROPERTIES ('identifier-fields' = 'id',
        'write.delete.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO graft.aggpd.m VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    spark.sql("DELETE FROM graft.aggpd.m WHERE id = 2")
    val morCnt = spark.sql("SELECT count(*) FROM graft.aggpd.m")
    assert(!planOf(morCnt).contains("PushedAggregation: [COUNT"),
      s"aggregate wrongly pushed past live deletes:\n${planOf(morCnt)}")
    assert(morCnt.head().getLong(0) == 2L)
  }

  test("time-range filters prune hour-partitioned dirs, rows unchanged") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tsprune")
    spark.sql("""CREATE TABLE graft.tsprune.ev (id BIGINT, ts TIMESTAMP)
      PARTITIONED BY (hours(ts))""")
    spark.sql("INSERT INTO graft.tsprune.ev SELECT id, " +
      "timestamp'2024-06-01 00:30:00' + make_interval(0,0,0,0,CAST(id AS INT)) " +
      "FROM range(0, 24)") // one row per hour of the day
    val table = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("tsprune"), "ev"))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
    val builder = table.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(java.util.Map.of()))
      .asInstanceOf[graft.catalog.GraftScanBuilder]
    val all = builder.prunedRelFiles.size
    builder.pushFilters(Array(
      org.apache.spark.sql.sources.GreaterThanOrEqual("ts",
        java.sql.Timestamp.valueOf("2024-06-01 06:00:00")),
      org.apache.spark.sql.sources.LessThan("ts",
        java.sql.Timestamp.valueOf("2024-06-01 09:00:00"))))
    val pruned = builder.prunedRelFiles
    // hours 06..08 qualify; hour 09 is kept conservatively (a strict
    // upper bound stays inclusive at dir granularity)
    assert(all == 24 && pruned.size <= 4,
      s"expected <=4 of 24 hour dirs, got $all -> ${pruned.size}")
    assert(pruned.forall(p => (6 to 9).exists(h =>
      p.contains(f"__part_ts_hour=2024-06-01-$h%02d"))), pruned.mkString("\n"))
    // rows identical with pruning on vs a full manual scan
    val got = spark.sql("SELECT id FROM graft.tsprune.ev WHERE " +
      "ts >= timestamp'2024-06-01 06:00:00' AND ts < timestamp'2024-06-01 09:00:00'")
      .collect().map(_.getLong(0)).sorted.toSeq
    val want = spark.table("graft.tsprune.ev").collect()
      .filter { r =>
        val t = r.getTimestamp(1)
        !t.before(java.sql.Timestamp.valueOf("2024-06-01 06:00:00")) &&
          t.before(java.sql.Timestamp.valueOf("2024-06-01 09:00:00"))
      }.map(_.getLong(0)).sorted.toSeq
    assert(got == want && got == Seq(6L, 7L, 8L), s"got $got want $want")
  }

  test("q23 distribution stats: no single-partition exchange feeds a window") {
    val df = ops.Windows.q23Ntile(spark, sf)
    val plan = planOf(df)
    assert(!plan.contains("Exchange SinglePartition"),
      s"global window funnels all rows through one task:\n$plan")
    // the windows that remain are keyed (pid / value group)
    assert(plan.contains("Window"), s"expected keyed windows:\n$plan")
  }

  test("q76 packing: no window keyed by the low-cardinality source alone") {
    val df = llm.Curation.q76TokenPacking(spark, sf)
    val plan = planOf(df)
    // a Window whose key is (source) funnels each source — nearly the
    // whole corpus at 100 TB — through one task; the two-pass plan keys
    // its window by (pid, source), bounded by partition size. (The final
    // per-(source, pack_id) aggregate may hash on source+pack_id — that
    // key is high-cardinality and map-side combined, which is fine.)
    assert(!plan.contains("windowspecdefinition(source"),
      s"window partitioned on source alone:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition exchange in packing plan:\n$plan")
    assert(plan.contains("Window"), s"expected bounded keyed window:\n$plan")
  }

  test("q119 bucket thresholds: no window anywhere in the plan") {
    // the r10 shape bucketed with ntile(3) OVER (PARTITION BY lang …) —
    // a per-language global sort through ONE task, lethal when one
    // language is half the corpus. The rewrite folds tertile cut points
    // out of a resolution-bounded (lang, xent6) histogram and assigns
    // buckets map-side against the broadcast thresholds, so NO window
    // of any kind may appear in the plan
    val plan = planOf(llm.Curation.q119LmXent(spark, sf))
    assert(!plan.contains("windowspecdefinition"),
      s"q119 must not contain any window:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition exchange in q119 plan:\n$plan")
  }

  test("q130 bitext ANN: no corpus-sized nested-loop join in the plan") {
    // q124's exactness baseline broadcasts the whole English slice into
    // a BroadcastNestedLoopJoin — banned at scale. q130's candidates
    // must come from the cell equi-join; the ONLY nested loop allowed
    // is the KCells-row (8) centroid ranking every IVF searcher shares
    val plan = planOf(llm.Similarity.q130BitextAnn(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      s"cartesian product in q130 plan:\n$plan")
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj <= 1,
      s"q130 must nested-loop only against the 8 centroids, found $bnlj:\n$plan")
  }

  test("q132 index-served BM25: no corpus scan, term predicate pushed") {
    // the whole point of serving from the inverted index: the raw
    // corpus text is NEVER read (q101 tokenizes the corpus per query),
    // and the query vocabulary pushes into the postings scan where the
    // bucket(term) layout prunes partition dirs
    val df = llm.TextAnalysis.q132Bm25Indexed(spark, sf)
    val plan = planOf(df)
    assert(!plan.contains("Scan parquet"),
      s"index serving must not scan the raw corpus:\n$plan")
    // the candidate subtree (pinned by bm25ServeFrom): the query
    // vocabulary pushes into the postings scan and doclen appears
    // exactly once — the id join — never an aggregate input
    val pfx = llm.TextAnalysis.ensureBm25Index(spark, sf)
    val cand = planOf(llm.TextAnalysis.bm25CandidatePostings(spark,
      s"$pfx.postings", s"$pfx.doclen", llm.TextAnalysis.Bm25Queries))
    assert(cand.contains("In(term"),
      s"query vocabulary must push into the postings scan:\n$cand")
    assert("\\.doclen".r.findAllIn(cand).size == 1,
      s"doclen must appear exactly once (the id join):\n$cand")
    // the served plan reads the pin (ExistingRDD) + the #commits-row
    // stats ledger: zero doclen scans, no full corpus-stats aggregate
    assert(!plan.contains(".doclen"),
      s"serving must not re-scan doclen (stats come from the ledger):\n$plan")
    assert(plan.contains("bm25_stats"),
      s"corpus stats must read the persisted ledger:\n$plan")
  }

  test("q140 phrase search serves from positional postings: no corpus scan") {
    // the positions column buys adjacency without ever touching text:
    // the phrase vocabulary pushes into the postings scan like q132's
    val df = llm.TextAnalysis.q140PhraseSearch(spark, sf)
    val plan = planOf(df)
    assert(!plan.contains("Scan parquet"),
      s"phrase serving must not scan the raw corpus:\n$plan")
    assert(plan.contains("In(term"),
      s"phrase vocabulary must push into the postings scan:\n$plan")
  }

  test("q143 CSLS search: candidates from cell equi-joins, no corpus NLJ") {
    // the hubness-corrected re-rank must keep the q57/q130 candidate
    // geometry — the ONLY nested loop allowed is the 8-row centroid
    // ranking every IVF searcher shares
    val plan = planOf(llm.Similarity.q143CslsSearch(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      s"cartesian product in q143 plan:\n$plan")
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj <= 1,
      s"q143 must nested-loop only against the centroids, found $bnlj:\n$plan")
  }

  test("q143 reads r(d) from the artifact: no pair pass at query time") {
    // the r12 `weak` flag: the search recomputed r(d) with a
    // corpus-wide within-cell pair join + window per run, when it is a
    // pure function of the index state. Persisted, the plan must (a)
    // read the ivf_rd table, (b) contain NO ivf_cells self-join (each
    // of the two remaining ivf_cells reads sits on a DIFFERENT join
    // axis: candidate membership and the corpus-side norm), and (c)
    // window only over per-query candidate frames — which the absence
    // of any id_a-partitioned window over corpus pairs implies via the
    // scan count
    val plan = planOf(llm.Similarity.q143CslsSearch(spark, sf))
    assert(plan.contains("ivf_rd"),
      s"q143 must read the persisted r(d) artifact:\n$plan")
    val cellScans = "ivf_cells".r.findAllIn(plan).size
    assert(cellScans <= 2,
      s"q143 must not self-join ivf_cells for r(d) (found $cellScans reads):\n$plan")
    // the r(d) subtree is ids+longs: exactly the embeddings reads the
    // CANDIDATE geometry needs remain (query side + corpus payload),
    // never a third corpus-wide pass for the statistic
    val embScans = "Scan parquet".r.findAllIn(plan).size
    assert(embScans <= 2,
      s"q143 must scan embeddings only for query + candidates, found $embScans:\n$plan")
  }

  test("q144 SQ8 search keeps the probed-cell geometry: no corpus NLJ") {
    val plan = planOf(llm.Similarity.q144Sq8Search(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      s"cartesian product in q144 plan:\n$plan")
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj <= 1,
      s"q144 must nested-loop only against the centroids, found $bnlj:\n$plan")
  }

  test("q144 stage 1 serves from the persisted SQ8 codes") {
    // the bandwidth claim ("a quarter of the scan bytes") is only true
    // when stage 1 reads the one-byte-per-dim code table instead of
    // quantizing the float vectors per run: the plan must read
    // sq8_codes, and the full-precision embeddings parquet may appear
    // only for the query side (vec_id < 50 pushed into the scan) and
    // the ≤10-per-query rescore joins — never an unfiltered scan
    // feeding stage 1's candidate ranking
    val plan = planOf(llm.Similarity.q144Sq8Search(spark, sf))
    assert(plan.contains("sq8_codes"),
      s"q144 stage 1 must read the persisted code table:\n$plan")
    // embeddings reads: ONLY the two ≤10-per-query rescore joins — the
    // query side (pushed vec_id<50) materializes once into the
    // driver-local probe relation at construction (r16), so the served
    // plan's corpus-side candidate ranking touches no embeddings at all
    val embScans = "Scan parquet".r.findAllIn(plan).size
    assert(embScans <= 2,
      s"q144 may read embeddings only for the rescore joins, found $embScans:\n$plan")
  }

  test("q155 SQ8 error audit reads the persisted codes, one corpus scan") {
    // the audit decodes the ARTIFACT against the corpus — it must read
    // sq8_codes (not re-quantize floats per run) and touch the
    // embeddings parquet exactly once; the top-10 must be a
    // distributed TakeOrdered, never a global row_number window over
    // the corpus-sized error frame
    val plan = planOf(llm.Similarity.q155Sq8Error(spark, sf))
    assert(plan.contains("sq8_codes"),
      s"q155 must read the persisted code table:\n$plan")
    val embScans = "Scan parquet".r.findAllIn(plan).size
    assert(embScans <= 1,
      s"q155 needs exactly one embeddings scan, found $embScans:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"q155 top-10 must be a distributed TakeOrdered:\n$plan")
  }

  test("q144 probe construction pushes the query filter to the corpus scan") {
    // the r16 ADVICE gate: the probe frame collects at CONSTRUCTION
    // time (AnnIndex.boundedLocal), so its plan never appears in the
    // search's executed plan — a pushdown regression there would be a
    // full embeddings scan per search construction, invisible to the
    // q144 plan test. Gate the pre-collect frame directly.
    val plan = planOf(llm.Similarity.sq8ProbeFrame(spark, sf))
    assert(plan.contains("LessThan(vec_id,50"),
      s"probe-side embeddings scan must push the vec_id filter:\n$plan")
  }

  test("q167 centered search serves the mean from the ledger artifact") {
    // q146's index-served scale path: the corpus mean must come from
    // the mean_stats delta ledger (#commits×Dim rows — NEVER a corpus
    // scan per query batch), candidates from probed-cell equi-joins
    // (ivf_cells), and the embeddings parquet may appear only for the
    // query side and the candidate payload join
    val plan = planOf(llm.Similarity.q167CenteredIvf(spark, sf))
    assert(plan.contains("mean_stats"),
      s"q167 must fold the persisted mean ledger:\n$plan")
    assert(plan.contains("ivf_cells"),
      s"q167 candidates must ride the probed-cell membership:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"cartesian product in q167 plan:\n$plan")
    val embScans = "Scan parquet".r.findAllIn(plan).size
    assert(embScans <= 2,
      s"q167 may scan embeddings only for query + candidates, found $embScans:\n$plan")
  }

  test("ANN artifact layout: probed-cell/bucket reads prune index files") {
    // the r16 physical-layout contract (r15 verdict Missing #1/#2):
    // ivf_cells is identity-partitioned by cell and lsh_buckets is
    // (t, bucket(8, b))-partitioned, so a probed search's In literal
    // prunes the artifact's FILES at the manifest layer — an nProbe=5
    // search reads ~nProbe/K of the membership instead of all of it
    val pfx = llm.AnnIndex.ensure(spark, sf)
    val Array(cat, ns) = pfx.split("\\.")
    def builderOf(table: String): graft.catalog.GraftScanBuilder =
      spark.sessionState.catalogManager.catalog(cat)
        .asInstanceOf[GraftCatalog]
        .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
          Array(ns), table))
        .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
        .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Map.of()))
        .asInstanceOf[graft.catalog.GraftScanBuilder]
    val cb = builderOf("ivf_cells")
    val totalCells = cb.prunedRelFiles.size
    cb.pushFilters(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("cell", Array[Any](0, 1))))
    val prunedCells = cb.prunedRelFiles.size
    assert(totalCells >= llm.AnnIndex.KCells,
      s"cells layout must write >= 1 file per occupied cell, got $totalCells")
    assert(prunedCells >= 1 && prunedCells < totalCells,
      s"In(cell) must prune the cells read: $totalCells -> $prunedCells")
    val lb = builderOf("lsh_buckets")
    val totalLsh = lb.prunedRelFiles.size
    lb.pushFilters(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("b", Array[Any](3))))
    val prunedLsh = lb.prunedRelFiles.size
    assert(prunedLsh >= 1 && prunedLsh < totalLsh,
      s"In(b) must prune the bucket dirs: $totalLsh -> $prunedLsh")
    // end-to-end: the searches push their probed literals into the
    // artifact scans (probed-cells-FIRST — the membership restriction
    // happens before any corpus payload join)
    val ivfPlan = planOf(llm.Similarity.q57AnnIvf(spark, sf))
    assert(ivfPlan.contains("In(cell"),
      s"q57 must push its probed cells into the ivf_cells scan:\n$ivfPlan")
    val lshPlan = planOf(llm.Similarity.q56AnnLsh(spark, sf))
    assert(lshPlan.contains("In(b"),
      s"q56 must push its probed buckets into the lsh_buckets scan:\n$lshPlan")
  }

  test("q175 source alignment folds the mean from the ledger artifact") {
    // the per-source drill-down must read the SAME maintained ledger
    // q167 serves from — never recompute the corpus mean per run — and
    // touch parquet only for the embeddings payload + the source join
    val plan = planOf(llm.Similarity.q175SourceAlignment(spark, sf))
    assert(plan.contains("mean_stats"),
      s"q175 must fold the persisted mean ledger:\n$plan")
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans <= 2,
      s"q175 may scan embeddings + documents only, found $scans:\n$plan")
  }

  test("q154 mutual-kNN keeps the cell-join geometry: no corpus NLJ") {
    // the membership read and pair cover sit BEHIND the pinned edge
    // checkpoint (guardedCellPairs — its exact-cover geometry is
    // property-tested in DedupGuardSpec); the visible plan is the
    // reciprocity join + cell fold, which must stay equi-join-only
    val plan = planOf(llm.Similarity.q154MutualKnn(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      s"cartesian product in q154 plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"q154 must pair members only through equi-joins:\n$plan")
  }

  test("q158 Heaps curve: no window, no rank — value-cut prefixes only") {
    // the curve must not globally rank the corpus: cutoffs come from
    // one max() and apply as filters, so the plan has no Window at all
    val plan = planOf(llm.TextAnalysis.q158HeapsLaw(spark, sf))
    assert(!plan.contains("Window"),
      s"q158 must not rank the corpus for its prefixes:\n$plan")
  }

  test("q159 template prefixes rank via distributed TakeOrdered") {
    val plan = planOf(llm.TextAnalysis.q159TemplatePrefix(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"),
      s"q159 top-20 must be a distributed TakeOrdered:\n$plan")
  }

  test("q164 PageRank iterations re-join the pinned graph, never the source") {
    // the iterative-join discipline: the edge list, degrees, and node
    // set pin once; all three unrolled iterations (and the final
    // top-10) must run against those pinned frames — an events rescan
    // per iteration is the shape that dies at scale
    val plan = planOf(ops.Extended.q164ItemPagerank(spark, sf))
    assert(!plan.contains("Scan parquet"),
      s"q164 iterations must read only the pinned frames:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"q164 top-10 must be a distributed TakeOrdered:\n$plan")
  }

  test("q177 triangle census runs over the pinned pair artifact only") {
    // wedges, closure, degrees, and the headline total all derive from
    // the pinned verified-pair frame — a corpus rescan (or worse, a
    // re-run of the MinHash pipeline) per consumer is the shape that
    // dies at scale; the card itself is a distributed TakeOrdered
    val plan = planOf(llm.Dedup.q177TriangleCensus(spark, sf))
    assert(!plan.contains("Scan parquet"),
      s"q177 must read only the pinned pair artifact:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"q177 top-10 must be a distributed TakeOrdered:\n$plan")
  }

  test("q178 attribution carries the touch in ONE user-bounded window") {
    // one events scan, one window pass partitioned by user — a global
    // window (or a per-purchase self-join back to the touches) is the
    // shape that dies at scale
    // the |channels|-bounded aggregate pins, so the executed card plan
    // derives from it and the events parquet is scanned exactly once —
    // at CONSTRUCTION, not per consumer
    val plan = planOf(ops.Scalars.q178LastTouch(spark, sf))
    assert(!plan.contains("Scan parquet"),
      s"q178 consumers read the pinned channel aggregate:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no self-join back to the touches:\n$plan")
    // the one corpus pass itself: user-bounded window, single scan
    val passPlan = planOf(ops.Scalars.lastTouchConversions(spark, sf))
    assert("Scan parquet".r.findAllIn(passPlan).size == 1,
      s"the conversion pass reads events exactly once:\n$passPlan")
    assert(passPlan.contains("windowspecdefinition(user_id"),
      s"the touch window must be user-bounded, never global:\n$passPlan")
  }

  test("q179 iterations re-join the pinned Gram, corpus scanned once") {
    // the d²-bounded Gram pins at construction (ONE map-only corpus
    // pass); all six unrolled power iterations, the Rayleigh fold, and
    // the card must derive from pinned frames — the executed plan may
    // not touch the embeddings parquet at all
    val plan = planOf(llm.Similarity.q179PrincipalDirection(spark, sf))
    assert(!plan.contains("Scan parquet"),
      s"q179 must read only the pinned Gram/vector frames:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"q179 top-10 must be a distributed TakeOrdered:\n$plan")
  }

  test("q182 MMR steps re-join the pinned candidate frames only") {
    // the candidate SETS ride the memoized brute-truth artifact (one
    // brute pass per session — construction, not this plan); the
    // executed plan may touch the embeddings parquet at most once, for
    // the k-bounded candidate payload join, and the four greedy steps
    // must run entirely over the pinned frames
    val plan = planOf(llm.Similarity.q182MmrRerank(spark, sf))
    assert("Scan parquet".r.findAllIn(plan).size <= 1,
      s"q182 may scan the corpus only for the candidate payload:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"no brute pass inside the MMR plan — that lives in the artifact:\n$plan")
  }

  test("q183 HITS half-steps re-join the pinned bipartite frame only") {
    val plan = planOf(ops.Extended.q183Hits(spark, sf))
    assert(!plan.contains("Scan parquet"),
      s"q183 must read only the pinned ids-only frames:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"q183 top-10 must be a distributed TakeOrdered:\n$plan")
  }

  test("q181 weighted sample is one map-only pass + TakeOrdered") {
    // the E-S selection: one documents scan computes (weight, draw,
    // priority); the k-best cut must be a distributed TakeOrdered — a
    // global sort (or a second corpus pass) is the shape that dies
    val plan = planOf(llm.Curation.q181WeightedSample(spark, sf))
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"q181 is one pass over documents:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"q181's top-100 must be a distributed TakeOrdered:\n$plan")
  }

  test("q184 deflation re-joins the memoized Gram artifact only") {
    // the centered Gram memoizes per (session, corpus): q184's
    // deflation + second iteration must ride the pinned d²-bounded
    // frames, never a second corpus pass
    val plan = planOf(llm.Similarity.q184SecondDirection(spark, sf))
    assert(!plan.contains("Scan parquet"),
      s"q184 must read only the pinned Gram/vector frames:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"q184 top-10 must be a distributed TakeOrdered:\n$plan")
  }

  test("q185/q186 event cards: one scan, user-bounded windows only") {
    for ((name, df) <- Seq(
        "q185" -> ops.Scalars.q185SessionQuality(spark, sf),
        "q186" -> ops.Scalars.q186Burstiness(spark, sf))) {
      val plan = planOf(df)
      assert("Scan parquet".r.findAllIn(plan).size == 1,
        s"$name is one pass over events:\n$plan")
      assert(plan.contains("windowspecdefinition(user_id"),
        s"$name windows must be user-bounded, never global:\n$plan")
    }
  }

  test("q187/q188: one corpus pass, bounded-frame derivations") {
    // q187's cumulative walk runs over the value-bounded lag histogram
    // (one events scan total — never a per-channel sort of raw
    // conversions); q188's margins derive from the pinned 24·|types|
    // cell frame (zero rescans in the executed plan)
    val p187 = planOf(ops.Scalars.q187ConversionLag(spark, sf))
    assert(!p187.contains("Scan parquet"),
      s"q187 derivations read the pinned lag histogram:\n$p187")
    val p188 = planOf(ops.Scalars.q188TypeHourProfile(spark, sf))
    assert(!p188.contains("Scan parquet"),
      s"q188 margins must derive from the pinned cell frame:\n$p188")
  }

  test("q147 doc keywords serve from the maintained artifact table") {
    // the r13/r14 verdict ask: keywords are index-MAINTAINED, not just
    // index-served — a read is the doc_keywords table plus an order,
    // with no corpus scan, no postings scan, no scoring window re-run
    // per read
    val plan = planOf(llm.TextAnalysis.q147DocKeywords(spark, sf))
    assert(!plan.contains("Scan parquet"),
      s"keyword serving must read only the persisted artifact:\n$plan")
    assert(plan.contains("doc_keywords"),
      s"q147 must read the maintained keyword table:\n$plan")
    assert(!plan.contains("postings"),
      s"a keyword READ must not re-price from postings:\n$plan")
    assert(!plan.contains("Window"),
      s"a keyword READ must not re-run the scoring window:\n$plan")
  }

  test("q145 collocations rank via distributed TakeOrdered, not a global window") {
    // the top-20 must come from TakeOrderedAndProject (a distributed
    // partial top-k) so the unpartitioned rank window only ever sees
    // the 20 survivors — never the full bigram set through one task
    val plan = planOf(llm.TextAnalysis.q145Collocations(spark, sf))
    assert(plan.contains("TakeOrderedAndProject(limit=20"),
      s"q145 must TakeOrdered before ranking:\n$plan")
    val windowIdx = plan.indexOf("Window")
    val takeIdx = plan.indexOf("TakeOrderedAndProject")
    assert(windowIdx >= 0 && takeIdx > windowIdx,
      s"the rank window must sit ABOVE the TakeOrdered limit:\n$plan")
  }

  test("q149 triplets keep the cell-join geometry: no corpus NLJ") {
    // negatives come from each anchor's single IVF cell via an
    // equi-join; nothing in the plan may fall back to a corpus-sized
    // nested loop or cartesian product
    val plan = planOf(llm.Similarity.q149ContrastiveTriplets(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      s"cartesian product in q149 plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"q149 must join cells and ids only, no nested loop:\n$plan")
  }

  test("q137 cluster cards are index-served end-to-end: zero corpus scans") {
    // both inputs are persisted artifacts — ivf_cells for membership,
    // postings for per-doc term counts; the card build must never
    // re-tokenize (or even scan) the document text
    val plan = planOf(llm.Similarity.q137ClusterCards(spark, sf))
    assert(!plan.contains("Scan parquet"),
      s"card build must read only the persisted artifacts:\n$plan")
  }

  test("as-of join is one shuffle + window, not a per-row subquery") {
    val plan = planOf(ops.Relational.q10AsofJoin(spark, sf))
    assert(plan.contains("Window"), s"expected window-based as-of:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"as-of join degenerated to NLJ:\n$plan")
  }

  test("row-level rewrite scan never pushes data filters to the delegate") {
    // LOAD-BEARING: the ReplaceData write-back needs EVERY surviving row
    // of an affected file. If the rewrite scan ever hands the command
    // condition to the parquet delegate, row groups holding only
    // non-matching rows get skipped and their rows silently vanish from
    // the rewrite. The batch read of the same table MUST still push.
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.rw")
    spark.sql("CREATE TABLE graft.rw.t (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft.rw.t VALUES (1, 10), (2, 200)")

    val batchPlan = spark.sql("SELECT * FROM graft.rw.t WHERE v > 100")
      .queryExecution.executedPlan.toString
    assert(batchPlan.contains("PushedFilters: [IsNotNull(v), GreaterThan(v,100)]"),
      s"batch scan lost its pushdown:\n$batchPlan")

    val rewritePlan = spark.sql(
      "EXPLAIN FORMATTED DELETE FROM graft.rw.t WHERE v > 100")
      .collect().map(_.getString(0)).mkString("\n")
    assert(rewritePlan.contains("ReplaceData"), s"not a rewrite:\n$rewritePlan")
    assert(!rewritePlan.contains("GreaterThan(v,100)"),
      s"rewrite scan pushed the command condition to the delegate " +
        s"(row-group skipping would drop surviving rows):\n$rewritePlan")
  }

  test("string pushed-filter pruning follows parquet's unsigned UTF-8 order") {
    // LOAD-BEARING: the harvested string [min,max] were chosen by
    // parquet under unsigned UTF-8 byte order, and Spark compares
    // string rows the same way (UTF8String). A UTF-16 comparison
    // disagrees for [U+E000, U+FFFF] vs supplementary characters —
    // here it would call the emoji below the min and prune the only
    // file, silently returning zero rows for a present value.
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ustr")
    spark.sql("CREATE TABLE graft.ustr.t (k STRING, v INT)")
    import spark.implicits._
    val rep = "\uFFFD"
    val emoji = "\uD83D\uDE00"
    Seq((rep, 1), (emoji, 2)).toDF("k", "v")
      .coalesce(1).writeTo("graft.ustr.t").append()
    assert(spark.sql(s"SELECT v FROM graft.ustr.t WHERE k = '$emoji'")
      .collect().map(_.getInt(0)).toSeq == Seq(2))
    assert(spark.sql(s"SELECT v FROM graft.ustr.t WHERE k > '$rep'")
      .collect().map(_.getInt(0)).toSeq == Seq(2))
    assert(spark.sql(s"SELECT v FROM graft.ustr.t WHERE k <= '$rep'")
      .collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("long string bounds truncate in the manifest, pruning stays sound") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.trunc")
    spark.sql("CREATE TABLE graft.trunc.t (k STRING, v INT)")
    import spark.implicits._
    // two files with long values: one 'aaaa…' prefix family, one 'zzzz…'
    val a = "a" * 40
    val z = "z" * 40
    Seq((a + "1", 1), (a + "2", 2)).toDF("k", "v")
      .coalesce(1).writeTo("graft.trunc.t").append()
    Seq((z + "1", 3)).toDF("k", "v").coalesce(1).writeTo("graft.trunc.t").append()
    // stored bounds are TRUNCATED (≤ 17 code points incl. the upper
    // bound's increment), never the 41-char values
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.catalog.GraftCatalog]
    val stats = cat.metadataStore.load(Seq("trunc"), "t")._1
      .currentSnapshot.get.fileStats.values.flatten.filter(_.name == "k")
    assert(stats.nonEmpty)
    assert(stats.forall(s => s.min.length <= 17 && s.max.length <= 17),
      stats.map(s => (s.min, s.max)).toString)
    // loosened bounds must never prune a matching file: an exact lookup
    // past the truncation point still finds its row…
    assert(spark.sql(s"SELECT v FROM graft.trunc.t WHERE k = '${a}2'")
      .collect().map(_.getInt(0)).toSeq == Seq(2))
    assert(spark.sql(s"SELECT v FROM graft.trunc.t WHERE k > '${a}1'")
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3))
    // …and clearly-disjoint prefixes still prune whole files
    val builder = cat.loadTable(org.apache.spark.sql.connector.catalog
        .Identifier.of(Array("trunc"), "t"))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of()))
      .asInstanceOf[graft.catalog.GraftScanBuilder]
    val all = builder.prunedRelFiles.size
    builder.pushFilters(Array(
      org.apache.spark.sql.sources.GreaterThan("k", "m")))
    assert(all == 2 && builder.prunedRelFiles.size == 1,
      s"disjoint-prefix pruning: $all -> ${builder.prunedRelFiles.size}")
  }

  test("vocab-derived queries scan the corpus parquet at most once") {
    // q113/q114/q115's scale claim, gated on the executed plan: the
    // weighted vocab / per-source aggregate is localCheckpointed, so
    // BPE training rounds, the encode join, and the sampling rates all
    // derive from ExistingRDD scans — the corpus parquet appears at
    // most once (q114: zero times) no matter how many rounds unroll
    def parquetScans(df: org.apache.spark.sql.DataFrame): Int =
      "Scan parquet".r.findAllIn(planOf(df)).size
    assert(parquetScans(llm.TextAnalysis.q114BpeTrain(spark, sf)) == 0,
      "training rounds must derive from the checkpointed vocab")
    assert(parquetScans(llm.TextAnalysis.q115BpeEncode(spark, sf)) == 1,
      "encode: one corpus scan for occurrence counts, vocab from checkpoint")
    assert(parquetScans(llm.Curation.q113QualitySample(spark, sf)) == 1,
      "sampling: one corpus scan; rates from the checkpointed aggregate")
    assert(parquetScans(llm.Curation.q119LmXent(spark, sf)) == 0,
      "LM scoring: LM tables, vocab sizes, and scoring all derive from " +
        "the checkpointed ids-only result — no rescans in the served plan")
    // r16: the LM family carries NO corpus-sized cache or pin at all —
    // the bigram frame recomputes from its map-only lineage (measured
    // faster than the r15 MEMORY_AND_DISK persist, and the only shape
    // with zero cluster-wide state to lose); the gate pins that
    // discipline at the source level: no persist anywhere in either
    // function body, and the eager checkpoint only on the ids+longs
    // result
    val p131 = planOf(llm.Curation.q131LmHeldout(spark, sf))
    assert(parquetScans(llm.Curation.q131LmHeldout(spark, sf)) == 0,
      s"held-out LM scoring must serve from its pinned result:\n$p131")
    val srcCur = {
      val s2 = scala.io.Source.fromFile(
        "src/main/scala/graft/llm/Curation.scala", "UTF-8")
      try s2.mkString finally s2.close()
    }
    def occurrences(h: String, n: String): Int =
      h.sliding(n.length).count(_ == n)
    val body131 = srcCur.substring(srcCur.indexOf("def q131LmHeldout"),
      srcCur.indexOf("\n  val q131Sql"))
    val body119 = srcCur.substring(srcCur.indexOf("def q119LmXent"),
      srcCur.indexOf("\n  val q119Sql"))
    assert(occurrences(body131, ".persist(") == 0 &&
      occurrences(body119, ".persist(") == 0,
      "the LM family must not cache its corpus-sized bigram frame")
  }

  test("BPE training scales to 100 merges: flat plan depth, zero rescans") {
    // real tokenizers learn 10k-50k merges; per-round localCheckpoint
    // truncation keeps round r's plan constant-size (the unrolled r9
    // chain grew plan depth per merge and could not scale rounds)
    def parquetScans(df: org.apache.spark.sql.DataFrame): Int =
      "Scan parquet".r.findAllIn(planOf(df)).size
    val (merges, vocab) = llm.TextAnalysis.trainBpeChain(spark, sf, 100)
    // either all 100 train, or training stopped because the vocab
    // genuinely exhausted (every word collapsed to a single symbol —
    // no pair left to merge); never a silent cap
    import org.apache.spark.sql.functions.{col, size, split}
    assert(merges.size == 100 ||
      vocab.filter(size(split(col("ts"),
        llm.TextAnalysis.bpeDelimiter)) >= 2).isEmpty,
      s"stopped at ${merges.size} merges with pairs still available")
    assert(merges.size > 50, s"deep training exercised: ${merges.size} rounds")
    // every frame derives from the checkpointed vocab — the corpus
    // parquet was scanned exactly once, at vocab build
    assert(parquetScans(vocab) == 0, "merged vocab must not rescan parquet")
    assert(parquetScans(merges.last) == 0, "merges must not rescan parquet")
    // flat plan depth: a checkpointed frame's plan is a single RDD scan
    // regardless of round index
    assert(planOf(vocab).linesIterator.size < 40,
      s"round-100 vocab plan must stay truncated:\n${planOf(vocab)}")
    // the 3-round prefix is exactly q114's learned table (determinism
    // and consistency of the generalized loop with the oracle instance)
    val first3 = merges.take(3).map(_.collect().head)
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val q114 = llm.TextAnalysis.q114BpeTrain(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(first3 == q114, s"N-merge prefix diverged from q114: $first3 vs $q114")
    // merges compound: later rounds may merge multi-char symbols, and
    // no (pair) is learned twice
    val all = merges.map(_.collect().head).map(r => (r.getString(0), r.getString(1)))
    assert(all.distinct.size == all.size, "a merge pair was learned twice")
  }
}
