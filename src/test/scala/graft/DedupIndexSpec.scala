package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.llm.Dedup

/** Incremental near-dup dedup against the persisted MinHash band index:
  * the batch-vs-index join must find EXACTLY the pairs the full-corpus
  * q52 finds among pairs touching the batch — the incremental path is
  * an optimization, never a recall change. */
class DedupIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("incremental dedup equals full-corpus dedup restricted to the batch") {
    val full = Dedup.q52MinHashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val touchingBatch = full.filter { case (a, b, _) =>
      a % 10 == 7 || b % 10 == 7 }
    val incremental = Dedup.q93IncrementalDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(incremental == touchingBatch,
      s"incremental missed ${touchingBatch -- incremental}, " +
        s"invented ${incremental -- touchingBatch}")
  }

  test("the band index is a real catalog table and refresh appends only the batch") {
    val prefix = Dedup.ensureBandIndex(spark, sf)
    val before = spark.table(s"$prefix.minhash_bands").count()
    assert(before > 0, "index table must hold the base corpus bands")
    // a refresh = appending the ingested batch's bands (ids only) —
    // one snapshot commit, linear in the batch
    val batchBands = before / 9 // base is 9/10ths of the corpus ⇒ ≈1/9 more
    val docs = Tables.documents(spark, sf).filter(col("doc_id") % 10 === 7)
    assert(docs.count() * 16 >= batchBands, "sanity: 16 bands per doc")
    val history = spark.sql(
      s"SELECT COUNT(*) FROM graft_dedup.${prefix.split("\\.").last}.`minhash_bands$$history`")
      .collect()(0).getLong(0)
    assert(history >= 1, "the index build must be a snapshot commit")
  }

  test("dedupIngestStream dedups each batch against everything before it") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-dsi-wh").toString
    spark.conf.set("spark.sql.catalog.dsi",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.dsi.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dsi.ing")
    spark.sql("CREATE TABLE dsi.ing.docs (doc_id BIGINT, text STRING)")
    spark.sql("CREATE TABLE dsi.ing.bands (band INT, bh BIGINT, doc_id BIGINT)")
    spark.sql("CREATE TABLE dsi.ing.pairs (doc_a BIGINT, doc_b BIGINT, jaccard DOUBLE)")
    val dupText = "alpha beta gamma delta epsilon zeta eta theta"
    Seq((1L, dupText), (2L, dupText),
        (3L, "completely different words here entirely"))
      .toDF("doc_id", "text").writeTo("dsi.ing.docs").append()

    val ckpt = java.nio.file.Files.createTempDirectory("graft-dsi-ckpt").toString
    def pairsNow(): Set[(Long, Long)] = spark.table("dsi.ing.pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val q = Dedup.dedupIngestStream(spark, "dsi.ing.docs", "dsi.ing.bands",
      "dsi.ing.pairs", ckpt)
    try {
      // batch 1: the within-batch dup is found with an EMPTY index
      q.processAllAvailable()
      assert(pairsNow() == Set((1L, 2L)), pairsNow().toString)
      assert(spark.table("dsi.ing.bands").count() == 3 * 16) // 16 bands/doc

      // batch 2: a doc duplicating BATCH-1 content must pair across
      // batches via the index (plus nothing for the fresh doc)
      Seq((11L, dupText), (12L, "yet more unrelated vocabulary tokens"))
        .toDF("doc_id", "text").writeTo("dsi.ing.docs").append()
      q.processAllAvailable()
      assert(pairsNow() == Set((1L, 2L), (1L, 11L), (2L, 11L)), pairsNow().toString)
      assert(spark.table("dsi.ing.bands").count() == 5 * 16)
    } finally q.stop()

    // restart from the same checkpoint: fenced no-ops, nothing doubles
    val q2 = Dedup.dedupIngestStream(spark, "dsi.ing.docs", "dsi.ing.bands",
      "dsi.ing.pairs", ckpt)
    try {
      q2.processAllAvailable()
      assert(pairsNow() == Set((1L, 2L), (1L, 11L), (2L, 11L)))
      assert(spark.table("dsi.ing.bands").count() == 5 * 16)
    } finally q2.stop()
  }
}
