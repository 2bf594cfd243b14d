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
}
