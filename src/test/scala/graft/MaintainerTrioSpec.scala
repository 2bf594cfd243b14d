package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.llm.{AnnIndex, Dedup}

/** The five unattended maintainers — `Curation.funnelIngestStream`,
  * `Dedup.dedupMaintainStream`, `AnnIndex.maintainStream`,
  * `Curation.driftIngestStream`, and `TextAnalysis.bm25MaintainStream`
  * (dedup and BM25 in their $changes-tailing forms, departures
  * included) — run against ONE living corpus at once, each with its
  * own checkpoint and fence key (FunnelBatchKey / MaintainBatchKey /
  * the ANN version stamps / DriftBatchKey / Bm25DepKey+Bm25ArrKey).
  * The
  * composition must not interfere: every maintainer
  * applies each commit exactly once regardless of how the others pace
  * their triggers, a restart of the whole trio lands on fenced no-ops,
  * and the ANN maintainer still vacuums departures after the others
  * detach. Final-state assertions are deliberately trigger-boundary
  * independent — the streams run concurrently, so commits may reach
  * each maintainer in different micro-batch groupings. */
class MaintainerTrioSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def emb(id: Long): Array[Float] =
    Array((id % 7 + 1).toFloat, ((id * 3) % 5).toFloat,
      (id % 2).toFloat, 1.0f)

  test("funnel + dedup + ANN + drift + BM25 maintainers share one corpus") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-trio-wh").toString
    spark.conf.set("spark.sql.catalog.trio",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.trio.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS trio.ing")
    // ONE corpus table serving all three: text columns for the funnel
    // and dedup maintainers, vec_id/embedding for the ANN maintainer
    spark.sql("""CREATE TABLE trio.ing.docs (doc_id BIGINT, text STRING,
      source STRING, vec_id BIGINT, embedding ARRAY<FLOAT>)""")
    spark.sql("CREATE TABLE trio.ing.fbands (band INT, bh BIGINT, doc_id BIGINT)")
    spark.sql("""CREATE TABLE trio.ing.verdicts (doc_id BIGINT, source STRING,
      n_tokens BIGINT, filter_keep BOOLEAN, dedup_keep BOOLEAN,
      sample_keep BOOLEAN)""")
    spark.sql("CREATE TABLE trio.ing.dbands (band INT, bh BIGINT, doc_id BIGINT)")
    spark.sql("CREATE TABLE trio.ing.pairs (doc_a BIGINT, doc_b BIGINT, jaccard DOUBLE)")
    spark.sql("CREATE TABLE trio.ing.counts (b BIGINT, cnt BIGINT)")
    spark.sql("CREATE TABLE trio.ing.monitor (batch_id INT, n_tokens BIGINT, kl6 DOUBLE)")
    spark.sql("CREATE TABLE trio.ing.postings " +
      "(term STRING, doc_id BIGINT, tf BIGINT, positions ARRAY<INT>) " +
      "PARTITIONED BY (bucket(4, term))")
    spark.sql("CREATE TABLE trio.ing.doclen (doc_id BIGINT, dl BIGINT)")
    spark.sql("CREATE TABLE trio.ing.bm25stats " +
      "(n_delta BIGINT, sumdl_delta BIGINT)")

    val longA = (1 to 22).map(i => s"alpha$i").mkString(" ")
    val longB = (1 to 22).map(i => s"beta$i").mkString(" ")
    val longC = (1 to 22).map(i => s"gamma$i").mkString(" ")
    val longD = (1 to 22).map(i => s"delta$i").mkString(" ")
    def rows(rs: (Long, String)*) =
      rs.map { case (id, t) => (id, t, "s0", id, emb(id)) }
        .toDF("doc_id", "text", "source", "vec_id", "embedding")

    // batch 1: 1 kept; 2 duplicates 1; 4 fails the funnel filter
    // (brace) — but IS a corpus row, so dedup and ANN index it anyway
    rows((1L, longA), (2L, longA), (4L, longB + " {"))
      .writeTo("trio.ing.docs").append()
    AnnIndex.buildFromCorpus(spark, "trio.ing.docs", "trio.trioidx")

    def ckpt(n: String) =
      java.nio.file.Files.createTempDirectory(s"graft-trio-$n").toString
    val (cF, cD, cA, cM, cB) =
      (ckpt("f"), ckpt("d"), ckpt("a"), ckpt("m"), ckpt("b"))
    def startF() = llm.Curation.funnelIngestStream(spark, "trio.ing.docs",
      "trio.ing.fbands", "trio.ing.verdicts", Map("s0" -> 1.0), cF)
    def startD() = Dedup.dedupMaintainStream(spark, "trio.ing.docs",
      "trio.ing.dbands", "trio.ing.pairs", cD)
    def startA() = AnnIndex.maintainStream(spark, "trio.ing.docs",
      "trio.trioidx", cA)
    def startM() = llm.Curation.driftIngestStream(spark, "trio.ing.docs",
      "trio.ing.counts", "trio.ing.monitor", cM)
    def startB() = llm.TextAnalysis.bm25MaintainStream(spark, "trio.ing.docs",
      "trio.ing.postings", "trio.ing.doclen", "trio.ing.bm25stats", cB)
    // the BM25 serving invariant: at every quiesce point the served
    // ranking equals a fresh corpus-scan ranking, triggers be damned
    val irQueries = Seq((1, "alpha3 beta4"), (2, "delta7"))
    def served(): Set[(Int, Long, Double, Int)] =
      llm.TextAnalysis.bm25ServeFrom(spark, "trio.ing.postings",
          "trio.ing.doclen", "trio.ing.bm25stats", irQueries).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    def scanRef(): Set[(Int, Long, Double, Int)] =
      llm.TextAnalysis.bm25RankingOver(spark,
          spark.table("trio.ing.docs").select(col("doc_id"), col("text")),
          irQueries).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet

    def verdicts(): Map[Long, (Boolean, Boolean)] =
      spark.table("trio.ing.verdicts").collect()
        .map(r => r.getLong(0) -> ((r.getBoolean(3), r.getBoolean(4)))).toMap
    def pairs(): Set[(Long, Long)] = spark.table("trio.ing.pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def fIds(): Set[Long] = spark.table("trio.ing.fbands")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    def ivfCount(): Long = spark.table("trio.trioidx.ivf_cells").count()

    // the r13 artifact columns must TRACK the composed churn: ivf_rd
    // equals a from-scratch recompute over the live membership and
    // sq8_codes covers exactly the live corpus ids, at every quiesce
    // point regardless of how the maintainers grouped the commits
    def annArtifactsInSync(): Unit = {
      graft.functions.VectorFunctions.register(spark)
      val cells = spark.table("trio.trioidx.ivf_cells")
      val vecs = cells.select(col("vec_id"), col("nrm"))
        .join(spark.table("trio.ing.docs")
          .select(col("vec_id"), col("embedding")), Seq("vec_id"))
      val fresh = AnnIndex.rdStats(cells.select(col("cell"), col("vec_id")),
          vecs).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val got = spark.table("trio.trioidx.ivf_rd").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(got == fresh, s"ivf_rd out of sync: got $got expected $fresh")
      val codes = spark.table("trio.trioidx.sq8_codes").select("vec_id")
        .collect().map(_.getLong(0)).toSet
      val live = spark.table("trio.ing.docs").select("vec_id")
        .collect().map(_.getLong(0)).toSet
      assert(codes == live, s"sq8_codes out of sync: $codes vs live $live")
      // the r15 mean ledger: folded (sj, n) must equal a fresh
      // recompute over the live corpus at every quiesce point —
      // refresh appends and vacuum corrections are exact integers, so
      // equality is bit-for-bit, not approximate
      val ledger = spark.table("trio.trioidx.mean_stats")
        .groupBy(col("j")).agg(sum(col("sj_delta")).as("sj"),
          sum(col("n_delta")).as("n"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      val freshMean = AnnIndex.meanDeltaOf(spark.table("trio.ing.docs")
          .select(col("vec_id"), col("embedding")))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(ledger == freshMean,
        s"mean_stats out of sync: $ledger vs fresh $freshMean")
    }

    // total whitespace tokens ingested so far — the drift monitor's
    // reference must hold EXACTLY this many counts at every quiesce
    // point, no matter how its triggers grouped the commits
    def tokensIngested(): Long = spark.table("trio.ing.docs")
      .select(org.apache.spark.sql.functions.size(
        split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .agg(sum(col("n"))).head.getLong(0)
    def refCount(): Long = spark.table("trio.ing.counts")
      .agg(coalesce(sum(col("cnt")), lit(0L))).head.getLong(0)

    val (qF, qD, qA, qM, qB) =
      (startF(), startD(), startA(), startM(), startB())
    try {
      Seq(qF, qD, qA, qM, qB).foreach(_.processAllAvailable())
      assert(refCount() == tokensIngested(), "drift reference out of sync")
      assert(served() == scanRef(), "BM25 index out of sync after batch 1")
      assert(verdicts() == Map(1L -> ((true, true)), 2L -> ((true, false)),
        4L -> ((false, false))), verdicts().toString)
      assert(pairs() == Set((1L, 2L)), pairs().toString)
      assert(fIds() == Set(1L), "funnel indexes dedup survivors only")
      assert(spark.table("trio.ing.dbands").count() == 3 * 16,
        "dedup indexes every corpus doc")
      assert(ivfCount() == 3)

      // two commits land back-to-back while all three run — each
      // maintainer may group them into micro-batches differently
      rows((11L, longA), (12L, longC), (13L, longB))
        .writeTo("trio.ing.docs").append()
      rows((21L, longD)).writeTo("trio.ing.docs").append()
      Seq(qF, qD, qA, qM, qB).foreach(_.processAllAvailable())
      assert(refCount() == tokensIngested(), "drift reference out of sync")
      assert(served() == scanRef(), "BM25 index out of sync after growth")
      assert(spark.table("trio.ing.doclen").count() ==
        spark.table("trio.ing.docs").count())
      assert(spark.table("trio.ing.monitor").count() >= 2,
        "drift monitor must have scored the later commits")

      assert(verdicts() == Map(
        1L -> ((true, true)), 2L -> ((true, false)), 4L -> ((false, false)),
        11L -> ((true, false)), // cross-batch dup of retained content
        12L -> ((true, true)),
        13L -> ((true, true)),  // doc 4's content was funnel-rejected,
                                // so it never poisoned the funnel index
        21L -> ((true, true))), verdicts().toString)
      // dedup (no filter stage) DID index doc 4, so 13 pairs with it
      assert(pairs() == Set((1L, 2L), (1L, 11L), (2L, 11L), (4L, 13L)),
        pairs().toString)
      assert(fIds() == Set(1L, 12L, 13L, 21L))
      assert(spark.table("trio.ing.dbands").count() == 7 * 16)
      assert(ivfCount() == 7)
      assert(spark.table("trio.trioidx.lsh_buckets").count() ==
        7 * AnnIndex.LshSeeds.length)
      annArtifactsInSync()
    } finally Seq(qF, qD, qA, qM, qB).foreach(_.stop())

    // restart the whole trio from its checkpoints: replays land on
    // fenced no-ops in every output table — nothing double-applies
    val monitorRows = spark.table("trio.ing.monitor").count()
    val postingsRows = spark.table("trio.ing.postings").count()
    val (qF2, qD2, qA2, qM2, qB2) =
      (startF(), startD(), startA(), startM(), startB())
    try {
      Seq(qF2, qD2, qA2, qM2, qB2).foreach(_.processAllAvailable())
      assert(spark.table("trio.ing.postings").count() == postingsRows,
        "restart must not double-append postings (tf/df would inflate)")
      assert(served() == scanRef(), "BM25 serving must survive restart")
      assert(refCount() == tokensIngested(),
        "restart must not double-count the drift reference")
      assert(spark.table("trio.ing.monitor").count() == monitorRows,
        "restart must not re-score batches")
      assert(spark.table("trio.ing.verdicts").count() == 7)
      assert(pairs().size == 4)
      assert(spark.table("trio.ing.fbands").select("doc_id").distinct()
        .count() == 4)
      assert(spark.table("trio.ing.dbands").count() == 7 * 16)
      assert(ivfCount() == 7)
      annArtifactsInSync()
    } finally Seq(qF2, qD2, qM2, qA2, qB2).foreach(_.stop())

    // the data-tail maintainers detach (a plain tail cannot absorb CoW
    // survivor re-delivery); the three $changes tails — ANN, BM25, and
    // dedup — must absorb the departure on their own, restarted from
    // their checkpoints so the earlier finally could stop all five
    // queries (a failed assertion above must not leak a running stream)
    val (qA3, qB3, qD3) = (startA(), startB(), startD())
    try {
      spark.sql("DELETE FROM trio.ing.docs WHERE doc_id = 21")
      Seq(qA3, qB3, qD3).foreach(_.processAllAvailable())
      assert(ivfCount() == 6, "departed vector must vacuum")
      assert(spark.table("trio.trioidx.lsh_buckets")
        .where(col("vec_id") === 21L).count() == 0L)
      assert(spark.table("trio.trioidx.lsh_buckets").count() ==
        6 * AnnIndex.LshSeeds.length,
        "CoW survivors must not re-index")
      assert(spark.table("trio.ing.postings")
        .where(col("doc_id") === 21L).count() == 0L,
        "departed doc's postings must not inflate df")
      assert(served() == scanRef(),
        "BM25 serving must track the departure (CoW survivors included)")
      assert(spark.table("trio.ing.dbands")
        .where(col("doc_id") === 21L).count() == 0L,
        "departed doc's bands must not nominate it as a dup partner")
      assert(spark.table("trio.ing.dbands").count() == 6 * 16)
      assert(pairs() == Set((1L, 2L), (1L, 11L), (2L, 11L), (4L, 13L)),
        "no retained pair touches the departed doc")
      annArtifactsInSync()
    } finally Seq(qA3, qB3, qD3).foreach(_.stop())
  }
}
