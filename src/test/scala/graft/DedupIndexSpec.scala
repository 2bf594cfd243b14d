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
      // batches via the index (plus nothing for the fresh doc).
      // Seed stale skew advice first: the REAL maintainer commit path
      // must clear the adjacency's families (the r16 Missing #3 hook),
      // SCOPED to the maintained pair table (r17 ADVICE) — an
      // unrelated dir's census family must survive
      graft.Skew.adviseKey("dsi.ing.pairs#dups.verified_adjacency", 2L)
      graft.Skew.adviseKey("otherdir#dups.verified_adjacency", 5L)
      Seq((11L, dupText), (12L, "yet more unrelated vocabulary tokens"))
        .toDF("doc_id", "text").writeTo("dsi.ing.docs").append()
      q.processAllAvailable()
      assert(pairsNow() == Set((1L, 2L), (1L, 11L), (2L, 11L)), pairsNow().toString)
      assert(spark.table("dsi.ing.bands").count() == 5 * 16)
      assert(graft.Skew
        .advisedMax("dsi.ing.pairs#dups.verified_adjacency").isEmpty,
        "ingest maintainer commit must invalidate the adjacency's advice")
      assert(graft.Skew
        .advisedMax("otherdir#dups.verified_adjacency").contains(5L),
        "an unrelated artifact's families must survive a scoped commit")
      graft.Skew.invalidateAdvice("otherdir") // cleanup
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

  test("dedupMaintainStream retracts a departed doc's bands and pairs; update re-pairs") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-dmd-wh").toString
    spark.conf.set("spark.sql.catalog.dmd",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.dmd.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dmd.ing")
    spark.sql("CREATE TABLE dmd.ing.docs (doc_id BIGINT, text STRING)")
    spark.sql("CREATE TABLE dmd.ing.bands (band INT, bh BIGINT, doc_id BIGINT)")
    spark.sql("CREATE TABLE dmd.ing.pairs (doc_a BIGINT, doc_b BIGINT, jaccard DOUBLE)")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dmd-ckpt").toString
    val dupText = "alpha beta gamma delta epsilon zeta eta theta"
    val other = "totally different vocabulary occupies this document body"
    def pairsNow(): Set[(Long, Long)] = spark.table("dmd.ing.pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def start() = Dedup.dedupMaintainStream(spark, "dmd.ing.docs",
      "dmd.ing.bands", "dmd.ing.pairs", ckpt)
    Seq((1L, dupText), (2L, dupText), (3L, other))
      .toDF("doc_id", "text").writeTo("dmd.ing.docs").append()
    val q = start()
    try {
      q.processAllAvailable()
      assert(pairsNow() == Set((1L, 2L)), pairsNow().toString)
      assert(spark.table("dmd.ing.bands").count() == 3 * 16)

      // doc 2 departs: its bands stop nominating it and the (1,2)
      // verdict — a claim about text that no longer exists — retracts
      spark.sql("DELETE FROM dmd.ing.docs WHERE doc_id = 2")
      q.processAllAvailable()
      assert(spark.table("dmd.ing.bands")
        .where(col("doc_id") === 2L).count() == 0L,
        "stale bands would false-drop future arrivals")
      assert(pairsNow() == Set.empty, s"dead pair must retract: ${pairsNow()}")

      // doc 3's revision now duplicates doc 1: the update walks as
      // retract-old-state + re-sign postimage, pairing against CURRENT
      // content the moment it lands
      spark.sql(s"UPDATE dmd.ing.docs SET text = '$dupText' WHERE doc_id = 3")
      q.processAllAvailable()
      assert(pairsNow() == Set((1L, 3L)),
        s"revision duplicating retained content must pair: ${pairsNow()}")
      assert(spark.table("dmd.ing.bands").count() == 2 * 16)
    } finally q.stop()

    // restart: fenced no-ops + idempotent merge-deletes
    val (b0, p0) = (spark.table("dmd.ing.bands").count(),
      spark.table("dmd.ing.pairs").count())
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(spark.table("dmd.ing.bands").count() == b0)
      assert(spark.table("dmd.ing.pairs").count() == p0)
      assert(pairsNow() == Set((1L, 3L)))
    } finally q2.stop()
  }

  test("bandVacuum reconciles index and pairs after unattended churn") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-bvc-wh").toString
    spark.conf.set("spark.sql.catalog.bvc",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.bvc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bvc.ing")
    spark.sql("CREATE TABLE bvc.ing.docs (doc_id BIGINT, text STRING)")
    spark.sql("CREATE TABLE bvc.ing.bands (band INT, bh BIGINT, doc_id BIGINT)")
    spark.sql("CREATE TABLE bvc.ing.pairs (doc_a BIGINT, doc_b BIGINT, jaccard DOUBLE)")
    val dupText = "alpha beta gamma delta epsilon zeta eta theta"
    Seq((1L, dupText), (2L, dupText),
        (3L, "unrelated words fill this entire third document"))
      .toDF("doc_id", "text").writeTo("bvc.ing.docs").append()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-bvc-ckpt").toString
    val q = Dedup.dedupIngestStream(spark, "bvc.ing.docs", "bvc.ing.bands",
      "bvc.ing.pairs", ckpt)
    try q.processAllAvailable() finally q.stop()
    // the corpus churns with only the append-tail attached (which
    // cannot see departures) — vacuum reconciles afterwards
    spark.sql("DELETE FROM bvc.ing.docs WHERE doc_id = 2")
    val removed = Dedup.bandVacuum(spark, "bvc.ing.docs", "bvc.ing.bands",
      "bvc.ing.pairs")
    assert(removed == 16L + 1L, s"16 bands + 1 pair expected, got $removed")
    assert(spark.table("bvc.ing.bands")
      .where(col("doc_id") === 2L).count() == 0L)
    assert(spark.table("bvc.ing.pairs").count() == 0L)
    // idempotent: a second vacuum finds nothing
    assert(Dedup.bandVacuum(spark, "bvc.ing.docs", "bvc.ing.bands",
      "bvc.ing.pairs") == 0L)
  }

  test("funnelIngestStream filters, dedups vs history, samples, exactly-once") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-fis-wh").toString
    spark.conf.set("spark.sql.catalog.fis",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.fis.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS fis.ing")
    spark.sql("CREATE TABLE fis.ing.docs (doc_id BIGINT, text STRING, source STRING)")
    spark.sql("CREATE TABLE fis.ing.bands (band INT, bh BIGINT, doc_id BIGINT)")
    spark.sql("""CREATE TABLE fis.ing.verdicts (doc_id BIGINT, source STRING,
      n_tokens BIGINT, filter_keep BOOLEAN, dedup_keep BOOLEAN,
      sample_keep BOOLEAN)""")
    // 22-word texts (pass the 20-word floor); `longB + " {"` fails the
    // brace rule instead of the floor, so its CONTENT is index-eligible
    // if it ever arrives clean
    val longA = (1 to 22).map(i => s"alpha$i").mkString(" ")
    val longB = (1 to 22).map(i => s"beta$i").mkString(" ")
    val longC = (1 to 22).map(i => s"gamma$i").mkString(" ")
    // batch 1: 1 kept; 2 duplicates 1 within the batch; 4 fails the
    // filter (brace) so its content must NOT enter the index
    Seq((1L, longA, "s0"), (2L, longA, "s0"), (4L, longB + " {", "s0"))
      .toDF("doc_id", "text", "source").writeTo("fis.ing.docs").append()

    val ckpt = java.nio.file.Files.createTempDirectory("graft-fis-ckpt").toString
    def verdictsNow(): Map[Long, (Boolean, Boolean, Boolean)] =
      spark.table("fis.ing.verdicts").collect()
        .map(r => r.getLong(0) ->
          ((r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))).toMap
    val q = llm.Curation.funnelIngestStream(spark, "fis.ing.docs",
      "fis.ing.bands", "fis.ing.verdicts", Map("s0" -> 1.0), ckpt)
    try {
      q.processAllAvailable()
      val v1 = verdictsNow()
      // doc 1 passes filter+dedup; its sample verdict is the
      // deterministic LCG draw vs min(1, rate) * quality
      assert(v1(1L)._1 && v1(1L)._2, v1.toString)
      assert(v1(2L) == ((true, false, false)), "within-batch dup must drop")
      assert(v1(4L) == ((false, false, false)), "filter reject keeps nothing")
      // index holds bands of dedup survivors ONLY (doc 1)
      assert(spark.table("fis.ing.bands").select("doc_id").distinct()
        .collect().map(_.getLong(0)).toSet == Set(1L))

      // batch 2: 11 duplicates retained content (drops via the index);
      // 13 carries doc 4's REJECTED content without the brace — it must
      // be KEPT (rejects never poisoned the index); 12 is fresh
      Seq((11L, longA, "s0"), (12L, longC, "s0"), (13L, longB, "s0"))
        .toDF("doc_id", "text", "source").writeTo("fis.ing.docs").append()
      q.processAllAvailable()
      val v2 = verdictsNow()
      assert(v2(11L) == ((true, false, false)), "cross-batch dup must drop")
      assert(v2(12L)._1 && v2(12L)._2, v2.toString)
      assert(v2(13L)._1 && v2(13L)._2,
        "a filter-rejected doc's content must not block future arrivals")
      assert(spark.table("fis.ing.bands").select("doc_id").distinct()
        .collect().map(_.getLong(0)).toSet == Set(1L, 12L, 13L))

      // sample verdicts equal the q113 arithmetic exactly
      val qual = spark.table("fis.ing.docs")
        .select(col("doc_id"), llm.TextAnalysis.qualityExpr.as("q"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      def draw(id: Long): Long =
        ((id % 2147483648L) * 1103515245L + 12345L) % 2147483648L % 1000000L
      Seq(1L, 12L, 13L).foreach { id =>
        val expect = draw(id) < math.round(math.min(1.0, 1.0) * qual(id) * 1e6)
        assert((v2(id)._3) == expect, s"doc $id sample verdict")
      }
    } finally q.stop()

    // restart from the same checkpoint: fenced no-ops, nothing doubles
    val q2 = llm.Curation.funnelIngestStream(spark, "fis.ing.docs",
      "fis.ing.bands", "fis.ing.verdicts", Map("s0" -> 1.0), ckpt)
    try {
      q2.processAllAvailable()
      assert(spark.table("fis.ing.verdicts").count() == 6)
      assert(spark.table("fis.ing.bands").select("doc_id").distinct()
        .count() == 3)
    } finally q2.stop()
  }

  test("funnelIngestStream reprices from a rates table without restarting") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-fr-wh").toString
    spark.conf.set("spark.sql.catalog.fr",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.fr.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS fr.ing")
    spark.sql("CREATE TABLE fr.ing.docs (doc_id BIGINT, text STRING, source STRING)")
    spark.sql("CREATE TABLE fr.ing.bands (band INT, bh BIGINT, doc_id BIGINT)")
    spark.sql("""CREATE TABLE fr.ing.verdicts (doc_id BIGINT, source STRING,
      n_tokens BIGINT, filter_keep BOOLEAN, dedup_keep BOOLEAN,
      sample_keep BOOLEAN)""")
    spark.sql("CREATE TABLE fr.ing.rates (source STRING, rate DOUBLE)")
    spark.sql("INSERT INTO fr.ing.rates VALUES ('s0', 1.0)")
    val long1 = (1 to 25).map(i => s"uno$i").mkString(" ")
    val long2 = (1 to 25).map(i => s"dos$i").mkString(" ")
    Seq((1L, long1, "s0")).toDF("doc_id", "text", "source")
      .writeTo("fr.ing.docs").append()

    val ckpt = java.nio.file.Files.createTempDirectory("graft-fr-ckpt").toString
    val q = llm.Curation.funnelIngestStream(spark, "fr.ing.docs",
      "fr.ing.bands", "fr.ing.verdicts", "fr.ing.rates", ckpt)
    try {
      q.processAllAvailable()
      def verdict(id: Long): (Boolean, Boolean, Boolean) =
        spark.table("fr.ing.verdicts").filter(col("doc_id") === id)
          .collect().map(r => (r.getBoolean(3), r.getBoolean(4),
            r.getBoolean(5))).head
      // rate 1.0: doc 1's sample verdict is draw < quality (micro-units)
      val qual = spark.table("fr.ing.docs").filter(col("doc_id") === 1L)
        .select(llm.TextAnalysis.qualityExpr).head().getDouble(0)
      val draw1 = ((1L % 2147483648L) * 1103515245L + 12345L) %
        2147483648L % 1000000L
      assert(verdict(1L) == ((true, true, draw1 < math.round(qual * 1e6))))

      // reprice to 0 — the NEXT batch must keep nothing in the sample
      // stage, with no stream restart
      spark.sql("UPDATE fr.ing.rates SET rate = 0.0 WHERE source = 's0'")
      Seq((2L, long2, "s0")).toDF("doc_id", "text", "source")
        .writeTo("fr.ing.docs").append()
      q.processAllAvailable()
      assert(verdict(2L) == ((true, true, false)),
        "a zero rate must drop every arrival at the sample stage")
    } finally q.stop()
  }

  test("driftIngestStream scores each batch against prior history, exactly-once") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-dr-wh").toString
    spark.conf.set("spark.sql.catalog.dr",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.dr.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dr.ing")
    spark.sql("CREATE TABLE dr.ing.docs (doc_id BIGINT, text STRING)")
    spark.sql("CREATE TABLE dr.ing.counts (b BIGINT, cnt BIGINT)")
    spark.sql("CREATE TABLE dr.ing.monitor (batch_id INT, n_tokens BIGINT, kl6 DOUBLE)")
    val vocabA = "alpha beta gamma delta epsilon zeta"
    Seq((1L, vocabA), (2L, vocabA)).toDF("doc_id", "text")
      .writeTo("dr.ing.docs").append()

    val ckpt = java.nio.file.Files.createTempDirectory("graft-dr-ckpt").toString
    def monitor(): Seq[(Int, Long, Double)] =
      spark.table("dr.ing.monitor").orderBy(col("batch_id")).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    def start() = llm.Curation.driftIngestStream(spark, "dr.ing.docs",
      "dr.ing.counts", "dr.ing.monitor", ckpt)
    val q = start()
    try {
      q.processAllAvailable()
      val m1 = monitor()
      assert(m1.length == 1 && m1.head._2 == 12L, m1.toString)
      // reference folded: counts sum equals tokens so far
      assert(spark.table("dr.ing.counts").agg(sum(col("cnt")))
        .head.getLong(0) == 12L)

      // batch 2: the SAME distribution — low drift; batch 3: disjoint
      // vocabulary — its KL against the now-A-heavy reference must
      // exceed batch 2's
      Seq((3L, vocabA)).toDF("doc_id", "text").writeTo("dr.ing.docs").append()
      q.processAllAvailable()
      Seq((4L, "omega psi chi phi upsilon tau")).toDF("doc_id", "text")
        .writeTo("dr.ing.docs").append()
      q.processAllAvailable()
      val m3 = monitor()
      assert(m3.length == 3, m3.toString)
      assert(m3(2)._3 > m3(1)._3,
        s"disjoint vocab must drift more than a repeat: $m3")
      assert(spark.table("dr.ing.counts").agg(sum(col("cnt")))
        .head.getLong(0) == 24L)
    } finally q.stop()

    // restart: fenced no-ops — no monitor row doubles, the reference
    // never double-counts (which would bias later KLs toward zero)
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(monitor().length == 3)
      assert(spark.table("dr.ing.counts").agg(sum(col("cnt")))
        .head.getLong(0) == 24L)
    } finally q2.stop()
  }

  test("funnelIngestStream stage 0: cleaned text enters the band index") {
    import spark.implicits._
    // doc 1 is clean core text; doc 2 is the SAME core buried under
    // enough junk navigation lines (2-word, all-caps — both line rules
    // reject them) that the RAW trigram Jaccard falls below the 0.5
    // verify threshold. Only a pipeline that cleans BEFORE shingling
    // can see the duplicate — doc 2 dropping at the dedup stage proves
    // the band index and the verify step both run on cleaned text.
    val core = (1 to 25).map(i => s"core$i").mkString(" ")
    val junk = (1 to 14).map(i => s"JUNKA$i JUNKB$i").mkString("\n")
    val buried = core + "\n" + junk
    // fixture sanity: raw word-trigram Jaccard really is under 0.5
    def grams(s: String): Set[String] = {
      val w = s.trim.split("\\s+").toSeq
      if (w.length < 3) Set(w.mkString(" "))
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val rawJ = grams(core).intersect(grams(buried)).size.toDouble /
      grams(core).union(grams(buried)).size
    assert(rawJ < 0.5, s"fixture must defeat raw-text dedup, J=$rawJ")

    val wh = java.nio.file.Files.createTempDirectory("graft-fcl-wh").toString
    spark.conf.set("spark.sql.catalog.fcl",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.fcl.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS fcl.ing")
    spark.sql("CREATE TABLE fcl.ing.docs (doc_id BIGINT, text STRING, source STRING)")
    spark.sql("CREATE TABLE fcl.ing.bands (band INT, bh BIGINT, doc_id BIGINT)")
    spark.sql("""CREATE TABLE fcl.ing.verdicts (doc_id BIGINT, source STRING,
      n_tokens BIGINT, filter_keep BOOLEAN, dedup_keep BOOLEAN,
      sample_keep BOOLEAN)""")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-fcl-ckpt").toString
    Seq((1L, core, "s0")).toDF("doc_id", "text", "source")
      .writeTo("fcl.ing.docs").append()
    val q = llm.Curation.funnelIngestStream(spark, "fcl.ing.docs",
      "fcl.ing.bands", "fcl.ing.verdicts", Map("s0" -> 1.0), ckpt)
    try {
      q.processAllAvailable()
      Seq((2L, buried, "s0")).toDF("doc_id", "text", "source")
        .writeTo("fcl.ing.docs").append()
      q.processAllAvailable()
      val v = spark.table("fcl.ing.verdicts").collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(2), r.getBoolean(3), r.getBoolean(4)))).toMap
      assert(v(1L)._2 && v(1L)._3, s"clean core must be retained: $v")
      // cleaned token count, not the raw 25 + 28 junk words
      assert(v(2L)._1 == 25L,
        s"verdict must price CLEANED tokens: ${v(2L)}")
      assert(v(2L)._2 && !v(2L)._3,
        s"junk-buried duplicate must drop at the dedup stage: $v")
      assert(spark.table("fcl.ing.bands").select("doc_id").distinct()
        .collect().map(_.getLong(0)).toSet == Set(1L),
        "only the cleaned survivor's signatures may enter the index")
    } finally q.stop()
  }

  test("bm25IngestStream maintains the inverted index; serving matches batch") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-bir-wh").toString
    spark.conf.set("spark.sql.catalog.bir",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.bir.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bir.ing")
    spark.sql("CREATE TABLE bir.ing.docs (doc_id BIGINT, text STRING)")
    spark.sql("CREATE TABLE bir.ing.postings " +
      "(term STRING, doc_id BIGINT, tf BIGINT, positions ARRAY<INT>) " +
      "PARTITIONED BY (bucket(4, term))")
    spark.sql("CREATE TABLE bir.ing.doclen (doc_id BIGINT, dl BIGINT)")
    spark.sql("CREATE TABLE bir.ing.stats (n_delta BIGINT, sumdl_delta BIGINT)")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-bir-ckpt").toString
    val queries = Seq((1, "alpha beta"), (2, "gamma"))
    def serve(): Set[(Int, Long, Double, Int)] =
      llm.TextAnalysis.bm25ServeFrom(spark, "bir.ing.postings",
          "bir.ing.doclen", "bir.ing.stats", queries).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    def batchRef(): Set[(Int, Long, Double, Int)] =
      llm.TextAnalysis.bm25RankingOver(spark, spark.table("bir.ing.docs"),
          queries).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    // the stats ledger must sum to the live doclen aggregate at every
    // quiesce point — serving never re-aggregates doclen
    def statsInSync(): Boolean = {
      val live = spark.table("bir.ing.doclen")
        .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head()
      val led = spark.table("bir.ing.stats")
        .agg(coalesce(sum(col("n_delta")), lit(0L)),
          coalesce(sum(col("sumdl_delta")), lit(0L))).head()
      live.getLong(0) == led.getLong(0) && live.getLong(1) == led.getLong(1)
    }
    def start() = llm.TextAnalysis.bm25IngestStream(spark, "bir.ing.docs",
      "bir.ing.postings", "bir.ing.doclen", "bir.ing.stats", ckpt)
    Seq((1L, "alpha beta alpha delta"), (2L, "beta gamma gamma gamma"),
        (3L, "delta epsilon zeta"))
      .toDF("doc_id", "text").writeTo("bir.ing.docs").append()
    val q = start()
    try {
      q.processAllAvailable()
      assert(serve() == batchRef(),
        "index-served ranking must equal the corpus-scan ranking")
      assert(statsInSync(), "stats ledger must track doclen")
      // second batch: df, avgdl, and every ranking shift — the served
      // index must track exactly
      Seq((4L, "alpha alpha alpha"), (5L, "gamma beta"))
        .toDF("doc_id", "text").writeTo("bir.ing.docs").append()
      q.processAllAvailable()
      assert(serve() == batchRef(),
        "after growth the served ranking must still equal batch")
      assert(statsInSync(), "stats ledger must track doclen growth")
      // a doc's terms must count once: postings hold one row per
      // (term, doc), tf carries the multiplicity
      assert(spark.table("bir.ing.postings")
        .where(col("doc_id") === 4L).count() == 1L)
    } finally q.stop()

    // restart from the checkpoint: fenced no-ops — postings and doclen
    // must not double-append (which would double tf and df)
    val (p0, d0) = (spark.table("bir.ing.postings").count(),
      spark.table("bir.ing.doclen").count())
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(spark.table("bir.ing.postings").count() == p0)
      assert(spark.table("bir.ing.doclen").count() == d0)
      assert(serve() == batchRef())
      assert(statsInSync(), "restart must not double-count stats")
    } finally q2.stop()
  }

  test("bm25MaintainStream absorbs departures: DELETE + upsert track exactly") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-bmd-wh").toString
    spark.conf.set("spark.sql.catalog.bmd",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.bmd.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bmd.ing")
    spark.sql("CREATE TABLE bmd.ing.docs (doc_id BIGINT, text STRING)")
    spark.sql("CREATE TABLE bmd.ing.postings " +
      "(term STRING, doc_id BIGINT, tf BIGINT, positions ARRAY<INT>) " +
      "PARTITIONED BY (bucket(4, term))")
    spark.sql("CREATE TABLE bmd.ing.doclen (doc_id BIGINT, dl BIGINT)")
    spark.sql("CREATE TABLE bmd.ing.stats (n_delta BIGINT, sumdl_delta BIGINT)")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-bmd-ckpt").toString
    val queries = Seq((1, "alpha beta"), (2, "gamma"))
    def serve(): Set[(Int, Long, Double, Int)] =
      llm.TextAnalysis.bm25ServeFrom(spark, "bmd.ing.postings",
          "bmd.ing.doclen", "bmd.ing.stats", queries).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    def scanRef(): Set[(Int, Long, Double, Int)] =
      llm.TextAnalysis.bm25RankingOver(spark, spark.table("bmd.ing.docs"),
          queries).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    def statsInSync(): Boolean = {
      val live = spark.table("bmd.ing.doclen")
        .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head()
      val led = spark.table("bmd.ing.stats")
        .agg(coalesce(sum(col("n_delta")), lit(0L)),
          coalesce(sum(col("sumdl_delta")), lit(0L))).head()
      live.getLong(0) == led.getLong(0) && live.getLong(1) == led.getLong(1)
    }
    def start() = llm.TextAnalysis.bm25MaintainStream(spark, "bmd.ing.docs",
      "bmd.ing.postings", "bmd.ing.doclen", "bmd.ing.stats", ckpt)

    // alpha's df spans docs 1+2+4 so deleting/updating shifts idf for
    // every other alpha doc — the drift the departure path must erase
    Seq((1L, "alpha beta alpha delta"), (2L, "beta gamma gamma alpha"),
        (3L, "delta epsilon zeta"), (4L, "alpha alpha omega"))
      .toDF("doc_id", "text").writeTo("bmd.ing.docs").append()
    def phrase(p: String): Set[(Long, Long)] =
      llm.TextAnalysis.phraseSearchFrom(spark, "bmd.ing.postings",
          Seq((1, p))).collect()
        .map(r => (r.getLong(1), r.getLong(2))).toSet
    val q = start()
    try {
      q.processAllAvailable()
      assert(serve() == scanRef(), "maintainer must ingest the base corpus")
      assert(statsInSync())
      // positional serving: doc 1 "alpha beta alpha delta" has ONE
      // adjacent (alpha, beta); doc 2's alpha is not beta-adjacent
      assert(phrase("alpha beta") == Set((1L, 1L)),
        "phrase adjacency must serve from the maintained positions")

      // CoW DELETE: doc 2 leaves; gamma's only source dies (query 2
      // empties), alpha's df deflates from 3 to 2
      spark.sql("DELETE FROM bmd.ing.docs WHERE doc_id = 2")
      q.processAllAvailable()
      assert(spark.table("bmd.ing.doclen")
        .where(col("doc_id") === 2L).count() == 0L, "dead doc must leave")
      assert(spark.table("bmd.ing.postings")
        .where(col("doc_id") === 2L).count() == 0L,
        "dead postings must not inflate df")
      assert(serve() == scanRef(),
        "after DELETE the served ranking must equal a fresh corpus scan")
      assert(statsInSync(), "stats must deflate with the departure")

      // upsert (MERGE): doc 4's text REPLACES (alpha count drops,
      // beta arrives) and doc 5 inserts — one commit, both classes
      Seq((4L, "beta omega"), (5L, "gamma gamma alpha"))
        .toDF("doc_id", "text").createOrReplaceTempView("bmd_up")
      spark.sql("""MERGE INTO bmd.ing.docs t USING bmd_up u
        ON t.doc_id = u.doc_id
        WHEN MATCHED THEN UPDATE SET t.text = u.text
        WHEN NOT MATCHED THEN INSERT *""")
      q.processAllAvailable()
      assert(spark.table("bmd.ing.postings")
        .where(col("doc_id") === 4L && col("term") === "alpha").count() == 0L,
        "updated doc's OLD terms must leave the index")
      assert(serve() == scanRef(),
        "after upsert the served ranking must equal a fresh corpus scan")
      assert(statsInSync(), "stats must track the update delta")
      // doc 4's update made "beta omega" adjacent where no doc had it —
      // the delete-then-reinsert walk must refresh POSITIONS, not just tf
      assert(phrase("beta omega") == Set((4L, 1L)),
        "phrase serving must track the upsert's new adjacency")
    } finally q.stop()

    // restart from the checkpoint: the replayed batches land on fenced
    // no-op appends and idempotent merge-deletes — nothing double-counts
    val (p0, d0, s0) = (spark.table("bmd.ing.postings").count(),
      spark.table("bmd.ing.doclen").count(),
      spark.table("bmd.ing.stats").count())
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(spark.table("bmd.ing.postings").count() == p0)
      assert(spark.table("bmd.ing.doclen").count() == d0)
      assert(spark.table("bmd.ing.stats").count() == s0,
        "replay must not append stats deltas")
      assert(serve() == scanRef())
      assert(statsInSync())
    } finally q2.stop()

    // maintenance composes: after ingest + merge-delete churn the index
    // tables compact like any graft table — serving (BM25 ranking AND
    // phrase adjacency) must be bit-identical across the rewrite
    val before = serve()
    val phBefore = phrase("beta omega")
    Seq("ing.postings", "ing.doclen", "ing.stats").foreach { t =>
      spark.sql(s"CALL bmd.system.compact('$t')") }
    assert(serve() == before, "compaction must not change BM25 serving")
    assert(phrase("beta omega") == phBefore,
      "compaction must not change phrase serving")
    assert(statsInSync(), "compaction must preserve the stats ledger sum")
  }

  test("bm25MaintainStream crash between stats decrement and deletes replays consistent") {
    import spark.implicits._
    // the scaladoc's crash-ordering claim, emulated exactly: the fenced
    // NEGATIVE stats delta landed (stamped Bm25DepKey at the batch id)
    // but the process died BEFORE the merge-deletes. The replay must
    // skip the decrement on the fence (an unfenced recompute after the
    // deletes would read zero — or double-count before them) and run
    // the idempotent deletes, ending exactly consistent.
    val wh = java.nio.file.Files.createTempDirectory("graft-bmc-wh").toString
    spark.conf.set("spark.sql.catalog.bmc",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.bmc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bmc.ing")
    spark.sql("CREATE TABLE bmc.ing.docs (doc_id BIGINT, text STRING)")
    spark.sql("CREATE TABLE bmc.ing.postings " +
      "(term STRING, doc_id BIGINT, tf BIGINT, positions ARRAY<INT>) " +
      "PARTITIONED BY (bucket(4, term))")
    spark.sql("CREATE TABLE bmc.ing.doclen (doc_id BIGINT, dl BIGINT)")
    spark.sql("CREATE TABLE bmc.ing.stats (n_delta BIGINT, sumdl_delta BIGINT)")
    // base corpus indexed by the plain ingest tail (its own fence key)
    Seq((1L, "alpha beta alpha"), (2L, "beta gamma"), (3L, "delta zeta"))
      .toDF("doc_id", "text").writeTo("bmc.ing.docs").append()
    val cIng = java.nio.file.Files.createTempDirectory("graft-bmc-i").toString
    val qi = llm.TextAnalysis.bm25IngestStream(spark, "bmc.ing.docs",
      "bmc.ing.postings", "bmc.ing.doclen", "bmc.ing.stats", cIng)
    try qi.processAllAvailable() finally qi.stop()
    // the corpus drops doc 2 — the $changes tail will see it at batch 0
    spark.sql("DELETE FROM bmc.ing.docs WHERE doc_id = 2")
    // crash emulation: batch 0's reconcile decrement ALREADY committed
    // — all three docs are touched (their inserts and doc 2's delete
    // share the first micro-batch), mass (3 docs, dl 3+2+2) — but the
    // merge-deletes never ran
    llm.AnnIndex.fencedAppend(
      Seq((-3L, -7L)).toDF("n_delta", "sumdl_delta"),
      "bmc.ing.stats", 0, llm.TextAnalysis.Bm25DepKey)
    assert(spark.table("bmc.ing.postings")
      .where(col("doc_id") === 2L).count() > 0,
      "sanity: the crash left dead postings behind")
    // replay: the batch body re-runs with the SAME frame and id — the
    // exact semantics of a same-checkpoint restart (offsets/0 written,
    // commit absent). Driven directly through bm25MaintainBatch, like
    // the other crash-emulation cases: a FRESH checkpoint stand-in is
    // now refused at start by validateCheckpointStamps, precisely
    // because its future batches need not equal the stamped ones.
    val feed = spark.table("bmc.ing.`docs$changes`").localCheckpoint()
    llm.TextAnalysis.bm25MaintainBatch(spark, feed, "bmc.ing.postings",
      "bmc.ing.doclen", "bmc.ing.stats", 0L)
    assert(spark.table("bmc.ing.postings")
      .where(col("doc_id") === 2L).count() == 0L,
      "replay must complete the merge-deletes")
    val live = spark.table("bmc.ing.doclen")
      .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head()
    val led = spark.table("bmc.ing.stats")
      .agg(coalesce(sum(col("n_delta")), lit(0L)),
        coalesce(sum(col("sumdl_delta")), lit(0L))).head()
    assert(live.getLong(0) == led.getLong(0) && live.getLong(1) == led.getLong(1),
      s"replay must not double-decrement: ledger $led vs live $live")
    val queries = Seq((1, "alpha beta"), (2, "gamma"))
    val served = llm.TextAnalysis.bm25ServeFrom(spark, "bmc.ing.postings",
        "bmc.ing.doclen", "bmc.ing.stats", queries).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val ref = llm.TextAnalysis.bm25RankingOver(spark,
        spark.table("bmc.ing.docs"), queries).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(served == ref, "post-replay serving must equal a fresh corpus scan")
  }

  test("bm25MaintainBatch replay after a completed update batch keeps arrivals indexed") {
    import spark.implicits._
    // the OTHER crash point: the first run of an update batch executed
    // its WHOLE body (decrement, merge-deletes, fenced arrival appends)
    // and died before the checkpoint commit. The replay re-delivers the
    // same batch; without the arrival-stamp gate its merge-deletes
    // would destroy the first run's committed arrival rows (touched
    // includes arrival doc_ids) and the Bm25ArrKey fence would then
    // refuse to re-append them — the docs stay live in the corpus but
    // permanently lose their postings.
    val wh = java.nio.file.Files.createTempDirectory("graft-bmr-wh").toString
    spark.conf.set("spark.sql.catalog.bmr",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.bmr.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bmr.ing")
    spark.sql("CREATE TABLE bmr.ing.docs (doc_id BIGINT, text STRING)")
    spark.sql("CREATE TABLE bmr.ing.postings " +
      "(term STRING, doc_id BIGINT, tf BIGINT, positions ARRAY<INT>) " +
      "PARTITIONED BY (bucket(4, term))")
    spark.sql("CREATE TABLE bmr.ing.doclen (doc_id BIGINT, dl BIGINT)")
    spark.sql("CREATE TABLE bmr.ing.stats (n_delta BIGINT, sumdl_delta BIGINT)")
    Seq((1L, "alpha beta alpha"), (2L, "beta gamma"), (3L, "delta zeta"))
      .toDF("doc_id", "text").writeTo("bmr.ing.docs").append()
    // the mixed batch the ADVICE scenario needs: an UPDATE delivers a
    // departure (preimage) AND an arrival (postimage) for doc 2
    spark.sql("UPDATE bmr.ing.docs SET text = 'omega beta' WHERE doc_id = 2")
    val queries = Seq((1, "alpha beta"), (2, "omega"))
    def serve() = llm.TextAnalysis.bm25ServeFrom(spark, "bmr.ing.postings",
        "bmr.ing.doclen", "bmr.ing.stats", queries).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    def scanRef() = llm.TextAnalysis.bm25RankingOver(spark,
        spark.table("bmr.ing.docs"), queries).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    def statsInSync(): Boolean = {
      val live = spark.table("bmr.ing.doclen")
        .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head()
      val led = spark.table("bmr.ing.stats")
        .agg(coalesce(sum(col("n_delta")), lit(0L)),
          coalesce(sum(col("sumdl_delta")), lit(0L))).head()
      live.getLong(0) == led.getLong(0) && live.getLong(1) == led.getLong(1)
    }
    // micro-batch 0 = the full history in one frame (inserts at v1,
    // doc 2's pre/postimage at v2) — exactly what a maintainer started
    // now would see. First run: the complete body.
    val feed = spark.table("bmr.ing.`docs$changes`").localCheckpoint()
    llm.TextAnalysis.bm25MaintainBatch(spark, feed, "bmr.ing.postings",
      "bmr.ing.doclen", "bmr.ing.stats", 0L)
    assert(serve() == scanRef(), "sanity: first run must index the corpus")
    assert(statsInSync(), "sanity: first run must balance the ledger")
    val postingsAfterFirst = spark.table("bmr.ing.postings").count()
    assert(postingsAfterFirst > 0)
    // the replay: same frame, same batch id
    llm.TextAnalysis.bm25MaintainBatch(spark, feed, "bmr.ing.postings",
      "bmr.ing.doclen", "bmr.ing.stats", 0L)
    assert(spark.table("bmr.ing.postings").count() == postingsAfterFirst,
      "replay must neither delete nor double the arrival postings")
    assert(spark.table("bmr.ing.postings")
      .where(col("doc_id") === 2L && col("term") === "omega").count() == 1L,
      "the updated doc's postings must survive the replay")
    assert(serve() == scanRef(), "post-replay serving must equal a corpus scan")
    assert(statsInSync(), "replay must not skew the stats ledger")
  }

  test("dedupMaintainBatch replay after a completed update batch keeps bands and pairs") {
    import spark.implicits._
    // the dedup twin of the bm25 replay hole: an update batch whose
    // first run completed would, on replay, MERGE-delete the arrival's
    // bands and its fresh verdict pairs (arrival ids are in `touched`
    // and in the dead-pair endpoints), and the MaintainBatchKey fence
    // would block dedupBatch from re-appending them — the arrival ends
    // up permanently un-banded and un-paired.
    val wh = java.nio.file.Files.createTempDirectory("graft-dmr-wh").toString
    spark.conf.set("spark.sql.catalog.dmr",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.dmr.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dmr.ing")
    spark.sql("CREATE TABLE dmr.ing.docs (doc_id BIGINT, text STRING)")
    spark.sql("CREATE TABLE dmr.ing.bands (band INT, bh BIGINT, doc_id BIGINT)")
    spark.sql("CREATE TABLE dmr.ing.pairs (doc_a BIGINT, doc_b BIGINT, jaccard DOUBLE)")
    val dupText = "alpha beta gamma delta epsilon zeta eta theta"
    Seq((1L, dupText), (2L, "completely unrelated second document body here"))
      .toDF("doc_id", "text").writeTo("dmr.ing.docs").append()
    // doc 2's revision duplicates doc 1 — the update batch must both
    // retract doc 2's old state and pair its new state with doc 1
    spark.sql(s"UPDATE dmr.ing.docs SET text = '$dupText' WHERE doc_id = 2")
    def pairsNow(): Set[(Long, Long)] = spark.table("dmr.ing.pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val feed = spark.table("dmr.ing.`docs$changes`").localCheckpoint()
    llm.Dedup.dedupMaintainBatch(spark, feed, "dmr.ing.docs",
      "dmr.ing.bands", "dmr.ing.pairs", 0L)
    assert(pairsNow() == Set((1L, 2L)), s"sanity: first run pairs: ${pairsNow()}")
    assert(spark.table("dmr.ing.bands").count() == 2 * 16,
      "sanity: first run bands both docs")
    // the replay: same frame, same batch id
    llm.Dedup.dedupMaintainBatch(spark, feed, "dmr.ing.docs",
      "dmr.ing.bands", "dmr.ing.pairs", 0L)
    assert(spark.table("dmr.ing.bands").count() == 2 * 16,
      "replay must neither retract nor double the bands")
    assert(pairsNow() == Set((1L, 2L)),
      s"replay must keep the verdict pair: ${pairsNow()}")
  }

  test("a fresh checkpoint over already-stamped index tables is refused at start") {
    import spark.implicits._
    // every fence and replay gate assumes "same checkpoint ⟹ same
    // batch ids"; a maintainer restarted over the SAME tables with a
    // FRESH checkpoint renumbers batches from 0 below the existing
    // stamps, so every gate would read "already done" and silently
    // skip retractions AND new appends. That must be refused loudly at
    // stream start, not discovered as silent index drift.
    val wh = java.nio.file.Files.createTempDirectory("graft-ckg-wh").toString
    spark.conf.set("spark.sql.catalog.ckg",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ckg.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ckg.ing")
    spark.sql("CREATE TABLE ckg.ing.docs (doc_id BIGINT, text STRING)")
    spark.sql("CREATE TABLE ckg.ing.postings " +
      "(term STRING, doc_id BIGINT, tf BIGINT, positions ARRAY<INT>) " +
      "PARTITIONED BY (bucket(4, term))")
    spark.sql("CREATE TABLE ckg.ing.doclen (doc_id BIGINT, dl BIGINT)")
    spark.sql("CREATE TABLE ckg.ing.stats (n_delta BIGINT, sumdl_delta BIGINT)")
    spark.sql("CREATE TABLE ckg.ing.bands (band INT, bh BIGINT, doc_id BIGINT)")
    spark.sql("CREATE TABLE ckg.ing.pairs (doc_a BIGINT, doc_b BIGINT, jaccard DOUBLE)")
    Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text").writeTo("ckg.ing.docs").append()
    val ck1 = java.nio.file.Files.createTempDirectory("graft-ckg-c1").toString
    val ck2 = java.nio.file.Files.createTempDirectory("graft-ckg-c2").toString
    def bm25(ck: String) = llm.TextAnalysis.bm25MaintainStream(spark,
      "ckg.ing.docs", "ckg.ing.postings", "ckg.ing.doclen",
      "ckg.ing.stats", ck)
    val q = bm25(ck1)
    try q.processAllAvailable() finally q.stop()
    // the ORIGINAL checkpoint restarts fine (its next id sits above
    // every stamp it wrote)…
    val q2 = bm25(ck1)
    try q2.processAllAvailable() finally q2.stop()
    // …a fresh one is refused before any batch runs
    val e = intercept[IllegalStateException](bm25(ck2))
    assert(e.getMessage.contains("fence stamp"), e.getMessage)

    // same guard on the dedup maintainer
    val ck3 = java.nio.file.Files.createTempDirectory("graft-ckg-c3").toString
    val ck4 = java.nio.file.Files.createTempDirectory("graft-ckg-c4").toString
    def dd(ck: String) = Dedup.dedupMaintainStream(spark, "ckg.ing.docs",
      "ckg.ing.bands", "ckg.ing.pairs", ck)
    val q3 = dd(ck3)
    try q3.processAllAvailable() finally q3.stop()
    val q4 = dd(ck3)
    try q4.processAllAvailable() finally q4.stop()
    val e2 = intercept[IllegalStateException](dd(ck4))
    assert(e2.getMessage.contains("fence stamp"), e2.getMessage)
  }

  test("bm25Vacuum reconciles the index and stats to the live corpus") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-bmv-wh").toString
    spark.conf.set("spark.sql.catalog.bmv",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.bmv.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bmv.ing")
    spark.sql("CREATE TABLE bmv.ing.docs (doc_id BIGINT, text STRING)")
    spark.sql("CREATE TABLE bmv.ing.postings " +
      "(term STRING, doc_id BIGINT, tf BIGINT, positions ARRAY<INT>) " +
      "PARTITIONED BY (bucket(4, term))")
    spark.sql("CREATE TABLE bmv.ing.doclen (doc_id BIGINT, dl BIGINT)")
    spark.sql("CREATE TABLE bmv.ing.stats (n_delta BIGINT, sumdl_delta BIGINT)")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-bmv-ckpt").toString
    Seq((1L, "alpha beta alpha"), (2L, "beta gamma"), (3L, "delta zeta"))
      .toDF("doc_id", "text").writeTo("bmv.ing.docs").append()
    // index via the plain ingest tail (which cannot see departures)...
    val q = llm.TextAnalysis.bm25IngestStream(spark, "bmv.ing.docs",
      "bmv.ing.postings", "bmv.ing.doclen", "bmv.ing.stats", ckpt)
    try q.processAllAvailable() finally q.stop()
    // ...then the corpus churns with no maintainer attached
    spark.sql("DELETE FROM bmv.ing.docs WHERE doc_id <= 2")
    val queries = Seq((1, "alpha beta"), (2, "gamma"))
    val removed = llm.TextAnalysis.bm25Vacuum(spark, "bmv.ing.docs",
      "bmv.ing.postings", "bmv.ing.doclen", "bmv.ing.stats")
    // docs 1 (2 terms) + 2 (2 terms) postings + their 2 doclen rows
    assert(removed == 6L, s"expected 6 index rows reclaimed, got $removed")
    val served = llm.TextAnalysis.bm25ServeFrom(spark, "bmv.ing.postings",
        "bmv.ing.doclen", "bmv.ing.stats", queries).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val ref = llm.TextAnalysis.bm25RankingOver(spark,
        spark.table("bmv.ing.docs"), queries).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(served == ref, "vacuumed index must serve the live corpus only")
    val led = spark.table("bmv.ing.stats")
      .agg(coalesce(sum(col("n_delta")), lit(0L)),
        coalesce(sum(col("sumdl_delta")), lit(0L))).head()
    assert(led.getLong(0) == 1L && led.getLong(1) == 2L,
      s"stats must reconcile to the one live doc: $led")
  }

  test("doc_keywords is maintained: arrivals re-price, departures retire") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-bkw-wh").toString
    spark.conf.set("spark.sql.catalog.bkw",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.bkw.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bkw.ing")
    spark.sql("CREATE TABLE bkw.ing.docs (doc_id BIGINT, text STRING)")
    spark.sql("CREATE TABLE bkw.ing.postings " +
      "(term STRING, doc_id BIGINT, tf BIGINT, positions ARRAY<INT>) " +
      "PARTITIONED BY (bucket(4, term))")
    spark.sql("CREATE TABLE bkw.ing.doclen (doc_id BIGINT, dl BIGINT)")
    spark.sql("CREATE TABLE bkw.ing.stats (n_delta BIGINT, sumdl_delta BIGINT)")
    spark.sql("CREATE TABLE bkw.ing.doc_keywords " +
      "(doc_id BIGINT, rn INT, term STRING, tf BIGINT, score_u BIGINT)")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-bkw-ckpt").toString
    def start() = llm.TextAnalysis.bm25MaintainStream(spark, "bkw.ing.docs",
      "bkw.ing.postings", "bkw.ing.doclen", "bkw.ing.stats", ckpt)
    def kwOf(id: Long): Seq[(Int, String, Long, Long)] =
      spark.table("bkw.ing.doc_keywords").where(col("doc_id") === id)
        .orderBy(col("rn")).collect()
        .map(r => (r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))
        .toSeq
    // the shipped arithmetic replayed driver-side for a doc under an
    // explicit (df, N) snapshot — what the artifact row must carry
    def expect(text: String, df: Map[String, Long], n: Long)
        : Seq[(Int, String, Long, Long)] =
      text.split(" ").groupBy(identity).toSeq
        .map { case (t, xs) =>
          val tf = xs.length.toLong
          (t, tf, tf * math.round(math.log(n.toDouble / df(t)) * 1e6))
        }
        .sortBy { case (t, _, s) => (-s, t) }.take(3).zipWithIndex
        .map { case ((t, tf, s), i) => (i + 1, t, tf, s) }

    Seq((1L, "alpha beta alpha"), (2L, "beta gamma"))
      .toDF("doc_id", "text").writeTo("bkw.ing.docs").append()
    val q = start()
    try {
      q.processAllAvailable()
      val df0 = Map("alpha" -> 1L, "beta" -> 2L, "gamma" -> 1L)
      assert(kwOf(1L) == expect("alpha beta alpha", df0, 2L),
        s"base pricing: ${kwOf(1L)}")
      assert(kwOf(2L) == expect("beta gamma", df0, 2L))

      // arrival: doc 3 prices under the POST-batch stats (N=3, alpha
      // df=2); doc 1's rows keep their old pricing — the documented
      // staleness contract (a row re-prices when its doc is touched)
      Seq((3L, "alpha zeta")).toDF("doc_id", "text")
        .writeTo("bkw.ing.docs").append()
      q.processAllAvailable()
      val df1 = Map("alpha" -> 2L, "beta" -> 2L, "gamma" -> 1L, "zeta" -> 1L)
      assert(kwOf(3L) == expect("alpha zeta", df1, 3L),
        s"arrival pricing: ${kwOf(3L)}")
      assert(kwOf(1L) == expect("alpha beta alpha", df0, 2L),
        "untouched docs keep their last pricing")

      // departure: doc 2's rows retire with it
      spark.sql("DELETE FROM bkw.ing.docs WHERE doc_id = 2")
      q.processAllAvailable()
      assert(kwOf(2L).isEmpty, "departed doc must lose its keyword rows")

      // update: doc 1 re-prices under the current state (N=2 live docs,
      // alpha df=2 — docs 1 and 3)
      Seq((1L, "omega alpha")).toDF("doc_id", "text")
        .createOrReplaceTempView("bkw_up")
      spark.sql("""MERGE INTO bkw.ing.docs t USING bkw_up u
        ON t.doc_id = u.doc_id
        WHEN MATCHED THEN UPDATE SET t.text = u.text""")
      q.processAllAvailable()
      val df2 = Map("alpha" -> 2L, "omega" -> 1L, "zeta" -> 1L)
      assert(kwOf(1L) == expect("omega alpha", df2, 2L),
        s"updated doc must re-price: ${kwOf(1L)}")
    } finally q.stop()

    // restart from the checkpoint: replays are fenced/idempotent — the
    // keyword table must not churn
    val k0 = spark.table("bkw.ing.doc_keywords").collect()
      .map(_.toString).sorted.toSeq
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(spark.table("bkw.ing.doc_keywords").collect()
        .map(_.toString).sorted.toSeq == k0,
        "replay must leave keyword rows exactly as they were")
    } finally q2.stop()

    // batch reconcile path: an unmaintained churn vacuums away
    spark.sql("DELETE FROM bkw.ing.docs WHERE doc_id = 3")
    llm.TextAnalysis.bm25Vacuum(spark, "bkw.ing.docs",
      "bkw.ing.postings", "bkw.ing.doclen", "bkw.ing.stats")
    assert(kwOf(3L).isEmpty, "vacuum must retire departed keyword rows")
  }

  test("drift reference fold: bounded rows, identical KL, restart/replay-safe") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-drf-wh").toString
    spark.conf.set("spark.sql.catalog.drf",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.drf.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS drf.ing")
    for (sfx <- Seq("a", "b")) {
      spark.sql(s"CREATE TABLE drf.ing.docs_$sfx (doc_id BIGINT, text STRING)")
      spark.sql(s"CREATE TABLE drf.ing.counts_$sfx (b BIGINT, cnt BIGINT)")
      spark.sql(s"CREATE TABLE drf.ing.monitor_$sfx " +
        "(batch_id INT, n_tokens BIGINT, kl6 DOUBLE)")
    }
    val ckA = java.nio.file.Files.createTempDirectory("graft-drf-cka").toString
    val ckB = java.nio.file.Files.createTempDirectory("graft-drf-ckb").toString
    // A folds aggressively (threshold 4 rows); B never folds here
    // (default threshold) — the fold must be INVISIBLE in every KL
    def startA() = llm.Curation.driftIngestStream(spark, "drf.ing.docs_a",
      "drf.ing.counts_a", "drf.ing.monitor_a", ckA, 4L)
    def startB() = llm.Curation.driftIngestStream(spark, "drf.ing.docs_b",
      "drf.ing.counts_b", "drf.ing.monitor_b", ckB)
    def mon(sfx: String): Seq[(Int, Long, Double)] =
      spark.table(s"drf.ing.monitor_$sfx").orderBy(col("batch_id")).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    def tot(sfx: String): Long =
      spark.table(s"drf.ing.counts_$sfx").agg(sum(col("cnt")))
        .head.getLong(0)
    def ingest(rows: Seq[(Long, String)],
               qa: org.apache.spark.sql.streaming.StreamingQuery,
               qb: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val df = rows.toDF("doc_id", "text")
      df.writeTo("drf.ing.docs_a").append()
      df.writeTo("drf.ing.docs_b").append()
      qa.processAllAvailable(); qb.processAllAvailable()
    }
    val qA = startA(); val qB = startB()
    try {
      ingest(Seq((1L, "alpha beta gamma delta"),
        (2L, "alpha beta epsilon zeta")), qA, qB)
      ingest(Seq((3L, "alpha beta gamma delta eta theta")), qA, qB)
      ingest(Seq((4L, "omega psi chi phi")), qA, qB)
      ingest(Seq((5L, "alpha omega iota kappa lambda")), qA, qB)
      assert(mon("a") == mon("b"),
        s"folding changed a KL output: ${mon("a")} vs ${mon("b")}")
      assert(tot("a") == tot("b"), "folding changed the reference mass")
      // physically bounded: the folded table is one row per bucket
      val distinctB = spark.table("drf.ing.counts_a")
        .select("b").distinct().count()
      assert(spark.table("drf.ing.counts_a").count() == distinctB,
        "fold must leave one physical row per bucket")
      assert(spark.table("drf.ing.counts_b").count() > distinctB,
        "fixture must actually accumulate duplicate bucket rows on B")
    } finally { qA.stop(); qB.stop() }

    // a REPLAYED fold (crash after the fold's overwrite committed but
    // before the checkpoint advanced — the restarted batch re-runs the
    // maintenance) must be a physical no-op
    def rows(sfx: String): Seq[(Long, Long)] =
      spark.table(s"drf.ing.counts_$sfx").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val before = rows("a")
    llm.Curation.foldDriftCounts(spark, "drf.ing.counts_a")
    assert(rows("a") == before, "a repeated fold must change nothing")

    // restart both streams: fenced no-ops, then further batches keep
    // the folding and non-folding references in exact agreement
    val qA2 = startA(); val qB2 = startB()
    try {
      qA2.processAllAvailable(); qB2.processAllAvailable()
      assert(mon("a") == mon("b") && tot("a") == tot("b"),
        "restart replay must not double-count on either side")
      ingest(Seq((6L, "mu nu xi omicron alpha")), qA2, qB2)
      assert(mon("a") == mon("b"),
        "post-restart KL must still be fold-invariant")
      assert(tot("a") == tot("b"))
    } finally { qA2.stop(); qB2.stop() }
  }
}
