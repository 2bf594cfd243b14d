package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** q181 (Efraimidis–Spirakis weighted sampling) and q182 (MMR greedy
  * re-ranking) against from-scratch driver-side replays on controlled
  * fixtures — independent of the DuckDB oracle, and on shapes the fixed
  * corpus cannot guarantee (a strict top-100 cut; clusters tight enough
  * that diversification must actually reorder a pick). */
class SelectionSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Spark's Round(double, s): BigDecimal.valueOf + HALF_UP. */
  private def rnd(x: Double, s: Int): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(x).setScale(s, java.math.RoundingMode.HALF_UP)

  // ---------------------------------------------------------- q181

  /** The q181 arithmetic replayed: q68 LCG draw, once-rounded micro-nat
    * -ln(u'), BigInt priority, (pri, doc_id) top-100, per-source fold. */
  private def refSample(docs: Seq[(Long, String, String)])
      : Seq[(String, Long, Long)] = {
    val sel = docs.map { case (id, source, text) =>
      val w = text.trim.split("\\s+", -1).length.toLong
      val u = math.floorMod((id % 2147483648L) * 1103515245L + 12345L,
        2147483648L)
      val lu = rnd(math.log(2147483648.0 / (u + 1)) * 1e6, 0).longValue
      (id, source, w, BigInt(lu) * 1000000 / w)
    }.sortBy { case (id, _, _, pri) => (pri, id) }.take(100)
    sel.groupBy(_._2).toSeq.map { case (s, xs) =>
      (s, xs.size.toLong, xs.map(_._3).sum)
    }.sortBy(_._1)
  }

  test("q181 equals a driver-side replay with a strict top-100 cut") {
    import spark.implicits._
    val rnd0 = new scala.util.Random(17)
    // 150 docs (top-100 is a strict subset), word counts 1..40, sparse
    // non-contiguous ids so the LCG draws spread
    val docs = (0 until 150).map { i =>
      val id = i.toLong * 7 + 3
      val src = Seq("alpha", "beta", "gamma")(i % 3)
      val words = 1 + rnd0.nextInt(40)
      (id, src, Seq.fill(words)("w").mkString(" "))
    }
    val d = Files.createTempDirectory("graft-es").toString
    docs.map { case (id, src, text) =>
      (id, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val got = llm.Curation.q181WeightedSample(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == refSample(docs), s"$got vs ${refSample(docs)}")
  }

  // ---------------------------------------------------------- q190

  test("q190 counts every planted PII class exactly once per hit") {
    import spark.implicits._
    // doc ids picked OFF the salting residues (6k+1 / 9k+4 / 13k+6 /
    // 8k+5) so only the organic text counts; each doc plants a known
    // set of pattern hits, including a double email and an
    // ipv4-inside-url ambiguity (the ip rule sees only digit runs)
    val docs = Seq(
      (0L, "src_a", "write to a.b@x.io and c.d@y.org today"), // 2 emails
      (2L, "src_a", "host 10.0.0.1 and peer 10.0.0.2"),        // 2 ips
      (18L, "src_b", "dial +4915112345678 now"),               // 1 phone
      (12L, "src_b", "read https://a.io/x then http://b.io"),  // 2 urls
      (24L, "src_c", "nothing sensitive here at all"))         // clean
    val d = Files.createTempDirectory("graft-pii").toString
    docs.map { case (id, src, text) =>
      (id, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val got = llm.TextAnalysis.q190PiiCensus(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8)))).toMap
    // (n_docs, email_docs, ip_docs, phone_docs, url_docs, pii_docs,
    //  n_hits, pii_share_u)
    assert(got == Map(
      "src_a" -> ((2L, 1L, 1L, 0L, 0L, 2L, 4L, 1000000L)),
      "src_b" -> ((2L, 0L, 0L, 1L, 1L, 2L, 3L, 1000000L)),
      "src_c" -> ((1L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))), got.toString)
  }

  test("q191 redaction replaces every class and reports exact char mass") {
    import spark.implicits._
    val docs = Seq(
      (0L, "src_a", "write to a.b@x.io or visit https://y.io/z"),
      (24L, "src_a", "clean text"))
    val d = Files.createTempDirectory("graft-redact").toString
    docs.map { case (id, src, text) =>
      (id, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val got = llm.TextAnalysis.q191PiiRedact(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // "a.b@x.io" (8) → "<EMAIL>" (7), "https://y.io/z" (14) → "<URL>"
    // (5): chars 41+10 in → 31+10 out, one doc changed
    assert(got == Seq(("src_a", 2L, 1L, 51L, 41L)), got.toString)
  }

  // ---------------------------------------------------------- q182

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }
  private def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  /** The q182 greedy replayed: round-6 sims, micro-unit rel and pair
    * sims, mmr_u10 = 7·rel_u − 3·max-sim-to-picked, (score, cid)
    * argmax per step. Returns (rows, and per-qid whether MMR's pick
    * set differs from the pure-relevance top-4). */
  private def refMmr(vecs: Seq[Array[Float]])
      : (Seq[(Long, Int, Long, Long, Long)], Boolean) = {
    val ids = vecs.indices.map(_.toLong)
    var diverged = false
    val rows = ids.filter(_ < 50).flatMap { qid =>
      val sims = ids.filter(_ != qid).map { cid =>
        val s = rnd(dot(vecs(qid.toInt), vecs(cid.toInt)) /
          (nrm(vecs(qid.toInt)) * nrm(vecs(cid.toInt))), 6).doubleValue
        (cid, s)
      }.sortBy { case (cid, s) => (-s, cid) }.take(10)
      val rel = sims.map { case (cid, s) =>
        cid -> rnd(s * 1e6, 0).longValue }.toMap
      def pair(a: Long, b: Long): Long =
        rnd(rnd(dot(vecs(a.toInt), vecs(b.toInt)) /
          (nrm(vecs(a.toInt)) * nrm(vecs(b.toInt))), 6).doubleValue * 1e6,
          0).longValue
      val first = sims.map(_._1).minBy(c => (-rel(c), c))
      var picked = Vector((first, rel(first) * 7))
      for (_ <- 2 to 4) {
        val remaining = sims.map(_._1)
          .filterNot(c => picked.exists(_._1 == c))
        if (remaining.nonEmpty) {
          val scored = remaining.map { c =>
            val ms = picked.map(p => pair(c, p._1)).max
            c -> (rel(c) * 7 - ms * 3)
          }
          val best = scored.minBy { case (c, sc) => (-sc, c) }
          picked :+= best
        }
      }
      if (picked.map(_._1).toSet != sims.take(4).map(_._1).toSet)
        diverged = true
      picked.zipWithIndex.map { case ((cid, sc), k) =>
        (qid, k + 1, cid, rel(cid), sc)
      }
    }.sortBy { case (q, rn, _, _, _) => (q, rn) }
    (rows, diverged)
  }

  test("q182 equals a driver-side greedy replay, and diversification bites") {
    import spark.implicits._
    // three ORTHOGONAL directions, each with a near-duplicate twin,
    // plus a mixed query m = 3e1+2e2+e3: m's relevance top-4 is
    // {e1, e1', e2, e2'} (both duplicate pairs), while MMR must swap
    // e2' for an unseen direction — 7·rel(e2)−3·0 beats
    // 7·rel(e1')−3·10⁶ at these magnitudes, so the pick sets provably
    // differ (the near-dup-suppression MMR exists for)
    def e(j: Int, twin: Boolean): Array[Float] =
      Array.tabulate(8)(k =>
        (if (k == j) 1f else 0f) + (if (twin && k == 7) 0.02f else 0f))
    val vecs = Seq(e(0, false), e(0, true), e(1, false), e(1, true),
      e(2, false), e(2, true),
      Array(3f, 2f, 1f, 0f, 0f, 0f, 0f, 0f))
    val d = Files.createTempDirectory("graft-mmr").toString
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v, "x") }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    val got = llm.Similarity.q182MmrRerank(spark, d).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val (want, diverged) = refMmr(vecs)
    assert(got == want, s"$got vs $want")
    assert(diverged,
      "fixture must force at least one MMR pick set away from rel-top-4")
  }
}
