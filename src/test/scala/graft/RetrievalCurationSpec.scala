package graft

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.llm.{Curation, Dedup, Similarity, TextAnalysis}

/** q107 (hybrid RRF retrieval) and q108 (DSIR importance weights)
  * verified against from-scratch driver-side recomputations on a
  * synthetic fixture — independent of both the Spark plans under test
  * and the DuckDB oracles (which check the same pipelines at the
  * driver's scale factors). */
class RetrievalCurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // ---- fixture: a tiny sf-dir with documents + embeddings parquet ----

  private val docTexts: Seq[(Long, String, String)] = Seq(
    (0L, "dup scan dup scan merge", "en"),
    (1L, "spark window agg window frame", "en"),
    (2L, "fast hash join key probe build", "en"),
    (3L, "der schnelle braune fuchs springt", "de"),
    (4L, "merge scan dup window agg", "en"),
    (5L, "hash key hash key hash key", "de"),
    (6L, "spark agg join scan merge dup", "en"),
    (7L, "completely unrelated verbiage here", "de"),
    (8L, "window window window agg agg", "en"),
    (9L, "join key fast fast fast", "en"),
    (10L, "dup merge scan spark window", "de"),
    (11L, "ein weiterer deutscher satz hier", "de")
  )

  /** 8-dim float embeddings from a fixed LCG — ids 0-11 (the corpus)
    * plus 100/200/300 (the q107 query vectors). */
  private val vecIds: Seq[Long] = (0L to 11L) ++ Seq(100L, 200L, 300L)
  private def vecOf(id: Long): Array[Float] = {
    var s = id * 6364136223846793005L + 1442695040888963407L
    Array.fill(8) {
      s = s * 6364136223846793005L + 1442695040888963407L
      (((s >>> 33) % 1000L) / 500.0f) - 1.0f
    }
  }

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_rcspec").toString
    import spark.implicits._
    docTexts.map { case (id, t, lang) => (id, t, lang, s"src${id % 3}", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    vecIds.map(id => (id, vecOf(id).toSeq, (id % 4).toInt))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    d
  }

  // ---- shared scalar replicas (the exact expression semantics) ----

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, RoundingMode.HALF_UP).toDouble
  private def roundL(x: Double): Long =
    BigDecimal(x).setScale(0, RoundingMode.HALF_UP).toLong
  /** The q61 char fold over ASCII text (fixture stays ASCII so UTF-16
    * unit iteration equals codepoint iteration). */
  private def charFold(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)

  test("q108 DSIR weights equal a from-scratch driver recomputation") {
    val toks: Seq[(Long, Boolean, Seq[Long])] = docTexts.map { case (id, t, lang) =>
      (id, lang == "en", t.trim.split("\\s+").toSeq.map(w => charFold(w) % 1024L))
    }
    val cnts: Map[(Long, Long), Long] = toks
      .flatMap { case (id, _, bs) => bs.map(b => (id, b)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val isT = toks.map(t => t._1 -> t._2).toMap
    val rcnt = cnts.groupBy(_._1._2).map { case (b, m) => b -> m.values.sum }
    val tcnt = cnts.toSeq.collect { case ((id, b), c) if isT(id) => (b, c) }
      .groupBy(_._1).map { case (b, v) => b -> v.map(_._2).sum }
    val rtot = rcnt.values.sum; val ttot = tcnt.values.sum
    val unit: Map[Long, Long] = rcnt.map { case (b, rc) =>
      val tc = tcnt.getOrElse(b, 0L)
      b -> roundL((math.log((tc + 1).toDouble / (ttot + 1024))
        - math.log((rc + 1).toDouble / (rtot + 1024))) * 1000000.0)
    }
    val expected = toks.map { case (id, _, bs) =>
      val ntok = bs.size.toLong
      val scoreU = bs.groupBy(identity)
        .map { case (b, occ) => occ.size.toLong * unit(b) }.sum
      (id, ntok, round6(scoreU / (ntok * 1000000.0)))
    }.sortBy { case (id, _, w) => (-w, id) }
      .zipWithIndex.map { case ((id, n, w), i) => (id, n, w, i + 1) }

    val got = Curation.q108DsirWeights(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(got == expected)
  }

  test("q107 hybrid RRF equals fusing the two channels independently") {
    // sparse channel: the oracle-checked q101 pipeline's own output
    val sparse: Seq[(Int, Long, Int)] = TextAnalysis.q101Bm25(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(3))).toSeq
    // dense channel recomputed on the driver: exact cosine, round 6,
    // doc-id tiebreak, top-10 per query vector. The corpus is ALL
    // embeddings — query vectors are corpus members and retrievable,
    // exactly like q55's self-containing candidate side
    val corpus = vecIds
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < 8) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      round6(d / (math.sqrt(na) * math.sqrt(nb)))
    }
    val dense: Seq[(Int, Long, Int)] = Seq(100L, 200L, 300L).flatMap { qid =>
      corpus.map(cid => (cid, cos(vecOf(qid), vecOf(cid))))
        .sortBy { case (cid, s) => (-s, cid) }.take(10)
        .zipWithIndex.map { case ((cid, _), i) => ((qid / 100).toInt, cid, i + 1) }
    }
    def contrib(rn: Int): Long = roundL(1000000.0 / (60 + rn))
    val fusedU = (sparse ++ dense)
      .groupBy { case (q, d, _) => (q, d) }
      .map { case ((q, d), rows) =>
        (q, d, rows.map(r => contrib(r._3)).sum, rows.size) }
    val expected = fusedU.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.toSeq.sortBy { case (_, d, u, _) => (-u, d) }.take(10)
        .zipWithIndex.map { case ((q, d, u, ch), i) =>
          (q, d, u / 1000000.0, ch, i + 1) }
    }.sortBy(r => (r._1, r._5))

    val got = Similarity.q107HybridRrf(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3), r.getInt(4))).toSeq
    assert(got == expected)
    // both channels must actually contribute: at least one fused row
    // carries channels=2 on this fixture (query terms overlap texts)
    assert(got.exists(_._4 == 2))
  }

  test("q112 BPE pair counts equal a from-scratch driver recomputation") {
    // vocab reduction first (word -> occurrence count), then adjacent
    // code-point pairs weighted by word frequency — the trainer's
    // measurement round recomputed with plain Scala collections
    val vocab: Map[String, Long] = docTexts
      .flatMap(_._2.trim.split("\\s+")).groupBy(identity)
      .map { case (w, occ) => w -> occ.size.toLong }
    val expected = vocab.toSeq
      .flatMap { case (w, wf) =>
        w.toSeq.sliding(2).filter(_.size == 2)
          .map(p => ((p.head.toString, p(1).toString), wf)).toSeq }
      .groupBy(_._1).map { case (p, v) => (p._1, p._2, v.map(_._2).sum) }
      .toSeq.sortBy { case (a, b, c) => (-c, a, b) }.take(25)

    val got = TextAnalysis.q112BpePairs(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected)
    // the reduction must be real on this fixture: repeated words ("hash
    // key hash key hash key") weight their pairs by frequency, so at
    // least one pair's count exceeds the number of vocab entries
    // containing it
    assert(got.exists(_._3 > vocab.count(_._1.contains("ha"))))
  }

  /** The canonical greedy-leftmost BPE trainer over a word list, in
    * plain Scala — the independent reference for q114. */
  private def bpeTrain(words: Seq[String], rounds: Int)
      : Seq[(String, String, Long)] = {
    var vocab: Map[Seq[String], Long] = words.groupBy(identity)
      .map { case (w, occ) => w.map(_.toString) -> occ.size.toLong }
    (1 to rounds).map { _ =>
      val counts = vocab.toSeq.flatMap { case (ts, wf) =>
        ts.sliding(2).filter(_.size == 2)
          .map(p => (p.head, p(1)) -> wf).toSeq }
        .groupBy(_._1).map { case (p, v) => p -> v.map(_._2).sum }
      val ((a, b), cnt) = counts.toSeq
        .sortBy { case ((x, y), c) => (-c, x, y) }.head
      vocab = vocab.map { case (ts, wf) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        ts.foreach { x =>
          if (out.nonEmpty && out.last == a && x == b)
            out(out.size - 1) = a + b
          else out += x
        }
        out.toSeq -> wf
      }
      (a, b, cnt)
    }
  }

  test("q114 BPE training equals the canonical trainer; merges compound") {
    import spark.implicits._
    val expected = bpeTrain(docTexts.flatMap(_._2.trim.split("\\s+")), 3)
      .zipWithIndex.map { case ((a, b, c), i) => (i + 1, a, b, c) }
    val got = TextAnalysis.q114BpeTrain(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == expected)

    // merge APPLICATION must compound: on "aaab aaab aaab" round 1
    // merges (a,a) greedily leftmost (aa|a|b, never a|aa|b), the round-2
    // tie between (aa,a) and (a,b) breaks to (a,b) by symbol order, and
    // round 3 merges the two MULTI-CHAR symbols (aa,ab) — a trainer
    // that miscounted after application, or re-merged into the fresh
    // symbol, fails this exact sequence
    val d2 = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    Seq((0L, "aaab aaab aaab", "en", "src0", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d2/documents.parquet")
    val got2 = TextAnalysis.q114BpeTrain(spark, d2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got2 == Seq((1, "a", "a", 6L), (2, "a", "b", 3L),
      (3, "aa", "ab", 3L)))
    assert(bpeTrain(Seq("aaab", "aaab", "aaab"), 3)
      == Seq(("a", "a", 6L), ("a", "b", 3L), ("aa", "ab", 3L)))

    // q115 encodes with ALL trained merges: "aaab" → [aa|ab] after
    // round 2, then round 3's (aa,ab) fuses it to the single symbol
    // [aaab] — the fixture's 3 words encode to 3 symbols, fertility 1.0
    val enc = TextAnalysis.q115BpeEncode(spark, d2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(enc == Seq(("src0", 3L, 3L, 1.0)))
  }

  test("the merge fold matches the canonical greedy apply on random lists") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // adversarial symbol alphabet: every element is a prefix or suffix
    // of another, so a fold that tests raw string suffixes instead of
    // the delimiter-anchored ENTIRE-last-symbol gets caught ("ba" ends
    // with "a"; "a" prefixes "aa"; merged symbols re-enter the pool)
    val syms = Vector("a", "b", "aa", "ab", "ba", "aab")
    val rnd = new scala.util.Random(2026)
    val cases: Seq[(Seq[String], String, String)] = (1 to 300).map { _ =>
      val ts = Seq.fill(1 + rnd.nextInt(8))(syms(rnd.nextInt(syms.size)))
      (ts, syms(rnd.nextInt(syms.size)), syms(rnd.nextInt(syms.size)))
    }
    def canonical(ts: Seq[String], a: String, b: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      ts.foreach { x =>
        if (out.nonEmpty && out.last == a && x == b)
          out(out.size - 1) = a + b
        else out += x
      }
      out.toSeq
    }
    val d = TextAnalysis.bpeDelimiter
    val got = cases.map { case (ts, a, b) => (ts.mkString(d), a, b) }
      .toDF("ts", "ma", "mb")
      .select(TextAnalysis.mergeFoldExpr(col("ts"), col("ma"), col("mb")))
      .collect().map(_.getString(0)).toSeq
    val want = cases.map { case (ts, a, b) => canonical(ts, a, b).mkString(d) }
    assert(got == want)
  }

  test("q124 margin scoring suppresses the hub plain cosine would pick") {
    import spark.implicits._
    // four source docs (de) each truly aligned with one target (en),
    // plus a HUB target moderately similar to EVERY source — plain
    // cosine ranks the hub first for every source (cos ~0.92 vs ~0.80
    // to the true pair); margin normalization divides by the hub's fat
    // k-NN neighborhood and recovers the true alignment. This is the
    // failure mode margin scoring exists for (Artetxe & Schwenk 2019).
    val d2 = java.nio.file.Files.createTempDirectory("graft_q124").toString
    def src(i: Int): (Long, Array[Float]) = {
      val v = Array.fill(4)(0.35f); v(i - 1) = 0.8f; (i.toLong, v)
    }
    def tgt(i: Int): (Long, Array[Float]) = {
      val v = Array.fill(4)(0.0f); v(i - 11) = 1.0f; (i.toLong, v)
    }
    val hub = (15L, Array(0.5f, 0.5f, 0.5f, 0.5f))
    val vecs = (1 to 4).map(src) ++ (11 to 14).map(tgt) :+ hub
    vecs.toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$d2/embeddings.parquet")
    vecs.map { case (id, _) =>
      (id, s"text $id", if (id <= 4) "de" else "en", "s0", 8L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d2/documents.parquet")

    val got = Similarity.q124BitextMine(spark, d2).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == Map(1L -> 11L, 2L -> 12L, 3L -> 13L, 4L -> 14L),
      s"margin must recover the true pairs, got $got")

    // sanity that the hub really dominates raw cosine (the test would
    // be vacuous otherwise): each source's highest cosine target is 15
    graft.functions.VectorFunctions.register(spark)
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, d2)
    val rawTop = e.filter(col("vec_id") <= 4)
      .select(col("vec_id").as("sid"), col("embedding").as("sv"))
      .crossJoin(e.filter(col("vec_id") >= 11)
        .select(col("vec_id").as("tid"), col("embedding").as("tv")))
      .withColumn("cos", expr("graft_dot(sv, tv)") /
        (expr("graft_l2norm(sv)") * expr("graft_l2norm(tv)")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("sid"))
          .orderBy(col("cos").desc, col("tid"))))
      .filter(col("rn") === 1).select(col("tid"))
      .collect().map(_.getLong(0)).toSet
    assert(rawTop == Set(15L), "fixture must make the hub win raw cosine")
  }

  test("q119 LM cross-entropy ranks the atypical document as the tail") {
    import spark.implicits._
    // six docs in one language: five share the same bigram patterns,
    // one is lexically alien — the alien doc must carry the highest
    // cross-entropy under the slice's own LM and land in the 'tail'
    // bucket, while at least one typical doc sits in the 'head'
    val d2 = java.nio.file.Files.createTempDirectory("graft_q119").toString
    val typical = "the quick brown fox jumps over the lazy dog again"
    val docs = (0L to 4L).map(i => (i, typical, "en", "s0", 50L)) :+
      ((9L, "zyx wvu tsr qpo nml kji hgf edc baa zzq", "en", "s0", 39L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d2/documents.parquet")
    val got = llm.Curation.q119LmXent(spark, d2).collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getString(4)))
    val byId = got.map(r => r._1 -> r).toMap
    assert(got.map(_._2).max == byId(9L)._2,
      s"the alien doc must score highest: $got")
    assert(byId(9L)._3 == "tail", s"alien doc must bucket 'tail': $got")
    assert(byId(0L)._3 == "head", s"typical doc 0 must bucket 'head': $got")
    // the five identical docs score identically (pure corpus function)
    assert((0L to 4L).map(byId(_)._2).distinct.size == 1, got.toString)
  }

  test("q131 held-out LM prices unseen vocabulary against the base slice") {
    import spark.implicits._
    // train slice (ids 0..5): one vocabulary. Held-out tenth: id 7
    // speaks half train-vocab, half alien; id 17 is pure train vocab.
    // The mixed doc must carry positive unseen mass and strictly
    // higher cross-entropy — the OOV audit the op exists for.
    val d2 = java.nio.file.Files.createTempDirectory("graft_q131").toString
    val typical = "the quick brown fox jumps over the lazy dog again"
    val mixed = "the quick brown fox zyxq wvut srqp onml kjih gfed"
    val docs = (0L to 5L).map(i => (i, typical, "en", "s0", 50L)) ++
      Seq((7L, mixed, "en", "s0", 50L), (17L, typical, "en", "s0", 50L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d2/documents.parquet")
    val got = llm.Curation.q131LmHeldout(spark, d2).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet == Set(7L, 17L), got.toString)
    assert(got(17L)._2 == 0.0, s"pure train vocab has zero unseen: $got")
    assert(got(7L)._2 > 0.3, s"alien half must register as unseen mass: $got")
    assert(got(7L)._1 > got(17L)._1, s"unseen mass must cost: $got")
  }

  test("q133 zipf fit: a zipfian slice reads -1, a uniform flood reads 0") {
    import spark.implicits._
    // language "zp": word i of 20 appears round(2000/i) times — an
    // exact Zipf profile, so the fitted slope must sit at -1 with a
    // near-perfect R². Language "un": every word equally frequent (a
    // template flood) — slope exactly 0, R² undefined (no y variance).
    val d2 = java.nio.file.Files.createTempDirectory("graft_q133").toString
    val zipfText = (1 to 20).flatMap(i =>
      Seq.fill(math.round(2000.0 / i).toInt)(f"w$i%02d")).mkString(" ")
    val uniText = (1 to 20).flatMap(i => Seq.fill(5)(f"u$i%02d")).mkString(" ")
    Seq((1L, zipfText, "zp", "s0", 10L), (2L, uniText, "un", "s0", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d2/documents.parquet")
    val got = llm.TextAnalysis.q133ZipfFit(spark, d2).collect()
      .map(r => r.getString(0) ->
        ((r.getInt(2), r.getDouble(3), Option(r.get(4))))).toMap
    assert(got("zp")._1 == 20 && got("un")._1 == 20, got.toString)
    assert(math.abs(got("zp")._2 + 1.0) < 0.02,
      s"zipfian slice must fit slope ~ -1: $got")
    assert(got("zp")._3.exists(r => r.asInstanceOf[Double] > 0.999),
      s"zipfian fit must be near-perfect: $got")
    assert(got("un")._2 == 0.0, s"uniform flood must fit slope 0: $got")
    assert(got("un")._3.isEmpty,
      s"zero frequency variance has no defined fit quality: $got")
  }

  test("two-level tertile fold equals the flat rank-ceil fold exactly") {
    import spark.implicits._
    // adversarial histograms: values straddling 2dp bucket boundaries,
    // a cut rank landing on a bucket's FIRST entry, heavy ties exactly
    // at a cut, both cuts in one bucket, a one-value degenerate key,
    // and FP-awkward values (0.29 * 100 floors to 28 in IEEE)
    val hist: Seq[(String, Double, Long)] = Seq(
      ("a", 0.289999, 5L), ("a", 0.29, 7L), ("a", 0.290001, 1L),
      ("a", 0.30, 4L), ("a", 0.311111, 9L), ("a", 0.32, 2L),
      ("b", 1.0, 3L), ("b", 1.000001, 3L), ("b", 1.000002, 3L),
      ("c", 7.5, 100L), // degenerate: every doc one value
      ("d", 0.01, 1L), ("d", 0.02, 1L), ("d", 0.03, 1L),
      ("e", 2.0, 33L), ("e", 2.005, 33L), ("e", 2.0051, 34L))
    // flat reference: first value whose cumulative count reaches
    // ceil(n/3) / ceil(2n/3) in ascending value order
    def brute(rows: Seq[(Double, Long)]): (Double, Double) = {
      val sorted = rows.sortBy(_._1)
      val n = rows.map(_._2).sum
      val (k1, k2) = ((n + 2) / 3, (2 * n + 2) / 3)
      def at(k: Long): Double = {
        var cum = 0L
        sorted.find { case (_, c) => cum += c; cum >= k }.get._1
      }
      (at(k1), at(k2))
    }
    val expect = hist.groupBy(_._1).view
      .mapValues(rs => brute(rs.map(r => (r._2, r._3)))).toMap
    val got = llm.Curation.tertileThresholds(
        hist.toDF("lang", "xent6", "c"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got == expect, s"got $got expected $expect")
  }

  test("q134 novelty audit: a near-copy loses novelty, fresh prose keeps it") {
    import spark.implicits._
    // doc 1: 30 tokens of prose; doc 2 mirrors doc 1 with ONE word
    // changed in the middle (a template/mirror) — every 8-gram not
    // crossing the edit is shared, so both documents' novelty
    // collapses while doc 3 (disjoint prose) stays fully novel
    val d2 = java.nio.file.Files.createTempDirectory("graft_q134").toString
    val base = (1 to 30).map(i => s"tok$i")
    val copy = base.updated(14, "EDIT")
    val fresh = (1 to 30).map(i => s"new$i")
    Seq((1L, base.mkString(" "), "en", "s0", 10L),
        (2L, copy.mkString(" "), "en", "s0", 10L),
        (3L, fresh.mkString(" "), "en", "s0", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d2/documents.parquet")
    val got = llm.TextAnalysis.q134NoveltyAudit(spark, d2).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    // 30 tokens → 23 distinct 8-grams each
    assert(got.values.forall(_._1 == 23L), got.toString)
    assert(got(3L)._2 == 1.0 && got(3L)._3 == 1L,
      s"disjoint prose must be fully novel: $got")
    // the edit at position 15 breaks grams starting at 8..15 (8 of 23)
    // → 15 shared grams, novelty 8/23 for both mirror partners
    val expectNov = BigDecimal(8.0 / 23).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L)._2 == expectNov && got(2L)._2 == expectNov,
      s"mirror partners must lose the shared mass: $got")
    assert(got(1L)._3 == 2L && got(2L)._3 == 2L,
      s"their most viral gram spans both docs: $got")
  }

  test("q135 budget selection equals a from-scratch threshold recompute") {
    import org.apache.spark.sql.functions._
    // the selection semantics replayed in plain Scala on the shared
    // fixture: walk distinct quality values descending, accumulate
    // token mass to the ceil(total/5) budget, admit >= the crossing
    // value — per-source tallies must match the operator exactly
    val dq = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
        TextAnalysis.qualityExpr.as("quality"))
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    val total = dq.map(_._2).sum
    val budget = (total + 4) / 5
    val hist = dq.groupBy(_._3).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(-_._1)
    var cum = 0L; var cut = 0.0; var found = false
    hist.foreach { case (q, t) =>
      cum += t
      if (!found && cum >= budget) { cut = q; found = true }
    }
    val expect = dq.groupBy(_._1).map { case (src, rows) =>
      val sel = rows.filter(_._3 >= cut)
      src -> ((rows.length.toLong, sel.length.toLong,
        rows.map(_._2).sum, sel.map(_._2).sum))
    }
    val got = Curation.q135BudgetSelect(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(6), r.getLong(7)))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (src, (nd, sd, tk, st)) =>
      val g = got(src)
      assert((g._1, g._2, g._3, g._4) == ((nd, sd, tk, st)),
        s"$src: got $g expected ${(nd, sd, tk, st)}")
    }
    assert(got.values.map(_._5).toSet == Set(cut), "cut must be global")
    assert(got.values.map(_._6).toSet == Set(budget))
    // the budget genuinely binds on this fixture: strictly between
    // nothing-selected and everything-selected
    val selTok = expect.values.map(_._4).sum
    assert(selTok >= budget && selTok < total,
      s"cut must bind: sel=$selTok budget=$budget total=$total")
  }

  test("q136 health card: hand-computable two-axis fixture") {
    import spark.implicits._
    // e1 = x-axis, e2 = y-axis (8 dims): centroid (0.5, 0.5, 0…) —
    // norms 1, centroid norm √½, both cosines to the centroid √½ →
    // anisotropy 0.707107; dims 2..7 carry zero variance (dead);
    // the two live dims split total variance evenly
    val d2 = java.nio.file.Files.createTempDirectory("graft_q136").toString
    val e1 = Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
    val e2 = Array(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)
    Seq((1L, e1.toSeq, 0), (2L, e2.toSeq, 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d2/embeddings.parquet")
    val r = Similarity.q136EmbeddingHealth(spark, d2).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 8L) // n_vecs, dims
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0 &&
      r.getDouble(4) == 1.0) // mean/min/max norm
    assert(r.getDouble(5) == 0.707107, s"centroid norm: $r")
    assert(r.getDouble(6) == 0.707107, s"anisotropy: $r")
    assert(r.getLong(7) == 6L, s"dead dims: $r")
    assert(r.getDouble(8) == 0.5, s"top var share: $r")
  }

  test("q137 cluster cards equal a driver-side tf-idf recompute") {
    import org.apache.spark.sql.functions._
    val pfx = llm.AnnIndex.ensure(spark, dir)
    val cells = spark.table(s"$pfx.ivf_cells")
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val toks = docTexts.map { case (id, t, _) =>
      cells(id) -> t.trim.split("\\s+").toSeq }
    val tf = toks.flatMap { case (c, ws) => ws.map(w => (c, w)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val dfc = tf.keys.groupBy(_._2).view.mapValues(_.map(_._1).toSet.size)
    val k = llm.AnnIndex.KCells
    val top3 = tf.keys.groupBy(_._1).map { case (c, keys) =>
      c -> keys.toSeq.map { case (_, w) =>
        (w, tf((c, w)), roundL(tf((c, w)) * math.log(k * 1.0 / dfc(w)) * 1e6))
      }.sortBy { case (w, _, s) => (-s, w) }.take(3)
    }
    val sizes = cells.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Similarity.q137ClusterCards(spark, dir).collect()
    got.foreach { r =>
      val (c, rn) = (r.getInt(0), r.getInt(3))
      val (w, t, s) = top3(c)(rn - 1)
      assert(r.getLong(1) == sizes(c), s"members of cell $c")
      assert(r.getString(4) == w && r.getLong(5) == t && r.getLong(6) == s,
        s"cell $c rank $rn: got ${r.getString(4)} expected $w")
    }
    assert(got.length == top3.values.map(_.length).sum,
      "every populated cell must emit its full card")
  }

  test("q138 hubness histogram equals a driver-side k-occurrence recompute") {
    import org.apache.spark.sql.functions._
    val pfx = llm.AnnIndex.ensure(spark, dir)
    val cells = spark.table(s"$pfx.ivf_cells")
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      d / (na * nb)
    }
    // per member: 6dp-rounded cosine to every cellmate, (sim desc, id)
    // tiebroken top-3; k-occurrence = how often each id is listed
    val occ = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    vecIds.foreach { a =>
      vecIds.filter(b => b != a && cells(b) == cells(a))
        .map(b => (round6(cos(vecOf(a), vecOf(b))), b))
        .sortBy { case (s, b) => (-s, b) }.take(3)
        .foreach { case (_, b) => occ(b) += 1L }
    }
    val nks = vecIds.map(occ(_))
    val expect = nks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Similarity.queries("q138_hubness_audit")(spark, dir).collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getDouble(2))).toList
    assert(got.map(g => g._1 -> g._2).toMap == expect,
      s"histogram mismatch: got $got expected $expect")
    got.foreach { case (_, n, share) =>
      assert(share == round6(n.toDouble / vecIds.size), s"share of $n") }
    assert(got.map(_._2).sum == vecIds.size,
      "every vector must land in exactly one histogram bucket")
  }

  test("Misra-Gries covering guarantee survives reduce decrements and merge trims") {
    // 200 distinct tokens force both the reduce decrement-all path and
    // the merge (K+1)-th-largest trim — the paths the ~30-word corpus
    // vocabulary never exercises; the guarantee under test is the one
    // q142 relies on: every token with freq > n/(K+1) keeps a counter
    val mg = TextAnalysis.MisraGries
    val rnd = new scala.util.Random(7)
    val heavy = Seq.fill(3000)("hh" + rnd.nextInt(3))      // 3 heavy tokens
    val tail = Seq.fill(2000)("t" + rnd.nextInt(197))      // 197 light ones
    val stream = rnd.shuffle(heavy ++ tail)
    val n = stream.size
    // split into 8 slices, reduce each, merge pairwise (a realistic tree)
    val parts = stream.grouped(math.ceil(n / 8.0).toInt).toSeq
      .map(_.foldLeft(mg.zero)(mg.reduce))
    val merged = parts.reduce(mg.merge)
    val cands = mg.finish(merged).toSet
    val exact = stream.groupBy(identity).view.mapValues(_.size).toMap
    val mustCover = exact.collect {
      case (t, c) if c.toLong * (mg.K + 1) > n => t }.toSet
    assert(mustCover.nonEmpty && mustCover.forall(cands.contains),
      s"MG must cover all true heavy hitters: missing ${mustCover -- cands}")
    assert(cands.size <= mg.K, "sketch must stay within K counters")
  }

  test("Misra-Gries covering guarantee holds on random streams and merge trees") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // pure-JVM property over the ARRAY-buffer implementation (r13): for
    // random zipf-ish streams, random partition splits, and random
    // merge association, every token with freq > n/(K+1) must keep a
    // counter and the sketch must never exceed K live slots — the
    // deficit bound is implementation-independent, so the in-place
    // rewrite must satisfy exactly what the Map form did
    val mg = TextAnalysis.MisraGries
    val genCase = for {
      nHeavy <- Gen.choose(1, 4)
      heavyReps <- Gen.choose(100, 400)
      nLight <- Gen.choose(10, 300)
      seed <- Gen.choose(0L, Long.MaxValue)
      nParts <- Gen.choose(1, 9)
    } yield (nHeavy, heavyReps, nLight, seed, nParts)
    val prop = Prop.forAll(genCase) {
      case (nHeavy, heavyReps, nLight, seed, nParts) =>
        val rnd = new scala.util.Random(seed)
        val stream = rnd.shuffle(
          (0 until nHeavy).flatMap(h => Seq.fill(heavyReps)(s"hh$h")) ++
            (0 until nLight * 3).map(_ => "t" + rnd.nextInt(nLight)))
        val n = stream.size
        val parts = stream.grouped(math.ceil(n.toDouble / nParts).toInt)
          .toSeq.map(_.foldLeft(mg.zero)(mg.reduce))
        // random association: fold left or right by seed parity
        val merged =
          if (seed % 2 == 0) parts.reduceLeft(mg.merge)
          else parts.reduceRight(mg.merge)
        val cands = mg.finish(merged).toSet
        val exact = stream.groupBy(identity).view.mapValues(_.size).toMap
        val mustCover = exact.collect {
          case (t, c) if c.toLong * (mg.K + 1) > n => t }.toSet
        cands.size <= mg.K && mustCover.subsetOf(cands)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("q150 water-filling: hand-computed caps, level, and redistribution") {
    import spark.implicits._
    // sources: a (100 tokens), b (10), c (10) — total 120, B = 108.
    // Ascending scan: b capped (10·3 = 30 ≤ 108), c capped (10·2 = 20
    // ≤ 98), a uncapped (100·1 = 100 > 88) — level = 88, all 108
    // budget tokens placed
    val dir = java.nio.file.Files.createTempDirectory("graft_q150").toString
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    Seq((1L, words(100), "en", "a", 10L),
        (2L, words(10), "en", "b", 10L),
        (3L, words(10), "en", "c", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = Curation.queries("q150_budget_waterfill")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got == Seq(
      ("a", 100L, 108L, false, 88L, 0.88),
      ("b", 10L, 108L, true, 10L, 1.0),
      ("c", 10L, 108L, true, 10L, 1.0)), got.toString)
    assert(got.map(_._5).sum == 108L, "the whole budget must place")
  }

  test("q146 centering recovers the neighbor a common direction hides") {
    import spark.implicits._
    // every vector carries a dominant shared direction (60, 60, 0, 0)
    // plus a small residual — RAW cosine ranks everything ~1 and the
    // LARGEST-residual-norm doc wins on the tiebreak noise, while the
    // true residual-aligned neighbor of query 100 is doc 1. Centering
    // subtracts the common direction, so the centered search MUST rank
    // doc 1 first for query 1 — the operator's whole point, pinned.
    val dir = java.nio.file.Files.createTempDirectory("graft_q146").toString
    def v(r: (Float, Float)) = Array(60f + r._1, 60f + r._2, r._1, r._2)
    // query 100 residual points at +x; doc 1 matches it, doc 2 is
    // orthogonal (+y), doc 3 anti-aligned
    val rows = Seq(
      (100L, v((1f, 0f))), (200L, v((0f, 1f))), (300L, v((-1f, 0f))),
      (1L, v((2f, 0f))), (2L, v((0f, 2f))), (3L, v((-2f, 0f))))
    rows.toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val got = Similarity.queries("q146_centered_search")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(3)))
    val top1 = got.filter(_._3 == 1).map(t => t._1 -> t._2).toMap
    assert(top1(1) == 1L,
      s"query 1's centered top-1 must be its residual twin: $top1")
    assert(top1(2) == 2L && top1(3) == 3L,
      s"each query must recover its residual-aligned doc: $top1")
  }

  test("phrase search counts overlapping self-matches and respects order") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a hand-built positional postings table: doc 1 = "a a a b a b",
    // doc 2 = "b a" (reversed order — must NOT match "a b")
    val posts = Seq(
      ("a", 1L, 4L, Seq(1, 2, 3, 5)), ("b", 1L, 2L, Seq(4, 6)),
      ("a", 2L, 1L, Seq(2)), ("b", 2L, 1L, Seq(1)))
      .toDF("term", "doc_id", "tf", "positions")
    posts.createOrReplaceTempView("phrase_posts_fixture")
    def run(p: String): Map[Long, Long] =
      TextAnalysis.phraseSearchFrom(spark, "phrase_posts_fixture",
          Seq((1, p))).collect()
        .map(r => r.getLong(1) -> r.getLong(2)).toMap
    // "a a": anchors {1,2} in doc 1 — overlapping matches both count
    assert(run("a a") == Map(1L -> 2L), run("a a").toString)
    // "a b": doc 1 anchors {3,5}; doc 2 has only "b a" — order matters
    assert(run("a b") == Map(1L -> 2L), run("a b").toString)
    // "a a a": the triple overlap collapses to the single anchor 1
    assert(run("a a a") == Map(1L -> 1L), run("a a a").toString)
    // "b b": positions 4 and 6 are not adjacent — no match anywhere
    assert(run("b b") == Map.empty[Long, Long], run("b b").toString)
  }

  test("q126 drift report flags the cohort whose vocabulary shifted") {
    import spark.implicits._
    // ids 0..19: the first nine deciles share one vocabulary; the last
    // two docs (the final id-range cohort) speak something else — its
    // KL against the corpus distribution must strictly exceed every
    // typical cohort's
    val d2 = java.nio.file.Files.createTempDirectory("graft_q126").toString
    val usual = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val spam = "buy now cheap deal click here win prize gold offer"
    val docs = (0L to 17L).map(i => (i, usual, "en", "s0", 50L)) ++
      Seq((18L, spam, "en", "s0", 40L), (19L, spam, "en", "s0", 40L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d2/documents.parquet")
    val got = llm.Curation.q126DriftReport(spark, d2).collect()
      .map(r => (r.getInt(0), r.getDouble(2))).toMap
    assert(got.size == 10)
    val spamKl = got(10)
    assert((1 to 9).forall(d => got(d) < spamKl),
      s"the shifted cohort must carry the max KL: $got")
  }

  test("q128 line filter drops nav/counter/shouting lines, keeps prose") {
    import spark.implicits._
    val d2 = java.nio.file.Files.createTempDirectory("graft_q128").toString
    val t0 = "NAVIGATION MENU\nThe quick brown fox jumps\n42\n" +
      "BUY NOW CLICK HERE TODAY\nthis line stays here too"
    val clean0 = "The quick brown fox jumps\nthis line stays here too"
    val t1 = "just a simple document"
    Seq((0L, t0, "en", "s0", t0.length.toLong),
        (1L, t1, "en", "s0", t1.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d2/documents.parquet")
    val got = TextAnalysis.q128LineFilter(spark, d2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    assert(got == Seq(
      // nav (2 words), counter (1 word), and all-caps shouting drop;
      // the two prose lines survive in order
      (0L, 5L, 2L, (t0.length - clean0.length).toLong, clean0),
      (1L, 1L, 1L, 0L, t1)), got.toString)
  }

  test("q88 line-level repetition: duplicate-line ratio and top-line share") {
    import spark.implicits._
    // the sf corpora are single-line, so the oracle only covers the
    // degenerate line case — this fixture exercises the real one: doc 0
    // duplicates a whole boilerplate line 3x WITHOUT repeating any
    // bigram (the spam shape line-level stats exist to catch), doc 1 is
    // clean two-line prose
    val d2 = java.nio.file.Files.createTempDirectory("graft_q88").toString
    Seq(
      (0L, "header\nunique one two\nheader\nheader", "en", "s0", 35L),
      (1L, "a b c\nd e f", "en", "s0", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d2/documents.parquet")
    val got = TextAnalysis.q88Repetition(spark, d2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getBoolean(7))).toSeq
    assert(got == Seq(
      // doc 0: 5 distinct bigrams (dup 0.0) but 4 lines of which only 2
      // distinct -> dup_line 0.5, top line 3/4 -> repetitive via lines
      (0L, 5L, 0.2, 0.0, 4L, 0.75, 0.5, true),
      // doc 1: everything distinct -> not repetitive
      (1L, 5L, 0.2, 0.0, 2L, 0.5, 0.0, false)), got.toString)
  }

  test("q160 flags a looping generator; short docs keep the stated defaults") {
    import spark.implicits._
    val d2 = java.nio.file.Files.createTempDirectory("graft_q160").toString
    Seq(
      // "a b c d e" ×3: the 5-gram "a b c d e" recurs at positions
      // 1/6/11 (count 3 = the loop signature); 11 gram slots, 5
      // distinct rotations -> loop ratio 6/11
      (0L, "a b c d e a b c d e a b c d e", "en", "src0", 29L),
      (1L, "one two three four five six", "en", "src0", 27L),
      // 4 tokens: no 5-gram exists -> explicit zero conventions; the
      // stuffing signal still fires (one token is 100% of the mass)
      (2L, "spam spam spam spam", "en", "src0", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d2/documents.parquet")
    val got = TextAnalysis.q160RepNgram(spark, d2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5))).toSeq
    assert(got == Seq(
      (0L, 15L, 3L, 0.545455, 0.2, true),
      (1L, 6L, 1L, 0.0, 0.166667, false),
      (2L, 4L, 0L, 0.0, 1.0, false)), got.toString)
  }

  test("q156 containment curve separates shared vocabulary from leaked grams") {
    import spark.implicits._
    val d2 = java.nio.file.Files.createTempDirectory("graft_q156").toString
    Seq( // train: ids 0/1; held-out (id % 10 = 7): ids 7/17
      (0L, "a b c", "en", "src0", 5L), (1L, "x y z", "en", "src0", 5L),
      (7L, "a b q", "en", "src0", 5L), (17L, "p q r", "en", "src0", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d2/documents.parquet")
    val got = Dedup.q156ContainmentCurve(spark, d2).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == Seq(
      // n=1: doc 7 shares a,b; grams {a,b,q,p,r}, contained {a,b}
      (1, 2L, 1L, 5L, 2L, 0.5, 0.4),
      // n=2: only "a b" leaks of {a b, b q, p q, q r}
      (2, 2L, 1L, 4L, 1L, 0.5, 0.25),
      // n=3: nothing leaks — the collapse that picks the filter n
      (3, 2L, 0L, 2L, 0L, 0.0, 0.0)), got.toString)
  }

  test("q158 Heaps curve counts first occurrences at value-cut prefixes") {
    import spark.implicits._
    val d2 = java.nio.file.Files.createTempDirectory("graft_q158").toString
    Seq((0L, "a b", "en", "src0", 3L), (1L, "b c", "en", "src0", 3L),
      (2L, "c d", "en", "src0", 3L), (3L, "a e", "en", "src0", 3L),
      (4L, "f", "en", "src0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d2/documents.parquet")
    val got = TextAnalysis.q158HeapsLaw(spark, d2).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq( // (pct, cutoff=(4·pct) div 100, docs, tokens, vocab)
      (10, 0L, 1L, 2L, 2L), (25, 1L, 2L, 4L, 3L), (50, 2L, 3L, 6L, 4L),
      (75, 3L, 4L, 8L, 5L), (100, 4L, 5L, 9L, 6L)), got.toString)
  }

  test("q163 counts a collided (doc_id, term) once, matching the oracle") {
    import spark.implicits._
    // doc 7 re-keys into release B as 1000007 (7 % 29 = 7); a REAL doc
    // 1000007 also survives into B (1000007 % 17 = 16, % 23 = 13,
    // % 29 = 0) — both carry the marker term, so without the cross-row
    // (doc_id, term) distinct the Spark side would count df_b = 3
    // while the oracle's SELECT DISTINCT counts 2, conjuring a
    // delta = +1 row from an id collision
    val d = java.nio.file.Files.createTempDirectory("graft_q163").toString
    Seq((7L, "zzcollide", "en", "s", 9L),
        (1000007L, "zzcollide", "en", "s", 9L),
        (8L, "filler words", "en", "s", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val got = Curation.q163ReleaseTermDrift(spark, d).collect()
    assert(got.isEmpty,
      s"every term's df is unchanged between releases here: ${got.toSeq}")
  }

  test("q145 lift arithmetic survives numerators past the int64 ceiling") {
    // q145's lift numerator cnt·N·10⁶ passes 9.2·10¹⁸ on any frequent
    // bigram over a ~10⁹-token corpus; a LONG product fails there
    // (ANSI on: a query-killing overflow error; ANSI off: a silent
    // wrap that corrupts the ranking) while the decimal product stays
    // exact — this pins the shipped expression to the decimal path
    // with the smallest case that separates them: cnt = 10⁴, n = 10⁹,
    // cnt_a = cnt_b = 10⁵ gives 10¹⁹/10¹⁰ = exactly 10⁹.
    val vals = "FROM VALUES (10000L, 1000000000L, 100000L, 100000L) " +
      "AS t(cnt, n, cnt_a, cnt_b)"
    val r = spark.sql(
      "SELECT (cast(cnt as decimal(20,0)) * cast(n as decimal(20,0)) " +
        s"* 1000000) div (cnt_a * cnt_b) AS lift_u $vals").head()
    assert(r.getLong(0) == 1000000000L,
      s"decimal numerator must divide exactly, got ${r.getLong(0)}")
    // sanity: the long numerator does NOT survive this input — the
    // decimal cast is load-bearing, not stylistic
    val longPath = scala.util.Try(spark.sql(
      s"SELECT (cnt * n * 1000000L) div (cnt_a * cnt_b) AS w $vals")
      .head().getLong(0))
    assert(longPath.isFailure || longPath.get != 1000000000L,
      s"expected the int64 path to overflow or wrap, got $longPath")
  }
}
