package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.llm.Dedup

/** The hot-block guard: a skewed block trips it, per-key work is
  * subdivided, and the produced pair set is EXACTLY the naive block
  * self-join's — the guard bounds stragglers, it must never drop or
  * duplicate a candidate pair. */
class DedupGuardSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** 150 docs in ONE (source, len_bucket) block (the skew case) plus a
    * small cold block. */
  private def fixture = {
    import spark.implicits._
    val hot = (0 until 150).map(i => (i.toLong, "hot_src", 3))
    val cold = (1000 until 1010).map(i => (i.toLong, "cold_src", 7))
    (hot ++ cold).toDF("doc_id", "source", "len_bucket")
  }

  test("skewed block trips the guard; cold block does not") {
    val hot = Dedup.hotBlocks(fixture, maxBlock = 64).collect()
    assert(hot.length == 1)
    assert(hot.head.getString(0) == "hot_src" && hot.head.getLong(2) == 150L)
  }

  test("guarded pair cover equals the naive block self-join exactly") {
    val docs = fixture
    val guarded = Dedup.guardedBlockPairs(docs, maxBlock = 64)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // every pair exactly once (no dropDuplicates in the cover — dups
    // would mean a pair met at two shard keys)
    assert(guarded.length == guarded.distinct.length, "cover produced duplicates")
    val naive = {
      val a = docs.select(col("source"), col("len_bucket"), col("doc_id").as("doc_a"))
      val b = docs.select(col("source"), col("len_bucket"), col("doc_id").as("doc_b"))
      a.join(b, Seq("source", "len_bucket")).filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    assert(guarded.sorted.toSeq == naive.sorted.toSeq,
      s"pair sets differ: guarded=${guarded.length} naive=${naive.length}")
    // sanity: 150*149/2 hot + 10*9/2 cold
    assert(naive.length == 150 * 149 / 2 + 45)
  }

  test("guarded CELL pair cover equals the naive within-cell join exactly") {
    import spark.implicits._
    // the IVF twin of the block guard, shared by q100/q138/rdStats: a
    // hub-dense hot cell (150 members) next to a cold one; the cover
    // must emit every ORDERED pair exactly once — no drops, no dups —
    // while subdividing the hot cell's join key
    val members = ((0 until 150).map(i => (0, i.toLong)) ++
      (1000 until 1010).map(i => (1, i.toLong))).toDF("cell", "vec_id")
    val guarded = graft.llm.Similarity.guardedCellPairs(members, maxCell = 64)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(guarded.length == guarded.distinct.length,
      "cover produced duplicate ordered pairs")
    val naive = {
      val a = members.select(col("cell"), col("vec_id").as("id_a"))
      val b = members.select(col("cell"), col("vec_id").as("id_b"))
      a.join(b, Seq("cell")).filter(col("id_a") =!= col("id_b"))
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    assert(guarded.sorted.toSeq == naive.sorted.toSeq,
      s"pair sets differ: guarded=${guarded.length} naive=${naive.length}")
    // sanity: 150·149 hot + 10·9 cold ORDERED pairs
    assert(naive.length == 150 * 149 + 90)
    // a cold-only input degenerates to the plain join (k = 1 cover)
    val cold = members.filter(col("cell") === 1)
    assert(graft.llm.Similarity.guardedCellPairs(cold, maxCell = 64)
      .count() == 90L)
  }

  test("cell pair cover: exact on random memberships and shard factors") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // plain-scalacheck harness (the scalatestplus bridge isn't in the
    // offline dependency set — the CommitPropertySpec pattern); fewer
    // iterations than a pure-JVM property since each case runs two
    // Spark jobs
    val genCase = for {
      nCells <- Gen.choose(1, 4)
      sizes <- Gen.listOfN(nCells, Gen.choose(0, 40))
      maxCell <- Gen.oneOf(1, 3, 7, 64, 4096)
    } yield (sizes, maxCell)
    val prop = Prop.forAll(genCase) { case (sizes, maxCell) =>
      val members = sizes.zipWithIndex.flatMap { case (n, c) =>
        (0 until n).map(i => (c, (c * 1000 + i).toLong)) }
      val df = members.toDF("cell", "vec_id")
      val got = graft.llm.Similarity.guardedCellPairs(df, maxCell)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
      val want = for {
        (ca, a) <- members; (cb, b) <- members
        if ca == cb && a != b
      } yield (a, b)
      got.length == got.distinct.length && got.sorted == want.sorted
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("token packing packs null-source documents like any other group") {
    import spark.implicits._
    // 5 docs with NULL source, 4 tokens each, budget 8 → packs 0,0,1,1,2
    val docs = (0 until 5).map(i => (i.toLong, null: String, "a b c d"))
      .toDF("doc_id", "source", "text")
    val packs = graft.llm.Curation.packDocs(docs, budget = 8).collect()
    assert(packs.forall(_.isNullAt(0)), "source should stay null")
    assert(packs.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq ==
      Seq((0L, 2L, 8L), (1L, 2L, 8L), (2L, 1L, 4L)),
      s"null-source packing wrong: ${packs.mkString(", ")}")
  }

  test("subdivision bounds the rows behind any single join key") {
    // reconstruct the guarded A-side keys: with maxBlock=64 and n=150,
    // k=3, so no (x, y) key may carry more than ~n/k ≈ 50 A-side rows —
    // the straggler bound the guard exists for
    val k = 3
    val sharded = fixture.filter(col("source") === "hot_src")
      .select(pmod(hash(col("doc_id")), lit(k)).as("x"))
      .groupBy("x").count().collect().map(_.getLong(1))
    assert(sharded.length == k, s"expected $k shards, got ${sharded.length}")
    assert(sharded.max <= 150 / k + 25, s"shard skew too high: ${sharded.toSeq}")
  }

  test("substring spans: exact island stats on a hand-built corpus") {
    import spark.implicits._
    // k=4 grams. Shared verbatim runs:
    //   docs 1+2 share "w x y z a b" (6 tokens → one merged span)
    //   docs 1+3 share "p q r s" (exactly k tokens → one span)
    //   doc 4 is unique; doc 5 repeats doc 4's run INTERNALLY only
    //   (same-doc repetition is q88's business, not cross-doc dup)
    val docs = Seq(
      (1L, "w x y z a b m1 m2 m3 p q r s"),
      (2L, "n1 w x y z a b n2 n3"),
      (3L, "p q r s o1 o2 o3 o4"),
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8"),
      (5L, "h1 h2 h3 h4 z9 h1 h2 h3 h4")
    ).toDF("doc_id", "text")
    val out = Dedup.substringSpans(docs, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // (doc, n_spans, dup_tokens, n_tokens)
    assert(out == Seq(
      (1L, 2L, 10L, 13L), // "w x y z a b" (6) + "p q r s" (4)
      (2L, 1L, 6L, 9L),
      (3L, 1L, 4L, 8L),
      (4L, 0L, 0L, 8L),
      (5L, 0L, 0L, 9L)
    ), out.toString)

    // removal form: exact cleaned text, untouched docs pass through
    val cleaned = Dedup.stripDuplicateSpans(docs, k = 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(cleaned == Seq(
      (1L, "m1 m2 m3", 10L),
      (2L, "n1 n2 n3", 6L),
      (3L, "o1 o2 o3 o4", 4L),
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8", 0L),
      (5L, "h1 h2 h3 h4 z9 h1 h2 h3 h4", 0L)
    ), cleaned.toString)
  }

  test("one-sided guardedKeyJoin equals the naive equi-join exactly") {
    import spark.implicits._
    // the cross-frame sibling (Skew.guardedKeyJoin, shared by q149's
    // anchor×cell candidates and q164's co-engagement edges): random
    // frames with one hub key on both sides, one left-heavy key, one
    // right-heavy key, a cold key, keys missing from one side, and
    // DUPLICATE rows (same id twice — multiset semantics must hold)
    for (seed <- Seq(3, 11)) {
      val rnd = new scala.util.Random(seed)
      def rows(n: Int, keyOf: Int => String) =
        (0 until n).map(i => (keyOf(i), rnd.nextInt(40).toLong))
      val left = (rows(120, _ => "hub") ++ rows(90, _ => "lheavy") ++
        rows(4, _ => "rheavy") ++ rows(3, _ => "cold") ++
        rows(5, _ => "leftonly") ++ Seq(("dup", 7L), ("dup", 7L)))
        .toDF("k", "la")
      val right = (rows(110, _ => "hub") ++ rows(5, _ => "lheavy") ++
        rows(95, _ => "rheavy") ++ rows(2, _ => "cold") ++
        rows(5, _ => "rightonly") ++ Seq(("dup", 9L)))
        .toDF("k", "rb")
      val guarded = Skew.guardedKeyJoin(left, right, "k", "la", "rb",
          maxSide = 16)
        .select("k", "la", "rb").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      val naive = left.join(right, Seq("k"))
        .select("k", "la", "rb").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(guarded.sorted == naive.sorted,
        s"seed $seed: cover multiset differs — guarded=${guarded.length} " +
          s"naive=${naive.length}")
      // the duplicate left rows each met the right row: multiset, not set
      assert(guarded.count(_ == ("dup", 7L, 9L)) == 2)
      // the hub keys (120×110 on maxSide=16) make the pre-check read
      // hot, so this fixture exercised the SHARDED plan, not the fast
      // path — the shard columns are visible in the optimized plan
      assert(Skew.guardedKeyJoin(left, right, "k", "la", "rb",
          maxSide = 16).queryExecution.optimizedPlan.toString
          .contains("__x"),
        "hot fixture must take the sharded cover")
    }
  }

  test("guardedKeyJoin fast-paths unskewed keys to the plain join") {
    import spark.implicits._
    // every key ≤ maxSide on both sides: the pre-check must route to
    // the plain equi-join (no shard columns, no explode) and the
    // output must still equal the naive join exactly
    val left = (1 to 30).map(i => (s"k${i % 5}", i.toLong)).toDF("k", "la")
    val right = (1 to 20).map(i => (s"k${i % 5}", i.toLong)).toDF("k", "rb")
    val fast = Skew.guardedKeyJoin(left, right, "k", "la", "rb",
      maxSide = 16)
    assert(!fast.queryExecution.optimizedPlan.toString.contains("__x"),
      "cold fixture must take the plain-join fast path")
    val got = fast.select("k", "la", "rb").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val naive = left.join(right, Seq("k")).select("k", "la", "rb")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got == naive)
  }

  test("guard advice registry: record on pre-check, consult on reuse") {
    import spark.implicits._
    val left = (1 to 40).map(i => ("hub", i.toLong)).toDF("k", "la")
    val right = (1 to 35).map(i => ("hub", i.toLong)).toDF("k", "rb")
    // a named family records the pre-check's measurement
    val fam = "spec#advice.family"
    Skew.clearAdvice()
    assert(Skew.advisedMax(fam).isEmpty)
    Skew.guardedKeyJoin(left, right, "k", "la", "rb", maxSide = 8,
      family = Some(fam))
    assert(Skew.advisedMax(fam).contains(40L),
      s"pre-check must record the hottest side: ${Skew.advisedMax(fam)}")
    // a recorded HOT reading routes to the sharded plan without a
    // pre-check job; a recorded COLD one to the plain join — and both
    // paths stay exact multisets (an advice value is a perf hint only)
    val hot = Skew.guardedKeyJoin(left, right, "k", "la", "rb",
      maxSide = 8, family = Some(fam))
    assert(hot.queryExecution.optimizedPlan.toString.contains("__x"))
    Skew.clearAdvice()
    Skew.adviseKey(fam, 2L) // stale-cold advice: plain join, right rows
    val cold = Skew.guardedKeyJoin(left, right, "k", "la", "rb",
      maxSide = 8, family = Some(fam))
    assert(!cold.queryExecution.optimizedPlan.toString.contains("__x"))
    assert(cold.count() == 40L * 35L)
    // advice max-merges: a larger later reading wins, a smaller loses
    Skew.adviseKey(fam, 100L); Skew.adviseKey(fam, 50L)
    assert(Skew.advisedMax(fam).contains(100L))
    Skew.clearAdvice()
  }

  test("maintainer-commit invalidation re-engages the sharded cover") {
    import spark.implicits._
    // the r16 verdict's Missing #3 loop: a family measured COLD against
    // one artifact state must not stay cold after the artifact's
    // maintainer commits — invalidation clears it and the next guarded
    // join re-measures against the grown data
    val fam = "specwh#dups.verified_adjacency.wedges"
    Skew.clearAdvice()
    Skew.adviseKey(fam, 2L) // the pre-growth cold ceiling
    val left = (1 to 40).map(i => ("hub", i.toLong)).toDF("k", "la")
    val right = (1 to 35).map(i => ("hub", i.toLong)).toDF("k", "rb")
    // stale-cold reading: the guard trusts it and takes the plain join
    // even though the (post-append) data is hot — the exact hazard
    val stale = Skew.guardedKeyJoin(left, right, "k", "la", "rb",
      maxSide = 8, family = Some(fam))
    assert(!stale.queryExecution.optimizedPlan.toString.contains("__x"))
    // the maintainer-commit hook clears every family naming the
    // artifact and leaves other families alone (since r18 the real
    // maintainers pass SCOPED markers — `<outFqn>#dups.verified_
    // adjacency` — so this bare marker is the WIDEST legal clear, and
    // the unrelated-family assert below holds a fortiori)
    Skew.adviseKey("otherdir#ann.ivf_cell.anchor_negatives", 7L)
    Skew.invalidateAdvice("dups.verified_adjacency")
    assert(Skew.advisedMax(fam).isEmpty,
      "maintainer commit must clear the artifact's families")
    assert(Skew.advisedMax("otherdir#ann.ivf_cell.anchor_negatives")
      .contains(7L), "unrelated families must survive invalidation")
    // the next guarded join re-runs its pre-check, reads hot (40×35 on
    // maxSide=8), records the fresh ceiling, and takes the sharded
    // cover — the guard is re-engaged
    val fresh = Skew.guardedKeyJoin(left, right, "k", "la", "rb",
      maxSide = 8, family = Some(fam))
    assert(fresh.queryExecution.optimizedPlan.toString.contains("__x"),
      "post-invalidation join must re-engage the sharded cover")
    assert(Skew.advisedMax(fam).contains(40L))
    assert(fresh.count() == 40L * 35L)
    Skew.clearAdvice()
  }

  test("label propagation converges on a deep chain (diameter >> 10)") {
    import spark.implicits._
    // a 200-hop chain 0-1-2-...-200 — the r9 implementation silently
    // capped at 10 rounds and returned UNCONVERGED labels for exactly
    // this shape (long boilerplate near-dup chains); pointer jumping
    // must converge it, and to the true min label everywhere. Reversed
    // edge order so convergence isn't an artifact of ascending ids.
    val chain = (0L until 200L).map(i => (i + 1, i)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(chain)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels.size == 201)
    assert(labels.values.forall(_ == 0L),
      s"chain must collapse to min label 0, got ${labels.values.toSet}")

    // two components + a singleton pair stay separate
    val two = ((0L until 50L).map(i => (i + 1, i)) ++
      (1000L until 1030L).map(i => (i + 1, i)) :+ (5000L, 4999L))
      .toDF("doc_a", "doc_b")
    val l2 = Dedup.connectedComponents(two)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(l2.forall { case (d, l) =>
      if (d <= 50L) l == 0L else if (d <= 1030L) l == 1000L else l == 4999L
    }, s"components bled into each other: ${l2.filterNot { case (d, l) =>
      if (d <= 50L) l == 0L else if (d <= 1030L) l == 1000L else l == 4999L }.toSeq}")
  }
}
