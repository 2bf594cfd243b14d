package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** q164's integer PageRank against a from-scratch driver-side replay on
  * random co-engagement graphs — independent of both the Spark plan
  * under test and the DuckDB oracle (which checks the same pipeline on
  * the driver's corpora): every edge weight, truncating division, and
  * damping mix must agree exactly, across graph shapes the fixed test
  * corpus cannot cover (isolated items, single-user graphs, dense
  * cliques). */
class GraphOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** The q164 arithmetic replayed with plain Scala longs (Long./ is the
    * same truncation as Spark's `div` on the non-negative values here). */
  private def refPagerank(ui: Seq[(Long, Long)]): Seq[(Int, Long, Long, Long)] = {
    val pairs = ui.distinct
    val edges = (for {
      (u, a) <- pairs; (u2, b) <- pairs if u2 == u && a != b
    } yield (a, b)).groupBy(identity).toSeq
      .map { case ((a, b), xs) => (a, b, xs.size.toLong) }
    val degB = edges.groupBy(_._2).map { case (b, xs) => b -> xs.map(_._3).sum }
    val nodes = pairs.map(_._2).distinct.sorted
    var pr = nodes.map(i => i -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val flow = edges.groupBy(_._1).map { case (a, xs) =>
        a -> xs.map { case (_, b, w) => pr(b) * w / degB(b) }.sum
      }
      pr = nodes.map(i => i ->
        (150000L + 85L * flow.getOrElse(i, 0L) / 100L)).toMap
    }
    val degIn = edges.groupBy(_._1).map { case (a, xs) => a -> xs.map(_._3).sum }
    nodes.map(i => (i, pr(i), degIn.getOrElse(i, 0L)))
      .sortBy { case (i, p, _) => (-p, i) }.take(10).zipWithIndex
      .map { case ((i, p, d), k) => (k + 1, i, p, d) }
  }

  test("q164 equals a driver-side replay on random graph shapes") {
    import spark.implicits._
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      // 30 engagements over 5 users × 8 items, plus one isolated item
      // (a single engagement by a user who touches nothing else) so the
      // jump-term-only path is exercised
      val ui = Seq.fill(30)((rnd.nextInt(5).toLong + 1, rnd.nextInt(8).toLong + 1)) :+
        (99L, 50L)
      val d = Files.createTempDirectory(s"graft-pr-$seed").toString
      ui.zipWithIndex.map { case ((u, item), i) =>
        (i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L), u,
          "view", 1.0, s"""{"k": $item}""")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$d/events.parquet")
      val got = ops.Extended.q164ItemPagerank(spark, d).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got == refPagerank(ui), s"seed $seed: $got")
    }
  }

  /** The q177 census replayed with plain Scala collections: naive
    * adjacency sets, naive wedge closure, the same truncating cc
    * division and (triangles, degree, doc) tiebreaks. */
  private def refTriangles(edges: Seq[(Long, Long)])
      : Seq[(Int, Long, Long, Long, Long, Long)] = {
    val es = edges.map { case (a, b) => (a min b, a max b) }.distinct
    val eset = es.toSet
    val nb = (es ++ es.map(_.swap)).groupBy(_._1)
      .map { case (v, xs) => v -> xs.map(_._2).toSet }
    val tri = nb.map { case (v, ns) =>
      val sorted = ns.toSeq.sorted
      v -> (for {
        i <- sorted.indices; j <- (i + 1) until sorted.length
        if eset((sorted(i), sorted(j)))
      } yield 1).size.toLong
    }
    val total = tri.values.sum / 3
    nb.toSeq.map { case (v, ns) =>
      val d = ns.size.toLong
      val t = tri(v)
      val cc =
        if (d < 2) BigInt(0) else BigInt(2) * t * 1000000 / (d * (d - 1))
      (v, d, t, cc.toLong)
    }.sortBy { case (v, d, t, _) => (-t, -d, v) }.take(10).zipWithIndex
      .map { case ((v, d, t, cc), k) => (k + 1, v, d, t, cc, total) }
  }

  test("q177 census equals a driver-side replay on random graphs") {
    import spark.implicits._
    for (seed <- Seq(3, 11, 42)) {
      val rnd = new scala.util.Random(seed)
      // ~40 random edges over 12 nodes (dense enough for triangles),
      // plus a guaranteed star (hub 100 chained to three leaves that
      // don't interconnect: degree high, cc 0) and a clean clique
      val base = Seq.fill(40) {
        val a = rnd.nextInt(12).toLong; val b = rnd.nextInt(12).toLong
        (a, b)
      }.filter { case (a, b) => a != b }
      val star = Seq((100L, 101L), (100L, 102L), (100L, 103L))
      val clique = for {
        a <- 200L to 203L; b <- (a + 1) to 203L
      } yield (a, b)
      val edges = (base ++ star ++ clique)
        .map { case (a, b) => (a min b, a max b) }.distinct
      val got = llm.Dedup.triangleCensusOver(
          edges.toDF("doc_a", "doc_b")).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSeq
      assert(got == refTriangles(edges), s"seed $seed: $got")
    }
  }

  /** The q183 arithmetic replayed with BigInt (truncating division,
    * max-rescale each half-step, the same tiebreaks). */
  private def refHits(ui: Seq[(Long, Long)]): Seq[(Int, Long, Long, Long)] = {
    val pairs = ui.distinct
    val items = pairs.map(_._2).distinct
    val users = pairs.map(_._1).distinct
    var a = items.map(_ -> BigInt(1000000)).toMap
    var h = Map.empty[Long, BigInt]
    for (_ <- 1 to 3) {
      val hRaw = users.map(u => u ->
        pairs.filter(_._1 == u).map(p => a(p._2)).sum).toMap
      val hm = hRaw.values.max.max(BigInt(1))
      h = hRaw.map { case (u, r) => u -> r * 1000000 / hm }
      val aRaw = items.map(i => i ->
        pairs.filter(_._2 == i).map(p => h(p._1)).sum).toMap
      val am = aRaw.values.max.max(BigInt(1))
      a = aRaw.map { case (i, r) => i -> r * 1000000 / am }
    }
    val deg = items.map(i => i -> pairs.count(_._2 == i).toLong).toMap
    items.map(i => (i, a(i).toLong, deg(i)))
      .sortBy { case (i, au, _) => (-au, i) }.take(10).zipWithIndex
      .map { case ((i, au, d), k) => (k + 1, i, au, d) }
  }

  test("q183 HITS equals a driver-side replay on random bipartite graphs") {
    import spark.implicits._
    for (seed <- Seq(2, 13, 42)) {
      val rnd = new scala.util.Random(seed)
      // 35 engagements over 6 users × 9 items, plus a single-edge user
      // so a degree-1 hub and its authority exercise the rescale floor
      val ui = Seq.fill(35)((rnd.nextInt(6).toLong + 1,
        rnd.nextInt(9).toLong + 1)) :+ (88L, 77L)
      val d = Files.createTempDirectory(s"graft-hits-$seed").toString
      ui.zipWithIndex.map { case ((u, item), i) =>
        (i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L), u,
          "view", 1.0, s"""{"k": $item}""")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$d/events.parquet")
      val got = ops.Extended.q183Hits(spark, d).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got == refHits(ui), s"seed $seed: $got vs ${refHits(ui)}")
    }
  }

  test("q164/q165 exclude events whose props carry no item") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // three item-bearing engagements plus two itemless events (no $.k
    // key at all, and a props with a different key): the stated
    // NULL-node convention says both graph and popularity cards ignore
    // them — a NULL item row would order differently in Spark (NULLS
    // FIRST) vs DuckDB (NULLS LAST) and silently break the oracle
    val rows = Seq(
      (0L, "{\"k\": 1}"), (1L, "{\"k\": 2}"), (2L, "{\"k\": 1}"),
      (3L, "{}"), (4L, "{\"other\": 9}"))
    val d = Files.createTempDirectory("graft-pr-null").toString
    rows.zipWithIndex.map { case ((id, props), i) =>
      (id, new java.sql.Timestamp(1700000000000L + i * 86400000L), 7L,
        "view", 1.0, props)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val pr = ops.Extended.q164ItemPagerank(spark, d).collect()
    assert(pr.forall(!_.isNullAt(1)), "no NULL item node may survive")
    assert(pr.map(_.getLong(1)).toSet == Set(1L, 2L),
      "only the item-bearing engagements form graph nodes")
    val pop = ops.Scalars.q165RecencyPopularity(spark, d).collect()
    assert(pop.forall(!_.isNullAt(0)), "no NULL item row may survive")
    assert(pop.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 2L, 2L -> 1L), "itemless events contribute nothing")
    // and the decay anchor is the max ts of the SURVIVING events: the
    // latest event here is itemless (i = 4), so age counts from i = 2
    val m = pop.map(r => r.getLong(0) -> r.getLong(2)).toMap
    // item 1: ages 2 and 0 days from the i=2 anchor → 333333 + 1000000
    assert(m(1L) == 1333333L, s"decay must anchor on surviving max ts: $m")
  }

  test("q165 mass fold survives sums past the int64 ceiling") {
    // w_u ≤ 10⁶ per event, so one item's decayed mass passes int64 at
    // ~9.2·10¹² events — the q145/q166 headroom class. This pins the
    // shipped DECIMAL fold with synthetic weights that separate it
    // from a LONG sum (which ANSI-throws): three half-Long values.
    val vals = "FROM VALUES (4611686018427387903L), " +
      "(4611686018427387903L), (4611686018427387903L) AS t(w)"
    val dec = spark.sql(
      s"SELECT SUM(CAST(w AS DECIMAL(20,0))) AS m $vals").head()
    assert(dec.getDecimal(0).toBigInteger.toString == "13835058055282163709",
      s"decimal fold must be exact, got $dec")
    val longPath = scala.util.Try(
      spark.sql(s"SELECT SUM(w) AS m $vals").head().getLong(0))
    assert(longPath.isFailure || longPath.get != 0L &&
      longPath.get.toString != "13835058055282163709",
      s"the int64 fold must not survive this input: $longPath")
  }
}
