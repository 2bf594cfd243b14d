package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** q179's integer power iteration against a from-scratch driver-side
  * BigInt replay on random embedding fixtures — independent of both the
  * Spark plan and the DuckDB oracle. Every fixed-point rounding,
  * centered-Gram entry, truncating rescale, sign canon, and the
  * Rayleigh share must agree exactly. Also pins the degenerate
  * all-zero corpus (the GREATEST guards) and that the direction
  * actually finds a planted dominant axis. */
class SpectralSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fixtureDir(vecs: Seq[Array[Float]]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-spec").toString
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v, "x") }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    d
  }

  /** The centered fixed-point matrix in BigInt. Spark's Round(double)
    * is BigDecimal.valueOf (the SHORTEST round-trip decimal, not the
    * exact binary expansion) + HALF_UP; scala's BigDecimal(double) ALSO
    * differs — it truncates the exact expansion to DECIMAL128's 34
    * digits, which nudges exact halves (x·2²⁴ is a half-integer for
    * every float in [0.25, 0.5)) off the boundary and flips the
    * rounding. Mirror Spark verbatim. */
  private def buildC(vecs: Seq[Array[Float]]): Array[Array[BigInt]] = {
    val dims = vecs.head.length
    val q = vecs.map(v => v.map { x =>
      BigInt(java.math.BigDecimal.valueOf(x.toDouble * 16777216.0)
        .setScale(0, java.math.RoundingMode.HALF_UP).toBigInteger)
    })
    val n = BigInt(q.size)
    def g(i: Int, j: Int) = q.map(r => r(i) * r(j)).sum
    val m = (0 until dims).map(i => q.map(_(i)).sum)
    Array.tabulate(dims, dims)((i, j) =>
      (n * g(i, j) - m(i) * m(j)) / (n * n))
  }

  /** Six power iterations in BigInt (BigInt./ truncates toward zero —
    * the Spark `div` / DuckDB `//` convention). */
  private def iterate(c: Array[Array[BigInt]]): Array[BigInt] = {
    val dims = c.length
    var v = Array.fill(dims)(BigInt(1000000))
    for (_ <- 1 to 6) {
      val w = Array.tabulate(dims)(i =>
        (0 until dims).map(j => c(i)(j) * v(j)).sum)
      val mx = w.map(_.abs).max.max(BigInt(1))
      v = w.map(wi => wi * 1000000 / mx)
    }
    v
  }

  private def rayPieces(c: Array[Array[BigInt]], v: Array[BigInt])
      : (BigInt, BigInt) = {
    val dims = c.length
    val w7 = Array.tabulate(dims)(i =>
      (0 until dims).map(j => c(i)(j) * v(j)).sum)
    ((0 until dims).map(i => v(i) * w7(i)).sum, v.map(x => x * x).sum)
  }

  /** The q179 arithmetic replayed in BigInt. */
  private def refSpectral(vecs: Seq[Array[Float]])
      : Seq[(Int, Int, Long, Long, Long)] = {
    val dims = vecs.head.length
    val c = buildC(vecs)
    val v = iterate(c)
    val (num, vv) = rayPieces(c, v)
    val trace = (0 until dims).map(i => c(i)(i)).sum
    val share = num * 1000000 / (vv.max(BigInt(1)) * trace.max(BigInt(1)))
    val lead = (0 until dims).minBy(j => (-v(j).abs, j))
    val sgn = if (v(lead) < 0) BigInt(-1) else BigInt(1)
    (0 until dims).map(j => (j, (v(j) * sgn).toLong, c(j)(j).toLong))
      .sortBy { case (j, l, _) => (-math.abs(l), j) }.take(10).zipWithIndex
      .map { case ((j, l, cv), k) => (k + 1, j, l, cv, share.toLong) }
  }

  /** The q184 deflation + second iteration replayed in BigInt. */
  private def refSpectral2(vecs: Seq[Array[Float]])
      : Seq[(Int, Int, Long, Long, Long, Long)] = {
    val dims = vecs.head.length
    val c = buildC(vecs)
    val v1 = iterate(c)
    val (num1, vv1) = rayPieces(c, v1)
    val lam = num1 / vv1.max(BigInt(1))
    val c2 = Array.tabulate(dims, dims)((i, j) =>
      c(i)(j) - v1(i) * v1(j) * lam / BigInt("1000000000000"))
    val v2 = iterate(c2)
    val (num2, vv2) = rayPieces(c2, v2)
    val trace = (0 until dims).map(i => c(i)(i)).sum.max(BigInt(1))
    val s1 = num1 * 1000000 / (vv1.max(BigInt(1)) * trace)
    val s2 = num2 * 1000000 / (vv2.max(BigInt(1)) * trace)
    val lead = (0 until dims).minBy(j => (-v2(j).abs, j))
    val sgn = if (v2(lead) < 0) BigInt(-1) else BigInt(1)
    (0 until dims).map(j => (j, (v2(j) * sgn).toLong))
      .sortBy { case (j, l) => (-math.abs(l), j) }.take(10).zipWithIndex
      .map { case ((j, l), k) =>
        (k + 1, j, l, s1.toLong, s2.toLong, (s1 + s2).toLong) }
  }

  private def run(d: String): Seq[(Int, Int, Long, Long, Long)] =
    llm.Similarity.q179PrincipalDirection(spark, d).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq

  test("q179 equals a BigInt driver-side replay on random fixtures") {
    for (seed <- Seq(5, 23)) {
      val rnd = new scala.util.Random(seed)
      // 40 vectors in 6 dims with a planted dominant axis on dim 2
      // (scale 3×) so the direction is non-trivial and well-separated
      val vecs = Seq.fill(40)(Array.tabulate(6)(j =>
        ((rnd.nextDouble() * 2 - 1) * (if (j == 2) 3 else 1)).toFloat))
      assert(run(fixtureDir(vecs)) == refSpectral(vecs), s"seed $seed")
    }
  }

  test("q179 finds a planted dominant direction") {
    val rnd = new scala.util.Random(99)
    // x = t·(1,1,0,0) + small noise: the top axis is the diagonal, so
    // dims 0 and 1 carry the two largest |loadings| with the same sign
    val vecs = Seq.fill(60) {
      val t = rnd.nextDouble() * 4 - 2
      Array.tabulate(4)(j =>
        (Seq(t, t, 0.0, 0.0)(j) + (rnd.nextDouble() - 0.5) * 0.1).toFloat)
    }
    val got = run(fixtureDir(vecs))
    val byDim = got.map(r => r._2 -> r._3).toMap
    assert(Set(got(0)._2, got(1)._2) == Set(0, 1),
      s"dims 0/1 must lead: $got")
    assert(byDim(0).sign == byDim(1).sign && byDim(0) != 0L,
      s"the diagonal direction loads 0 and 1 together: $got")
    assert(got.head._5 > 900000L,
      s"a 1-D corpus puts ~all variance on the top axis: $got")
  }

  private def run2(d: String): Seq[(Int, Int, Long, Long, Long, Long)] =
    llm.Similarity.q184SecondDirection(spark, d).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq

  test("q184 equals a BigInt driver-side replay on random fixtures") {
    for (seed <- Seq(7, 29)) {
      val rnd = new scala.util.Random(seed)
      val vecs = Seq.fill(40)(Array.tabulate(6)(j =>
        ((rnd.nextDouble() * 2 - 1) * (if (j == 2) 3 else 1)).toFloat))
      assert(run2(fixtureDir(vecs)) == refSpectral2(vecs), s"seed $seed")
    }
  }

  test("q184 recovers a planted SECOND axis under the dominant one") {
    val rnd = new scala.util.Random(71)
    // x = t·e1 (var 4) + s·e4 (var 1) + small noise: the first
    // direction is dim 1, the deflated second is dim 4, and together
    // they explain nearly all variance
    val vecs = Seq.fill(80) {
      val t = rnd.nextDouble() * 4 - 2
      val u = rnd.nextDouble() * 2 - 1
      Array.tabulate(6)(j =>
        ((if (j == 1) t else if (j == 4) u else 0.0)
          + (rnd.nextDouble() - 0.5) * 0.02).toFloat)
    }
    val d = fixtureDir(vecs)
    val first = run(d)
    assert(first.head._2 == 1, s"dominant axis must be dim 1: $first")
    val second = run2(d)
    assert(second.head._2 == 4, s"second axis must be dim 4: $second")
    assert(second.head._6 > 900000L,
      s"two axes must explain ~all variance: $second")
  }

  test("q179 survives the all-zero degenerate corpus") {
    val vecs = Seq.fill(5)(Array.fill(4)(0.0f))
    val got = run(fixtureDir(vecs))
    assert(got.forall(r => r._3 == 0L && r._4 == 0L && r._5 == 0L), got)
  }
}
