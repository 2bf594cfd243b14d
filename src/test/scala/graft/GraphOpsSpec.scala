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
}
