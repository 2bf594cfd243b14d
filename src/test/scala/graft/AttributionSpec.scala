package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** q178's last-touch attribution on hand-built event timelines pinning
  * every branch of the channel verdict: fresh touch credited, stale
  * touch (> 7 days) → direct, no touch at all → direct, later touches
  * override earlier ones, touches AFTER the purchase never count, and
  * same-timestamp ordering resolves by event_id. The DuckDB oracle
  * checks the same pipeline on the driver's corpora; this spec checks
  * the SEMANTICS on timelines the corpus may not contain. */
class AttributionSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val T0 = 1700000000000L // anchor epoch millis
  private val Day = 86400000L

  private def run(rows: Seq[(Long, Long, Long, String, Double)])
      : Map[String, (Long, Double, Long)] = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-attr").toString
    rows.map { case (id, tsOff, u, typ, v) =>
      (id, new java.sql.Timestamp(T0 + tsOff), u, typ, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    ops.Scalars.q178LastTouch(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
  }

  test("fresh touch credited; stale and absent touches go direct") {
    val got = run(Seq(
      // user 1: click 2 days before purchase → credited to click
      (0L, 0L, 1L, "click", 0.0),
      (1L, 2 * Day, 1L, "purchase", 10.00),
      // user 2: view 8 days before purchase → stale → direct
      (2L, 0L, 2L, "view", 0.0),
      (3L, 8 * Day, 2L, "purchase", 5.50),
      // user 3: purchase with no touch at all → direct
      (4L, Day, 3L, "purchase", 2.25)))
    assert(got == Map(
      "click" -> ((1L, 10.00, 333333L)),
      "direct" -> ((2L, 7.75, 666666L))), got.toString)
  }

  test("the LAST preceding touch wins; later touches never count") {
    val got = run(Seq(
      (0L, 0L, 1L, "view", 0.0),
      (1L, Day, 1L, "click", 0.0), // overrides the view
      (2L, 2 * Day, 1L, "purchase", 4.00),
      (3L, 3 * Day, 1L, "view", 0.0), // after the purchase: ignored
      // errors and signups are not touch types
      (4L, 0L, 2L, "error", 0.0),
      (5L, Day, 2L, "purchase", 1.00)))
    assert(got == Map(
      "click" -> ((1L, 4.00, 500000L)),
      "direct" -> ((1L, 1.00, 500000L))), got.toString)
  }

  test("same-timestamp touch/purchase resolves by event_id order") {
    // touch and purchase share ts: the touch's event_id is LOWER, so it
    // precedes the purchase in the (ts, event_id) frame and is credited;
    // flip the ids and it follows the purchase — direct
    val credited = run(Seq(
      (0L, Day, 1L, "view", 0.0), (1L, Day, 1L, "purchase", 3.00)))
    assert(credited == Map("view" -> ((1L, 3.00, 1000000L))),
      credited.toString)
    val direct = run(Seq(
      (1L, Day, 1L, "view", 0.0), (0L, Day, 1L, "purchase", 3.00)))
    assert(direct == Map("direct" -> ((1L, 3.00, 1000000L))),
      direct.toString)
  }

  test("q180 cohort matrix on a hand-built two-cohort timeline") {
    import spark.implicits._
    // week W0 cohort: users 1,2,3 (3 active); user 1 returns in W1 and
    // W2, user 2 in W1 — W1 retention 2/3, W2 retention 1/3. Week W1
    // cohort: user 4 only, never returns — a 1-row cohort at offset 0.
    // 1700438400000 = 2023-11-20 (a Monday), so week boundaries are
    // unambiguous on both engines
    val W = 7 * Day
    val rows = Seq(
      (0L, 0L, 1L), (1L, Day, 2L), (2L, 2 * Day, 3L), // W0 cohort
      (3L, W + Day, 1L), (4L, W + 2 * Day, 2L),       // W1 returns
      (5L, 2 * W + Day, 1L),                          // W2 return
      (6L, W + 3 * Day, 4L))                          // W1 cohort
    val d = Files.createTempDirectory("graft-cohort").toString
    rows.map { case (id, off, u) =>
      (id, new java.sql.Timestamp(1700438400000L + off), u,
        "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val got = ops.Scalars.q180CohortRetention(spark, d).collect()
      .map { r =>
        val cohortMs = r.get(0) match {
          case t: java.sql.Timestamp => t.getTime
          case l: java.time.LocalDateTime =>
            l.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
        }
        (cohortMs, r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))
      }.toSeq
    val w0 = 1700438400000L
    assert(got == Seq(
      (w0, 0, 3L, 3L, 1000000L),
      (w0, 1, 2L, 3L, 666666L),
      (w0, 2, 1L, 3L, 333333L),
      (w0 + W, 0, 1L, 1L, 1000000L)), got.toString)
  }

  test("q185 session card on hand-built sessions (bounce, duration, entry)") {
    import spark.implicits._
    val M = 60000L
    // user 1: a 3-event session entered via 'view' (duration 10 min),
    // then after a >30-min gap a 1-event 'click' bounce; user 2: a
    // 2-event session entered via 'view' (duration 5 min)
    val rows = Seq(
      (0L, 0L, 1L, "view"), (1L, 5 * M, 1L, "click"),
      (2L, 10 * M, 1L, "purchase"),
      (3L, 60 * M, 1L, "click"),
      (4L, 0L, 2L, "view"), (5L, 5 * M, 2L, "view"))
    val d = Files.createTempDirectory("graft-sessq").toString
    rows.map { case (id, off, u, typ) =>
      (id, new java.sql.Timestamp(T0 + off), u, typ, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val got = ops.Scalars.q185SessionQuality(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      // two view-entered sessions: durations 600 s and 300 s → mean
      // 450 s; (3 + 2) events div 2 sessions = 2500000 micro-events
      "view" -> ((2L, 0L, 450L, 2500000L)),
      // one click-entered bounce: 1 event, duration 0
      "click" -> ((1L, 1000000L, 0L, 1000000L))), got.toString)
  }

  test("q186 burstiness card: exact mean and cv² on planted gaps") {
    import spark.implicits._
    // user 1 'view' gaps: 100 s and 300 s → n=2, mean 200, cv² =
    // (2·(100²+300²) − 400²)·10⁶ / 400² = 250000; user 2 'click'
    // metronome gaps 50/50 → cv² = 0
    val rows = Seq(
      (0L, 0L, 1L, "view"), (1L, 100L, 1L, "view"), (2L, 400L, 1L, "view"),
      (3L, 0L, 2L, "click"), (4L, 50L, 2L, "click"), (5L, 100L, 2L, "click"))
    val d = Files.createTempDirectory("graft-burst").toString
    rows.map { case (id, offS, u, typ) =>
      (id, new java.sql.Timestamp(T0 + offS * 1000L), u, typ, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val got = ops.Scalars.q186Burstiness(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      "view" -> ((2L, 200L, 250000L)),
      "click" -> ((2L, 50L, 0L))), got.toString)
  }

  test("q187 percentile picks follow the ceil(n·p) disc convention") {
    import spark.implicits._
    // channel 'view': 4 conversions with lags 10/20/30/40 s → p50 at
    // position ceil(2) = 2 → 20 s, p90 at ceil(3.6) = 4 → 40 s; a
    // stale view conversion and a direct one must not enter the lags
    val rows = Seq(
      (0L, 0L, 1L, "view"), (1L, 10L, 1L, "purchase"),
      (2L, 1000L, 2L, "view"), (3L, 1020L, 2L, "purchase"),
      (4L, 2000L, 3L, "view"), (5L, 2030L, 3L, "purchase"),
      (6L, 3000L, 4L, "view"), (7L, 3040L, 4L, "purchase"),
      // stale: touch 8 days before the purchase → direct, no lag row
      (8L, 0L, 5L, "view"), (9L, 8L * 24 * 3600, 5L, "purchase"),
      // no touch at all → direct, no lag row
      (10L, 50L, 6L, "purchase"))
    val d = Files.createTempDirectory("graft-lag").toString
    rows.map { case (id, offS, u, typ) =>
      (id, new java.sql.Timestamp(T0 + offS * 1000L), u, typ, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val got = ops.Scalars.q187ConversionLag(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(("view", 4L, 20L, 40L)), got.toString)
  }

  test("q188 lift separates a planted nocturnal type from a uniform one") {
    import spark.implicits._
    val H = 3600000L
    // 'error' fires only in hour 3 (×4); 'view' spreads over hours
    // 3/9/15/21 — error@3 lift = (4·8·10⁶)/(4·5) = 1600000, view@3 =
    // (1·8·10⁶)/(4·5) = 400000, view@9 = (1·8·10⁶)/(4·1) = 2000000
    val rows = Seq((0L, 3L, "error"), (1L, 3L, "error"), (2L, 3L, "error"),
      (3L, 3L, "error"), (4L, 3L, "view"), (5L, 9L, "view"),
      (6L, 15L, "view"), (7L, 21L, "view"))
    val d = Files.createTempDirectory("graft-hourly").toString
    rows.map { case (id, hr, typ) =>
      // T0 = 2023-11-14 22:13:20 UTC; anchor to the NEXT midnight so
      // the planted hour-of-day survives the epoch offset
      (id, new java.sql.Timestamp(1700006400000L + hr * H), 1L + id, typ,
        1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val got = ops.Scalars.q188TypeHourProfile(spark, d).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(("error", 3)) == ((4L, 1600000L)), got.toString)
    assert(got(("view", 3)) == ((1L, 400000L)), got.toString)
    assert(got(("view", 9)) == ((1L, 2000000L)), got.toString)
  }

  test("exactly-7-days touch is still inside the window") {
    val got = run(Seq(
      (0L, 0L, 1L, "click", 0.0),
      (1L, 7 * Day, 1L, "purchase", 9.99)))
    assert(got == Map("click" -> ((1L, 9.99, 1000000L))), got.toString)
  }
}
