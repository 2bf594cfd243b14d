package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.stream.Streaming

/** Append-mode streaming semantics the single-replay-batch oracle can't
  * exercise: windows/sessions emit exactly once when the watermark closes
  * them, and the state store evicts closed entries — the property that
  * makes the q70/q71 plans runnable CONTINUOUSLY at production scale
  * (bounded state), not just over a finite replay.
  */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val wh = java.nio.file.Files.createTempDirectory("graft-stream-wh").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.graftst", classOf[graft.catalog.GraftCatalog].getName)
    .config("spark.sql.catalog.graftst.warehouse", wh)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)

  private def ev(minute: Int, user: Long = 1L): Ev =
    Ev(Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), user, "click", 1.0)

  test("append-mode tumbling windows: watermark emits once and evicts state") {
    import spark.implicits._
    val input = MemoryStream[Ev](spark)
    val name = "tumbling_append_" + java.util.UUID.randomUUID().toString.take(8)
    val q = Streaming.tumblingAppend(input.toDF())
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      // batch 1: two windows open — [10:00,10:05) and [10:05,10:10);
      // watermark (max 10:07 - 10min) closes neither → nothing emitted
      input.addData(ev(0), ev(2), ev(7))
      q.processAllAvailable()
      assert(spark.table(name).count() == 0, "window emitted before watermark")

      // batch 2: an event at 10:30 advances the watermark to 10:20 —
      // both early windows close and emit exactly once
      input.addData(ev(30))
      q.processAllAvailable()
      val emitted = spark.table(name).orderBy("win_start").collect()
      assert(emitted.map(_.getLong(2)).toSeq == Seq(2L, 1L),
        s"expected the two closed windows, got ${emitted.mkString(",")}")

      // bounded state: only the still-open [10:30,10:35) window remains
      val stateRows = q.lastProgress.stateOperators.apply(0).numRowsTotal
      assert(stateRows == 1, s"closed windows not evicted: $stateRows state rows")
    } finally q.stop()
  }

  test("append-mode session windows: closed sessions emit once and leave state") {
    import spark.implicits._
    val input = MemoryStream[Ev](spark)
    val name = "session_append_" + java.util.UUID.randomUUID().toString.take(8)
    val q = Streaming.sessionAppend(input.toDF(), gap = "5 minutes",
        watermark = "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      // user 1: events at 10:00/10:02 (one session, ends 10:07);
      // user 2: event at 10:05 (session ends 10:10). Watermark after this
      // batch = 10:05 - 10min = 9:55 → closes nothing
      input.addData(ev(0, 1L), ev(2, 1L), ev(5, 2L))
      q.processAllAvailable()
      assert(spark.table(name).count() == 0, "session emitted before watermark")

      // 10:40 (user 2) → watermark 10:30 closes both earlier sessions
      input.addData(ev(40, 2L))
      q.processAllAvailable()
      val emitted = spark.table(name).orderBy("user_id", "sess_start").collect()
      assert(emitted.map(r => (r.getLong(0), r.getLong(2))).toSeq
        == Seq((1L, 2L), (2L, 1L)),
        s"expected user1 (2 events) + user2 (1 event) sessions, got ${emitted.mkString(",")}")

      // only user 2's open 10:40 session may remain in the store
      val stateRows = q.lastProgress.stateOperators.apply(0).numRowsTotal
      assert(stateRows == 1, s"closed sessions not evicted: $stateRows state rows")
    } finally q.stop()
  }

  test("streaming sink into a catalog table: one atomic snapshot per micro-batch") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftst.stream")
    spark.sql("CREATE TABLE graftst.stream.ev (user_id BIGINT, value DOUBLE)")
    val input = MemoryStream[Ev](spark)
    // foreachBatch → exactly-once catalog sink: each micro-batch lands
    // as ONE CAS-committed snapshot stamped with its batch id, so
    // readers see batch boundaries atomically, time travel reaches the
    // state after any batch, and a REPLAYED batch (failure recovery)
    // is recognized and skipped instead of doubling rows
    // mixed-case queryKey on purpose: write options lowercase their keys,
    // and the sink must stay idempotent regardless
    val sink = graft.stream.Streaming.catalogSink(
      spark, "graftst", Seq("stream"), "ev", "specIngest")
    val q = input.toDF().select($"user_id", $"value")
      .writeStream
      .foreachBatch(sink)
      .start()
    try {
      input.addData(ev(0, 1L), ev(1, 2L))
      q.processAllAvailable()
      input.addData(ev(2, 3L))
      q.processAllAvailable()
    } finally q.stop()

    assert(spark.table("graftst.stream.ev").count() == 3)
    val store = spark.sessionState.catalogManager.catalog("graftst")
      .asInstanceOf[graft.catalog.GraftCatalog].metadataStore
    val (m, v) = store.load(Seq("stream"), "ev")
    assert(m.snapshots.size == 2, s"expected 2 snapshots, got ${m.snapshots.size}")
    assert(v == 3) // v1 create + one commit per micro-batch
    // time travel to the first batch's snapshot
    assert(spark.sql("SELECT count(*) FROM graftst.stream.ev VERSION AS OF 2")
      .head.getLong(0) == 2L)

    // failure-recovery replay: re-delivering ALREADY-COMMITTED batches
    // must be a no-op (at-least-once delivery → exactly-once effects)
    import spark.implicits._
    val replay = Seq((1L, 10.0), (2L, 20.0)).toDF("user_id", "value")
    sink(replay, 0L) // batch 0 again
    sink(replay, 1L) // batch 1 again
    assert(spark.table("graftst.stream.ev").count() == 3,
      "replayed batches were double-committed")
    // a genuinely NEW batch still lands
    sink(Seq((9L, 90.0)).toDF("user_id", "value"), 2L)
    assert(spark.table("graftst.stream.ev").count() == 4)

    // zombie-failover fence: the read-side watermark is racy, so the
    // commit itself carries AssertMaxSummaryBelow — re-committing an
    // already-committed batch id DIRECTLY (bypassing the sink's
    // watermark, as a zombie driver would) must fail in the CAS loop
    val zombie = intercept[Exception] {
      Seq((99L, 1.0)).toDF("user_id", "value")
        .writeTo("graftst.stream.ev")
        .option("summary.streaming-batch-specingest", "2")
        .option("require-summary-max-below.streaming-batch-specingest", "2")
        .append()
    }
    def chain(e: Throwable): Seq[Throwable] =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(16).toSeq
    assert(chain(zombie).exists(_.isInstanceOf[graft.commit.CommitFailedException]),
      s"expected a commit-fence failure, got $zombie")
    assert(spark.table("graftst.stream.ev").count() == 4,
      "zombie re-commit slipped through the fence")
  }
}
