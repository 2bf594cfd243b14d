package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** Loaders for the driver testdata (`TESTDATA.md`): one parquet per table
  * under a scale-factor dir. All timestamps are normalized to
  * `TimestampNTZType` (naive, microsecond) so results line up with the
  * DuckDB oracle's naive `TIMESTAMP` semantics:
  *   - lineitem/orders carry `timestamp[ms]` which Spark 4 already reads
  *     as NTZ;
  *   - events carries `timestamp[ns]`, which Spark's parquet reader only
  *     accepts as a raw long (`spark.sql.legacy.parquet.nanosAsLong`) —
  *     we convert nanos → micros (floor) → NTZ, matching DuckDB's
  *     `CAST(ts_ns AS TIMESTAMP)` truncation.
  *
  * At 100 TB these would be catalog tables (see graft.catalog) with
  * partition pruning; the raw-path reader is the bench/verify harness
  * entry point and keeps scans vectorized + pushdown-friendly.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** events.ts has shipped as both parquet TIMESTAMP(NANOS) (readable
    * only as a raw long, floored to micros here) and TIMESTAMP(MICROS)
    * (already NTZ) across testdata generations — adapt to whichever the
    * file carries; either way the result is naive-micros NTZ, the same
    * value DuckDB produces with `CAST(ts AS TIMESTAMP)`. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
      case TimestampNTZType => df
      case _ => df.withColumn("ts", col("ts").cast(TimestampNTZType))
    }
  }

  /** SQL fragment the oracle side uses for the same events normalization. */
  val eventsOracleCte: String =
    "events_n AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"
}
