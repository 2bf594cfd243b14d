package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-arithmetic helpers for oracle parity.
  *
  * All money-like columns in the testdata are doubles with exactly two
  * decimal places (verified in FIXTURES.md schemas). Summing raw doubles is
  * order-dependent (Spark's partial/final aggregation and DuckDB's
  * aggregation visit rows in different orders), so two correct engines can
  * disagree in the last ulps. We instead aggregate an exact integer
  * "cents" representation (`round(x*100)` is exact for 2-dp doubles) and
  * divide once at the end — bit-identical on both engines, in any order,
  * at any scale. This is also the faster plan at 100 TB: long sums are
  * cheaper than decimal sums and stay inside whole-stage codegen.
  */
object Exact {
  /** Exact integer cents of a 2-dp money double. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** SUM(money) as an exact double with 2 dp. */
  def sumMoney(c: Column): Column = sum(cents(c)) / 100.0

  /** Oracle-side SQL for the same. */
  def sqlCents(e: String): String = s"CAST(ROUND(($e)*100) AS BIGINT)"
  def sqlSumMoney(e: String): String = s"SUM(${sqlCents(e)})/100.0"
}
