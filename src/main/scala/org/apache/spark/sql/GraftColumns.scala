package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** `classic.ExpressionUtils.column` / `.expression` — the
  * Column↔Expression bridge — are `private[sql]` in Spark 4, so graft's
  * native Catalyst expressions (graft.functions) can't be composed into
  * Column pipelines without a per-session function registration. This
  * accessor (compiled into the Spark package namespace, the same
  * technique as [[GraftDatasets]]) exposes exactly that bridge: a
  * registration-free Column over a native expression works inside
  * higher-order-function lambdas and sessions that never called
  * register(). */
object GraftColumns {
  def of(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
