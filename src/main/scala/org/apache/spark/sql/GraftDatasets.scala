package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `classic.Dataset.ofRows` — the DataFrame-from-LogicalPlan
  * constructor — is `private[sql]`, so graft's catalog can't drive a
  * query over an ad-hoc DSv2 relation (e.g. the delete-applying file
  * subset a partition-scoped compaction reads) without going through a
  * registered identifier. This accessor (compiled into the Spark
  * package namespace, the standard session-extension technique — see
  * [[org.apache.spark.sql.connector.write.RowLevelOperationTables]])
  * exposes exactly that constructor.
  */
object GraftDatasets {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
