package graft.catalog

import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}

// Each metric is its own top-level zero-arg class: the SQL UI's
// listener re-instantiates the class reflectively (by name, no-arg) to
// aggregate task values — a parameterized shared class would throw in
// SQLAppStatusListener.aggregateMetrics and silently blank the UI.

private[graft] class FilesSelectedMetric extends CustomSumMetric {
  override def name(): String = ScanMetrics.FilesSelected
  override def description(): String = "data files selected by pruning"
}
private[graft] class FilesDirtyEqMetric extends CustomSumMetric {
  override def name(): String = ScanMetrics.FilesDirtyEq
  override def description(): String = "files on the equality-delete subtract path"
}
private[graft] class FilesDirtyPosMetric extends CustomSumMetric {
  override def name(): String = ScanMetrics.FilesDirtyPos
  override def description(): String = "files on the position-delete path"
}
private[graft] class FilesPromotedStatsMetric extends CustomSumMetric {
  override def name(): String = ScanMetrics.FilesPromotedStats
  override def description(): String = "dirty files cleared by [min,max] stats"
}
private[graft] class FilesPromotedBloomMetric extends CustomSumMetric {
  override def name(): String = ScanMetrics.FilesPromotedBloom
  override def description(): String = "dirty files cleared by footer blooms"
}
private[graft] class DeleteFilesLiveMetric extends CustomSumMetric {
  override def name(): String = ScanMetrics.DeleteFilesLive
  override def description(): String = "live delete files on the snapshot"
}
private[graft] class RowsSubtractedEqMetric extends CustomSumMetric {
  override def name(): String = ScanMetrics.RowsSubtractedEq
  override def description(): String = "rows dropped by equality-delete keys"
}
private[graft] class RowsSubtractedPosMetric extends CustomSumMetric {
  override def name(): String = ScanMetrics.RowsSubtractedPos
  override def description(): String = "rows dropped by position-delete marks"
}

/** Planning-time observability for graft batch scans, surfaced through
  * the DSv2 metric hooks (`Scan.supportedCustomMetrics` /
  * `reportDriverMetrics`) so every `BatchScanExec` node in the SQL UI
  * answers the operational questions directly: how many files survived
  * manifest pruning, how many pay a merge-on-read penalty and of which
  * flavor, how many the stats/bloom promotion saved, how large the
  * live delete set is, and how many rows the subtract actually dropped
  * at execution. At 100 TB "this query reads 40k files, 12 dirty" vs
  * "40k dirty" is the difference between shipping and paging the
  * on-call — and compaction scheduling reads the same numbers. */
object ScanMetrics {

  /** Data files selected after manifest + runtime pruning. */
  val FilesSelected = "filesSelected"
  /** Files read through the equality-delete subtract path. */
  val FilesDirtyEq = "filesDirtyEq"
  /** Files read through the position-delete path. */
  val FilesDirtyPos = "filesDirtyPos"
  /** Delete-outranked files proven untouched by manifest [min,max]. */
  val FilesPromotedStats = "filesPromotedStats"
  /** Delete-outranked files proven untouched by parquet footer blooms. */
  val FilesPromotedBloom = "filesPromotedBloom"
  /** Live delete files on the scanned snapshot. */
  val DeleteFilesLive = "deleteFilesLive"
  /** Rows dropped by the equality-delete subtract (executor-side). */
  val RowsSubtractedEq = "rowsSubtractedEq"
  /** Rows dropped by position-delete marks (executor-side). */
  val RowsSubtractedPos = "rowsSubtractedPos"

  val supported: Array[CustomMetric] = Array(
    new FilesSelectedMetric, new FilesDirtyEqMetric, new FilesDirtyPosMetric,
    new FilesPromotedStatsMetric, new FilesPromotedBloomMetric,
    new DeleteFilesLiveMetric, new RowsSubtractedEqMetric,
    new RowsSubtractedPosMetric)

  def value(n: String, v: Long): CustomTaskMetric = new CustomTaskMetric {
    override def name(): String = n
    override def value(): Long = v
  }
}
