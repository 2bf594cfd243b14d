package graft.catalog

import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}

/** Planning-time observability for graft batch scans, surfaced through
  * the DSv2 metric hooks (`Scan.supportedCustomMetrics` /
  * `reportDriverMetrics`) so every `BatchScanExec` node in the SQL UI
  * answers the operational questions directly: how many files survived
  * manifest pruning, how many pay a merge-on-read penalty and of which
  * flavor, how many the stats/bloom promotion saved, and how large the
  * live delete set is. At 100 TB "this query reads 40k files, 12 dirty"
  * vs "40k dirty" is the difference between shipping and paging the
  * on-call — and compaction scheduling reads the same numbers. */
object ScanMetrics {

  private final class Sum(n: String, d: String) extends CustomSumMetric {
    override def name(): String = n
    override def description(): String = d
  }

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
    new Sum(FilesSelected, "data files selected by pruning"),
    new Sum(FilesDirtyEq, "files on the equality-delete subtract path"),
    new Sum(FilesDirtyPos, "files on the position-delete path"),
    new Sum(FilesPromotedStats, "dirty files cleared by [min,max] stats"),
    new Sum(FilesPromotedBloom, "dirty files cleared by footer blooms"),
    new Sum(DeleteFilesLive, "live delete files on the snapshot"),
    new Sum(RowsSubtractedEq, "rows dropped by equality-delete keys"),
    new Sum(RowsSubtractedPos, "rows dropped by position-delete marks"))

  def value(n: String, v: Long): CustomTaskMetric = new CustomTaskMetric {
    override def name(): String = n
    override def value(): Long = v
  }
}
