package graft.catalog

import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, Statistics}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

import graft.meta.MetaStore

/** Stream offset = table metadata version: "every file in version v's
  * snapshot has been delivered". Versions are totally ordered, durable,
  * and replayable (`loadVersion` serves immutable history), which makes
  * the offset both restart-safe and humanly debuggable. */
private[graft] case class GraftSourceOffset(version: Int) extends Offset {
  override def json(): String = version.toString
}

/** MICRO_BATCH_READ over a graft catalog table — the missing half of the
  * CDC loop (the reference catalog exists to serve engines' continuous
  * reads; `/root/reference/api/handlers/tables.go:229-273` is the load
  * endpoint such an engine polls). Each micro-batch is exactly the
  * file-set delta between two metadata versions — the same computation
  * the batch `from-version` read option performs — so
  * {{{ spark.readStream.table("graft.ns.t") }}}
  * tails snapshot commits: appends arrive as their new files, nothing is
  * ever re-delivered (the engine checkpoints version offsets), and
  * chained with the exactly-once sink you get table-to-table incremental
  * pipelines.
  *
  * Semantics under non-append commits mirror `from-version`: after an
  * overwrite/rollback the delta is "files the commit introduced" — a
  * changes-feed of additions, never a retraction stream. Offsets older
  * than the earliest retained metadata version (after expireSnapshots)
  * fail the restart loudly rather than silently skipping.
  *
  * The read option `from-version` sets the stream's STARTING baseline
  * (default 0 = deliver the whole existing table as the first batch;
  * `latest` = tail only commits after stream start). */
private[graft] class GraftMicroBatchStream(
    store: MetaStore, ns: Seq[String], table: String,
    startVersion: Int,
    delegateScanFor: Seq[String] => Scan) extends MicroBatchStream {

  private def filesAt(v: Int): Seq[String] =
    if (v <= 0) Nil
    else store.loadVersion(ns, table, v).currentSnapshot.map(_.files).getOrElse(Nil)

  override def initialOffset(): Offset = GraftSourceOffset(startVersion)

  override def latestOffset(): Offset =
    GraftSourceOffset(math.max(startVersion, store.currentVersion(ns, table)))

  override def deserializeOffset(json: String): Offset =
    GraftSourceOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftSourceOffset].version
    val e = end.asInstanceOf[GraftSourceOffset].version
    if (e <= s) return Array.empty
    // snapshot file lists are cumulative under appends, so the set
    // difference IS the delta; recomputing it from immutable versions
    // makes a replayed (uncommitted-at-crash) batch bit-identical
    val baseline = filesAt(s).toSet
    val delta = filesAt(e).filterNot(baseline)
    delegateScanFor(delta).toBatch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // the parquet reader factory depends only on schema/filters/conf,
    // never on the file list — an empty delegate yields a factory that
    // reads whatever FilePartitions each batch plans
    delegateScanFor(Nil).toBatch.createReaderFactory()

  override def commit(end: Offset): Unit = () // engine-side checkpoint is the ledger

  override def stop(): Unit = ()
}

/** Scan wrapper that adds the micro-batch surface while forwarding the
  * batch path (and its statistics, which drive broadcast decisions)
  * untouched to the parquet delegate. */
private[graft] class GraftScan(delegate: Scan,
                               mkStream: String => MicroBatchStream)
  extends Scan with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  override def readSchema(): StructType = delegate.readSchema()
  override def description(): String = delegate.description()
  override def toBatch: Batch = delegate.toBatch
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    delegate.columnarSupportMode()
  override def estimateStatistics(): Statistics = delegate match {
    case s: org.apache.spark.sql.connector.read.SupportsReportStatistics =>
      s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
    }
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    mkStream(checkpointLocation)
}
