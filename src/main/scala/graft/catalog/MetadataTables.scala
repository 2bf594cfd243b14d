package graft.catalog

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.meta.TableMetadata

/** Inspection (metadata) tables, resolved by a `$kind` suffix on the
  * table name — the operational surface for snapshots and data files:
  * {{{
  *   SELECT * FROM graft.ns.`t$history`   -- one row per snapshot
  *   SELECT * FROM graft.ns.`t$files`     -- current snapshot's files
  * }}}
  * Everything comes from the already-loaded metadata document, served
  * through a [[LocalScan]] (driver-local rows — metadata-scale by
  * construction, never a distributed job). A REAL table whose name
  * contains `$` shadows the suffix (real tables resolve first). */
object MetadataTables {

  // one structure drives both the name-resolution set and the dispatch,
  // so adding a kind can't produce a resolvable-but-unbuildable name
  private val builders: Map[String, (String, TableMetadata) => Table] =
    Map("history" -> history, "files" -> files, "snapshots" -> snapshots,
      "partitions" -> partitions, "refs" -> refs)

  val Kinds: Set[String] = builders.keySet

  def table(kind: String, fqn: String, m: TableMetadata): Table =
    builders(kind)(fqn, m)

  private def history(fqn: String, m: TableMetadata): Table = {
    val schema = StructType(Seq(
      StructField("snapshot_id", LongType, nullable = false),
      StructField("committed_at", TimestampNTZType, nullable = false),
      StructField("operation", StringType, nullable = false),
      StructField("n_files", IntegerType, nullable = false),
      StructField("is_current", BooleanType, nullable = false)))
    val rows: Array[InternalRow] = m.snapshots.map { s =>
      new GenericInternalRow(Array[Any](
        s.snapshotId,
        s.timestampMs * 1000L, // epoch micros for TIMESTAMP_NTZ (UTC session)
        UTF8String.fromString(s.operation),
        s.files.size,
        m.currentSnapshotId.contains(s.snapshotId))): InternalRow
    }.toArray
    new RowsTable(fqn + "$history", schema, rows)
  }

  /** `t$snapshots`: the full per-snapshot detail — operation, file
    * counts, and the raw summary map (where the streaming sink's batch
    * watermarks and the overwrite's replaced-files counts live). */
  private def snapshots(fqn: String, m: TableMetadata): Table = {
    val schema = StructType(Seq(
      StructField("snapshot_id", LongType, nullable = false),
      StructField("committed_at", TimestampNTZType, nullable = false),
      StructField("operation", StringType, nullable = false),
      StructField("n_files", IntegerType, nullable = false),
      StructField("added_files", IntegerType, nullable = true),
      StructField("replaced_files", IntegerType, nullable = true),
      StructField("summary", MapType(StringType, StringType), nullable = false),
      StructField("is_current", BooleanType, nullable = false)))
    def summaryInt(s: graft.meta.SnapshotDef, key: String): Any =
      s.summary.get(key).flatMap(v => scala.util.Try(v.toInt).toOption).orNull
    val rows: Array[InternalRow] = m.snapshots.map { s =>
      val keys = s.summary.keys.toArray.sorted
      val summaryMap = new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          keys.map(UTF8String.fromString(_): Any)),
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          keys.map(k => UTF8String.fromString(s.summary(k)): Any)))
      new GenericInternalRow(Array[Any](
        s.snapshotId,
        s.timestampMs * 1000L, // epoch micros for TIMESTAMP_NTZ (UTC session)
        UTF8String.fromString(s.operation),
        s.files.size,
        summaryInt(s, "added-files"),
        summaryInt(s, "replaced-files"),
        summaryMap,
        m.currentSnapshotId.contains(s.snapshotId))): InternalRow
    }.toArray
    new RowsTable(fqn + "$snapshots", schema, rows)
  }

  /** `t$partitions`: current snapshot's files rolled up by partition
    * value — the "which partitions exist and how lopsided are they"
    * question every maintenance decision (compaction targets, skew)
    * starts from. Files without the full layout (written before a spec
    * evolution) group under their own partial key. */
  private def partitions(fqn: String, m: TableMetadata): Table = {
    val schema = StructType(Seq(
      StructField("partition", StringType, nullable = false),
      StructField("n_files", IntegerType, nullable = false)))
    val rows: Array[InternalRow] =
      m.currentSnapshot.map(_.files).getOrElse(Nil)
        .groupBy(f => PartitionDirs.kvs(f).toSeq.sorted
          .map { case (k, v) => s"$k=$v" }.mkString("/"))
        .toSeq.sortBy(_._1)
        .map { case (part, fs) =>
          new GenericInternalRow(Array[Any](
            UTF8String.fromString(part), fs.size)): InternalRow
        }.toArray
    new RowsTable(fqn + "$partitions", schema, rows)
  }

  /** `t$refs`: every named branch/tag, where it points, and how far
    * behind (or ahead of) main it sits — the write-audit-publish
    * dashboard. Main itself appears as the pseudo-ref `main`. */
  private def refs(fqn: String, m: TableMetadata): Table = {
    val schema = StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("type", StringType, nullable = false),
      StructField("snapshot_id", LongType, nullable = false),
      StructField("committed_at", TimestampNTZType, nullable = true),
      StructField("is_main_head", BooleanType, nullable = false)))
    def row(name: String, tpe: String, sid: Long): InternalRow =
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(name), UTF8String.fromString(tpe), sid,
        m.snapshots.find(_.snapshotId == sid)
          .map(s => s.timestampMs * 1000L: Any).orNull,
        m.currentSnapshotId.contains(sid)))
    val rows: Array[InternalRow] =
      (m.currentSnapshotId.map(row("main", "branch", _)).toSeq ++
        m.refs.toSeq.sortBy(_._1).map { case (n, r) =>
          row(n, r.refType, r.snapshotId)
        }).toArray
    new RowsTable(fqn + "$refs", schema, rows)
  }

  private def files(fqn: String, m: TableMetadata): Table = {
    val schema = StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("content", StringType, nullable = false),
      StructField("partition", StringType, nullable = false),
      StructField("n_stat_cols", IntegerType, nullable = false),
      StructField("seq", LongType, nullable = true),
      StructField("sorted_by", StringType, nullable = true),
      // the file's record count from its manifest stats (Iceberg files
      // table: record_count) — null on files whose adding commit
      // pre-dated stats or skipped the harvest. Lets maintenance code
      // (e.g. AnnIndex.vacuum reporting) count rows without a scan.
      StructField("rows", LongType, nullable = true)))
    val stats = m.currentSnapshot.map(_.fileStats).getOrElse(Map.empty)
    val seqs = m.currentSnapshot.map(_.fileSeqs).getOrElse(Map.empty)
    // the order each data file was PROVEN written under: the `sorted-by`
    // stamp of its adding snapshot (what the keyed scan's ordering
    // report consults) — null for imports, pre-order files, and files
    // whose adding snapshot left retained history
    val byId = m.snapshots.map(s => s.snapshotId -> s).toMap
    def sortedBy(f: String): Any =
      seqs.get(f).flatMap(byId.get).flatMap(_.summary.get("sorted-by"))
        .map(UTF8String.fromString).orNull
    def row(f: String, content: String, seq: Any, sorted: Any,
            nRows: Any): InternalRow = {
      val part = PartitionDirs.kvs(f).toSeq.sorted
        .map { case (k, v) => s"$k=$v" }.mkString("/")
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(f), UTF8String.fromString(content),
        UTF8String.fromString(part),
        stats.get(f).map(_.size).getOrElse(0), seq, sorted, nRows))
    }
    val rows: Array[InternalRow] =
      (m.currentSnapshot.map(_.files).getOrElse(Nil)
        .map(f => row(f, "data", seqs.get(f).map(v => v: Any).orNull,
          sortedBy(f),
          stats.get(f).flatMap(_.headOption).flatMap(_.rows)
            .map(v => v: Any).orNull)) ++
       m.currentSnapshot.map(_.deleteFiles).getOrElse(Nil)
        .map(d => row(d.path,
          if (d.keyFieldIds.isEmpty) "position-deletes" else "equality-deletes",
          d.seq, null, d.rows))).toArray
    new RowsTable(fqn + "$files", schema, rows)
  }

  private class RowsTable(tname: String, tschema: StructType,
                          data: Array[InternalRow])
    extends Table with SupportsRead {
    override def name(): String = tname
    override def schema(): StructType = tschema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder {
        override def build(): Scan = new LocalScan {
          override def rows(): Array[InternalRow] = data
          override def readSchema(): StructType = tschema
        }
      }
  }
}
