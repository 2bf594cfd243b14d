package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.MetadataColumn
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.meta.{MetaStore, SchemaBridge, TableMetadata}

/** Row-position surface for keyless merge-on-read tables (the engine's
  * analog of the (file, pos) row coordinates the reference's metadata
  * spec carries in its delete-file flavors —
  * `/root/reference/catalog/tables.go:192` commit machinery).
  *
  * Two DSv2 metadata columns — `_graft_file` (manifest-relative data
  * file path) and `_graft_pos` (row index in full-file order) — give
  * every row a stable physical coordinate without any declared key.
  * They power [[GraftPositionDeltaOperation]]: UPDATE/MERGE on a
  * keyless merge-on-read table reads matched rows WITH their
  * coordinates, writes the old coordinates as position-delete parquet
  * and the new row versions as ordinary data files, and commits both in
  * one RowDelta — no data file rewritten, where the copy-on-write path
  * would rewrite every touched file.
  *
  * Scale shape: coordinates are produced per-file (position = index in
  * that file's row order), so file-level manifest pruning stays valid —
  * only candidate files are read, each as ONE unsplit partition (a
  * split or a pushed row-group skip would shift every count; the
  * predicate is re-applied by Spark above the scan).
  */
private[graft] object PosDelta {
  val FileCol = "_graft_file"
  val PosCol = "_graft_pos"
  val names: Set[String] = Set(FileCol, PosCol)

  /** Delete-file layout shared with [[GraftTable.positionDeleteWhere]]
    * and the read-side position subtraction ([[PosFilteringReader]]). */
  val deleteFileSchema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("pos", LongType, nullable = false)))

  /** Spark's parquet row-index temporary column: a read schema carrying
    * this field makes BOTH parquet readers (vectorized and parquet-mr)
    * fill it with the metadata-derived ABSOLUTE row index of each row —
    * split-safe and row-group-skip-safe, the mechanism behind the file
    * source's `_metadata.row_index`. */
  val RowIdxCol: String = org.apache.spark.sql.execution.datasources.parquet
    .ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME

  // the field must be declared NULLABLE: the vectorized reader's
  // missing-column check rejects required columns absent from the file
  // BEFORE the row-index generator claims this one (it still fills
  // every row — the nullability is a fiction the projection erases)
  def withRowIdx(schema: StructType): StructType =
    StructType(schema.fields :+ StructField(RowIdxCol, LongType, nullable = true))

  /** One partition per `maxPartitionBytes` byte range per file (file
    * identity stays a partition constant — the row-index column only
    * carries the offset within its file). */
  def chunkPartitions(groups: Seq[PosGroup])
      : Array[(org.apache.spark.sql.execution.datasources.FilePartition, PosGroup)] = {
    val maxSplit = math.max(1L, org.apache.spark.sql.SparkSession.active
      .sessionState.conf.filesMaxPartitionBytes)
    val out = Array.newBuilder[
      (org.apache.spark.sql.execution.datasources.FilePartition, PosGroup)]
    var idx = 0
    groups.foreach { g =>
      (0L until math.max(g.fileSize, 1L) by maxSplit).foreach { start =>
        val pf = org.apache.spark.sql.execution.datasources.PartitionedFile(
          InternalRow.empty,
          org.apache.spark.paths.SparkPath.fromPathString(g.absPath),
          start, math.min(maxSplit, g.fileSize - start), Array.empty,
          0L, g.fileSize)
        out += ((org.apache.spark.sql.execution.datasources.FilePartition(
          idx, Array(pf)), g))
        idx += 1
      }
    }
    out.result()
  }

  // row-id columns must be non-nullable: Spark's delta-based row-level
  // plans refuse nullable row ids outright
  val metadataColumns: Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name: String = FileCol
      override def dataType: DataType = StringType
      override def isNullable: Boolean = false
      override def comment: String =
        "manifest-relative data file path of the row"
    },
    new MetadataColumn {
      override def name: String = PosCol
      override def dataType: DataType = LongType
      override def isNullable: Boolean = false
      override def comment: String =
        "row position in full-file order (position-delete coordinate)"
    })
}

/** Scan emitting `_graft_file`/`_graft_pos` alongside the requested
  * data columns. The delegate reads `dataSchema` PLUS Spark's parquet
  * row-index temporary column, which the readers fill with the
  * METADATA-DERIVED absolute row index — so the scan splits files at
  * `maxPartitionBytes` and keeps full filter pushdown (a skipped row
  * group shifts nothing; indexes come from row-group metadata, not
  * counting). Each partition is one byte range of ONE file (the file
  * identity is the partition's constant). Statistics ride the delegate
  * so join-side broadcast decisions are unchanged. */
private[graft] class PosDeltaScan(
    delegate: Scan, groups: Seq[PosGroup],
    requested: StructType, dataSchema: StructType)
  extends Scan with SupportsReportStatistics {

  override def readSchema(): StructType = requested
  override def description(): String =
    s"graft-posdelta(${groups.size} files) ${delegate.description()}"
  override def estimateStatistics(): Statistics = delegate match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      PosDelta.chunkPartitions(groups).map { case (fp, g) =>
        PosDeltaPartition(fp, g.rel): InputPartition
      }
    override def createReaderFactory(): PartitionReaderFactory =
      // dead sets ride the FACTORY (task-binary, shipped once per
      // executor), never the per-chunk partitions — a near-budget set
      // on a many-chunk file must not serialize once per task
      new PosDeltaReaderFactory(delegate.toBatch.createReaderFactory(),
        dataSchema, requested,
        groups.map(g => g.rel -> g.positions).toMap)
  }
}

/** One byte range of one file, tagged with the file's rel path (the
  * emitted `_graft_file` value; also the factory's dead-set key). */
private[graft] final case class PosDeltaPartition(
    delegate: InputPartition, rel: String)
  extends InputPartition {
  override def preferredLocations(): Array[String] = delegate.preferredLocations()
}

private[graft] class PosDeltaReaderFactory(
    delegate: PartitionReaderFactory, dataSchema: StructType,
    requested: StructType, deadByRel: Map[String, Set[Long]])
  extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean = false

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = partition match {
    case PosDeltaPartition(d, rel) =>
      new PosEmittingReader(delegate.createReader(d), rel,
        deadByRel.getOrElse(rel, Set.empty), dataSchema, requested)
    case other =>
      throw new IllegalStateException(s"untagged partition $other")
  }
}

/** Row reader over one file range: the delegate's trailing column IS
  * the absolute row index (metadata-derived); dead indexes are skipped,
  * and (data columns ++ index ++ constant file) projects into the
  * requested column order. Projection output reuses a buffer — legal
  * between DSv2 next() calls. */
private[graft] class PosEmittingReader(
    delegate: PartitionReader[InternalRow], rel: String, dead: Set[Long],
    dataSchema: StructType, requested: StructType)
  extends PartitionReader[InternalRow] {

  private val n = dataSchema.length // the delegate row is (data..., idx)
  private val fileRow = {
    val r = new GenericInternalRow(1)
    r.update(0, UTF8String.fromString(rel))
    r
  }
  private val joined = new JoinedRow
  // a data column named like a metadata column shadows it (Spark's
  // metadataOutput already excludes conflicts) — resolve data first
  private lazy val proj =
    UnsafeProjection.create(requested.fields.map { f =>
      if (dataSchema.fieldNames.contains(f.name)) {
        val i = dataSchema.fieldIndex(f.name)
        BoundReference(i, dataSchema(i).dataType, dataSchema(i).nullable)
      } else if (f.name == PosDelta.PosCol)
        BoundReference(n, LongType, nullable = false)
      else if (f.name == PosDelta.FileCol)
        BoundReference(n + 1, StringType, nullable = false)
      else throw new IllegalStateException(
        s"requested column '${f.name}' is neither data nor position metadata")
    }.map(e => e: Expression).toIndexedSeq)

  private var current: InternalRow = _

  override def next(): Boolean = {
    while (delegate.next()) {
      val r = delegate.get()
      if (!dead.contains(r.getLong(n))) {
        current = proj(joined(r, fileRow))
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = delegate.close()
}

/** Delta-based (merge-on-read) DELETE / UPDATE / MERGE for tables with
  * NO declared identifier fields, selected when the command's
  * `write.<cmd>.mode` is merge-on-read and every live delete file is
  * position-flavored. The row id is the physical coordinate
  * (`_graft_file`, `_graft_pos`) instead of key columns: matched rows
  * arrive at the writer with their coordinates, deleted/updated
  * coordinates land in position-delete parquet (empty `keyFieldIds`
  * marks the flavor), and new row versions land as ordinary data files
  * — one RowDelta, zero rewritten data files. Readers subtract
  * positions ([[PosFilteringReader]]); compaction folds them away.
  *
  * Sequence scoping is positional rather than temporal: a
  * position-delete names its exact (file, pos) target, and a re-written
  * row version lands in a NEW file, so an update can never swallow its
  * own output. */
private[catalog] class GraftPositionDeltaOperation(
    store: MetaStore, ns: Seq[String], table: String, tableName: String,
    meta: TableMetadata, cmd: RowLevelOperation.Command,
    props: Map[String, String])
  extends RowLevelOperation with SupportsDelta {

  private val tableSchema = SchemaBridge.toSpark(meta.currentSchema)

  override def command(): RowLevelOperation.Command = cmd

  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(PosDelta.FileCol),
      Expressions.column(PosDelta.PosCol))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(tableName, store.dataDir(ns, table),
      meta.currentSnapshot.map(_.files).getOrElse(Nil),
      SpecDerivation.identityPartCols(meta), tableSchema, options,
      meta.currentSnapshot.map(_.fileStats).getOrElse(Map.empty),
      SpecDerivation.transformPartSpecs(meta),
      deleteFiles = meta.currentSnapshot.map(_.deleteFiles).getOrElse(Nil),
      fileSeqs = meta.currentSnapshot.map(_.fileSeqs).getOrElse(Map.empty),
      deleteByteBudget = MergeOnRead.byteBudget(props))

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder = {
    GraftRewrite.requireRewritableSpec(meta)
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite = {
          val tableFields = tableSchema.fields.map(f => f.name -> f).toMap
          val dataSchema = StructType(
            info.schema().fields.map(f => tableFields.getOrElse(f.name, f)))
          // empty keyFieldIds marks the position flavor all the way to
          // the manifest; the delete-file layout matches the read side
          new GraftDeltaBatchWrite(store, ns, table, meta,
            dataSchema, PosDelta.deleteFileSchema, Nil)
        }
      }
    }
  }
}
