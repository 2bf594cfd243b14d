package graft.catalog

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.commit._
import graft.meta._

/** Group-based (copy-on-write) row-level DELETE / UPDATE / MERGE.
  *
  * Spark's rewrite rules (RewriteDeleteFromTable and friends) turn
  * `DELETE FROM t WHERE value > 100` into a ReplaceData plan: read the
  * AFFECTED groups through this operation's scan, keep/modify rows, and
  * hand the survivors to this operation's write. Here a "group" is a
  * data file: the scan prunes the manifest with the pushed command
  * condition — partition dirs, dir ranges, min/max stats — in
  * group-prune-only mode (no row-group skipping: the write-back needs
  * EVERY surviving row of an affected file), records exactly which
  * files it covered, and the write commits
  * [[MetadataUpdate.RewriteFiles]](affected, rewritten) under
  * AssertCurrentSnapshotId. Untouched files keep their paths — a
  * DELETE of 0.1% of rows rewrites only the files whose stats admit a
  * match, not the table. Racing commits fail this rewrite cleanly (and
  * appends retry themselves); nothing is ever merged with stale rows.
  *
  * Partition-boundary deletes still take the metadata-only fast path:
  * Spark's OptimizeMetadataOnlyDeleteFromTable converts the rewrite
  * back to [[GraftTable.deleteWhere]] whenever canDeleteWhere accepts.
  */
private[catalog] class GraftRowLevelOperation(
    store: MetaStore, ns: Seq[String], table: String, tableName: String,
    meta: TableMetadata, cmd: RowLevelOperation.Command)
  extends RowLevelOperation {

  /** Files the rewrite scan covered — set at scan build (planning),
    * read at write commit (execution, strictly later). */
  @volatile private var affectedFiles: Option[Seq[String]] = None

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    new GraftScanBuilder(tableName, store.dataDir(ns, table),
      meta.currentSnapshot.map(_.files).getOrElse(Nil),
      SpecDerivation.identityPartCols(meta),
      SchemaBridge.toSpark(meta.currentSchema), options,
      meta.currentSnapshot.map(_.fileStats).getOrElse(Map.empty),
      SpecDerivation.transformPartSpecs(meta),
      groupPruneOnly = true,
      onBuild = files => affectedFiles = Some(files),
      // a rewrite of delete-affected files must read through the deletes
      // — its output replaces those files, and resurrecting masked rows
      // would silently undo earlier merge-on-read DML
      deleteFiles = meta.currentSnapshot.map(_.deleteFiles).getOrElse(Nil),
      fileSeqs = meta.currentSnapshot.map(_.fileSeqs).getOrElse(Map.empty))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    GraftRewrite.requireRewritableSpec(meta)
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = {
          val tableFields = SchemaBridge.toSpark(meta.currentSchema)
            .fields.map(f => f.name -> f).toMap
          val dataSchema = StructType(
            info.schema().fields.map(f => tableFields.getOrElse(f.name, f)))
          new GraftRewriteBatchWrite(store, ns, table, meta, dataSchema,
            () => affectedFiles)
        }
      }
    }
  }
}

/** All files one rewrite task produced. */
private case class GraftRewriteFiles(rels: List[String]) extends WriterCommitMessage

/** V2 batch write for the ReplaceData side of a row-level operation:
  * executors rewrite the surviving rows into parquet (with full
  * partition-dir layout, see [[GraftRewriteDataWriter]]), and the driver
  * commits the file-subset swap as one guarded snapshot. */
private class GraftRewriteBatchWrite(
    store: MetaStore, ns: Seq[String], table: String,
    meta: TableMetadata, dataSchema: StructType,
    affected: () => Option[Seq[String]]) extends BatchWrite {

  private val dataDir = store.dataDir(ns, table)
  private val relDir = s"commit-rewrite-${java.util.UUID.randomUUID()}"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val spark = SparkSession.active
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val owf = new ParquetFileFormat().prepareWrite(spark, job, Map.empty, dataSchema)
    new GraftRewriteWriterFactory(owf,
      new SerializableHadoopConf(job.getConfiguration),
      s"$dataDir/$relDir", relDir, dataSchema,
      GraftRewrite.dirFields(meta, dataSchema))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val added = messages.collect { case GraftRewriteFiles(rels) => rels }
      .flatten.toList
    val removed = affected() match {
      case Some(files) => files.toList
      case None if added.isEmpty => Nil // nothing scanned, nothing written
      case None => throw new IllegalStateException(
        "row-level rewrite produced files but its scan never ran")
    }
    if (removed.isEmpty && added.isEmpty) return // no affected groups: no-op
    val stats = FileStats.harvestAll(SparkSession.active, dataDir, added)
    store.commitOps(ns, table,
      // the survivors were computed from exactly this snapshot — any
      // interleaved commit (even an unrelated append) must fail us,
      // never be merged with stale row data
      Seq(Requirement.AssertCurrentSnapshotId(meta.currentSnapshotId)),
      Seq(MetadataUpdate.RewriteFiles(removed, added,
        System.currentTimeMillis(), stats)))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case GraftRewriteFiles(rels) => rels }.flatten
      .foreach(rel => store.deleteFileIfExists(s"$dataDir/$rel"))
}

private object GraftRewrite {
  /** One partition-dir producer: source column index/type plus the
    * transform and dir-key name, decided (and UTC-gated) on the driver. */
  final case class DirField(srcIdx: Int, srcType: DataType,
                            transform: String, dirName: String,
                            utcSession: Boolean) extends Serializable

  /** Row-level rewrites must reproduce the partition layout of the files
    * they replace; identity dirs on types whose literal rendering isn't
    * byte-identical to the dir rendering (timestamps: '…00.0' vs dir)
    * can't be reproduced faithfully — refuse the rewrite rather than
    * silently degrade the table's layout. (Partition-boundary commits on
    * such columns are refused for the same reason.) */
  def requireRewritableSpec(meta: TableMetadata): Unit = {
    val nameById = meta.currentSchema.fields.map(f => f.id -> f.name).toMap
    val typeByName = SchemaBridge.toSpark(meta.currentSchema)
      .fields.map(f => f.name -> f.dataType).toMap
    meta.specs.find(_.specId == meta.defaultSpecId).map(_.fields).getOrElse(Nil)
      .filter(_.transform == "identity")
      .flatMap(f => nameById.get(f.sourceId)).foreach { c =>
        val ok = typeByName.get(c).exists {
          case StringType | IntegerType | LongType | ShortType | ByteType |
               BooleanType => true
          case _ => false
        }
        if (!ok) throw new UnsupportedOperationException(
          s"row-level rewrite on a table identity-partitioned by " +
            s"non-exact-render column '$c' is not supported (the rewritten " +
            "files could not reproduce the partition layout faithfully)")
      }
  }

  /** The default spec's dir producers against the write schema. A
    * transform the batch writer lays out nothing for (dirExpr None —
    * e.g. a temporal transform on an instant in a non-UTC session) is
    * likewise skipped here, so rewritten and appended files always
    * carry the same dir-key set. */
  def dirFields(meta: TableMetadata, dataSchema: StructType): Seq[DirField] = {
    val utc = PartitionTransforms.sessionUtc
    val nameById = meta.currentSchema.fields.map(f => f.id -> f.name).toMap
    meta.specs.find(_.specId == meta.defaultSpecId).map(_.fields).getOrElse(Nil)
      .flatMap { f =>
        for {
          src <- nameById.get(f.sourceId)
          idx <- Some(dataSchema.fieldNames.indexOf(src)) if idx >= 0
          dt = dataSchema.fields(idx).dataType
          if f.transform == "identity" ||
            PartitionTransforms.dirExpr(f.transform, src, dt).isDefined
        } yield DirField(idx, dt,
          f.transform,
          if (f.transform == "identity") src else f.name,
          utc)
      }
  }

  /** InternalRow field → the external value [[PartitionTransforms
    * .dirValueOf]] replays on (java.time temporals: exact, no calendar
    * rebase). Null and unsupported types → None. */
  def externalValue(row: InternalRow, idx: Int, dt: DataType): Option[Any] =
    if (row.isNullAt(idx)) None else dt match {
      case StringType => Some(row.getUTF8String(idx).toString)
      case IntegerType => Some(row.getInt(idx))
      case LongType => Some(row.getLong(idx))
      case ShortType => Some(row.getShort(idx))
      case ByteType => Some(row.getByte(idx))
      case BooleanType => Some(row.getBoolean(idx))
      // bucket transforms hash ANY source type — cover the rest so a
      // bucket[n] on a float/double/decimal/binary column renders its
      // real dir (the scan-side replay hashes the same literals)
      case FloatType => Some(row.getFloat(idx))
      case DoubleType => Some(row.getDouble(idx))
      case d: DecimalType =>
        Some(row.getDecimal(idx, d.precision, d.scale).toJavaBigDecimal)
      case BinaryType => Some(row.getBinary(idx))
      case DateType => Some(java.time.LocalDate.ofEpochDay(row.getInt(idx).toLong))
      case TimestampType =>
        val us = row.getLong(idx)
        Some(java.time.Instant.ofEpochSecond(
          java.lang.Math.floorDiv(us, 1000000L),
          java.lang.Math.floorMod(us, 1000000L) * 1000L))
      case TimestampNTZType =>
        val us = row.getLong(idx)
        Some(java.time.LocalDateTime.ofEpochSecond(
          java.lang.Math.floorDiv(us, 1000000L),
          (java.lang.Math.floorMod(us, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC))
      case _ => None
    }

  /** The `__part_<k>=<v>/...` sub-path of one row. Identity renders the
    * value directly; transforms replay through the SAME dirValueOf the
    * scan-side pruner uses, so a rewritten row can never land in a dir
    * the pruner would wrongly skip. Unrenderable values fall to the Hive
    * default-partition marker (which no replay ever prunes). */
  def dirPath(row: InternalRow, fields: Seq[DirField]): String =
    fields.map { f =>
      val rendered = externalValue(row, f.srcIdx, f.srcType).flatMap { v =>
        if (f.transform == "identity") Some(String.valueOf(v))
        else PartitionTransforms.dirValueOf(f.transform, v, f.srcType, f.utcSession)
      }
      val dirVal = rendered match {
        case Some(s) => ExternalCatalogUtils.escapePathName(s)
        case None => ExternalCatalogUtils.DEFAULT_PARTITION_NAME
      }
      s"__part_${f.dirName}=$dirVal"
    }.mkString("/")
}

private class GraftRewriteWriterFactory(
    owf: OutputWriterFactory, conf: SerializableHadoopConf,
    absDir: String, relDir: String, schema: StructType,
    dirFields: Seq[GraftRewrite.DirField]) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftRewriteDataWriter(owf, conf.value, absDir, relDir, schema,
      dirFields, partitionId, taskId)
}

/** Dynamic-partitioned parquet writer: one lazily-opened OutputWriter
  * per partition dir encountered (zero rows → zero files), unique file
  * names per (partition, task attempt), losers of speculative races
  * abort and delete. */
private class GraftRewriteDataWriter(
    owf: OutputWriterFactory, conf: Configuration,
    absDir: String, relDir: String, schema: StructType,
    dirFields: Seq[GraftRewrite.DirField],
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {

  private val ctx = ParquetTaskWriters.taskContext(conf, "graft-rewrite", 0L,
    partitionId, taskId)
  private val open = scala.collection.mutable.LinkedHashMap.empty[String, OutputWriter]
  private val rels = scala.collection.mutable.ArrayBuffer.empty[String]
  private var closed = false

  /** UPDATE/MERGE rewrites prepend a `__row_operation` int marker to each
    * row (the carry-over protocol for writers with metadata columns);
    * with no metadata columns declared, the raw rows reach the writer
    * while the write schema holds only the data columns — which always
    * TRAIL. Strip the marker with a bound projection; DELETE rows arrive
    * unprefixed (offset 0) and pass through. Anything else is a layout
    * we don't understand — fail loudly, never write garbage. */
  private var strip: org.apache.spark.sql.catalyst.expressions.UnsafeProjection = _
  private var stripOffset = -1

  private def stripped(row: InternalRow): InternalRow = {
    if (stripOffset < 0) {
      stripOffset = row.numFields - schema.length
      require(stripOffset == 0 || stripOffset == 1,
        s"unexpected rewrite row layout: ${row.numFields} fields for " +
          s"${schema.length}-column write schema")
      if (stripOffset > 0)
        strip = org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(
          schema.fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
            org.apache.spark.sql.catalyst.expressions.BoundReference(
              stripOffset + i, f.dataType, nullable = true)
          })
    }
    if (stripOffset == 0) row else strip(row)
  }

  private def writerFor(dir: String): OutputWriter = open.getOrElseUpdate(dir, {
    val fileName = f"part-$partitionId%05d-$taskId-" +
      s"${java.util.UUID.randomUUID().toString.take(8)}.parquet"
    val rel = if (dir.isEmpty) s"$relDir/$fileName" else s"$relDir/$dir/$fileName"
    rels += rel
    owf.newInstance(s"$absDir${if (dir.isEmpty) "" else "/" + dir}/$fileName",
      schema, ctx)
  })

  override def write(row: InternalRow): Unit = {
    val data = stripped(row)
    writerFor(GraftRewrite.dirPath(data, dirFields)).write(data)
  }

  override def commit(): WriterCommitMessage = {
    close()
    GraftRewriteFiles(rels.toList)
  }

  override def abort(): Unit = {
    close()
    rels.foreach(rel => ParquetTaskWriters.deleteQuietly(conf,
      s"$absDir/${rel.stripPrefix(relDir + "/")}"))
  }

  override def close(): Unit = if (!closed) {
    closed = true
    open.values.foreach(_.close())
  }
}
