package graft.catalog

import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.commit._
import graft.meta._

/** Delta-based (merge-on-read) row-level DELETE / UPDATE / MERGE,
  * selected over the copy-on-write [[GraftRowLevelOperation]] when the
  * table sets `write.<delete|update|merge>.mode = merge-on-read` and
  * declares `identifier-fields`.
  *
  * Spark's rewrite rules see [[SupportsDelta]] and plan a WriteDelta
  * instead of a ReplaceData: the scan reads only MATCHED rows (full
  * filter pushdown — unlike the CoW path, nothing is written back, so
  * row-group skipping is safe), and each matched row reaches the writer
  * as delete(id) / update(id, newRow) / insert(newRow). Deleted keys
  * land in small equality-delete parquet files; new row versions land as
  * ordinary partition-laid data files; one [[MetadataUpdate.RowDelta]]
  * commits both under AssertCurrentSnapshotId. A DELETE touching 0.01%
  * of a 100 TB table commits kilobytes of keys where the CoW path would
  * rewrite every affected file; readers subtract the keys
  * ([[MergeOnRead]]) and compaction folds them away.
  *
  * Update-as-delete-plus-insert is sequence-safe by construction: the
  * delete and the new row version commit at the SAME sequence, and
  * equality deletes apply only to files with a STRICTLY lower sequence
  * ([[graft.meta.DeleteFileDef]]), so an update can never swallow its
  * own output.
  */
private[catalog] class GraftDeltaOperation(
    store: MetaStore, ns: Seq[String], table: String, tableName: String,
    meta: TableMetadata, cmd: RowLevelOperation.Command,
    props: Map[String, String])
  extends RowLevelOperation with SupportsDelta {

  private val tableSchema = SchemaBridge.toSpark(meta.currentSchema)
  private val keys = MergeOnRead.keyFields(props, tableSchema)

  override def command(): RowLevelOperation.Command = cmd

  override def rowId(): Array[NamedReference] =
    keys.map { case (n, _) => Expressions.column(n) }.toArray

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    new GraftScanBuilder(tableName, store.dataDir(ns, table),
      meta.currentSnapshot.map(_.files).getOrElse(Nil),
      SpecDerivation.identityPartCols(meta), tableSchema, options,
      meta.currentSnapshot.map(_.fileStats).getOrElse(Map.empty),
      SpecDerivation.transformPartSpecs(meta),
      deleteFiles = meta.currentSnapshot.map(_.deleteFiles).getOrElse(Nil),
      fileSeqs = meta.currentSnapshot.map(_.fileSeqs).getOrElse(Map.empty))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder = {
    GraftRewrite.requireRewritableSpec(meta)
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite = {
          val tableFields = tableSchema.fields.map(f => f.name -> f).toMap
          val dataSchema = StructType(
            info.schema().fields.map(f => tableFields.getOrElse(f.name, f)))
          // the engine's rowId projection order is authoritative for the
          // delete-file column layout; resolve its field ids in the same
          // order so the read side rebuilds the identical schema
          val keyNames: Seq[String] =
            if (info.rowIdSchema().isPresent)
              info.rowIdSchema().get().fields.toSeq.map(_.name)
            else keys.map(_._1)
          val keySchema = StructType(keyNames.map(n => tableFields(n)))
          val keyIds = keyNames.map(n =>
            keys.find(_._1 == n).getOrElse(throw new IllegalStateException(
              s"rowId column '$n' is not a declared identifier field"))._2)
          new GraftDeltaBatchWrite(store, ns, table, meta,
            dataSchema, keySchema, keyIds.toList)
        }
      }
    }
  }
}

/** What one delta task produced: rewritten-row data files plus at most
  * one equality-delete file with its row count. */
private case class GraftDeltaResult(dataRels: List[String],
                                    deleteRel: Option[String],
                                    deleteRows: Long) extends WriterCommitMessage

private class GraftDeltaBatchWrite(
    store: MetaStore, ns: Seq[String], table: String,
    meta: TableMetadata, dataSchema: StructType, keySchema: StructType,
    keyFieldIds: List[Int]) extends DeltaBatchWrite {

  private val dataDir = store.dataDir(ns, table)
  private val relDir = s"commit-delta-${java.util.UUID.randomUUID()}"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory = {
    val spark = SparkSession.active
    val dataJob = Job.getInstance(spark.sessionState.newHadoopConf())
    val dataOwf = new ParquetFileFormat().prepareWrite(spark, dataJob, Map.empty,
      dataSchema)
    val keyJob = Job.getInstance(spark.sessionState.newHadoopConf())
    val keyOwf = new ParquetFileFormat().prepareWrite(spark, keyJob, Map.empty,
      keySchema)
    new GraftDeltaWriterFactory(
      dataOwf, new SerializableHadoopConf(dataJob.getConfiguration),
      keyOwf, new SerializableHadoopConf(keyJob.getConfiguration),
      s"$dataDir/$relDir", relDir, dataSchema, keySchema,
      GraftRewrite.dirFields(meta, dataSchema))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val results = messages.collect { case r: GraftDeltaResult => r }
    val addedData = results.flatMap(_.dataRels).toList
    val addedDeletes = results.toList.flatMap(r =>
      r.deleteRel.map(rel => DeleteFileDef(rel, 0L, keyFieldIds, r.deleteRows,
        store.fileSizeBytes(s"$dataDir/$rel").getOrElse(0L))))
    if (addedData.isEmpty && addedDeletes.isEmpty) return // nothing matched
    val stats = FileStats.harvestAll(SparkSession.active, dataDir, addedData)
    store.commitOps(ns, table,
      // matched rows (and their keys) were computed from exactly this
      // snapshot — an interleaved commit must fail the delta, never be
      // silently composed with a stale read
      Seq(Requirement.AssertCurrentSnapshotId(meta.currentSnapshotId)),
      Seq(MetadataUpdate.RowDelta(addedData, addedDeletes,
        System.currentTimeMillis(), stats)))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case r: GraftDeltaResult => r }.foreach { r =>
      (r.dataRels ++ r.deleteRel).foreach(rel =>
        store.deleteFileIfExists(s"$dataDir/$rel"))
    }
}

private class GraftDeltaWriterFactory(
    dataOwf: OutputWriterFactory, dataConf: SerializableHadoopConf,
    keyOwf: OutputWriterFactory, keyConf: SerializableHadoopConf,
    absDir: String, relDir: String, dataSchema: StructType,
    keySchema: StructType,
    dirFields: Seq[GraftRewrite.DirField]) extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(
      new GraftRewriteDataWriter(dataOwf, dataConf.value, absDir, relDir,
        dataSchema, dirFields, partitionId, taskId),
      keyOwf, keyConf, absDir, relDir, keySchema, partitionId, taskId)
}

/** Per-task delta writer: new row versions ride the shared dynamic-
  * partition parquet writer; deleted keys append to one lazily-opened
  * flat parquet file under `<commit>/deletes/` (zero deletes → zero
  * files). The id rows Spark hands over are engine-projected to exactly
  * the rowId schema — written as-is. */
private class GraftDeltaWriter(
    dataWriter: GraftRewriteDataWriter,
    keyOwf: OutputWriterFactory, keyConf: SerializableHadoopConf,
    absDir: String, relDir: String, keySchema: StructType,
    partitionId: Int, taskId: Long) extends DeltaWriter[InternalRow] {

  private var keyWriter: OutputWriter = _
  private var keyRel: Option[String] = None
  private var keyRows = 0L
  private var closed = false

  private lazy val keyCtx = ParquetTaskWriters.taskContext(keyConf.value,
    "graft-delta-keys", 1L, partitionId, taskId)

  private def writeKey(id: InternalRow): Unit = {
    if (keyWriter == null) {
      val fileName = f"keys-$partitionId%05d-$taskId-" +
        s"${java.util.UUID.randomUUID().toString.take(8)}.parquet"
      keyRel = Some(s"$relDir/deletes/$fileName")
      keyWriter = keyOwf.newInstance(s"$absDir/deletes/$fileName", keySchema, keyCtx)
    }
    keyWriter.write(id)
    keyRows += 1
  }

  override def delete(metadata: InternalRow, id: InternalRow): Unit = writeKey(id)

  override def update(metadata: InternalRow, id: InternalRow,
                      row: InternalRow): Unit = {
    writeKey(id)
    dataWriter.write(row)
  }

  override def insert(row: InternalRow): Unit = dataWriter.write(row)

  override def commit(): WriterCommitMessage = {
    val dataRels = dataWriter.commit() match {
      case GraftRewriteFiles(rels) => rels
      case other => throw new IllegalStateException(s"unexpected $other")
    }
    closeKeys()
    GraftDeltaResult(dataRels, keyRel, keyRows)
  }

  override def abort(): Unit = {
    dataWriter.abort()
    closeKeys()
    keyRel.foreach(rel => ParquetTaskWriters.deleteQuietly(keyConf.value,
      s"$absDir/${rel.stripPrefix(relDir + "/")}"))
  }

  override def close(): Unit = {
    dataWriter.close()
    closeKeys()
  }

  private def closeKeys(): Unit = if (!closed) {
    closed = true
    if (keyWriter != null) keyWriter.close()
  }
}
