package graft.catalog

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

import graft.commit._
import graft.meta._

/** One committed data file of a streaming epoch. */
private case class GraftStreamFile(rel: String) extends WriterCommitMessage

/** The Hadoop-task scaffolding both executor-side parquet writers (the
  * streaming epoch writer and the row-level rewrite writer) share — one
  * place for the attempt-id construction and the abort cleanup, so the
  * two writers can't drift apart. */
private[catalog] object ParquetTaskWriters {
  def taskContext(conf: Configuration, jobName: String, jobId: Long,
                  partitionId: Int, taskId: Long): TaskAttemptContextImpl =
    new TaskAttemptContextImpl(conf,
      new TaskAttemptID(new TaskID(new JobID(jobName, (jobId % Int.MaxValue).toInt),
        TaskType.MAP, partitionId), (taskId % Int.MaxValue).toInt))

  def deleteQuietly(conf: Configuration, absPath: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(absPath)
    p.getFileSystem(conf).delete(p, false)
  }
}

/** Native STREAMING_WRITE: `df.writeStream.toTable("graft.ns.t")` with
  * no user-written foreachBatch. Executors stream rows straight into
  * parquet files (via the same ParquetFileFormat writer the batch path
  * uses, so field ids and codecs match); the driver then commits ONE
  * CAS snapshot per epoch, stamped with the epoch id under a
  * per-query summary key and guarded by the same
  * [[Requirement.AssertMaxSummaryBelow]] fence as the foreachBatch
  * sink — a replayed epoch (failure recovery) or a zombie driver's
  * duplicate commit is recognized INSIDE the commit loop and skipped,
  * never double-appended. The fence key derives from Spark's stable
  * streaming query id (persisted in the checkpoint), so the guarantee
  * survives restarts. */
private[catalog] class GraftStreamingWrite(
    store: MetaStore, ns: Seq[String], table: String, queryId: String,
    dataSchema: StructType) extends StreamingWrite {

  private val dataDir = store.dataDir(ns, table)
  // one staging dir per run: files land here BEFORE their epoch commit
  // references them (expireSnapshots' grace window covers the gap)
  private val relDir = s"commit-stream-${java.util.UUID.randomUUID()}"
  private val summaryKey =
    s"streaming-epoch-${queryId.toLowerCase(java.util.Locale.ROOT)}"

  // monotone per query — after the first load it rides in memory, not
  // re-scanned from (possibly remote) metadata every epoch
  private var watermark = Long.MinValue

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory = {
    val spark = SparkSession.active
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    // prepareWrite wires ParquetWriteSupport (schema, field ids, codec)
    // into the job conf; the factory itself is serializable
    val owf = new ParquetFileFormat().prepareWrite(spark, job, Map.empty, dataSchema)
    new GraftStreamingDataWriterFactory(owf,
      new SerializableHadoopConf(job.getConfiguration), s"$dataDir/$relDir",
      relDir, dataSchema)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val rels = messages.collect { case GraftStreamFile(rel) => rel }.toList
    if (watermark == Long.MinValue)
      watermark = Commits.maxSummary(store.load(ns, table)._1, summaryKey)
    if (epochId <= watermark) {
      // replayed epoch — its snapshot already committed; the fresh files
      // are orphans of the replay, not data
      rels.foreach(rel => store.deleteFileIfExists(s"$dataDir/$rel"))
    } else if (rels.nonEmpty) {
      val stats = FileStats.harvestAll(SparkSession.active, dataDir, rels)
      try {
        store.commitOps(ns, table,
          Seq(Requirement.AssertMaxSummaryBelow(summaryKey, epochId)),
          Seq(MetadataUpdate.AppendFiles(rels, System.currentTimeMillis(), stats,
            Map(summaryKey -> epochId.toString))))
      } catch {
        case e: Throwable if Commits.commitFailed(e) =>
          // CommitFailedException covers BOTH the epoch fence (a zombie
          // already committed this epoch — safe to skip) and CAS-retry
          // exhaustion (nothing committed — skipping would silently
          // lose the batch). Only the table's own metadata can tell
          // them apart: verify the epoch really landed before dropping
          // our files, otherwise surface the failure to the engine.
          if (Commits.maxSummary(store.load(ns, table)._1, summaryKey) >= epochId)
            rels.foreach(rel => store.deleteFileIfExists(s"$dataDir/$rel"))
          else throw e
      }
    }
    watermark = math.max(watermark, epochId)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case GraftStreamFile(rel) => rel }
      .foreach(rel => store.deleteFileIfExists(s"$dataDir/$rel"))
}

private class GraftStreamingDataWriterFactory(
    owf: OutputWriterFactory, conf: SerializableHadoopConf,
    absDir: String, relDir: String, schema: StructType)
  extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new GraftStreamingDataWriter(owf, conf.value, absDir, relDir, schema,
      partitionId, taskId, epochId)
}

/** Writes one parquet file per (epoch, partition, task attempt). File
  * names carry all three, so speculative attempts never collide; the
  * commit coordinator ensures only one attempt's message reaches the
  * driver, and losers abort (deleting their file). */
private class GraftStreamingDataWriter(
    owf: OutputWriterFactory, conf: Configuration,
    absDir: String, relDir: String, schema: StructType,
    partitionId: Int, taskId: Long, epochId: Long)
  extends DataWriter[InternalRow] {

  private val fileName =
    f"part-$epochId-$partitionId%05d-$taskId${java.util.UUID.randomUUID().toString.take(8)}.parquet"
  private val absPath = s"$absDir/$fileName"
  private val ctx = ParquetTaskWriters.taskContext(conf, "graft-stream",
    epochId, partitionId, taskId)
  private val writer = owf.newInstance(absPath, schema, ctx)
  private var closed = false

  override def write(row: InternalRow): Unit = writer.write(row)

  override def commit(): WriterCommitMessage = {
    close()
    GraftStreamFile(s"$relDir/$fileName")
  }

  override def abort(): Unit = {
    close()
    ParquetTaskWriters.deleteQuietly(conf, absPath)
  }

  override def close(): Unit = if (!closed) { closed = true; writer.close() }
}
