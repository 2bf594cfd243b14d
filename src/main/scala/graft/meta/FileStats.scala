package graft.meta

import scala.jdk.CollectionConverters._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

/** Harvests per-column min/max/null-count from a parquet file's footer —
  * no data pages are read. Runs at commit time on the driver here (the
  * footer read is O(KB) per file); on a cluster the same numbers come
  * back from write tasks, the protocol is unchanged.
  *
  * Only stat types whose ordering matches SQL comparison are kept:
  * INT32/INT64 (plain), FLOAT/DOUBLE, and UTF8 BINARY. Timestamps,
  * decimals-as-fixed, etc. are skipped rather than risk a wrong-order
  * prune.
  */
object FileStats {

  def harvest(absPath: String): List[ColStatDef] =
    // session Hadoop conf first: it carries fs.<scheme>.impl bindings and
    // credentials for non-local warehouses
    harvest(absPath, org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf()).getOrElse(new Configuration()))

  def harvest(absPath: String, conf: Configuration): List[ColStatDef] = try {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(absPath), conf))
    try {
      case class Acc(var min: Comparable[Any], var max: Comparable[Any], var nulls: Long,
                     fieldId: Option[Int])
      val acc = scala.collection.mutable.LinkedHashMap.empty[String, Acc]
      for (block <- reader.getFooter.getBlocks.asScala;
           col <- block.getColumns.asScala) {
        val pt = col.getPrimitiveType
        val logical = pt.getLogicalTypeAnnotation
        val comparableStats = pt.getPrimitiveTypeName match {
          case INT32 | INT64 =>
            logical == null ||
              logical.isInstanceOf[LogicalTypeAnnotation.IntLogicalTypeAnnotation]
          case FLOAT | DOUBLE => true
          case BINARY =>
            logical.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation]
          case _ => false
        }
        val name = col.getPath.toDotString
        if (comparableStats && !name.contains(".")) {
          val st = col.getStatistics
          if (st != null && st.hasNonNullValue) {
            val mn = st.genericGetMin.asInstanceOf[Comparable[Any]]
            val mx = st.genericGetMax.asInstanceOf[Comparable[Any]]
            acc.get(name) match {
              case Some(a) =>
                if (mn.compareTo(a.min) < 0) a.min = mn
                if (mx.compareTo(a.max) > 0) a.max = mx
                a.nulls += st.getNumNulls
              case None =>
                acc(name) = Acc(mn, mx, st.getNumNulls,
                  Option(pt.getId).map(_.intValue()))
            }
          }
        }
      }
      // the file's row count, stamped on every column entry: the scan
      // sums these over its pruned file list to report numRows, which
      // is what lets Catalyst judge broadcastability of a pruned scan
      val fileRows = reader.getFooter.getBlocks.asScala
        .map(_.getRowCount).sum
      acc.flatMap { case (n, a) =>
        val isString = a.min.isInstanceOf[Binary]
        val mn = stringify(a.min)
        val mxOpt =
          if (isString) truncateUpper(stringify(a.max))
          else Some(stringify(a.max))
        mxOpt.map(mx => ColStatDef(n,
          if (isString) truncateLower(mn) else mn, mx,
          a.nulls, a.fieldId, rows = Some(fileRows)))
      }.toList
    } finally reader.close()
  } catch { case _: Exception => Nil } // stats are an optimization, never fatal

  /** Iceberg-style metrics truncation (default 16 code points): free-
    * text columns must not embed their full min/max per file per column
    * in every snapshot body — manifest weight would grow linearly with
    * document size. A prefix is ≤ its original in the unsigned UTF-8
    * order every stats consumer compares in, so the LOWER bound
    * truncates plainly; the UPPER bound increments its last code point
    * (skipping the surrogate gap) so it stays an upper bound — pruning
    * gets marginally looser, never wrong. None (stat withheld) in the
    * astronomically-rare case where no increment exists. Numeric and
    * temporal bounds are fixed-width and pass through untouched. */
  private val StatTruncateLen = 16

  private def truncateLower(s: String): String =
    if (s.codePointCount(0, s.length) <= StatTruncateLen) s
    else s.substring(0, s.offsetByCodePoints(0, StatTruncateLen))

  private[meta] def truncateUpper(s: String): Option[String] = {
    if (s.codePointCount(0, s.length) <= StatTruncateLen) return Some(s)
    val cps = s.codePoints().limit(StatTruncateLen.toLong).toArray
    var i = cps.length - 1
    while (i >= 0) {
      if (cps(i) < 0x10FFFF) {
        cps(i) = if (cps(i) == 0xD7FF) 0xE000 else cps(i) + 1
        val out = cps.take(i + 1)
        return Some(new String(out, 0, out.length))
      }
      i -= 1
    }
    None
  }

  /** One file's row count straight off its footer — no data pages read.
    * None when the footer is unreadable (caller falls back safely). */
  def rowCount(absPath: String, conf: Configuration): Option[Long] = try {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(absPath), conf))
    try Some(reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum)
    finally reader.close()
  } catch { case _: Exception => None }

  private def stringify(v: Any): String = v match {
    case b: Binary => b.toStringUsingUTF8
    case other => String.valueOf(other)
  }

  /** How many files a commit harvests on the driver before fanning out.
    * Below this, task-launch overhead exceeds the footer reads. */
  private val DriverHarvestMax = 8

  /** Per-file stats for a commit's new files. Small batches read footers
    * on the driver; larger ones run ONE small Spark job parallelized over
    * the file list, so a 10k-file append against an object store costs
    * one round of concurrent footer reads instead of 10k serial driver
    * round-trips inside the commit. The manifest payload is identical
    * either way (same ColStatDef lists keyed by the same rel paths). */
  def harvestAll(spark: org.apache.spark.sql.SparkSession, dataDir: String,
                 relFiles: Seq[String]): Map[String, List[ColStatDef]] = {
    val out: Seq[(String, List[ColStatDef])] =
      if (relFiles.size <= DriverHarvestMax) {
        val conf = spark.sessionState.newHadoopConf()
        relFiles.map(rel => rel -> harvest(s"$dataDir/$rel", conf))
      } else {
        val confBc = spark.sparkContext.broadcast(
          new SerializableHadoopConf(spark.sessionState.newHadoopConf()))
        val slices = math.min(relFiles.size,
          spark.sparkContext.defaultParallelism * 2)
        spark.sparkContext.parallelize(relFiles, slices)
          .map(rel => rel -> harvest(s"$dataDir/$rel", confBc.value.value))
          .collect().toSeq
      }
    out.filter(_._2.nonEmpty).toMap
  }
}

/** Hadoop Configuration is not java-serializable; wrap its own
  * write/readFields protocol so the harvest job can ship the session conf
  * (fs bindings + credentials) to executors. */
private[graft] class SerializableHadoopConf(
    @transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
