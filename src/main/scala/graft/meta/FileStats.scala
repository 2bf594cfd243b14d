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

  def harvest(absPath: String): List[ColStatDef] = try {
    // session Hadoop conf first: it carries fs.<scheme>.impl bindings and
    // credentials for non-local warehouses
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf()).getOrElse(new Configuration())
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
      acc.map { case (n, a) =>
        ColStatDef(n, stringify(a.min), stringify(a.max), a.nulls, a.fieldId)
      }.toList
    } finally reader.close()
  } catch { case _: Exception => Nil } // stats are an optimization, never fatal

  private def stringify(v: Any): String = v match {
    case b: Binary => b.toStringUsingUTF8
    case other => String.valueOf(other)
  }
}
