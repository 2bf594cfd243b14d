package graft.catalog

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.FilePartition

/** Import-aware reader routing.
  *
  * Files registered by `add_files` carry NO parquet field ids, and
  * Spark's id matching null-fills an id-carrying request against an
  * id-less file — so partitions touching imported files must be served
  * by a factory whose requested schema was stripped of field-id
  * metadata (name resolution). A STREAM cannot bake that choice into
  * one factory: its factory is created once, while later micro-batches
  * may deliver files imported after stream start. The router holds both
  * factory flavors and picks per partition.
  *
  * A bin-packed partition mixing native and imported files routes to
  * the name-resolving factory as a whole — sound, because the add_files
  * guards (no renames in schema history; renames refused while imported
  * files remain in retained history) make name resolution correct for
  * native files exactly as long as any imported file is scannable. */
private[graft] object ImportRouting {

  /** Does any file of this partition live under an `import-*` dir of
    * `dataDir`? Segment-exact on the path below the data root, so a
    * warehouse path that itself contains "import-" never misroutes. */
  def touchesImported(p: InputPartition, dataDirSegs: Int): Boolean = p match {
    case fp: FilePartition =>
      fp.files.exists { f =>
        val segs = new org.apache.hadoop.fs.Path(f.filePath.toString)
          .toUri.getPath.split('/').filter(_.nonEmpty)
        segs.drop(dataDirSegs).exists(_.startsWith(GraftTable.ImportDirPrefix))
      }
    case _ => false
  }

  def segsOf(dataDir: String): Int =
    new org.apache.hadoop.fs.Path(dataDir).toUri.getPath
      .split('/').count(_.nonEmpty)
}

/** Per-partition router between the id-resolving and the name-resolving
  * parquet reader factory (see [[ImportRouting]]). The two factories
  * differ ONLY in requested-schema metadata — same columns, same types,
  * same pushed filters — so routing changes resolution, never shape. */
private[graft] class ImportRoutingReaderFactory(
    idFactory: PartitionReaderFactory,
    namedFactory: PartitionReaderFactory,
    dataDir: String) extends PartitionReaderFactory {

  private val dataDirSegs = ImportRouting.segsOf(dataDir)

  private def pick(p: InputPartition): PartitionReaderFactory =
    if (ImportRouting.touchesImported(p, dataDirSegs)) namedFactory
    else idFactory

  override def supportColumnarReads(p: InputPartition): Boolean =
    pick(p).supportColumnarReads(p)

  override def createReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] =
    pick(p).createReader(p)

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    pick(p).createColumnarReader(p)
}
