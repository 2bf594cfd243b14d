package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, Literal, UnsafeProjection}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, Statistics, SupportsReportStatistics}
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch

/** Identity-column overlay for partitioned `add_files` imports.
  *
  * A hive-layout lake (`k=v/part-*.parquet`, the Spark/Hive
  * `partitionBy` shape) does not store the partition column INSIDE the
  * files — the directory is the value. Registered zero-copy under
  * `import-<uuid>/__part_k=v/`, such a file would read its identity
  * partition columns as null (the footer lacks them). The overlay
  * serves those columns from the file's own `__part_` dir keys — the
  * same authority the write side uses — by planning each imported dir
  * group as its own delegate scan (so one InputPartition never mixes
  * partition values) and patching the group's constants into every
  * emitted row (row path) or batch (vectorized path — a
  * ConstantColumnVector per overlayed ordinal, so imports read
  * columnar just like native files). After compaction the rewrite
  * stamps real columns and dirs into native files and the overlay
  * disappears.
  *
  * Filters on overlayed columns stay correct for free: parquet skips
  * pushdown on columns absent from a file's schema, and Spark's
  * residual FilterExec re-evaluates above the reader — on the patched
  * rows. */
private[graft] object ImportOverlay {

  /** Requested-ordinal → constant internal value for one imported dir
    * group (UTF8String/boxed primitives — the InternalRow currency). */
  final case class OverlaySpec(consts: Array[(Int, Any)],
                               colTypes: Array[DataType]) extends Serializable

  /** Parse one dir value to its INTERNAL representation; None = type
    * outside the exact-render identity set (caller refused earlier). */
  def internalValue(dt: DataType, v: String): Option[Any] = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    if (v == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) return Some(null)
    try dt match {
      case StringType => Some(org.apache.spark.unsafe.types.UTF8String.fromString(v))
      case IntegerType => Some(v.toInt)
      case LongType => Some(v.toLong)
      case ShortType => Some(v.toShort)
      case ByteType => Some(v.toByte)
      case BooleanType => Some(v.toBoolean)
      case _ => None
    } catch { case _: Exception => None }
  }

  /** The overlay constants of one imported rel for the REQUESTED
    * identity columns that carry a parseable `__part_` dir value, keyed
    * by ordinal in `schema`. Columns without a dir (flat imports, or a
    * column added after the import) fall back to the footer/null path —
    * partial coverage overlays what it can, never all-or-nothing (a
    * spec-evolved table must not lose the dirs it does have). */
  def constsFor(rel: String, schema: StructType,
                identCols: Seq[String]): Seq[(Int, Any)] = {
    val kvs = PartitionDirs.kvs(rel)
    identCols.filter(schema.fieldNames.contains).flatMap { c =>
      val i = schema.fieldIndex(c)
      kvs.get(c).flatMap(internalValue(schema.fields(i).dataType, _))
        .map(v => i -> v)
    }
  }
}

/** Tags a delegate partition with its dir group's constants. */
private[graft] final case class OverlayInputPartition(
    inner: InputPartition, spec: ImportOverlay.OverlaySpec)
  extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** Composite scan: the native files' scan untouched, plus one delegate
  * scan per imported dir group whose partitions are overlay-tagged.
  * One shared name-resolving reader factory serves every group (the
  * parquet factory depends only on schema/filters, never file lists —
  * the same sharing [[KeyedScan]] relies on). */
private[graft] class OverlayScan(
    main: Option[Scan],
    groups: Seq[(ImportOverlay.OverlaySpec, Scan)],
    schema: StructType) extends Scan with SupportsReportStatistics {

  override def readSchema(): StructType = schema
  override def description(): String =
    s"import-overlay(${groups.size} dir groups)" +
      main.map(m => " + " + m.description()).getOrElse("")

  override def estimateStatistics(): Statistics = new Statistics {
    // sum sizes where both sides report; rows only when all report
    private val all: Seq[Scan] = main.toSeq ++ groups.map(_._2)
    private val stats = all.collect { case s: SupportsReportStatistics =>
      s.estimateStatistics() }
    override def sizeInBytes(): java.util.OptionalLong = {
      val sz = stats.map(_.sizeInBytes)
      if (sz.nonEmpty && sz.forall(_.isPresent))
        java.util.OptionalLong.of(sz.map(_.getAsLong).sum)
      else java.util.OptionalLong.empty()
    }
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val native = main.map(_.toBatch.planInputPartitions())
        .getOrElse(Array.empty[InputPartition])
      val imported = groups.flatMap { case (spec, s) =>
        s.toBatch.planInputPartitions().map(p =>
          OverlayInputPartition(p, spec): InputPartition)
      }
      native ++ imported
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new OverlayReaderFactory(
        main.map(_.toBatch.createReaderFactory()),
        groups.headOption.map(_._2.toBatch.createReaderFactory()))
  }
}

private[graft] class OverlayReaderFactory(
    mainFactory: Option[PartitionReaderFactory],
    groupFactory: Option[PartitionReaderFactory])
  extends PartitionReaderFactory {

  // columnar stays columnar: overlay constants are per-group CONSTANTS,
  // so a vectorized delegate batch is patched by substituting a
  // ConstantColumnVector per overlayed ordinal — the cheapest possible
  // vectorization. Both factories are parquet factories over the same
  // result schema, so their columnar verdicts agree and BatchScanExec
  // sees one uniform mode (the previous blanket `false` here taxed the
  // NATIVE files of the scan 2-5× whenever any imported dir group
  // survived pruning).
  override def supportColumnarReads(p: InputPartition): Boolean = p match {
    case OverlayInputPartition(inner, _) =>
      groupFactory.get.supportColumnarReads(inner)
    case other => mainFactory.get.supportColumnarReads(other)
  }
  override def createColumnarReader(p: InputPartition)
      : PartitionReader[ColumnarBatch] = p match {
    case OverlayInputPartition(inner, spec) =>
      new OverlayColumnarReader(groupFactory.get.createColumnarReader(inner), spec)
    case other => mainFactory.get.createColumnarReader(other)
  }
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case OverlayInputPartition(inner, spec) =>
        new OverlayReader(groupFactory.get.createReader(inner), spec)
      case other => mainFactory.get.createReader(other)
    }
}

/** Columnar twin of [[OverlayReader]]: wraps the delegate's batch,
  * swapping a `ConstantColumnVector` in at each overlayed ordinal (the
  * parquet reader serves those footer-absent columns as all-null
  * vectors; the dir value is the truth). Untouched ordinals pass the
  * delegate's vectors through by reference — zero copies. The wrapper
  * batch is cached against the delegate's batch identity and row
  * count: the vectorized parquet reader returns ONE batch object with
  * stable column vectors and only the row count varies (final partial
  * batch), so a rebuild happens at most twice per file. */
private[graft] class OverlayColumnarReader(
    delegate: PartitionReader[ColumnarBatch],
    spec: ImportOverlay.OverlaySpec) extends PartitionReader[ColumnarBatch] {

  import org.apache.spark.sql.execution.vectorized.ConstantColumnVector
  import org.apache.spark.sql.vectorized.ColumnVector

  private val byOrd: Map[Int, Any] = spec.consts.toMap
  private var lastIn: ColumnarBatch = _
  private var lastRows = -1
  private var out: ColumnarBatch = _

  private def constVector(n: Int, dt: DataType, v: Any): ConstantColumnVector = {
    val c = new ConstantColumnVector(n, dt)
    if (v == null) c.setNull()
    else dt match { // exactly ImportOverlay.internalValue's identity set
      case StringType =>
        c.setUtf8String(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
      case IntegerType => c.setInt(v.asInstanceOf[Int])
      case LongType => c.setLong(v.asInstanceOf[Long])
      case ShortType => c.setShort(v.asInstanceOf[Short])
      case ByteType => c.setByte(v.asInstanceOf[Byte])
      case BooleanType => c.setBoolean(v.asInstanceOf[Boolean])
      case other =>
        throw new IllegalStateException(s"non-identity overlay type $other")
    }
    c
  }

  override def next(): Boolean = delegate.next()
  override def get(): ColumnarBatch = {
    val b = delegate.get()
    val n = b.numRows()
    if (!(b eq lastIn) || n != lastRows) {
      val cols = Array.tabulate[ColumnVector](spec.colTypes.length) { i =>
        byOrd.get(i) match {
          case Some(v) => constVector(n, spec.colTypes(i), v)
          case None => b.column(i)
        }
      }
      out = new ColumnarBatch(cols, n); lastIn = b; lastRows = n
    }
    out
  }
  override def close(): Unit = delegate.close()
}

/** Patches each delegate row with the dir group's constants (reused
  * buffer — legal: DSv2 readers may reuse rows between next() calls). */
private[graft] class OverlayReader(
    delegate: PartitionReader[InternalRow],
    spec: ImportOverlay.OverlaySpec) extends PartitionReader[InternalRow] {

  private lazy val proj = {
    val byOrd = spec.consts.toMap
    UnsafeProjection.create(spec.colTypes.zipWithIndex.map { case (dt, i) =>
      byOrd.get(i).map(v => Literal(v, dt): Expression)
        .getOrElse(BoundReference(i, dt, nullable = true))
    }.toSeq)
  }
  override def next(): Boolean = delegate.next()
  override def get(): InternalRow = proj(delegate.get())
  override def close(): Unit = delegate.close()
}
