package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, Murmur3HashFunction}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, Statistics, SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch

/** Storage-partitioned (key-grouped) reads: the scan reports
  * `KeyGroupedPartitioning` over the table's partition layout, so two
  * graft tables co-partitioned on the join key — e.g. both
  * `PARTITIONED BY (bucket(32, key))` — join with ZERO shuffle, and an
  * aggregation keyed on the partition columns skips its exchange too.
  * At 100 TB the shuffle of a fact-fact join is THE dominant cost; a
  * catalog that lays both tables out by the same bucket function and
  * then proves co-partitioning to Catalyst removes it entirely (the
  * DSv2 analog of Hive/Iceberg bucketed joins; reference hidden
  * partitioning: `/root/reference/internal/catalog/tables.go` spec
  * handling — the spec exists so engines can exploit layout).
  *
  * Mechanics: every manifest file path carries its partition-dir
  * key/values (`__part_<k>=<v>`), so the builder groups the pruned file
  * list by TYPED partition key, plans one delegate parquet scan per
  * group, and tags each group's input partitions with the key
  * ([[KeyedInputPartition]]). Spark's `BatchScanExec` groups partitions
  * by key (`spark.sql.sources.v2.bucketing.enabled`) and
  * `EnsureRequirements` elides the exchange when both sides report
  * compatible partitioning — compatibility of `bucket(n, col)` resolves
  * through the catalog's [[GraftFunctions.BucketUnbound]] V2 function,
  * whose evaluation is bit-identical to the write-side layout
  * (`pmod(murmur3(col), n)`, [[PartitionTransforms.dirExpr]]). */
private[graft] object GraftFunctions {

  /** Types the bucket function accepts: exactly those whose write-side
    * `hash(col)` (Murmur3 over the INTERNAL value) is replayed here.
    * Decimal/interval/nested types stay out: they never appear as graft
    * bucket sources ([[PartitionTransforms.dirExpr]] writes them, but
    * [[SpecDerivation]] guards type stability, and exotic keys are not
    * worth the review surface). */
  private val bucketableTypes: Set[DataType] = Set(
    ByteType, ShortType, IntegerType, LongType, StringType, BooleanType,
    DateType, TimestampType, FloatType, DoubleType, BinaryType)

  object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col): graft's write-side partition bucket — pmod(murmur3(col), n)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2,
        s"bucket expects (numBuckets, col), got ${inputType.length} args")
      require(inputType.fields(0).dataType == IntegerType,
        s"bucket numBuckets must be INT, got ${inputType.fields(0).dataType}")
      val dt = inputType.fields(1).dataType
      require(bucketableTypes.contains(dt), s"bucket does not support $dt")
      BucketBound(dt)
    }
  }

  /** Bound bucket: MUST match [[PartitionTransforms.dirExpr]]'s
    * `pmod(hash(col), n)` bit-for-bit — Spark may evaluate it to
    * re-shuffle a non-co-partitioned side into this table's layout
    * (`spark.sql.sources.v2.bucketing.shuffle.enabled`), and a
    * disagreement with the dirs would route rows to the wrong bucket.
    * `canonicalName` carries the input type: Murmur3 hashes ints and
    * longs differently, so bucket(n, int_col) and bucket(n, long_col)
    * must never be judged co-partitioned.
    *
    * The `invoke` overloads are the V2 function MAGIC METHOD: Spark
    * resolves the one whose unboxed signature matches `inputTypes` and
    * plans it as an `Invoke` — whole-stage-codegen'd, no per-row boxing
    * — which is the path a bucketed-shuffle re-distribution runs per
    * row over the entire non-co-partitioned side. `produceResult` stays
    * as the interpreted fallback (and the null path: a null key hashes
    * to the seed, like the write side; the magic path null-propagates,
    * which only misplaces rows no equi-join can match anyway). */
  case class BucketBound(dt: DataType) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = s"graft.bucket(${dt.catalogString})"
    override def isResultNullable: Boolean = false

    private def bucketOf(n: Int, v: Any): Int = {
      val h = Murmur3HashFunction.hash(v, dt, 42).toInt
      ((h % n) + n) % n
    }

    def invoke(n: Int, v: Boolean): Int = bucketOf(n, v)
    def invoke(n: Int, v: Byte): Int = bucketOf(n, v)
    def invoke(n: Int, v: Short): Int = bucketOf(n, v)
    def invoke(n: Int, v: Int): Int = bucketOf(n, v)
    def invoke(n: Int, v: Long): Int = bucketOf(n, v)
    def invoke(n: Int, v: Float): Int = bucketOf(n, v)
    def invoke(n: Int, v: Double): Int = bucketOf(n, v)
    def invoke(n: Int, v: org.apache.spark.unsafe.types.UTF8String): Int =
      bucketOf(n, v)
    def invoke(n: Int, v: Array[Byte]): Int = bucketOf(n, v)

    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      val v = input.get(1, dt) // null hashes to the seed, like write-side hash()
      Integer.valueOf(bucketOf(n, v))
    }
  }
}

/** Temporal partition-transform functions (years/months/days/hours) —
  * the V2 functions Spark resolves when a scan reports
  * `KeyGroupedPartitioning` over a temporally-partitioned layout. Each
  * MUST reproduce the write-side dir rendering exactly
  * ([[PartitionTransforms.dirExpr]]: `year(col)` /
  * `date_format(col, 'yyyy-MM[-dd[-HH]]')`), evaluated in UTC — the
  * layout is only written under a UTC session, and a one-sided shuffle
  * re-deriving the key from raw rows must land in the same dirs. */
private[graft] object TemporalFunctions {
  import java.time.{Instant, LocalDate, ZoneOffset}
  import java.time.format.DateTimeFormatter
  import org.apache.spark.unsafe.types.UTF8String

  private val monthFmt = DateTimeFormatter.ofPattern("yyyy-MM")
  private val dayFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")
  private val hourFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd-HH")

  private def utc(us: Long): java.time.ZonedDateTime =
    Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
      Math.floorMod(us, 1000000L) * 1000L).atZone(ZoneOffset.UTC)

  private val temporalTypes: Set[DataType] =
    Set(DateType, TimestampType, TimestampNTZType)

  /** `kind` ∈ year|month|day|hour (the spec transform names). */
  case class TemporalUnbound(kind: String) extends UnboundFunction {
    override def name(): String = kind + "s" // V2 transform names are plural
    override def description(): String =
      s"${name()}(col): graft's write-side temporal partition dir value"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 1,
        s"${name()} expects one temporal argument, got ${inputType.length}")
      val dt = inputType.fields(0).dataType
      require(temporalTypes.contains(dt), s"${name()} does not support $dt")
      TemporalBound(kind, dt)
    }
  }

  /** NTZ micros render by their wall-clock fields; instants via UTC —
    * matching `date_format` under the (gated) UTC session. */
  case class TemporalBound(kind: String, dt: DataType)
    extends ScalarFunction[AnyRef] {
    override def inputTypes(): Array[DataType] = Array(dt)
    override def resultType(): DataType =
      if (kind == "year") IntegerType else StringType
    override def name(): String = kind + "s"
    override def canonicalName(): String =
      s"graft.${kind}s(${dt.catalogString})"

    private def compute(v: Any): AnyRef = {
      val temporal: java.time.temporal.TemporalAccessor = dt match {
        case DateType => LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong)
        case TimestampNTZType =>
          java.time.LocalDateTime.ofInstant(
            Instant.ofEpochSecond(
              Math.floorDiv(v.asInstanceOf[Long], 1000000L),
              Math.floorMod(v.asInstanceOf[Long], 1000000L) * 1000L),
            ZoneOffset.UTC)
        case _ => utc(v.asInstanceOf[Long])
      }
      kind match {
        case "year" => Integer.valueOf(temporal.get(
          java.time.temporal.ChronoField.YEAR))
        case "month" => UTF8String.fromString(monthFmt.format(temporal))
        case "day" => UTF8String.fromString(dayFmt.format(temporal))
        case "hour" => UTF8String.fromString(hourFmt.format(temporal))
      }
    }

    // magic-method overloads: codegen'd key derivation for the
    // re-shuffle path (DateType arrives as int days, timestamps as
    // long micros)
    def invoke(v: Int): AnyRef = compute(v)
    def invoke(v: Long): AnyRef = compute(v)

    override def produceResult(input: InternalRow): AnyRef =
      compute(input.get(0, dt))
  }
}

/** A delegate input partition tagged with its typed partition key —
  * what lets `BatchScanExec` group tasks by key and line them up
  * against the other join side's groups. */
private[graft] class KeyedInputPartition(
    val inner: InputPartition, key: GenericInternalRow)
  extends InputPartition with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = key
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** One whole key group of stamped-sorted files, read as a k-way MERGE:
  * each file is a sorted run (its adding commit stamped the declared
  * order), so merging them yields a sorted partition and the scan can
  * keep its ordering report even with several files per bucket — the
  * second-commit case that previously dropped the report and forced a
  * SortExec back into every merge join. Files are never byte-range
  * split (a split would fragment the runs).
  *
  * Each live run MUST read through its own factory INSTANCE: the
  * parquet factory's per-instance ParquetReaderCallback closes the
  * previously-opened file's iterator whenever a new file opens, so two
  * interleaved readers from one instance kill each other (each run
  * would die after its first row — the SpjSpec merge cases assert
  * this). The per-run factories are case-class COPIES of the scan's
  * single base factory
  * ([[org.apache.spark.sql.execution.datasources.v2.parquet.GraftFactoryIsolation]]),
  * made at planning time: copies share the base's ONE broadcast conf
  * (and one SQLConf reference, so a partition's factories serialize it
  * once), where the previous shape called `createReaderFactory()` per
  * FILE and so re-broadcast a SerializableConfiguration thousands of
  * times per query on a big sorted table. Copying must happen on the
  * DRIVER: the copy constructor re-reads SQLConf, whose transient
  * config reader is null after executor-side deserialization. The
  * merge additionally copies each admitted row ([[MergingRowReader]]),
  * which defends against per-reader buffer reuse. */
private[graft] class KeyedMergePartition(
    val files: Array[(String, Long)], key: GenericInternalRow,
    val factories: Array[PartitionReaderFactory])
  extends InputPartition with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = key
}

/** Sort-key spec shipped to the merge readers: requested-schema
  * ordinal, type, ascending?, nulls-first?. */
private[graft] final case class MergeKey(ord: Int, dt: DataType,
                                         asc: Boolean, nullsFirst: Boolean)
  extends Serializable

/** K-way merge over per-file sorted readers. Rows are materialized to
  * standalone UnsafeRows on admission (an explicit projection + copy —
  * DSv2 readers may reuse their row/batch buffer between next() calls,
  * and a merge holds one live row per run). */
private[graft] class MergingRowReader(
    readers: Seq[PartitionReader[InternalRow]],
    keys: Array[MergeKey],
    colTypes: Array[DataType]) extends PartitionReader[InternalRow] {

  import org.apache.spark.sql.catalyst.expressions._

  private lazy val toUnsafe = UnsafeProjection.create(colTypes)
  private val rowOrd: Ordering[InternalRow] = {
    val sorts = keys.map { k =>
      SortOrder(BoundReference(k.ord, k.dt, nullable = true),
        if (k.asc) Ascending else Descending,
        if (k.nullsFirst) NullsFirst else NullsLast, Seq.empty)
    }.toIndexedSeq
    // Codegen'd comparator: this runs once per row per merge level on
    // the hot read path, where an interpreted comparison prices every
    // heap sift at a tree of virtual calls. Generation happens here on
    // the executor (readers are built executor-side) and is amortized
    // by the codegen cache across partitions; keys are plain bound
    // references, but keep the interpreted fallback for any type the
    // generator refuses.
    try codegen.GenerateOrdering.generate(sorts)
    catch { case scala.util.control.NonFatal(_) => new InterpretedOrdering(sorts) }
  }
  // (row, readerIdx): readerIdx tie-break keeps the merge deterministic
  private implicit val heapOrd: Ordering[(InternalRow, Int)] =
    Ordering.by[(InternalRow, Int), (InternalRow, Int)](identity)(
      Ordering.Tuple2(rowOrd, Ordering.Int)).reverse // PQ is a max-heap
  private val heap = scala.collection.mutable.PriorityQueue.empty[(InternalRow, Int)]
  private var initialized = false
  private var current: InternalRow = _

  private def admit(i: Int): Unit =
    if (readers(i).next())
      heap.enqueue((toUnsafe(readers(i).get()).copy(), i))

  override def next(): Boolean = {
    if (!initialized) { readers.indices.foreach(admit); initialized = true }
    if (heap.isEmpty) return false
    val (row, i) = heap.dequeue()
    current = row
    admit(i)
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = readers.foreach(_.close())
}

/** Unwraps [[KeyedInputPartition]] before handing partitions to the
  * parquet delegate factory (which pattern-matches on its own
  * FilePartition type), and serves [[KeyedMergePartition]]s through a
  * per-file [[MergingRowReader]]. */
private[graft] class KeyedReaderFactory(delegate: PartitionReaderFactory,
                                        mergeKeys: Array[MergeKey] = Array.empty,
                                        colTypes: Array[DataType] = Array.empty)
  extends PartitionReaderFactory {
  private def unwrap(p: InputPartition): InputPartition = p match {
    case k: KeyedInputPartition => k.inner
    case other => other
  }
  private def wholeFile(abs: String, len: Long, idx: Int): InputPartition =
    org.apache.spark.sql.execution.datasources.FilePartition(idx, Array(
      org.apache.spark.sql.execution.datasources.PartitionedFile(
        InternalRow.empty,
        org.apache.spark.paths.SparkPath.fromPathString(abs),
        0L, len, Array.empty, 0L, len)))
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case m: KeyedMergePartition =>
        new MergingRowReader(
          m.files.zipWithIndex.map { case ((abs, len), i) =>
            m.factories(i).createReader(wholeFile(abs, len, i)) }.toSeq,
          mergeKeys, colTypes)
      case other => delegate.createReader(unwrap(other))
    }
  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] =
    delegate.createColumnarReader(unwrap(p))
  override def supportColumnarReads(p: InputPartition): Boolean = p match {
    case _: KeyedMergePartition => false
    case other => delegate.supportColumnarReads(unwrap(other))
  }
}

/** The key-grouped scan: schema/statistics/columnar mode come from the
  * full-file-list delegate (same files, same answers), so broadcast
  * decisions and vectorization are untouched. Batch planning builds
  * each group's FilePartitions DIRECTLY from the group's file list —
  * lengths arrive pre-resolved from the manifest layer's memoized
  * cache ([[ManifestFileIndex.lengthsFor]]), so planning performs ZERO
  * filesystem metadata calls (a per-file driver stat here would be
  * ~80k NameNode RPCs per query on a 100 TB 8-bucket table) — instead
  * of constructing a parquet table + file index per group (at
  * thousands of key groups that setup dominates driver planning time).
  * Files are byte-range-split and bin-packed at
  * `spark.sql.files.maxPartitionBytes`, mirroring the file-source's
  * own partitioning. */
private[graft] class KeyedScan(
    full: Scan,
    groups: Seq[(GenericInternalRow, Seq[(String, Long)])], // key → (ABSOLUTE path, length)
    keyExprs: Array[V2Expression],
    // non-empty ONLY when the builder proved every file of every group
    // sorted under the CURRENT order (see GraftScanBuilder.keyedScanFor):
    // Catalyst then plans merge joins over the SPJ layout with no
    // SortExec — the sorted-table payoff on top of the exchange-free one
    reportedOrdering: Array[org.apache.spark.sql.connector.expressions.SortOrder] =
      Array.empty,
    // non-empty = multi-file (or oversized) sorted groups: plan ONE
    // whole-group k-way merge partition per key instead of chunked
    // columnar splits — the report stays honest because each partition
    // EMITS in the declared order. Row-based (the merge patches rows),
    // uniform across partitions (BatchScanExec refuses mixed modes).
    mergeKeys: Array[MergeKey] = Array.empty)
  extends Scan with SupportsReportStatistics with SupportsReportPartitioning
  with org.apache.spark.sql.connector.read.SupportsReportOrdering {

  override def outputOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    reportedOrdering

  override def readSchema(): StructType = full.readSchema()
  override def description(): String =
    s"keyed(${groups.size} partition groups) ${full.description()}"
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    full.columnarSupportMode()

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(keyExprs, groups.size)

  override def estimateStatistics(): Statistics = full match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
    }
  }

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
      if (mergeKeys.nonEmpty) {
        // ONE base factory (one broadcast conf) + a cheap per-run copy
        // for callback isolation — see KeyedMergePartition doc
        val base = full.toBatch.createReaderFactory()
        return groups.map { case (key, paths) =>
          new KeyedMergePartition(paths.toArray, key,
            paths.map(_ => org.apache.spark.sql.execution.datasources.v2
              .parquet.GraftFactoryIsolation.fresh(base)).toArray)
            : InputPartition
        }.toArray
      }
      val spark = org.apache.spark.sql.SparkSession.active
      val maxSplit = math.max(1L, spark.sessionState.conf.filesMaxPartitionBytes)
      groups.iterator.flatMap { case (key, paths) =>
        val chunks = paths.flatMap { case (abs, len) =>
          (0L until math.max(len, 1L) by maxSplit).map { start =>
            PartitionedFile(InternalRow.empty,
              org.apache.spark.paths.SparkPath.fromPathString(abs),
              start, math.min(maxSplit, len - start), Array.empty, 0L, len)
          }
        }
        val packed = scala.collection.mutable.ArrayBuffer.empty[Array[PartitionedFile]]
        var cur = scala.collection.mutable.ArrayBuffer.empty[PartitionedFile]
        var size = 0L
        chunks.foreach { c =>
          if (size + c.length > maxSplit && cur.nonEmpty) {
            packed += cur.toArray; cur = scala.collection.mutable.ArrayBuffer.empty
            size = 0L
          }
          cur += c; size += c.length
        }
        if (cur.nonEmpty) packed += cur.toArray
        packed.iterator.zipWithIndex.map { case (fs, i) =>
          new KeyedInputPartition(FilePartition(i, fs), key): InputPartition
        }
      }.toArray
    }
    // one factory serves every group: the parquet reader factory
    // depends only on schema/filters/conf, never on the file list
    override def createReaderFactory(): PartitionReaderFactory =
      new KeyedReaderFactory(full.toBatch.createReaderFactory(), mergeKeys,
        full.readSchema().fields.map(_.dataType))
  }
}
