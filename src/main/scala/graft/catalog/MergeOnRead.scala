package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch

import graft.meta.{DeleteFileDef, SchemaBridge}

/** Merge-on-read equality-delete application (SURVEY.md §2.B row-level
  * DML; the read-side dual of [[graft.commit.MetadataUpdate.RowDelta]]).
  *
  * A snapshot's delete files are small parquet files of identifier-column
  * values. A data row is live iff no delete file with a HIGHER sequence
  * than the row's file carries its key. The scan splits the pruned file
  * list by applicable-delete set: files no delete touches keep the
  * untouched vectorized parquet path; files with applicable deletes read
  * row-based through a filter that subtracts the key set (loaded once on
  * the driver, shipped inside the reader factory — bounded by the
  * delete-row guard, folded away entirely by compaction).
  *
  * Scale shape: the 100 TB corpus stays on the columnar fast path except
  * for exactly the files a delete touches, the delete keys move once per
  * stage (task-binary broadcast), and no data file is ever rewritten on
  * the DML path itself.
  */
private[graft] object MergeOnRead {

  /** Identifier-column names + field ids declared by the
    * `identifier-fields` table property, validated against the schema:
    * top-level, exact-render types only (the key tuple must compare
    * byte-identically between the delete writer and the scan filter). */
  def keyFields(props: Map[String, String],
                schema: StructType): Seq[(String, Int)] = {
    val names = props.get("identifier-fields").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    require(names.nonEmpty,
      "merge-on-read requires the identifier-fields table property " +
        "(comma-separated key column names)")
    names.map { n =>
      val f = schema.fields.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"identifier-fields names unknown column '$n'"))
      f.dataType match {
        case StringType | IntegerType | LongType | ShortType | ByteType |
             BooleanType => ()
        case dt => throw new UnsupportedOperationException(
          s"identifier field '$n' has type $dt — merge-on-read keys must " +
            "be string/int/long/short/byte/boolean (exact-render equality)")
      }
      require(!f.nullable,
        s"identifier field '$n' must be declared NOT NULL — Spark's " +
          "delta-based row-level plans refuse nullable row ids")
      require(f.metadata.contains(SchemaBridge.FieldIdKey),
        s"identifier field '$n' carries no stable field id")
      (n, f.metadata.getLong(SchemaBridge.FieldIdKey).toInt)
    }
  }

  /** Is merge-on-read enabled for this command on this table? */
  def morMode(props: Map[String, String], command: String): Boolean =
    props.get(s"write.$command.mode").exists(_.equalsIgnoreCase("merge-on-read"))

  /** Column name for a stable field id in the CURRENT schema — delete
    * files reference keys by id, so a rename between delete and read
    * still resolves; a dropped key column fails loudly (the delete can
    * no longer be applied, the table needs compaction first). */
  def nameOfFieldId(schema: StructType, id: Int): String =
    schema.fields.find(f => f.metadata.contains(SchemaBridge.FieldIdKey) &&
        f.metadata.getLong(SchemaBridge.FieldIdKey).toInt == id)
      .map(_.name).getOrElse(
        throw new IllegalStateException(
          s"delete file references field id $id absent from the current " +
            "schema — compact the table before dropping key columns"))

  /** Byte budget for the broadcast-class delete path: up to this many
    * bytes of delete FILES the scan materializes the key sets once on
    * the driver and ships them inside the reader factory (task-binary
    * broadcast — cheap, no shuffle). Past the budget that collect would
    * hurt the driver long before any row-count guard fired, so the
    * [[MorDeleteJoin]] rule rewrites the relation into a distributed
    * left-anti join against the delete files instead — keys never touch
    * the driver. 64 MB is deliberately broadcast-class: the same order
    * as `spark.sql.autoBroadcastJoinThreshold`'s sane upper range. */
  val DefaultDeleteByteBudget: Long = 64L << 20

  /** Table property overriding the broadcast-class delete byte budget. */
  val ByteBudgetProp = "read.delete.byte-budget"

  def byteBudget(props: Map[String, String]): Long =
    props.get(ByteBudgetProp).map(_.trim.toLong)
      .getOrElse(DefaultDeleteByteBudget)

  /** Estimated on-disk bytes of one delete file: the stamped file length
    * when the writer recorded it, else a conservative per-key estimate
    * for legacy metadata written before sizes existed. */
  def estBytes(d: graft.meta.DeleteFileDef): Long =
    if (d.bytes > 0) d.bytes else d.rows * 32L

  /** Could this parquet file contain SOME key of ANY group (each group:
    * per-column candidate values, conjunctive across its columns),
    * judged by its footer bloom filters? ONE footer open per file, all
    * groups tested on it — `false` PROVES no candidate key ever lived
    * in the file. The boxed value the bloom hashes is chosen from the
    * column chunk's PHYSICAL type, never the table's logical type: the
    * bloom hash of Integer(5) and Long(5) differ, so a logically
    * widened column (int → bigint) must still hash 4-byte values
    * against blooms built from 4-byte writes. Conservative on every
    * uncertainty: missing bloom, unknown physical column (rename),
    * null value, unexpected physical/value pairing, unreadable footer.
    * A value that cannot exist in the physical type at all (a widened
    * key past Int.MaxValue vs an INT32 chunk) counts as proven
    * absent. */
  def bloomMayContainAny(abs: String,
                         hconf: org.apache.hadoop.conf.Configuration,
                         groups: Seq[Seq[(String, Iterable[Any])]]): Boolean = {
    try {
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(abs), hconf))
      try {
        import scala.jdk.CollectionConverters._
        val blocks = reader.getRowGroups.asScala
        groups.exists { cols =>
          cols.forall { case (n, values) =>
            blocks.exists { b =>
              b.getColumns.asScala.find(_.getPath.toDotString == n) match {
                case None => true
                case Some(cm) =>
                  val bf = reader.getBloomFilterDataReader(b).readBloomFilter(cm)
                  bf == null || values.exists { v =>
                    bloomBox(cm.getPrimitiveType.getPrimitiveTypeName, v) match {
                      case BloomTest(o) => bf.findHash(bf.hash(o))
                      case BloomUnknown => true
                      case BloomAbsent => false
                    }
                  }
              }
            }
          }
        }
      } finally reader.close()
    } catch { case scala.util.control.NonFatal(_) => true }
  }

  private sealed trait BloomBox
  private final case class BloomTest(o: Object) extends BloomBox
  /** Undecidable — callers must treat the file as a possible holder. */
  private case object BloomUnknown extends BloomBox
  /** The value cannot exist in this physical type — proven absent. */
  private case object BloomAbsent extends BloomBox

  private def integral(v: Any): Option[Long] = v match {
    case b: Byte => Some(b.toLong)
    case s: Short => Some(s.toLong)
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case _ => None
  }

  private def bloomBox(
      pt: org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName,
      v: Any): BloomBox = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    if (v == null) return BloomUnknown
    pt match {
      case BINARY => v match {
        case s: String =>
          BloomTest(org.apache.parquet.io.api.Binary.fromString(s))
        case _ => BloomUnknown
      }
      case INT64 => integral(v) match {
        case Some(l) => BloomTest(java.lang.Long.valueOf(l))
        case None => BloomUnknown
      }
      case INT32 => integral(v) match {
        case Some(l) if l >= Int.MinValue && l <= Int.MaxValue =>
          BloomTest(Integer.valueOf(l.toInt))
        case Some(_) => BloomAbsent
        case None => BloomUnknown
      }
      case _ => BloomUnknown
    }
  }

  /** Per-file may-hold verdicts for many files against one delete set:
    * memoized per (file, delete set) — delete files are immutable, so
    * entries never stale — and fanned out on a bounded pool past a
    * handful of files (a footer open is a blocking round-trip;
    * object-store latency × files would otherwise stall planning). */
  def bloomVerdicts(dataDir: String, rels: Seq[String], delSetKey: String,
                    groups: Seq[Seq[(String, Iterable[Any])]],
                    hconf: org.apache.hadoop.conf.Configuration)
      : Map[String, Boolean] = {
    def verdict(rel: String): Boolean =
      GraftTable.bloomDirtyMemo(s"$dataDir/$rel|$delSetKey",
        bloomMayContainAny(s"$dataDir/$rel", hconf, groups))
    if (rels.size <= 8) rels.map(r => r -> verdict(r)).toMap
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        rels.map { r =>
          r -> pool.submit(new java.util.concurrent.Callable[Boolean] {
            override def call(): Boolean = verdict(r)
          })
        }.map { case (r, f) => r -> f.get() }.toMap
      } finally pool.shutdown()
    }
  }

  /** Identifier columns declared to carry parquet bloom filters. */
  def declaredBloomCols(props: Map[String, String]): Set[String] =
    props.get("write.parquet.bloom-filter-columns").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).toSet

  /** The distinct key column names a set of delete files constrains. */
  def keyColNames(dels: Seq[graft.meta.DeleteFileDef],
                  schema: StructType): Seq[String] =
    dels.flatMap(_.keyFieldIds).distinct.map(nameOfFieldId(schema, _))

  /** The delete keys pivoted per column, one group per key-field-id
    * set: (column name, candidate values). Values union across delete
    * files sharing an id set — weaker than per-file pairing for
    * multi-column keys, but only in the conservative (keep-the-file)
    * direction, and one group per id set means one bloom pass. */
  def keyColumnGroups(dels: Seq[graft.meta.DeleteFileDef],
                      schema: StructType,
                      keysOf: graft.meta.DeleteFileDef => Set[List[Any]])
      : Seq[Seq[(String, Iterable[Any])]] =
    dels.groupBy(_.keyFieldIds).toSeq.sortBy(_._1.mkString(","))
      .map { case (ids, ds) =>
        ids.zipWithIndex.map { case (id, i) =>
          (nameOfFieldId(schema, id),
            ds.flatMap(d => keysOf(d).map(_.apply(i))): Iterable[Any])
        }
      }

  /** External (driver-collected) and internal (executor-extracted) key
    * values must meet in one representation: String for strings, boxed
    * primitives otherwise. */
  def internalKey(row: InternalRow, ordinals: Array[Int],
                  types: Array[DataType]): List[Any] = {
    var i = 0
    val b = List.newBuilder[Any]
    while (i < ordinals.length) {
      val o = ordinals(i)
      b += (if (row.isNullAt(o)) null else types(i) match {
        case StringType => row.getUTF8String(o).toString
        case IntegerType => row.getInt(o)
        case LongType => row.getLong(o)
        case ShortType => row.getShort(o)
        case ByteType => row.getByte(o)
        case BooleanType => row.getBoolean(o)
        case dt => throw new IllegalStateException(s"unsupported key type $dt")
      })
      i += 1
    }
    b.result()
  }
}

/** One delete-application predicate for a file group: rows whose key
  * tuple (extracted at `ordinals` of the read schema) is in `keys` are
  * dead. Serialized into the reader factory — executors never re-read
  * the delete files. */
private[graft] final case class MorPredicate(
    ordinals: Array[Int], types: Array[DataType],
    keys: Set[List[Any]]) extends Serializable

/** Row filter + optional projection (the read schema may have been
  * widened with key columns the query itself pruned away; `keepFields`
  * is the prefix length to project back down to, or -1 for none;
  * `prefixTypes` are the prefix column types, binding the executor-side
  * projection without shipping the schema). */
private[graft] final case class MorSpec(
    predicates: Seq[MorPredicate], keepFields: Int,
    prefixTypes: Array[DataType]) extends Serializable

/** One position-delete-affected file: read in byte-range splits whose
  * rows carry the metadata-derived absolute row index as a trailing
  * column ([[PosDelta.RowIdxCol]]) — marked indexes are dropped by the
  * reader, so splits and row-group skips are both safe. */
private[graft] final case class PosGroup(rel: String, absPath: String,
                                         fileSize: Long,
                                         positions: Set[Long])
  extends Serializable

/** Scan over a snapshot with live deletes: clean files keep their
  * delegate scan untouched (vectorized, pushdown intact); each
  * equality-dirty group gets its own delegate over a possibly-widened
  * schema plus a subtract-the-keys row filter; each position-dirty file
  * splits into byte-range partitions served by `posFactory`, whose rows
  * carry the metadata-derived row index as a trailing column (pushdown
  * intact — indexes survive row-group skips). readSchema/statistics
  * ride the all-files delegate so join-side broadcast decisions are
  * unchanged. */
private[graft] class MorScan(statsScan: Scan, clean: Option[Scan],
                             dirty: Seq[(Scan, MorSpec)],
                             posGroups: Seq[PosGroup] = Nil,
                             posFactory: Option[Scan] = None)
  extends Scan with SupportsReportStatistics {

  override def readSchema(): StructType = statsScan.readSchema()
  override def description(): String =
    s"graft-mor(${dirty.size} delete-affected groups, " +
      s"${posGroups.size} position-affected files) ${statsScan.description()}"
  override def estimateStatistics(): Statistics = statsScan match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
    }
  }
  override def toBatch: Batch =
    new MorBatch(clean.map(_.toBatch), dirty.map { case (s, sp) => (s.toBatch, sp) },
      posGroups, posFactory.map(_.toBatch),
      statsScan.readSchema().fields.map(_.dataType))
}

/** Tags each delegate partition with which factory must serve it:
  * -1 = clean (columnar), i >= 0 = dirty group i (row-based + filter). */
private[graft] final case class MorInputPartition(delegate: InputPartition,
                                                  side: Int)
  extends InputPartition {
  override def preferredLocations(): Array[String] = delegate.preferredLocations()
}

/** One byte range of a position-delete-affected file, tagged with the
  * file's rel path (the factory's dead-set key — position sets ship
  * once in the factory, never per partition). */
private[graft] final case class PosInputPartition(
    delegate: InputPartition, rel: String) extends InputPartition {
  override def preferredLocations(): Array[String] = delegate.preferredLocations()
}

private[graft] class MorBatch(clean: Option[Batch],
                              dirty: Seq[(Batch, MorSpec)],
                              posGroups: Seq[PosGroup] = Nil,
                              posBatch: Option[Batch] = None,
                              posPrefixTypes: Array[DataType] = Array.empty)
  extends Batch {

  override def planInputPartitions(): Array[InputPartition] = {
    val c = clean.toArray.flatMap(_.planInputPartitions())
      .map(p => MorInputPartition(p, -1): InputPartition)
    val d = dirty.zipWithIndex.toArray.flatMap { case ((b, _), i) =>
      b.planInputPartitions().map(p => MorInputPartition(p, i): InputPartition)
    }
    val p = PosDelta.chunkPartitions(posGroups).map { case (fp, g) =>
      PosInputPartition(fp, g.rel): InputPartition
    }
    c ++ d ++ p
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MorReaderFactory(clean.map(_.createReaderFactory()),
      dirty.map { case (b, sp) => (b.createReaderFactory(), sp) }.toArray,
      posBatch.map(_.createReaderFactory()), posPrefixTypes,
      posGroups.map(g => g.rel -> g.positions).toMap)
}

private[graft] class MorReaderFactory(
    clean: Option[PartitionReaderFactory],
    dirty: Array[(PartitionReaderFactory, MorSpec)],
    pos: Option[PartitionReaderFactory] = None,
    posPrefixTypes: Array[DataType] = Array.empty,
    posDeadByRel: Map[String, Set[Long]] = Map.empty)
  extends PartitionReaderFactory {

  private def route(p: InputPartition): (PartitionReaderFactory, InputPartition, Int) =
    p match {
      case MorInputPartition(d, -1) => (clean.get, d, -1)
      case MorInputPartition(d, i) => (dirty(i)._1, d, i)
      case other => throw new IllegalStateException(s"untagged partition $other")
    }

  // Spark requires every partition of one scan to agree on columnar
  // support ("Cannot mix row-based and columnar input partitions") — a
  // scan with any delete-affected group is therefore uniformly
  // row-based. The parquet factory still DECODES vectorized internally
  // and serves rows off the batch; compaction folds the deletes in and
  // restores the full columnar path.
  override def supportColumnarReads(partition: InputPartition): Boolean = false

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[ColumnarBatch] =
    throw new UnsupportedOperationException(
      "merge-on-read scans are row-based until compaction")

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = partition match {
    case PosInputPartition(d, rel) =>
      new PosFilteringReader(pos.get.createReader(d),
        posDeadByRel.getOrElse(rel, Set.empty), posPrefixTypes)
    case _ =>
      val (f, d, side) = route(partition)
      if (side < 0) f.createReader(d)
      else new MorFilteringReader(f.createReader(d), dirty(side)._2)
  }
}

/** Row reader over one file range of a position-delete-affected file:
  * the delegate's trailing column carries the metadata-derived absolute
  * row index ([[PosDelta.RowIdxCol]]); marked indexes drop, and the
  * index column projects away. Splits and pushed filters are both safe
  * — the index never depends on which rows the reader emits. */
private[graft] class PosFilteringReader(
    delegate: PartitionReader[InternalRow], positions: Set[Long],
    prefixTypes: Array[DataType])
  extends PartitionReader[InternalRow] {

  private val n = prefixTypes.length
  private lazy val proj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(
      (0 until n).map { i =>
        org.apache.spark.sql.catalyst.expressions.BoundReference(
          i, prefixTypes(i),
          nullable = true): org.apache.spark.sql.catalyst.expressions.Expression
      })
  private var current: InternalRow = _
  private var subtracted = 0L

  override def next(): Boolean = {
    while (delegate.next()) {
      val r = delegate.get()
      if (!positions.contains(r.getLong(n))) {
        current = proj(r)
        return true
      }
      subtracted += 1
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = delegate.close()
  override def currentMetricsValues()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    delegate.currentMetricsValues() :+
      ScanMetrics.value(ScanMetrics.RowsSubtractedPos, subtracted)
}

/** Row reader subtracting deleted keys, then projecting away any key
  * columns the query had pruned (the widened suffix). Projection output
  * reuses a buffer — legal: DSv2 readers may reuse rows between next()
  * calls. */
private[graft] class MorFilteringReader(delegate: PartitionReader[InternalRow],
                                        spec: MorSpec)
  extends PartitionReader[InternalRow] {

  private var current: InternalRow = _
  private lazy val proj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(
      (0 until spec.keepFields).map { i =>
        org.apache.spark.sql.catalyst.expressions.BoundReference(
          i, spec.prefixTypes(i),
          nullable = true): org.apache.spark.sql.catalyst.expressions.Expression
      })

  private def dead(r: InternalRow): Boolean = {
    var i = 0
    while (i < spec.predicates.length) {
      val p = spec.predicates(i)
      if (p.keys.contains(MergeOnRead.internalKey(r, p.ordinals, p.types)))
        return true
      i += 1
    }
    false
  }

  private var subtracted = 0L

  override def next(): Boolean = {
    while (delegate.next()) {
      val r = delegate.get()
      if (!dead(r)) {
        current = if (spec.keepFields < 0) r else proj(r)
        return true
      }
      subtracted += 1
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = delegate.close()
  override def currentMetricsValues()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    delegate.currentMetricsValues() :+
      ScanMetrics.value(ScanMetrics.RowsSubtractedEq, subtracted)
}
