package graft.catalog

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.commit._
import graft.meta._

/** DSv2 table over the graft metadata store.
  *
  * Reads: delegate to Spark's ParquetTable over the current snapshot's
  * file list — vectorized scan, filter pushdown, column pruning all come
  * from the built-in source (the SURVEY §4 "stay on the Catalyst fast
  * path" decision). Empty tables scan an empty path list with the
  * declared schema.
  *
  * Writes: a V1Write fallback writes parquet into a fresh
  * `data/commit-<uuid>/` directory, then CAS-commits an AddSnapshot whose
  * file list is (previous ∪ new) for append or (new) for truncate —
  * giving atomic, versioned, time-travelable appends (the reference's
  * commit endpoint, `tables.go:192`, applied to data instead of schema).
  */
class GraftTable(tableName: String, store: MetadataStore,
                 ns: Seq[String], table: String,
                 meta: TableMetadata, version: Int,
                 mergedProps: Map[String, String],
                 frozen: Boolean = false)
  extends Table with SupportsRead with SupportsWrite {

  override def name(): String = tableName

  override def schema(): StructType = SchemaBridge.toSpark(meta.currentSchema)

  override def partitioning(): Array[Transform] = {
    val nameById = meta.currentSchema.fields.map(f => f.id -> f.name).toMap
    meta.specs.find(_.specId == meta.defaultSpecId).map(_.fields).getOrElse(Nil)
      .map(f => TransformBridge.toTransform(f, nameById)).toArray
  }

  override def properties(): util.Map[String, String] = {
    val extra = Map(
      "format" -> "parquet",
      "metadata-location" -> store.metadataLocation(ns, table, version),
      "current-snapshot-id" -> meta.currentSnapshotId.map(_.toString).getOrElse("none"))
    (mergedProps ++ extra).asJava
  }

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)

  private def currentRelFiles: Seq[String] =
    meta.currentSnapshot.map(_.files).getOrElse(Nil)

  /** Identity-partitioned column names (physical partition dirs exist). */
  private def identityPartCols: Seq[String] = {
    val nameById = meta.currentSchema.fields.map(f => f.id -> f.name).toMap
    meta.specs.find(_.specId == meta.defaultSpecId).map(_.fields).getOrElse(Nil)
      .filter(_.transform == "identity").flatMap(f => nameById.get(f.sourceId))
  }

  /** bucket[n] spec fields as (sourceCol, n, dirKeyName). */
  private def bucketPartSpecs: Seq[(String, Int, String)] = {
    val nameById = meta.currentSchema.fields.map(f => f.id -> f.name).toMap
    val BucketRe = "bucket\\[(\\d+)\\]".r
    meta.specs.find(_.specId == meta.defaultSpecId).map(_.fields).getOrElse(Nil)
      .flatMap { f =>
        f.transform match {
          case BucketRe(n) => nameById.get(f.sourceId).map(src => (src, n.toInt, f.name))
          case _ => None
        }
      }
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(tableName, store.dataDir(ns, table), currentRelFiles,
      identityPartCols, schema(), options,
      meta.currentSnapshot.map(_.fileStats).getOrElse(Map.empty),
      bucketPartSpecs)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    if (frozen) throw new UnsupportedOperationException(
      "cannot write to a time-travel snapshot")
    new GraftWriteBuilder(store, ns, table)
  }
}

/** Scan builder with snapshot-manifest partition pruning: identity
  * partition values are embedded in the manifest's relative file paths
  * (`commit-X/__part_<col>=<val>/...`), so equality/IN filters on
  * identity-partitioned columns eliminate whole files before the parquet
  * delegate is even constructed — the metadata-level file skipping the
  * reference's hidden-partition spec exists to enable (SURVEY.md §4).
  * Remaining filters flow to the delegate for row-group skipping. */
private[graft] class GraftScanBuilder(
    tableName: String, dataDir: String, relFiles: Seq[String],
    partCols: Seq[String], tableSchema: StructType,
    options: CaseInsensitiveStringMap,
    fileStats: Map[String, List[graft.meta.ColStatDef]] = Map.empty,
    bucketSpecs: Seq[(String, Int, String)] = Nil)
  extends ScanBuilder
  with org.apache.spark.sql.connector.read.SupportsPushDownFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {

  import org.apache.spark.sql.sources._

  private var pushed: Array[Filter] = Array.empty
  private var requiredSchema: StructType = tableSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    // everything is also kept as a residual: pruning is best-effort and
    // the delegate re-checks row groups + rows
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(required: StructType): Unit =
    requiredSchema = if (required.isEmpty) tableSchema else required

  private val bucketBySrc: Map[String, (Int, String)] =
    bucketSpecs.map { case (src, n, name) => src -> (n, name) }.toMap

  /** Driver-side replay of the write path's `pmod(hash(col), n)` for a
    * pushed literal: Spark's Murmur3 (seed 42) over the column's Catalyst
    * type. None when the literal can't be converted (never prune then). */
  private def bucketOf(c: String, v: Any, n: Int): Option[Int] = try {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
    tableSchema.fields.find(_.name == c).map { f =>
      val h = new Murmur3Hash(Seq(Literal.create(v, f.dataType)), 42)
        .eval(null).asInstanceOf[Int]
      ((h % n) + n) % n
    }
  } catch { case _: Exception => None }

  /** Allowed value sets per partition-DIRECTORY key from the pushed
    * filters (conjunctive): identity columns match their own value,
    * bucket columns match the recomputed bucket id. None = unconstrained. */
  private def allowedValues: Map[String, Set[String]] = {
    val acc = scala.collection.mutable.Map.empty[String, Set[String]]
    def intersect(c: String, vs: Set[String]): Unit =
      acc(c) = acc.get(c).map(_.intersect(vs)).getOrElse(vs)
    def bucketHit(c: String, v: Any): Unit = bucketBySrc.get(c).foreach {
      case (n, dirKey) => bucketOf(c, v, n).foreach(b => intersect(dirKey, Set(b.toString)))
    }
    pushed.foreach {
      case EqualTo(c, v) if partCols.contains(c) => intersect(c, Set(String.valueOf(v)))
      case EqualTo(c, v) if bucketBySrc.contains(c) => bucketHit(c, v)
      case EqualNullSafe(c, v) if partCols.contains(c) && v != null =>
        intersect(c, Set(String.valueOf(v)))
      case EqualNullSafe(c, v) if bucketBySrc.contains(c) && v != null => bucketHit(c, v)
      case In(c, vs) if partCols.contains(c) =>
        intersect(c, vs.filter(_ != null).map(String.valueOf).toSet)
      case In(c, vs) if bucketBySrc.contains(c) =>
        bucketBySrc.get(c).foreach { case (n, dirKey) =>
          val buckets = vs.filter(_ != null).flatMap(v => bucketOf(c, v, n)).map(_.toString)
          // only prune if EVERY literal resolved to a bucket (a missed
          // conversion must not narrow the allowed set)
          if (buckets.length == vs.count(_ != null)) intersect(dirKey, buckets.toSet)
        }
      case _ => ()
    }
    acc.toMap
  }

  private def partitionAllows(rel: String, allowed: Map[String, Set[String]]): Boolean = {
    val kvs = rel.split("/").iterator
      .filter(_.startsWith("__part_")).flatMap { seg =>
        seg.stripPrefix("__part_").split("=", 2) match {
          case Array(k, v) => Some(k -> v)
          case _ => None
        }
      }.toMap
    allowed.forall { case (c, vs) =>
      kvs.get(c).forall(vs.contains) // file without the dir key: keep
    }
  }

  /** Typed compare of a manifest stat string against a filter value,
    * driven by the table schema. None = incomparable (never prune). */
  private def cmp(col: String, stat: String, v: Any): Option[Int] = try {
    import org.apache.spark.sql.types._
    tableSchema.fields.find(_.name == col).map(_.dataType) match {
      case Some(IntegerType | LongType) =>
        Some(java.lang.Long.compare(stat.toLong, String.valueOf(v).toLong))
      case Some(FloatType | DoubleType) =>
        Some(java.lang.Double.compare(stat.toDouble, String.valueOf(v).toDouble))
      case Some(StringType) => Some(stat.compareTo(String.valueOf(v)))
      case _ => None
    }
  } catch { case _: Exception => None }

  /** Current column name → stable field id (from the `parquet.field.id`
    * metadata the schema bridge stamps). Stats resolve through this, so a
    * rename (or a reused name) can never pair a filter with another
    * column's min/max. */
  private val fieldIdByName: Map[String, Int] =
    tableSchema.fields.flatMap { f =>
      if (f.metadata.contains(graft.meta.SchemaBridge.FieldIdKey))
        Some(f.name -> f.metadata.getLong(graft.meta.SchemaBridge.FieldIdKey).toInt)
      else None
    }.toMap

  /** Min/max file skipping: a conjunct that cannot hold anywhere inside
    * the file's [min, max] range eliminates the file. Unknown filter
    * shapes and stat-less columns never prune (safety first). */
  private def statsAllow(rel: String): Boolean = fileStats.get(rel) match {
    case None => true
    case Some(stats) =>
      def range(c: String): Option[graft.meta.ColStatDef] =
        fieldIdByName.get(c) match {
          case Some(id) =>
            // id-keyed first; a legacy no-id stat may name-match, but a
            // stat carrying a DIFFERENT id never does
            stats.find(_.fieldId.contains(id))
              .orElse(stats.find(s => s.fieldId.isEmpty && s.name == c))
          case None => stats.find(_.name == c)
        }
      pushed.forall {
        case EqualTo(c, v) => range(c).forall(st =>
          cmp(c, st.min, v).forall(_ <= 0) && cmp(c, st.max, v).forall(_ >= 0))
        case In(c, vs) => range(c).forall(st => vs.exists(v =>
          cmp(c, st.min, v).forall(_ <= 0) && cmp(c, st.max, v).forall(_ >= 0)))
        case GreaterThan(c, v) => range(c).forall(st => cmp(c, st.max, v).forall(_ > 0))
        case GreaterThanOrEqual(c, v) => range(c).forall(st => cmp(c, st.max, v).forall(_ >= 0))
        case LessThan(c, v) => range(c).forall(st => cmp(c, st.min, v).forall(_ < 0))
        case LessThanOrEqual(c, v) => range(c).forall(st => cmp(c, st.min, v).forall(_ <= 0))
        case _ => true
      }
  }

  private[graft] def prunedRelFiles: Seq[String] = {
    val allowed = allowedValues
    relFiles
      .filter(rel => allowed.isEmpty || partitionAllows(rel, allowed))
      .filter(statsAllow)
  }

  override def build(): org.apache.spark.sql.connector.read.Scan = {
    val files = prunedRelFiles.map(rel => s"$dataDir/$rel")
    val spark = SparkSession.active
    // field-id column resolution is set at catalog initialize, but that
    // can be undone (RESET / SET ... = false) or may have landed on a
    // different session than the one scanning — without it, files written
    // before a rename silently read the renamed column as NULL. Re-assert
    // here only when it's not already on (no-op in the steady state).
    if (!spark.conf.get("spark.sql.parquet.fieldId.read.enabled", "false").toBoolean)
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val delegate = ParquetTable(tableName, spark, options, files,
      Some(tableSchema), classOf[ParquetFileFormat])
      .newScanBuilder(options)
    delegate.pruneColumns(requiredSchema)
    // hand the supported subset to the delegate for row-group skipping;
    // the field is `protected var` in Scala but its setter is public
    // bytecode, so one reflective call bridges it
    val supported = delegate.pushDataFilters(pushed)
    classOf[org.apache.spark.sql.execution.datasources.v2.FileScanBuilder]
      .getMethod("pushedDataFilters_$eq", classOf[Array[Filter]])
      .invoke(delegate, supported)
    delegate.build()
  }
}

private class GraftWriteBuilder(store: MetadataStore, ns: Seq[String], table: String)
  extends WriteBuilder with SupportsTruncate {

  private var overwrite = false

  override def truncate(): WriteBuilder = { overwrite = true; this }

  override def build(): V1Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, ignored: Boolean): Unit = {
          val commitId = java.util.UUID.randomUUID().toString
          val relDir = s"commit-$commitId"
          val outDir = store.dataDir(ns, table) + "/" + relDir
          val (meta0, _) = store.load(ns, table)

          // declared write order: range-cluster + sort within partitions
          // (row-group stats then give min/max skipping on read — the
          // reference's sort-order option, tables.go:105-107)
          val sortCols = meta0.properties.get("write.sort-order").toSeq
            .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).map { spec =>
              val parts = spec.split("\\s+")
              if (parts.length > 1 && parts(1).equalsIgnoreCase("desc"))
                org.apache.spark.sql.functions.col(parts(0)).desc
              else org.apache.spark.sql.functions.col(parts(0)).asc
            }
          // identity and bucket[n] partition transforms become physical
          // partition dirs; the partition value rides in a shadow column
          // so the original stays inside the data files (scans need no
          // partition recovery). Bucket ids are pmod(hash(col), n) —
          // Spark's Murmur3 — which the scan side recomputes for pushed
          // equality filters to prune whole buckets.
          val nameById = meta0.currentSchema.fields.map(f => f.id -> f.name).toMap
          val specFields = meta0.specs.find(_.specId == meta0.defaultSpecId)
            .map(_.fields).getOrElse(Nil)
          val identCols = specFields
            .filter(_.transform == "identity")
            .flatMap(f => nameById.get(f.sourceId))
            .filter(data.columns.contains)
          val BucketRe = "bucket\\[(\\d+)\\]".r
          val bucketFields = specFields.flatMap { f =>
            f.transform match {
              case BucketRe(n) => nameById.get(f.sourceId)
                .filter(data.columns.contains)
                .map(src => (src, n.toInt, f.name))
              case _ => None
            }
          }

          // stamp table field ids onto the outgoing columns so the parquet
          // writer records them (fieldId.write is on by default) — the
          // read side then resolves by id, making renames metadata-only
          val schemaFields = SchemaBridge.toSpark(meta0.currentSchema)
          var out = data.select(schemaFields.fields.toSeq.map { f =>
            org.apache.spark.sql.functions.col(f.name).as(f.name, f.metadata)
          }: _*)
          if (sortCols.nonEmpty)
            out = out.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
          val partDirCols =
            identCols.map("__part_" + _) ++ bucketFields.map("__part_" + _._3)
          val writer = if (partDirCols.nonEmpty) {
            identCols.foreach { c =>
              out = out.withColumn(s"__part_$c", org.apache.spark.sql.functions.col(c))
            }
            bucketFields.foreach { case (src, n, name) =>
              out = out.withColumn(s"__part_$name", org.apache.spark.sql.functions.pmod(
                org.apache.spark.sql.functions.hash(org.apache.spark.sql.functions.col(src)),
                org.apache.spark.sql.functions.lit(n)))
            }
            out.write.partitionBy(partDirCols: _*)
          } else out.write
          writer.mode(SaveMode.ErrorIfExists).parquet(outDir)

          def listRec(p: java.nio.file.Path): List[String] = {
            val s = java.nio.file.Files.walk(p)
            try s.iterator().asScala
              .filter(f => java.nio.file.Files.isRegularFile(f) &&
                f.getFileName.toString.endsWith(".parquet"))
              .map(f => p.relativize(f).toString).toList
            finally s.close()
          }
          val newFiles = listRec(java.nio.file.Paths.get(outDir))
            .map(f => s"$relDir/$f")
          // delta-style updates: the final file list is computed against
          // the freshly-loaded base inside the CAS retry loop, so racing
          // appends are commutative (no snapshot-id assertion needed —
          // appends never conflict; overwrite semantics is last-wins)
          val now = System.currentTimeMillis()
          // footer-only stats harvest per new file → manifest min/max
          val stats = newFiles.map { rel =>
            rel -> FileStats.harvest(store.dataDir(ns, table) + "/" + rel)
          }.filter(_._2.nonEmpty).toMap
          val update =
            if (overwrite) MetadataUpdate.ReplaceFiles(newFiles, now, stats)
            else MetadataUpdate.AppendFiles(newFiles, now, stats)
          new Committer(store).commit(ns, table, Nil, Seq(update))
        }
      }
  }
}
