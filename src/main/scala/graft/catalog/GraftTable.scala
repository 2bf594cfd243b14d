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
object GraftTable {
  /** Field-id column resolution is scoped to OUR reads as a per-read
    * option rather than a session-conf mutation (a catalog read must
    * not change how unrelated parquet reads in the same session
    * resolve columns). File sources build their Hadoop conf via
    * `newHadoopConfWithOptions`, where read options override, and the
    * parquet schema converter reads the key from that conf — so the
    * option reaches both the v1 DataFrameReader and the
    * ParquetScanBuilder delegate paths. */
  private[catalog] val FieldIdReadKey = "spark.sql.parquet.fieldId.read.enabled"

  /** A DataFrameReader with field-id resolution on — REQUIRED before
    * reading delete files or pre-rename data files: a key column
    * renamed after the file was written resolves by id; by name it
    * would read all-null and silently corrupt delete application.
    *
    * Per-read scoping is impossible on the v1 reader: Spark's
    * ParquetFileFormat overwrites the field-id key in its per-read
    * Hadoop conf FROM the session conf (verified on 4.1 — the option
    * alone reads all-null), so this one choke point enables the session
    * conf lazily instead of scattering mutations per call site.
    * Semantically inert for everything else in the session: id-matching
    * engages only when the REQUESTED schema carries field-id metadata,
    * which plain `spark.read.parquet` schemas never do. Delegate scans
    * (every table/changelog scan) pass the key as a true per-read
    * option instead — [[fieldIdOptions]] — so they stay correct even in
    * sessions that never touched this path.
    *
    * A session that EXPLICITLY set the key to false is honored (never
    * silently overridden — r7 advice): keys then resolve by NAME,
    * which is identical unless a key column was renamed after its
    * delete files were written — that unsafe combination is refused by
    * [[requireRenameSafeNameReads]] at the scan/changelog entry points
    * (r8 advice). The lazy enable applies only when the session never
    * touched the key. */
  private[catalog] def idReader(s: SparkSession): org.apache.spark.sql.DataFrameReader = {
    val sc = s.sessionState.conf
    val explicitlyOff =
      sc.contains(FieldIdReadKey) && !sc.getConfString(FieldIdReadKey).toBoolean
    if (!explicitlyOff && !s.conf.get(FieldIdReadKey, "false").toBoolean)
      s.conf.set(FieldIdReadKey, "true")
    s.read.option(FieldIdReadKey, "true")
  }

  /** Enforcement for the explicit-off escape hatch above (r8 advice):
    * with field-id reads explicitly disabled, delete keys resolve by
    * NAME — if the schema history renamed a column whose id is among
    * the in-scope delete key ids, keys written before the rename would
    * silently match nothing and deleted rows would RESURRECT. Refuse
    * loudly instead of corrupting. `keyIds` is call-by-name so callers
    * pay its derivation (a metadata walk for changelog windows) only in
    * explicit-off sessions; empty keyIds ⇒ no equality-delete keys in
    * scope ⇒ nothing to guard. */
  private[catalog] def requireRenameSafeNameReads(
      s: SparkSession, meta: graft.meta.TableMetadata,
      keyIds: => Set[Int], what: String): Unit = {
    val sc = s.sessionState.conf
    val explicitlyOff =
      sc.contains(FieldIdReadKey) && !sc.getConfString(FieldIdReadKey).toBoolean
    if (!explicitlyOff) return
    val ids = keyIds
    if (ids.isEmpty) return
    val cur = graft.meta.SchemaBridge.idNames(meta.currentSchema)
    meta.schemas.foreach { sch =>
      graft.meta.SchemaBridge.idNames(sch).foreach { case (id, n) =>
        if (ids.contains(id))
          cur.get(id).filter(_ != n).foreach { cn =>
            throw new IllegalStateException(
              s"$what: $FieldIdReadKey is explicitly false in this session, " +
                s"forcing name-based key resolution, but delete-key column " +
                s"'$n' was renamed to '$cn' in the table's schema history — " +
                "keys written before the rename would match nothing and " +
                "deleted rows would resurrect. Re-enable field-id reads, or " +
                "compact the table to retire its delete files first.")
          }
      }
    }
  }

  /** `options` plus the field-id read key, for delegate scan builders. */
  private[catalog] def fieldIdOptions(
      options: CaseInsensitiveStringMap): CaseInsensitiveStringMap = {
    val m = new java.util.HashMap[String, String](options.asCaseSensitiveMap())
    m.put(FieldIdReadKey, "true")
    new CaseInsensitiveStringMap(m)
  }

  /** (dataDir + live position-delete paths) → marked data files; delete
    * files are immutable so entries never go stale. Every DML commit
    * changes the key, so a long-lived service accumulates entries —
    * reset past a generous bound (entries are manifest-scale; a reset
    * costs one re-derivation job per live table). */
  private val posMarkedCache =
    new java.util.concurrent.ConcurrentHashMap[String, Set[String]]()
  private[catalog] def posMarkedMemo(key: String, f: => Set[String]): Set[String] = {
    if (posMarkedCache.size > 1024) posMarkedCache.clear()
    posMarkedCache.computeIfAbsent(key, _ => f)
  }

  /** (file + live delete-file paths) → may the file hold a deleted key,
    * per its parquet blooms. Delete files are immutable, so entries
    * never go stale; compaction retires the keys. */
  private val bloomDirtyCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  private[catalog] def bloomDirtyMemo(key: String, f: => Boolean): Boolean = {
    if (bloomDirtyCache.size > (1 << 16)) bloomDirtyCache.clear()
    bloomDirtyCache.computeIfAbsent(key, _ => f)
  }

  /** Relative-path prefix of files registered by `add_files` — such
    * files carry NO parquet field ids, so every reader that builds a
    * requested schema must ask for them by name (see
    * [[graft.meta.SchemaBridge.stripFieldIds]]). Native write paths use
    * `commit-`/`compact-` prefixes; the namespaces never collide. */
  val ImportDirPrefix = "import-"
  def isImportedRel(rel: String): Boolean = rel.startsWith(ImportDirPrefix)

}

class GraftTable(tableName: String, private[graft] val store: MetaStore,
                 private[graft] val ns: Seq[String],
                 private[graft] val table: String,
                 private[graft] val meta: TableMetadata,
                 version: Int,
                 private[graft] val mergedProps: Map[String, String],
                 frozen: Boolean = false)
  extends Table with SupportsRead with SupportsWrite
  with org.apache.spark.sql.connector.catalog.SupportsDelete
  with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
  with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {

  override def name(): String = tableName

  /** `_graft_file` / `_graft_pos` — the physical row coordinate (see
    * [[PosDelta]]): queryable like any metadata column, and the row id
    * of the keyless merge-on-read DML path. */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    PosDelta.metadataColumns

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

  // no OVERWRITE_DYNAMIC: Spark has no V1-write fallback exec for the
  // OverwritePartitionsDynamic plan — dynamic semantics ride the V1
  // convention instead (partitionOverwriteMode=dynamic conf/option on
  // an overwrite, handled inside the write builder)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE)

  private def currentRelFiles: Seq[String] =
    meta.currentSnapshot.map(_.files).getOrElse(Nil)

  /** Incremental (changes-since) scan support: with a `from-version`
    * read option, the scan covers only files present in THIS version's
    * snapshot but absent from `from-version`'s — the append-oriented
    * "process only what arrived since my last run" read that turns a
    * full 100 TB rescan into the day's delta:
    * {{{ spark.read.option("from-version", "7").table("graft.ns.t") }}}
    * Snapshot file lists are cumulative under appends, so set
    * difference IS the delta; after an overwrite it degrades to "files
    * the overwrite introduced", never to wrong rows from removed files. */
  private def scanRelFiles(options: CaseInsensitiveStringMap): Seq[String] =
    Option(options.get("from-version")) match {
      case None => currentRelFiles
      // `latest` is the streaming tail-only baseline; as a batch delta
      // it is by definition empty
      case Some(fromV) if fromV.equalsIgnoreCase("latest") => Nil
      case Some(fromV) =>
        val v = try fromV.trim.toInt catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"read option from-version must be an integer metadata version, " +
              s"got '$fromV' (table $tableName)")
        }
        val from = store.loadVersion(ns, table, v)
        val baseline = from.currentSnapshot.map(_.files.toSet).getOrElse(Set.empty)
        currentRelFiles.filterNot(baseline)
    }

  /** Identity-partitioned column names (physical partition dirs exist). */
  private def identityPartCols: Seq[String] =
    SpecDerivation.identityPartCols(meta)

  private[graft] def transformPartSpecs: Seq[(String, String, String)] =
    SpecDerivation.transformPartSpecs(meta)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // explicit-off field-id sessions may not read renamed delete keys
    // by name (silent resurrect) — refuse up front, at the one scan
    // entry every batch read passes through
    GraftTable.requireRenameSafeNameReads(SparkSession.active, meta,
      meta.currentSnapshot.map(_.deleteFiles.flatMap(_.keyFieldIds).toSet)
        .getOrElse(Set.empty), s"scan of $tableName")
    new GraftScanBuilder(tableName, store.dataDir(ns, table), scanRelFiles(options),
      identityPartCols, schema(), options,
      meta.currentSnapshot.map(_.fileStats).getOrElse(Map.empty),
      transformPartSpecs,
      streamSource = Some((store, ns, table)),
      deleteFiles = meta.currentSnapshot.map(_.deleteFiles).getOrElse(Nil),
      fileSeqs = meta.currentSnapshot.map(_.fileSeqs).getOrElse(Map.empty),
      deleteByteBudget = MergeOnRead.byteBudget(mergedProps),
      bloomKeyCols = MergeOnRead.declaredBloomCols(mergedProps),
      sortedRels = sortedRelSet,
      declaredOrdering = declaredV2Ordering)
  }

  /** Live files PROVEN sorted under the current declared order: the
    * snapshot that added the file (its `fileSeqs` entry) carries the
    * matching `sorted-by` stamp. Files that predate the order, were
    * imported, or were laid out under a different order never match —
    * the conservative direction. */
  private def sortedRelSet: Set[String] =
    WriteShaping.sortStamp(meta.properties).get("sorted-by") match {
      case None => Set.empty
      case Some(stamp) =>
        val snap = meta.currentSnapshot
        val seqs = snap.map(_.fileSeqs).getOrElse(Map.empty)
        val byId = meta.snapshots.map(s => s.snapshotId -> s).toMap
        snap.map(_.files).getOrElse(Nil).filter { rel =>
          seqs.get(rel).flatMap(byId.get)
            .exists(_.summary.get("sorted-by").contains(stamp))
        }.toSet
    }

  /** The declared sort order as V2 SortOrder expressions (ASC → the
    * NULLS FIRST default, matching Spark's required ordering shape). */
  private def declaredV2Ordering
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}
    WriteShaping.sortStamp(meta.properties).get("sorted-by") match {
      case None => Array.empty
      case Some(stamp) => stamp.split(",").map { s =>
        val parts = s.split(" ")
        Expressions.sort(Expressions.column(parts(0)),
          if (parts.length > 1 && parts(1) == "desc") SortDirection.DESCENDING
          else SortDirection.ASCENDING)
      }
    }
  }

  // ---- merge-on-read join-fallback surface (see [[MorDeleteJoin]]) ----

  /** The loaded metadata version (`version()` is taken by the connector
    * Table trait's string-typed default). */
  private[graft] def metaVersion: Int = version

  private[graft] def liveDeleteFiles: Seq[graft.meta.DeleteFileDef] =
    meta.currentSnapshot.map(_.deleteFiles).getOrElse(Nil)

  private[graft] def morFileSeq(rel: String): Long =
    meta.currentSnapshot.map(_.fileSeqs).getOrElse(Map.empty)
      .getOrElse(rel, 0L)

  /** The scan's effective file list under `options` (from-version etc.)
    * — what the join rewrite must split into clean/dirty subsets. */
  private[graft] def effectiveRelFiles(options: CaseInsensitiveStringMap)
      : Seq[String] = scanRelFiles(options)

  /** Live delete files exceed the broadcast-class byte budget: the scan
    * must not collect their keys on the driver; the [[MorDeleteJoin]]
    * optimizer rule applies them as a distributed left-anti join. */
  private[graft] def morOverBudget: Boolean = {
    val ds = liveDeleteFiles
    ds.nonEmpty &&
      ds.map(MergeOnRead.estBytes).sum > MergeOnRead.byteBudget(mergedProps)
  }

  /** Data files named by any live POSITION-delete file — the dirty set
    * of the position-flavored join rewrite. One metadata-scale job
    * (distinct over the `file` column; bounded by the manifest's file
    * count no matter how many positions are marked), memoized across
    * table instances (delete files are immutable, so the live PATH SET
    * fully determines the answer — repeated plannings of an over-budget
    * table cost zero extra jobs). */
  private[graft] def posMarkedFiles: Set[String] = {
    val ds = liveDeleteFiles.filter(_.keyFieldIds.isEmpty)
    if (ds.isEmpty) Set.empty
    else {
      val dir = store.dataDir(ns, table)
      val key = dir + "\u0000" + ds.map(_.path).sorted.mkString("\u0000")
      GraftTable.posMarkedMemo(key,
        SparkSession.active.read.schema(PosDelta.deleteFileSchema)
          .parquet(ds.map(d => s"$dir/${d.path}"): _*)
          .select("file").distinct().collect().map(_.getString(0)).toSet)
    }
  }

  /** A read-only sibling of this table restricted to `rels`, with NO
    * delete application — the building block of the join rewrite (clean
    * subset keeps its vectorized scan; dirty subsets feed the anti
    * join). Stats/seqs are filtered to the subset so file pruning and
    * cardinality reports keep working. */
  private[graft] def fileSubsetTable(rels: Seq[String],
                                     keepDeletes: Boolean = false): GraftTable = {
    val relSet = rels.toSet
    val m2 = meta.copy(snapshots = meta.snapshots.map { s =>
      if (meta.currentSnapshotId.contains(s.snapshotId))
        // keepDeletes: a reader that must see the NET rows of the subset
        // (partition-scoped compaction) keeps the live delete files —
        // sequence scoping applies them to the subset exactly as to the
        // full table. The join-rewrite subsets pass false: they apply
        // deletes themselves.
        s.copy(files = s.files.filter(relSet),
          deleteFiles = if (keepDeletes) s.deleteFiles else Nil,
          fileStats = s.fileStats.filter { case (k, _) => relSet(k) },
          fileSeqs = s.fileSeqs.filter { case (k, _) => relSet(k) })
      else s
    })
    new GraftTable(tableName, store, ns, table, m2, version, mergedProps,
      frozen = true)
  }

  /** Partition-boundary metadata DELETE (`DELETE FROM t WHERE cat='b'`):
    * when every conjunct is an equality/IN on an identity-partitioned
    * column and every current file carries those dir keys, whole files
    * are provably all-match or all-miss — the delete is then a pure
    * snapshot commit that drops the matching files, no data rewrite.
    * Anything finer-grained refuses (canDeleteWhere false) rather than
    * approximating — Spark surfaces the refusal to the user. */
  private def deleteFilterCols(filters: Array[org.apache.spark.sql.sources.Filter])
      : Option[Seq[String]] = {
    import org.apache.spark.sql.sources._
    val decidable = PartitionDecidability.decidableIdentityCols(meta)
    def ok(c: String) = decidable(c)
    val cols = filters.map {
      case EqualTo(c, v) if v != null && ok(c) => Some(c)
      case EqualNullSafe(c, v) if v != null && ok(c) => Some(c)
      case In(c, vs) if vs.nonEmpty && vs.forall(_ != null) && ok(c) => Some(c)
      case _ => None
    }
    if (cols.forall(_.isDefined)) Some(cols.flatten.toSeq) else None
  }

  private def partitionBoundaryDeletable(
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    // with LIVE delete files the metadata fast path is unsound: its
    // ReplaceFiles(kept) commit carries no delete files forward, so
    // rows they mask in the KEPT files would silently resurrect. Refuse
    // — the row-level rewrite path handles the delete correctly (it
    // reads through the delete files), and compaction restores this
    // fast path.
    meta.currentSnapshot.forall(_.deleteFiles.isEmpty) &&
    (deleteFilterCols(filters) match {
      case None => false
      case Some(cols) =>
        // every file must be decidable: it carries a dir value for every
        // referenced column (files from a pre-partitioning spec don't)
        currentRelFiles.forall { rel =>
          val kvs = PartitionDirs.kvs(rel)
          cols.forall(kvs.contains)
        }
    })

  /** Keyless merge-on-read DELETE eligibility: the table asks for
    * merge-on-read deletes but declares NO identifier fields (so the
    * equality-delete delta path has no row id), the whole condition
    * converts to column expressions, and any live deletes are position
    * flavored too. Spark's metadata-only-delete optimization then routes
    * the DELETE here instead of the copy-on-write rewrite, and
    * [[positionDeleteWhere]] marks (file, position) pairs — kilobytes
    * committed, zero data files rewritten. */
  private def positionDeletable(
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    MergeOnRead.morMode(mergedProps, "delete") &&
    !mergedProps.get("identifier-fields").exists(_.trim.nonEmpty) &&
    meta.currentSnapshot.forall(_.deleteFiles.forall(_.keyFieldIds.isEmpty)) &&
    filters.forall(f => filterToColumn(f).isDefined)

  override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    !frozen && (partitionBoundaryDeletable(filters) || positionDeletable(filters))

  /** Rebuild a V1 filter as a Column expression (the position-delete
    * path evaluates the DELETE condition with the engine's own codegen'd
    * expressions — no UDF). None = shape we don't translate. */
  private def filterToColumn(f: org.apache.spark.sql.sources.Filter)
      : Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.sources._
    import org.apache.spark.sql.functions._
    f match {
      case EqualTo(c, v) => Some(col(c) === lit(v))
      case EqualNullSafe(c, v) => Some(col(c) <=> lit(v))
      case GreaterThan(c, v) => Some(col(c) > lit(v))
      case GreaterThanOrEqual(c, v) => Some(col(c) >= lit(v))
      case LessThan(c, v) => Some(col(c) < lit(v))
      case LessThanOrEqual(c, v) => Some(col(c) <= lit(v))
      case In(c, vs) => Some(col(c).isInCollection(vs.toSeq))
      case IsNull(c) => Some(col(c).isNull)
      case IsNotNull(c) => Some(col(c).isNotNull)
      case StringStartsWith(c, v) => Some(col(c).startsWith(v))
      case StringEndsWith(c, v) => Some(col(c).endsWith(v))
      case StringContains(c, v) => Some(col(c).contains(v))
      case And(l, r) =>
        for { a <- filterToColumn(l); b <- filterToColumn(r) } yield a && b
      case Or(l, r) =>
        for { a <- filterToColumn(l); b <- filterToColumn(r) } yield a || b
      case Not(x) => filterToColumn(x).map(!_)
      case _: AlwaysTrue => Some(lit(true))
      case _: AlwaysFalse => Some(lit(false))
      case _ => None
    }
  }

  /** Position-delete DELETE for keyless merge-on-read tables: read the
    * manifest-pruned candidate files through Spark's split-safe
    * `_metadata.row_index`, evaluate the condition, and commit the
    * matched (file, position) pairs as position-delete parquet in one
    * RowDelta — a DELETE touching 0.01% of a 100 TB table commits
    * kilobytes. Readers subtract positions ([[PosFilteringReader]]);
    * compaction folds them away. */
  private def positionDeleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = SparkSession.active
    val dataDir = store.dataDir(ns, table)
    // candidate files through the same manifest pruning a scan performs
    val probe = new GraftScanBuilder(tableName, dataDir, currentRelFiles,
      identityPartCols, schema(), CaseInsensitiveStringMap.empty(),
      meta.currentSnapshot.map(_.fileStats).getOrElse(Map.empty),
      transformPartSpecs)
    probe.pushFilters(filters)
    val candidates = probe.prunedRelFiles
    if (candidates.isEmpty) return // provably nothing to delete
    val cond = filters.flatMap(filterToColumn).reduceOption(_ && _)
      .getOrElse(lit(true))
    val esc = dataDir.replace("'", "\\'")
    val marked = GraftTable.idReader(spark).schema(schema())
      .parquet(candidates.map(r => s"$dataDir/$r"): _*)
      .where(cond)
      .select(col("_metadata.file_path").as("file"),
        col("_metadata.row_index").as("pos"))
      // absolute read URI → manifest-relative path
      .select(expr(
        s"substring(file, locate('$esc/', file) + ${dataDir.length + 1})")
        .as("file"), col("pos"))
    val commitId = java.util.UUID.randomUUID().toString
    val relDir = s"commit-posdel-$commitId-deletes"
    val deletesDir = s"$dataDir/$relDir"
    marked.write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
      .parquet(deletesDir)
    val rels = store.listParquetUnder(deletesDir).map(f => s"$relDir/$f")
    val hconf = spark.sessionState.newHadoopConf()
    val (defs, empty) = rels.map { rel =>
      graft.meta.DeleteFileDef(rel, 0L, Nil,
        graft.meta.FileStats.rowCount(s"$dataDir/$rel", hconf).getOrElse(0L),
        store.fileSizeBytes(s"$dataDir/$rel").getOrElse(0L))
    }.partition(_.rows > 0)
    empty.foreach(d => store.deleteFileIfExists(s"$dataDir/${d.path}"))
    if (defs.isEmpty) { store.deleteTree(deletesDir); return } // no match
    try store.commitOps(ns, table,
      // positions were computed from exactly this snapshot — a racing
      // commit must fail the delete, never compose with a stale read
      Seq(graft.commit.Requirement.AssertCurrentSnapshotId(meta.currentSnapshotId)),
      Seq(MetadataUpdate.RowDelta(Nil, defs.toList, System.currentTimeMillis(),
        Map.empty,
        Map("position-delete-rows" -> defs.map(_.rows).sum.toString))))
    catch { case e: Throwable =>
      rels.foreach(rel => store.deleteFileIfExists(s"$dataDir/$rel"))
      throw e
    }
  }

  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    import org.apache.spark.sql.sources._
    if (!partitionBoundaryDeletable(filters)) {
      require(positionDeletable(filters),
        "delete not decidable on partition boundaries")
      positionDeleteWhere(filters)
      return
    }
    def fileMatches(rel: String): Boolean = {
      val kvs = PartitionDirs.kvs(rel)
      filters.forall {
        case EqualTo(c, v) => kvs(c) == String.valueOf(v)
        case EqualNullSafe(c, v) => kvs(c) == String.valueOf(v)
        case In(c, vs) => vs.map(String.valueOf).contains(kvs(c))
        case _ => false
      }
    }
    val kept = currentRelFiles.filterNot(fileMatches)
    val dropped = currentRelFiles.size - kept.size
    val keptStats = meta.currentSnapshot.map(_.fileStats).getOrElse(Map.empty)
      .view.filterKeys(kept.toSet).toMap
    // guarded by the snapshot this table instance scanned: a racing
    // append must fail the delete (and be retried) rather than having
    // its files silently discarded by our ReplaceFiles
    store.commitOps(ns, table,
      Seq(graft.commit.Requirement.AssertCurrentSnapshotId(meta.currentSnapshotId)),
      Seq(MetadataUpdate.ReplaceFiles(kept.toList, System.currentTimeMillis(),
        keptStats, Map("deleted-files" -> dropped.toString))))
  }

  /** Copy-on-write DELETE / UPDATE / MERGE — see
    * [[GraftRowLevelOperation]]. SupportsDelete above stays the fast
    * path: Spark converts a rewritten DELETE back to the metadata-only
    * commit whenever [[canDeleteWhere]] accepts it. */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    if (frozen) throw new UnsupportedOperationException(
      "cannot mutate a time-travel snapshot")
    val cmdName = info.command() match {
      case org.apache.spark.sql.connector.write.RowLevelOperation.Command.DELETE =>
        "delete"
      case org.apache.spark.sql.connector.write.RowLevelOperation.Command.UPDATE =>
        "update"
      case _ => "merge"
    }
    () => {
      // merge-on-read needs a row id: declared identifier fields take
      // the equality-delete delta path; a keyless table uses the
      // physical (file, pos) coordinate instead — position-delete delta
      // ([[GraftPositionDeltaOperation]]), valid only while every live
      // delete is position-flavored. For a DELETE whose condition
      // converts to filters, Spark's metadata-only-delete optimization
      // still swaps the rewritten plan for [[positionDeleteWhere]]
      // (split-safe pushdown read, position marks, no rewrite).
      val mor = MergeOnRead.morMode(mergedProps, cmdName)
      if (mor && mergedProps.get("identifier-fields").exists(_.trim.nonEmpty))
        new GraftDeltaOperation(store, ns, table, tableName, meta,
          info.command(), mergedProps)
      else if (mor &&
          meta.currentSnapshot.forall(_.deleteFiles.forall(_.keyFieldIds.isEmpty)))
        new GraftPositionDeltaOperation(store, ns, table, tableName, meta,
          info.command(), mergedProps)
      else new GraftRowLevelOperation(store, ns, table, tableName, meta,
        info.command())
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    if (frozen) throw new UnsupportedOperationException(
      "cannot write to a time-travel snapshot")
    // write options prefixed `summary.` become snapshot-summary entries
    // (df.writeTo(t).option("summary.k", "v").append()) — the carrier
    // the exactly-once streaming sink uses for its batch-id watermark.
    // NOTE: CaseInsensitiveStringMap lowercases keys, so summary keys
    // land lowercased; writers must use lowercase keys on the read side.
    val extraSummary = info.options.asScala.collect {
      case (k, v) if k.startsWith("summary.") => k.stripPrefix("summary.") -> v
    }.toMap
    // `require-summary-max-below.<key>` = v attaches an idempotence
    // fence checked INSIDE the commit loop (see AssertMaxSummaryBelow)
    val requirements = info.options.asScala.collect {
      case (k, v) if k.startsWith("require-summary-max-below.") =>
        graft.commit.Requirement.AssertMaxSummaryBelow(
          k.stripPrefix("require-summary-max-below."), v.toLong)
    }.toSeq
    // the V1 dynamic-overwrite convention: with
    // partitionOverwriteMode=dynamic (write option beats session conf),
    // a full-table overwrite replaces only the partitions the new data
    // touches — "reprocess whatever days this batch carries"
    val dynamicOverwrite = Option(info.options.get("partitionOverwriteMode"))
      .map(_.equalsIgnoreCase("dynamic"))
      .getOrElse(org.apache.spark.sql.internal.SQLConf.get.partitionOverwriteMode ==
        org.apache.spark.sql.internal.SQLConf.PartitionOverwriteMode.DYNAMIC)
    new GraftWriteBuilder(store, ns, table, extraSummary, requirements,
      dynamicOverwrite, info, Option(info.options.get("branch")))
  }
}

/** The physical side of the hidden-partitioning vocabulary: every
  * non-identity transform maps to (a) a write-side dir-value expression
  * and (b) a driver-side replay of that expression on a pushed literal,
  * so scans prune whole partition dirs without ever materializing the
  * transform as a user-visible column (identity rides the source column
  * directly).
  *
  * Temporal replay covers the timezone-independent types (DateType /
  * TimestampNTZType) unconditionally. TimestampType (an instant) renders
  * its dir value through the SESSION timezone, so both the write-side
  * layout and the read-side replay are gated on the session being
  * pinned UTC (the driver contract): a non-UTC writer lays out no
  * temporal dirs for instants and a non-UTC reader never prunes them —
  * the two sides can therefore never disagree (a wrong prune silently
  * drops rows; skipping one is only slower). */
private[graft] object PartitionTransforms {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types._

  private val BucketRe = "bucket\\[(\\d+)\\]".r
  private val TruncRe = "truncate\\[(\\d+)\\]".r

  /** The session renders instants in UTC (modulo alias zone ids). */
  private def sessionIsUtc: Boolean = try {
    java.time.ZoneId.of(
      org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
      .normalized() == java.time.ZoneOffset.UTC
  } catch { case _: Exception => false }

  /** Monotone transforms: source order implies dir-value order under
    * [[cmpDir]] — the precondition for range pruning. */
  def isMonotone(transform: String): Boolean = transform match {
    case "year" | "month" | "day" | "hour" => true
    case TruncRe(_) => true
    case _ => false
  }

  // the exact shapes the write-side formatters emit for in-range years;
  // anything else (e.g. the '+52972-06' EXCEEDS_PAD form date_format
  // produces past year 9999) is NOT lexicographically ordered against
  // the 4-digit form and must never participate in a prune decision
  private val MonthDirRe = "\\d{4}-\\d{2}".r
  private val DayDirRe = "\\d{4}-\\d{2}-\\d{2}".r
  private val HourDirRe = "\\d{4}-\\d{2}-\\d{2}-\\d{2}".r
  private def wellFormed(transform: String, v: String): Boolean = transform match {
    case "month" => MonthDirRe.matches(v)
    case "day" => DayDirRe.matches(v)
    case "hour" => HourDirRe.matches(v)
    case _ => true
  }

  /** Public face of [[wellFormed]] for the key-grouped dir parser. */
  def wellFormedDir(transform: String, v: String): Boolean =
    wellFormed(transform, v)

  /** Order two dir values of a monotone transform. Temporal formats are
    * zero-padded fixed-width (lexicographic-safe) except bare `year`,
    * which compares numerically; numeric truncates likewise. None =
    * incomparable (never prune on it) — including any dir value outside
    * the fixed-width year-1..9999 shape. */
  def cmpDir(transform: String, dt: DataType, a: String, b: String): Option[Int] =
    transform match {
      case "year" => try Some(java.lang.Long.compare(a.toLong, b.toLong))
        catch { case _: NumberFormatException => None }
      case "month" | "day" | "hour" =>
        if (wellFormed(transform, a) && wellFormed(transform, b))
          Some(a.compareTo(b))
        else None
      case TruncRe(_) => dt match {
        case IntegerType | LongType =>
          try Some(java.lang.Long.compare(a.toLong, b.toLong))
          catch { case _: NumberFormatException => None }
        case StringType =>
          // unsigned UTF-8 byte order — the order Spark compares string
          // ROWS in (UTF8String), which prefix truncation preserves;
          // UTF-16 String.compareTo disagrees above U+E000
          val u = java.nio.charset.StandardCharsets.UTF_8
          Some(java.util.Arrays.compareUnsigned(a.getBytes(u), b.getBytes(u)))
        case _ => None
      }
      case _ => None
    }

  /** Write-side dir-value expression; None = no physical layout. */
  def dirExpr(transform: String, src: String, dt: DataType): Option[Column] = {
    // instants render via the session TZ: only lay out temporal dirs
    // when that's UTC, so the (UTC-gated) replay reads them correctly
    def temporalLayoutOk = dt != TimestampType || sessionIsUtc
    transform match {
      case BucketRe(n) => Some(pmod(hash(col(src)), lit(n.toInt)))
      case TruncRe(n) => dt match {
        case StringType => Some(substring(col(src), 1, n.toInt))
        case IntegerType | LongType => Some(col(src) - pmod(col(src), lit(n.toLong)))
        case _ => None
      }
      case "year" if temporalLayoutOk  => Some(year(col(src)))
      case "month" if temporalLayoutOk => Some(date_format(col(src), "yyyy-MM"))
      case "day" if temporalLayoutOk   => Some(date_format(col(src), "yyyy-MM-dd"))
      case "hour" if temporalLayoutOk  => Some(date_format(col(src), "yyyy-MM-dd-HH"))
      case _ => None
    }
  }

  /** The session's UTC decision, for callers that must capture it on the
    * driver and replay values on executors (the row-level rewrite
    * writer): executor-side SQLConf fallback must never decide layout. */
  private[graft] def sessionUtc: Boolean = sessionIsUtc

  /** Driver-side replay on a pushed literal → the dir value an equal row
    * was written under; None = can't replay safely (never prune). */
  def dirValueOf(transform: String, v: Any, dt: DataType): Option[String] =
    dirValueOf(transform, v, dt, sessionIsUtc)

  /** [[dirValueOf]] with the session-UTC decision passed explicitly —
    * evaluate it on the driver when the replay runs inside tasks. */
  def dirValueOf(transform: String, v: Any, dt: DataType,
                 utcSession: Boolean): Option[String] = try {
    import java.time.{LocalDate, LocalDateTime}
    // java.sql.Date/Timestamp literals are REBASED by Spark between the
    // hybrid Julian calendar (their definition) and the proleptic
    // Gregorian one the engine computes in; below the 1582 cutover the
    // rebase is not the identity, so toInstant/toLocalDate land days
    // away from the write-side dir value. Refuse those — never prune on
    // a literal the two calendars disagree about. (java.time literals
    // convert exactly and carry no bound beyond temporalOk's 1..9999.)
    def gregorianSafe(t: LocalDateTime): Option[LocalDateTime] =
      Some(t).filter(_.getYear >= 1583)
    def asLocalDateTime: Option[LocalDateTime] = v match {
      case d: java.sql.Date => gregorianSafe(d.toLocalDate.atStartOfDay)
      case d: LocalDate => Some(d.atStartOfDay)
      // instant literals (TimestampType): UTC wall time, explicitly —
      // never the JVM default zone (only reached when utcSession)
      case t: java.sql.Timestamp if dt == TimestampType =>
        gregorianSafe(t.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDateTime)
      case t: java.time.Instant =>
        Some(t.atZone(java.time.ZoneOffset.UTC).toLocalDateTime)
      case t: java.sql.Timestamp => gregorianSafe(t.toLocalDateTime)
      case t: LocalDateTime => Some(t)
      case _ => None
    }
    // years outside 1..9999 never replay: the write-side formatter
    // switches to a signed EXCEEDS_PAD form ('+52972', era years for BC)
    // that our fixed-width replay would mismatch — a replay disagreement
    // is a silently-dropped row, so such literals simply never prune
    def temporalOk = (dt == DateType || dt == TimestampNTZType ||
      (dt == TimestampType && utcSession)) &&
      asLocalDateTime.forall(t => t.getYear >= 1 && t.getYear <= 9999)
    transform match {
      case BucketRe(n) =>
        import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
        // UnsafeRow normalizes -0.0 to 0.0 on write, so stored rows hash
        // the +0.0 bit pattern; a raw -0.0 literal would hash differently
        // and wrongly prune the file holding its IEEE-equal rows
        val canon: Any = v match {
          case d: java.lang.Double if d.doubleValue() == 0.0 =>
            java.lang.Double.valueOf(0.0)
          case f: java.lang.Float if f.floatValue() == 0.0f =>
            java.lang.Float.valueOf(0.0f)
          case other => other
        }
        val h = new Murmur3Hash(Seq(Literal.create(canon, dt)), 42)
          .eval(null).asInstanceOf[Int]
        Some((((h % n.toInt) + n.toInt) % n.toInt).toString)
      case TruncRe(n) => dt match {
        case StringType =>
          // codepoint prefix, matching write-side substring semantics
          // (String.take counts UTF-16 units and would split surrogate
          // pairs into a dir value that was never written)
          val s = String.valueOf(v)
          val end = s.offsetByCodePoints(0, math.min(n.toInt, s.codePointCount(0, s.length)))
          Some(s.substring(0, end))
        case IntegerType | LongType =>
          val x = v.asInstanceOf[Number].longValue()
          Some((x - java.lang.Math.floorMod(x, n.toLong)).toString)
        case _ => None
      }
      case "year" if temporalOk => asLocalDateTime.map(_.getYear.toString)
      case "month" if temporalOk =>
        asLocalDateTime.map(t => f"${t.getYear}%04d-${t.getMonthValue}%02d")
      case "day" if temporalOk =>
        asLocalDateTime.map(t =>
          f"${t.getYear}%04d-${t.getMonthValue}%02d-${t.getDayOfMonth}%02d")
      case "hour" if temporalOk =>
        asLocalDateTime.map(t =>
          f"${t.getYear}%04d-${t.getMonthValue}%02d-${t.getDayOfMonth}%02d-${t.getHour}%02d")
      case _ => None
    }
  } catch { case _: Exception => None }
}

/** Which identity-partitioned columns can DECIDE partition-boundary
  * mutations (DELETE / filtered overwrite): (a) the String rendering of
  * a literal must be byte-identical to the partition-dir rendering —
  * true for string/int/long/boolean, NOT for timestamps (dir
  * '2020-01-01 00:00:00' vs Timestamp.toString '…00.0' — a mismatch
  * silently no-ops the mutation) — and (b) the column NAME was never
  * reused for a different field id in any schema version (after rename
  * + name-reuse, old files' `__part_<name>` dirs hold another column's
  * values; matching by bare name would mutate the wrong files — same
  * rename discipline as the stats/bucket guards). */
/** The ONE derivation of scan-relevant partition-spec fields from table
  * metadata, shared by the table scan and BOTH row-level operations
  * (copy-on-write and merge-on-read). Centralized because the safety
  * filter below is load-bearing: a scan built from a copy that lost it
  * would wrongly prune files and silently miss rows. */
private[graft] object SpecDerivation {
  import graft.meta.TableMetadata

  /** Identity-partitioned column names (physical partition dirs exist). */
  def identityPartCols(meta: TableMetadata): Seq[String] = {
    val nameById = meta.currentSchema.fields.map(f => f.id -> f.name).toMap
    meta.specs.find(_.specId == meta.defaultSpecId).map(_.fields).getOrElse(Nil)
      .filter(_.transform == "identity").flatMap(f => nameById.get(f.sourceId))
  }

  /** Non-identity spec fields as (sourceCol, transform, dirKeyName).
    * A bucket column whose type ever CHANGED across schema versions is
    * excluded: Murmur3's hash family depends on the input type (hashInt
    * vs hashLong), so files written under the old type live in dirs the
    * current-type replay would never compute — pruning them would
    * silently drop rows. (Other transforms replay on the VALUE, which
    * widening preserves.) */
  def transformPartSpecs(meta: TableMetadata): Seq[(String, String, String)] = {
    val nameById = meta.currentSchema.fields.map(f => f.id -> f.name).toMap
    def typeStable(fieldId: Int): Boolean =
      meta.schemas.flatMap(_.fields.filter(_.id == fieldId).map(_.`type`))
        .distinct.size <= 1
    meta.specs.find(_.specId == meta.defaultSpecId).map(_.fields).getOrElse(Nil)
      .filter(_.transform != "identity")
      .filter(f => !f.transform.startsWith("bucket[") || typeStable(f.sourceId))
      .flatMap(f => nameById.get(f.sourceId).map(src => (src, f.transform, f.name)))
  }
}

private[graft] object PartitionDecidability {
  def decidableIdentityCols(meta: TableMetadata): Set[String] = {
    val nameById = meta.currentSchema.fields.map(f => f.id -> f.name).toMap
    meta.specs.find(_.specId == meta.defaultSpecId).map(_.fields).getOrElse(Nil)
      .filter(_.transform == "identity")
      .flatMap(f => nameById.get(f.sourceId))
      .filter { c =>
        meta.currentSchema.fields.find(_.name == c).exists { f =>
          Set("string", "int", "long", "boolean").contains(f.`type`) &&
            meta.schemas.forall(_.fields.filter(_.name == c).forall(_.id == f.id))
        }
      }.toSet
  }
}

/** Partition-directory key/values of a manifest path. Dir values are
  * Hive-escaped by partitionBy (':' → '%3A' etc.); unescape before
  * comparing with raw replayed literals, or a value containing any
  * escaped character would wrongly prune (or wrongly delete) its own
  * file. Shared by the scan-side pruner and the metadata DELETE path. */
private[graft] object PartitionDirs {
  def kvs(rel: String): Map[String, String] =
    rel.split("/").iterator
      .filter(_.startsWith("__part_")).flatMap { seg =>
        seg.stripPrefix("__part_").split("=", 2) match {
          case Array(k, v) => Some(k ->
            org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName(v))
          case _ => None
        }
      }.toMap
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
    transformSpecs: Seq[(String, String, String)] = Nil,
    streamSource: Option[(graft.meta.MetaStore, Seq[String], String)] = None,
    groupPruneOnly: Boolean = false,
    onBuild: Seq[String] => Unit = _ => (),
    deleteFiles: Seq[graft.meta.DeleteFileDef] = Nil,
    fileSeqs: Map[String, Long] = Map.empty,
    deleteByteBudget: Long = MergeOnRead.DefaultDeleteByteBudget,
    bloomKeyCols: Set[String] = Set.empty,
    sortedRels: Set[String] = Set.empty,
    declaredOrdering: Array[org.apache.spark.sql.connector.expressions.SortOrder] =
      Array.empty)
  extends ScanBuilder
  with org.apache.spark.sql.connector.read.SupportsPushDownFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
  with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  import org.apache.spark.sql.sources._

  private var pushed: Array[Filter] = Array.empty
  private var requiredSchema: StructType = tableSchema
  // the full requested schema when it includes `_graft_file`/
  // `_graft_pos` metadata columns — flips build() to the
  // position-emitting scan ([[PosDeltaScan]])
  private var requestedWithMeta: Option[StructType] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    // everything is also kept as a residual: pruning is best-effort and
    // the delegate re-checks row groups + rows
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(required: StructType): Unit = {
    // a data column that shadows a metadata name stays data (Spark's
    // metadataOutput already excludes the conflicting metadata column)
    val (metaCols, dataCols) = required.fields.partition(f =>
      PosDelta.names.contains(f.name) && !tableSchema.fieldNames.contains(f.name))
    if (metaCols.nonEmpty) {
      requestedWithMeta = Some(required)
      requiredSchema = StructType(dataCols)
    } else {
      requestedWithMeta = None
      requiredSchema = if (required.isEmpty) tableSchema else required
    }
    // with a pushed aggregation the delegate owns the (aggregate) read
    // schema — forward the engine's pruning call to it verbatim
    aggDelegate.foreach(_.pruneColumns(required))
  }

  /** COUNT/MIN/MAX pushdown: forwarded to a parquet delegate builder
    * over the PRUNED file list, which answers them from footer metadata
    * — `SELECT count(*) FROM t` on a 100 TB table reads footers, never
    * data. Refused whenever rows could differ from the footers' view:
    * live equality-delete files (masked rows would be counted), filters
    * (the delegate refuses those itself), or a row-level rewrite scan. */
  private var aggDelegate: Option[
    org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder] =
    None

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean =
    aggDelegate.exists(_.supportCompletePushDown(agg))

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    if (groupPruneOnly || deleteFiles.nonEmpty) return false
    // hive-imported partitioned files answer identity columns from
    // DIRS, not footers — a footer-metadata MIN/MAX would see nulls
    if (prunedRelFiles.exists(r => GraftTable.isImportedRel(r) &&
        PartitionDirs.kvs(r).nonEmpty)) return false
    val probe = mkDelegateBuilder(prunedRelFiles)
    probe.pushFilters(pushed.toSeq.flatMap(toCatalyst))
    val ok = probe.pushAggregation(agg)
    if (ok) aggDelegate = Some(probe)
    ok
  }

  private val transformBySrc: Map[String, (String, String)] =
    transformSpecs.map { case (src, tr, name) => src -> (tr, name) }.toMap

  /** Replay a transform on a pushed literal via [[PartitionTransforms]]. */
  private def dirValueOf(c: String, transform: String, v: Any): Option[String] =
    tableSchema.fields.find(_.name == c)
      .flatMap(f => PartitionTransforms.dirValueOf(transform, v, f.dataType))

  /** Identity pruning compares String.valueOf(literal) with the file's
    * unescaped dir value — only valid for types whose renderings are
    * byte-identical. Timestamps/dates/decimals render differently
    * (Timestamp.toString appends '.0'; dir values carry no fraction), so
    * constraining on them would WRONGLY PRUNE the matching file —
    * silently dropped rows. Those types simply never constrain. */
  private def exactRenderIdentity(c: String): Boolean =
    tableSchema.fields.find(_.name == c).map(_.dataType).exists {
      case org.apache.spark.sql.types.StringType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.BooleanType => true
      case _ => false
    }

  /** Allowed value sets per partition-DIRECTORY key from the pushed
    * filters (conjunctive): identity columns match their own value,
    * transform columns match the replayed dir value. None = unconstrained. */
  private def allowedValues: Map[String, Set[String]] = {
    val acc = scala.collection.mutable.Map.empty[String, Set[String]]
    def intersect(c: String, vs: Set[String]): Unit =
      acc(c) = acc.get(c).map(_.intersect(vs)).getOrElse(vs)
    def transformHit(c: String, v: Any): Unit = transformBySrc.get(c).foreach {
      case (tr, dirKey) => dirValueOf(c, tr, v).foreach(d => intersect(dirKey, Set(d)))
    }
    def identCol(c: String): Boolean = partCols.contains(c) && exactRenderIdentity(c)
    pushed.foreach {
      case EqualTo(c, v) if identCol(c) => intersect(c, Set(String.valueOf(v)))
      case EqualTo(c, v) if transformBySrc.contains(c) => transformHit(c, v)
      case EqualNullSafe(c, v) if identCol(c) && v != null =>
        intersect(c, Set(String.valueOf(v)))
      case EqualNullSafe(c, v) if transformBySrc.contains(c) && v != null =>
        transformHit(c, v)
      case In(c, vs) if identCol(c) =>
        intersect(c, vs.filter(_ != null).map(String.valueOf).toSet)
      case In(c, vs) if transformBySrc.contains(c) =>
        transformBySrc.get(c).foreach { case (tr, dirKey) =>
          val dirs = vs.filter(_ != null).flatMap(v => dirValueOf(c, tr, v))
          // only prune if EVERY literal replayed (a missed conversion
          // must not narrow the allowed set)
          if (dirs.length == vs.count(_ != null)) intersect(dirKey, dirs.toSet)
        }
      case _ => ()
    }
    acc.toMap
  }

  private def partitionAllows(rel: String, allowed: Map[String, Set[String]]): Boolean = {
    val kvs = PartitionDirs.kvs(rel)
    allowed.forall { case (c, vs) =>
      // file without the dir key: keep. On a TRANSFORM dir key the Hive
      // default-partition marker also always keeps: it means "null OR
      // unrenderable" (the row-level rewrite writes it for values its
      // replay can't render), so constraining on it could prune real
      // rows. On an IDENTITY key the marker can only mean NULL (both
      // writers render every non-null exact-render value), and the
      // equality/IN constraints here never match null rows — pruning
      // null-partition files on identity keys stays valid.
      kvs.get(c).forall(v =>
        (!partCols.contains(c) &&
          v == org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .DEFAULT_PARTITION_NAME) || vs.contains(v))
    }
  }

  /** Inclusive [lo, hi] dir-value bounds per partition-directory key,
    * from pushed RANGE filters on monotone-transformed source columns —
    * this is what makes `ts >= a AND ts < b` on an hour/day-partitioned
    * events table skip whole directories. A strict bound stays inclusive
    * at dir granularity (the boundary dir still holds qualifying rows);
    * incomparable dir values never tighten anything. */
  private def allowedDirRanges
      : Map[String, (String, org.apache.spark.sql.types.DataType,
                     Option[String], Option[String])] = {
    val acc = scala.collection.mutable.Map.empty[
      String, (String, org.apache.spark.sql.types.DataType, Option[String], Option[String])]
    def hit(c: String, v: Any, isLower: Boolean): Unit =
      transformBySrc.get(c).foreach { case (tr, dirKey) =>
        if (PartitionTransforms.isMonotone(tr))
          for {
            dt <- tableSchema.fields.find(_.name == c).map(_.dataType)
            d <- PartitionTransforms.dirValueOf(tr, v, dt)
          } {
            val (t0, dt0, lo, hi) = acc.getOrElse(dirKey, (tr, dt, None, None))
            def tighter(cur: Option[String], keepIfCmp: Int => Boolean): Option[String] =
              cur match {
                case None => Some(d)
                case Some(x) => PartitionTransforms.cmpDir(tr, dt, d, x) match {
                  case Some(cmp) if keepIfCmp(cmp) => Some(d)
                  case _ => cur
                }
              }
            acc(dirKey) =
              if (isLower) (t0, dt0, tighter(lo, _ > 0), hi) // max of lowers
              else (t0, dt0, lo, tighter(hi, _ < 0))         // min of uppers
          }
      }
    pushed.foreach {
      case GreaterThan(c, v) => hit(c, v, isLower = true)
      case GreaterThanOrEqual(c, v) => hit(c, v, isLower = true)
      case LessThan(c, v) => hit(c, v, isLower = false)
      case LessThanOrEqual(c, v) => hit(c, v, isLower = false)
      case _ => ()
    }
    acc.toMap
  }

  private def rangeAllows(
      rel: String,
      ranges: Map[String, (String, org.apache.spark.sql.types.DataType,
                           Option[String], Option[String])]): Boolean =
    ranges.isEmpty || {
      val kvs = PartitionDirs.kvs(rel)
      ranges.forall { case (key, (tr, dt, lo, hi)) =>
        kvs.get(key).forall { d => // file without the dir key: keep
          // the default-partition marker never participates in a range
          // decision (same null-or-unrenderable reasoning as equality)
          d == org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .DEFAULT_PARTITION_NAME ||
          (lo.forall(l => PartitionTransforms.cmpDir(tr, dt, d, l).forall(_ >= 0)) &&
           hi.forall(h => PartitionTransforms.cmpDir(tr, dt, d, h).forall(_ <= 0)))
        }
      }
    }

  /** Typed compare of a manifest stat string against a filter value,
    * driven by the table schema. None = incomparable (never prune).
    * Strings compare as UNSIGNED UTF-8 bytes — the order parquet chose
    * the harvested min/max under; UTF-16 `String.compareTo` disagrees
    * for [U+E000, U+FFFF] vs supplementary characters and would prune
    * files that DO hold the filtered value. */
  private def cmp(col: String, stat: String, v: Any): Option[Int] = try {
    import org.apache.spark.sql.types._
    tableSchema.fields.find(_.name == col).map(_.dataType) match {
      case Some(IntegerType | LongType) =>
        Some(java.lang.Long.compare(stat.toLong, String.valueOf(v).toLong))
      case Some(FloatType | DoubleType) =>
        Some(java.lang.Double.compare(stat.toDouble, String.valueOf(v).toDouble))
      case Some(StringType) if v != null =>
        val u = java.nio.charset.StandardCharsets.UTF_8
        Some(java.util.Arrays.compareUnsigned(
          stat.getBytes(u), v.toString.getBytes(u)))
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
    val ranges = allowedDirRanges
    relFiles
      .filter(rel => allowed.isEmpty || partitionAllows(rel, allowed))
      .filter(rangeAllows(_, ranges))
      .filter(statsAllow)
  }

  /** Manifest-stats row sum of exactly the files [[prunedRelFiles]]
    * keeps under the CURRENT pushed filters: the builder already holds
    * every file's harvested row count (`fileStats`), so the bound is a
    * pure driver-side fold — no `$files` inspection read, no job.
    * None when any surviving file lacks a stamped count (pre-upgrade
    * metadata) — callers must then assume unbounded. With live MoR
    * delete files the sum counts masked rows too, i.e. it stays a
    * sound UPPER bound on returned rows, which is all its consumer
    * ([[graft.llm.AnnIndex.prunedRowBound]]) prices with. */
  private[graft] def prunedManifestRows: Option[Long] = {
    val pruned = prunedRelFiles
    val counts = pruned.map(r =>
      fileStats.get(r).flatMap(_.headOption).flatMap(_.rows))
    if (pruned.isEmpty) Some(0L)
    else if (counts.forall(_.isDefined)) Some(counts.flatten.sum)
    else None
  }

  /** Rebuild a Catalyst predicate from a pushed v1 filter, resolved
    * against the table schema. Partial coverage is safe: a filter that
    * doesn't convert simply isn't offered to the delegate for row-group
    * skipping — it is still enforced by the residual Spark keeps above
    * the scan (pushFilters returns everything as residual). */
  private def toCatalyst(f: Filter): Option[
      org.apache.spark.sql.catalyst.expressions.Expression] = {
    import org.apache.spark.sql.catalyst.{expressions => ce}
    def attr(c: String): Option[ce.Expression] =
      tableSchema.fields.find(_.name == c)
        .map(fd => ce.AttributeReference(fd.name, fd.dataType, fd.nullable, fd.metadata)())
    def lit(c: String, v: Any): Option[ce.Expression] =
      tableSchema.fields.find(_.name == c)
        .map(fd => ce.Literal.create(v, fd.dataType))
    def bin(c: String, v: Any, mk: (ce.Expression, ce.Expression) => ce.Expression) =
      for { a <- attr(c); l <- lit(c, v) } yield mk(a, l)
    f match {
      case EqualTo(c, v) => bin(c, v, ce.EqualTo)
      case EqualNullSafe(c, v) => bin(c, v, ce.EqualNullSafe)
      case GreaterThan(c, v) => bin(c, v, ce.GreaterThan)
      case GreaterThanOrEqual(c, v) => bin(c, v, ce.GreaterThanOrEqual)
      case LessThan(c, v) => bin(c, v, ce.LessThan)
      case LessThanOrEqual(c, v) => bin(c, v, ce.LessThanOrEqual)
      case In(c, vs) =>
        for { a <- attr(c); fd <- tableSchema.fields.find(_.name == c) }
          yield ce.In(a, vs.toSeq.map(v => ce.Literal.create(v, fd.dataType)))
      case IsNull(c) => attr(c).map(ce.IsNull)
      case IsNotNull(c) => attr(c).map(ce.IsNotNull)
      case StringStartsWith(c, v) => bin(c, v, ce.StartsWith)
      case StringEndsWith(c, v) => bin(c, v, ce.EndsWith)
      case StringContains(c, v) => bin(c, v, ce.Contains)
      case And(l, r) => for { a <- toCatalyst(l); b <- toCatalyst(r) } yield ce.And(a, b)
      case Or(l, r) => for { a <- toCatalyst(l); b <- toCatalyst(r) } yield ce.Or(a, b)
      case Not(x) => toCatalyst(x).map(ce.Not)
      case _ => None
    }
  }

  /** Parquet delegate scan over an explicit RELATIVE file list, with the
    * captured column pruning + filter pushdown applied — the one
    * construction shared by the batch path (pruned manifest files) and
    * the micro-batch stream (per-batch version deltas). */
  private[graft] def delegateScanFor(rels: Seq[String])
      : org.apache.spark.sql.connector.read.Scan =
    delegateScanWith(rels, requiredSchema)

  /** The name-resolving twin of [[delegateScanFor]] — requested schema
    * stripped of field ids regardless of `rels`. The STREAM reader
    * factory needs it up front: files imported after stream start can
    * appear in later micro-batches, and the
    * [[ImportRoutingReaderFactory]] picks per partition. */
  private[graft] def delegateScanNamedFor(rels: Seq[String])
      : org.apache.spark.sql.connector.read.Scan =
    delegateScanWith(rels, requiredSchema, forceNamed = true)

  /** A fresh parquet delegate builder over an explicit file list.
    * Asserts field-id column resolution first: it is set at catalog
    * initialize, but that can be undone (RESET / SET ... = false) or may
    * have landed on a different session than the one scanning — without
    * it, files written before a rename silently read the renamed column
    * as NULL (and delete-KEY files would read all-null keys). */
  /** The request schema for a delegate over `rels`: IMPORTED files
    * (add_files — no parquet field ids inside) must be asked for BY
    * NAME, because Spark's id matching null-fills an id-carrying
    * request against an id-less file. Sound for the native files the
    * same scan covers too: add_files refuses tables with renames in
    * their schema history, and renames refuse while imported files
    * remain in retained history — so names never drift while any
    * imported file is scannable. */
  private def requestSchemaFor(rels: Seq[String], schema: StructType,
                               forceNamed: Boolean = false): StructType =
    if (forceNamed || rels.exists(GraftTable.isImportedRel))
      SchemaBridge.stripFieldIds(schema)
    else schema

  private def mkDelegateBuilder(rels: Seq[String],
                                schema: StructType = tableSchema,
                                forceNamed: Boolean = false)
      : org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder = {
    val spark = SparkSession.active
    val reqSchema = requestSchemaFor(rels, schema, forceNamed)
    // manifest-backed index: the delegate plans from catalog knowledge
    // (file list + dir-batched memoized lengths) — InMemoryFileIndex
    // would re-stat every file on every query's planning
    org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder(
      spark,
      new ManifestFileIndex(spark,
        ManifestFileIndex.statusesFor(spark, dataDir, rels)),
      reqSchema, reqSchema, GraftTable.fieldIdOptions(options))
  }

  /** A delegate scan whose rows carry the metadata-derived ABSOLUTE row
    * index as a trailing column ([[PosDelta.RowIdxCol]]) — the
    * split-safe, pushdown-safe way to read positions: indexes come from
    * parquet row-group metadata, so byte-range splits and row-group
    * skips shift nothing. Filters still stay residual in group-prune
    * mode (row-level rewrites need every surviving row back). */
  private def delegateScanRowIdx(rels: Seq[String], base: StructType)
      : org.apache.spark.sql.connector.read.Scan = {
    val delegate = mkDelegateBuilder(rels, PosDelta.withRowIdx(tableSchema))
    delegate.pruneColumns(requestSchemaFor(rels, PosDelta.withRowIdx(base)))
    if (!groupPruneOnly)
      delegate.pushFilters(pushed.toSeq.flatMap(toCatalyst))
    delegate.build()
  }

  private def delegateScanWith(rels: Seq[String], readSchema: StructType,
                               withFilters: Boolean = true,
                               forceNamed: Boolean = false)
      : org.apache.spark.sql.connector.read.Scan = {
    val delegate = mkDelegateBuilder(rels, forceNamed = forceNamed)
    delegate.pruneColumns(requestSchemaFor(rels, readSchema, forceNamed))
    // hand the pushed filters to the delegate for row-group skipping
    // through its public Catalyst pushdown surface (FileScanBuilder.
    // pushFilters translates + records them as pushedDataFilters) — no
    // reflection against Spark internals.
    // EXCEPT in group-prune-only mode (row-level rewrites): there the
    // pushed condition only selects which FILES are affected — the
    // write-back needs every surviving row of those files, and
    // row-group skipping of non-matching rows would silently drop them.
    // (Position-delete readers also pass withFilters=false: a skipped
    // row group would shift every row position.)
    if (!groupPruneOnly && withFilters)
      delegate.pushFilters(pushed.toSeq.flatMap(toCatalyst))
    delegate.build()
  }

  /** Per-delete-file key sets, loaded at most once per builder (delete
    * files are immutable — same path, same keys). */
  private val deleteKeyCache =
    scala.collection.mutable.Map.empty[String, Set[List[Any]]]

  /** Per-POSITION-delete-file contents (rel path → dead positions),
    * loaded at most once per builder. */
  private val posDeleteCache =
    scala.collection.mutable.Map.empty[String, Map[String, Set[Long]]]

  /** Equality-delete files applying to `rel`: those committed at a
    * sequence strictly above the file's added-sequence (files predating
    * sequence tracking default to 0 — older than every delete). */
  private def applicableDeletes(rel: String): Seq[graft.meta.DeleteFileDef] = {
    val seq = fileSeqs.getOrElse(rel, 0L)
    eqDeleteFiles.filter(_.seq > seq)
  }

  /** Delete files split by flavor: an empty key-field-id list marks a
    * POSITION delete (rows are (file, pos) of dead rows — written by the
    * keyless-table DELETE path); a non-empty one an equality delete. */
  private def eqDeleteFiles = deleteFiles.filter(_.keyFieldIds.nonEmpty)
  private def posDeleteFiles = deleteFiles.filter(_.keyFieldIds.isEmpty)

  /** Live position-delete contents as (rel path → dead positions):
    * loaded once on the driver (memoized per builder), bounded by the
    * same byte budget as equality keys. */
  private def loadPosByRel(): Map[String, Set[Long]] =
    if (posDeleteFiles.isEmpty) Map.empty
    else {
      val posBytes = posDeleteFiles.map(MergeOnRead.estBytes).sum
      require(posBytes <= deleteByteBudget,
        s"$posBytes bytes of live position-delete files exceed the " +
          s"broadcast-class budget ($deleteByteBudget) for table $tableName " +
          "— plain reads and delta DML apply positions as a distributed " +
          "anti join when graft.functions.GraftExtensions is installed " +
          "(spark.sql.extensions); copy-on-write rewrites cannot use the " +
          "join — compact the table (or CALL rewrite_position_deletes) first")
      posDeleteFiles.map(d => posDeleteCache.getOrElseUpdate(d.path, {
          val spark = SparkSession.active
          spark.read.schema(PosDelta.deleteFileSchema)
            .parquet(s"$dataDir/${d.path}")
            .collect()
            .groupBy(_.getString(0))
            .map { case (rel, rows) => rel -> rows.map(_.getLong(1)).toSet }
        }))
        .foldLeft(Map.empty[String, Set[Long]]) { (acc, m) =>
          m.foldLeft(acc) { case (a, (rel, ps)) =>
            a + (rel -> (a.getOrElse(rel, Set.empty) ++ ps))
          }
        }
    }

  /** The position-emitting scan behind `_graft_file`/`_graft_pos` (see
    * [[PosDelta]]): manifest-pruned candidate files, each as one
    * unsplit filter-free partition, wrapped to count positions, skip
    * already-deleted ones and append the coordinate columns. */
  private def posDeltaScan(requested: StructType)
      : org.apache.spark.sql.connector.read.Scan = {
    require(eqDeleteFiles.isEmpty,
      s"row-position metadata columns are unavailable while $tableName " +
        "carries equality-delete files — keyed tables take the " +
        "equality-delete delta path; compact first to read positions")
    // coordinate reads bypass the identity-column overlay — a
    // hive-imported file would serve its partition columns as null
    require(overlayRels(prunedRelFiles).isEmpty,
      s"row-position metadata columns are unavailable over hive-imported " +
        s"partitioned files of $tableName — compact the table first")
    // an equality/IN filter on the file coordinate prunes to exactly
    // the named files — the "re-read THIS file" repair/debug shape
    val fileEq: Option[Set[String]] =
      if (tableSchema.fieldNames.contains(PosDelta.FileCol)) None
      else pushed.toSeq.collect {
        case EqualTo(c, v: String) if c == PosDelta.FileCol => Set(v)
        case In(c, vs) if c == PosDelta.FileCol =>
          vs.collect { case s: String => s }.toSet
      }.reduceOption(_ intersect _)
    val rels = fileEq match {
      case Some(named) => prunedRelFiles.filter(named)
      case None => prunedRelFiles
    }
    onBuild(rels)
    val posByRel = loadPosByRel()
    // same dir-batched length source as the delegate's file index —
    // no second cache, no per-file stat sweep
    val lens = ManifestFileIndex.lengthsFor(SparkSession.active, dataDir, rels)
    val groups = rels.sorted.map { rel =>
      PosGroup(rel, s"$dataDir/$rel", lens(rel),
        posByRel.getOrElse(rel, Set.empty))
    }
    new PosDeltaScan(delegateScanRowIdx(rels, requiredSchema),
      groups, requested, requiredSchema)
  }

  /** The scan over `rels` with merge-on-read deletes applied (see
    * [[MergeOnRead]]): files no delete touches keep the plain vectorized
    * delegate; equality-delete-affected groups read row-based behind a
    * subtract-the-keys filter over a key-widened read schema;
    * position-delete-affected files read whole through a counting
    * reader. */
  private def morScanFor(rels: Seq[String])
      : org.apache.spark.sql.connector.read.Scan = {
    if (deleteFiles.isEmpty) return delegateScanFor(rels)

    val posByRel = loadPosByRel()
    val posAffected = rels.filter(posByRel.contains)
    posAffected.foreach { rel =>
      require(applicableDeletes(rel).isEmpty,
        s"file $rel carries both equality and position deletes — " +
          s"compact table $tableName (our writers never mix flavors)")
    }
    val posGroups = {
      val lens = ManifestFileIndex.lengthsFor(SparkSession.active, dataDir,
        posAffected)
      posAffected.sorted.map { rel =>
        PosGroup(rel, s"$dataDir/$rel", lens(rel), posByRel(rel))
      }
    }
    noteMetrics(ScanMetrics.FilesDirtyPos -> posGroups.size.toLong)
    val posFactoryScan =
      if (posGroups.isEmpty) None
      // row-index delegate: positions come from parquet row-group
      // metadata, so the dirty files split at maxPartitionBytes and
      // keep full filter pushdown — a skipped row group shifts nothing
      else Some(delegateScanRowIdx(posAffected, requiredSchema))

    val eqRels = rels.filterNot(posAffected.toSet)
    val grouped = eqRels.groupBy(r => applicableDeletes(r).map(_.path).toSet)
      .values.toSeq.map(fs => (applicableDeletes(fs.head), fs))
    val cleanFiles = grouped.filter(_._1.isEmpty).flatMap(_._2)
    val dirtyGroups = grouped.filter(_._1.nonEmpty)
      .sortBy(_._2.headOption.getOrElse("")) // deterministic plan order
    if (dirtyGroups.isEmpty && posGroups.isEmpty) return delegateScanFor(rels)
    if (dirtyGroups.isEmpty)
      return new MorScan(delegateScanFor(rels),
        if (cleanFiles.nonEmpty) Some(delegateScanFor(cleanFiles)) else None,
        Nil, posGroups, posFactoryScan)

    val allDeletes = dirtyGroups.flatMap(_._1).distinct
    // driver-memory guard, budgeted in BYTES of delete files (a row
    // count would fire only after the driver already held gigabytes of
    // boxed keys). Past the budget the MorDeleteJoin optimizer rule —
    // installed by GraftExtensions — rewrites the relation into a
    // distributed anti join long before this scan is built; reaching
    // here over budget means the session lacks the extensions.
    val totalBytes = allDeletes.map(MergeOnRead.estBytes).sum
    val budget = deleteByteBudget
    require(totalBytes <= budget,
      s"$totalBytes bytes of live delete files exceed the broadcast-class " +
        s"budget ($budget) for table $tableName — install " +
        "graft.functions.GraftExtensions (spark.sql.extensions) so deletes " +
        "apply as a distributed anti join, or compact the table")

    // load each delete file's key set ONCE on the driver (memoized
    // across build() and every runtime refilter — an injected join
    // filter must not re-collect millions of keys); executors get the
    // sets inside the reader factory (task-binary broadcast)
    val spark = SparkSession.active
    val keysByFile: Map[String, Set[List[Any]]] = allDeletes.map { df =>
      df.path -> deleteKeyCache.getOrElseUpdate(df.path, {
        val names = df.keyFieldIds.map(MergeOnRead.nameOfFieldId(tableSchema, _))
        val keySchema = StructType(names.map(n =>
          tableSchema.fields(tableSchema.fieldIndex(n))))
        // field-id resolution on (per-read): a key column renamed after
        // the delete commit resolves by id — by name it would read
        // all-null keys and silently resurrect every deleted row
        val rows = GraftTable.idReader(spark).schema(keySchema)
          .parquet(s"$dataDir/${df.path}")
          .collect()
        rows.map(r => (0 until keySchema.length)
          .map(i => r.get(i)).toList).toSet
      })
    }.toMap

    // promotion back to the clean path: sequence scoping calls a file
    // "dirty" whenever ANY delete outranks it, but per-file evidence
    // can PROVE no deleted key ever lived there. Two rungs, cheapest
    // first: the manifest's harvested identifier [min,max] (zero I/O),
    // then — where the writer declared parquet blooms on every key
    // column — the footer blooms (one driver-side footer read per
    // surviving file, memoized per (file, delete set); delete files
    // are immutable so entries never stale). Promoted files read
    // vectorized with no subtract filter.
    val keysOf = (d: graft.meta.DeleteFileDef) => keysByFile(d.path)
    lazy val hconf = spark.sessionState.newHadoopConf()
    val moved = Seq.newBuilder[String]
    var promotedStats = 0L
    var promotedBloom = 0L
    val dirtyFinal = dirtyGroups.flatMap { case (dels, fs) =>
      val statCand =
        ChangesTable.keptCandidates(fs, fileStats, tableSchema, dels, keysOf)
      moved ++= fs.filterNot(statCand.toSet)
      promotedStats += fs.size - statCand.size
      // the gate needs only column NAMES — the (large) per-column value
      // pivot is built strictly inside the testable branch
      val testable = bloomKeyCols.nonEmpty && statCand.nonEmpty &&
        MergeOnRead.keyColNames(dels, tableSchema).forall(bloomKeyCols)
      val still =
        if (!testable) statCand
        else {
          val groups = MergeOnRead.keyColumnGroups(dels, tableSchema, keysOf)
          val delSetKey = dels.map(_.path).sorted.mkString(",")
          val mayHold = MergeOnRead.bloomVerdicts(
            dataDir, statCand, delSetKey, groups, hconf)
          val (dirty2, clean2) = statCand.partition(mayHold)
          moved ++= clean2
          promotedBloom += clean2.size
          dirty2
        }
      if (still.nonEmpty) Some((dels, still)) else None
    }
    noteMetrics(
      ScanMetrics.FilesDirtyEq -> dirtyFinal.map(_._2.size).sum.toLong,
      ScanMetrics.FilesPromotedStats -> promotedStats,
      ScanMetrics.FilesPromotedBloom -> promotedBloom)
    val cleanAll = cleanFiles ++ moved.result()
    // every file proven untouched: the plain (columnar-capable) scan
    if (dirtyFinal.isEmpty && posGroups.isEmpty) return delegateScanFor(rels)

    val statsScan = delegateScanFor(rels)
    val cleanScan = if (cleanAll.nonEmpty) Some(delegateScanFor(cleanAll))
      else None
    val dirty = dirtyFinal.map { case (dels, fs) =>
      val keyIdSets = dels.groupBy(_.keyFieldIds).toSeq.sortBy(_._1.mkString(","))
      val allKeyNames = keyIdSets.flatMap(_._1).distinct
        .map(MergeOnRead.nameOfFieldId(tableSchema, _))
      val missing = allKeyNames.filterNot(requiredSchema.fieldNames.contains)
      val extended = StructType(requiredSchema.fields ++
        missing.map(n => tableSchema.fields(tableSchema.fieldIndex(n))))
      val preds = keyIdSets.map { case (ids, dfs) =>
        val names = ids.map(MergeOnRead.nameOfFieldId(tableSchema, _))
        val ords = names.map(extended.fieldIndex).toArray
        val types = ords.map(extended.fields(_).dataType)
        MorPredicate(ords, types,
          dfs.map(d => keysByFile(d.path)).reduce(_ union _))
      }
      val keep = if (missing.isEmpty) -1 else requiredSchema.length
      val spec = MorSpec(preds, keep, requiredSchema.fields.map(_.dataType))
      (delegateScanWith(fs, extended), spec)
    }
    new MorScan(statsScan, cleanScan, dirty, posGroups, posFactoryScan)
  }

  /** Columns runtime (join-driven) filters can prune files on: exact-render
    * identity partition columns and transform source columns — the set the
    * manifest pruner knows how to replay. Declaring more would cost a
    * runtime subquery per equi-join without ever skipping a file.
    * Restricted to columns that SURVIVE column pruning: Spark's
    * PartitionPruning rule resolves filterAttributes against the scan
    * OUTPUT, so declaring a pruned-away column (an ids-only read of a
    * cell-partitioned index table) fails analysis outright — and a
    * column absent from the output can never carry the join key a
    * runtime filter would come from anyway. Also excluded: columns the
    * query already pins with a STATIC In/EqualTo literal (the probed-
    * cell searches push their exact probe set) — the manifest pruner
    * has already cut the file list to those values, so a dynamic
    * subquery on the same column would re-execute the join's build
    * side purely to re-derive a subset of the pushed literals. */
  private def runtimeFilterAttrs: Seq[String] = {
    val pinned: Set[String] = pushed.collect {
      case In(c, _) => c
      case EqualTo(c, _) => c
    }.toSet
    (partCols.filter(exactRenderIdentity) ++ transformBySrc.keys).distinct
      .filter(requiredSchema.fieldNames.contains)
      .filterNot(pinned)
  }

  /** Key-grouped (storage-partitioned) read eligibility: every default-
    * spec field is an exact-render identity column or a bucket
    * transform, and every source column survives column pruning (the
    * reported V2 expressions must resolve against the scan output).
    * Yields each spec field as (dirKey, reported expression, typed
    * dir-value parser); None = report no partitioning. */
  private def keyedFields: Option[Seq[
      (String, org.apache.spark.sql.connector.expressions.Expression,
       String => Option[Any])]] = {
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.types._
    val BucketRe = "bucket\\[(\\d+)\\]".r
    val DefaultPart = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .DEFAULT_PARTITION_NAME
    def parseIdentity(dt: DataType)(v: String): Option[Any] =
      if (v == DefaultPart) Some(null)
      else try dt match {
        case StringType => Some(org.apache.spark.unsafe.types.UTF8String.fromString(v))
        case IntegerType => Some(v.toInt)
        case LongType => Some(v.toLong)
        case ShortType => Some(v.toShort)
        case ByteType => Some(v.toByte)
        case BooleanType => Some(v.toBoolean)
        case _ => None
      } catch { case _: Exception => None }
    def parseBucket(v: String): Option[Any] =
      try Some(v.toInt) catch { case _: Exception => None }
    if (partCols.isEmpty && transformSpecs.isEmpty) return None
    val identity = partCols.map { c =>
      if (!exactRenderIdentity(c) || !requiredSchema.fieldNames.contains(c))
        return None
      val dt = tableSchema.fields.find(_.name == c).get.dataType
      (c, Expressions.identity(c): org.apache.spark.sql.connector.expressions.Expression,
        parseIdentity(dt) _)
    }
    val Temporal = Set("year", "month", "day", "hour")
    def temporalOk(src: String): Boolean =
      tableSchema.fields.find(_.name == src).map(_.dataType).exists {
        case DateType | TimestampType | TimestampNTZType => true
        case _ => false
      }
    def parseTemporal(tr: String)(v: String): Option[Any] =
      if (v == DefaultPart) Some(null)
      else tr match {
        case "year" => try Some(v.toInt) catch { case _: Exception => None }
        // fixed-width well-formed dirs only — an EXCEEDS_PAD rendering
        // must drop the report, never produce a wrong key
        case _ if PartitionTransforms.wellFormedDir(tr, v) =>
          Some(org.apache.spark.unsafe.types.UTF8String.fromString(v))
        case _ => None
      }
    val buckets = transformSpecs.map {
      case (src, BucketRe(n), dirKey)
          if requiredSchema.fieldNames.contains(src) =>
        (dirKey, Expressions.bucket(n.toInt, src):
           org.apache.spark.sql.connector.expressions.Expression,
          parseBucket _)
      case (src, tr, dirKey)
          if Temporal(tr) && temporalOk(src) &&
            requiredSchema.fieldNames.contains(src) =>
        val expr = tr match {
          case "year" => Expressions.years(src)
          case "month" => Expressions.months(src)
          case "day" => Expressions.days(src)
          case "hour" => Expressions.hours(src)
        }
        (dirKey, expr: org.apache.spark.sql.connector.expressions.Expression,
          parseTemporal(tr) _)
      case _ => return None // truncate transform, or pruned source
    }
    Some(identity ++ buckets)
  }

  /** [[morScanFor]] upgraded to a [[KeyedScan]] when the layout allows:
    * the pruned files are grouped by typed partition key (parsed back
    * from their `__part_` dir values) and the scan reports
    * KeyGroupedPartitioning — co-partitioned joins and partition-keyed
    * aggregations then run with no exchange. Any file missing a dir key
    * (pre-spec-evolution data) or carrying an unparseable value drops
    * the whole report — never a wrong key, just a plain scan. */
  // planning-time counters for [[ScanMetrics]] — reset per (re)build so
  // a runtime refilter reports the NARROWED numbers
  private var planMetrics: Map[String, Long] = Map.empty
  private def noteMetrics(kvs: (String, Long)*): Unit =
    kvs.foreach { case (k, v) => planMetrics += (k -> v) }

  /** Imported rels whose REQUESTED identity partition columns must be
    * served from their `__part_` dirs ([[ImportOverlay]]): hive-layout
    * imports carry the value in the directory, not the footer. */
  private def overlayRels(rels: Seq[String]): Seq[(String, Seq[(Int, Any)])] = {
    val cols = partCols.filter(requiredSchema.fieldNames.contains)
    if (cols.isEmpty) Nil
    else rels.flatMap { r =>
      if (!GraftTable.isImportedRel(r)) None
      else Some(r -> ImportOverlay.constsFor(r, requiredSchema, cols))
        .filter(_._2.nonEmpty)
    }
  }

  private def keyedScanFor(rels: Seq[String])
      : org.apache.spark.sql.connector.read.Scan = {
    // every counter present from the start: an operator reading the
    // node must see "0 dirty", never a blank that could mean either
    // "clean" or "not measured"
    planMetrics = Map(ScanMetrics.FilesSelected -> rels.size.toLong,
      ScanMetrics.DeleteFilesLive -> deleteFiles.size.toLong,
      ScanMetrics.FilesDirtyEq -> 0L, ScanMetrics.FilesDirtyPos -> 0L,
      ScanMetrics.FilesPromotedStats -> 0L,
      ScanMetrics.FilesPromotedBloom -> 0L)
    val ovr = overlayRels(rels)
    if (ovr.nonEmpty) {
      // add_files refuses partitioned imports into merge-on-read
      // tables, so live deletes cannot coexist with overlay files
      // short of hand-edited metadata — refuse rather than resurrect
      require(deleteFiles.isEmpty,
        s"table $tableName mixes hive-imported partitioned files with " +
          "live delete files — compact the table first")
      val ovrSet = ovr.map(_._1).toSet
      val rest = rels.filterNot(ovrSet)
      val colTypes = requiredSchema.fields.map(_.dataType)
      val groups = ovr.groupBy(_._2.toList).toSeq
        .sortBy(_._2.head._1) // deterministic plan order
        .map { case (consts, rs) =>
          (ImportOverlay.OverlaySpec(consts.toArray, colTypes),
            delegateScanFor(rs.map(_._1)))
        }
      return new OverlayScan(
        if (rest.isEmpty) None else Some(morScanFor(rest)),
        groups, requiredSchema)
    }
    if (rels.isEmpty || groupPruneOnly || deleteFiles.nonEmpty)
      return morScanFor(rels)
    keyedFields match {
      case None => morScanFor(rels)
      case Some(fields) =>
        val keyedRels: Option[List[(List[Any], String)]] =
          rels.foldLeft(Option(List.empty[(List[Any], String)])) { (acc, rel) =>
            acc.flatMap { done =>
              val kvs = PartitionDirs.kvs(rel)
              fields.foldLeft(Option(List.empty[Any])) { (ka, f) =>
                ka.flatMap(vs => kvs.get(f._1).flatMap(f._3).map(vs :+ _))
              }.map(key => done :+ (key, rel))
            }
          }
        keyedRels match {
          case None => morScanFor(rels)
          case Some(pairs) =>
            val byKey = pairs.groupBy(_._1)
            // KeyedScan builds FilePartitions itself — no per-group
            // table/file-index setup; past this many groups even that
            // planning pass outweighs the one exchange SPJ saves
            if (byKey.size > 4096) return morScanFor(rels)
            // one memoized length lookup for the whole file list —
            // steady-state SPJ planning performs zero filesystem
            // metadata calls (the engine-wide invariant; a per-file
            // driver stat here was the r7 scale finding)
            val lens = ManifestFileIndex.lengthsFor(SparkSession.active,
              dataDir, pairs.map(_._2))
            val groups = byKey.toSeq
              .sortBy(_._2.head._2) // deterministic plan order
              .map { case (key, prs) =>
                (new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
                   key.toArray),
                 prs.map(p => (s"$dataDir/${p._2}", lens(p._2))))
              }
            // report the declared sort order when every file of every
            // group is proven sorted under the CURRENT order by its
            // adding-commit stamp. Single small file per group: the
            // plain chunked (vectorized) planning already emits in
            // order. Multiple files (or an oversized one): plan each
            // group as ONE whole-group k-way merge partition — sorted
            // runs merge into a sorted partition, so a second commit
            // per bucket keeps the zero-exchange, zero-sort SPJ plan
            // (row-based; the vectorized path returns after compaction
            // folds each bucket back to one file).
            val allSorted =
              declaredOrdering.nonEmpty && pairs.forall(p => sortedRels(p._2))
            val maxSplit = math.max(1L,
              SparkSession.active.sessionState.conf.filesMaxPartitionBytes)
            val singleSmall = byKey.valuesIterator.forall(_.size == 1) &&
              lens.valuesIterator.forall(_ <= maxSplit)
            // merge keys must resolve against the REQUESTED schema —
            // a pruned sort column cannot be compared (and Spark would
            // drop an unresolvable ordering report anyway)
            def mergeKeysOpt: Option[Array[MergeKey]] = {
              import org.apache.spark.sql.connector.expressions.{NamedReference, NullOrdering, SortDirection}
              Some(declaredOrdering.map { so =>
                so.expression() match {
                  case nr: NamedReference if nr.fieldNames.length == 1 &&
                      requiredSchema.fieldNames.contains(nr.fieldNames.head) =>
                    val i = requiredSchema.fieldIndex(nr.fieldNames.head)
                    MergeKey(i, requiredSchema.fields(i).dataType,
                      so.direction() == SortDirection.ASCENDING,
                      so.nullOrdering() == NullOrdering.NULLS_FIRST)
                  case _ => return None
                }
              })
            }
            val (ordering, mergeKeys) =
              if (!allSorted)
                (Array.empty[org.apache.spark.sql.connector.expressions.SortOrder],
                  Array.empty[MergeKey])
              else if (singleSmall) (declaredOrdering, Array.empty[MergeKey])
              else mergeKeysOpt match {
                case Some(ks) => (declaredOrdering, ks)
                case None =>
                  (Array.empty[org.apache.spark.sql.connector.expressions.SortOrder],
                    Array.empty[MergeKey])
              }
            new KeyedScan(delegateScanFor(rels), groups, fields.map(_._2).toArray,
              ordering, mergeKeys)
        }
    }
  }

  /** Fold runtime `In` filters into the pushed set and re-prune: dir
    * replay, range keys, and min/max stats all consume `pushed`, so a
    * runtime value set narrows files exactly like a literal predicate.
    * Re-fires onBuild — a row-level rewrite narrowed at runtime must
    * commit the NARROWED affected-file set, never the planning-time one.
    * Stays key-grouped: BatchScanExec requires the re-planned partitions
    * to still carry keys when the scan reported KeyGroupedPartitioning. */
  private def runtimeRefilter(
      fs: Array[Filter]): org.apache.spark.sql.connector.read.Scan = {
    pushed = pushed ++ fs
    val re = prunedRelFiles
    onBuild(re)
    keyedScanFor(re)
  }

  override def build(): org.apache.spark.sql.connector.read.Scan = {
    // requested row coordinates flip the whole scan to the
    // position-emitting shape (a pushed aggregation never co-occurs:
    // the parquet delegate refuses aggregations naming columns outside
    // its data schema)
    requestedWithMeta.foreach { req => return posDeltaScan(req) }
    // a pushed aggregation owns the whole scan: footer-metadata answers,
    // aggregate read schema, no runtime filtering (a refilter would
    // rebuild a row scan under an aggregate plan shape)
    aggDelegate.foreach { b => return b.build() }
    val pruned = prunedRelFiles
    onBuild(pruned)
    // manifest cardinality: when every pruned file carries a harvested
    // row count, the scan can report numRows — the estimate Catalyst
    // needs to judge a PRUNED scan broadcastable (file-source stats are
    // bytes-only). Any file without a count (pre-upgrade metadata)
    // withholds the report rather than underestimate.
    val manifestRows: Option[Long] = {
      val counts = pruned.map(r =>
        fileStats.get(r).flatMap(_.headOption).flatMap(_.rows))
      if (pruned.nonEmpty && counts.forall(_.isDefined)) Some(counts.flatten.sum)
      else if (pruned.isEmpty) Some(0L)
      else None
    }
    val batchScan = keyedScanFor(pruned)
    streamSource match {
      case None =>
        new GraftScan(batchScan,
          cp => batchScan.toMicroBatchStream(cp), // unreachable: no stream source
          runtimeFilterAttrs, runtimeRefilter, manifestRows,
          () => planMetrics.toSeq.sortBy(_._1),
          reportSchema = Some(requiredSchema))
      case Some((store, ns, table)) =>
        new GraftScan(batchScan, runtimeAttrs = runtimeFilterAttrs,
          refilter = runtimeRefilter, manifestRows = manifestRows,
          driverMetrics = () => planMetrics.toSeq.sortBy(_._1),
          reportSchema = Some(requiredSchema),
          mkStream = _ => {
          // a micro-batch is an append-only file delta; equality deletes
          // committed between offsets would require emitting retractions
          // — refuse rather than silently stream deleted rows
          if (deleteFiles.nonEmpty) throw new UnsupportedOperationException(
            s"streaming read of $tableName: table carries merge-on-read " +
              "delete files — compact it first")
          val start = ChangesTable.resolveStartVersion(store, ns, table,
            options, tableName)
          new GraftMicroBatchStream(store, ns, table, start, delegateScanFor,
            ChangesTable.parseMaxFilesPerTrigger(options),
            ChangesTable.parseMaxBytesPerTrigger(options),
            delegateScanNamedFor = Some(delegateScanNamedFor))
        })
    }
  }
}

/** The declared `write.sort-order` table property as Spark sort columns
  * — shared by the write path and compaction, which must both lay data
  * out in the order the manifest stats assume. */
private[catalog] object WriteShaping {
  def sortCols(props: Map[String, String]): Seq[org.apache.spark.sql.Column] =
    props.get("write.sort-order").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).map { spec =>
        val parts = spec.split("\\s+")
        if (parts.length > 1 && parts(1).equalsIgnoreCase("desc"))
          org.apache.spark.sql.functions.col(parts(0)).desc
        else org.apache.spark.sql.functions.col(parts(0)).asc
      }

  /** The canonical form of the declared sort order ("col asc,col2
    * desc"), as the per-commit `sorted-by` summary stamp. Every commit
    * whose data files went through the sorting layout stamps it; a scan
    * then proves a live file sorted by looking up the summary of the
    * snapshot that ADDED it (`fileSeqs` holds that id) and comparing
    * against the CURRENT canonical order — files written before the
    * order was declared (or under a different one, or imported by
    * add_files) simply never match. See [[KeyedScan]]'s reported
    * ordering. */
  def sortStamp(props: Map[String, String]): Map[String, String] = {
    val specs = props.get("write.sort-order").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    if (specs.isEmpty) Map.empty
    else Map("sorted-by" -> specs.map { spec =>
      val parts = spec.split("\\s+")
      val dir = if (parts.length > 1 && parts(1).equalsIgnoreCase("desc"))
        "desc" else "asc"
      s"${parts(0)} $dir"
    }.mkString(","))
  }

  /** The full batch-write data path shared by the V1 insert and the
    * streaming upsert sink: stamp table field ids (renames stay
    * metadata-only on these files), honor the declared write.sort-order
    * (range-cluster + sort so row-group stats feed min/max skipping),
    * lay out the default spec's partition dirs, write parquet under
    * `<dataDir>/<relDir>`, and return the relative file list. */
  def writeDataFiles(data: org.apache.spark.sql.DataFrame,
                     meta0: graft.meta.TableMetadata,
                     store: graft.meta.MetaStore,
                     ns: Seq[String], table: String,
                     relDir: String): List[String] = {
    val outDir = store.dataDir(ns, table) + "/" + relDir
    val sortCols = WriteShaping.sortCols(meta0.properties)
    val schemaFields = graft.meta.SchemaBridge.toSpark(meta0.currentSchema)
    val incomingTypes = data.schema.fields.map(f => f.name -> f.dataType).toMap
    val out = data.select(schemaFields.fields.toSeq.map { f =>
      val c = org.apache.spark.sql.functions.col(f.name)
      val typed = if (incomingTypes.get(f.name).contains(f.dataType)) c
                  else c.cast(f.dataType)
      typed.as(f.name, f.metadata)
    }: _*)
    val (withDirs, partDirCols) = WriteShaping.withPartitionDirs(out, meta0)
    // Write distribution (`write.distribution-mode`: hash | range | none;
    // default hash for partitioned tables): without clustering, every
    // write task holding rows of k partition values emits k files —
    // 1000 tasks × 32 buckets = 32,000 files PER COMMIT at cluster
    // scale. `hash` shuffles on the partition-dir expressions so each
    // dir's rows land in one task → exactly one file per partition;
    // `range` co-ranges dirs with the sort order for clustered layouts;
    // `none` keeps maximum write parallelism (tiny commits, tests).
    val distMode = meta0.properties.getOrElse("write.distribution-mode",
      if (partDirCols.nonEmpty) "hash" else "none")
    import org.apache.spark.sql.functions.col
    val dirCols = partDirCols.map(col)
    // Sorting ALWAYS leads with the partition-dir columns: Spark's
    // dynamic-partition writer demands an ordering by exactly those and
    // inserts its OWN (stability-unspecified) sort when the incoming
    // order doesn't satisfy them — which would silently scramble the
    // per-file sort the `sorted-by` stamp then falsely claims (a merge
    // join over a falsely-sorted scan DROPS rows). With the dir prefix
    // the writer's requirement is already met, no extra sort runs, and
    // every emitted file is genuinely sorted by the declared order.
    val innerSort = dirCols ++ sortCols
    val shaped =
      if (partDirCols.isEmpty || distMode == "none") {
        if (sortCols.nonEmpty) {
          if (partDirCols.isEmpty)
            withDirs.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
          else withDirs.sortWithinPartitions(innerSort: _*)
        } else withDirs
      } else if (distMode == "range") {
        val keys = dirCols ++ sortCols
        withDirs.repartitionByRange(keys: _*).sortWithinPartitions(keys: _*)
      } else { // hash
        if (sortCols.nonEmpty)
          withDirs.repartition(dirCols: _*).sortWithinPartitions(innerSort: _*)
        else withDirs.repartition(dirCols: _*)
      }
    val writer0 = if (partDirCols.nonEmpty)
      shaped.write.partitionBy(partDirCols: _*)
    else shaped.write
    // `write.parquet.bloom-filter-columns` = comma-separated column
    // names: the parquet writer embeds a bloom filter per listed column
    // in every row group, and the reader's row-group filter consults it
    // on pushed equality predicates — the point-lookup complement to
    // manifest min/max skipping, which is blind when a high-cardinality
    // key is uniformly spread (every file's [min,max] spans the probe)
    val writer = meta0.properties.get("write.parquet.bloom-filter-columns")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty))
      .getOrElse(Array.empty[String])
      .foldLeft(writer0) { (w, c) =>
        w.option(s"parquet.bloom.filter.enabled#$c", "true")
      }
    writer.mode(org.apache.spark.sql.SaveMode.ErrorIfExists).parquet(outDir)
    store.listParquetUnder(outDir).map(f => s"$relDir/$f")
  }

  /** Shadow `__part_` columns for the default partition spec: every
    * transform becomes a physical dir value while the original column
    * stays inside the data files (scans need no partition recovery).
    * Shared by the write path AND compaction — a rewrite that dropped
    * the layout would disable partition pruning and partition-boundary
    * DELETE/overwrite on the rewritten files. Returns the frame plus
    * the dir column names to partitionBy. */
  def withPartitionDirs(df: DataFrame, meta: TableMetadata)
      : (DataFrame, Seq[String]) = {
    import org.apache.spark.sql.functions.col
    val nameById = meta.currentSchema.fields.map(f => f.id -> f.name).toMap
    val typeByName = SchemaBridge.toSpark(meta.currentSchema)
      .fields.map(f => f.name -> f.dataType).toMap
    val specFields = meta.specs.find(_.specId == meta.defaultSpecId)
      .map(_.fields).getOrElse(Nil)
    val identCols = specFields
      .filter(_.transform == "identity")
      .flatMap(f => nameById.get(f.sourceId))
      .filter(df.columns.contains)
    val transformFields = specFields
      .filter(_.transform != "identity")
      .flatMap { f =>
        for {
          src <- nameById.get(f.sourceId) if df.columns.contains(src)
          dt <- typeByName.get(src)
          ex <- PartitionTransforms.dirExpr(f.transform, src, dt)
        } yield (f.name, ex)
      }
    var out = df
    identCols.foreach(c => out = out.withColumn(s"__part_$c", col(c)))
    transformFields.foreach { case (n, ex) => out = out.withColumn(s"__part_$n", ex) }
    (out, identCols.map("__part_" + _) ++ transformFields.map("__part_" + _._1))
  }
}

private class GraftWriteBuilder(store: MetaStore, ns: Seq[String], table: String,
                                extraSummary: Map[String, String] = Map.empty,
                                requirements: Seq[Requirement] = Nil,
                                dynamicOverwrite: Boolean = false,
                                info: LogicalWriteInfo = null,
                                branch: Option[String] = None)
  extends WriteBuilder
  with org.apache.spark.sql.connector.write.SupportsOverwrite {

  import GraftWriteBuilder._

  private var mode: WriteMode = AppendMode

  override def truncate(): WriteBuilder = {
    mode = if (dynamicOverwrite) DynamicMode else TruncateMode
    this
  }

  /** `INSERT OVERWRITE t PARTITION (cat='b')` / `writeTo.overwrite(cond)`:
    * a true-literal condition is a truncate (or, under
    * partitionOverwriteMode=dynamic, a replace of the touched
    * partitions); anything else must be decidable on partition
    * boundaries (checked at write time). */
  override def overwrite(filters: Array[org.apache.spark.sql.sources.Filter])
      : WriteBuilder = {
    val isTruncate = filters.isEmpty ||
      filters.forall(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue])
    mode =
      if (!isTruncate) ByFilterMode(filters)
      else if (dynamicOverwrite) DynamicMode
      else TruncateMode
    this
  }


  override def build(): V1Write = new V1Write {
    /** `df.writeStream.toTable(...)` — see [[GraftStreamingWrite]]. */
    override def toStreaming
        : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
      if (mode != AppendMode) throw new UnsupportedOperationException(
        "streaming write into a graft table supports append output mode only")
      val (meta0, _) = store.load(ns, table)
      val specFields = meta0.specs.find(_.specId == meta0.defaultSpecId)
        .map(_.fields).getOrElse(Nil)
      if (specFields.nonEmpty) throw new UnsupportedOperationException(
        "native streaming write into a PARTITIONED graft table is not " +
          "supported yet — use foreachBatch with Streaming.catalogSink " +
          "(same exactly-once guarantee, partition layout preserved)")
      // rows arrive in the QUERY schema's column order; graft field ids
      // ride in from the table schema by name so the parquet writer
      // stamps them (rename stays metadata-only on streamed files too)
      val tableFields = SchemaBridge.toSpark(meta0.currentSchema)
        .fields.map(f => f.name -> f).toMap
      val dataSchema = org.apache.spark.sql.types.StructType(
        info.schema().fields.map(f => tableFields.getOrElse(f.name, f)))
      new GraftStreamingWrite(store, ns, table, info.queryId(), dataSchema)
    }

    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, ignored: Boolean): Unit = {
          val commitId = java.util.UUID.randomUUID().toString
          val relDir = s"commit-$commitId"
          val outDir = store.dataDir(ns, table) + "/" + relDir
          val (meta0, _) = store.load(ns, table)

          // branch-write preconditions are decidable BEFORE writing a
          // byte — a mis-targeted large write must not strand its whole
          // volume as orphans until expiry. (The commit-time checks stay:
          // the CAS loop re-resolves the ref against fresh metadata.)
          branch.foreach { b =>
            if (mode != AppendMode) throw new UnsupportedOperationException(
              "branch writes support append only — publish the branch " +
                "before overwrite/truncate maintenance")
            meta0.refs.get(b) match {
              case None => throw new IllegalArgumentException(
                s"no branch named '$b' — create it before writing to it")
              case Some(rd) if rd.refType != "branch" =>
                throw new UnsupportedOperationException(
                  s"cannot append to tag '$b'")
              case _ => ()
            }
          }

          val newFiles = WriteShaping.writeDataFiles(data, meta0, store,
            ns, table, relDir)
          // delta-style updates: the final file list is computed against
          // the freshly-loaded base inside the CAS retry loop, so racing
          // appends are commutative (no snapshot-id assertion needed —
          // appends never conflict; overwrite semantics is last-wins)
          val now = System.currentTimeMillis()
          // writeDataFiles sorted each file under the declared order —
          // record that so keyed scans can report the ordering
          val stampedSummary = extraSummary ++
            WriteShaping.sortStamp(meta0.properties)
          // footer-only stats harvest → manifest min/max; large file
          // batches fan out as one Spark job (never serial on the driver)
          val stats = FileStats.harvestAll(data.sparkSession,
            store.dataDir(ns, table), newFiles)
          val update = mode match {
            case AppendMode if branch.isDefined =>
              // write-audit-publish staging: the snapshot stacks on the
              // branch head, main never moves
              MetadataUpdate.AppendFilesToRef(branch.get, newFiles, now,
                stats, stampedSummary)
            case _ if branch.isDefined =>
              throw new UnsupportedOperationException(
                "branch writes support append only — publish the branch " +
                  "before overwrite/truncate maintenance")
            case AppendMode =>
              MetadataUpdate.AppendFiles(newFiles, now, stats, stampedSummary)
            case TruncateMode =>
              MetadataUpdate.ReplaceFiles(newFiles, now, stats, stampedSummary)
            case ByFilterMode(filters) =>
              val pvs = partitionValuesOf(filters, meta0)
              requireDirKeysEverywhere(meta0, pvs.flatMap(_.keySet).toSet)
              MetadataUpdate.OverwritePartitions(newFiles, pvs, now, stats, stampedSummary)
            case DynamicMode =>
              // the partitions the new data landed in ARE the replace set
              val expectedKeys = specDirKeys(meta0)
              val pvs = newFiles.map(PartitionDirs.kvs).distinct
              if (newFiles.isEmpty && expectedKeys.nonEmpty) {
                // zero partitions touched → nothing to replace; a
                // truncate here would wipe the table on an empty batch
                store.deleteTree(outDir)
                return
              } else if (expectedKeys.isEmpty)
                // unpartitioned table: dynamic degrades to plain truncate
                // (the V1 dynamic-mode semantic)
                MetadataUpdate.ReplaceFiles(newFiles, now, stats, stampedSummary)
              else if (pvs.exists(_.keySet != expectedKeys))
                // a suppressed layout (e.g. a non-UTC session writing a
                // temporal transform) would silently widen the replace
                // set to whole coarser partitions — refuse instead
                throw new UnsupportedOperationException(
                  s"dynamic overwrite needs the full partition layout " +
                    s"(${expectedKeys.mkString(",")}) on every written file; " +
                    "got " + pvs.map(_.keySet.mkString(",")).distinct.mkString(" | "))
              else
                MetadataUpdate.OverwritePartitions(newFiles, pvs, now, stats, stampedSummary)
          }
          store.commitOps(ns, table, requirements, Seq(update))
        }
      }
  }
}

private object GraftWriteBuilder {
  import org.apache.spark.sql.sources._

  sealed trait WriteMode
  case object AppendMode extends WriteMode
  case object TruncateMode extends WriteMode
  final case class ByFilterMode(filters: Array[Filter]) extends WriteMode
  case object DynamicMode extends WriteMode

  /** Dir-key names of the default partition spec (identity fields key
    * by source column name, transforms by field name). */
  def specDirKeys(meta: graft.meta.TableMetadata): Set[String] = {
    val nameById = meta.currentSchema.fields.map(f => f.id -> f.name).toMap
    meta.specs.find(_.specId == meta.defaultSpecId).map(_.fields).getOrElse(Nil)
      .map(f => if (f.transform == "identity")
        nameById.getOrElse(f.sourceId, f.name) else f.name)
      .toSet
  }

  /** Translate a conjunctive overwrite condition into explicit partition
    * tuples (In expands to alternatives; conjuncts cross-product with
    * same-column CONSISTENCY — `cat='a' AND cat='b'` selects nothing,
    * never partition b). Only equality/IN on decidable
    * identity-partitioned columns qualifies — anything else throws
    * rather than approximating overwrite scope. An empty result is
    * legitimate: nothing is replaced, the new rows just land. */
  def partitionValuesOf(filters: Array[Filter],
                        meta: graft.meta.TableMetadata): List[Map[String, String]] = {
    val decidable = PartitionDecidability.decidableIdentityCols(meta)
    val perFilter: Seq[Seq[Map[String, String]]] = filters.toSeq.map {
      case EqualTo(c, v) if v != null && decidable(c) =>
        Seq(Map(c -> String.valueOf(v)))
      case EqualNullSafe(c, v) if v != null && decidable(c) =>
        Seq(Map(c -> String.valueOf(v)))
      case In(c, vs) if vs.nonEmpty && vs.forall(_ != null) && decidable(c) =>
        vs.toSeq.map(v => Map(c -> String.valueOf(v)))
      case f => throw new UnsupportedOperationException(
        s"overwrite condition $f is not decidable on partition boundaries " +
          "(equality/IN on a string/int/long/boolean identity-partitioned, " +
          "never-renamed column required)")
    }
    // reject a huge product BEFORE materializing it
    val product = perFilter.map(_.size.toLong).product
    require(product <= 1000,
      s"overwrite partition cross-product too large ($product)")
    val combined = perFilter.foldLeft(Seq(Map.empty[String, String])) { (acc, alts) =>
      for {
        a <- acc
        b <- alts
        // conflicting constraints on the same column select no partition
        if b.forall { case (k, v) => a.get(k).forall(_ == v) }
      } yield a ++ b
    }
    combined.toList
  }

  /** Every existing file must carry every referenced dir key: a file
    * written before partitioning has no dir value, so "doesn't match"
    * would silently KEEP rows the overwrite was meant to replace. This
    * pre-write check fails fast; the authoritative re-check runs inside
    * [[MetadataUpdate.OverwritePartitions]] against the fresh base on
    * every CAS retry. */
  def requireDirKeysEverywhere(meta: graft.meta.TableMetadata,
                               keys: Set[String]): Unit = {
    val missing = meta.currentSnapshot.map(_.files).getOrElse(Nil)
      .find(f => !keys.subsetOf(PartitionDirs.kvs(f).keySet))
    missing.foreach { f =>
      throw new UnsupportedOperationException(
        s"file $f lacks the partition layout for ${keys.mkString(",")} — " +
          "partition overwrite would silently keep its matching rows; " +
          "rewrite it under the current partition spec " +
          "(compaction preserves layouts)")
    }
  }
}
