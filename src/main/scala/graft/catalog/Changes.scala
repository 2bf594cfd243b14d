package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.meta.{MetaStore, SchemaBridge, TableMetadata}

/** Row-level CDC: the changes a table underwent between two metadata
  * versions, as a DataFrame of the table's rows plus `_change_type`
  * ('insert' | 'delete' | 'update_preimage' | 'update_postimage') and
  * `_commit_version`. This is the row-level dual of the file-level
  * `from-version` incremental scan: where that answers "which rows are
  * NEW", this also answers "which rows went away and which were
  * replaced" — what a downstream sync (search index, feature store,
  * replica) actually needs. (The reference catalog serves engines'
  * reads of table state, `/root/reference/api/handlers/tables.go`;
  * a changes feed is the engine-side derivative of that state history.)
  *
  * Derivation per version step v-1 → v, all computed from immutable
  * metadata and read DISTRIBUTED (the driver touches only file lists):
  *   - compaction/Z-order commits (summary `rewrite-kind=compaction`)
  *     change layout, not rows: emit nothing.
  *   - added data files → 'insert' rows; removed data files → 'delete'
  *     rows (overwrite, partition DELETE, truncate, rollback).
  *   - equality-delete files committed at v mask rows of the v-1 STATE
  *     (read through the MoR time-travel path, so rows already deleted
  *     by earlier commits never produce a phantom preimage): those
  *     rows → 'delete'.
  *   - a key BOTH masked and re-inserted at v is an update: its old row
  *     becomes 'update_preimage', its new row 'update_postimage' (the
  *     MoR UPDATE/MERGE and streaming-upsert shape).
  * Copy-on-write DML commits rewrite whole files, so their unchanged
  * rows appear as delete+insert pairs — documented fidelity limit of
  * file-granularity history (Iceberg's changelog scan shares it);
  * merge-on-read tables yield exact row-level changes.
  *
  * Reads resolve columns by stable field id against the CURRENT schema,
  * so renames don't fork the feed's schema mid-history. */
object Changes {

  /** Changes in `(fromVersion, toVersion]` of `catalog.ns….table`.
    * `toVersion` defaults to the current metadata version. */
  def between(s: SparkSession, ident: String, fromVersion: Int,
              toVersion: Option[Int] = None): DataFrame = {
    val parts = ident.split("\\.")
    require(parts.length >= 3, s"expected catalog.namespace.table, got $ident")
    val store = s.sessionState.catalogManager.catalog(parts.head)
      .asInstanceOf[GraftCatalog].metadataStore
    windowFrame(s, store, parts.tail.init.toSeq, parts.last,
      fromVersion, toVersion)
  }

  /** [[between]] addressed by store — the entry the
    * [[ChangelogDeleteJoin]] rule reuses to swap an over-budget
    * `t$changes` scan for this fully-distributed plan. */
  private[graft] def windowFrame(s: SparkSession, store: MetaStore,
                                 ns: Seq[String], table: String,
                                 fromVersion: Int,
                                 toVersion: Option[Int]): DataFrame = {
    val toV = toVersion.getOrElse(store.currentVersion(ns, table))
    require(fromVersion <= toV,
      s"changes-from $fromVersion is above changes-to $toV")

    val metaTo = store.loadVersion(ns, table, toV)
    val schema = SchemaBridge.toSpark(metaTo.currentSchema)
    val dataDir = store.dataDir(ns, table)

    // explicit-off field-id sessions may not read renamed delete keys
    // by name (silent resurrect); the keyId walk only runs in such
    // sessions, over body-cached version documents
    GraftTable.requireRenameSafeNameReads(s, metaTo,
      ((fromVersion + 1) to toV).iterator.flatMap(v =>
        store.loadVersion(ns, table, v).currentSnapshot
          .map(_.deleteFiles.flatMap(_.keyFieldIds)).getOrElse(Nil)).toSet,
      s"changelog of ${(ns :+ table).mkString(".")}")

    // field-id column resolution ON (as a per-read option — a changelog
    // read must not mutate session behavior): files written before a
    // rename must serve the renamed column, and delete-key files resolve
    // by id. Reads touching IMPORTED (id-less) files request by name —
    // sound under the add_files rename guards (SchemaBridge.stripFieldIds)
    val identCols: Seq[String] = metaTo.specs
      .find(_.specId == metaTo.defaultSpecId).map(_.fields).getOrElse(Nil)
      .filter(_.transform == "identity")
      .flatMap(f => SchemaBridge.idNames(metaTo.currentSchema).get(f.sourceId))
    def readRels(rels: Seq[String], readSchema: StructType = schema): DataFrame = {
      def read1(rs0: Seq[String]): DataFrame = {
        val rs = if (rs0.exists(GraftTable.isImportedRel))
          SchemaBridge.stripFieldIds(readSchema) else readSchema
        GraftTable.idReader(s).schema(rs).parquet(rs0.map(r => s"$dataDir/$r"): _*)
      }
      // hive-imported partitioned files serve identity columns from
      // their dirs (the footers don't hold them): read per dir group
      // and patch the constants — the batch twin of the scan surface's
      // ChangeSpec overlay
      val overlayable = identCols.filter(readSchema.fieldNames.contains)
      if (overlayable.isEmpty || !rels.exists(GraftTable.isImportedRel))
        return read1(rels)
      rels.groupBy { r =>
          if (!GraftTable.isImportedRel(r)) Map.empty[String, String]
          else PartitionDirs.kvs(r).view
            .filterKeys(overlayable.contains).toMap
        }.toSeq.sortBy(_._2.headOption.getOrElse(""))
        .map { case (kvs, rs0) =>
          kvs.foldLeft(read1(rs0)) { case (df, (c, v)) =>
            val dt = readSchema.fields(readSchema.fieldIndex(c)).dataType
            val lit0 = if (v == org.apache.spark.sql.catalyst.catalog
                .ExternalCatalogUtils.DEFAULT_PARTITION_NAME) lit(null)
              else lit(v)
            df.withColumn(c, lit0.cast(dt))
          }
        }.reduce(_ unionByName _)
    }

    val outSchema = StructType(schema.fields ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_version", IntegerType, nullable = false)))
    def empty: DataFrame =
      s.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), outSchema)

    def stamped(df: DataFrame, change: String, v: Int): DataFrame =
      df.select(schema.fieldNames.map(col).toSeq: _*)
        .withColumn("_change_type", lit(change))
        .withColumn("_commit_version", lit(v))

    val steps: Seq[DataFrame] = ((fromVersion + 1) to toV).flatMap { v =>
      val meta = store.loadVersion(ns, table, v)
      val prev = if (v - 1 >= 1) Some(store.loadVersion(ns, table, v - 1)) else None
      // every step reads through the FINAL schema (field-id resolution
      // maps older files), so one feed has ONE schema across renames
      stepChanges(s, meta, prev, v, schema, readRels, stamped, dataDir)
    }
    steps.reduceOption(_ unionByName _).getOrElse(empty)
  }

  /** Incremental table sync — the materializer that closes the CDC
    * loop: applies `src`'s row-level changes since the last synced
    * version to the keyed merge-on-read table `dst` as ONE atomic
    * RowDelta (upserted rows + retired keys), fenced by an
    * `AssertMaxSummaryBelow` requirement on the synced version so a
    * replayed or raced sync of the same window fails instead of
    * double-applying. The watermark is the fence summary itself —
    * no side-channel state, and `dst`'s history shows exactly which
    * source version each commit mirrors.
    *
    * Returns the number of source versions applied (0 = already
    * current). Work per call: the changelog of the new window + one
    * commit — at 100 TB a sync is the day's delta, never a re-copy. */
  def sync(s: SparkSession, src: String, dst: String): Int = {
    val dstParts = dst.split("\\.")
    require(dstParts.length >= 3, s"expected catalog.namespace.table, got $dst")
    val dstStore = s.sessionState.catalogManager.catalog(dstParts.head)
      .asInstanceOf[GraftCatalog].metadataStore
    val dstNs = dstParts.tail.init.toSeq
    val dstTable = dstParts.last

    val srcParts = src.split("\\.")
    require(srcParts.length >= 3, s"expected catalog.namespace.table, got $src")
    val srcStore = s.sessionState.catalogManager.catalog(srcParts.head)
      .asInstanceOf[GraftCatalog].metadataStore
    val cur = srcStore.currentVersion(srcParts.tail.init.toSeq, srcParts.last)

    val (dstMeta, _) = dstStore.load(dstNs, dstTable)
    // the fence key carries the SOURCE identity: one target synced from
    // two sources keeps independent watermarks (a shared key would make
    // the second source silently skip or mis-window)
    val fenceKey = s"graft-sync-version:$src"
    val last = math.max(0L,
      graft.commit.Commits.maxSummary(dstMeta, fenceKey)).toInt
    if (cur <= last) return 0

    val schema = SchemaBridge.toSpark(dstMeta.currentSchema)
    val keyNames = MergeOnRead.keyFields(dstMeta.properties, schema).map(_._1)
    val ch = between(s, src, last, Some(cur))
    // NET the window per key: a multi-version window can insert then
    // delete one key (the delete must win — the one-RowDelta commit
    // cannot express intra-window ordering) or update it twice (only
    // the LATEST version may land). Per (key, version) at most one
    // non-preimage row survives the feed except CoW churn's same-row
    // delete+insert — the insert is the surviving state, so non-deletes
    // rank first within a version. localCheckpoint: the window is
    // delta-sized and feeds two actions below — derive it once.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyNames.map(col): _*)
      .orderBy(col("_commit_version").desc,
        when(col("_change_type") === "delete", 1).otherwise(0))
    val netted = ch.filter(col("_change_type") =!= "update_preimage")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .localCheckpoint()
    val ups = netted.filter(col("_change_type").isin("insert", "update_postimage"))
      .select(schema.fieldNames.map(col).toSeq: _*)
    val dels = netted.filter(col("_change_type") === "delete")
      .select(keyNames.map(col).toSeq: _*)
    CatalogUpserts.upsertBatch(dstStore, dstNs, dstTable, ups,
      requirements = Seq(graft.commit.Requirement.AssertMaxSummaryBelow(
        fenceKey, cur)),
      extraSummary = Map(fenceKey -> cur.toString),
      extraDeleteKeys = Some(dels))
    cur - last
  }

  private def stepChanges(
      s: SparkSession,
      meta: TableMetadata, prevMeta: Option[TableMetadata], v: Int,
      schema: StructType,
      readRels: (Seq[String], StructType) => DataFrame,
      stamped: (DataFrame, String, Int) => DataFrame,
      dataDir: String): Seq[DataFrame] = {
    // metadata diff shared with the t$changes scan surface — the two
    // feeds must never drift apart
    val diff = ChangesTable.stepDiff(meta, prevMeta).getOrElse(return Nil)
    val (posNew, eqNew) = diff.newDeletes.partition(_.keyFieldIds.isEmpty)
    val (posPrev, eqPrev) = diff.prevDeletes.partition(_.keyFieldIds.isEmpty)
    require((posNew ++ posPrev).isEmpty || (eqNew ++ eqPrev).isEmpty,
      s"version $v mixes equality and position delete files — compact first")
    // broadcast-class key frames only under the byte budget: an
    // over-budget step's frames join as plain joins instead (Catalyst/
    // AQE picks shuffle-hash or sort-merge) — the distributed fallback
    // that keeps a huge DELETE commit streamable through the feed
    val overBudget = (diff.newDeletes ++ diff.prevDeletes)
      .map(MergeOnRead.estBytes).sum >
      MergeOnRead.byteBudget(meta.properties)
    def hint(df: DataFrame): DataFrame = if (overBudget) df else broadcast(df)

    if ((posNew ++ posPrev).nonEmpty)
      return positionStepChanges(s, diff, posNew, posPrev, v, schema,
        readRels, stamped, dataDir, hint)

    def keysOf(ids: List[Int], dfs: Seq[graft.meta.DeleteFileDef])
        : (Seq[String], DataFrame) = {
      val names = ids.map(MergeOnRead.nameOfFieldId(schema, _))
      val keySchema = StructType(names.map(n =>
        schema.fields(schema.fieldIndex(n))))
      (names, GraftTable.idReader(s).schema(keySchema)
        .parquet(dfs.map(d => s"$dataDir/${d.path}"): _*).distinct())
    }

    // rows of `rels` still live BEFORE this commit: subtract keys of
    // earlier applicable equality deletes, per applicable-delete group
    // and per key-field set (a union key schema would null-fill the
    // absent columns and never join)
    def liveRowsOf(rels: Seq[String]): DataFrame =
      rels.groupBy { rel =>
          val seq = diff.prevFileSeqs.getOrElse(rel, 0L)
          diff.prevDeletes.filter(_.seq > seq).map(_.path).toSet
        }.toSeq.sortBy(_._2.headOption.getOrElse(""))
        .map { case (delPaths, fs) =>
          val dels = diff.prevDeletes.filter(d => delPaths(d.path))
          dels.groupBy(_.keyFieldIds).toSeq.sortBy(_._1.mkString(","))
            .foldLeft(readRels(fs, schema)) { case (acc, (ids, dfs)) =>
              val (names, keys) = keysOf(ids, dfs)
              acc.join(hint(keys), names, "left_anti")
            }
        }.reduce(_ unionByName _)

    val inserted = if (diff.added.nonEmpty) Some(readRels(diff.added, schema))
      else None

    // removed files predate this commit: rows already masked by an
    // EARLIER equality delete died back then
    val hardDeleted: Option[DataFrame] =
      if (diff.removed.isEmpty) None else Some(liveRowsOf(diff.removed))

    if (diff.newDeletes.isEmpty) {
      inserted.map(stamped(_, "insert", v)).toSeq ++
        hardDeleted.map(stamped(_, "delete", v)).toSeq
    } else {
      // equality deletes mask rows of the prior state. Preimages can
      // only live in KEPT files (a file removed at v emits its live
      // rows as hardDeleted — masking them too would emit rows twice,
      // mirroring stepPartitions' kept-only masking), and among those
      // only files whose identifier [min, max] overlaps the delete
      // files' footer range — at 100 TB an upsert of fresh keys reads
      // back a handful of files, not the whole prior snapshot. Earlier
      // deletes are subtracted by liveRowsOf (no phantom preimage);
      // every v-1 file is older than this commit's sequence, so no
      // extra seq scoping is needed. Keys are bounded by the MoR byte
      // budget — broadcast. Processed per key-field-set group; a
      // commit virtually always carries one.
      val hconf = s.sessionState.newHadoopConf()
      val delStats = diff.newDeletes.map(d =>
        (d.keyFieldIds, graft.meta.FileStats.harvest(s"$dataDir/${d.path}", hconf)))
      val keptStats = meta.currentSnapshot.map(_.fileStats).getOrElse(Map.empty)
      val candidates =
        ChangesTable.keptCandidatesByRange(diff.kept, keptStats, schema, delStats)
      val prior =
        if (candidates.isEmpty)
          s.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
            schema)
        else liveRowsOf(candidates)
      val delGroups = diff.newDeletes.groupBy(_.keyFieldIds).toSeq
        .sortBy(_._1.mkString(","))
      var ins = inserted
      val delSides = delGroups.zipWithIndex.map { case ((ids, dfs), gi) =>
        val (names, delKeys) = keysOf(ids, dfs)
        val masked = prior.join(hint(delKeys), names, "leftsemi")
        // key re-inserted in the same commit → update pair, else delete
        val insKeys = ins.map(_.select(names.map(col).toSeq: _*).distinct())
        val delMarked = insKeys match {
          case Some(ik) =>
            masked.join(hint(ik.withColumn("__re", lit(true))), names, "left")
              .withColumn("_ct",
                when(col("__re"), "update_preimage").otherwise("delete"))
              .drop("__re")
          case None => masked.withColumn("_ct", lit("delete"))
        }
        // only keys that actually HAD a prior row make their re-insert
        // an update POSTIMAGE — a first-time key whose delete masked
        // nothing (the upsert sink's not-matched path) stays 'insert'
        val preKeys = masked.select(names.map(col).toSeq: _*).distinct()
        ins = ins.map(_.join(
          hint(preKeys.withColumn(s"__upd$gi", lit(true))), names, "left"))
        delMarked.select((schema.fieldNames.map(col) :+ col("_ct")).toSeq: _*)
      }
      // a row masked by two key-set groups collapses to one change row;
      // max prefers 'update_preimage' over 'delete' (pairing wins). The
      // single-group case — virtually every commit — skips the combine:
      // no duplicates possible, and a full-row groupBy would both
      // shuffle needlessly and reject unorderable (map-typed) columns
      def orderableType(dt: org.apache.spark.sql.types.DataType): Boolean = {
        import org.apache.spark.sql.types._
        dt match {
          case MapType(_, _, _) => false
          case StructType(fs) => fs.forall(f => orderableType(f.dataType))
          case ArrayType(et, _) => orderableType(et)
          case _ => true
        }
      }
      val delCombined =
        if (delSides.length == 1) delSides.head
        else if (schema.fields.forall(f => orderableType(f.dataType)))
          delSides.reduce(_ unionByName _)
            .groupBy(schema.fieldNames.map(col).toSeq: _*)
            .agg(max(col("_ct")).as("_ct"))
        else
          // heterogeneous key sets AND unorderable columns: union as-is
          // (a row masked by two groups may emit twice — the corner of
          // a corner; executing beats refusing)
          delSides.reduce(_ unionByName _)
      val insMarked = ins.map { df =>
        val anyFlag = delGroups.indices
          .map(i => coalesce(col(s"__upd$i"), lit(false))).reduce(_ || _)
        df.withColumn("_ct",
          when(anyFlag, "update_postimage").otherwise("insert"))
      }
      def finish(df: DataFrame): DataFrame =
        df.select((schema.fieldNames.map(col) :+ col("_ct")).toSeq: _*)
          .withColumnRenamed("_ct", "_change_type")
          .withColumn("_commit_version", lit(v))
      Seq(finish(delCombined)) ++ insMarked.map(finish) ++
        hardDeleted.map(stamped(_, "delete", v)).toSeq
    }
  }

  /** One version step of a POSITION-flavored table (keyless DELETEs),
    * the distributed dual of
    * [[ChangesTable.positionStepPartitions]]: rows join the (file, pos)
    * delete frames through Spark's split-safe `_metadata.row_index` —
    * a removed file's still-live rows (anti-join prior positions) emit
    * as deletes, and kept files the commit marked emit exactly the
    * newly-dead positions (semi-join new, anti-join prior). Frames
    * under the byte budget join broadcast; over it they join plain —
    * the distributed fallback. No pairing: a keyless table has no
    * identity to pair an update through. */
  private def positionStepChanges(
      s: SparkSession,
      diff: ChangesTable.StepDiff,
      posNew: Seq[graft.meta.DeleteFileDef],
      posPrev: Seq[graft.meta.DeleteFileDef],
      v: Int, schema: StructType,
      readRels: (Seq[String], StructType) => DataFrame,
      stamped: (DataFrame, String, Int) => DataFrame,
      dataDir: String,
      hint: DataFrame => DataFrame): Seq[DataFrame] = {
    val posSchema = StructType(Seq(StructField("file", StringType),
      StructField("pos", org.apache.spark.sql.types.LongType)))
    def frame(dfs: Seq[graft.meta.DeleteFileDef]): Option[DataFrame] =
      if (dfs.isEmpty) None
      else Some(s.read.schema(posSchema)
        .parquet(dfs.map(d => s"$dataDir/${d.path}"): _*))
    val newF = frame(posNew)
    val prevF = frame(posPrev)
    val esc = dataDir.replace("'", "\\'")
    def withPos(rels: Seq[String]): DataFrame =
      GraftTable.idReader(s).schema(if (rels.exists(GraftTable.isImportedRel))
          SchemaBridge.stripFieldIds(schema) else schema)
        .parquet(rels.map(r => s"$dataDir/$r"): _*)
        .select(col("*"),
          expr(s"substring(_metadata.file_path, " +
            s"locate('$esc/', _metadata.file_path) + ${dataDir.length + 1})")
            .as("__file"),
          col("_metadata.row_index").as("__pos"))
    def antiPrev(df: DataFrame): DataFrame = prevF match {
      case None => df
      case Some(p) => df.join(hint(p),
        df("__file") === p("file") && df("__pos") === p("pos"), "left_anti")
    }

    val inserted = if (diff.added.nonEmpty) Some(readRels(diff.added, schema))
      else None
    val hard =
      if (diff.removed.isEmpty) None
      else Some(antiPrev(withPos(diff.removed)))
    val masked = newF.flatMap { nf =>
      // only kept files the new delete references can emit masked rows
      val files = nf.select("file").distinct().collect()
        .map(_.getString(0)).toSet
      val cands = diff.kept.filter(files)
      if (cands.isEmpty) None
      else {
        val withMeta = withPos(cands)
        Some(antiPrev(withMeta.join(hint(nf),
          withMeta("__file") === nf("file") && withMeta("__pos") === nf("pos"),
          "leftsemi")))
      }
    }
    inserted.map(stamped(_, "insert", v)).toSeq ++
      (hard.toSeq ++ masked.toSeq).map(stamped(_, "delete", v))
  }
}
