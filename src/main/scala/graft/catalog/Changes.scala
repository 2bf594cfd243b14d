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
    val ns = parts.tail.init.toSeq
    val table = parts.last
    val toV = toVersion.getOrElse(store.currentVersion(ns, table))
    require(fromVersion <= toV,
      s"changes-from $fromVersion is above changes-to $toV")

    val metaTo = store.loadVersion(ns, table, toV)
    val schema = SchemaBridge.toSpark(metaTo.currentSchema)
    val dataDir = store.dataDir(ns, table)
    // field-id column resolution ON: files written before a rename must
    // serve the renamed column, and delete-key files resolve by id
    if (!s.conf.get("spark.sql.parquet.fieldId.read.enabled", "false").toBoolean)
      s.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")

    def readRels(rels: Seq[String], readSchema: StructType = schema): DataFrame =
      s.read.schema(readSchema).parquet(rels.map(r => s"$dataDir/$r"): _*)

    val outSchema = StructType(schema.fields ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_version", IntegerType, nullable = false)))
    def empty: DataFrame =
      s.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), outSchema)

    def stamped(df: DataFrame, change: String, v: Int): DataFrame =
      df.select(schema.fieldNames.map(col).toSeq: _*)
        .withColumn("_change_type", lit(change))
        .withColumn("_commit_version", lit(v))

    // the table's state AS OF a version, through the real MoR read path
    // (prior equality deletes applied — no phantom preimages)
    val quotedIdent = parts.map(p => s"`$p`").mkString(".")
    def stateAt(v: Int): DataFrame =
      s.sql(s"SELECT * FROM $quotedIdent VERSION AS OF $v")

    val steps: Seq[DataFrame] = ((fromVersion + 1) to toV).flatMap { v =>
      val meta = store.loadVersion(ns, table, v)
      val prev = if (v - 1 >= 1) Some(store.loadVersion(ns, table, v - 1)) else None
      // every step reads through the FINAL schema (field-id resolution
      // maps older files), so one feed has ONE schema across renames
      stepChanges(s, meta, prev, v, schema, readRels, stamped, stateAt, dataDir)
    }
    steps.reduceOption(_ unionByName _).getOrElse(empty)
  }

  private def stepChanges(
      s: SparkSession,
      meta: TableMetadata, prevMeta: Option[TableMetadata], v: Int,
      schema: StructType,
      readRels: (Seq[String], StructType) => DataFrame,
      stamped: (DataFrame, String, Int) => DataFrame,
      stateAt: Int => DataFrame,
      dataDir: String): Seq[DataFrame] = {
    val snap = meta.currentSnapshot
    val prevSnap = prevMeta.flatMap(_.currentSnapshot)
    if (snap.map(_.snapshotId) == prevSnap.map(_.snapshotId))
      return Nil // schema/property/ref-only commit: no data change
    if (snap.exists(_.summary.get("rewrite-kind").contains("compaction")))
      return Nil // compaction/clustering: same rows, new layout

    val files = snap.map(_.files).getOrElse(Nil)
    val prevFiles = prevSnap.map(_.files).getOrElse(Nil)
    val added = files.filterNot(prevFiles.toSet)
    val removed = prevFiles.filterNot(files.toSet)
    val newDeletes = {
      val before = prevSnap.map(_.deleteFiles.map(_.path).toSet).getOrElse(Set.empty)
      snap.map(_.deleteFiles).getOrElse(Nil).filterNot(d => before(d.path))
    }

    val inserted = if (added.nonEmpty) Some(readRels(added, schema)) else None
    val hardDeleted = if (removed.nonEmpty) Some(readRels(removed, schema)) else None

    if (newDeletes.isEmpty) {
      inserted.map(stamped(_, "insert", v)).toSeq ++
        hardDeleted.map(stamped(_, "delete", v)).toSeq
    } else {
      // equality deletes mask rows of files OLDER than the delete's
      // sequence — the same scoping rule the MoR scan applies
      val keyNames = newDeletes.flatMap(_.keyFieldIds).distinct
        .map(MergeOnRead.nameOfFieldId(schema, _))
      val keySchema = StructType(keyNames.map(n =>
        schema.fields(schema.fieldIndex(n))))
      val delKeys = s.read.schema(keySchema)
        .parquet(newDeletes.map(d => s"$dataDir/${d.path}"): _*).distinct()
      // the rows being masked: prior STATE ∩ delete keys. State comes
      // through the MoR time-travel read, so a key already deleted by
      // an earlier commit yields no phantom preimage; every v-1 file is
      // older than this commit's sequence, so no extra seq scoping is
      // needed. Keys are bounded by the MoR size guard — broadcast.
      val masked = stateAt(v - 1)
        .join(broadcast(delKeys), keyNames, "leftsemi")
      val insKeys = inserted.map(_.select(keyNames.map(col).toSeq: _*).distinct())
      // key re-inserted in the same commit → update pair, else delete/insert
      val delMarked = insKeys match {
        case Some(ik) =>
          masked.join(broadcast(ik.withColumn("__re", lit(true))), keyNames, "left")
            .withColumn("_ct",
              when(col("__re"), "update_preimage").otherwise("delete"))
            .drop("__re")
        case None => masked.withColumn("_ct", lit("delete"))
      }
      val insMarked = inserted.map { ins =>
        ins.join(broadcast(delKeys.withColumn("__upd", lit(true))), keyNames, "left")
          .withColumn("_ct",
            when(col("__upd"), "update_postimage").otherwise("insert"))
          .drop("__upd")
      }
      def finish(df: DataFrame): DataFrame =
        df.select((schema.fieldNames.map(col) :+ col("_ct")).toSeq: _*)
          .withColumnRenamed("_ct", "_change_type")
          .withColumn("_commit_version", lit(v))
      Seq(finish(delMarked)) ++ insMarked.map(finish) ++
        hardDeleted.map(stamped(_, "delete", v)).toSeq
    }
  }
}
