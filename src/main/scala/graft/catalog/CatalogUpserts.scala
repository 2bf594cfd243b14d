package graft.catalog

import org.apache.spark.sql.DataFrame

import graft.commit._
import graft.meta._

/** One micro-batch of upserts as ONE atomic [[MetadataUpdate.RowDelta]]:
  * an equality-delete file of the batch's keys (retiring every older
  * version of those rows) plus the batch's rows as ordinary
  * partition-laid data files at the same sequence — the Flink-CDC-style
  * "upsert stream into a lakehouse table" commit shape.
  *
  * Concurrency falls out of equality-delete sequencing rather than
  * locking: the delete applies only to files with a strictly lower
  * sequence, so the batch can never swallow its own rows, a racing
  * append commits at a higher sequence and is untouched, and two upsert
  * epochs serialize by their commit order. No snapshot assertion is
  * needed — the only guard callers attach is the per-epoch idempotence
  * fence ([[Requirement.AssertMaxSummaryBelow]]).
  *
  * Each epoch adds one delete file; the scan-side byte budget
  * ([[MergeOnRead.byteBudget]]) and periodic compaction (which folds
  * deletes in and restores the vectorized read path) keep the live set
  * broadcast-class.
  */
object CatalogUpserts {

  def upsertBatch(store: MetaStore, ns: Seq[String], table: String,
                  batch0: DataFrame,
                  requirements: Seq[Requirement] = Nil,
                  extraSummary: Map[String, String] = Map.empty,
                  extraDeleteKeys: Option[DataFrame] = None): Unit = {
    val (meta0, _) = store.load(ns, table)
    val schema = SchemaBridge.toSpark(meta0.currentSchema)
    val keys = MergeOnRead.keyFields(meta0.properties, schema)
    val keyNames = keys.map(_._1)
    // two versions of one key INSIDE a batch have no defined order —
    // keep one deterministically rather than both (both surviving would
    // violate the key's uniqueness from this commit on)
    val batch = batch0.dropDuplicates(keyNames)
    val commitId = java.util.UUID.randomUUID().toString
    val relDir = s"commit-upsert-$commitId"
    val dataDir = store.dataDir(ns, table)

    val dataRels = WriteShaping.writeDataFiles(batch, meta0, store, ns, table,
      relDir)
    if (dataRels.isEmpty && extraDeleteKeys.isEmpty)
      return // empty batch: nothing to retire either

    // the batch's keys — plus any PURE-delete keys the caller retires
    // without replacement (a changelog sync's deleted rows) — as a flat
    // parquet. The final dropDuplicates shuffles on the key columns and
    // AQE coalesces its output partitions by size, so a micro-batch
    // lands as one small delete file while a giant sync window fans out
    // to right-sized files instead of funneling through one task.
    def keyProjection(df: DataFrame): DataFrame =
      df.select(keyNames.map(n =>
        org.apache.spark.sql.functions.col(n)
          .cast(schema.fields(schema.fieldIndex(n)).dataType).as(n,
            schema.fields(schema.fieldIndex(n)).metadata)): _*)
    val keyDf = extraDeleteKeys.map(keyProjection)
      .foldLeft(keyProjection(batch))(_ unionByName _)
      .dropDuplicates(keyNames)
    val deletesDir = s"$dataDir/$relDir-deletes"
    keyDf.write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
      .parquet(deletesDir)
    val deleteRels = store.listParquetUnder(deletesDir)
      .map(f => s"$relDir-deletes/$f")
    // per-file rows + bytes come off footers and file stats (driver,
    // O(KB) each) — the scan-side byte budget and the changelog bound
    // both read these, and no second Spark job re-counts the keys.
    // Zero-row files (a sync window that nets to nothing) are dropped
    // on the spot: committing them would accumulate no-op delete files
    // in the merge-on-read live set until compaction.
    val hconf = batch.sparkSession.sessionState.newHadoopConf()
    val (deleteDefs, emptyRels) = deleteRels.map { rel =>
      DeleteFileDef(rel, 0L, keys.map(_._2).toList,
        FileStats.rowCount(s"$dataDir/$rel", hconf).getOrElse(0L),
        store.fileSizeBytes(s"$dataDir/$rel").getOrElse(0L))
    }.partition(_.rows > 0)
    emptyRels.foreach(d => store.deleteFileIfExists(s"$dataDir/${d.path}"))

    val stats = FileStats.harvestAll(batch.sparkSession, dataDir, dataRels)
    try store.commitOps(ns, table, requirements,
      Seq(MetadataUpdate.RowDelta(dataRels, deleteDefs.toList,
        System.currentTimeMillis(), stats,
        // data files went through the sorting write layout — stamp it
        extraSummary ++ WriteShaping.sortStamp(meta0.properties))))
    catch { case e: Throwable =>
      // fence rejection or CAS exhaustion: this attempt's files are
      // orphans either way — remove them before surfacing the failure
      (dataRels ++ deleteRels).foreach(rel =>
        store.deleteFileIfExists(s"$dataDir/$rel"))
      throw e
    }
  }
}
