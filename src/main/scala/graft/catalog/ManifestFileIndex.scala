package graft.catalog

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.{PartitionSpec, PartitioningAwareFileIndex}

/** A file index built from what the CATALOG already knows — the
  * manifest's file list plus directory-batched lengths — instead of
  * `InMemoryFileIndex`'s per-file `getFileStatus` sweep. Planning a
  * query over a 100k-file table previously issued 100k driver-side
  * filesystem RPCs per query (the file-source index stats every
  * explicit path it is given); this index issues at most one
  * `listStatus` per NEW commit directory ever (lengths are memoized —
  * committed data files are immutable), so steady-state planning does
  * zero filesystem metadata calls. The Iceberg scaling argument,
  * applied to the delegate: plan from the manifest, not from listings.
  *
  * Partitioning is reported empty on purpose: graft's hidden
  * partitioning is pruned by the MANIFEST layer (dir replay +
  * min/max stats) before the delegate ever sees a file list, and
  * every downstream consumer (MorScan, KeyedScan, PosDeltaScan)
  * builds `PartitionedFile`s with empty partition values. */
private[graft] class ManifestFileIndex(
    spark: SparkSession, statuses: Array[FileStatus])
  extends PartitioningAwareFileIndex(spark, Map.empty, None) {

  private val byPath = {
    val m = scala.collection.mutable.LinkedHashMap.empty[Path, FileStatus]
    statuses.foreach(s => m(s.getPath) = s)
    m
  }

  override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec
  override protected def leafFiles
      : scala.collection.mutable.LinkedHashMap[Path, FileStatus] = byPath
  override protected def leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    statuses.groupBy(_.getPath.getParent)
  override def rootPaths: Seq[Path] = statuses.map(_.getPath).toSeq
  override def refresh(): Unit = ()
}

private[graft] object ManifestFileIndex {

  /** dir → (file name → length), listed AT MOST ONCE per directory
    * (commit dirs are written once, then referenced forever). A file
    * missing from a cached listing (raced a concurrent writer into the
    * same commit dir) falls back to one direct stat. */
  private val dirListCache =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, Long]]()

  private def dirSizes(dirAbs: String,
                       hconf: org.apache.hadoop.conf.Configuration)
      : Map[String, Long] = {
    if (dirListCache.size > (1 << 18)) dirListCache.clear()
    dirListCache.computeIfAbsent(dirAbs, { d =>
      val p = new Path(d)
      p.getFileSystem(hconf).listStatus(p)
        .filter(_.isFile).map(s => s.getPath.getName -> s.getLen).toMap
    })
  }

  /** Statuses for manifest-relative files under `dataDir`, lengths from
    * the directory-batched memo. */
  def statusesFor(spark: SparkSession, dataDir: String,
                  rels: Seq[String]): Array[FileStatus] = {
    val hconf = spark.sessionState.newHadoopConf()
    val fs = new Path(dataDir).getFileSystem(hconf)
    rels.map { rel =>
      // the index is consulted with QUALIFIED paths (scheme + authority)
      // — a raw path would never match allFiles()'s lookups
      val abs = fs.makeQualified(new Path(s"$dataDir/$rel"))
      val len = dirSizes(abs.getParent.toString, hconf)
        .getOrElse(abs.getName, fs.getFileStatus(abs).getLen)
      // mtime 0 is safe: nothing downstream consults it (the
      // modification-time metadata column is never exposed)
      new FileStatus(len, false, 1, 128L << 20, 0L, abs)
    }.toArray
  }
}
