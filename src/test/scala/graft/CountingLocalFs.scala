package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.hadoop.fs.{FileStatus, LocalFileSystem, Path}

/** A `file:` FileSystem that records every driver-side metadata call —
  * the probe behind the "steady-state planning performs ZERO filesystem
  * metadata calls" invariant (r7 finding: SPJ and position-CDC planning
  * stat'ed every data file per query). Tests install it per-session via
  * `spark.conf.set("fs.file.impl", ...)` + `fs.file.impl.disable.cache`
  * (session confs are copied verbatim into `newHadoopConf`), plan a
  * query, and assert which paths were stat'ed/listed. */
class CountingLocalFs extends LocalFileSystem {
  override def getFileStatus(f: Path): FileStatus = {
    CountingLocalFs.stats.add(f.toString)
    super.getFileStatus(f)
  }
  override def listStatus(f: Path): Array[FileStatus] = {
    CountingLocalFs.lists.add(f.toString)
    super.listStatus(f)
  }
}

object CountingLocalFs {
  val stats = new ConcurrentLinkedQueue[String]()
  val lists = new ConcurrentLinkedQueue[String]()
  def reset(): Unit = { stats.clear(); lists.clear() }
  def statPaths: Seq[String] = stats.toArray(Array.empty[String]).toSeq
  def listPaths: Seq[String] = lists.toArray(Array.empty[String]).toSeq

  /** Run `body` with the counting FS installed as the session's `file:`
    * implementation, then restore. */
  def installed[A](spark: org.apache.spark.sql.SparkSession)(body: => A): A = {
    spark.conf.set("fs.file.impl", classOf[CountingLocalFs].getName)
    spark.conf.set("fs.file.impl.disable.cache", "true")
    try body
    finally {
      spark.conf.unset("fs.file.impl")
      spark.conf.unset("fs.file.impl.disable.cache")
    }
  }
}
