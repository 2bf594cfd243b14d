package graft

import java.net.URI
import org.apache.hadoop.fs.Path

/** A Hadoop FileSystem with HDFS rename semantics, backed by local disk —
  * the MiniCluster stand-in this sandbox allows. It exercises the full
  * Hadoop FS API surface (open/create/listStatus/listFiles/mkdirs/
  * delete/rename) under a non-`file:` scheme, and enforces the ONE
  * semantic the HadoopMetadataStore CAS relies on: rename REFUSES an
  * existing destination (RawLocalFileSystem would happily clobber it via
  * POSIX rename(2), which is exactly the divergence this test must not
  * inherit). The check-and-rename pair is atomic within the JVM — the
  * same single-winner guarantee the HDFS NameNode provides cluster-wide. */
class HdfsLikeFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "hdfslike"
  override def getUri: URI = URI.create("hdfslike:///")

  override def rename(src: Path, dst: Path): Boolean =
    HdfsLikeFileSystem.renameLock.synchronized {
      if (exists(dst)) false else super.rename(src, dst)
    }
}

object HdfsLikeFileSystem {
  private[graft] val renameLock = new Object
}
