package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.ManifestFileIndex

/** The manifest-backed planning index: lengths come from dir-batched
  * listings, but only REFERENCED names may enter the cache — a
  * neighboring in-flight file (the streaming staging dir shape) must
  * never be recorded, or a partial length would freeze and silently
  * drop rows after that file commits. */
class ManifestFileIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("an unreferenced neighbor's length is never cached") {
    val dir = Files.createTempDirectory("graft-mfi").toString
    Files.createDirectories(Paths.get(dir, "commit-a"))
    Files.write(Paths.get(dir, "commit-a/f1.parquet"), Array[Byte](1, 2, 3))
    // an "in-flight" neighbor, present but not referenced by a manifest
    Files.write(Paths.get(dir, "commit-a/f2.parquet"), Array[Byte](9))

    val first = ManifestFileIndex.lengthsFor(spark, dir, Seq("commit-a/f1.parquet"))
    assert(first == Map("commit-a/f1.parquet" -> 3L))

    // the neighbor "finishes writing" AFTER the listing that saw it
    Files.write(Paths.get(dir, "commit-a/f2.parquet"),
      Array[Byte](1, 2, 3, 4, 5, 6, 7))

    // first reference of the neighbor must see the FINAL length — a
    // dir-level cache would have frozen the 1-byte snapshot
    val second = ManifestFileIndex.lengthsFor(spark, dir,
      Seq("commit-a/f1.parquet", "commit-a/f2.parquet"))
    assert(second == Map("commit-a/f1.parquet" -> 3L,
      "commit-a/f2.parquet" -> 7L), second.toString)
  }

  test("statuses carry qualified paths and manifest lengths") {
    val dir = Files.createTempDirectory("graft-mfi2").toString
    Files.createDirectories(Paths.get(dir, "commit-b"))
    Files.write(Paths.get(dir, "commit-b/f.parquet"), Array[Byte](1, 2))
    val st = ManifestFileIndex.statusesFor(spark, dir, Seq("commit-b/f.parquet"))
    assert(st.length == 1)
    assert(st(0).getLen == 2L)
    assert(st(0).getPath.toUri.getScheme == "file",
      s"expected a qualified path, got ${st(0).getPath}")
  }
}
