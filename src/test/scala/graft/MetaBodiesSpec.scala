package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.GraftCatalog

/** Externalized snapshot bodies (SnapshotBodies): version documents
  * must stay O(headers) while the engine reads fully-inflated metadata.
  * This is what keeps a commit from re-serializing every historical
  * snapshot's file list — the difference between O(commit) and
  * O(history × files) metadata I/O at 100 TB. */
class MetaBodiesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val wh = Files.createTempDirectory("graft-bodies-wh").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.bod", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.bod.warehouse", wh)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def metaDir(ns: String, t: String) = Paths.get(wh, ns, t, "metadata")

  private def versionText(ns: String, t: String, v: Int): String =
    new String(Files.readAllBytes(
      metaDir(ns, t).resolve(s"v$v.metadata.json")),
      java.nio.charset.StandardCharsets.UTF_8)

  private def bodyFiles(ns: String, t: String): Seq[String] =
    Files.list(metaDir(ns, t)).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".body.json")).toSeq

  test("version documents are slim; loads are inflated; bodies are shared") {
    spark.sql("CREATE NAMESPACE bod.m")
    spark.sql("CREATE TABLE bod.m.t (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO bod.m.t VALUES (1, 1.0)")
    spark.sql("INSERT INTO bod.m.t VALUES (2, 2.0)")
    spark.sql("INSERT INTO bod.m.t VALUES (3, 3.0)")

    // on-disk version documents carry NO file paths or stats inline
    val v4 = versionText("m", "t", 4)
    assert(!v4.contains(".parquet"),
      s"version doc must not inline data file paths:\n$v4")
    assert(v4.contains("bodyRef"), "snapshots must reference bodies")

    // one body per snapshot; earlier commits' bodies are REUSED, not
    // rewritten — body count grows by exactly one per commit
    val bodies = bodyFiles("m", "t")
    assert(bodies.size == 3, s"expected 3 bodies, got $bodies")

    // the engine sees fully inflated metadata
    val store = spark.sessionState.catalogManager.catalog("bod")
      .asInstanceOf[GraftCatalog].metadataStore
    val (meta, v) = store.load(Seq("m"), "t")
    assert(v == 4)
    assert(meta.currentSnapshot.get.files.nonEmpty)
    assert(meta.currentSnapshot.get.files.forall(_.endsWith(".parquet")))
    assert(meta.snapshots.forall(s => s.files.nonEmpty && s.fileSeqs.nonEmpty))

    // body mtimes: committing again must not touch existing bodies
    val before = bodyFiles("m", "t").map(n =>
      n -> Files.getLastModifiedTime(metaDir("m", "t").resolve(n))).toMap
    spark.sql("INSERT INTO bod.m.t VALUES (4, 4.0)")
    val after = bodyFiles("m", "t")
    assert(after.size == 4, s"one new body per commit, got $after")
    before.foreach { case (n, t0) =>
      assert(Files.getLastModifiedTime(metaDir("m", "t").resolve(n)) == t0,
        s"existing body $n was rewritten")
    }

    // time travel reads old versions through their bodies
    assert(spark.sql("SELECT count(*) FROM bod.m.t VERSION AS OF 2")
      .head().getLong(0) == 1L)
    assert(spark.table("bod.m.t").count() == 4L)
  }

  test("a cold body cache reads from disk (copied warehouse = new scope)") {
    // the body cache is process-wide and keyed by metadata-dir path, so
    // a copy of the warehouse at a DIFFERENT path is the only in-process
    // way to force the read-and-parse path for every body
    def copyTree(srcRoot: String, dstRoot: String): Unit = {
      val src = Paths.get(srcRoot)
      val walk = Files.walk(src)
      try walk.iterator().asScala.foreach { p =>
        val d = Paths.get(dstRoot).resolve(src.relativize(p).toString)
        if (Files.isDirectory(p)) Files.createDirectories(d)
        else Files.copy(p, d,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } finally walk.close()
    }
    val copy = Files.createTempDirectory("graft-bodies-copy").toString
    copyTree(wh, copy)
    val meta = new graft.meta.MetadataStore(copy).load(Seq("m"), "t")._1
    assert(meta.currentSnapshot.get.files.size == 4)
    assert(meta.snapshots.forall(s => s.files.nonEmpty && s.fileSeqs.nonEmpty))

    // an unreadable body fails loudly and names the document — never a
    // silently-empty table
    val copy2 = Files.createTempDirectory("graft-bodies-copy2").toString
    copyTree(wh, copy2)
    val md = Paths.get(copy2, "m", "t", "metadata")
    val victims = Files.list(md)
    try victims.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".body.json"))
      .foreach(p => Files.write(p, "not json".getBytes))
    finally victims.close()
    val e = intercept[IllegalStateException] {
      new graft.meta.MetadataStore(copy2).load(Seq("m"), "t")
    }
    assert(e.getMessage.contains("snapshot body"), e.getMessage)
  }

  test("expiry garbage-collects bodies no retained version references") {
    spark.sql("CREATE NAMESPACE bod.gc")
    spark.sql("CREATE TABLE bod.gc.t (id BIGINT)")
    spark.sql("INSERT INTO bod.gc.t VALUES (1)")
    spark.sql("INSERT INTO bod.gc.t VALUES (2)")
    // a body from a lost CAS retry: referenced by no version document
    val orphan = metaDir("gc", "t").resolve("snap-999-deadbeef.body.json")
    Files.write(orphan,
      """{"files":[],"fileStats":{},"deleteFiles":[],"fileSeqs":{}}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 7200000L))
    val before = bodyFiles("gc", "t").toSet
    assert(before.contains(orphan.getFileName.toString))

    val cat = spark.sessionState.catalogManager.catalog("bod")
      .asInstanceOf[GraftCatalog]
    cat.expireSnapshots(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("gc"), "t"), keep = 1, graceMs = 3600000L)

    val after = bodyFiles("gc", "t").toSet
    assert(!after.contains(orphan.getFileName.toString),
      "the unreferenced stale body must be collected")
    // the retained version's bodies survive (fresh ones also ride the
    // grace window), and the table still reads
    val meta = spark.sessionState.catalogManager.catalog("bod")
      .asInstanceOf[GraftCatalog].metadataStore
      .load(Seq("gc"), "t")._1
    val live = meta.snapshots.flatMap(_.bodyRef).toSet
    assert(live.subsetOf(after), s"live bodies $live must survive (have $after)")
    assert(spark.table("bod.gc.t").count() == 2L)
    // and the document itself was trimmed: expired history's snapshot
    // entries are gone, only the retained current remains
    assert(meta.snapshots.map(_.snapshotId) ==
      meta.currentSnapshotId.toList,
      s"history must trim to the retained snapshots: ${meta.snapshots}")
  }

  test("ref-pinned snapshots survive history trimming") {
    spark.sql("CREATE NAMESPACE bod.pin")
    spark.sql("CREATE TABLE bod.pin.t (id BIGINT)")
    spark.sql("INSERT INTO bod.pin.t VALUES (1)")
    val store = spark.sessionState.catalogManager.catalog("bod")
      .asInstanceOf[GraftCatalog].metadataStore
    val first = store.load(Seq("pin"), "t")._1.currentSnapshotId.get
    store.commitOps(Seq("pin"), "t", Nil,
      Seq(graft.commit.MetadataUpdate.SetRef("good", first, "tag")))
    spark.sql("INSERT INTO bod.pin.t VALUES (2)")
    spark.sql("INSERT INTO bod.pin.t VALUES (3)")

    val cat = spark.sessionState.catalogManager.catalog("bod")
      .asInstanceOf[GraftCatalog]
    cat.expireSnapshots(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("pin"), "t"), keep = 1, graceMs = 3600000L)

    val meta = store.load(Seq("pin"), "t")._1
    val ids = meta.snapshots.map(_.snapshotId).toSet
    assert(ids.contains(first), "the tagged snapshot must survive the trim")
    assert(ids.contains(meta.currentSnapshotId.get))
    assert(ids.size == 2, s"middle history must trim away: $ids")
    // the pinned snapshot still time-travels through its body
    assert(spark.sql("SELECT count(*) FROM bod.pin.t VERSION AS OF 'good'")
      .head().getLong(0) == 1L)
  }

  test("delete files and sequence maps round-trip through bodies") {
    spark.sql("CREATE NAMESPACE bod.mor")
    spark.sql("""CREATE TABLE bod.mor.t (id BIGINT NOT NULL, v DOUBLE)
      TBLPROPERTIES (
        'identifier-fields' = 'id',
        'write.delete.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO bod.mor.t VALUES (1, 1.0), (2, 2.0)")
    spark.sql("DELETE FROM bod.mor.t WHERE id = 2")
    val store = spark.sessionState.catalogManager.catalog("bod")
      .asInstanceOf[GraftCatalog].metadataStore
    val s = store.load(Seq("mor"), "t")._1.currentSnapshot.get
    assert(s.deleteFiles.nonEmpty && s.fileSeqs.nonEmpty)
    assert(spark.table("bod.mor.t").collect().map(_.getLong(0)).toSeq == Seq(1L))
    // and the slim on-disk form inlines neither flavor of file list
    val vCur = store.currentVersion(Seq("mor"), "t")
    assert(!versionText("mor", "t", vCur).contains(".parquet"))
  }
}
