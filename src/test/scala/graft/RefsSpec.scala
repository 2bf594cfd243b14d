package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Identifier
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.GraftCatalog

/** Branches, tags, and the write-audit-publish loop: named snapshot
  * pointers resolved by `VERSION AS OF '<ref>'`, branch writes that
  * never move main, ancestry-checked fast-forward publish, and
  * expiry that pins everything a ref can reach. */
class RefsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val wh = Files.createTempDirectory("graft-refs-wh").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.refs", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.refs.warehouse", wh)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def catalog: GraftCatalog =
    spark.sessionState.catalogManager.catalog("refs").asInstanceOf[GraftCatalog]

  private def ident(ns: String, t: String) = Identifier.of(Array(ns), t)

  private def ids(table: String): Seq[Long] =
    spark.sql(s"SELECT id FROM $table").collect().map(_.getLong(0)).sorted.toSeq

  test("a tag pins a snapshot; later appends don't move it; tags are immutable") {
    spark.sql("CREATE NAMESPACE refs.tag")
    spark.sql("CREATE TABLE refs.tag.t (id BIGINT)")
    spark.sql("INSERT INTO refs.tag.t VALUES (1), (2)")
    catalog.createTag(ident("tag", "t"), "v1_good")
    spark.sql("INSERT INTO refs.tag.t VALUES (3)")

    assert(ids("refs.tag.t") == Seq(1L, 2L, 3L))
    assert(ids("refs.tag.t VERSION AS OF 'v1_good'") == Seq(1L, 2L))
    // immutable: re-pointing the tag is refused
    val e = intercept[Exception] {
      catalog.createTag(ident("tag", "t"), "v1_good")
    }
    assert(e.getMessage.contains("immutable"), e.getMessage)
    // drop + recreate moves it
    catalog.dropRef(ident("tag", "t"), "v1_good")
    catalog.createTag(ident("tag", "t"), "v1_good")
    assert(ids("refs.tag.t VERSION AS OF 'v1_good'") == Seq(1L, 2L, 3L))
  }

  test("write-audit-publish: stage on a branch, main untouched, then publish") {
    spark.sql("CREATE NAMESPACE refs.wap")
    spark.sql("CREATE TABLE refs.wap.t (id BIGINT)")
    spark.sql("INSERT INTO refs.wap.t VALUES (1)")
    catalog.createBranch(ident("wap", "t"), "audit")

    // WRITE: stage on the branch
    spark.range(2, 4).toDF("id")
      .writeTo("refs.wap.t").option("branch", "audit").append()

    // AUDIT: main unchanged, branch sees staged rows
    assert(ids("refs.wap.t") == Seq(1L))
    assert(ids("refs.wap.t VERSION AS OF 'audit'") == Seq(1L, 2L, 3L))

    // $refs shows both pointers
    val refRows = spark.sql("SELECT name, type FROM refs.wap.`t$refs`")
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    assert(refRows == Seq(("audit", "branch"), ("main", "branch")), refRows)

    // PUBLISH: fast-forward main to the audited branch head
    catalog.fastForward(ident("wap", "t"), "audit")
    assert(ids("refs.wap.t") == Seq(1L, 2L, 3L))
    // appends keep stacking on published main
    spark.sql("INSERT INTO refs.wap.t VALUES (9)")
    assert(ids("refs.wap.t") == Seq(1L, 2L, 3L, 9L))
  }

  test("publish refuses when main moved since the fork (no silent drop)") {
    spark.sql("CREATE NAMESPACE refs.race")
    spark.sql("CREATE TABLE refs.race.t (id BIGINT)")
    spark.sql("INSERT INTO refs.race.t VALUES (1)")
    catalog.createBranch(ident("race", "t"), "stage")
    spark.range(10, 12).toDF("id")
      .writeTo("refs.race.t").option("branch", "stage").append()
    // main moves AFTER the fork
    spark.sql("INSERT INTO refs.race.t VALUES (2)")

    val e = intercept[Exception] { catalog.fastForward(ident("race", "t"), "stage") }
    assert(e.getMessage.contains("not an ancestor"), e.getMessage)
    // both lines intact
    assert(ids("refs.race.t") == Seq(1L, 2L))
    assert(ids("refs.race.t VERSION AS OF 'stage'") == Seq(1L, 10L, 11L))
  }

  test("branch and main appends interleave without losing either") {
    spark.sql("CREATE NAMESPACE refs.mix")
    spark.sql("CREATE TABLE refs.mix.t (id BIGINT)")
    spark.sql("INSERT INTO refs.mix.t VALUES (1)")
    catalog.createBranch(ident("mix", "t"), "b")
    spark.range(100, 101).toDF("id")
      .writeTo("refs.mix.t").option("branch", "b").append()
    spark.sql("INSERT INTO refs.mix.t VALUES (2)")
    spark.range(101, 102).toDF("id")
      .writeTo("refs.mix.t").option("branch", "b").append()

    assert(ids("refs.mix.t") == Seq(1L, 2L))
    // the branch accumulated its own line from the fork point — main's
    // post-fork rows are not on it
    assert(ids("refs.mix.t VERSION AS OF 'b'") == Seq(1L, 100L, 101L))
  }

  test("branch writes refuse overwrite; tags refuse writes; unknown refs fail") {
    spark.sql("CREATE NAMESPACE refs.guard")
    spark.sql("CREATE TABLE refs.guard.t (id BIGINT)")
    spark.sql("INSERT INTO refs.guard.t VALUES (1)")
    catalog.createTag(ident("guard", "t"), "pin")
    catalog.createBranch(ident("guard", "t"), "b")

    val e1 = intercept[Exception] {
      spark.range(5).toDF("id")
        .writeTo("refs.guard.t").option("branch", "b")
        .overwrite(org.apache.spark.sql.functions.lit(true))
    }
    assert((e1.getMessage != null && e1.getMessage.contains("append only")) ||
      e1.toString.contains("append only"), e1.toString)
    val e2 = intercept[Exception] {
      spark.range(5).toDF("id")
        .writeTo("refs.guard.t").option("branch", "pin").append()
    }
    assert(e2.toString.contains("tag") || e2.getMessage.contains("tag"), e2.toString)
    val e3 = intercept[Exception] {
      spark.sql("SELECT * FROM refs.guard.t VERSION AS OF 'nope'").collect()
    }
    assert(e3.toString.contains("nope"), e3.toString)
    // numeric names would be shadowed by version time travel — refused
    val e4 = intercept[Exception] {
      catalog.createTag(ident("guard", "t"), "2024")
    }
    assert(e4.getMessage.contains("shadowed"), e4.getMessage)
    // a refused branch write must not strand data files: the guard
    // fires BEFORE anything is written
    val store = catalog.metadataStore
    val dataDir = store.dataDir(Seq("guard"), "t")
    val filesBefore = store.listParquetUnder(dataDir).size
    intercept[Exception] {
      spark.range(5).toDF("id")
        .writeTo("refs.guard.t").option("branch", "missing").append()
    }
    assert(store.listParquetUnder(dataDir).size == filesBefore,
      "failed branch write stranded files")
  }

  test("expiry never removes files a ref still reaches") {
    spark.sql("CREATE NAMESPACE refs.exp")
    spark.sql("CREATE TABLE refs.exp.t (id BIGINT)")
    spark.sql("INSERT INTO refs.exp.t VALUES (1)")
    catalog.createTag(ident("exp", "t"), "keepme")
    // overwrite main: the v1 file is now unreachable from main...
    spark.sql("INSERT OVERWRITE refs.exp.t VALUES (2)")
    spark.sql("INSERT INTO refs.exp.t VALUES (3)")
    // ...and expiry with zero grace keeps it anyway (the tag reaches it)
    catalog.expireSnapshots(ident("exp", "t"), keep = 1, graceMs = 0L)
    assert(ids("refs.exp.t") == Seq(2L, 3L))
    assert(ids("refs.exp.t VERSION AS OF 'keepme'") == Seq(1L))
  }
}
