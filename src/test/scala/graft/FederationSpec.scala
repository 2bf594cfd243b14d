package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.GraftCatalog
import graft.meta.RestMetadataStore
import graft.server.RestServer

/** Federation: a GraftCatalog whose metadata backend is ANOTHER graft
  * catalog's REST server (the reference's `rest` backend, `main.go:14`)
  * — proving the wire protocol is complete enough to be its own
  * backend. The front catalog's warehouse is `http://…`; data files land
  * on the backing catalog's (shared) storage. */
class FederationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val backWh = Files.createTempDirectory("graft-fed-back-wh").toString
  private val backing = new GraftCatalog
  private var server: RestServer = _
  private var port: Int = _

  lazy val spark: SparkSession = {
    backing.initialize("backing", new CaseInsensitiveStringMap(
      java.util.Map.of("warehouse", backWh)))
    server = new RestServer(backing)
    port = server.start()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.catalog.fed", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.fed.warehouse", s"http://127.0.0.1:$port")
      .getOrCreate()
  }

  override def afterAll(): Unit = { spark.stop(); server.stop() }

  test("warehouse scheme http dispatches to the REST-delegating store") {
    spark.sql("SELECT 1").collect()
    val cat = spark.sessionState.catalogManager.catalog("fed")
      .asInstanceOf[GraftCatalog]
    assert(cat.metadataStore.isInstanceOf[RestMetadataStore])
  }

  test("full SQL lifecycle through the delegating catalog") {
    spark.sql("CREATE NAMESPACE fed.corp WITH PROPERTIES ('team'='data')")
    spark.sql("CREATE TABLE fed.corp.ev (id BIGINT, cat STRING) PARTITIONED BY (cat)")
    spark.sql("INSERT INTO fed.corp.ev VALUES (1,'a'),(2,'b')")
    spark.sql("INSERT INTO fed.corp.ev VALUES (3,'a')")
    assert(spark.table("fed.corp.ev").count() == 3)
    // filters still prune through the delegated manifest
    assert(spark.sql("SELECT id FROM fed.corp.ev WHERE cat='b'")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    // schema evolution rides the wire commit algebra
    spark.sql("ALTER TABLE fed.corp.ev ADD COLUMN note STRING")
    assert(spark.table("fed.corp.ev").columns.toSeq ==
      Seq("id", "cat", "note"))
    spark.sql("ALTER TABLE fed.corp.ev SET TBLPROPERTIES ('x'='1')")

    // every mutation is observable in the BACKING catalog: the front
    // holds no state of its own
    val (m, v) = backing.metadataStore.load(Seq("corp"), "ev")
    assert(m.snapshots.size == 2, s"backing saw ${m.snapshots.size} snapshots")
    assert(m.properties.get("x").contains("1"))
    assert(m.currentSchema.fields.map(_.name) == List("id", "cat", "note"))
    // data files live under the BACKING warehouse
    assert(m.currentSnapshot.get.files.nonEmpty)
    assert(m.location.startsWith(backWh))
    // per-file stats survived the delegated commit (file-stats extension)
    assert(m.currentSnapshot.get.fileStats.nonEmpty,
      "manifest stats lost through the wire commit")

    // overwrite, rename, drop — all through the front
    spark.sql("INSERT OVERWRITE fed.corp.ev VALUES (9,'z','n')")
    assert(spark.table("fed.corp.ev").collect().map(_.getLong(0)).toSeq == Seq(9L))
    spark.sql("ALTER TABLE fed.corp.ev RENAME TO corp.ev2")
    assert(spark.table("fed.corp.ev2").count() == 1)
    assert(backing.metadataStore.tableExists(Seq("corp"), "ev2"))
    spark.sql("DROP TABLE fed.corp.ev2")
    assert(!backing.metadataStore.tableExists(Seq("corp"), "ev2"))
    spark.sql("DROP NAMESPACE fed.corp")
    assert(!backing.metadataStore.namespaceExists(Seq("corp")))
  }

  test("conflicting commits are arbitrated by the backing committer") {
    spark.sql("CREATE NAMESPACE fed.race")
    spark.sql("CREATE TABLE fed.race.t (id BIGINT)")
    val front = spark.sessionState.catalogManager.catalog("fed")
      .asInstanceOf[GraftCatalog].metadataStore
    // 6 threads × 5 property commits through the wire all land exactly once
    val threads = (0 until 6).map { i =>
      new Thread(() => (0 until 5).foreach { j =>
        front.commitOps(Seq("race"), "t", Nil,
          Seq(graft.commit.MetadataUpdate.SetProperties(Map(s"k-$i-$j" -> "1"))))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val (m, v) = backing.metadataStore.load(Seq("race"), "t")
    assert(v == 31, s"expected 31 versions (create + 30 commits), got $v")
    assert((0 until 6).forall(i => (0 until 5).forall(j =>
      m.properties.contains(s"k-$i-$j"))))
  }

  test("time travel reaches non-current versions through the wire") {
    // the race table has 31 metadata versions; v1 is the empty create
    assert(spark.sql("SELECT * FROM fed.race.t VERSION AS OF 1").count() == 0)
    val front = spark.sessionState.catalogManager.catalog("fed")
      .asInstanceOf[GraftCatalog].metadataStore
    val early = front.loadVersion(Seq("race"), "t", 2).properties
    val now = front.load(Seq("race"), "t")._1.properties
    assert(early.size < now.size, s"v2 (${early.size} props) should predate " +
      s"current (${now.size} props)")
    // an out-of-range version surfaces as a missing-table 404
    intercept[Exception] { front.loadVersion(Seq("race"), "t", 99) }
  }

  test("merge-on-read DML and refs ride the wire commit algebra") {
    val cat = spark.sessionState.catalogManager.catalog("fed")
      .asInstanceOf[GraftCatalog]
    spark.sql("CREATE NAMESPACE IF NOT EXISTS fed.mor")
    spark.sql("""CREATE TABLE fed.mor.t (id BIGINT NOT NULL, v DOUBLE)
      TBLPROPERTIES ('identifier-fields' = 'id',
        'write.delete.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO fed.mor.t VALUES (1,1.0),(2,2.0),(3,3.0)")

    // row-delta verb: the equality-delete commit crosses the wire
    spark.sql("DELETE FROM fed.mor.t WHERE id = 2")
    assert(spark.table("fed.mor.t").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L))
    val backMeta = backing.metadataStore.load(Seq("mor"), "t")._1
    assert(backMeta.currentSnapshot.get.deleteFiles.nonEmpty,
      "delete files must reach the backing catalog's metadata")

    // set-ref / append-files-to-ref / fast-forward / remove-ref verbs
    val id = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("mor"), "t")
    cat.createBranch(id, "stage")
    spark.range(10, 12).toDF("id").selectExpr("id", "CAST(id AS DOUBLE) AS v")
      .writeTo("fed.mor.t").option("branch", "stage").append()
    assert(spark.table("fed.mor.t").count() == 2) // main untouched
    assert(spark.sql("SELECT * FROM fed.mor.t VERSION AS OF 'stage'")
      .count() == 4)
    cat.fastForward(id, "stage")
    cat.dropRef(id, "stage")
    assert(spark.table("fed.mor.t").count() == 4)
    assert(backing.metadataStore.load(Seq("mor"), "t")._1.refs.isEmpty)
  }

  test("position-delta DML and delete-file rewrite ride the wire") {
    val cat = spark.sessionState.catalogManager.catalog("fed")
      .asInstanceOf[GraftCatalog]
    spark.sql("CREATE NAMESPACE IF NOT EXISTS fed.posw")
    spark.sql("""CREATE TABLE fed.posw.t (id BIGINT, v DOUBLE)
      TBLPROPERTIES ('write.delete.mode' = 'merge-on-read',
        'write.update.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO fed.posw.t VALUES (1,1.0),(2,2.0),(3,3.0)")
    spark.sql("DELETE FROM fed.posw.t WHERE id = 1")   // position marks
    spark.sql("UPDATE fed.posw.t SET v = 20.0 WHERE id = 2") // pos delta
    val backSnap = backing.metadataStore.load(Seq("posw"), "t")._1
      .currentSnapshot.get
    assert(backSnap.deleteFiles.size >= 2 &&
      backSnap.deleteFiles.forall(_.keyFieldIds.isEmpty),
      backSnap.deleteFiles.toString)
    // the rewrite-deletes verb crosses the wire too
    val (removed, added) = cat.rewritePositionDeletes(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("posw"), "t"))
    assert(removed >= 2 && added == 1, s"($removed, $added)")
    val after = backing.metadataStore.load(Seq("posw"), "t")._1
      .currentSnapshot.get
    assert(after.operation == "rewrite-deletes" && after.deleteFiles.size == 1)
    val rows = spark.table("fed.posw.t").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(rows == Seq((2L, 20.0), (3L, 3.0)), rows.toString)
  }

  test("row-level DELETE and streaming rides the wire commit algebra") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS fed.dml")
    spark.sql("CREATE TABLE fed.dml.t (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO fed.dml.t VALUES (1, 10), (2, 200)")
    // copy-on-write rewrite forwarded as the rewrite-files wire verb,
    // arbitrated by the BACKING committer
    spark.sql("DELETE FROM fed.dml.t WHERE v > 100")
    assert(spark.table("fed.dml.t").collect().map(_.getLong(0)).toSeq == Seq(1L))
    spark.sql("UPDATE fed.dml.t SET v = v + 1 WHERE id = 1")
    assert(spark.table("fed.dml.t").head.getLong(1) == 11L)

    // the streaming source tails the federated table's version deltas
    import scala.jdk.CollectionConverters._
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.option("from-version", "latest").table("fed.dml.t")
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-fed-ckpt").toString)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       _: Long) =>
        df.collect().foreach(r => seen.add(r.getLong(0))); ()
      }.start()
    try {
      q.processAllAvailable()
      spark.sql("INSERT INTO fed.dml.t VALUES (9, 90)")
      q.processAllAvailable()
      assert(seen.asScala.toSeq == Seq(9L))
    } finally q.stop()
  }
}
