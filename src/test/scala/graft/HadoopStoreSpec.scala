package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.GraftCatalog
import graft.commit._
import graft.meta._

/** The warehouse on a NON-POSIX filesystem: every catalog operation and
  * the full write/read/commit cycle run against a Hadoop FileSystem
  * registered under `hdfslike://` (HDFS rename semantics over local
  * disk — the MiniCluster stand-in). Proves the CAS protocol rides the
  * Hadoop FS contract (atomic rename-refusing-existing-destination),
  * not POSIX link(2)/rename(2) — the reference reaches such stores via
  * iceberg-go FileIO (`configs/.iceberg-go.yaml:7-10`). */
class HadoopStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val localRoot = Files.createTempDirectory("graft-hdfslike-wh").toString
  private val wh = s"hdfslike://$localRoot"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.hadoop.fs.hdfslike.impl", classOf[HdfsLikeFileSystem].getName)
    .config("spark.sql.catalog.ghdfs", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.ghdfs.warehouse", wh)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def catalog: GraftCatalog =
    spark.sessionState.catalogManager.catalog("ghdfs").asInstanceOf[GraftCatalog]

  test("scheme dispatch picks the Hadoop store for a non-file warehouse") {
    spark.sql("SELECT 1").collect() // force catalog init
    assert(catalog.metadataStore.isInstanceOf[HadoopMetadataStore])
    assert(MetaStore.forWarehouse("/plain/path").isInstanceOf[MetadataStore])
    assert(MetaStore.forWarehouse("file:///plain/path").isInstanceOf[MetadataStore])
  }

  test("full DDL + write/read/commit cycle on the hdfslike warehouse") {
    spark.sql("CREATE NAMESPACE ghdfs.ns WITH PROPERTIES ('team'='t')")
    assert(spark.sql("SHOW NAMESPACES IN ghdfs").collect()
      .map(_.getString(0)).contains("ns"))
    spark.sql("""CREATE TABLE ghdfs.ns.ev (id BIGINT, cat STRING)
      PARTITIONED BY (cat)""")
    spark.sql("INSERT INTO ghdfs.ns.ev VALUES (1,'a'),(2,'b')")
    spark.sql("INSERT INTO ghdfs.ns.ev VALUES (3,'a')")
    assert(spark.table("ghdfs.ns.ev").count() == 3)
    // snapshot versioning + time travel across the commits
    val (m, v) = catalog.metadataStore.load(Seq("ns"), "ev")
    assert(m.snapshots.size == 2 && v == 3) // v1 create + 2 appends
    assert(spark.sql("SELECT * FROM ghdfs.ns.ev VERSION AS OF 2").count() == 2)
    // identity-partition pruning still prunes manifest files
    val rows = spark.sql("SELECT id FROM ghdfs.ns.ev WHERE cat = 'b'")
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(2L))
    // overwrite + rename + drop
    spark.sql("INSERT OVERWRITE ghdfs.ns.ev VALUES (9,'z')")
    assert(spark.table("ghdfs.ns.ev").collect().map(_.getLong(0)).toSeq == Seq(9L))
    spark.sql("ALTER TABLE ghdfs.ns.ev RENAME TO ns.ev2")
    assert(spark.table("ghdfs.ns.ev2").count() == 1)
    spark.sql("DROP TABLE ghdfs.ns.ev2")
    assert(spark.sql("SHOW TABLES IN ghdfs.ns").count() == 0)
  }

  test("row-level rewrite and native streaming write run on the Hadoop store") {
    // both executor-side writers open files straight through the Hadoop
    // FileSystem API (no POSIX assumption) — prove it on hdfslike://
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ghdfs.rw")
    spark.sql("CREATE TABLE ghdfs.rw.t (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO ghdfs.rw.t VALUES (1, 10), (2, 200)")
    spark.sql("DELETE FROM ghdfs.rw.t WHERE v > 100")
    assert(spark.table("ghdfs.rw.t").collect().map(_.getLong(0)).toSeq == Seq(1L))
    spark.sql("UPDATE ghdfs.rw.t SET v = v + 1 WHERE id = 1")
    assert(spark.table("ghdfs.rw.t").head.getLong(1) == 11L)

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    spark.sql("CREATE TABLE ghdfs.rw.s (id BIGINT)")
    val input = MemoryStream[Long](spark)
    val q = input.toDF().select($"value".as("id"))
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-hdfs-ckpt").toString)
      .toTable("ghdfs.rw.s")
    try {
      input.addData(7L, 8L); q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("ghdfs.rw.s").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(7L, 8L))
  }

  test("CAS on the Hadoop store: one winner per version, retries converge") {
    val store = catalog.metadataStore
    store.createNamespace(Seq("race"), Map.empty)
    val schema = SchemaDef(0, List(FieldDef(1, "id", "long", required = false)))
    val meta0 = TableMetadata.empty(
      java.util.UUID.randomUUID().toString, store.dataDir(Seq("race"), "t"),
      schema, PartitionSpecDef(0, Nil), SortOrderDef(0, Nil), Map.empty)
    store.createTable(Seq("race"), "t", meta0)

    // raw CAS: two committers racing for the same version — exactly one wins
    val (base, v1) = store.load(Seq("race"), "t")
    val a = store.commit(Seq("race"), "t", v1,
      base.copy(properties = Map("who" -> "a")))
    val b = store.commit(Seq("race"), "t", v1,
      base.copy(properties = Map("who" -> "b")))
    assert(a ^ b, s"expected exactly one CAS winner, got a=$a b=$b")

    // 8 threads × 5 optimistic commits through the Committer: all land,
    // every version is distinct and consecutive
    val committer = new Committer(store)
    val threads = (0 until 8).map { i =>
      new Thread(() => (0 until 5).foreach { j =>
        committer.commit(Seq("race"), "t", Nil,
          Seq(MetadataUpdate.SetProperties(Map(s"k-$i-$j" -> "1"))))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val (fin, vFin) = store.load(Seq("race"), "t")
    assert(vFin == v1 + 1 + 40, s"expected ${v1 + 41} versions, got $vFin")
    assert((0 until 8).forall(i => (0 until 5).forall(j =>
      fin.properties.contains(s"k-$i-$j"))), "a committed property was lost")
  }

  test("store edge cases hold on the Hadoop backend too") {
    // the same contract CommitPropertySpec pins for the POSIX store:
    // missing versions, cross-namespace rename, idempotent double drop
    spark.sql("SELECT 1").collect()
    val store = new graft.meta.HadoopMetadataStore(wh + "/edges")
    store.ensureRoot()
    val schema = SchemaDef(0, List(FieldDef(1, "id", "long", required = false)))
    def meta0(loc: String) = TableMetadata.empty(
      java.util.UUID.randomUUID().toString, loc, schema,
      PartitionSpecDef(0, Nil), SortOrderDef(0, Nil), Map.empty)
    store.createNamespace(Seq("a"), Map("k" -> "v"))
    store.createNamespace(Seq("b"), Map.empty)
    assert(store.loadNamespace(Seq("a")) == Map("k" -> "v"))
    store.setNamespaceProperties(Seq("a"), Map("k2" -> "v2"))
    assert(store.loadNamespace(Seq("a")) == Map("k2" -> "v2"))
    store.createTable(Seq("a"), "t", meta0(store.dataDir(Seq("a"), "t")))
    intercept[Exception] { store.loadVersion(Seq("a"), "t", 99) }
    intercept[Exception] { store.load(Seq("a"), "missing") }
    intercept[IllegalStateException] {
      store.createTable(Seq("a"), "t", meta0(store.dataDir(Seq("a"), "t")))
    }
    store.renameTable(Seq("a"), "t", Seq("b"), "t2") // cross-namespace
    assert(store.tableExists(Seq("b"), "t2") && !store.tableExists(Seq("a"), "t"))
    intercept[Exception] { // non-empty namespace refuses to drop
      store.dropNamespace(Seq("b"))
    }
    assert(store.dropTable(Seq("b"), "t2"))
    assert(!store.dropTable(Seq("b"), "t2")) // idempotent false
    assert(store.dropNamespace(Seq("a")) && store.dropNamespace(Seq("b")))
    assert(!store.dropNamespace(Seq("a"))) // already gone
  }

  test("merge-on-read DML and the upsert sink run on the Hadoop store") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ghdfs.morns")
    spark.sql("""CREATE TABLE ghdfs.morns.t (id BIGINT NOT NULL, v DOUBLE)
      TBLPROPERTIES ('identifier-fields' = 'id',
        'write.delete.mode' = 'merge-on-read',
        'write.update.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO ghdfs.morns.t VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    spark.sql("DELETE FROM ghdfs.morns.t WHERE id = 2")
    spark.sql("UPDATE ghdfs.morns.t SET v = 30.0 WHERE id = 3")
    import spark.implicits._
    graft.catalog.CatalogUpserts.upsertBatch(catalog.metadataStore,
      Seq("morns"), "t", Seq((1L, 10.0), (4L, 4.0)).toDF("id", "v"))
    val rows = spark.table("ghdfs.morns.t").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(rows == Seq((1L, 10.0), (3L, 30.0), (4L, 4.0)), rows.toString)
    val snap = catalog.metadataStore.load(Seq("morns"), "t")._1
      .currentSnapshot.get
    assert(snap.deleteFiles.nonEmpty)
    // compaction folds the deletes on the Hadoop store too
    catalog.compact(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("morns"), "t"))
    assert(catalog.metadataStore.load(Seq("morns"), "t")._1
      .currentSnapshot.get.deleteFiles.isEmpty)
    assert(spark.table("ghdfs.morns.t").count() == 3L)
  }

  test("the hdfslike filesystem really refuses rename onto an existing file") {
    val fs = new org.apache.hadoop.fs.Path(wh).getFileSystem(
      spark.sessionState.newHadoopConf())
    assert(fs.isInstanceOf[HdfsLikeFileSystem])
    val d = new org.apache.hadoop.fs.Path(wh + "/rename-probe")
    fs.mkdirs(d)
    val p1 = new org.apache.hadoop.fs.Path(d, "one")
    val p2 = new org.apache.hadoop.fs.Path(d, "two")
    Seq(p1, p2).foreach { p => val o = fs.create(p, false); o.write(1); o.close() }
    assert(!fs.rename(p1, p2), "rename over an existing file must fail")
  }
}
