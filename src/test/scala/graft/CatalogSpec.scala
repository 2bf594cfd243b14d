package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, NonEmptyNamespaceException, TableAlreadyExistsException}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.GraftCatalog
import graft.commit._
import graft.meta._

/** Mirrors the reference's e2e suite (`/root/reference/test/server_test.go`)
  * through the real user surface — spark.sql DDL/DML against the `graft`
  * catalog — never by poking internals (SURVEY.md §5 adoption).
  */
class CatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val wh = Files.createTempDirectory("graft-wh").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.graft.warehouse", wh)
    .config("spark.sql.catalog.graft.defaults.write-format", "parquet")
    .config("spark.sql.catalog.graft.overrides.owner", "graft")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def catalog: GraftCatalog =
    spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]

  // -- TestServerConfig (server_test.go:60-67) --------------------------
  test("config merges defaults, client props, overrides") {
    spark.sql("SELECT 1").collect() // force catalog init
    val cfg = catalog.config(Map("owner" -> "client", "extra" -> "1"))
    assert(cfg("write-format") == "parquet")
    assert(cfg("extra") == "1")
    assert(cfg("owner") == "graft") // override wins over client
  }

  // -- TestNamespaceOperations (server_test.go:69-141) ------------------
  test("namespace create / list / exists / load / update properties") {
    // ('owner' is a Spark-reserved namespace property; the reference's
    // fixture uses owner=test_user — 'team' carries the same role here)
    spark.sql("CREATE NAMESPACE graft.test_namespace " +
      "WITH PROPERTIES ('description'='Test namespace', 'team'='test_user')")
    val listed = spark.sql("SHOW NAMESPACES IN graft").collect().map(_.getString(0))
    assert(listed.contains("test_namespace"))

    val props = spark.sql("DESCRIBE NAMESPACE EXTENDED graft.test_namespace")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("Properties").contains("Test namespace"))

    // update: set description + new_prop, remove owner; summary semantics
    val (updated, removed, missing) = catalog.updateNamespaceProperties(
      Seq("test_namespace"),
      removals = Seq("team", "not_there"),
      updates = Map("description" -> "Updated", "new_prop" -> "v"))
    assert(updated.toSet == Set("description", "new_prop"))
    assert(removed == Seq("team"))
    assert(missing == Seq("not_there"))

    // 422 rule: a key in both removals and updates (namespaces.go:159-166)
    val e = intercept[IllegalArgumentException] {
      catalog.updateNamespaceProperties(Seq("test_namespace"),
        removals = Seq("description"), updates = Map("description" -> "x"))
    }
    assert(e.getMessage.contains("description"))
  }

  test("multi-level namespaces") {
    spark.sql("CREATE NAMESPACE graft.a.b.c")
    assert(spark.sql("SHOW NAMESPACES IN graft.a.b").collect()
      .map(_.getString(0)).contains("a.b.c"))
    spark.sql("DROP NAMESPACE graft.a.b.c")
    spark.sql("DROP NAMESPACE graft.a.b")
    spark.sql("DROP NAMESPACE graft.a")
  }

  test("drop of non-empty namespace fails like NamespaceNotEmptyException") {
    spark.sql("CREATE NAMESPACE graft.busy")
    spark.sql("CREATE TABLE graft.busy.t (id BIGINT) ")
    // Spark surfaces the catalog's NonEmptyNamespaceException as an
    // AnalysisException with the SCHEMA_NOT_EMPTY class
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("DROP NAMESPACE graft.busy")
    }
    assert(e.getMessage.toLowerCase.contains("empty"))
    spark.sql("DROP TABLE graft.busy.t")
    spark.sql("DROP NAMESPACE graft.busy")
  }

  // -- TestTableOperations (server_test.go:143-260) ---------------------
  test("table lifecycle: create, exists, load, list, insert, select") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ops")
    spark.sql("""CREATE TABLE graft.ops.users (
      id BIGINT NOT NULL, name STRING, created_at TIMESTAMP_NTZ)""")

    val tables = spark.sql("SHOW TABLES IN graft.ops").collect().map(_.getString(1))
    assert(tables.contains("users"))

    // schema echo, field-by-field (server_test.go:174-176)
    val fields = spark.table("graft.ops.users").schema.fields
    assert(fields.map(_.name).toSeq == Seq("id", "name", "created_at"))
    assert(!fields(0).nullable && fields(1).nullable)
    // stable field ids carried in metadata
    assert(fields.map(_.metadata.getLong(SchemaBridge.FieldIdKey)).toSeq == Seq(1L, 2L, 3L))

    spark.sql("INSERT INTO graft.ops.users VALUES " +
      "(1, 'ada', TIMESTAMP_NTZ'2024-01-01 00:00:00')," +
      "(2, 'grace', TIMESTAMP_NTZ'2024-01-02 00:00:00')")
    assert(spark.table("graft.ops.users").count() == 2)
    spark.sql("INSERT INTO graft.ops.users VALUES " +
      "(3, 'alan', TIMESTAMP_NTZ'2024-01-03 00:00:00')")
    assert(spark.sql("SELECT max(id) FROM graft.ops.users").collect()(0).getLong(0) == 3)
    // filter pushdown path through the delegated parquet scan
    assert(spark.sql("SELECT name FROM graft.ops.users WHERE id = 2")
      .collect()(0).getString(0) == "grace")
  }

  test("schema evolution commit with requirement (server_test.go:210-225)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.evo")
    spark.sql("CREATE TABLE graft.evo.t (id BIGINT NOT NULL, name STRING)")
    spark.sql("INSERT INTO graft.evo.t VALUES (1, 'x')")

    spark.sql("ALTER TABLE graft.evo.t ADD COLUMN updated_at TIMESTAMP_NTZ")
    val schema = spark.table("graft.evo.t").schema
    assert(schema.fieldNames.toSeq == Seq("id", "name", "updated_at"))
    // new column gets a fresh field id (rename-safe identity)
    assert(schema("updated_at").metadata.getLong(SchemaBridge.FieldIdKey) == 3L)
    // old rows read NULL for the added column
    assert(spark.sql("SELECT updated_at FROM graft.evo.t").collect()(0).isNullAt(0))

    // explicit requirement failure: stale AssertCurrentSchemaId
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("evo"), "t")
    val e = intercept[CommitFailedException] {
      catalog.commit(ident,
        Seq(Requirement.AssertCurrentSchemaId(0)), // now 1 after evolution
        Seq(MetadataUpdate.SetProperties(Map("k" -> "v"))))
    }
    assert(e.getMessage.contains("requirement failed"))

    // rename column keeps the field id — and old files still serve the
    // renamed column's DATA (field-id resolution, not name matching)
    spark.sql("ALTER TABLE graft.evo.t RENAME COLUMN name TO full_name")
    val renamed = spark.table("graft.evo.t").schema
    assert(renamed("full_name").metadata.getLong(SchemaBridge.FieldIdKey) == 2L)
    assert(spark.sql("SELECT full_name FROM graft.evo.t WHERE id = 1")
      .collect()(0).getString(0) == "x")

    // drop column: files keep the physical column, schema hides it
    spark.sql("ALTER TABLE graft.evo.t DROP COLUMN updated_at")
    assert(spark.table("graft.evo.t").schema.fieldNames.toSeq
      == Seq("id", "full_name"))
    assert(spark.sql("SELECT id FROM graft.evo.t").count() == 1)
  }

  test("type widening: int -> bigint still reads old files") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.widen")
    spark.sql("CREATE TABLE graft.widen.t (id INT, v INT)")
    spark.sql("INSERT INTO graft.widen.t VALUES (1, 10)")
    spark.sql("ALTER TABLE graft.widen.t ALTER COLUMN v TYPE BIGINT")
    assert(spark.table("graft.widen.t").schema("v").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(spark.sql("SELECT v FROM graft.widen.t").collect()(0).getLong(0) == 10L)
    spark.sql("INSERT INTO graft.widen.t VALUES (2, 5000000000)") // > int range
    assert(spark.sql("SELECT sum(v) FROM graft.widen.t").collect()(0).getLong(0)
      == 5000000010L)
  }

  test("type changes refuse everything but lossless promotions") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.promo")
    spark.sql("CREATE TABLE graft.promo.t " +
      "(i INT, l BIGINT, f FLOAT, s STRING, d DECIMAL(5,2), " +
      "nest STRUCT<a: INT, b: STRING>)")
    spark.sql("INSERT INTO graft.promo.t VALUES " +
      "(1, 2, 1.5, 'x', 123.45, named_struct('a', 7, 'b', 'y'))")
    // allowed: int->long, float->double, decimal precision growth,
    // nested int->long inside a struct-typed update
    spark.sql("ALTER TABLE graft.promo.t ALTER COLUMN i TYPE BIGINT")
    spark.sql("ALTER TABLE graft.promo.t ALTER COLUMN f TYPE DOUBLE")
    spark.sql("ALTER TABLE graft.promo.t ALTER COLUMN d TYPE DECIMAL(10,2)")
    spark.sql("ALTER TABLE graft.promo.t ALTER COLUMN nest.a TYPE BIGINT")
    val r = spark.table("graft.promo.t").collect()(0)
    assert(r.getLong(0) == 1L && r.getDouble(2) == 1.5d)
    assert(r.getDecimal(4).toPlainString == "123.45")
    assert(r.getStruct(5).getLong(0) == 7L)
    // refused: narrowing and cross-family die in Spark's own analyzer
    // (not an upcast); the cases Spark's upcast rule PERMITS but the
    // Iceberg promotion set refuses — int→string, decimal scale growth,
    // int→float — must hit OUR guard, and the metadata document must be
    // untouched after every refusal
    val vBefore = catalog.metadataStore.currentVersion(Seq("promo"), "t")
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    for (bad <- Seq(
        "ALTER TABLE graft.promo.t ALTER COLUMN l TYPE INT",
        "ALTER TABLE graft.promo.t ALTER COLUMN s TYPE BIGINT",
        "ALTER TABLE graft.promo.t ALTER COLUMN d TYPE DECIMAL(10,4)"))
      intercept[Exception](spark.sql(bad))
    for (bad <- Seq(
        "ALTER TABLE graft.promo.t ALTER COLUMN i TYPE STRING",
        "ALTER TABLE graft.promo.t ALTER COLUMN d TYPE DECIMAL(13,4)",
        "ALTER TABLE graft.promo.t ALTER COLUMN nest.a TYPE DOUBLE")) {
      val e = intercept[Exception](spark.sql(bad))
      assert(msgs(e).exists(_.contains("lossless")), s"$bad -> $e")
    }
    assert(catalog.metadataStore.currentVersion(Seq("promo"), "t") == vBefore)
    // old files still serve through every applied promotion
    spark.sql("INSERT INTO graft.promo.t VALUES " +
      "(5000000000, 3, 2.5, 'z', 99999999.99, named_struct('a', CAST(6000000000 AS BIGINT), 'b', 'w'))")
    assert(spark.sql("SELECT sum(i) FROM graft.promo.t")
      .collect()(0).getLong(0) == 5000000001L)
  }

  test("rename table and rename back (server_test.go:227-248)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.rn")
    spark.sql("CREATE TABLE graft.rn.orig (id BIGINT)")
    spark.sql("INSERT INTO graft.rn.orig VALUES (42)")
    spark.sql("ALTER TABLE graft.rn.orig RENAME TO rn.renamed")
    assert(!spark.catalog.tableExists("graft.rn.orig"))
    assert(spark.table("graft.rn.renamed").collect()(0).getLong(0) == 42)
    spark.sql("ALTER TABLE graft.rn.renamed RENAME TO rn.orig")
    assert(spark.table("graft.rn.orig").count() == 1)
  }

  test("insert overwrite + time travel") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tt")
    spark.sql("CREATE TABLE graft.tt.t (id BIGINT)")
    spark.sql("INSERT INTO graft.tt.t VALUES (1), (2)")        // version 2
    spark.sql("INSERT INTO graft.tt.t VALUES (3)")             // version 3
    assert(spark.table("graft.tt.t").count() == 3)
    spark.sql("INSERT OVERWRITE graft.tt.t VALUES (9)")        // version 4
    assert(spark.table("graft.tt.t").count() == 1)
    // VERSION AS OF: metadata version 3 saw files of both appends
    assert(spark.sql("SELECT * FROM graft.tt.t VERSION AS OF 3").count() == 3)
    assert(spark.sql("SELECT * FROM graft.tt.t VERSION AS OF 2").count() == 2)
  }

  // -- TestErrorHandling (server_test.go:262-315) -----------------------
  test("error taxonomy") {
    intercept[NoSuchNamespaceException] {
      spark.sql("SHOW TABLES IN graft.non_existent")
    }
    intercept[Exception] { // AnalysisException wrapping NoSuchTable
      spark.table("graft.ops.non_existent_table").collect()
    }
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dup")
    spark.sql("CREATE TABLE IF NOT EXISTS graft.dup.t (id BIGINT NOT NULL)")
    intercept[TableAlreadyExistsException] {
      spark.sql("CREATE TABLE graft.dup.t (id BIGINT NOT NULL)")
    }
  }

  test("purge is unsupported, like the reference's 501") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.purge")
    spark.sql("CREATE TABLE graft.purge.t (id BIGINT)")
    intercept[UnsupportedOperationException] {
      catalog.purgeTable(
        org.apache.spark.sql.connector.catalog.Identifier.of(Array("purge"), "t"))
    }
  }

  test("partitioned create round-trips the hidden-partition spec") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.pt")
    spark.sql("""CREATE TABLE graft.pt.ev (id BIGINT, ts TIMESTAMP_NTZ, cat STRING)
      PARTITIONED BY (bucket(8, id), days(ts), cat)""")
    val t = catalog.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("pt"), "ev"))
    val specs = t.partitioning().map(_.toString).toSeq
    assert(specs.exists(_.contains("bucket")) && specs.exists(_.contains("days")))
  }

  test("identity partitioning + write.sort-order shape the physical layout") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.layout")
    spark.sql("""CREATE TABLE graft.layout.ev (id BIGINT, cat STRING, amt DOUBLE)
      PARTITIONED BY (cat)
      TBLPROPERTIES ('write.sort-order'='id')""")
    spark.sql("INSERT INTO graft.layout.ev VALUES " +
      "(3,'a',1.0),(1,'b',2.0),(2,'a',3.0),(4,'b',4.0)")
    // physical layout: partition dirs per cat under the commit dir
    val dataDir = java.nio.file.Paths.get(wh, "layout", "ev", "data")
    val partDirs = java.nio.file.Files.walk(dataDir).iterator()
    val dirs = scala.jdk.CollectionConverters.IteratorHasAsScala(partDirs)
      .asScala.map(_.toString).toList
    assert(dirs.exists(_.contains("__part_cat=a")))
    assert(dirs.exists(_.contains("__part_cat=b")))
    // reads see all rows with the original column intact
    val rows = spark.table("graft.layout.ev").orderBy(col("id")).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows.map(_.getString(1)).toSeq == Seq("b", "a", "a", "b"))
  }

  test("compaction rewrites many small files into one, data unchanged") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.maint")
    spark.sql("CREATE TABLE graft.maint.t (id BIGINT)")
    (1 to 5).foreach(i => spark.sql(s"INSERT INTO graft.maint.t VALUES ($i)"))
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("maint"), "t")
    val before = catalog.metadataStore.load(Seq("maint"), "t")._1
      .currentSnapshot.get.files.size
    assert(before >= 5)
    val m = catalog.compact(ident, targetFileCount = 1)
    assert(m.currentSnapshot.get.files.size == 1)
    assert(spark.table("graft.maint.t").collect().map(_.getLong(0)).sorted.toSeq
      == (1L to 5L))
  }

  test("snapshot expiration deletes unreferenced files and old versions") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.exp")
    spark.sql("CREATE TABLE graft.exp.t (id BIGINT)")
    spark.sql("INSERT INTO graft.exp.t VALUES (1)")
    spark.sql("INSERT OVERWRITE graft.exp.t VALUES (2)") // orphans v2's file
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("exp"), "t")
    // graceMs=0: the test's files are seconds old; production default (1h)
    // protects files staged by in-flight commits
    val removed = catalog.expireSnapshots(ident, keep = 1, graceMs = 0L)
    assert(removed >= 1) // the overwritten file is physically gone
    assert(spark.table("graft.exp.t").collect().map(_.getLong(0)).toSeq == Seq(2L))
    // expired versions are no longer time-travelable
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.exp.t VERSION AS OF 1").collect()
    }
  }

  test("concurrent INSERTs: racing appends both survive") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.race")
    spark.sql("CREATE TABLE graft.race.t (id BIGINT)")
    val threads = 4; val perThread = 3
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val futures = (0 until threads).map { tid =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = (0 until perThread).foreach { i =>
          spark.sql(s"INSERT INTO graft.race.t VALUES (${tid * 100 + i})")
        }
      })
    }
    futures.foreach(_.get())
    pool.shutdown()
    // every row from every racing append must be visible
    assert(spark.table("graft.race.t").count() == threads * perThread)
  }

  // -- concurrency: CAS commit single-winner ----------------------------
  test("concurrent commits: no lost updates") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cc")
    spark.sql("CREATE TABLE graft.cc.t (id BIGINT)")
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("cc"), "t")
    val threads = 8; val perThread = 5
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val futures = (0 until threads).map { tid =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = (0 until perThread).foreach { i =>
          catalog.commit(ident, Nil,
            Seq(MetadataUpdate.SetProperties(Map(s"k-$tid-$i" -> "1"))))
        }
      })
    }
    futures.foreach(_.get())
    pool.shutdown()
    val (m, v) = catalog.metadataStore.load(Seq("cc"), "t")
    // every one of the 40 property commits must have survived
    assert((0 until threads).forall(t => (0 until perThread)
      .forall(i => m.properties.contains(s"k-$t-$i"))))
    assert(v == 1 + threads * perThread) // v1 create + 40 commits
  }

  test("bucket[n] transform: physical bucket dirs + equality filter pruning") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.bkt")
    spark.sql("""CREATE TABLE graft.bkt.t (id BIGINT, v STRING)
      PARTITIONED BY (bucket(4, id))""")
    spark.sql("INSERT INTO graft.bkt.t SELECT id, CAST(id AS STRING) FROM range(0, 64)")
    // physical layout: bucket dirs under the commit dir
    val dataDir = java.nio.file.Paths.get(wh, "bkt", "t", "data")
    val walk = java.nio.file.Files.walk(dataDir)
    val dirs = try scala.jdk.CollectionConverters.IteratorHasAsScala(walk.iterator())
      .asScala.map(_.toString).toList finally walk.close()
    assert((0 until 4).forall(b => dirs.exists(_.contains(s"__part_id_bucket=$b"))),
      s"missing bucket dirs in:\n${dirs.mkString("\n")}")
    // scan-side pruning: an equality filter keeps only one bucket's files
    val table = catalog.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("bkt"), "t"))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
    val builder = table.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(java.util.Map.of()))
      .asInstanceOf[graft.catalog.GraftScanBuilder]
    val all = builder.prunedRelFiles.size
    builder.pushFilters(Array(org.apache.spark.sql.sources.EqualTo("id", 7L)))
    val pruned = builder.prunedRelFiles
    assert(pruned.size < all, s"bucket filter did not prune: $all -> ${pruned.size}")
    assert(pruned.forall(_.contains("__part_id_bucket=")), pruned.mkString(","))
    assert(pruned.map(_.replaceAll(".*__part_id_bucket=(\\d+).*", "$1")).distinct.size == 1,
      "more than one bucket survived an equality filter")
    // behavior end-to-end
    assert(spark.sql("SELECT v FROM graft.bkt.t WHERE id = 7").collect()
      .map(_.getString(0)).toSeq == Seq("7"))
    assert(spark.table("graft.bkt.t").count() == 64)
  }

  test("truncate and temporal transforms: physical dirs + filter pruning") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tt")
    spark.sql("DROP TABLE IF EXISTS graft.tt.t")
    spark.sql("""CREATE TABLE graft.tt.t (id BIGINT, name STRING, d DATE)
      PARTITIONED BY (truncate(3, name), months(d))""")
    spark.sql("""INSERT INTO graft.tt.t VALUES
      (1, 'alphabet', DATE '2024-01-05'), (2, 'alpine', DATE '2024-01-20'),
      (3, 'beta', DATE '2024-02-10'), (4, 'gamma', DATE '2024-03-01')""")
    val dataDir = java.nio.file.Paths.get(wh, "tt", "t", "data")
    val walk = java.nio.file.Files.walk(dataDir)
    val dirs = try scala.jdk.CollectionConverters.IteratorHasAsScala(walk.iterator())
      .asScala.map(_.toString).toList finally walk.close()
    assert(dirs.exists(_.contains("__part_name_trunc=alp")), dirs.mkString("\n"))
    assert(dirs.exists(_.contains("__part_d_month=2024-02")), dirs.mkString("\n"))
    // pruning: string-prefix and month filters keep only matching dirs
    val table = catalog.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("tt"), "t"))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
    def prunedWith(f: org.apache.spark.sql.sources.Filter): Seq[String] = {
      val b = table.newScanBuilder(
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(java.util.Map.of()))
        .asInstanceOf[graft.catalog.GraftScanBuilder]
      b.pushFilters(Array(f)); b.prunedRelFiles
    }
    val byName = prunedWith(org.apache.spark.sql.sources.EqualTo("name", "alpine"))
    assert(byName.nonEmpty && byName.forall(_.contains("__part_name_trunc=alp")),
      byName.mkString(","))
    val byMonth = prunedWith(org.apache.spark.sql.sources.EqualTo(
      "d", java.sql.Date.valueOf("2024-02-10")))
    assert(byMonth.nonEmpty && byMonth.forall(_.contains("__part_d_month=2024-02")),
      byMonth.mkString(","))
    // behavior end-to-end
    assert(spark.sql("SELECT id FROM graft.tt.t WHERE name = 'alpine'")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(spark.sql("SELECT id FROM graft.tt.t WHERE d = DATE '2024-02-10'")
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
    assert(spark.table("graft.tt.t").count() == 4)
  }

  test("bucket pruning disables after a column type change (hash family shifts)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.bw")
    spark.sql("DROP TABLE IF EXISTS graft.bw.t")
    spark.sql("CREATE TABLE graft.bw.t (id INT, v STRING) PARTITIONED BY (bucket(4, id))")
    // every commit covers ids 0..7, so min/max stats can never prune an
    // id=7 lookup — only the bucket-dir mechanism is in play
    (1 to 3).foreach { _ =>
      spark.sql("INSERT INTO graft.bw.t SELECT CAST(id AS INT), CAST(id AS STRING) FROM range(0, 8)")
    }
    // widen id: Murmur3 hashInt(7) != hashLong(7L), so files written under
    // INT live in buckets the BIGINT replay would compute differently
    spark.sql("ALTER TABLE graft.bw.t ALTER COLUMN id TYPE BIGINT")
    def specsOf(ns: String, t: String) = catalog.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array(ns), t))
      .asInstanceOf[graft.catalog.GraftTable].transformPartSpecs
    // the scan builder no longer receives the bucket spec, so no bucket
    // pruning can run (min/max stats pruning — value-based and
    // widening-safe — still applies, which is why results stay correct)
    assert(specsOf("bw", "t").isEmpty,
      "bucket spec still active after a column type change")
    assert(spark.sql("SELECT v FROM graft.bw.t WHERE id = 7").collect()
      .map(_.getString(0)).toSeq == Seq("7", "7", "7"))
    // control: a bucketed table with a stable type keeps its spec
    spark.sql("DROP TABLE IF EXISTS graft.bw.stable")
    spark.sql("CREATE TABLE graft.bw.stable (id BIGINT) PARTITIONED BY (bucket(4, id))")
    assert(specsOf("bw", "stable").nonEmpty)
  }

  test("partition values with Hive-escaped characters still match filters") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.esc")
    spark.sql("DROP TABLE IF EXISTS graft.esc.t")
    spark.sql("CREATE TABLE graft.esc.t (id BIGINT, cat STRING) PARTITIONED BY (cat)")
    spark.sql("INSERT INTO graft.esc.t VALUES (1, 'a:b'), (2, 'c=d'), (3, 'plain')")
    // dir names are escaped (a%3Ab); the pruner must still keep the file
    assert(spark.sql("SELECT id FROM graft.esc.t WHERE cat = 'a:b'")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(spark.sql("SELECT id FROM graft.esc.t WHERE cat = 'c=d'")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(spark.table("graft.esc.t").count() == 3)
  }

  test("compaction does not drop a concurrently-appended file") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mc")
    spark.sql("CREATE TABLE graft.mc.t (id BIGINT)")
    (1 to 3).foreach(i => spark.sql(s"INSERT INTO graft.mc.t VALUES ($i)"))
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("mc"), "t")
    // simulate compact's read-then-commit race: capture the snapshot a
    // compactor would read, let an append land in between, then attempt
    // the guarded ReplaceFiles — it must FAIL, not silently drop row 4
    val (base, _) = catalog.metadataStore.load(Seq("mc"), "t")
    spark.sql("INSERT INTO graft.mc.t VALUES (4)") // concurrent append
    intercept[CommitFailedException] {
      catalog.commit(ident,
        Seq(Requirement.AssertCurrentSnapshotId(base.currentSnapshotId)),
        Seq(MetadataUpdate.ReplaceFiles(
          base.currentSnapshot.get.files, System.currentTimeMillis())))
    }
    // the real compact() rescans on conflict: end state keeps all 4 rows
    val m = catalog.compact(ident, targetFileCount = 1)
    assert(m.currentSnapshot.get.files.size == 1)
    assert(spark.table("graft.mc.t").collect().map(_.getLong(0)).sorted.toSeq
      == (1L to 4L))
  }

  test("snapshot expiration keeps unreferenced files inside the grace window") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.gr")
    spark.sql("CREATE TABLE graft.gr.t (id BIGINT)")
    spark.sql("INSERT INTO graft.gr.t VALUES (1)")
    spark.sql("INSERT OVERWRITE graft.gr.t VALUES (2)") // orphans v2's file
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("gr"), "t")
    // default grace (1h): the just-written orphan looks like a file staged
    // by an in-flight commit, so the sweep must leave it alone
    assert(catalog.expireSnapshots(ident, keep = 1) == 0)
    assert(spark.table("graft.gr.t").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("DROP NAMESPACE CASCADE succeeds over dropped tables' residual data") {
    spark.sql("CREATE NAMESPACE graft.resid")
    spark.sql("CREATE TABLE graft.resid.t (id BIGINT)")
    spark.sql("INSERT INTO graft.resid.t VALUES (1)")
    // metadata-only drop leaves data files behind (purge → 501 quirk)
    spark.sql("DROP TABLE graft.resid.t")
    spark.sql("DROP NAMESPACE graft.resid CASCADE") // must not 500
    assert(!catalog.metadataStore.namespaceExists(Seq("resid")))
  }

  test("CTAS, partitioned CTAS, and RTAS create through the catalog") {
    spark.sql("CREATE NAMESPACE graft.ctas")
    spark.sql("CREATE TABLE graft.ctas.src (id BIGINT, cat STRING)")
    spark.sql("INSERT INTO graft.ctas.src VALUES (1,'a'),(2,'b'),(3,'b')")

    spark.sql("CREATE TABLE graft.ctas.t AS SELECT id, cat FROM graft.ctas.src WHERE id > 1")
    assert(spark.table("graft.ctas.t").count() == 2)

    // partitioned CTAS lays out the physical partition dirs like any
    // other write — pruning and partition-boundary ops work from birth
    spark.sql("""CREATE TABLE graft.ctas.p PARTITIONED BY (cat)
      AS SELECT id, cat FROM graft.ctas.src""")
    val (m, _) = catalog.metadataStore.load(Seq("ctas"), "p")
    assert(m.currentSnapshot.get.files.forall(_.contains("__part_cat=")))
    spark.sql("DELETE FROM graft.ctas.p WHERE cat = 'b'")
    assert(spark.table("graft.ctas.p").collect().map(_.getLong(0)).toSeq == Seq(1L))

    // RTAS replaces schema + contents; history starts fresh
    spark.sql("REPLACE TABLE graft.ctas.t AS SELECT cat FROM graft.ctas.src")
    assert(spark.table("graft.ctas.t").columns.toSeq == Seq("cat"))
    assert(spark.table("graft.ctas.t").count() == 3)
  }

  test("nested schema evolution: add, rename, and delete inside a struct") {
    spark.sql("CREATE NAMESPACE graft.nest")
    spark.sql("""CREATE TABLE graft.nest.t
      (id BIGINT, info STRUCT<a: BIGINT, b: STRING>)""")
    spark.sql("""INSERT INTO graft.nest.t
      VALUES (1, named_struct('a', 10L, 'b', 'x'))""")

    // nested ADD: the old file reads the new sub-column as null
    spark.sql("ALTER TABLE graft.nest.t ADD COLUMN info.c DOUBLE")
    val afterAdd = spark.sql("SELECT id, info.a, info.b, info.c FROM graft.nest.t")
      .collect().head
    assert(afterAdd.getLong(1) == 10L && afterAdd.getString(2) == "x")
    assert(afterAdd.isNullAt(3), "old file must read the added nested field as null")
    // ...and new writes fill it
    spark.sql("""INSERT INTO graft.nest.t
      VALUES (2, named_struct('a', 20L, 'b', 'y', 'c', 2.5))""")

    // nested RENAME is metadata-only: the OLD file (written pre-rename)
    // still serves its values through field-id resolution
    spark.sql("ALTER TABLE graft.nest.t RENAME COLUMN info.a TO alpha")
    val renamed = spark.sql(
      "SELECT id, info.alpha FROM graft.nest.t ORDER BY id").collect()
    assert(renamed.map(r => r.getLong(0) -> r.getLong(1)).toSeq ==
      Seq(1L -> 10L, 2L -> 20L),
      "nested rename must keep serving old files' values by field id")

    // nested DELETE drops the sub-column from the schema
    spark.sql("ALTER TABLE graft.nest.t DROP COLUMN info.b")
    assert(!spark.table("graft.nest.t").schema("info").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.contains("b"))
    assert(spark.sql("SELECT info.c FROM graft.nest.t WHERE id = 2")
      .head.getDouble(0) == 2.5)

    // nested ids are distinct and survive in the metadata document; the
    // id counter accounts for them (no reuse after a nested add)
    val (m, _) = catalog.metadataStore.load(Seq("nest"), "t")
    val info = m.currentSchema.fields.find(_.name == "info").get
    val nested = graft.meta.SchemaBridge.structFields(info.`type`)
    assert(nested.map(_.name).toSet == Set("alpha", "c"))
    assert((nested.map(_.id) :+ info.id :+
      m.currentSchema.fields.find(_.name == "id").get.id).distinct.size == 4)
    assert(m.lastColumnId >= nested.map(_.id).max)

    // a TYPE-level struct evolution (one UpdateColumnType carrying the
    // whole new struct) must keep surviving nested ids — re-minting them
    // would sever id resolution to every already-written file
    import org.apache.spark.sql.connector.catalog.{Identifier, TableChange}
    import org.apache.spark.sql.types._
    val idByName = nested.map(f => f.name -> f.id).toMap
    catalog.alterTable(Identifier.of(Array("nest"), "t"),
      TableChange.updateColumnType(Array("info"), StructType(Seq(
        StructField("alpha", LongType), StructField("c", DoubleType),
        StructField("d", StringType)))))
    val (m2, _) = catalog.metadataStore.load(Seq("nest"), "t")
    val nested2 = graft.meta.SchemaBridge.structFields(
      m2.currentSchema.fields.find(_.name == "info").get.`type`)
    assert(nested2.find(_.name == "alpha").get.id == idByName("alpha"),
      "surviving nested field was re-minted a fresh id")
    assert(nested2.find(_.name == "c").get.id == idByName("c"))
    assert(!idByName.values.toSet.contains(nested2.find(_.name == "d").get.id))
    // the old file (pre-everything) still serves alpha through its id
    assert(spark.sql("SELECT info.alpha FROM graft.nest.t WHERE id = 1")
      .head.getLong(0) == 10L)
  }
}
