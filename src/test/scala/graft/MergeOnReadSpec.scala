package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.GraftCatalog

/** Merge-on-read row-level DML: equality-delete files written by the
  * SupportsDelta write path, subtracted by the scan, scoped by sequence
  * numbers, and folded away by compaction. The shape that lets a DELETE
  * touching 0.01% of a 100 TB table commit kilobytes instead of
  * rewriting files. */
class MergeOnReadSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val wh = Files.createTempDirectory("graft-mor-wh").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.mor", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.mor.warehouse", wh)
    .withExtensions(new graft.functions.GraftExtensions)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def catalog: GraftCatalog =
    spark.sessionState.catalogManager.catalog("mor").asInstanceOf[GraftCatalog]

  private def snap(ns: String, t: String) =
    catalog.metadataStore.load(Seq(ns), t)._1.currentSnapshot.get

  private def mkMorTable(ns: String, t: String,
                         extraDdl: String = ""): Unit = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS mor.$ns")
    spark.sql(s"""CREATE TABLE mor.$ns.$t (id BIGINT NOT NULL, cat STRING, v DOUBLE)
      $extraDdl
      TBLPROPERTIES (
        'identifier-fields' = 'id',
        'write.delete.mode' = 'merge-on-read',
        'write.update.mode' = 'merge-on-read',
        'write.merge.mode' = 'merge-on-read')""")
  }

  test("MoR DELETE commits a delete file, rewrites nothing, reads right") {
    mkMorTable("del", "t")
    spark.sql("INSERT INTO mor.del.t VALUES (1,'a',1.0),(2,'b',200.0),(3,'c',300.0)")
    val before = snap("del", "t")

    spark.sql("DELETE FROM mor.del.t WHERE v > 100")

    val after = snap("del", "t")
    assert(after.operation == "delta")
    // no data file touched: same files, plus one delete file
    assert(after.files == before.files, "MoR delete must not rewrite data files")
    assert(after.deleteFiles.nonEmpty)
    assert(after.deleteFiles.map(_.rows).sum == 2) // one file per write task
    assert(after.deleteFiles.forall(_.seq == after.snapshotId))
    // reads subtract the keys
    assert(spark.table("mor.del.t").collect().map(_.getLong(0)).toSeq == Seq(1L))
    // column-pruned reads too (key column injected and projected away)
    assert(spark.sql("SELECT cat FROM mor.del.t").collect()
      .map(_.getString(0)).toSeq == Seq("a"))
    assert(spark.sql("SELECT count(*) FROM mor.del.t").head().getLong(0) == 1L)
    // $files surfaces the delete files for operability
    val contents = spark.sql("SELECT content FROM mor.del.`t$files`")
      .collect().map(_.getString(0))
    assert(contents.count(_ == "equality-deletes") == after.deleteFiles.size)
    assert(contents.count(_ == "data") == after.files.size)
    // time travel to the pre-delete version still sees all rows
    val preVersion = catalog.metadataStore.load(Seq("del"), "t")._2 - 1
    assert(spark.sql(s"SELECT count(*) FROM mor.del.t VERSION AS OF $preVersion")
      .head().getLong(0) == 3L)
  }

  test("deletes apply only to files older than the delete (sequence scope)") {
    mkMorTable("seq", "t")
    spark.sql("INSERT INTO mor.seq.t VALUES (1,'a',1.0),(2,'b',2.0)")
    spark.sql("DELETE FROM mor.seq.t WHERE id = 2")
    // re-insert the SAME key after the delete: the delete file has a
    // lower sequence than the new data file — the new row must survive
    spark.sql("INSERT INTO mor.seq.t VALUES (2,'b2',22.0)")
    val rows = spark.table("mor.seq.t").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(rows == Seq((1L, "a"), (2L, "b2")), rows.toString)
  }

  test("MoR UPDATE deletes the old version and inserts the new at one sequence") {
    mkMorTable("upd", "t")
    spark.sql("INSERT INTO mor.upd.t VALUES (1,'a',1.0),(2,'b',2.0),(3,'c',3.0)")
    val before = snap("upd", "t")

    spark.sql("UPDATE mor.upd.t SET v = v * 10 WHERE id >= 2")

    val after = snap("upd", "t")
    assert(after.operation == "delta")
    assert(before.files.forall(after.files.contains),
      "update must keep the original data files")
    assert(after.files.size > before.files.size, "new row versions appended")
    assert(after.deleteFiles.nonEmpty)
    val rows = spark.table("mor.upd.t").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1).toSeq
    assert(rows == Seq((1L, 1.0), (2L, 20.0), (3L, 30.0)), rows.toString)
  }

  test("MoR MERGE handles matched-update, matched-delete, and not-matched-insert") {
    mkMorTable("mrg", "t")
    spark.sql("INSERT INTO mor.mrg.t VALUES (1,'a',1.0),(2,'b',2.0),(3,'c',3.0)")
    spark.sql("""MERGE INTO mor.mrg.t dst
      USING (SELECT * FROM VALUES (2, 20.0), (3, -1.0), (4, 40.0) AS src(id, v)) src
      ON dst.id = src.id
      WHEN MATCHED AND src.v < 0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = src.v
      WHEN NOT MATCHED THEN INSERT (id, cat, v) VALUES (src.id, 'new', src.v)""")
    val rows = spark.table("mor.mrg.t").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(rows == Seq((1L, "a", 1.0), (2L, "b", 20.0), (4L, "new", 40.0)),
      rows.toString)
    assert(snap("mrg", "t").operation == "delta")
  }

  test("MoR DML preserves the partition layout of inserted row versions") {
    mkMorTable("part", "t", extraDdl = "PARTITIONED BY (cat)")
    spark.sql("INSERT INTO mor.part.t VALUES (1,'a',1.0),(2,'b',2.0)")
    spark.sql("UPDATE mor.part.t SET v = 99.0 WHERE id = 2")
    val after = snap("part", "t")
    assert(after.files.forall(_.contains("__part_cat=")),
      after.files.mkString("\n"))
    assert(spark.sql("SELECT v FROM mor.part.t WHERE cat = 'b'").head()
      .getDouble(0) == 99.0)
  }

  test("compaction folds deletes in and drops the delete files") {
    mkMorTable("cmp", "t")
    spark.sql("INSERT INTO mor.cmp.t VALUES (1,'a',1.0),(2,'b',2.0),(3,'c',3.0)")
    spark.sql("DELETE FROM mor.cmp.t WHERE id = 2")
    assert(snap("cmp", "t").deleteFiles.nonEmpty)

    catalog.compact(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("cmp"), "t"))

    val after = snap("cmp", "t")
    assert(after.deleteFiles.isEmpty, "compaction must purge delete files")
    assert(after.fileSeqs.keySet == after.files.toSet)
    assert(spark.table("mor.cmp.t").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L))
  }

  test("a MoR table without merge-on-read mode still takes the CoW path") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mor.cow")
    spark.sql("""CREATE TABLE mor.cow.t (id BIGINT, v DOUBLE)
      TBLPROPERTIES ('identifier-fields' = 'id')""")
    spark.sql("INSERT INTO mor.cow.t VALUES (1,1.0),(2,200.0)")
    spark.sql("DELETE FROM mor.cow.t WHERE v > 100")
    val after = snap("cow", "t")
    assert(after.operation == "rewrite", after.operation)
    assert(after.deleteFiles.isEmpty)
    assert(spark.table("mor.cow.t").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("streaming read refuses a table with live delete files") {
    mkMorTable("strm", "t")
    spark.sql("INSERT INTO mor.strm.t VALUES (1,'a',1.0)")
    spark.sql("DELETE FROM mor.strm.t WHERE id = 1")
    val ckpt = Files.createTempDirectory("mor-strm-ckpt").toString
    val e = intercept[Exception] {
      spark.readStream.table("mor.strm.t").writeStream
        .format("memory").queryName("mor_strm_q")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination(30000)
    }
    def causes(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(16).toSeq
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => Option(c.getMessage).exists(
        _.contains("merge-on-read delete file"))),
      s"unexpected failure: $e")
  }

  test("upsert batches retire old key versions and land new ones atomically") {
    mkMorTable("ups", "t")
    val store = catalog.metadataStore
    import spark.implicits._
    graft.catalog.CatalogUpserts.upsertBatch(store, Seq("ups"), "t",
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "cat", "v"))
    graft.catalog.CatalogUpserts.upsertBatch(store, Seq("ups"), "t",
      Seq((2L, "b2", 22.0), (3L, "c", 3.0)).toDF("id", "cat", "v"))
    val rows = spark.table("mor.ups.t").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(rows == Seq((1L, "a"), (2L, "b2"), (3L, "c")), rows.toString)
    val s = snap("ups", "t")
    assert(s.operation == "delta")
    assert(s.deleteFiles.size == 2) // one per epoch
    // duplicate keys INSIDE one batch collapse to a single survivor
    graft.catalog.CatalogUpserts.upsertBatch(store, Seq("ups"), "t",
      Seq((4L, "x", 1.0), (4L, "y", 2.0)).toDF("id", "cat", "v"))
    assert(spark.table("mor.ups.t").where("id = 4").count() == 1L)
  }

  test("the upsert sink is exactly-once under replay and across restarts") {
    mkMorTable("upsx", "t")
    import spark.implicits._
    val sink = graft.stream.Streaming.catalogUpsertSink(spark, "mor",
      Seq("upsx"), "t", "cdc")
    sink(Seq((1L, "a", 1.0)).toDF("id", "cat", "v"), 0L)
    sink(Seq((1L, "a2", 2.0), (2L, "b", 1.0)).toDF("id", "cat", "v"), 1L)
    val versions = catalog.metadataStore.load(Seq("upsx"), "t")._2
    // replayed epoch on the same sink instance: skipped
    sink(Seq((1L, "ZOMBIE", 0.0)).toDF("id", "cat", "v"), 1L)
    // replayed epoch on a FRESH sink (driver restart): watermark skips it
    val restarted = graft.stream.Streaming.catalogUpsertSink(spark, "mor",
      Seq("upsx"), "t", "cdc")
    restarted(Seq((1L, "ZOMBIE", 0.0)).toDF("id", "cat", "v"), 1L)
    assert(catalog.metadataStore.load(Seq("upsx"), "t")._2 == versions,
      "replays must not commit")
    val rows = spark.table("mor.upsx.t").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(rows == Seq((1L, "a2"), (2L, "b")), rows.toString)
  }

  test("CDC loop: stream an append-only source into a keyed target as upserts") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mor.cdc")
    spark.sql("CREATE TABLE mor.cdc.src (id BIGINT NOT NULL, v DOUBLE)")
    mkMorTable("cdc", "dst")
    spark.sql("INSERT INTO mor.cdc.src VALUES (1, 1.0), (2, 2.0)")
    val ckpt = Files.createTempDirectory("mor-cdc-ckpt").toString

    def drain(): Unit = {
      val q = spark.readStream.table("mor.cdc.src")
        .selectExpr("id", "CAST(id AS STRING) AS cat", "v")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch(graft.stream.Streaming.catalogUpsertSink(
          spark, "mor", Seq("cdc"), "dst", "loop"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      assert(!q.isActive)
    }

    drain()
    assert(spark.table("mor.cdc.dst").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1).toSeq ==
      Seq((1L, 1.0), (2L, 2.0)))

    // a LATER append with an existing key arrives as an update downstream
    spark.sql("INSERT INTO mor.cdc.src VALUES (2, 22.0), (3, 3.0)")
    drain()
    assert(spark.table("mor.cdc.dst").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1).toSeq ==
      Seq((1L, 1.0), (2L, 22.0), (3L, 3.0)))

    // maintenance: compaction folds the accumulated epoch deletes away
    catalog.compact(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("cdc"), "dst"))
    assert(snap("cdc", "dst").deleteFiles.isEmpty)
    assert(spark.table("mor.cdc.dst").count() == 3L)
  }

  test("partition-boundary DELETE with live delete files cannot resurrect rows") {
    // identifier-fields WITHOUT merge-on-read write modes: deletes enter
    // via the upsert sink, the DELETE itself takes the copy-on-write
    // path — which must NOT get converted to the metadata-only commit
    // (ReplaceFiles drops delete files; kept files would resurrect rows)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mor.pbd")
    spark.sql("""CREATE TABLE mor.pbd.t (id BIGINT NOT NULL, cat STRING, v DOUBLE)
      PARTITIONED BY (cat)
      TBLPROPERTIES ('identifier-fields' = 'id')""")
    spark.sql("INSERT INTO mor.pbd.t VALUES (1,'a',1.0),(2,'a',2.0),(3,'b',3.0)")
    import spark.implicits._
    // upsert retires (2,'a',2.0) behind an equality-delete file
    graft.catalog.CatalogUpserts.upsertBatch(catalog.metadataStore,
      Seq("pbd"), "t", Seq((2L, "a", 22.0)).toDF("id", "cat", "v"))
    assert(snap("pbd", "t").deleteFiles.nonEmpty)

    spark.sql("DELETE FROM mor.pbd.t WHERE cat = 'b'")

    val after = snap("pbd", "t")
    assert(after.operation == "rewrite",
      s"metadata fast path must refuse while delete files live: ${after.operation}")
    val rows = spark.table("mor.pbd.t").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1).toSeq
    assert(rows == Seq((1L, 1.0), (2L, 22.0)), rows.toString)
  }

  test("renaming the identifier column after a delete keeps it applied") {
    mkMorTable("ren", "t")
    spark.sql("INSERT INTO mor.ren.t VALUES (1,'a',1.0),(2,'b',2.0)")
    spark.sql("DELETE FROM mor.ren.t WHERE id = 2")
    // the delete file's columns are keyed by FIELD ID — a rename of the
    // identifier column must not orphan the keys (all-null reads would
    // silently resurrect the row)
    spark.sql("ALTER TABLE mor.ren.t RENAME COLUMN id TO doc_key")
    val rows = spark.table("mor.ren.t").collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(1L), rows.toString)
  }

  test("an explicitly-disabled field-id session conf is honored, not overridden") {
    val key = "spark.sql.parquet.fieldId.read.enabled"
    mkMorTable("fid", "t")
    spark.sql("INSERT INTO mor.fid.t VALUES (1,'a',1.0),(2,'b',2.0)")
    // the user EXPLICITLY disabled field-id reads: the delete-key read
    // path must not silently flip the session conf back on (r7 advice);
    // without renames, name-resolution reads the same keys
    spark.conf.set(key, "false")
    try {
      spark.sql("DELETE FROM mor.fid.t WHERE id = 2")
      val rows = spark.table("mor.fid.t").collect().map(_.getLong(0)).toSeq
      assert(rows == Seq(1L), rows.toString)
      assert(spark.conf.get(key) == "false",
        "explicit false was overridden by the delete-key read path")
    } finally spark.conf.unset(key)
    // an untouched session still gets the lazy enable (rename safety)
    spark.sql("DELETE FROM mor.fid.t WHERE id = 1")
    assert(spark.table("mor.fid.t").count() == 0)
    assert(spark.conf.get(key) == "true")
  }

  test("explicit-off field-id conf + renamed key column refuses the read") {
    val key = "spark.sql.parquet.fieldId.read.enabled"
    mkMorTable("fidren", "t")
    spark.sql("INSERT INTO mor.fidren.t VALUES (1,'a',1.0),(2,'b',2.0)")
    spark.sql("DELETE FROM mor.fidren.t WHERE id = 2")
    spark.sql("ALTER TABLE mor.fidren.t RENAME COLUMN id TO doc_key")
    def chain(t: Throwable): String = {
      val sb = new StringBuilder
      var c: Throwable = t
      while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
      sb.toString
    }
    spark.conf.set(key, "false")
    try {
      // name-resolved delete keys would silently match nothing after
      // the rename (id=2 resurrects) — the scan must refuse loudly
      // (r8 advice), and so must both changelog surfaces
      val e = intercept[Exception] { spark.table("mor.fidren.t").collect() }
      assert(chain(e).contains("resurrect"), chain(e))
      val e2 = intercept[Exception] {
        graft.catalog.Changes.between(spark, "mor.fidren.t", 0).collect()
      }
      assert(chain(e2).contains("resurrect"), chain(e2))
      val e3 = intercept[Exception] {
        spark.read.table("mor.fidren.`t$changes`").collect()
      }
      assert(chain(e3).contains("resurrect"), chain(e3))
    } finally spark.conf.unset(key)
    // with field ids honored again the read is exact
    assert(spark.table("mor.fidren.t").collect().map(_.getLong(0)).toSeq
      == Seq(1L))
  }

  test("stale MoR delta fails cleanly when another commit interleaves") {
    mkMorTable("race", "t")
    spark.sql("INSERT INTO mor.race.t VALUES (1,'a',1.0),(2,'b',2.0)")
    // a second session-level mutation between planning and commit is
    // hard to stage deterministically through SQL; assert the guard at
    // the commit-algebra level instead: RowDelta under a stale
    // AssertCurrentSnapshotId must throw, not merge
    val store = catalog.metadataStore
    val (meta0, _) = store.load(Seq("race"), "t")
    spark.sql("INSERT INTO mor.race.t VALUES (3,'c',3.0)") // interleaved
    val e = intercept[graft.commit.CommitFailedException] {
      store.commitOps(Seq("race"), "t",
        Seq(graft.commit.Requirement.AssertCurrentSnapshotId(
          meta0.currentSnapshotId)),
        Seq(graft.commit.MetadataUpdate.RowDelta(Nil,
          List(graft.meta.DeleteFileDef("bogus.parquet", 0L, List(1), 1L)),
          System.currentTimeMillis())))
    }
    assert(e.getMessage.contains("snapshot changed"))
  }

  test("over-budget delete set applies as a distributed anti join") {
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mor.big")
    // a 1-byte budget forces ANY delete file over the broadcast-class
    // threshold — the MorDeleteJoin rule must take over
    spark.sql("""CREATE TABLE mor.big.t (id BIGINT NOT NULL, cat STRING, v DOUBLE)
      TBLPROPERTIES (
        'identifier-fields' = 'id',
        'write.delete.mode' = 'merge-on-read',
        'read.delete.byte-budget' = '1')""")
    spark.sql("INSERT INTO mor.big.t VALUES " +
      "(1,'a',1.0),(2,'b',2.0),(3,'c',3.0),(4,'d',4.0)")
    spark.sql("DELETE FROM mor.big.t WHERE id IN (2, 4)")
    // a deleted key re-inserted at a HIGHER sequence must survive the
    // join's sequence-scope conjunct
    spark.sql("INSERT INTO mor.big.t VALUES (4,'d2',44.0)")

    val df = spark.table("mor.big.t")
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1).toSeq
    assert(rows == Seq((1L, "a"), (3L, "c"), (4L, "d2")), rows.toString)
    // plan shape: the anti join is there, the driver-collect scan is not
    val antis = df.queryExecution.optimizedPlan.collect {
      case j: LJoin if j.joinType == LeftAnti => j
    }
    assert(antis.nonEmpty, df.queryExecution.optimizedPlan.toString)
    assert(!df.queryExecution.executedPlan.toString.contains("graft-mor("),
      "over-budget read must not take the driver-collected key path")
    // column pruning and aggregates ride the same join path
    assert(spark.sql("SELECT cat FROM mor.big.t ORDER BY cat").collect()
      .map(_.getString(0)).toSeq == Seq("a", "c", "d2"))
    assert(spark.sql("SELECT count(*) FROM mor.big.t").head().getLong(0) == 3L)
    // filters still push into the subset scans after the rewrite
    val filtered = spark.sql("SELECT id FROM mor.big.t WHERE v > 2.5")
    assert(filtered.collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
    assert(filtered.queryExecution.executedPlan.toString
      .contains("PushedFilters: [IsNotNull(v), GreaterThan(v,2.5)]"),
      s"filter must reach the parquet delegates:\n" +
        s"${filtered.queryExecution.executedPlan}")
  }

  test("DML on an over-budget table reads through the anti join and commits a delta") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mor.bigdml")
    spark.sql("""CREATE TABLE mor.bigdml.t (id BIGINT NOT NULL, cat STRING, v DOUBLE)
      TBLPROPERTIES (
        'identifier-fields' = 'id',
        'write.delete.mode' = 'merge-on-read',
        'write.update.mode' = 'merge-on-read',
        'write.merge.mode' = 'merge-on-read',
        'read.delete.byte-budget' = '1')""")
    spark.sql("INSERT INTO mor.bigdml.t VALUES " +
      "(1,'a',1.0),(2,'b',2.0),(3,'c',3.0),(4,'d',4.0)")
    // push the live delete set past the 1-byte budget
    spark.sql("DELETE FROM mor.bigdml.t WHERE id = 1")

    // every row-level command's matched-row read must now plan through
    // the MorDeleteJoin rewrite instead of dying at the scan's guard
    spark.sql("UPDATE mor.bigdml.t SET v = v * 10 WHERE cat = 'c'")
    val afterUpdate = snap("bigdml", "t")
    assert(afterUpdate.operation == "delta", "over-budget UPDATE must stay MoR")

    val filesBefore = snap("bigdml", "t").files.toSet
    spark.sql("DELETE FROM mor.bigdml.t WHERE v > 25") // non-key predicate
    val afterDelete = snap("bigdml", "t")
    assert(afterDelete.operation == "delta")
    assert(afterDelete.files.toSet == filesBefore,
      "over-budget DELETE must not rewrite data files")

    spark.sql("""MERGE INTO mor.bigdml.t t
      USING (SELECT * FROM VALUES (2L,'b2',22.0), (9L,'i',9.0) AS s(id,cat,v)) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")

    val rows = spark.table("mor.bigdml.t").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(rows == Seq((2L, "b2", 22.0), (4L, "d", 4.0), (9L, "i", 9.0)),
      rows.toString)
  }

  test("a large upsert key window spills to multiple right-sized delete files") {
    mkMorTable("spill", "t")
    spark.sql("INSERT INTO mor.spill.t " +
      "SELECT id, concat('c', id % 7), id * 1.0 FROM range(2000)")
    val batch = spark.sql(
      "SELECT id, concat('u', id % 7) AS cat, id * 2.0 AS v FROM range(2000)")
    // shrink AQE's advisory size so this window is "large" relative to
    // it — the key frame must fan out instead of funneling into one task
    val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "1KB")
    try graft.catalog.CatalogUpserts.upsertBatch(
      catalog.metadataStore, Seq("spill"), "t", batch)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    val s = snap("spill", "t")
    assert(s.deleteFiles.size > 1, s"expected a fan-out, got ${s.deleteFiles}")
    assert(s.deleteFiles.map(_.rows).sum == 2000)
    assert(s.deleteFiles.forall(_.bytes > 0))
    // every old row version retired, every new one live
    assert(spark.table("mor.spill.t").count() == 2000)
    assert(spark.sql("SELECT count(*) FROM mor.spill.t WHERE cat LIKE 'u%'")
      .head().getLong(0) == 2000)
  }

  test("keyless MoR DELETE writes position deletes and rewrites nothing") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mor.posd")
    // no identifier-fields: the equality-delete delta path has no row
    // id — the DELETE must land as (file, position) marks instead of a
    // copy-on-write rewrite
    spark.sql("""CREATE TABLE mor.posd.t (id BIGINT, cat STRING, v DOUBLE)
      TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO mor.posd.t VALUES " +
      "(1,'a',1.0),(2,'b',200.0),(3,'c',300.0)")
    val before = snap("posd", "t")

    spark.sql("DELETE FROM mor.posd.t WHERE v > 100")

    val after = snap("posd", "t")
    assert(after.files == before.files,
      "position delete must not rewrite data files")
    assert(after.deleteFiles.nonEmpty &&
      after.deleteFiles.forall(_.keyFieldIds.isEmpty))
    assert(after.deleteFiles.map(_.rows).sum == 2)
    assert(after.deleteFiles.forall(_.bytes > 0))
    // reads subtract the positions (projections and residual filters
    // are applied above the counting reader)
    assert(spark.table("mor.posd.t").collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(spark.sql("SELECT cat FROM mor.posd.t").collect()
      .map(_.getString(0)).toSeq == Seq("a"))
    assert(spark.sql("SELECT count(*) FROM mor.posd.t WHERE v < 50")
      .head().getLong(0) == 1L)
    // $files labels the flavor
    assert(spark.sql("SELECT content FROM mor.posd.`t$files`").collect()
      .map(_.getString(0)).contains("position-deletes"))
    // files added AFTER the delete are untouched by its positions
    spark.sql("INSERT INTO mor.posd.t VALUES (4,'d',400.0)")
    assert(spark.table("mor.posd.t").count() == 2)
    // a second delete marks rows across old and new files
    spark.sql("DELETE FROM mor.posd.t WHERE id IN (1, 4)")
    assert(spark.table("mor.posd.t").count() == 0)
    // time travel to before the deletes still sees all rows
    val preVersion = catalog.metadataStore.load(Seq("posd"), "t")._2 - 3
    assert(spark.sql(s"SELECT count(*) FROM mor.posd.t VERSION AS OF $preVersion")
      .head().getLong(0) == 3L)
    // compaction folds the positions away and restores the plain path
    spark.sql("INSERT INTO mor.posd.t VALUES (5,'e',5.0)")
    catalog.compact(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("posd"), "t"))
    val compacted = snap("posd", "t")
    assert(compacted.deleteFiles.isEmpty,
      "compaction must purge position-delete files")
    assert(spark.table("mor.posd.t").collect().map(_.getLong(0)).toSeq ==
      Seq(5L))
  }

  test("keyless MoR UPDATE/MERGE ride the position-delta path") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mor.poskey")
    // no identifier-fields, all commands merge-on-read: row id is the
    // physical (file, pos) coordinate
    spark.sql("""CREATE TABLE mor.poskey.t (id BIGINT, cat STRING, v DOUBLE)
      TBLPROPERTIES (
        'write.delete.mode' = 'merge-on-read',
        'write.update.mode' = 'merge-on-read',
        'write.merge.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO mor.poskey.t VALUES " +
      "(1,'a',1.0),(2,'b',2.0),(3,'c',3.0)")
    val before = snap("poskey", "t")

    spark.sql("UPDATE mor.poskey.t SET v = v * 10 WHERE id >= 2")

    val after = snap("poskey", "t")
    assert(after.operation == "delta", "keyless MoR UPDATE must stay delta")
    assert(before.files.toSet.subsetOf(after.files.toSet),
      "position-delta UPDATE must not rewrite existing data files")
    assert(after.deleteFiles.nonEmpty &&
      after.deleteFiles.forall(_.keyFieldIds.isEmpty),
      "the delete files must be position-flavored")
    assert(after.deleteFiles.map(_.rows).sum == 2)
    val rows1 = spark.table("mor.poskey.t").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1).toSeq
    assert(rows1 == Seq((1L, 1.0), (2L, 20.0), (3L, 30.0)), rows1.toString)

    // a second UPDATE must read THROUGH the first one's position marks:
    // the retired row versions cannot re-match
    spark.sql("UPDATE mor.poskey.t SET v = v + 1 WHERE id = 2")
    val rows2 = spark.table("mor.poskey.t").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1).toSeq
    assert(rows2 == Seq((1L, 1.0), (2L, 21.0), (3L, 30.0)), rows2.toString)

    // MERGE: matched update + not-matched insert, same coordinates path
    spark.sql("""MERGE INTO mor.poskey.t t
      USING (SELECT * FROM VALUES (3L,'c2',333.0), (7L,'g',7.0) AS s(id,cat,v)) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val rows3 = spark.table("mor.poskey.t").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(rows3 == Seq((1L, "a", 1.0), (2L, "b", 21.0), (3L, "c2", 333.0),
      (7L, "g", 7.0)), rows3.toString)
    assert(snap("poskey", "t").operation == "delta")

    // a DELETE whose condition can't convert to filters (subquery) has
    // no metadata-only path — it must run as a position delta, not CoW
    val filesBefore = snap("poskey", "t").files.toSet
    spark.sql("""DELETE FROM mor.poskey.t
      WHERE id IN (SELECT id FROM mor.poskey.t WHERE v > 100)""")
    val afterDel = snap("poskey", "t")
    assert(afterDel.operation == "delta")
    assert(afterDel.files.toSet == filesBefore,
      "delta DELETE must not rewrite data files")
    assert(spark.table("mor.poskey.t").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 7L))

    // MERGE's matched-DELETE branch rides the same coordinate writer
    spark.sql("""MERGE INTO mor.poskey.t t
      USING (SELECT 7L AS id) s ON t.id = s.id
      WHEN MATCHED THEN DELETE""")
    assert(spark.table("mor.poskey.t").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L))
    assert(snap("poskey", "t").operation == "delta")
  }

  test("row coordinates are queryable metadata columns") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mor.poscol")
    spark.sql("""CREATE TABLE mor.poscol.t (id BIGINT, cat STRING)
      TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO mor.poscol.t VALUES (1,'a'),(2,'b'),(3,'c')")
    val coords = spark.sql(
      "SELECT id, _graft_file, _graft_pos FROM mor.poscol.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(coords.length == 3)
    assert(coords.forall(_._2.endsWith(".parquet")))
    // positions are 0-based per file and unique within one
    assert(coords.groupBy(_._2).values.forall(g =>
      g.map(_._3).sorted.toSeq == (0L until g.length).toSeq))
    // dead positions disappear from the surface but later rows keep
    // their ORIGINAL file coordinates (positions never re-number)
    spark.sql("DELETE FROM mor.poscol.t WHERE id = 2")
    val survivors = spark.sql(
      "SELECT id, _graft_pos FROM mor.poscol.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val deadPos = coords.find(_._1 == 2L).get._3
    assert(!survivors.exists(_._2 == deadPos) ||
      coords.map(_._2).distinct.length > 1)
    assert(survivors.map(_._1) == Seq(1L, 3L))
    // metadata columns resolve at ANY projection position (the reader
    // projects (data ++ [file, pos]) into the requested order)
    val reordered = spark.sql(
      "SELECT _graft_pos, cat, _graft_file, id FROM mor.poscol.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(reordered.map(_._4).toSeq == Seq(1L, 3L))
    assert(reordered.forall(_._3.endsWith(".parquet")))
    // an equality filter on the file coordinate prunes the scan to
    // exactly that file (and still answers correctly)
    val oneFile = reordered.head._3
    val scoped = spark.sql(
      s"SELECT id FROM mor.poscol.t WHERE _graft_file = '$oneFile'")
    assert(scoped.collect().map(_.getLong(0)).nonEmpty)
    val scanLine = scoped.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("graft-posdelta")).getOrElse("")
    assert(scanLine.contains("graft-posdelta(1 files)"),
      s"expected a single-file coordinate scan, got: $scanLine")
  }

  test("over-budget position deletes apply as a coordinate anti join") {
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mor.bigpos")
    spark.sql("""CREATE TABLE mor.bigpos.t (id BIGINT, cat STRING, v DOUBLE)
      TBLPROPERTIES (
        'write.delete.mode' = 'merge-on-read',
        'write.update.mode' = 'merge-on-read',
        'read.delete.byte-budget' = '1')""")
    spark.sql("INSERT INTO mor.bigpos.t VALUES " +
      "(1,'a',1.0),(2,'b',2.0),(3,'c',3.0),(4,'d',4.0)")
    spark.sql("DELETE FROM mor.bigpos.t WHERE id IN (2, 4)")

    val df = spark.table("mor.bigpos.t")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    val antis = df.queryExecution.optimizedPlan.collect {
      case j: LJoin if j.joinType == LeftAnti => j
    }
    assert(antis.nonEmpty, df.queryExecution.optimizedPlan.toString)
    // projection and aggregation ride the join path
    assert(spark.sql("SELECT cat FROM mor.bigpos.t ORDER BY cat").collect()
      .map(_.getString(0)).toSeq == Seq("a", "c"))
    assert(spark.sql("SELECT count(*) FROM mor.bigpos.t").head().getLong(0) == 2L)
    // DML on the over-budget table still plans (matched-row read keeps
    // its coordinates through the join) and commits a delta
    spark.sql("UPDATE mor.bigpos.t SET v = v * 10 WHERE id = 3")
    assert(snap("bigpos", "t").operation == "delta")
    val rows = spark.table("mor.bigpos.t").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1).toSeq
    assert(rows == Seq((1L, 1.0), (3L, 30.0)), rows.toString)
    // rows re-inserted AFTER the marks are untouched by them
    spark.sql("INSERT INTO mor.bigpos.t VALUES (2,'b2',22.0)")
    assert(spark.table("mor.bigpos.t").count() == 3)
  }

  test("identifier-fields cannot flip while the other flavor is live") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mor.flip")
    spark.sql("""CREATE TABLE mor.flip.t (id BIGINT NOT NULL, v DOUBLE)
      TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO mor.flip.t VALUES (1,1.0),(2,2.0)")
    spark.sql("DELETE FROM mor.flip.t WHERE id = 1") // position marks
    // declaring keys now would route future DML to EQUALITY deletes —
    // a mixed live set no read path applies in full. Refuse.
    val e = intercept[Exception] {
      spark.sql(
        "ALTER TABLE mor.flip.t SET TBLPROPERTIES('identifier-fields'='id')")
    }
    assert(e.getMessage.contains("compact first"), e.getMessage)
    // fold the marks in; the flip then succeeds, and so does the
    // reverse refusal once equality deletes are live
    catalog.compact(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("flip"), "t"))
    spark.sql(
      "ALTER TABLE mor.flip.t SET TBLPROPERTIES('identifier-fields'='id')")
    spark.sql("DELETE FROM mor.flip.t WHERE id = 2") // equality delete
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE mor.flip.t UNSET TBLPROPERTIES('identifier-fields')")
    }
    assert(e2.getMessage.contains("compact first"), e2.getMessage)
  }

  // ---- promotion of provably-untouched files out of the dirty path ----

  private def rawV2Scans(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.connector.read.Scan] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def walk(p: SparkPlan): Seq[org.apache.spark.sql.connector.read.Scan] =
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case b: BatchScanExec => Seq(b.scan)
        case o => o.children.flatMap(walk)
      }
    walk(df.queryExecution.executedPlan)
  }

  private def v2Scans(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.connector.read.Scan] = {
    def unwrap(s: org.apache.spark.sql.connector.read.Scan)
        : org.apache.spark.sql.connector.read.Scan = s match {
      case g: graft.catalog.GraftScan => unwrap(g.currentDelegate)
      case other => other
    }
    rawV2Scans(df).map(unwrap)
  }

  private def baseName(p: String): String = new java.io.File(p).getName

  /** (clean-side, dirty-side) data file names of the plan's MorScan. */
  private def morSides(df: org.apache.spark.sql.DataFrame)
      : (Set[String], Set[String]) = {
    import org.apache.spark.sql.execution.datasources.FilePartition
    val scans = v2Scans(df)
    val mor = scans.collectFirst { case m: graft.catalog.MorScan => m }
    assert(mor.nonEmpty, s"no MorScan among ${scans.map(_.description())}")
    def names(p: org.apache.spark.sql.connector.read.InputPartition) = p match {
      case f: FilePartition =>
        f.files.toSeq.map(pf => baseName(pf.filePath.toString))
      case _ => Nil
    }
    val tagged = mor.get.toBatch.planInputPartitions().toSeq
      .collect { case m: graft.catalog.MorInputPartition => m }
    (tagged.filter(_.side < 0).flatMap(p => names(p.delegate)).toSet,
      tagged.filter(_.side >= 0).flatMap(p => names(p.delegate)).toSet)
  }

  test("manifest [min,max] promotes untouched files out of the dirty path") {
    mkMorTable("promo1", "t")
    spark.sql("INSERT INTO mor.promo1.t VALUES (1,'a',1.0),(2,'b',2.0),(3,'c',3.0)")
    val filesA = snap("promo1", "t").files
    spark.sql("INSERT INTO mor.promo1.t VALUES (100,'x',1.0),(101,'y',2.0),(102,'z',3.0)")
    val filesB = snap("promo1", "t").files.filterNot(filesA.toSet)
    spark.sql("DELETE FROM mor.promo1.t WHERE id = 100")

    // sequence scoping alone calls EVERY pre-delete file dirty; the
    // harvested id [min,max] proves the first batch never held key 100
    val df = spark.table("mor.promo1.t")
    val (clean, dirty) = morSides(df)
    val aNames = filesA.map(baseName).toSet
    val bNames = filesB.map(baseName).toSet
    assert(dirty.nonEmpty && dirty.subsetOf(bNames),
      s"dirty=$dirty should only hold second-batch files $bNames")
    assert(aNames.subsetOf(clean),
      s"first batch $aNames must read clean (clean=$clean)")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 101L, 102L))
  }

  test("footer blooms promote files the [min,max] stats cannot clear") {
    import spark.implicits._
    for ((ns, bloom) <- Seq(("promo2", true), ("promo2n", false))) {
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS mor.$ns")
      val bloomProp =
        if (bloom) ",\n'write.parquet.bloom-filter-columns' = 'id'" else ""
      spark.sql(s"""CREATE TABLE mor.$ns.t (id BIGINT NOT NULL, cat STRING, v DOUBLE)
        TBLPROPERTIES (
          'identifier-fields' = 'id',
          'write.delete.mode' = 'merge-on-read',
          'write.update.mode' = 'merge-on-read',
          'write.merge.mode' = 'merge-on-read'$bloomProp)""")
      // one-task writes → exactly one file per batch. File A spans
      // [1,3] but SKIPS 2; file B holds 2. Stats cannot clear A
      // (2 ∈ [1,3]) — only its bloom can prove 2 never lived there.
      Seq((1L, "a", 1.0), (3L, "c", 3.0)).toDF("id", "cat", "v")
        .coalesce(1).writeTo(s"mor.$ns.t").append()
      val filesA = snap(ns, "t").files
      Seq((2L, "b", 2.0), (100L, "x", 4.0)).toDF("id", "cat", "v")
        .coalesce(1).writeTo(s"mor.$ns.t").append()
      val filesB = snap(ns, "t").files.filterNot(filesA.toSet)
      spark.sql(s"DELETE FROM mor.$ns.t WHERE id = 2")

      val df = spark.table(s"mor.$ns.t")
      val (clean, dirty) = morSides(df)
      val aNames = filesA.map(baseName).toSet
      val bNames = filesB.map(baseName).toSet
      if (bloom) {
        assert(dirty == bNames && aNames.subsetOf(clean),
          s"blooms should clear $aNames: clean=$clean dirty=$dirty")
      } else {
        // without blooms the range-trapped file stays on the dirty side
        assert(dirty == (aNames ++ bNames),
          s"no blooms declared — $aNames must stay dirty (dirty=$dirty)")
      }
      assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L, 100L))
    }
  }

  test("bloom promotion survives column type widening (int to bigint)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mor.widen")
    spark.sql("""CREATE TABLE mor.widen.t (id INT NOT NULL, cat STRING)
      TBLPROPERTIES (
        'identifier-fields' = 'id',
        'write.delete.mode' = 'merge-on-read',
        'write.update.mode' = 'merge-on-read',
        'write.merge.mode' = 'merge-on-read',
        'write.parquet.bloom-filter-columns' = 'id')""")
    import spark.implicits._
    Seq((5, "a"), (100, "b")).toDF("id", "cat")
      .coalesce(1).writeTo("mor.widen.t").append()
    val files = snap("widen", "t").files
    spark.sql("ALTER TABLE mor.widen.t ALTER COLUMN id TYPE BIGINT")
    spark.sql("DELETE FROM mor.widen.t WHERE id = 5")

    // the old file is INT32 on disk; the delete key is now a Long. The
    // bloom hash of Integer(5) and Long(5) differ — boxing by the
    // table's widened type would "prove" 5 absent and resurrect the row
    val df = spark.table("mor.widen.t")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(100L))
    val (_, dirty) = morSides(df)
    assert(files.map(baseName).toSet.subsetOf(dirty),
      s"the INT32 file must stay dirty (dirty=$dirty)")

    // the membership test itself, against the INT32 file's footer:
    // present key (as Long) hits, absent key misses, a key past the
    // physical type's range is proven absent outright
    val abs = s"$wh/widen/t/data/${files.head}"
    val hconf = spark.sessionState.newHadoopConf()
    def may(v: Long): Boolean = graft.catalog.MergeOnRead.bloomMayContainAny(
      abs, hconf, Seq(Seq(("id", Seq(v): Iterable[Any]))))
    assert(may(5L), "present key must hit the bloom through the Integer box")
    assert(!may(6L), "absent in-range key must miss")
    assert(!may(1L << 40), "a key past Int.MaxValue cannot live in INT32")
  }

  test("string stats pruning orders keys like parquet (unsigned UTF-8)") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mor.ustr")
    spark.sql("""CREATE TABLE mor.ustr.t (k STRING NOT NULL, v DOUBLE)
      TBLPROPERTIES (
        'identifier-fields' = 'k',
        'write.delete.mode' = 'merge-on-read',
        'write.update.mode' = 'merge-on-read',
        'write.merge.mode' = 'merge-on-read')""")
    // U+FFFD sorts ABOVE the emoji in UTF-16 code units but BELOW it in
    // UTF-8 bytes (parquet's stats order) — a UTF-16 comparison against
    // the harvested [min,max] would call the emoji out of range, prune
    // the file, and resurrect the deleted row
    val rep = "\uFFFD"
    val emoji = "\uD83D\uDE00"
    Seq((rep, 1.0), (emoji, 2.0)).toDF("k", "v")
      .coalesce(1).writeTo("mor.ustr.t").append()
    spark.sql(s"DELETE FROM mor.ustr.t WHERE k = '$emoji'")

    val df = spark.table("mor.ustr.t")
    assert(df.collect().map(_.getString(0)).toSeq == Seq(rep))
    val (_, dirty) = morSides(df)
    assert(dirty.nonEmpty, "the file holding the emoji key must stay dirty")
  }

  test("driver metrics report selection, dirty counts, and promotions") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mor.pm")
    spark.sql("""CREATE TABLE mor.pm.t (id BIGINT NOT NULL, cat STRING, v DOUBLE)
      TBLPROPERTIES (
        'identifier-fields' = 'id',
        'write.delete.mode' = 'merge-on-read',
        'write.update.mode' = 'merge-on-read',
        'write.merge.mode' = 'merge-on-read',
        'write.parquet.bloom-filter-columns' = 'id')""")
    // three one-task files: A [1,3] without 2 (bloom-promotable for key
    // 2), B [10,11] (stats-promotable), C holds 2 (stays dirty)
    Seq((1L, "a", 1.0), (3L, "c", 3.0)).toDF("id", "cat", "v")
      .coalesce(1).writeTo("mor.pm.t").append()
    Seq((10L, "j", 1.0), (11L, "k", 2.0)).toDF("id", "cat", "v")
      .coalesce(1).writeTo("mor.pm.t").append()
    Seq((2L, "b", 2.0), (100L, "x", 4.0)).toDF("id", "cat", "v")
      .coalesce(1).writeTo("mor.pm.t").append()
    spark.sql("DELETE FROM mor.pm.t WHERE id = 2")

    val df = spark.table("mor.pm.t")
    df.collect() // force planning (metrics are planning-time counters)
    val gs = rawV2Scans(df).collectFirst { case g: graft.catalog.GraftScan => g }
    assert(gs.nonEmpty)
    val names = gs.get.supportedCustomMetrics().map(_.name()).toSet
    val m = gs.get.reportDriverMetrics().map(t => t.name() -> t.value()).toMap
    assert(m.keySet.subsetOf(names), s"unregistered metrics: ${m.keySet -- names}")
    assert(m(graft.catalog.ScanMetrics.FilesSelected) == 3, m.toString)
    assert(m(graft.catalog.ScanMetrics.DeleteFilesLive) == 1, m.toString)
    assert(m(graft.catalog.ScanMetrics.FilesDirtyEq) == 1, m.toString)
    assert(m(graft.catalog.ScanMetrics.FilesPromotedStats) == 1, m.toString)
    assert(m(graft.catalog.ScanMetrics.FilesPromotedBloom) == 1, m.toString)
    assert(m(graft.catalog.ScanMetrics.FilesDirtyPos) == 0, m.toString)
  }

  test("filtering readers report subtracted rows as task metrics") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.types.LongType
    def fakeReader(rows: Seq[InternalRow])
        : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] =
      new org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {
        private val it = rows.iterator
        private var cur: InternalRow = _
        override def next(): Boolean =
          if (it.hasNext) { cur = it.next(); true } else false
        override def get(): InternalRow = cur
        override def close(): Unit = ()
      }
    def drain(r: org.apache.spark.sql.connector.read.PartitionReader[InternalRow])
        : Int = { var n = 0; while (r.next()) n += 1; n }
    def metric(r: org.apache.spark.sql.connector.read.PartitionReader[InternalRow],
               name: String): Long =
      r.currentMetricsValues().find(_.name() == name).map(_.value()).getOrElse(-1L)

    // equality subtract: keys {2, 3} kill two of four rows
    val eq = new graft.catalog.MorFilteringReader(
      fakeReader((1L to 4L).map(i => new GenericInternalRow(Array[Any](i)))),
      graft.catalog.MorSpec(Seq(graft.catalog.MorPredicate(
        Array(0), Array(LongType), Set(List(2L), List(3L)))), -1, Array(LongType)))
    assert(drain(eq) == 2)
    assert(metric(eq, graft.catalog.ScanMetrics.RowsSubtractedEq) == 2L)

    // position subtract: marked index 1 kills one of three rows
    val pos = new graft.catalog.PosFilteringReader(
      fakeReader((0L to 2L).map(i =>
        new GenericInternalRow(Array[Any](i * 10, i)))),
      Set(1L), Array(LongType))
    assert(drain(pos) == 2)
    assert(metric(pos, graft.catalog.ScanMetrics.RowsSubtractedPos) == 1L)
  }

  test("a scan whose every dirty file is provably untouched skips MorScan") {
    mkMorTable("promo3", "t")
    spark.sql("INSERT INTO mor.promo3.t VALUES (1,'a',1.0),(2,'b',2.0),(3,'c',3.0)")
    spark.sql("INSERT INTO mor.promo3.t VALUES (100,'x',1.0),(101,'y',2.0)")
    spark.sql("DELETE FROM mor.promo3.t WHERE id = 100")
    // the pushed filter prunes the second batch by file stats; the
    // surviving first-batch files are then promoted (key 100 ∉ [1,3]) —
    // nothing dirty remains, so the plan is the plain delegate scan
    val df = spark.table("mor.promo3.t").where("id <= 3")
    val scans = v2Scans(df)
    assert(scans.nonEmpty &&
      scans.forall(!_.isInstanceOf[graft.catalog.MorScan]),
      scans.map(_.description()).mkString("; "))
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("keyless CoW UPDATE composes with live position deletes") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mor.posd2")
    spark.sql("""CREATE TABLE mor.posd2.t (id BIGINT, cat STRING, v DOUBLE)
      TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO mor.posd2.t VALUES " +
      "(1,'a',1.0),(2,'b',200.0),(3,'c',3.0)")
    spark.sql("DELETE FROM mor.posd2.t WHERE v > 100") // position marks
    // keyless UPDATE is copy-on-write: the rewrite must read THROUGH the
    // position deletes (no resurrection of row 2) and the rewrite commit
    // must keep the delete files for untouched files
    spark.sql("UPDATE mor.posd2.t SET cat = 'Z' WHERE id = 3")
    val rows = spark.table("mor.posd2.t").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(rows == Seq((1L, "a"), (3L, "Z")), rows.toString)
  }
}
