package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.{Changes, GraftCatalog}
import org.apache.spark.sql.connector.catalog.Identifier

/** Row-level CDC semantics of [[Changes.between]]: inserts, deletes,
  * update pairs, compaction silence, and version-window bounds. */
class ChangesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val wh = Files.createTempDirectory("graft-cdc-wh").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.graft.warehouse", wh)
    .withExtensions(new graft.functions.GraftExtensions)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]
  private def version(t: String): Int =
    cat.metadataStore.currentVersion(Seq("cdc"), t)
  private def version2(ns: String, t: String): Int =
    cat.metadataStore.currentVersion(Seq(ns), t)

  private def changes(t: String, from: Int, to: Option[Int] = None) =
    Changes.between(spark, s"graft.cdc.$t", from, to)
      .select(col("k"), col("v"), col("_change_type"), col("_commit_version"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet

  test("append, MoR delete, and MoR update land as insert/delete/update pairs") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cdc")
    spark.sql("""CREATE TABLE graft.cdc.t (k INT NOT NULL, v STRING)
      TBLPROPERTIES ('identifier-fields' = 'k',
        'write.delete.mode' = 'merge-on-read',
        'write.update.mode' = 'merge-on-read')""")
    val v0 = version("t")
    spark.sql("INSERT INTO graft.cdc.t VALUES (1,'a'),(2,'b'),(3,'c')")
    spark.sql("DELETE FROM graft.cdc.t WHERE k = 2")
    spark.sql("UPDATE graft.cdc.t SET v = 'A' WHERE k = 1")
    assert(changes("t", v0) == Set(
      (1, "a", "insert"), (2, "b", "insert"), (3, "c", "insert"),
      (2, "b", "delete"),
      (1, "a", "update_preimage"), (1, "A", "update_postimage")))
  }

  test("deleting an already-deleted key emits no phantom preimage") {
    val v1 = version("t")
    // k=2 is already gone: a second delete covering it must emit nothing
    spark.sql("DELETE FROM graft.cdc.t WHERE k = 2")
    assert(changes("t", v1).isEmpty,
      "re-deleting a dead key must not resurrect its row in the feed")
  }

  test("compaction is silent; the window composes across it") {
    val v2 = version("t")
    cat.compact(Identifier.of(Array("cdc"), "t"))
    assert(changes("t", v2).isEmpty, "compaction changed no rows")
    // post-compaction mutation still reports, and reads the compacted state
    val v3 = version("t")
    spark.sql("DELETE FROM graft.cdc.t WHERE k = 3")
    assert(changes("t", v3) == Set((3, "c", "delete")))
    // a window spanning compaction = union of the per-step changes
    assert(changes("t", v2) == Set((3, "c", "delete")))
  }

  test("INSERT OVERWRITE reports removed rows as deletes, new rows as inserts") {
    spark.sql("""CREATE TABLE graft.cdc.ow (k INT, v STRING)""")
    spark.sql("INSERT INTO graft.cdc.ow VALUES (1,'x'),(2,'y')")
    val v1 = version("ow")
    spark.sql("INSERT OVERWRITE graft.cdc.ow VALUES (9,'z')")
    assert(changes("ow", v1) == Set(
      (1, "x", "delete"), (2, "y", "delete"), (9, "z", "insert")))
  }

  test("version window bounds: (from, to] is honored") {
    spark.sql("""CREATE TABLE graft.cdc.w (k INT, v STRING)""")
    val v0 = version("w")
    spark.sql("INSERT INTO graft.cdc.w VALUES (1,'a')")
    val v1 = version("w")
    spark.sql("INSERT INTO graft.cdc.w VALUES (2,'b')")
    val v2 = version("w")
    assert(changes("w", v0, Some(v1)) == Set((1, "a", "insert")))
    assert(changes("w", v1, Some(v2)) == Set((2, "b", "insert")))
    assert(changes("w", v2).isEmpty, "empty window → empty feed")
    assertThrows[IllegalArgumentException](changes("w", v2 + 1, Some(v2)))
  }

  test("t$changes batch table serves the same changelog as Changes.between") {
    // the $changes surface emits insert/delete (no update pairing) —
    // so it must equal Changes.between with pre/post mapped back down
    val viaApi = Changes.between(spark, "graft.cdc.t", 0)
      .select(col("k"), col("v"),
        when(col("_change_type") === "update_preimage", "delete")
          .when(col("_change_type") === "update_postimage", "insert")
          .otherwise(col("_change_type")).as("_change_type"),
        col("_commit_version"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getInt(3)))
      .toSet
    val viaTable = spark.read.table("graft.cdc.`t$changes`")
      .select(col("k"), col("v"), col("_change_type"), col("_commit_version"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getInt(3)))
      .toSet
    assert(viaTable == viaApi,
      s"missing ${viaApi -- viaTable}, invented ${viaTable -- viaApi}")
    // windowed read honors the exclusive-from (from, to] options: the
    // (1, 2] window is exactly what to-version=2 adds over to-version=1
    val windowed = spark.read
      .option("from-version", 1).option("to-version", 2)
      .table("graft.cdc.`t$changes`")
    assert(windowed.count() ==
      spark.read.option("to-version", 2).table("graft.cdc.`t$changes`").count()
        - spark.read.option("to-version", 1).table("graft.cdc.`t$changes`").count())
  }

  test("t$changes streams deletes as rows (the CDC tail the data stream refuses)") {
    import scala.jdk.CollectionConverters._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cdcs")
    spark.sql("""CREATE TABLE graft.cdcs.t (k INT NOT NULL, v STRING)
      TBLPROPERTIES ('identifier-fields' = 'k',
        'write.delete.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO graft.cdcs.t VALUES (1,'a'),(2,'b')")

    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdc-ckpt").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, String)]()
    val q = spark.readStream.table("graft.cdcs.`t$changes`")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       _: Long) =>
        df.select(col("k"), col("v"), col("_change_type")).collect()
          .foreach(r => seen.add((r.getInt(0), r.getString(1), r.getString(2)))); ()
      }.start()
    try {
      q.processAllAvailable()
      assert(seen.asScala.toSet == Set((1, "a", "insert"), (2, "b", "insert")))
      // a MoR delete mid-stream arrives as a delete ROW — this exact
      // situation fails the plain data stream by design
      spark.sql("DELETE FROM graft.cdcs.t WHERE k = 1")
      q.processAllAvailable()
      assert(seen.asScala.toSet.contains((1, "a", "delete")),
        s"expected a streamed delete row, got ${seen.asScala.toSet}")
      spark.sql("INSERT INTO graft.cdcs.t VALUES (3,'c')")
      q.processAllAvailable()
      assert(seen.asScala.toSet.contains((3, "c", "insert")))
    } finally q.stop()
  }

  test("re-inserting a previously deleted key reappears as an insert in both surfaces") {
    // graft.cdcs.t currently: k=1 deleted (equality delete), k=2 live, k=3 live
    val v = version2("cdcs", "t")
    spark.sql("INSERT INTO graft.cdcs.t VALUES (1,'a2')")
    val viaTable = spark.read.option("from-version", v)
      .table("graft.cdcs.`t$changes`")
      .select(col("k"), col("v"), col("_change_type"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(viaTable == Set((1, "a2", "insert")),
      s"t\\$$changes must emit the re-insert (prior deletes must not mask " +
        s"files added later), got $viaTable")
    val viaApi = Changes.between(spark, "graft.cdcs.t", v)
      .select(col("k"), col("v"), col("_change_type"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(viaApi == Set((1, "a2", "insert")))
  }

  test("upserting a brand-new key is an insert, not an unpaired postimage") {
    // the upsert sink's RowDelta equality-deletes EVERY batch key, new
    // or not — a first-time key's delete masks nothing, so the feed
    // must label its row 'insert' and pair only the existing key
    val v = version2("cdcs", "t")
    val store = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog].metadataStore
    import spark.implicits._
    catalog.CatalogUpserts.upsertBatch(store, Seq("cdcs"), "t",
      Seq((2, "B2"), (9, "new")).toDF("k", "v"))
    val feed = Changes.between(spark, "graft.cdcs.t", v)
      .select(col("k"), col("v"), col("_change_type"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(feed == Set(
      (2, "b", "update_preimage"), (2, "B2", "update_postimage"),
      (9, "new", "insert")),
      s"got $feed")
  }

  test("overwriting after a MoR delete emits no phantom delete for the dead row") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cdcp")
    spark.sql("""CREATE TABLE graft.cdcp.t (k INT NOT NULL, v STRING)
      TBLPROPERTIES ('identifier-fields' = 'k',
        'write.delete.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO graft.cdcp.t VALUES (1,'a'),(2,'b')")
    spark.sql("DELETE FROM graft.cdcp.t WHERE k = 1") // k=1 died HERE
    val v = version2("cdcp", "t")
    spark.sql("INSERT OVERWRITE graft.cdcp.t VALUES (5,'z')")
    // the overwrite removes the original file, but k=1's row was
    // already dead — only the surviving k=2 emits a delete
    val expected = Set((2, "b", "delete"), (5, "z", "insert"))
    val viaApi = Changes.between(spark, "graft.cdcp.t", v)
      .select(col("k"), col("v"), col("_change_type"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(viaApi == expected, s"Changes.between got $viaApi")
    val viaTable = spark.read.option("from-version", v)
      .table("graft.cdcp.`t$changes`")
      .select(col("k"), col("v"), col("_change_type"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(viaTable == expected, s"t\\$$changes got $viaTable")
  }

  test("t$changes stream paces history replay with max-files-per-trigger") {
    import scala.jdk.CollectionConverters._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cdcr")
    spark.sql("CREATE TABLE graft.cdcr.t (k INT, v STRING)")
    spark.sql("INSERT INTO graft.cdcr.t VALUES (1,'a')")
    spark.sql("INSERT INTO graft.cdcr.t VALUES (2,'b')")
    spark.sql("INSERT INTO graft.cdcr.t VALUES (3,'c')")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdcr-ckpt").toString
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Int]]()
    val q = spark.readStream
      .option("max-files-per-trigger", "1")
      .table("graft.cdcr.`t$changes`")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       _: Long) =>
        val ks = df.select(col("k")).collect().map(_.getInt(0)).sorted.toSeq
        if (ks.nonEmpty) batches.add(ks); ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val got = batches.asScala.toSeq
    assert(got.flatten.sorted == Seq(1, 2, 3), s"lost/duped rows: $got")
    assert(got.length == 3,
      s"one-file budget must pace 3 single-file commits into 3 batches, got $got")
  }

  test("t$changes stream paces by bytes with max-bytes-per-trigger") {
    import scala.jdk.CollectionConverters._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cdcb")
    spark.sql("CREATE TABLE graft.cdcb.t (k INT, v STRING)")
    spark.sql("INSERT INTO graft.cdcb.t VALUES (1,'a')")
    spark.sql("INSERT INTO graft.cdcb.t VALUES (2,'b')")
    spark.sql("INSERT INTO graft.cdcb.t VALUES (3,'c')")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdcb-ckpt").toString
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Int]]()
    val q = spark.readStream
      .option("max-bytes-per-trigger", "1")
      .table("graft.cdcb.`t$changes`")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       _: Long) =>
        val ks = df.select(col("k")).collect().map(_.getInt(0)).sorted.toSeq
        if (ks.nonEmpty) batches.add(ks); ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val got = batches.asScala.toSeq
    assert(got.flatten.sorted == Seq(1, 2, 3), s"lost/duped rows: $got")
    assert(got.length == 3,
      s"a 1-byte budget must pace 3 commits into 3 batches, got $got")
  }

  test("one oversized append commit paces into multiple batches (sub-commit offsets)") {
    import scala.jdk.CollectionConverters._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cdcsp")
    spark.sql("CREATE TABLE graft.cdcsp.t (k BIGINT)")
    // ONE commit, several files (one per shuffle partition) — the
    // "giant backfill append" shape that used to arrive as one
    // unboundable micro-batch regardless of pacing
    spark.sql("INSERT INTO graft.cdcsp.t SELECT id FROM range(0, 400)")
    val nFiles = spark.sql("SELECT count(*) FROM graft.cdcsp.`t$files`")
      .head.getLong(0)
    assert(nFiles >= 2, s"need a multi-file commit, got $nFiles")

    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdcsp-ckpt").toString
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
    def start() = spark.readStream
      .option("max-files-per-trigger", "1")
      .table("graft.cdcsp.`t$changes`")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       _: Long) =>
        val ks = df.select(col("k")).collect().map(_.getLong(0)).toSeq
        if (ks.nonEmpty) batches.add(ks); ()
      }.start()
    val q = start()
    try q.processAllAvailable() finally q.stop()
    val first = batches.asScala.toSeq
    assert(first.flatten.sorted == (0L until 400L),
      s"sub-commit pacing lost or duplicated rows")
    assert(first.length == nFiles,
      s"a 1-file budget must pace the $nFiles-file commit into $nFiles " +
        s"batches, got ${first.length}")

    // restart from the checkpoint: the mid-commit watermark must not
    // re-emit anything; a fresh commit still flows
    spark.sql("INSERT INTO graft.cdcsp.t VALUES (1000)")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val all = batches.asScala.toSeq.flatten
    assert(all.sorted == ((0L until 400L) :+ 1000L),
      s"restart across the sub-commit watermark broke exactly-once: " +
        s"${all.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }}")
  }

  test("t$changes batch windows resolve from wall-clock timestamps too") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cdct")
    spark.sql("CREATE TABLE graft.cdct.t (k INT, v STRING)")
    spark.sql("INSERT INTO graft.cdct.t VALUES (1,'a')")
    Thread.sleep(30)
    val mid = System.currentTimeMillis()
    Thread.sleep(30)
    spark.sql("INSERT INTO graft.cdct.t VALUES (2,'b')")
    Thread.sleep(30)
    val late = System.currentTimeMillis()
    Thread.sleep(30)
    spark.sql("INSERT INTO graft.cdct.t VALUES (3,'c')")

    def ks(df: org.apache.spark.sql.DataFrame): Seq[Int] =
      df.select(col("k")).collect().map(_.getInt(0)).sorted.toSeq
    // (mid, now]: commits 2 and 3
    assert(ks(spark.read.option("starting-timestamp", mid.toString)
      .table("graft.cdct.`t$changes`")) == Seq(2, 3))
    // (mid, late]: commit 2 only; ISO instant form resolves identically
    val lateIso = java.time.Instant.ofEpochMilli(late).toString
    assert(ks(spark.read.option("starting-timestamp", mid.toString)
      .option("ending-timestamp", lateIso)
      .table("graft.cdct.`t$changes`")) == Seq(2))
    // timestamp and version coordinates for one bound are exclusive
    import scala.jdk.CollectionConverters._
    assertThrows[IllegalArgumentException] {
      graft.catalog.ChangesTable.resolveEndVersion(cat.metadataStore,
        Seq("cdct"), "t",
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          Map("ending-timestamp" -> lateIso, "to-version" -> "2").asJava),
        "graft.cdct.t")
    }
  }

  test("Changes.sync mirrors a source into a keyed table, exactly once") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.sync")
    spark.sql("""CREATE TABLE graft.sync.src (k INT NOT NULL, v STRING)
      TBLPROPERTIES ('identifier-fields' = 'k',
        'write.delete.mode' = 'merge-on-read',
        'write.update.mode' = 'merge-on-read')""")
    spark.sql("""CREATE TABLE graft.sync.dst (k INT NOT NULL, v STRING)
      TBLPROPERTIES ('identifier-fields' = 'k')""")
    def srcRows = spark.table("graft.sync.src").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    def dstRows = spark.table("graft.sync.dst").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap

    spark.sql("INSERT INTO graft.sync.src VALUES (1,'a'),(2,'b'),(3,'c')")
    assert(Changes.sync(spark, "graft.sync.src", "graft.sync.dst") > 0)
    assert(dstRows == srcRows)

    // deletes, updates, and new keys all carry over in one sync step
    spark.sql("DELETE FROM graft.sync.src WHERE k = 2")
    spark.sql("UPDATE graft.sync.src SET v = 'A' WHERE k = 1")
    spark.sql("INSERT INTO graft.sync.src VALUES (4,'d')")
    assert(Changes.sync(spark, "graft.sync.src", "graft.sync.dst") > 0)
    assert(dstRows == srcRows)
    assert(dstRows == Map(1 -> "A", 3 -> "c", 4 -> "d"))

    // already current: a repeat applies nothing and changes nothing
    assert(Changes.sync(spark, "graft.sync.src", "graft.sync.dst") == 0)
    assert(dstRows == srcRows)

    // multi-version windows NET per key: an insert later deleted inside
    // ONE window must not survive in the mirror, and a key updated
    // twice must land on the LATEST version, not an arbitrary one
    spark.sql("INSERT INTO graft.sync.src VALUES (7,'ghost')")
    spark.sql("DELETE FROM graft.sync.src WHERE k = 7")
    spark.sql("UPDATE graft.sync.src SET v = 'A2' WHERE k = 1")
    spark.sql("UPDATE graft.sync.src SET v = 'A3' WHERE k = 1")
    assert(Changes.sync(spark, "graft.sync.src", "graft.sync.dst") > 0)
    assert(dstRows == srcRows, s"netting failed: dst=$dstRows src=$srcRows")
    assert(!dstRows.contains(7) && dstRows(1) == "A3")
  }

  test("copy-on-write DML reports at file granularity (delete+insert of rewritten rows)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cdc")
    spark.sql("""CREATE TABLE graft.cdc.cow (k INT, v STRING)""")
    spark.sql("INSERT INTO graft.cdc.cow VALUES (1,'a'),(2,'b')")
    val v1 = version("cow")
    spark.sql("UPDATE graft.cdc.cow SET v = 'B' WHERE k = 2")
    val got = changes("cow", v1)
    // the true change is always present…
    assert(got.contains((2, "b", "delete")) && got.contains((2, "B", "insert")),
      s"missing the updated row's delete/insert pair: $got")
    // …and any extra rows are file-granularity churn: unchanged rows of
    // a rewritten file round-tripping as identical delete+insert pairs
    // (here group filtering narrowed the rewrite to k=2's file, so
    // usually there are none)
    val extra = got -- Set((2, "b", "delete"), (2, "B", "insert"))
    val (dels, inss) = extra.partition(_._3 == "delete")
    assert(dels.map(e => (e._1, e._2)) == inss.map(e => (e._1, e._2)),
      s"unpaired churn in the CoW feed: $extra")
  }

  test("bloom filters prune masked re-reads past the min/max stats") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.bloom")
    spark.sql("""CREATE TABLE graft.bloom.t (k INT NOT NULL, v STRING)
      TBLPROPERTIES ('identifier-fields' = 'k',
        'write.update.mode' = 'merge-on-read',
        'write.parquet.bloom-filter-columns' = 'k')""")
    // evens then odds: the numeric SPANS interleave (min/max alone
    // cannot separate them) but the key SETS are disjoint — only the
    // bloom filter can prove the odd files never held an even key
    spark.sql("INSERT INTO graft.bloom.t " +
      "SELECT CAST(id * 2 AS INT), concat('e', id) FROM range(0, 100)")
    val store = cat.metadataStore
    val evenFiles = store.load(Seq("bloom"), "t")._1
      .currentSnapshot.get.files.toSet
    spark.sql("INSERT INTO graft.bloom.t " +
      "SELECT CAST(id * 2 + 1 AS INT), concat('o', id) FROM range(0, 100)")
    spark.sql("UPDATE graft.bloom.t SET v = 'X' WHERE k = 50")

    val v = version2("bloom", "t")
    val meta = store.loadVersion(Seq("bloom"), "t", v)
    val schema = graft.meta.SchemaBridge.toSpark(meta.currentSchema)
    val parts = graft.catalog.ChangesTable.stepPartitions(
      spark, store, Seq("bloom"), "t", schema,
      org.apache.spark.sql.util.CaseInsensitiveStringMap.empty(),
      scala.collection.mutable.Map.empty, v)
    val dataDir = store.dataDir(Seq("bloom"), "t")
    def relOf(p: String): String =
      p.substring(p.indexOf(dataDir) + dataDir.length + 1)
    val maskedRels = parts.collect {
      case graft.catalog.ChangeInputPartition(d, spec) if spec.matchAny.nonEmpty =>
        d.asInstanceOf[org.apache.spark.sql.execution.datasources.FilePartition]
          .files.map(f => relOf(f.filePath.toString)).toSeq
    }.flatten.toSet
    assert(maskedRels.nonEmpty, "the masked re-read must still plan")
    assert(maskedRels.subsetOf(evenFiles),
      s"an odd-key file survived the bloom consult: ${maskedRels -- evenFiles}")
    // the feed's answer is unchanged by the pruning
    val got = Changes.between(spark, "graft.bloom.t", v - 1, Some(v))
      .select(col("k"), col("v"), col("_change_type")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((50, "e25", "update_preimage"), (50, "X", "update_postimage")),
      got.toString)
  }

  test("masked re-reads plan partitions only over key-range candidate files") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.prune")
    spark.sql("""CREATE TABLE graft.prune.t (k INT NOT NULL, v STRING)
      TBLPROPERTIES ('identifier-fields' = 'k',
        'write.update.mode' = 'merge-on-read')""")
    // two commits with DISJOINT key ranges, then an upsert touching only
    // the second range — the changelog's masked re-read must not plan
    // partitions over the first range's files
    spark.sql("INSERT INTO graft.prune.t " +
      "SELECT CAST(id AS INT), concat('a', id) FROM range(0, 100)")
    spark.sql("INSERT INTO graft.prune.t " +
      "SELECT CAST(id AS INT), concat('b', id) FROM range(1000, 1100)")
    spark.sql("UPDATE graft.prune.t SET v = 'X' WHERE k = 1050")

    val store = cat.metadataStore
    val v = version2("prune", "t")
    val meta = store.loadVersion(Seq("prune"), "t", v)
    val schema = graft.meta.SchemaBridge.toSpark(meta.currentSchema)
    val parts = graft.catalog.ChangesTable.stepPartitions(
      spark, store, Seq("prune"), "t", schema,
      org.apache.spark.sql.util.CaseInsensitiveStringMap.empty(),
      scala.collection.mutable.Map.empty, v)
    val dataDir = store.dataDir(Seq("prune"), "t")
    def relOf(p: String): String =
      p.substring(p.indexOf(dataDir) + dataDir.length + 1)
    val maskedRels = parts.collect {
      case graft.catalog.ChangeInputPartition(d, spec) if spec.matchAny.nonEmpty =>
        d.asInstanceOf[org.apache.spark.sql.execution.datasources.FilePartition]
          .files.map(f => relOf(f.filePath.toString)).toSeq
    }.flatten.toSet

    // expected candidates: exactly the prior files whose harvested k
    // range can contain the one upserted key
    val prevFiles = store.loadVersion(Seq("prune"), "t", v - 1)
      .currentSnapshot.get.files
    val stats = meta.currentSnapshot.get.fileStats
    val expected = prevFiles.filter(rel => stats.get(rel).exists(_.exists(cs =>
      cs.name == "k" && cs.min.toLong <= 1050 && cs.max.toLong >= 1050))).toSet
    assert(expected.nonEmpty && expected.size < prevFiles.size,
      s"test setup must make pruning non-trivial: $expected of $prevFiles")
    assert(maskedRels == expected,
      s"masked partitions over $maskedRels, candidates were $expected")

    // and the feed's answer is unchanged by the pruning
    val got = Changes.between(spark, "graft.prune.t", v - 1, Some(v))
      .select(col("k"), col("v"), col("_change_type"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1050, "b1050", "update_preimage"),
      (1050, "X", "update_postimage")), got.toString)
  }

  test("pair-updates closes the modulo: t$changes equals Changes.between EXACTLY") {
    // across every table this suite mutated — MoR delete/update history,
    // streaming-upsert edges (re-insert after delete, first-time upsert
    // key), and the pruning history — the paired scan surface and the
    // batch API must emit identical rows, update labels included
    for ((ns, t) <- Seq(("cdc", "t"), ("cdcs", "t"), ("prune", "t"))) {
      val viaApi = Changes.between(spark, s"graft.$ns.$t", 0)
        .select(col("k"), col("v"), col("_change_type"), col("_commit_version"))
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getInt(3)))
        .toSet
      val viaTable = spark.read.option("pair-updates", "true")
        .table(s"graft.$ns.`$t$$changes`")
        .select(col("k"), col("v"), col("_change_type"), col("_commit_version"))
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getInt(3)))
        .toSet
      assert(viaTable == viaApi,
        s"$ns.$t: missing ${viaApi -- viaTable}, invented ${viaTable -- viaApi}")
    }
  }

  test("a keyless position-delta UPDATE emits delete + insert in one step") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.posu")
    spark.sql("DROP TABLE IF EXISTS graft.posu.t")
    spark.sql("""CREATE TABLE graft.posu.t (k INT, v STRING)
      TBLPROPERTIES (
        'write.delete.mode' = 'merge-on-read',
        'write.update.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO graft.posu.t VALUES (1,'a'),(2,'b')")
    val vIns = version2("posu", "t")
    // the UPDATE commits position marks AND the new row version in ONE
    // RowDelta — the step must emit the old row as delete, new as insert
    spark.sql("UPDATE graft.posu.t SET v = 'B' WHERE k = 2")
    val vU = version2("posu", "t")
    assert(vU == vIns + 1)
    def feed(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("v"), col("_change_type"), col("_commit_version"))
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getInt(3)))
        .toSet
    val step = feed(Changes.between(spark, "graft.posu.t", vIns, Some(vU)))
    assert(step == Set((2, "b", "delete", vU), (2, "B", "insert", vU)),
      step.toString)
    // both surfaces agree over the full history
    val api = feed(Changes.between(spark, "graft.posu.t", 0))
    val tab = feed(spark.read.table("graft.posu.`t$changes`"))
    assert(api == tab, s"missing ${api -- tab}, invented ${tab -- api}")
    assert(spark.table("graft.posu.t").collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq ==
      Seq((1, "a"), (2, "B")))
  }

  test("position-delete commits flow through BOTH changelog surfaces") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.posc")
    spark.sql("DROP TABLE IF EXISTS graft.posc.t")
    // keyless merge-on-read: DELETEs land as (file, position) marks
    spark.sql("""CREATE TABLE graft.posc.t (k INT, v STRING)
      TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO graft.posc.t VALUES (1,'a'),(2,'b'),(3,'c')")
    val v1 = version2("posc", "t")
    spark.sql("DELETE FROM graft.posc.t WHERE k = 2")
    val v2 = version2("posc", "t")
    spark.sql("DELETE FROM graft.posc.t WHERE k >= 2") // k=3; k=2 already dead
    spark.sql("INSERT INTO graft.posc.t VALUES (4,'d')")
    // an overwrite removes files carrying dead positions: their live
    // rows emit as deletes, the dead ones must NOT re-emit
    spark.sql("INSERT OVERWRITE graft.posc.t VALUES (9,'z')")

    def feed(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("v"), col("_change_type"), col("_commit_version"))
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getInt(3)))
        .toSet
    val viaApi = feed(Changes.between(spark, "graft.posc.t", 0))
    val viaTable = feed(spark.read.table("graft.posc.`t$changes`"))
    assert(viaApi == viaTable,
      s"missing ${viaApi -- viaTable}, invented ${viaTable -- viaApi}")
    // dead rows never re-emit: exactly one delete row per killed row
    val deletes = viaApi.filter(_._3 == "delete").map(t => (t._1, t._2))
    assert(deletes == Set((2, "b"), (3, "c"), (1, "a"), (4, "d")),
      s"got deletes $deletes")
    assert(viaApi.count(t => t._1 == 2 && t._3 == "delete") == 1,
      "a position-dead row re-emitted on a later step")
    // windowed: the second DELETE's step emits only k=3
    val step = feed(Changes.between(spark, "graft.posc.t", v2, Some(v2 + 1)))
    assert(step == Set((3, "c", "delete", v2 + 1)), step.toString)
    // the first DELETE's step via the scan surface too
    val step1 = feed(spark.read.option("from-version", v1)
      .option("to-version", v1 + 1).table("graft.posc.`t$changes`"))
    assert(step1 == Set((2, "b", "delete", v1 + 1)), step1.toString)
  }

  test("pair-updates works on the STREAMING changelog too (shared planner)") {
    import scala.jdk.CollectionConverters._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cdcp")
    spark.sql("DROP TABLE IF EXISTS graft.cdcp.t")
    spark.sql("""CREATE TABLE graft.cdcp.t (k INT NOT NULL, v STRING)
      TBLPROPERTIES ('identifier-fields' = 'k',
        'write.update.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO graft.cdcp.t VALUES (1,'a'),(2,'b')")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdcp-ckpt").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, String)]()
    val q = spark.readStream.option("pair-updates", "true")
      .table("graft.cdcp.`t$changes`")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       _: Long) =>
        df.select(col("k"), col("v"), col("_change_type")).collect()
          .foreach(r => seen.add((r.getInt(0), r.getString(1), r.getString(2)))); ()
      }.start()
    try {
      q.processAllAvailable()
      spark.sql("UPDATE graft.cdcp.t SET v = 'A' WHERE k = 1")
      q.processAllAvailable()
      val got = seen.asScala.toSet
      assert(got == Set((1, "a", "insert"), (2, "b", "insert"),
        (1, "a", "update_preimage"), (1, "A", "update_postimage")),
        s"streamed paired changelog diverged: $got")
    } finally q.stop()
  }

  test("over-budget delete commits flow through the changelog as a distributed join") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.bigcdc")
    spark.sql("DROP TABLE IF EXISTS graft.bigcdc.t")
    // a 1-byte budget marks EVERY delete commit over the changelog
    // budget — the ChangelogDeleteJoin rule must take over instead of
    // the scan surface's driver key collect (which would refuse)
    spark.sql("""CREATE TABLE graft.bigcdc.t (k INT NOT NULL, v STRING)
      TBLPROPERTIES ('identifier-fields' = 'k',
        'write.delete.mode' = 'merge-on-read',
        'write.update.mode' = 'merge-on-read',
        'read.delete.byte-budget' = '1')""")
    spark.sql("INSERT INTO graft.bigcdc.t VALUES (1,'a'),(2,'b'),(3,'c'),(4,'d')")
    spark.sql("DELETE FROM graft.bigcdc.t WHERE k IN (2, 4)")
    // same-commit mask + re-insert: exercises the pairing labels
    spark.sql("UPDATE graft.bigcdc.t SET v = 'C' WHERE k = 3")

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("v"), col("_change_type"), col("_commit_version"))
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getInt(3)))
        .toSet
    val api = rows(Changes.between(spark, "graft.bigcdc.t", 0))
    assert(api.exists(_._3 == "update_preimage"), api.toString)

    // raw scan surface = batch feed with pairing labels mapped back
    val raw = spark.read.table("graft.bigcdc.`t$changes`")
    val got = rows(raw)
    val want = api.map {
      case (k, v, "update_preimage", ver) => (k, v, "delete", ver)
      case (k, v, "update_postimage", ver) => (k, v, "insert", ver)
      case other => other
    }
    assert(got == want, s"missing ${want -- got}, invented ${got -- want}")
    // paired scan surface = batch feed exactly
    val paired = rows(spark.read.option("pair-updates", "true")
      .table("graft.bigcdc.`t$changes`"))
    assert(paired == api, s"missing ${api -- paired}, invented ${paired -- api}")
    // the relation was rewritten: joins in the plan, no changes scan
    val plan = raw.queryExecution.optimizedPlan
    assert(plan.collect { case j: LJoin => j }.nonEmpty,
      s"expected the distributed-join rewrite:\n$plan")
    val scans = plan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
        if r.table.isInstanceOf[graft.catalog.GraftChangesTable] => r
    }
    assert(scans.isEmpty, "over-budget window must not keep the key-collect scan")
  }

  test("over-budget delete commits stream through the changelog via spilled batch frames") {
    import scala.jdk.CollectionConverters._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.bigcdcs")
    spark.sql("DROP TABLE IF EXISTS graft.bigcdcs.t")
    // 1-byte budget: every delete commit is over budget. The STREAM has
    // no logical-plan rewrite point, so it must fall back to the
    // spilled batch frame instead of refusing (r8 verdict ask #2) — and
    // never materialize the delete keys on the driver.
    spark.sql("""CREATE TABLE graft.bigcdcs.t (k INT NOT NULL, v STRING)
      TBLPROPERTIES ('identifier-fields' = 'k',
        'write.delete.mode' = 'merge-on-read',
        'write.update.mode' = 'merge-on-read',
        'read.delete.byte-budget' = '1')""")
    spark.sql("INSERT INTO graft.bigcdcs.t VALUES (1,'a'),(2,'b'),(3,'c'),(4,'d')")
    spark.sql("DELETE FROM graft.bigcdcs.t WHERE k IN (2, 4)")
    spark.sql("UPDATE graft.bigcdcs.t SET v = 'C' WHERE k = 3")

    def apiRows: Set[(Int, String, String, Int)] =
      Changes.between(spark, "graft.bigcdcs.t", 0)
        .select(col("k"), col("v"), col("_change_type"), col("_commit_version"))
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getInt(3)))
        .toSet
    def rawScheme(rs: Set[(Int, String, String, Int)]) = rs.map {
      case (k, v, "update_preimage", ver) => (k, v, "delete", ver)
      case (k, v, "update_postimage", ver) => (k, v, "insert", ver)
      case other => other
    }

    val ckpt = java.nio.file.Files.createTempDirectory("graft-bigcdc-ckpt").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, String, Int)]()
    val q = spark.readStream.table("graft.bigcdcs.`t$changes`")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       _: Long) =>
        df.select(col("k"), col("v"), col("_change_type"), col("_commit_version"))
          .collect()
          .foreach(r => seen.add(
            (r.getInt(0), r.getString(1), r.getString(2), r.getInt(3)))); ()
      }.start()
    try {
      q.processAllAvailable()
      val got = seen.asScala.toSet
      val want = rawScheme(apiRows)
      assert(got == want, s"missing ${want -- got}, invented ${got -- want}")
      // the spill artifact proves the fallback path ran (no refusal, no
      // key collect) and is _SUCCESS-stamped for replay determinism
      def spills(d: java.io.File): Seq[java.io.File] =
        if (d.getName == "graft-changelog-spill") Seq(d)
        else Option(d.listFiles()).toSeq.flatten.filter(_.isDirectory).flatMap(spills)
      val roots = spills(new java.io.File(ckpt))
      assert(roots.nonEmpty, s"no spill artifact under $ckpt")
      assert(roots.flatMap(r => Option(r.listFiles()).toSeq.flatten)
        .forall(v => new java.io.File(v, "_SUCCESS").exists()),
        "spilled step missing its _SUCCESS stamp")

      // a mid-stream over-budget delete arrives as delete rows too
      spark.sql("DELETE FROM graft.bigcdcs.t WHERE k = 1")
      q.processAllAvailable()
      val got2 = seen.asScala.toSet
      val want2 = rawScheme(apiRows)
      assert(got2 == want2, s"missing ${want2 -- got2}, invented ${got2 -- want2}")
    } finally q.stop()
  }

  test("changelog windows span an identifier-fields flavor change") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.flipcdc")
    spark.sql("DROP TABLE IF EXISTS graft.flipcdc.t")
    spark.sql("""CREATE TABLE graft.flipcdc.t (k INT NOT NULL, v STRING)
      TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO graft.flipcdc.t VALUES (1,'a'),(2,'b'),(3,'c')")
    val vIns = version2("flipcdc", "t")
    spark.sql("DELETE FROM graft.flipcdc.t WHERE k = 2") // position marks
    val vPos = version2("flipcdc", "t")
    // the catalog refuses the flip while position marks are live (the
    // evolution guard that keeps every step single-flavor)…
    val e = intercept[Exception] {
      spark.sql(
        "ALTER TABLE graft.flipcdc.t SET TBLPROPERTIES('identifier-fields'='k')")
    }
    assert(e.getMessage.contains("compact first"), e.getMessage)
    // …so the legal path is compact → flip → keyed DML
    spark.sql("CALL graft.system.compact('flipcdc.t')")
    spark.sql(
      "ALTER TABLE graft.flipcdc.t SET TBLPROPERTIES('identifier-fields'='k')")
    spark.sql("DELETE FROM graft.flipcdc.t WHERE k = 3") // equality delete
    val vEq = version2("flipcdc", "t")

    def feed(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("v"), col("_change_type"), col("_commit_version"))
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getInt(3)))
        .toSet
    val want = Set(
      (1, "a", "insert", vIns), (2, "b", "insert", vIns), (3, "c", "insert", vIns),
      (2, "b", "delete", vPos), // position step
      (3, "c", "delete", vEq))  // equality step, past the flavor change
    val api = feed(Changes.between(spark, "graft.flipcdc.t", 0))
    val tab = feed(spark.read.table("graft.flipcdc.`t$changes`"))
    assert(api == want, s"missing ${want -- api}, invented ${api -- want}")
    assert(tab == want, s"missing ${want -- tab}, invented ${tab -- want}")
    assert(spark.table("graft.flipcdc.t").collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("position-CDC planning stats no data files (memoized lengths)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.poscnt")
    spark.sql("DROP TABLE IF EXISTS graft.poscnt.t")
    spark.sql("""CREATE TABLE graft.poscnt.t (k INT, v STRING)
      TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO graft.poscnt.t VALUES (1,'a'),(2,'b'),(3,'c')")
    spark.sql("INSERT INTO graft.poscnt.t VALUES (4,'d'),(5,'e')")
    // masks kept files in BOTH commits → whole-file partitions for each
    spark.sql("DELETE FROM graft.poscnt.t WHERE k IN (2, 4)")
    val dataFiles = spark.sql(
      "SELECT file FROM graft.poscnt.`t$files` WHERE content = 'data'")
      .collect().map(_.getString(0))
    assert(dataFiles.nonEmpty)
    // warm: a full changelog read resolves every data-file length into
    // the manifest layer's memoized cache
    assert(spark.read.table("graft.poscnt.`t$changes`").count() > 0)
    CountingLocalFs.installed(spark) {
      CountingLocalFs.reset()
      val df = spark.read.table("graft.poscnt.`t$changes`")
      val batches = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.toBatch
      }
      assert(batches.nonEmpty)
      batches.foreach(_.planInputPartitions())
      // planning may read DELETE files (budget-bounded posMapOf) but
      // must never stat a DATA file — lengths come from the cache
      val touched = CountingLocalFs.statPaths ++ CountingLocalFs.listPaths
      val bad = touched.filter(p => dataFiles.exists(p.endsWith))
      assert(bad.isEmpty,
        s"position-CDC planning touched data files (r7 finding): $bad")
    }
  }
}
