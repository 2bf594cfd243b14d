package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.commit._
import graft.meta._

/** ScalaCheck properties over the Requirement/MetadataUpdate algebra
  * (SURVEY.md §5: "any permutation of non-conflicting updates converges;
  * conflicting requirement always rejects"). */
class CommitPropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property under ScalaTest (plain scalacheck — the
    * scalatestplus bridge isn't in the offline dependency set). */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  private def base: TableMetadata = TableMetadata.empty(
    uuid = "u-1", location = "/tmp/t",
    schema = SchemaDef(0, List(FieldDef(1, "id", "long", required = true))),
    spec = PartitionSpecDef(0, Nil), order = SortOrderDef(0, Nil),
    props = Map("p0" -> "v0"))

  private val keyGen = Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)

  test("disjoint SetProperties commute: any permutation converges") {
    val updatesGen = Gen.listOfN(6, keyGen).map(_.distinct)
      .map(_.zipWithIndex.map { case (k, i) =>
        MetadataUpdate.SetProperties(Map(s"k_$k" -> i.toString)) })
    check(Prop.forAll(updatesGen) { ups =>
      val applied = ups.permutations.take(12).map(
        _.foldLeft(base)((m, u) => u.apply(m)).properties).toSet
      applied.size == 1
    })
  }

  test("OverwritePartitions: exact partition of the file set, no losses") {
    // random corpus of files across partitions + a random replace set:
    // the result must keep exactly the non-targeted files, drop every
    // targeted one, contain all new files, and never invent a file
    val catGen = Gen.oneOf("a", "b", "c", "d")
    val filesGen = Gen.listOfN(12, catGen).map(_.zipWithIndex.map {
      case (c, i) => s"commit-x/__part_cat=$c/f$i.parquet"
    })
    val targetGen = Gen.someOf("a", "b", "c", "d").map(_.toList)
    check(Prop.forAll(filesGen, targetGen) { (files, targets) =>
      val withData = MetadataUpdate.AppendFiles(files, 1L).apply(base)
      val pvs = targets.map(c => Map("cat" -> c))
      val newFiles = List("commit-y/__part_cat=z/n0.parquet")
      val out = MetadataUpdate.OverwritePartitions(newFiles, pvs, 2L)
        .apply(withData).currentSnapshot.get.files
      val expectKept = files.filterNot(f =>
        targets.exists(c => f.contains(s"__part_cat=$c")))
      out.toSet == (expectKept ++ newFiles).toSet &&
        out.size == expectKept.size + newFiles.size
    })
  }

  test("RewriteFiles: exact subset swap, stats follow, stale removals refuse") {
    val filesGen = Gen.chooseNum(1, 12).map(n =>
      (0 until n).map(i => s"commit-x/f$i.parquet").toList)
    check(Prop.forAll(filesGen, Gen.chooseNum(0L, Long.MaxValue)) { (files, seed) =>
      val stats = files.map(f =>
        f -> List(ColStatDef("id", "0", "9", 0, Some(1)))).toMap
      val withData = MetadataUpdate.AppendFiles(files, 1L, stats).apply(base)
      val rnd = new scala.util.Random(seed)
      val removed = files.filter(_ => rnd.nextBoolean())
      val added = List("commit-y/r0.parquet")
      val addedStats = Map(added.head -> List(ColStatDef("id", "1", "2", 0, Some(1))))
      val out = MetadataUpdate.RewriteFiles(removed, added, 2L, addedStats)
        .apply(withData).currentSnapshot.get
      val expectKept = files.filterNot(removed.toSet)
      // exact swap: kept ∪ added, nothing lost, nothing invented
      out.files.toSet == (expectKept ++ added).toSet &&
        out.files.size == expectKept.size + added.size &&
        // stats follow the files: removed files' stats gone, kept+added present
        out.fileStats.keySet == (expectKept ++ added).toSet &&
        out.summary.get("rewritten-files").contains(removed.size.toString)
    })
    // removing a file the current snapshot doesn't hold is refused —
    // the belt-and-braces invariant under the snapshot-id guard
    val withData = MetadataUpdate.AppendFiles(List("commit-x/f0.parquet"), 1L)
      .apply(base)
    intercept[IllegalArgumentException] {
      MetadataUpdate.RewriteFiles(List("commit-x/ghost.parquet"), Nil, 2L)
        .apply(withData)
    }
  }

  test("OverwritePartitions commutes with appends to untouched partitions") {
    val filesGen = Gen.listOfN(6, Gen.oneOf("a", "b")).map(_.zipWithIndex.map {
      case (c, i) => s"c0/__part_cat=$c/f$i.parquet"
    })
    check(Prop.forAll(filesGen, Gen.chooseNum(0, 5)) { (files, n) =>
      val withData = MetadataUpdate.AppendFiles(files, 1L).apply(base)
      val overwrite = MetadataUpdate.OverwritePartitions(
        List("c1/__part_cat=a/new.parquet"), List(Map("cat" -> "a")), 2L)
      val append = MetadataUpdate.AppendFiles(
        List(s"c2/__part_cat=c/x$n.parquet"), 3L)
      // the racing append targets partition c, untouched by the
      // overwrite of a — either commit order yields the same file set
      val ab = append.apply(overwrite.apply(withData)).currentSnapshot.get.files.toSet
      val ba = overwrite.apply(append.apply(withData)).currentSnapshot.get.files.toSet
      ab == ba
    })
  }

  test("OverwritePartitions refuses a base holding layout-less files") {
    val withMixed = MetadataUpdate.AppendFiles(
      List("c0/__part_cat=a/f0.parquet", "c0/plain.parquet"), 1L).apply(base)
    intercept[UnsupportedOperationException] {
      MetadataUpdate.OverwritePartitions(
        List("c1/__part_cat=a/n.parquet"), List(Map("cat" -> "a")), 2L)
        .apply(withMixed)
    }
  }

  test("set-then-remove of the same key is identity on that key") {
    check(Prop.forAll(keyGen, Gen.alphaStr) { (k, v) =>
      val key = s"x_$k"
      val m = MetadataUpdate.RemoveProperties(Seq(key)).apply(
        MetadataUpdate.SetProperties(Map(key -> v)).apply(base))
      !m.properties.contains(key)
    })
  }

  test("AssertCurrentSchemaId rejects iff id differs") {
    check(Prop.forAll(Gen.chooseNum(-5, 5)) { id =>
      val r = Requirement.AssertCurrentSchemaId(id).check(base)
      if (id == base.currentSchemaId) r.isEmpty else r.isDefined
    })
  }

  test("AddSchema then SetCurrentSchema(-1) activates the newest schema") {
    check(Prop.forAll(Gen.chooseNum(1, 30)) { n =>
      val m = (1 to n).foldLeft(base) { (acc, i) =>
        MetadataUpdate.SetCurrentSchema(-1).apply(
          MetadataUpdate.AddSchema(SchemaDef(i,
            List(FieldDef(1, "id", "long", required = true),
                 FieldDef(i + 1, s"c$i", "string", required = false)))).apply(acc))
      }
      m.currentSchemaId == n && m.schemas.size == n + 1 &&
        m.lastColumnId == n + 1
    })
  }

  test("AddSnapshot advances the current snapshot and sequence number") {
    check(Prop.forAll(Gen.chooseNum(1, 20)) { n =>
      val m = (1 to n).foldLeft(base) { (acc, i) =>
        MetadataUpdate.AddSnapshot(SnapshotDef(i.toLong, i.toLong * 1000,
          "append", List(s"f$i.parquet"), Map.empty)).apply(acc)
      }
      m.currentSnapshotId.contains(n.toLong) &&
        m.lastSequenceNumber == n.toLong && m.snapshots.size == n
    })
  }

  test("duplicate schema id is rejected") {
    val dup = MetadataUpdate.AddSchema(SchemaDef(0, Nil))
    intercept[IllegalArgumentException] { dup.apply(base) }
  }

  test("store edge cases: missing versions, cross-namespace rename, double drop") {
    val wh = java.nio.file.Files.createTempDirectory("graft-edge").toString
    val store = new MetadataStore(wh)
    store.createNamespace(Seq("a"), Map.empty)
    store.createNamespace(Seq("b"), Map.empty)
    store.createTable(Seq("a"), "t", base)
    intercept[Exception] { store.loadVersion(Seq("a"), "t", 99) }
    intercept[Exception] { store.load(Seq("a"), "missing") }
    store.renameTable(Seq("a"), "t", Seq("b"), "t2") // cross-namespace
    assert(store.tableExists(Seq("b"), "t2") && !store.tableExists(Seq("a"), "t"))
    assert(store.dropTable(Seq("b"), "t2"))
    assert(!store.dropTable(Seq("b"), "t2")) // idempotent false
    assert(store.dropNamespace(Seq("a")) && store.dropNamespace(Seq("b")))
  }

  test("file stats survive the append/replace delta updates") {
    val stats = Map("f1.parquet" -> List(ColStatDef("id", "1", "10", 0)))
    val m1 = MetadataUpdate.AppendFiles(List("f1.parquet"), 1000L, stats).apply(base)
    assert(m1.currentSnapshot.get.fileStats == stats)
    val stats2 = Map("f2.parquet" -> List(ColStatDef("id", "11", "20", 0)))
    val m2 = MetadataUpdate.AppendFiles(List("f2.parquet"), 2000L, stats2).apply(m1)
    assert(m2.currentSnapshot.get.fileStats == stats ++ stats2)
    assert(m2.currentSnapshot.get.files == List("f1.parquet", "f2.parquet"))
    val m3 = MetadataUpdate.ReplaceFiles(List("f3.parquet"), 3000L, Map.empty).apply(m2)
    assert(m3.currentSnapshot.get.files == List("f3.parquet"))
    assert(m3.currentSnapshot.get.fileStats.isEmpty)
    // JSON round-trip with stats present
    assert(TableMetadata.fromJson(TableMetadata.toJson(m2)) == m2)
  }

  test("append deltas commute up to file-set equality") {
    check(Prop.forAll(Gen.listOfN(5, keyGen).map(_.distinct)) { names =>
      val appends = names.zipWithIndex.map { case (n, i) =>
        MetadataUpdate.AppendFiles(List(s"$n-$i.parquet"), i.toLong)
      }
      val results = appends.permutations.take(12).map { perm =>
        val m = perm.foldLeft(base)((acc, u) => u.apply(acc))
        (m.currentSnapshot.get.files.toSet, m.lastSequenceNumber)
      }.toSet
      results.size == 1 // same file set and sequence number in any order
    })
  }

  test("metadata JSON round-trips losslessly") {
    check(Prop.forAll(Gen.listOfN(4, keyGen)) { ks =>
      val m = base.copy(
        properties = ks.map(k => k -> k.reverse).toMap,
        snapshots = List(SnapshotDef(1, 42, "append", List("a.parquet"), Map("n" -> "1"))),
        currentSnapshotId = Some(1L))
      TableMetadata.fromJson(TableMetadata.toJson(m)) == m
    })
  }

  test("conditional-PUT backend: racing committers lose no updates") {
    // same stress as the fs-store concurrency test, through the
    // object-store-shaped backend — proves the CAS protocol is a property
    // of the commit algebra + putIfAbsent, not of the local filesystem
    val meta = new ConditionalPutMetadata(new InMemoryBlobStore)
    assert(meta.createTable(Seq("ns"), "t", base))
    assert(!meta.createTable(Seq("ns"), "t", base)) // second create loses
    val threads = 8; val perThread = 5
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val futures = (0 until threads).map { tid =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = (0 until perThread).foreach { i =>
          new Committer(meta).commit(Seq("ns"), "t", Nil,
            Seq(MetadataUpdate.SetProperties(Map(s"k-$tid-$i" -> "1"))))
        }
      })
    }
    futures.foreach(_.get())
    pool.shutdown()
    val (m, v) = meta.load(Seq("ns"), "t")
    assert((0 until threads).forall(t => (0 until perThread)
      .forall(i => m.properties.contains(s"k-$t-$i"))))
    assert(v == 1 + threads * perThread) // v1 create + 40 single-winner PUTs
    // history is complete and readable: every version is a valid document
    (1 to v).foreach(ver => meta.loadVersion(Seq("ns"), "t", ver))
  }

  test("conditional-PUT backend: append deltas survive interleaved overwrites") {
    val meta = new ConditionalPutMetadata(new InMemoryBlobStore)
    assert(meta.createTable(Seq("ns"), "t", base))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val futures = (0 until 4).map { tid =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = (0 until 5).foreach { i =>
          new Committer(meta).commit(Seq("ns"), "t", Nil,
            Seq(MetadataUpdate.AppendFiles(List(s"f-$tid-$i.parquet"), 1L)))
        }
      })
    }
    futures.foreach(_.get())
    pool.shutdown()
    val (m, _) = meta.load(Seq("ns"), "t")
    val files = m.currentSnapshot.get.files.toSet
    // the delta-append semantics hold on this backend too: all 20 racing
    // appends are present in the final snapshot
    assert((0 until 4).forall(t => (0 until 5)
      .forall(i => files.contains(s"f-$t-$i.parquet"))))
  }
}
