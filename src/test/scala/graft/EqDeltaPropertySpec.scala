package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.GraftCatalog

/** Model-based randomized exercise of the KEYED (equality-delete)
  * merge-on-read machinery — the twin of PosDeltaPropertySpec: a seeded
  * random sequence of INSERT / DELETE / UPDATE / MERGE / upsert-batch /
  * compaction steps runs against a table with declared identifier
  * fields AND a driver-side Map keyed the same way; the table must read
  * back exactly the model after every step. Sequence-scoping bugs
  * (deletes swallowing later inserts of the same key, updates eaten by
  * their own delete files) show up here as divergence. */
class EqDeltaPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private val wh = Files.createTempDirectory("graft-eqprop-wh").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.ep", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.ep.warehouse", wh)
    .withExtensions(new graft.functions.GraftExtensions)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def run(ns: String, seed: Long, bloom: Boolean): Unit = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS ep.$ns")
    spark.sql(s"DROP TABLE IF EXISTS ep.$ns.t")
    val bloomProp =
      if (bloom) ",\n'write.parquet.bloom-filter-columns' = 'id'" else ""
    spark.sql(s"""CREATE TABLE ep.$ns.t (id BIGINT NOT NULL, cat STRING, v DOUBLE)
      TBLPROPERTIES (
        'identifier-fields' = 'id',
        'write.delete.mode' = 'merge-on-read',
        'write.update.mode' = 'merge-on-read',
        'write.merge.mode' = 'merge-on-read'$bloomProp)""")
    val cat = spark.sessionState.catalogManager.catalog("ep")
      .asInstanceOf[GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array(ns), "t")

    val rnd = new scala.util.Random(seed)
    // keyed table: the model is a Map — one live row version per id
    val model = scala.collection.mutable.Map.empty[Long, (String, Double)]
    var nextId = 0L

    def insertBatch(n: Int): Unit = {
      // fresh ids only (inserting a live id would violate key semantics
      // the engine does not police on plain INSERT)
      val rows = (0 until n).map { _ =>
        nextId += 1
        (nextId, s"c${rnd.nextInt(4)}", rnd.nextInt(1000) / 10.0)
      }
      rows.foreach { case (i, c, v) => model(i) = (c, v) }
      spark.sql(s"INSERT INTO ep.$ns.t VALUES " +
        rows.map { case (i, c, v) => s"($i,'$c',$v)" }.mkString(","))
    }

    def deleteWhere(): Unit = {
      val bound = rnd.nextInt(100) / 10.0 * 10
      spark.sql(s"DELETE FROM ep.$ns.t WHERE v >= $bound")
      model.filterInPlace { case (_, (_, mv)) => mv < bound }
    }

    def updateWhere(): Unit = {
      val c = s"c${rnd.nextInt(4)}"
      spark.sql(s"UPDATE ep.$ns.t SET v = v + 500 WHERE cat = '$c'")
      model.mapValuesInPlace { case (_, (mc, mv)) =>
        if (mc == c) (mc, mv + 500) else (mc, mv) }
    }

    def mergeBatch(): Unit = {
      val ids = (0 until 4).map(_ => rnd.nextLong(nextId + 3) + 1).distinct
      val src = ids.map(i => (i, s"m${rnd.nextInt(3)}", rnd.nextInt(100) * 1.0))
      spark.sql(s"""MERGE INTO ep.$ns.t t USING (
        SELECT * FROM VALUES ${src.map { case (i, c, v) => s"(${i}L,'$c',$v)" }
          .mkString(",")} AS s(id, cat, v)) s
        ON t.id = s.id
        WHEN MATCHED AND s.v < 10 THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      src.foreach { case (i, c, v) =>
        if (model.contains(i)) { if (v < 10) model.remove(i) else model(i) = (c, v) }
        else model(i) = (c, v)
      }
      nextId = math.max(nextId, ids.max)
    }

    def upsertBatch(): Unit = {
      val ids = (0 until 3).map(_ => rnd.nextLong(nextId + 2) + 1).distinct
      val rows = ids.map(i => (i, s"u${rnd.nextInt(3)}", rnd.nextInt(50) * 1.0))
      import spark.implicits._
      graft.catalog.CatalogUpserts.upsertBatch(cat.metadataStore, Seq(ns), "t",
        rows.toDF("id", "cat", "v"))
      rows.foreach { case (i, c, v) => model(i) = (c, v) }
      nextId = math.max(nextId, ids.max)
    }

    def check(step: String): Unit = {
      val got = spark.table(s"ep.$ns.t").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .sorted.toSeq
      val want = model.toSeq.map { case (i, (c, v)) => (i, c, v) }.sorted
      assert(got == want,
        s"divergence after $step: got ${got.size} rows, want ${want.size}\n" +
          s"extra=${got.diff(want).take(5)} missing=${want.diff(got).take(5)}")
    }

    insertBatch(30)
    check("seed insert")
    for (step <- 1 to 25) {
      rnd.nextInt(12) match {
        case 0 | 1 | 2 => insertBatch(1 + rnd.nextInt(8))
        case 3 | 4 => deleteWhere()
        case 5 | 6 => updateWhere()
        case 7 | 8 => mergeBatch()
        case 9 | 10 => upsertBatch()
        case 11 => cat.compact(ident)
      }
      check(s"step $step")
    }
    cat.compact(ident)
    check("final compaction")
  }

  test("random keyed DML sequence matches the reference model at every step") {
    run("m", 71320268L, bloom = false)
  }

  // same machinery with footer blooms declared on the key: every read
  // in the trajectory exercises dirty-file promotion — a wrong bloom
  // verdict (false "never held this key") diverges as resurrected rows
  test("random keyed DML with bloom promotion active matches the model") {
    run("mb", 90814427L, bloom = true)
  }
}
