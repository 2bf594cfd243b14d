package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.GraftCatalog

/** Model-based randomized exercise of the keyless position-delta
  * machinery: a seeded random sequence of INSERT / DELETE / UPDATE /
  * MERGE / maintenance steps runs against a merge-on-read table AND a
  * driver-side reference model (a plain Buffer of rows mutated with the
  * same predicates); after every step the table must read back exactly
  * the model. Catches the failure classes unit fixtures can miss:
  * position marks applied to the wrong file generation, resurrection
  * through stale coordinates, delete-merge losing marks, double
  * application across chunk boundaries. */
class PosDeltaPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private val wh = Files.createTempDirectory("graft-posprop-wh").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.pp", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.pp.warehouse", wh)
    .withExtensions(new graft.functions.GraftExtensions)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  for ((seed, tbl) <- Seq((20260813L, "t"), (4207L, "t2")))
  test(s"random DML sequence matches the reference model (seed $seed)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pp.m")
    spark.sql(s"""CREATE TABLE pp.m.$tbl (id BIGINT, cat STRING, v DOUBLE)
      TBLPROPERTIES (
        'write.delete.mode' = 'merge-on-read',
        'write.update.mode' = 'merge-on-read',
        'write.merge.mode' = 'merge-on-read')""")
    val cat = spark.sessionState.catalogManager.catalog("pp")
      .asInstanceOf[GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("m"), tbl)

    val rnd = new scala.util.Random(seed)
    // model rows: (id, cat, v) — ids deliberately NON-unique (keyless
    // tables have no identity; duplicates must survive independently)
    val model = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Double)]
    var nextId = 0L

    def insertBatch(n: Int): Unit = {
      val rows = (0 until n).map { _ =>
        val id = if (model.nonEmpty && rnd.nextBoolean()) // dup pressure
          model(rnd.nextInt(model.size))._1
        else { nextId += 1; nextId }
        (id, s"c${rnd.nextInt(4)}", (rnd.nextInt(1000)) / 10.0)
      }
      model ++= rows
      spark.sql(s"INSERT INTO pp.m.$tbl VALUES " +
        rows.map { case (i, c, v) => s"($i,'$c',$v)" }.mkString(","))
    }

    def deleteWhere(): Unit = {
      val bound = rnd.nextInt(100) / 10.0 * 10
      if (rnd.nextBoolean()) {
        val c = s"c${rnd.nextInt(4)}"
        spark.sql(s"DELETE FROM pp.m.$tbl WHERE cat = '$c' AND v < $bound")
        model.filterInPlace { case (_, mc, mv) => !(mc == c && mv < bound) }
      } else {
        spark.sql(s"DELETE FROM pp.m.$tbl WHERE v >= $bound")
        model.filterInPlace { case (_, _, mv) => !(mv >= bound) }
      }
    }

    def updateWhere(): Unit = {
      val c = s"c${rnd.nextInt(4)}"
      spark.sql(s"UPDATE pp.m.$tbl SET v = v + 1000 WHERE cat = '$c'")
      for (i <- model.indices)
        if (model(i)._2 == c) model(i) = model(i).copy(_3 = model(i)._3 + 1000)
    }

    def mergeBatch(): Unit = {
      // source keyed by id: updates every matched row (all duplicates of
      // the id!), inserts the unmatched
      val ids = (0 until 3).map(_ => rnd.nextLong(nextId + 5) + 1).distinct
      val src = ids.map(i => (i, s"m${rnd.nextInt(3)}", rnd.nextInt(100) * 1.0))
      spark.sql(s"""MERGE INTO pp.m.$tbl t USING (
        SELECT * FROM VALUES ${src.map { case (i, c, v) => s"(${i}L,'$c',$v)" }
          .mkString(",")} AS s(id, cat, v)) s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      src.foreach { case (i, c, v) =>
        val matched = model.indices.filter(model(_)._1 == i)
        if (matched.isEmpty) model += ((i, c, v))
        else matched.foreach(j => model(j) = (i, c, v))
      }
      nextId = math.max(nextId, ids.max)
    }

    def maintenance(): Unit = rnd.nextInt(2) match {
      case 0 => cat.rewritePositionDeletes(ident)
      case _ => cat.compact(ident)
    }

    def check(step: String): Unit = {
      val got = spark.table(s"pp.m.$tbl").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .sorted.toSeq
      val want = model.sorted.toSeq
      assert(got == want,
        s"divergence after $step: got ${got.size} rows, want ${want.size}\n" +
          s"extra=${got.diff(want).take(5)} missing=${want.diff(got).take(5)}")
    }

    insertBatch(40)
    check("seed insert")
    for (step <- 1 to 25) {
      rnd.nextInt(10) match {
        case 0 | 1 | 2 => insertBatch(1 + rnd.nextInt(10))
        case 3 | 4 | 5 => deleteWhere()
        case 6 | 7 => updateWhere()
        case 8 => mergeBatch()
        case 9 => maintenance()
      }
      check(s"step $step")
    }
    // end state: fold everything in and confirm once more
    cat.compact(ident)
    check("final compaction")
    assert(cat.metadataStore.load(Seq("m"), tbl)._1
      .currentSnapshot.get.deleteFiles.isEmpty)
  }
}
