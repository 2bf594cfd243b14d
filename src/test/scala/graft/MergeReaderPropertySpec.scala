package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types.{DataType, LongType}
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{MergeKey, MergingRowReader}

/** Property coverage for the k-way merge behind multi-file sorted SPJ
  * groups ([[graft.catalog.MergingRowReader]]): for random run counts,
  * lengths (empty runs included), duplicates, and both directions, the
  * merged stream must be exactly the multiset union in the declared
  * order. The reader contract quirk under test: sources may REUSE
  * their row buffer between next() calls — the fake reader here
  * deliberately returns one shared buffer, the way the parquet row
  * readers do. */
class MergeReaderPropertySpec extends AnyFunSuite {

  private val types: Array[DataType] = Array(LongType, LongType)

  /** A reader that reuses ONE buffer across next() calls — the
    * adversarial (and real) source behavior the merge must copy
    * against. */
  private def runReader(values: Seq[(Long, Long)]): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val proj = UnsafeProjection.create(types)
      private val buf = new GenericInternalRow(2)
      private var i = -1
      override def next(): Boolean = { i += 1; i < values.length }
      override def get(): InternalRow = {
        buf.update(0, values(i)._1); buf.update(1, values(i)._2)
        proj(buf) // same UnsafeRow target every call
      }
      override def close(): Unit = ()
    }

  private def merge(runs: Seq[Seq[(Long, Long)]], asc: Boolean): Seq[(Long, Long)] = {
    val keys = Array(MergeKey(0, LongType, asc, nullsFirst = asc))
    val r = new MergingRowReader(runs.map(runReader), keys, types)
    val out = Seq.newBuilder[(Long, Long)]
    while (r.next()) { val row = r.get(); out += ((row.getLong(0), row.getLong(1))) }
    r.close()
    out.result()
  }

  test("random runs merge to the exact sorted multiset, both directions") {
    val rnd = new scala.util.Random(4242)
    for (trial <- 0 until 50) {
      val asc = trial % 2 == 0
      val nRuns = 1 + rnd.nextInt(6)
      val runs = (0 until nRuns).map { ri =>
        val n = rnd.nextInt(40) // empty runs allowed
        val keys = Seq.fill(n)(rnd.nextInt(30).toLong) // duplicates likely
          .sorted.reverse // desc base
        val ordered = if (asc) keys.sorted else keys
        ordered.zipWithIndex.map { case (k, i) => (k, ri * 1000L + i) }
      }
      val got = merge(runs, asc)
      val wantKeys = {
        val all = runs.flatten.map(_._1).sorted
        if (asc) all else all.reverse
      }
      assert(got.map(_._1) == wantKeys,
        s"trial $trial (asc=$asc): merged key order diverged")
      // completeness: every (key, payload) survives exactly once — a
      // buffer-reuse bug shows up here as repeated payloads
      assert(got.sorted == runs.flatten.sorted,
        s"trial $trial (asc=$asc): merged multiset diverged")
    }
  }

  test("single and empty runs degrade gracefully") {
    assert(merge(Seq(Seq.empty), asc = true).isEmpty)
    assert(merge(Seq.empty, asc = true).isEmpty)
    val one = Seq((1L, 10L), (2L, 20L), (7L, 70L))
    assert(merge(Seq(one), asc = true) == one)
    assert(merge(Seq(one, Seq.empty, Seq.empty), asc = true) == one)
  }
}
