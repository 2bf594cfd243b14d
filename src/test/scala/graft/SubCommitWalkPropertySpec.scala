package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.SubCommitWalk

/** Property coverage for the shared admission walk behind both paced
  * streams ([[graft.catalog.SubCommitWalk]]): for random commit
  * histories (pure appends of arbitrary file counts/sizes interleaved
  * with atomic steps) and random file/byte budgets, chaining walks
  * from offset (0,0) until caught up must
  *   - always make progress,
  *   - deliver every file of every append exactly once, in version
  *     and file order, and every atomic step exactly once,
  *   - never place a watermark inside an atomic step,
  *   - keep every multi-unit batch within the declared budgets (a
  *     single over-budget unit may ride alone — the progress rule).
  */
class SubCommitWalkPropertySpec extends AnyFunSuite {

  /** Plain-scalacheck harness (the scalatestplus bridge isn't in the
    * offline dependency set — the CommitPropertySpec pattern). */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(120), p)
    assert(res.passed, res.status.toString)
  }

  /** One version's commit: Right(files with sizes) = pure append,
    * Left((n, bytes)) = atomic step of that cost. */
  private type Commit = Either[(Int, Long), Seq[Long]]

  private val commitGen: Gen[Commit] = Gen.oneOf(
    for {
      n <- Gen.choose(0, 6)
      sizes <- Gen.listOfN(n, Gen.choose(1L, 100L))
    } yield Right(sizes),
    for {
      n <- Gen.choose(1, 5)
      b <- Gen.choose(1L, 300L)
    } yield Left((n, b)))

  private val historyGen: Gen[List[Commit]] =
    Gen.choose(1, 12).flatMap(Gen.listOfN(_, commitGen))

  private val budgetGen: Gen[(Option[Int], Option[Long])] = Gen.oneOf(
    Gen.choose(1, 5).map(f => (Some(f), None: Option[Long])),
    Gen.choose(1L, 250L).map(b => (None: Option[Int], Some(b))),
    for {
      f <- Gen.choose(1, 5); b <- Gen.choose(1L, 250L)
    } yield (Some(f), Some(b)))

  test("chained walks partition every history exactly, within budget") {
    check(Prop.forAll(historyGen, budgetGen) { (history, budgets) =>
      val (fileCap, byteCap) = budgets
      val cur = history.size
      def appendFiles(v: Int): Option[Seq[(String, Long)]] =
        history(v - 1).toOption.map(_.zipWithIndex.map {
          case (len, i) => (s"v$v-f$i", len)
        })
      def atomicCost(v: Int): (Int, Long) =
        history(v - 1).swap.toOption.get

      // drive the walk to completion, reconstructing each batch's
      // delivered units exactly as planInputPartitions slices them
      var st = (0, 0)
      val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
      var steps = 0
      while (st != ((cur, 0)) && steps < 1000) {
        val en = SubCommitWalk.walk(st._1, st._2, cur, fileCap, byteCap,
          appendFiles, atomicCost)
        assert(en != st, s"walk stalled at $st (history=$history)")
        val delivered = scala.collection.mutable.ArrayBuffer.empty[String]
        var bytes = 0L
        var files = 0 // budgeted file count (atomic steps cost their n)
        var adm = 0   // ADMISSION units: one per file, one per atomic step
        ((st._1 + 1) to en._1).foreach { v =>
          val skip = if (v == st._1 + 1) st._2 else 0
          appendFiles(v) match {
            case Some(fs) =>
              fs.drop(skip).foreach { case (f, len) =>
                delivered += f; bytes += len; files += 1; adm += 1
              }
            case None =>
              assert(skip == 0, "watermark inside an atomic step")
              val (n, b) = atomicCost(v)
              delivered += s"v$v-atomic"; bytes += b; files += n; adm += 1
          }
        }
        if (en._2 > 0) {
          val v = en._1 + 1
          val skip = if (v == st._1 + 1) st._2 else 0
          val fs = appendFiles(v).getOrElse(
            fail(s"mid-commit watermark into atomic version $v"))
          assert(en._2 > skip && en._2 <= fs.size,
            s"watermark $en out of range for $v (skip=$skip)")
          fs.slice(skip, en._2).foreach { case (f, len) =>
            delivered += f; bytes += len; files += 1; adm += 1
          }
        }
        // budget: a batch holding MORE than one admission unit (a file,
        // or a whole atomic step) must fit every cap — a single
        // over-budget unit may ride alone (the progress rule)
        if (adm > 1) {
          fileCap.foreach(c => assert(files <= c,
            s"file budget $c exceeded: $files files in $st -> $en"))
          byteCap.foreach(c => assert(bytes <= c,
            s"byte budget $c exceeded: $bytes bytes in $st -> $en"))
        }
        batches += delivered.toSeq
        st = en
        steps += 1
      }
      assert(st == ((cur, 0)), s"did not drain in 1000 steps: $history")

      // exactness: the concatenation is every unit exactly once, in order
      val want = (1 to cur).flatMap { v =>
        history(v - 1) match {
          case Right(sizes) => sizes.indices.map(i => s"v$v-f$i")
          case Left(_) => Seq(s"v$v-atomic")
        }
      }
      assert(batches.flatten.toSeq == want,
        s"delivery mismatch for $history with caps $budgets")
      true
    })
  }
}
