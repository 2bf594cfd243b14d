package graft.meta

import java.nio.charset.StandardCharsets.UTF_8

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties over the string-bound metrics truncation: an
  * UNSOUND upper bound silently mis-prunes files (row loss), so the
  * increment logic gets the adversarial treatment — arbitrary valid
  * strings across the BMP/surrogate-gap/supplementary ranges, compared
  * in exactly the unsigned UTF-8 byte order every stats consumer uses. */
class FileStatsPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  /** Valid Unicode scalar values only (no lone surrogates — Spark
    * strings are valid UTF-8), weighted toward the edges the increment
    * logic must handle: the surrogate gap boundary and U+10FFFF. */
  private val codePoint: Gen[Int] = Gen.frequency(
    6 -> Gen.choose(0x20, 0x7E),
    2 -> Gen.choose(0x80, 0xD7FF),
    1 -> Gen.oneOf(0xD7FF, 0xE000, 0xFFFD, 0x10FFFE, 0x10FFFF),
    1 -> Gen.choose(0xE000, 0x10FFFF))

  private val str: Gen[String] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, codePoint))
      .map(cps => new String(cps.toArray, 0, cps.length))

  private def cmp(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(a.getBytes(UTF_8), b.getBytes(UTF_8))

  test("truncated upper bound is a true upper bound in unsigned UTF-8 order") {
    check(Prop.forAll(str) { s =>
      FileStats.truncateUpper(s) match {
        case None => Prop.passed // stat withheld — always sound
        case Some(t) =>
          val bounded = cmp(t, s) >= 0
          val short = t.codePointCount(0, t.length) <= 16
          Prop(bounded && short) :| s"t=$t s=$s bounded=$bounded short=$short"
      }
    })
  }

  test("the bound also covers every longer string sharing the prefix") {
    // the stored max summarizes a whole FILE: any row extending the
    // truncated prefix (not just the one max value) must stay below it
    check(Prop.forAll(str, str) { (s, tail) =>
      if (s.codePointCount(0, s.length) <= 16) Prop.passed
      else FileStats.truncateUpper(s) match {
        case None => Prop.passed
        case Some(t) =>
          val prefix = s.substring(0, s.offsetByCodePoints(0, 16))
          Prop(cmp(t, prefix + tail) > 0) :| s"t=$t vs ${prefix + tail}"
      }
    })
  }

  test("short strings pass through untouched") {
    check(Prop.forAll(str) { s =>
      val short = if (s.codePointCount(0, s.length) <= 16) s
        else s.substring(0, s.offsetByCodePoints(0, 16))
      FileStats.truncateUpper(short).contains(short)
    })
  }
}
