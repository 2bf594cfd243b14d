package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-level gate for the corpus-pin discipline. `localCheckpoint`
  * pins its frame to executor memory+disk WITH LINEAGE TRUNCATED — one
  * lost executor kills the query instead of recomputing a partition —
  * so a pin is acceptable only on frames bounded by vocab / K /
  * |sources| / top-k (or the adjudicated iterative-graph and
  * micro-batch frames), never on a frame that grows with corpus TEXT.
  * The four audit queries that once pinned their tokenized corpus
  * (q145/q156/q158/q160 — the r14 weak flag) must stay unpinned on
  * those frames; this spec keeps a fix-forward regression from quietly
  * reintroducing the pattern. */
class PinGateSpec extends AnyFunSuite {

  private def body(file: String, fn: String): String = {
    val src = {
      val s = scala.io.Source.fromFile(file, "UTF-8")
      try s.mkString finally s.close()
    }
    val i = src.indexOf(s"def $fn")
    assert(i >= 0, s"$fn not found in $file")
    val j = src.indexOf("\n  def ", i + 1) match {
      case -1 => src.length
      case x  => x
    }
    src.substring(i, j)
  }

  private val ta = "src/main/scala/graft/llm/TextAnalysis.scala"
  private val dd = "src/main/scala/graft/llm/Dedup.scala"

  private def pins(b: String): Int = b.linesIterator.count { l =>
    val t = l.trim
    // count CODE pins only — the explanatory comments at the unpinned
    // sites name the pattern they forbid
    !(t.startsWith("*") || t.startsWith("//") || t.startsWith("/*")) &&
      l.contains(".localCheckpoint()")
  }

  test("q145 pins only the vocab-sized unigram frame") {
    val b = body(ta, "q145Collocations")
    assert(pins(b) == 1, s"q145 must pin exactly the uni frame:\n$b")
    assert(b.linesIterator.exists(l =>
      l.contains("localCheckpoint") && l.contains("VOCAB")),
      "the single q145 pin must be the vocab-bounded one")
  }

  test("q156 holds no pin at all (tokens AND the gram join recompute)") {
    assert(pins(body(dd, "q156ContainmentCurve")) == 0)
  }

  test("q158 pins only the 5-row cutoff frame") {
    val b = body(ta, "q158HeapsLaw")
    assert(pins(b) == 1, s"q158 must pin exactly the cut frame:\n$b")
    assert(b.linesIterator.exists(l =>
      l.contains("localCheckpoint") && l.contains("5 rows")),
      "the single q158 pin must be the 5-row cutoff frame")
  }

  test("q160 holds no pin at all") {
    assert(pins(body(ta, "q160RepNgram")) == 0)
  }

  test("q194 holds no pin at all (explicit boundaries, pure-row buckets)") {
    // the r16 verdict's Missing #4: the HWM recipe derives its bucket
    // id from driver-collected literal boundaries, never from a
    // sampled repartition — so there is nothing to pin and a lost
    // executor recomputes instead of killing the audit
    assert(pins(body("src/main/scala/graft/ops/Scalars.scala",
      "q194WatermarkReplay")) == 0)
  }

  test("every text tokenization goes through the Tok seam") {
    // the q137-class desync hazard: an operator inlining its own
    // split(...) can silently diverge from the artifact family it
    // joins against. graft.Tok owns both families (ws audit / sp
    // postings) and their DuckDB mirrors — no operator may rebuild one
    val forbidden = Seq(
      "split(trim(",             // audit family, Spark side
      "regexp_split_to_array(",  // audit family, oracle side
      "string_split(text, ' ')", // postings family, oracle side
      "string_split(d.text",
      "string_split(qtext",
      ".split(\" \")")           // postings family, driver side
    val dirs = Seq("src/main/scala/graft/llm", "src/main/scala/graft/ops")
    val hits = for {
      d <- dirs
      f <- new java.io.File(d).listFiles.toSeq.filter(_.getName.endsWith(".scala"))
      src = { val s = scala.io.Source.fromFile(f, "UTF-8"); try s.mkString finally s.close() }
      (line, n) <- src.linesIterator.zipWithIndex
      t = line.trim
      if !(t.startsWith("*") || t.startsWith("//") || t.startsWith("/*"))
      p <- forbidden if line.contains(p)
    } yield s"${f.getPath}:${n + 1}: $p"
    assert(hits.isEmpty, "inline tokenizer expressions found:\n" +
      hits.mkString("\n"))
    // the VAL-BOUND rebuild (`val t = trim(...); split(t, "\s+")`) is
    // the same ws-family tokenizer the literal patterns cannot see —
    // the r15 self-review catch
    val bound = """split\(\s*[A-Za-z_]\w*\s*,\s*"\\\\s\+"\)""".r
    val hits2 = for {
      d <- dirs
      f <- new java.io.File(d).listFiles.toSeq.filter(_.getName.endsWith(".scala"))
      src = { val s = scala.io.Source.fromFile(f, "UTF-8"); try s.mkString finally s.close() }
      (line, n) <- src.linesIterator.zipWithIndex
      t = line.trim
      if !(t.startsWith("*") || t.startsWith("//") || t.startsWith("/*"))
      if bound.findFirstIn(line).isDefined
    } yield s"${f.getPath}:${n + 1}: $line"
    assert(hits2.isEmpty, "val-bound inline tokenizers found:\n" +
      hits2.mkString("\n"))
  }
}
