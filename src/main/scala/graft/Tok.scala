package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{split, trim}

/** THE tokenizer seam — the engine has exactly TWO tokenization
  * conventions, each defined once as a Spark expression with its DuckDB
  * oracle mirror, and consumed by every operator of its family. Before
  * this seam each operator inlined its own `split(...)`, which is the
  * q137-class desync hazard: one operator trimming (or splitting)
  * differently than the persisted artifact it joins against silently
  * mis-keys every downstream join. With one definition per family, a
  * convention change is one edit that either moves everything or breaks
  * the oracle gate loudly.
  *
  * Families:
  *  - [[ws]] — the AUDIT family: whitespace-run split of trimmed text.
  *    Used by the corpus-audit tier (quality/Zipf/Heaps/containment/
  *    templates/LM scoring/…) and the dedup shingles.
  *  - [[sp]] — the POSTINGS family: literal single-space split. The
  *    convention the BM25/phrase inverted index persists; build,
  *    maintenance, serving, and every consumer of `postings` must share
  *    it bit-for-bit.
  */
object Tok {

  /** Audit-family tokenizer: whitespace-run split of trimmed text. */
  def ws(c: Column): Column = split(trim(c), "\\s+")

  /** DuckDB mirror of [[ws]] over an arbitrary SQL expression. */
  def wsSql(e: String): String = s"regexp_split_to_array(trim($e), '\\s+')"

  /** Postings-family tokenizer: literal single-space split. */
  def sp(c: Column): Column = split(c, " ")

  /** DuckDB mirror of [[sp]] over an arbitrary SQL expression. */
  def spSql(e: String): String = s"string_split($e, ' ')"

  /** Driver-side [[sp]] for the fixed query/phrase literals, so request
    * tokenization cannot drift from the postings they probe. limit -1:
    * Java's default split DROPS trailing empty tokens while Spark's
    * split and DuckDB's string_split both KEEP them — the exact
    * convention drift this seam exists to prevent. */
  def spStr(text: String): Array[String] = text.split(" ", -1)
}
