package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Tables, Tok}

/** Text-analysis operators for corpus curation: language-ID heuristic,
  * quality scoring, token counting, and content fingerprinting. All four
  * are map-only per-document expressions followed by (at most) one keyed
  * aggregation — embarrassingly parallel at 100 TB.
  */
object TextAnalysis {

  private val stopRe = "\\b(the|a|of|and|to|in)\\b"

  /** Marker-word language-ID: per-language stopword profiles scored with
    * regexp_count; argmax with a fixed precedence order (deterministic,
    * and SQL-expressible for the oracle). */
  def q58LangId(s: SparkSession, dir: String): DataFrame = {
    val t = lower(col("text"))
    val scoreEn = regexp_count(t, lit("\\b(the|a|of|and)\\b"))
    val scoreDe = regexp_count(t, lit("\\b(der|die|das|und|ist)\\b"))
    val scoreEs = regexp_count(t, lit("\\b(el|la|los|las|es)\\b"))
    val scoreFr = regexp_count(t, lit("\\b(le|les|est|et)\\b"))
    val scoreZh = regexp_count(col("text"), lit("[\\u4e00-\\u9fff]"))
    val best = greatest(scoreEn, scoreDe, scoreEs, scoreFr, scoreZh)
    val pred = when(best === 0, "und")
      .when(scoreEn === best, "en").when(scoreDe === best, "de")
      .when(scoreEs === best, "es").when(scoreFr === best, "fr")
      .otherwise("zh")
    Tables.documents(s, dir).select(
      col("doc_id"), col("lang"), pred.as("pred_lang"),
      (pred === col("lang")).as("is_match"))
      .orderBy(col("doc_id"))
  }

  val q58Sql: String =
    """WITH scored AS (
      |  SELECT doc_id, lang,
      |    len(regexp_extract_all(lower(text), '\b(the|a|of|and)\b')) AS s_en,
      |    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist)\b')) AS s_de,
      |    len(regexp_extract_all(lower(text), '\b(el|la|los|las|es)\b')) AS s_es,
      |    len(regexp_extract_all(lower(text), '\b(le|les|est|et)\b')) AS s_fr,
      |    len(regexp_extract_all(text, '[一-鿿]')) AS s_zh
      |  FROM documents),
      |pred AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN GREATEST(s_en, s_de, s_es, s_fr, s_zh) = 0 THEN 'und'
      |         WHEN s_en = GREATEST(s_en, s_de, s_es, s_fr, s_zh) THEN 'en'
      |         WHEN s_de = GREATEST(s_en, s_de, s_es, s_fr, s_zh) THEN 'de'
      |         WHEN s_es = GREATEST(s_en, s_de, s_es, s_fr, s_zh) THEN 'es'
      |         WHEN s_fr = GREATEST(s_en, s_de, s_es, s_fr, s_zh) THEN 'fr'
      |         ELSE 'zh' END AS pred_lang
      |  FROM scored)
      |SELECT doc_id, lang, pred_lang, pred_lang = lang AS is_match
      |FROM pred ORDER BY doc_id""".stripMargin

  /** The q59 composite quality score as a reusable per-row expression —
    * shared with q113's quality-weighted sampler, which computes it
    * INLINE on its own scan (never a corpus-keyed join back to q59's
    * output). Pure per-row arithmetic; identical double ops on both
    * engines; round(…, 6). */
  def qualityExpr: Column = {
    val nWords = size(Tok.ws(col("text")))
    val nStop = regexp_count(lower(col("text")), lit(stopRe))
    val nPunct = regexp_count(col("text"), lit("[^a-zA-Z0-9\\s]"))
    val stopRatio = nStop * 1.0 / nWords
    val punctRatio = nPunct * 1.0 / greatest(length(col("text")), lit(1))
    round(least(nWords / 100.0, lit(1.0)) * 0.4
      + least(stopRatio * 5.0, lit(1.0)) * 0.3
      + (lit(1.0) - least(punctRatio * 10.0, lit(1.0))) * 0.3, 6)
  }

  /** The same composite in DuckDB syntax over the `text` column of the
    * enclosing FROM — one source of truth with [[qualityExpr]] (q59Sql
    * and q113's oracle both embed it verbatim). */
  val sqlQualityExpr: String =
    raw"""ROUND(LEAST(len(${Tok.wsSql("text")}) / 100.0, 1.0) * 0.4
      |    + LEAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in)\b')) * 1.0
      |        / len(${Tok.wsSql("text")}) * 5.0, 1.0) * 0.3
      |    + (1.0 - LEAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) * 1.0
      |        / GREATEST(LENGTH(text), 1) * 10.0, 1.0)) * 0.3, 6)""".stripMargin

  /** Quality scoring: length, word stats, stopword/punctuation ratios →
    * composite score ([[qualityExpr]]). */
  def q59Quality(s: SparkSession, dir: String): DataFrame = {
    val nWords = size(Tok.ws(col("text")))
    val nStop = regexp_count(lower(col("text")), lit(stopRe))
    val avgWordLen = length(regexp_replace(col("text"), "\\s+", "")) * 1.0 / nWords
    val nPunct = regexp_count(col("text"), lit("[^a-zA-Z0-9\\s]"))
    val stopRatio = nStop * 1.0 / nWords
    val punctRatio = nPunct * 1.0 / greatest(length(col("text")), lit(1))
    Tables.documents(s, dir).select(
      col("doc_id"), nWords.as("n_words"),
      round(avgWordLen, 6).as("avg_word_len"),
      round(stopRatio, 6).as("stop_ratio"),
      round(punctRatio, 6).as("punct_ratio"),
      qualityExpr.as("quality"))
      .orderBy(col("doc_id"))
  }

  val q59Sql: String =
    raw"""SELECT doc_id,
      |  CAST(len(${Tok.wsSql("text")}) AS INTEGER) AS n_words,
      |  ROUND(LENGTH(regexp_replace(text, '\s+', '', 'g')) * 1.0
      |    / len(${Tok.wsSql("text")}), 6) AS avg_word_len,
      |  ROUND(len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in)\b')) * 1.0
      |    / len(${Tok.wsSql("text")}), 6) AS stop_ratio,
      |  ROUND(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) * 1.0
      |    / GREATEST(LENGTH(text), 1), 6) AS punct_ratio,
      |""".stripMargin + "  " + sqlQualityExpr + """ AS quality
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Token counting per source: whitespace tokens + a BPE-ish regex
    * tokenizer (letter runs / digit runs / single other), aggregated. */
  def q60TokenCount(s: SparkSession, dir: String): DataFrame = {
    val wsTokens = size(Tok.ws(col("text")))
    val reTokens = size(regexp_extract_all(lower(col("text")),
      lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
    Tables.documents(s, dir)
      .select(col("source"), wsTokens.as("ws"), reTokens.as("re"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).as("tot_ws_tokens"),
        sum(col("re")).as("tot_re_tokens"),
        round(sum(col("re")) * 1.0 / count(lit(1)), 6).as("avg_re_tokens"))
      .orderBy(col("source"))
  }

  val q60Sql: String =
    raw"""SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(len(${Tok.wsSql("text")})) AS BIGINT) AS tot_ws_tokens,
      |  CAST(SUM(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS tot_re_tokens,
      |  ROUND(SUM(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))) * 1.0
      |    / COUNT(*), 6) AS avg_re_tokens
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Document fingerprinting: (a) a polynomial rolling hash over the
    * character stream (mod 1e9+7 — every intermediate fits exactly in
    * BIGINT on both engines), (b) a winnowing-style min-shingle hash
    * using the SAME mod-p char fold per 3-word shingle (not xxhash64,
    * which is engine-specific) — so the whole row is oracle-checkable
    * against DuckDB's list_reduce. Both map-only. */
  /** mod-1e9+7 char fold — the engine-neutral string hash shared by the
    * fingerprint, curation, and frame-sampling queries (every
    * intermediate fits in BIGINT on both engines; both engines fold
    * CODE POINTS — see [[graft.functions.CharFoldF]], whose Scaladoc
    * carries the bit-compatibility argument vs the previous HOF
    * formulation; as a native expression the fold is one
    * allocation-free string walk instead of an interpreted boxed
    * per-character array). */
  def charFold(str: Column): Column =
    org.apache.spark.sql.GraftColumns.of(
      graft.functions.CharFoldF(org.apache.spark.sql.GraftColumns.expr(str)))

  /** The same fold as a DuckDB expression over column/expression `e`. */
  def sqlCharFold(e: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(regexp_extract_all($e, '(?s).'),
       |      c -> CAST(ascii(c) AS BIGINT))),
       |    (a, c) -> (a * 31 + c) % 1000000007)""".stripMargin

  def q61Fingerprint(s: SparkSession, dir: String): DataFrame = {
    val words = Tok.ws(col("text"))
    // slice truncates at the array end (and DuckDB's w[i:i+2] slices the
    // same way), so a 1-2 word document folds its whole text instead of
    // diverging between engines (element_at past the end would throw
    // under ANSI; concat_ws-over-nulls would skip where DuckDB nulls)
    val shingles = transform(sequence(lit(1), greatest(size(words) - 2, lit(1))),
      i => charFold(concat_ws(" ", slice(words, i, lit(3)))))
    Tables.documents(s, dir).select(
      col("doc_id"), charFold(col("text")).as("poly_fp"),
      array_min(shingles).as("min_shingle_fp"))
      .orderBy(col("doc_id"))
  }

  /** The same two folds in DuckDB: `regexp_extract_all(s, '(?s).')`
    * splits to codepoints exactly like Spark's `split(s, '')` (verified
    * value-identical on the corpus), and list_reduce replays the fold. */
  val q61Sql: String =
    raw"""WITH w AS (
      |  SELECT doc_id, text,
      |    ${Tok.wsSql("text")} AS w
      |  FROM documents)
      |SELECT doc_id,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(regexp_extract_all(text, '(?s).'),
      |      c -> CAST(ascii(c) AS BIGINT))),
      |    (a, c) -> (a * 31 + c) % 1000000007) AS poly_fp,
      |  list_min(list_transform(range(1, greatest(len(w) - 2, 1) + 1),
      |    i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(regexp_extract_all(array_to_string(w[i:i+2], ' '), '(?s).'),
      |        c -> CAST(ascii(c) AS BIGINT))),
      |      (a, c) -> (a * 31 + c) % 1000000007))) AS min_shingle_fp
      |FROM w ORDER BY doc_id""".stripMargin

  /** Within-document repetition statistics — the Gopher-class
    * repetition filters a pretraining pipeline applies before anything
    * else sees the text, at BOTH granularities the paper prescribes:
    * n-gram level (the fraction of bigram occurrences that are repeats,
    * 1 - distinct/total, and the share of the single most frequent
    * bigram) and LINE level (duplicate-line ratio and top-line share
    * over newline-split lines — boilerplate headers and chat spam
    * duplicate whole lines without repeating bigrams). `repetitive`
    * trips on either: dup bigrams > 0.5 or dup lines > 0.3 (Gopher's
    * duplicate-line threshold). Plan shape: two explodes (doc, bigram)
    * / (doc, line) → partial+final aggregations, all map-side combined
    * before their shuffle, joined on doc_id — no per-doc collect, no
    * quadratic HOF lambda, scales linearly in corpus size. (The sf
    * corpora are single-line, so the oracle exercises the degenerate
    * case; RetrievalCurationSpec drives multi-line fixtures.) */
  def q88Repetition(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), Tok.ws(col("text")).as("t"))
      .filter(size(col("t")) >= 2) // sequence(0, n-2) needs n >= 2
    val bg = docs.select(col("doc_id"),
      explode(expr("transform(sequence(0, size(t) - 2), " +
        "i -> concat(element_at(t, i + 1), ' ', element_at(t, i + 2)))"))
        .as("bigram"))
    val bigramStats = bg
      .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("top"),
        count(lit(1)).as("dist"))
    val lineStats = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), "\n")).as("line"))
      .groupBy(col("doc_id"), col("line")).agg(count(lit(1)).as("lc"))
      .groupBy(col("doc_id"))
      .agg(sum(col("lc")).as("n_lines"), max(col("lc")).as("ltop"),
        count(lit(1)).as("ldist"))
    bigramStats.join(lineStats, Seq("doc_id"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("top") / col("n_bigrams"), 6).as("top_bigram_frac"),
        round(lit(1.0) - col("dist") / col("n_bigrams"), 6)
          .as("dup_bigram_frac"),
        col("n_lines"),
        round(col("ltop") / col("n_lines"), 6).as("top_line_frac"),
        round(lit(1.0) - col("ldist") / col("n_lines"), 6)
          .as("dup_line_frac"),
        ((lit(1.0) - col("dist") / col("n_bigrams") > 0.5) ||
          (lit(1.0) - col("ldist") / col("n_lines") > 0.3)).as("repetitive"))
      .orderBy(col("doc_id"))
  }

  val q88Sql: String =
    raw"""WITH toks AS (
      |  SELECT doc_id, ${Tok.wsSql("text")} AS t
      |  FROM documents),
      |idx AS (
      |  SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
      |  FROM toks WHERE len(t) >= 2),
      |bg AS (
      |  SELECT doc_id, t[i] || ' ' || t[i + 1] AS bigram FROM idx),
      |counts AS (
      |  SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
      |agg AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
      |    max(c) AS top, count(*) AS dist
      |  FROM counts GROUP BY 1),
      |ln AS (
      |  SELECT doc_id, unnest(string_split(text, chr(10))) AS line
      |  FROM documents),
      |lcounts AS (
      |  SELECT doc_id, line, count(*) AS lc FROM ln GROUP BY 1, 2),
      |lagg AS (
      |  SELECT doc_id, CAST(sum(lc) AS BIGINT) AS n_lines,
      |    max(lc) AS ltop, count(*) AS ldist
      |  FROM lcounts GROUP BY 1)
      |SELECT doc_id, n_bigrams,
      |  round(top * 1.0 / n_bigrams, 6) AS top_bigram_frac,
      |  round(1 - dist * 1.0 / n_bigrams, 6) AS dup_bigram_frac,
      |  n_lines,
      |  round(ltop * 1.0 / n_lines, 6) AS top_line_frac,
      |  round(1 - ldist * 1.0 / n_lines, 6) AS dup_line_frac,
      |  ((1 - dist * 1.0 / n_bigrams) > 0.5
      |    OR (1 - ldist * 1.0 / n_lines) > 0.3) AS repetitive
      |FROM agg JOIN lagg USING (doc_id) ORDER BY doc_id""".stripMargin

  /** C4-style heuristic corpus filtering (the cleaning pass a web-scale
    * training pipeline runs before dedup): document-level rules — enough
    * words, sane mean word length, terminal punctuation, no
    * lorem-ipsum/brace boilerplate — each surfaced as its own flag so a
    * curator can audit WHY a document fell out, plus the combined keep
    * verdict. Map-only (scales embarrassingly); the flags are plain
    * codegen'd string expressions, no UDFs. */
  /** The q91 composite keep verdict as a reusable per-row expression
    * (one source of truth with [[sqlC4KeepExpr]]; consumed by q91
    * only — q116's funnel runs its OWN per-corpus rule family,
    * [[graft.llm.Curation.funnelFilterExpr]]: 20-word floor, no
    * terminal-punctuation test). */
  def c4KeepExpr: Column = {
    val t = trim(col("text"))
    // tokenization through the seam — a val-bound split(trim, "\\s+")
    // is still the ws family rebuilt inline (the r15 review catch)
    val nWords = size(Tok.ws(col("text")))
    val meanWordLen = length(regexp_replace(t, "\\s+", "")) * 1.0 / nWords
    (nWords >= 5) && (meanWordLen >= 2.0 && meanWordLen <= 12.0) &&
      t.rlike("[.!?\"]$") &&
      !lower(col("text")).contains("lorem ipsum") &&
      !col("text").contains("{")
  }

  /** The same verdict in DuckDB syntax over the `text` column of the
    * enclosing FROM. */
  val sqlC4KeepExpr: String =
    raw"""(len(${Tok.wsSql("text")}) >= 5)
      |    AND (LENGTH(regexp_replace(trim(text), '\s+', '', 'g')) * 1.0
      |      / len(${Tok.wsSql("text")}) BETWEEN 2.0 AND 12.0)
      |    AND regexp_matches(trim(text), '[.!?"]$$')
      |    AND NOT contains(lower(text), 'lorem ipsum')
      |    AND NOT contains(text, '{')""".stripMargin

  def q91QualityFilter(s: SparkSession, dir: String): DataFrame = {
    val t = trim(col("text"))
    val nWords = size(Tok.ws(col("text")))
    val meanWordLen = length(regexp_replace(t, "\\s+", "")) * 1.0 / nWords
    val enoughWords = nWords >= 5
    val saneWordLen = meanWordLen >= 2.0 && meanWordLen <= 12.0
    val terminal = t.rlike("[.!?\"]$")
    val noLorem = !lower(col("text")).contains("lorem ipsum")
    val noBraces = !col("text").contains("{")
    Tables.documents(s, dir).select(
      col("doc_id"), enoughWords.as("enough_words"),
      saneWordLen.as("sane_word_len"), terminal.as("terminal_punct"),
      noLorem.as("no_lorem"), noBraces.as("no_braces"),
      c4KeepExpr.as("keep"))
      .orderBy(col("doc_id"))
  }

  val q91Sql: String =
    raw"""SELECT doc_id,
      |  len(${Tok.wsSql("text")}) >= 5 AS enough_words,
      |  LENGTH(regexp_replace(trim(text), '\s+', '', 'g')) * 1.0
      |    / len(${Tok.wsSql("text")}) BETWEEN 2.0 AND 12.0
      |    AS sane_word_len,
      |  regexp_matches(trim(text), '[.!?"]$$') AS terminal_punct,
      |  NOT contains(lower(text), 'lorem ipsum') AS no_lorem,
      |  NOT contains(text, '{') AS no_braces,
      |""".stripMargin + "  " + sqlC4KeepExpr + """ AS keep
      |FROM documents ORDER BY doc_id""".stripMargin

  /** PII redaction: emails, phone numbers, and IPv4 addresses replaced
    * by typed placeholders, with per-kind match counts for the audit
    * log. The corpus text is deterministically salted with synthetic
    * PII (same construction in the oracle) so the rules provably fire.
    * Pure regexp_replace/regexp_count — map-only at 100 TB, and the
    * patterns stay in the RE2 ∩ java.util.regex common subset so the
    * engine and the oracle agree byte-for-byte. */
  def q92PiiRedact(s: SparkSession, dir: String): DataFrame = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\+1-555-[0-9]{4}"
    val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    val salted = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com"),
      lit(" or +1-555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" at 10.0."), (col("doc_id") % 256).cast("string"), lit(".1"))
    Tables.documents(s, dir).select(col("doc_id"), salted.as("s"))
      .withColumn("r", regexp_replace(
        regexp_replace(regexp_replace(col("s"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>"), ipRe, "<IP>"))
      .select(
        col("doc_id"),
        regexp_count(col("s"), lit(emailRe)).cast("int").as("n_emails"),
        regexp_count(col("s"), lit(phoneRe)).cast("int").as("n_phones"),
        regexp_count(col("r"), lit(ipRe)).cast("int").as("n_ips_left"),
        length(col("r")).as("redacted_len"),
        expr("right(r, 48)").as("redacted_tail"))
      .orderBy(col("doc_id"))
  }

  val q92Sql: String =
    """WITH salted AS (
      |  SELECT doc_id,
      |    text || ' contact user' || doc_id || '@example.com'
      |      || ' or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |      || ' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' AS s
      |  FROM documents),
      |red AS (
      |  SELECT doc_id, s,
      |    regexp_replace(regexp_replace(regexp_replace(s,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |      '\+1-555-[0-9]{4}', '<PHONE>', 'g'),
      |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS r
      |  FROM salted)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(s,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
      |  CAST(len(regexp_extract_all(s, '\+1-555-[0-9]{4}')) AS INTEGER) AS n_phones,
      |  CAST(len(regexp_extract_all(r,
      |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INTEGER)
      |    AS n_ips_left,
      |  LENGTH(r) AS redacted_len,
      |  right(r, 48) AS redacted_tail
      |FROM red ORDER BY doc_id""".stripMargin

  /** Misra–Gries heavy-hitters sketch (Misra & Gries 1982; mergeable
    * form per Agarwal et al. 2013, "Mergeable Summaries"): at most K
    * counters per partial state. `reduce` is the classic step
    * (increment if tracked, insert if room, else decrement-all);
    * `merge` sums counters then trims by subtracting the (K+1)-th
    * largest count — both preserve the deficit bound, so after ANY
    * reduce/merge tree every token with true frequency > n/(K+1)
    * still holds a counter. The finish emits CANDIDATES only; q142's
    * exact verification pass prices truth. */
  private[graft] object MisraGries
      extends org.apache.spark.sql.expressions.Aggregator[
        String, Array[(String, Long)], Seq[String]] {
    val K = 32
    // The buffer is a fixed K-slot array mutated IN PLACE: `udaf` wraps
    // a typed Aggregator as a TypedImperativeAggregate, which keeps the
    // buffer as a live JVM object between rows (serializing only at
    // partition boundaries), so `reduce` runs allocation-free on the
    // hottest loop in the pack — one token = one ≤K-slot scan, zero
    // short-lived Maps (an immutable buffer allocated per input row;
    // on a 100 TB token stream that is per-token GC churn for nothing).
    // A slot with count 0 is FREE regardless of its lingering key (the
    // classic array MG: decrement-to-zero frees the slot; the tracked
    // scan requires count > 0, so a freed key re-arriving is a fresh
    // insert — the same states the Map form visited). Semantics are
    // unchanged: increment if tracked, claim a free slot if any, else
    // decrement-all — the deficit bound argument is untouched.
    def zero: Array[(String, Long)] = Array.empty
    def reduce(b0: Array[(String, Long)], t: String)
        : Array[(String, Long)] = {
      // grow once to full capacity on first use (K tiny, fixed)
      val b = if (b0.length < K) {
        val g = Array.fill[(String, Long)](K)(("", 0L))
        System.arraycopy(b0, 0, g, 0, b0.length); g
      } else b0
      var free = -1
      var i = 0
      while (i < K) {
        val e = b(i)
        if (e._2 > 0L) { if (e._1 == t) { b(i) = (t, e._2 + 1L); return b } }
        else if (free < 0) free = i
        i += 1
      }
      if (free >= 0) { b(free) = (t, 1L); return b }
      i = 0
      while (i < K) {
        val e = b(i)
        if (e._2 > 0L) b(i) = (e._1, e._2 - 1L)
        i += 1
      }
      b
    }
    // merge runs once per partition boundary, not per row — a scratch
    // map here is not churn; the (K+1)-th-largest trim preserves the
    // mergeable-summaries deficit bound exactly as before
    def merge(b1: Array[(String, Long)], b2: Array[(String, Long)])
        : Array[(String, Long)] = {
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      b1.foreach { case (k, c) => if (c > 0L) m.update(k, m.getOrElse(k, 0L) + c) }
      b2.foreach { case (k, c) => if (c > 0L) m.update(k, m.getOrElse(k, 0L) + c) }
      if (m.size <= K) m.toArray
      else {
        val cut = m.values.toSeq.sorted(Ordering[Long].reverse).apply(K)
        m.iterator.collect { case (k, c) if c > cut => (k, c - cut) }.toArray
      }
    }
    def finish(b: Array[(String, Long)]): Seq[String] =
      b.iterator.filter(_._2 > 0L).map(_._1).toSeq.sorted
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Exact corpus heavy hitters via sketch-then-verify (q142) — the
    * tokens exceeding a 1/32 frequency share, computed WITHOUT ever
    * shuffling the vocabulary: pass 1 folds the corpus through the
    * [[MisraGries]] Aggregator — per-partition state is ≤ K counters
    * regardless of vocabulary size, merged in Spark's partial-agg
    * tree, so the only thing that moves is K counters per partition
    * (contrast q127's (source, token)-keyed shuffle: correct, but its
    * shuffle grows with the vocabulary); pass 2 re-scans with the
    * ≤ K candidate set broadcast in an `isin`, counting candidates
    * exactly and everything else into one residual bucket — ≤ K+1
    * groups through the shuffle. The MG deficit bound guarantees the
    * candidates cover every true heavy hitter, and the exact pass
    * discards false positives — so the OUTPUT is exactly the tokens
    * with cnt·32 > n, integer-arithmetic truth the oracle recomputes
    * directly (the oracle thereby re-proves the sketch's covering
    * guarantee on every run). The final rank window orders ≤ K rows.
    * The one driver-side collect is the 1-row candidate list (≤ K
    * strings — bounded, fence-read class). */
  def q142HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, dir)
      .select(explode(Tok.sp(col("text"))).as("tok"))
    val mg = udaf(MisraGries)
    val cands = toks.agg(mg(col("tok"))).head().getSeq[String](0)
    val counted = toks
      .groupBy(when(col("tok").isin(cands: _*), col("tok")).as("token"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // ≤ K+1 rows; feeds the total AND the filter
    val tot = counted.agg(sum(col("cnt")).as("n"))
    counted.filter(col("token").isNotNull)
      .crossJoin(broadcast(tot))
      .filter(col("cnt") * 32 > col("n"))
      .select(col("token"), col("cnt"),
        round(col("cnt") / col("n"), 6).as("share6"))
      .withColumn("rn", row_number()
        .over(Window.orderBy(col("cnt").desc, col("token"))).cast("int"))
      .orderBy(col("rn"))
  }

  /** DuckDB replay of q142 from first principles: the exact global
    * token frequencies filtered at cnt·32 > n — deliberately
    * sketch-free, so a hash match re-proves the MG covering guarantee
    * (a candidate set that missed a true heavy hitter could never
    * reproduce this output). */
  val q142Sql: String =
    raw"""WITH t AS (
      |  SELECT UNNEST(${Tok.spSql("text")}) AS token FROM documents),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM t),
      |c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY 1)
      |SELECT token, cnt, ROUND(cnt * 1.0 / n.n, 6) AS share6,
      |  CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS INTEGER) AS rn
      |FROM c, n WHERE cnt * 32 > n.n ORDER BY rn""".stripMargin

  /** Encoding-sanity audit (q139) — the mojibake/control-character
    * triage a crawl pipeline runs before any text operator (the fix
    * pass CCNet/ftfy-class tooling applies; Wenzek et al. 2020 §3.1):
    * per source, how many documents carry (a) U+FFFD replacement
    * characters — a decoder already gave up once, (b) double-encoded
    * UTF-8 (the 'Ã'-lead byte signature of UTF-8 read as Latin-1 and
    * re-encoded — "café" → "cafÃ©"), (c) C0 control characters
    * (terminal-injection and tokenizer-confusion risk), plus the
    * total scrub-char count. A source with a high flagged share needs
    * its FETCHER fixed, not its documents dropped — this card routes
    * that decision. The corpus text is deterministically salted with
    * each defect class (the q92 PII construction — same expressions
    * in the oracle) so every rule provably fires.
    *
    * Scale shape: salting and the three counters are map-only
    * regexp_count projections (patterns in the RE2 ∩ java.util.regex
    * common subset, counts engine-identical by construction); the
    * only shuffle is the |sources|-key aggregate with map-side
    * combine. Nothing scales beyond one corpus scan. */
  def q139EncodingAudit(s: SparkSession, dir: String): DataFrame = {
    // U+00C3 U+00A9 — "é" double-encoded; U+FFFD; BEL
    val salted = concat(col("text"),
      when(col("doc_id") % 5 === 2, lit(" caf\u00c3\u00a9 menu"))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 3, lit(" \ufffd")).otherwise(lit("")),
      when(col("doc_id") % 11 === 5, lit("\u0007")).otherwise(lit("")))
    val ctrlRe = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"
    Tables.documents(s, dir)
      .select(col("source"), salted.as("s"))
      .select(col("source"),
        regexp_count(col("s"), lit("\ufffd")).as("n_repl"),
        regexp_count(col("s"), lit("\u00c3")).as("n_moji"),
        regexp_count(col("s"), lit(ctrlRe)).as("n_ctrl"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_repl") > 0, 1L).otherwise(0L)).as("repl_docs"),
        sum(when(col("n_moji") > 0, 1L).otherwise(0L)).as("moji_docs"),
        sum(when(col("n_ctrl") > 0, 1L).otherwise(0L)).as("ctrl_docs"),
        sum(when(col("n_repl") > 0 || col("n_moji") > 0 ||
          col("n_ctrl") > 0, 1L).otherwise(0L)).as("flagged_docs"),
        sum(col("n_repl") + col("n_moji") + col("n_ctrl"))
          .as("bad_chars"))
      .withColumn("flagged_share6",
        round(col("flagged_docs") / col("n_docs").cast("double"), 6))
      .orderBy(col("source"))
  }

  /** DuckDB replay of q139: identical chr()-built salting, identical
    * patterns (plain chars + the C0 class — RE2 and java.util.regex
    * agree on both), identical per-source rollup. */
  val q139Sql: String =
    """WITH salted AS (
      |  SELECT source, text ||
      |    CASE WHEN doc_id % 5 = 2
      |      THEN ' caf' || chr(195) || chr(169) || ' menu' ELSE '' END ||
      |    CASE WHEN doc_id % 7 = 3 THEN ' ' || chr(65533) ELSE '' END ||
      |    CASE WHEN doc_id % 11 = 5 THEN chr(7) ELSE '' END AS s
      |  FROM documents),
      |m AS (
      |  SELECT source,
      |    len(regexp_extract_all(s, chr(65533))) AS n_repl,
      |    len(regexp_extract_all(s, chr(195))) AS n_moji,
      |    len(regexp_extract_all(s, '[\x00-\x08\x0B\x0C\x0E-\x1F]')) AS n_ctrl
      |  FROM salted)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN n_repl > 0 THEN 1 ELSE 0 END) AS BIGINT) AS repl_docs,
      |  CAST(SUM(CASE WHEN n_moji > 0 THEN 1 ELSE 0 END) AS BIGINT) AS moji_docs,
      |  CAST(SUM(CASE WHEN n_ctrl > 0 THEN 1 ELSE 0 END) AS BIGINT) AS ctrl_docs,
      |  CAST(SUM(CASE WHEN n_repl > 0 OR n_moji > 0 OR n_ctrl > 0
      |    THEN 1 ELSE 0 END) AS BIGINT) AS flagged_docs,
      |  CAST(SUM(n_repl + n_moji + n_ctrl) AS BIGINT) AS bad_chars,
      |  ROUND(SUM(CASE WHEN n_repl > 0 OR n_moji > 0 OR n_ctrl > 0
      |    THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS flagged_share6
      |FROM m GROUP BY source ORDER BY source""".stripMargin

  /** PII pattern census (q190) — the compliance sweep every corpus
    * release runs before anything ships: per source, how many documents
    * carry an email address, an IPv4 literal, an E.164-ish phone
    * number, or a URL, the total match count, and the flagged-doc share
    * in micro-units. This card only COUNTS (the redaction itself is the
    * q98 strip-span machinery's job); its value is naming WHICH source
    * needs scrubbing before the corpus leaves the building.
    *
    * Patterns stay inside the RE2∩java.util.regex subset (no
    * backreferences, no lookaround — the q139 discipline) so both
    * engines count identically; the corpus text is deterministically
    * salted with each PII class (the q139/q92 construction) so every
    * rule provably fires at any SF. One map-only pass, a
    * |sources|-bounded fold with map-side combine. */
  /** The four PII patterns, ONE source of truth for q190/q191 and both
    * engines (the q64Planes discipline — the SQL mirrors interpolate
    * these very strings, so the two surfaces cannot drift). All inside
    * RE2∩java.util.regex: `(?i)` group flags, ASCII classes, and `\b`
    * (ASCII word boundary in both engines) only. Email and URL match
    * case-insensitively (Bob.Smith@X.COM, HTTPS:// count); the IPv4
    * rule accepts only valid octets (0-255, no leading-zero ambiguity
    * beyond plain `0`) between word boundaries, so 999.999.999.999 is
    * NOT an address. Remaining declared limits: no IPv6, no
    * international phone punctuation (E.164 digits-only), URL paths
    * stop at the `[a-z0-9./-]` alphabet — a census floor, not a full
    * PII taxonomy. */
  private[llm] val PiiEmail = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private[llm] val PiiIpv4: String = {
    val o = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
    s"\\b$o\\.$o\\.$o\\.$o\\b"
  }
  private[llm] val PiiPhone = "\\+[0-9]{7,15}"
  private[llm] val PiiUrl = "(?i)https?://[a-z0-9./-]+"

  def q190PiiCensus(s: SparkSession, dir: String): DataFrame = {
    val salted = concat(col("text"),
      when(col("doc_id") % 6 === 1,
        lit(" contact bob.smith@example.com now")).otherwise(lit("")),
      when(col("doc_id") % 9 === 4,
        lit(" server at 192.168.10.25 up")).otherwise(lit("")),
      when(col("doc_id") % 13 === 6,
        lit(" call +14155550101 today")).otherwise(lit("")),
      when(col("doc_id") % 8 === 5,
        lit(" see https://example.com/a/b")).otherwise(lit("")))
    val (email, ipv4, phone, url) = (PiiEmail, PiiIpv4, PiiPhone, PiiUrl)
    Tables.documents(s, dir)
      .select(col("source"), salted.as("t"))
      .select(col("source"),
        regexp_count(col("t"), lit(email)).as("n_email"),
        regexp_count(col("t"), lit(ipv4)).as("n_ip"),
        regexp_count(col("t"), lit(phone)).as("n_phone"),
        regexp_count(col("t"), lit(url)).as("n_url"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_email") > 0, 1L).otherwise(0L)).as("email_docs"),
        sum(when(col("n_ip") > 0, 1L).otherwise(0L)).as("ip_docs"),
        sum(when(col("n_phone") > 0, 1L).otherwise(0L)).as("phone_docs"),
        sum(when(col("n_url") > 0, 1L).otherwise(0L)).as("url_docs"),
        sum(when(col("n_email") > 0 || col("n_ip") > 0 ||
          col("n_phone") > 0 || col("n_url") > 0, 1L).otherwise(0L))
          .as("pii_docs"),
        sum(col("n_email") + col("n_ip") + col("n_phone") + col("n_url"))
          .as("n_hits"))
      .withColumn("pii_share_u",
        expr("(cast(pii_docs as decimal(20,0)) * 1000000) div n_docs"))
      .orderBy(col("source"))
  }

  /** DuckDB replay of q190: identical salting, identical RE2∩Java
    * patterns, identical rollup, HUGEINT share numerator. */
  val q190Sql: String =
    raw"""WITH salted AS (
      |  SELECT source, text ||
      |    CASE WHEN doc_id % 6 = 1
      |      THEN ' contact bob.smith@example.com now' ELSE '' END ||
      |    CASE WHEN doc_id % 9 = 4
      |      THEN ' server at 192.168.10.25 up' ELSE '' END ||
      |    CASE WHEN doc_id % 13 = 6
      |      THEN ' call +14155550101 today' ELSE '' END ||
      |    CASE WHEN doc_id % 8 = 5
      |      THEN ' see https://example.com/a/b' ELSE '' END AS t
      |  FROM documents),
      |m AS (
      |  SELECT source,
      |    len(regexp_extract_all(t, '$PiiEmail')) AS n_email,
      |    len(regexp_extract_all(t, '$PiiIpv4')) AS n_ip,
      |    len(regexp_extract_all(t, '$PiiPhone')) AS n_phone,
      |    len(regexp_extract_all(t, '$PiiUrl')) AS n_url
      |  FROM salted)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS email_docs,
      |  CAST(SUM(CASE WHEN n_ip > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS ip_docs,
      |  CAST(SUM(CASE WHEN n_phone > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS phone_docs,
      |  CAST(SUM(CASE WHEN n_url > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS url_docs,
      |  CAST(SUM(CASE WHEN n_email > 0 OR n_ip > 0 OR n_phone > 0
      |    OR n_url > 0 THEN 1 ELSE 0 END) AS BIGINT) AS pii_docs,
      |  CAST(SUM(n_email + n_ip + n_phone + n_url) AS BIGINT) AS n_hits,
      |  CAST((CAST(SUM(CASE WHEN n_email > 0 OR n_ip > 0 OR n_phone > 0
      |      OR n_url > 0 THEN 1 ELSE 0 END) AS HUGEINT) * 1000000)
      |    // COUNT(*) AS BIGINT) AS pii_share_u
      |FROM m GROUP BY source ORDER BY source""".stripMargin

  /** PII redaction audit (q191) — the transform q190's census prices:
    * every email / IPv4 / phone / URL match is replaced by its class
    * token (`<EMAIL>`, `<IP>`, `<PHONE>`, `<URL>`), and the audit
    * reports per source how many documents changed and the exact
    * character mass before and after — the number a release note cites
    * as "what redaction did". The replace chain applies in a FIXED
    * order (email, ip, phone, url) because a class token must never be
    * re-matched by a later rule; both engines run the identical chain
    * (DuckDB's regexp_replace needs the explicit 'g' flag — its default
    * replaces only the first match). Same salting as q190, so the
    * transform provably fires per class at any SF. One map-only pass,
    * |sources|-bounded fold. */
  def q191PiiRedact(s: SparkSession, dir: String): DataFrame = {
    val salted = concat(col("text"),
      when(col("doc_id") % 6 === 1,
        lit(" contact bob.smith@example.com now")).otherwise(lit("")),
      when(col("doc_id") % 9 === 4,
        lit(" server at 192.168.10.25 up")).otherwise(lit("")),
      when(col("doc_id") % 13 === 6,
        lit(" call +14155550101 today")).otherwise(lit("")),
      when(col("doc_id") % 8 === 5,
        lit(" see https://example.com/a/b")).otherwise(lit("")))
    val red = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(salted, PiiEmail, "<EMAIL>"),
          PiiIpv4, "<IP>"),
        PiiPhone, "<PHONE>"),
      PiiUrl, "<URL>")
    Tables.documents(s, dir)
      .select(col("source"), salted.as("t"), red.as("r"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("t") =!= col("r"), 1L).otherwise(0L))
          .as("docs_changed"),
        sum(length(col("t")).cast("long")).as("chars_in"),
        sum(length(col("r")).cast("long")).as("chars_out"))
      .orderBy(col("source"))
  }

  /** DuckDB replay of q191: identical salting, the same four-step
    * replace chain with the 'g' flag, identical length folds. */
  val q191Sql: String =
    raw"""WITH salted AS (
      |  SELECT source, text ||
      |    CASE WHEN doc_id % 6 = 1
      |      THEN ' contact bob.smith@example.com now' ELSE '' END ||
      |    CASE WHEN doc_id % 9 = 4
      |      THEN ' server at 192.168.10.25 up' ELSE '' END ||
      |    CASE WHEN doc_id % 13 = 6
      |      THEN ' call +14155550101 today' ELSE '' END ||
      |    CASE WHEN doc_id % 8 = 5
      |      THEN ' see https://example.com/a/b' ELSE '' END AS t
      |  FROM documents),
      |red AS (
      |  SELECT source, t,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(
      |          regexp_replace(t, '$PiiEmail', '<EMAIL>', 'g'),
      |          '$PiiIpv4', '<IP>', 'g'),
      |        '$PiiPhone', '<PHONE>', 'g'),
      |      '$PiiUrl', '<URL>', 'g') AS r
      |  FROM salted)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN t <> r THEN 1 ELSE 0 END) AS BIGINT)
      |    AS docs_changed,
      |  CAST(SUM(len(t)) AS BIGINT) AS chars_in,
      |  CAST(SUM(len(r)) AS BIGINT) AS chars_out
      |FROM red GROUP BY source ORDER BY source""".stripMargin

  /** BM25 keyword retrieval (q101): a fixed query set scored against the
    * corpus through the inverted-postings shape — tokenize → per
    * (doc, term) frequencies (the posting lists), document-frequency +
    * length statistics, then a broadcast join of the query terms onto
    * the postings and ONE keyed aggregation per (query, doc). The
    * retrieval stage of keyword search / hard-negative mining over a
    * training corpus.
    *
    * Scale shape: postings are first SEMI-JOINED (broadcast) to the
    * query vocabulary, so the term shuffle is bounded by |query terms|
    * keys, never the corpus vocabulary; doc lengths join co-keyed on
    * doc_id; query/stat sides are 1-row-or-tiny broadcasts. Nothing
    * collects — the same plan run WITHOUT the vocabulary filter is the
    * offline inverted-index build.
    *
    * Determinism: per-term contributions are fixed to integer
    * micro-units BEFORE the per-doc sum, so the score never depends on
    * floating sum order (the one engine-library call, ln, is rounded
    * away at 6dp); ranking ties break on doc_id. */
  /** The fixed request set every BM25 surface shares (q101/q107/q111/
    * q117/q122/q132 and their oracles' `queries` CTE). */
  private[graft] val Bm25Queries: Seq[(Int, String)] =
    Seq((1, "dup merge scan"), (2, "spark window agg"), (3, "fast hash join key"))

  private def bm25QueryTerms(s: SparkSession,
                             queries: Seq[(Int, String)]): DataFrame = {
    import s.implicits._
    queries.toDF("query_id", "qtext").select(col("query_id"),
      explode(array_distinct(Tok.sp(col("qtext")))).as("term"))
  }

  /** The BM25 scoring core — one expression tree shared by the
    * corpus-scan ranking ([[bm25RankingOver]]) and the index-served
    * ranking ([[bm25ServeFrom]]), so the two surfaces cannot drift:
    * literals (2.2 = k1+1, 1.2 = k1, 0.25 = 1-b, 0.75 = b) and the
    * tree mirror q101Sql token-for-token — both engines build the same
    * IEEE double at every step, ln excepted, and per-term
    * contributions fix to integer micro-units BEFORE the per-doc sum
    * so the score never depends on floating sum order. `tfdl` carries
    * (doc_id, term, tf, dl) for query terms only — term frequencies
    * already INNER-joined to their document lengths, so a caller's df
    * derived from the same frame counts exactly the scoreable docs;
    * `dfreq` (term, df); `stats` one row (n, sumdl) — exact integers,
    * so avgdl is bit-identical across engines. */
  private def bm25ScoreCore(qterms: DataFrame, tfdl: DataFrame,
                            dfreq: DataFrame,
                            stats: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val contrib = tfdl
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sumdl").cast("double") / col("n"))
      .withColumn("idf",
        log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("contrib_u",
        round(col("idf") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
          * lit(1000000.0)).cast("long"))
    val scored = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib_u")).as("score_u"))
      .withColumn("score", col("score_u") / lit(1000000.0))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rn", row_number().over(w))
      .select(col("query_id"), col("doc_id"), col("score"), col("rn"))
  }

  /** The full BM25 ranking over an EXPLICIT (doc_id, text) corpus
    * frame — shared by q101 (sf parquet) and the maintainer spec
    * (catalog-table corpus). */
  def bm25RankingOver(s: SparkSession, corpus: DataFrame,
                      queries: Seq[(Int, String)]): DataFrame = {
    val qterms = bm25QueryTerms(s, queries)
    val docs = corpus.select(col("doc_id"), Tok.sp(col("text")).as("toks"))
    val dl = docs.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
    val tfdl = docs.select(col("doc_id"), explode(col("toks")).as("term"))
      .join(broadcast(qterms.select("term").distinct()), Seq("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .join(dl, Seq("doc_id"))
    val dfreq = tfdl.groupBy(col("term")).agg(count(lit(1)).as("df"))
    bm25ScoreCore(qterms, tfdl, dfreq, stats)
  }

  /** The full BM25 ranking (every scored (query, doc), rn unbounded) —
    * q101 is its top-10; q117's hard-negative pool takes top-20. */
  def bm25Ranking(s: SparkSession, dir: String): DataFrame =
    bm25RankingOver(s, Tables.documents(s, dir), Bm25Queries)

  def q101Bm25(s: SparkSession, dir: String): DataFrame =
    bm25Ranking(s, dir).filter(col("rn") <= 10)
      .orderBy(col("query_id"), col("rn"))

  // the BM25 top-20 as a memoized session artifact for CONSUMERS
  // (q107/q111's sparse channel, q117's pool+positives, q122's stage-1
  // candidates): every ranking any of them reads sits inside the
  // top-20, so ONE tokenize→postings→df/length pass per (session,
  // corpus) serves them all, |queries|×20 pinned rows. q101 itself
  // deliberately does NOT read this memo — its bench number must price
  // the ranking build, not a cache hit (the q52/q67 integrity rule).
  private val bm25Artifact = new graft.SessionMemo[DataFrame]

  /** q101's BM25 ranking truncated to each query's top-20, built once
    * per (session, sfDir) and pinned. */
  private[llm] def bm25Top20Artifact(s: SparkSession, dir: String): DataFrame =
    bm25Artifact.getOrBuild(s, dir)(
      bm25Ranking(s, dir).filter(col("rn") <= 20).localCheckpoint())

  // one inverted-index build per (session, sfDir) — same weak-key memo
  // discipline as the ANN/band indexes
  private val bm25IndexBuilt = new graft.SessionMemo[String]

  /** (doc_id, toks) → one POSITIONAL posting row per (term, doc):
    * term frequency plus the sorted 1-based token ordinals of every
    * occurrence — shared by the offline build and BOTH maintainers so
    * the index's tokenization and ordinal convention have exactly one
    * definition. Positions make the same artifact serve phrase
    * queries ([[q140PhraseSearch]]) as well as BM25; consumers that
    * only need tf never read the column (columnar pruning). */
  private def postingsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(col("toks")).as(Seq("pos0", "term")))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list((col("pos0") + 1).cast("int"))).as("positions"))
      .select(col("term"), col("doc_id"), col("tf"), col("positions"))

  /** Catalog-persisted inverted index for BM25 serving: `postings`
    * (term, doc_id, tf) PARTITIONED BY bucket(16, term) — a query's
    * In(term, …) predicate prunes to at most |query terms| of the 16
    * bucket dirs — `doclen` (doc_id, dl), and `bm25_stats`
    * (n_delta, sumdl_delta): the corpus counters as an append-only
    * DELTA ledger whose SUM is (n, sumdl), so serving reads a
    * #commits-row table instead of aggregating billions of doclen
    * rows per query, and the maintainers keep it current with one
    * fenced delta row per batch (arrivals positive, departures
    * negative — both counters are signed-additive under any
    * interleaving). Terms, ids and counts only; document text never
    * copies into the index. Built once per (session, corpus) as
    * ordinary graft tables (the AnnIndex/band artifact lifecycle);
    * [[bm25IngestStream]] (append tail) and [[bm25MaintainStream]]
    * ($changes tail, departures included) maintain the same three
    * tables for a living corpus; [[bm25Vacuum]] is the batch
    * departure path. q101's scaladoc has promised this since r9
    * ("the same plan run WITHOUT the vocabulary filter is the
    * offline inverted-index build") — this is that build, made a
    * real artifact. */
  def ensureBm25Index(s: SparkSession, dir: String): String =
    bm25IndexBuilt.getOrBuild(s, dir) {
      if (s.conf.getOption("spark.sql.catalog.graft_ir").isEmpty) {
        val wh = java.nio.file.Files.createTempDirectory("graft-ir-wh").toString
        s.conf.set("spark.sql.catalog.graft_ir",
          classOf[graft.catalog.GraftCatalog].getName)
        s.conf.set("spark.sql.catalog.graft_ir.warehouse", wh)
      }
      val ns = "sf_" + java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      val prefix = s"graft_ir.$ns"
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS graft_ir.$ns")
      s.sql(s"DROP TABLE IF EXISTS $prefix.postings")
      s.sql(s"DROP TABLE IF EXISTS $prefix.doclen")
      s.sql(s"DROP TABLE IF EXISTS $prefix.bm25_stats")
      s.sql(s"DROP TABLE IF EXISTS $prefix.doc_keywords")
      s.sql(s"CREATE TABLE $prefix.postings " +
        "(term STRING, doc_id BIGINT, tf BIGINT, positions ARRAY<INT>) " +
        "PARTITIONED BY (bucket(16, term))")
      s.sql(s"CREATE TABLE $prefix.doclen (doc_id BIGINT, dl BIGINT)")
      s.sql(s"CREATE TABLE $prefix.bm25_stats " +
        "(n_delta BIGINT, sumdl_delta BIGINT)")
      // two map-only corpus scans (postings; lengths) — the skinny dl
      // frame pins and feeds stats AND doclen, corpus tokens never pin
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), Tok.sp(col("text")).as("toks"))
      postingsOf(docs).writeTo(s"$prefix.postings").append()
      val dl = docs
        .select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
        .localCheckpoint()
      dl.agg(count(lit(1)).as("n_delta"),
          coalesce(sum(col("dl")), lit(0L)).as("sumdl_delta"))
        .writeTo(s"$prefix.bm25_stats").append()
      dl.writeTo(s"$prefix.doclen").append()
      // the maintained keyword artifact (q147): seeded here from the
      // postings just written, re-priced per touched doc by the
      // maintainers — a curation UI reads 3 rows by id instead of
      // re-pricing the corpus per read
      s.sql(s"CREATE TABLE $prefix.doc_keywords " +
        "(doc_id BIGINT, rn INT, term STRING, tf BIGINT, score_u BIGINT)")
      val post = s.table(s"$prefix.postings")
        .select(col("term"), col("doc_id"), col("tf"))
      keywordsOf(post,
          post.groupBy(col("term")).agg(count(lit(1)).as("df")),
          s.table(s"$prefix.bm25_stats")
            .agg(coalesce(sum(col("n_delta")), lit(0L)).as("n")))
        .writeTo(s"$prefix.doc_keywords").append()
      prefix
    }

  /** Serve a BM25 ranking from PERSISTED postings/doclen/stats tables
    * — the true 100 TB retrieval shape: the query reads ONLY its own
    * terms' postings (the In pushdown prunes the bucket(term) layout
    * to ≤|terms| partition dirs), lengths join by id, corpus
    * statistics SUM the #commits-row stats ledger (never a full
    * doclen aggregate per query — PlanSpec gates doclen appears in
    * the plan exactly once, as the id join), and document frequencies
    * aggregate from the pruned postings AFTER the doclen inner join —
    * so a doc whose postings committed but whose doclen row hasn't
    * (a crash inside [[bm25IngestStream]]'s commit sequence)
    * contributes to NEITHER scoring NOR df: mid-crash, served
    * rankings are exactly those of the corpus without the
    * half-committed batch. Document text is never scanned: q101's
    * tokenize-per-query cost — a full corpus pass at any scale —
    * becomes O(postings of the query vocabulary). Same
    * [[bm25ScoreCore]] expression tree as the scan path, so the two
    * surfaces cannot drift and q132's oracle is q101's verbatim. */
  /** The query's candidate frame: its terms' postings (In-pruned
    * bucket dirs) INNER-joined to their doclen rows — one streaming
    * pass over doclen's two skinny columns against the broadcast
    * postings side. Exposed un-pinned so PlanSpec can gate the
    * pushdown and the single doclen occurrence on the subtree
    * [[bm25ServeFrom]] pins. */
  private[graft] def bm25CandidatePostings(s: SparkSession,
                                         postingsFqn: String,
                                         doclenFqn: String,
                                         queries: Seq[(Int, String)])
      : DataFrame = {
    val termLits = queries.flatMap(q => Tok.spStr(q._2)).distinct
    s.table(postingsFqn)
      .filter(col("term").isin(termLits: _*))
      .select(col("term"), col("doc_id"), col("tf"))
      .join(s.table(doclenFqn).select(col("doc_id"), col("dl")),
        Seq("doc_id"))
  }

  def bm25ServeFrom(s: SparkSession, postingsFqn: String, doclenFqn: String,
                    statsFqn: String,
                    queries: Seq[(Int, String)]): DataFrame = {
    val qterms = bm25QueryTerms(s, queries)
    // pinned once per serve: |query-term postings| rows — df and the
    // scoring both read the pin, so doclen streams through exactly ONE
    // join per query and df counts exactly the scoreable docs
    val tfdl = bm25CandidatePostings(s, postingsFqn, doclenFqn, queries)
      .localCheckpoint()
    val stats = s.table(statsFqn)
      .agg(coalesce(sum(col("n_delta")), lit(0L)).as("n"),
        coalesce(sum(col("sumdl_delta")), lit(0L)).as("sumdl"))
    val dfreq = tfdl.groupBy(col("term")).agg(count(lit(1)).as("df"))
    bm25ScoreCore(qterms, tfdl, dfreq, stats)
  }

  /** BM25 served from the persisted inverted index (q132): identical
    * output to q101 by construction — same corpus, same shared
    * scoring core, document frequencies recomputed from the pruned
    * postings — so the oracle IS q101's, while the plan never touches
    * document text (PlanSpec gates zero corpus parquet scans and the
    * pushed term predicate). */
  def q132Bm25Indexed(s: SparkSession, dir: String): DataFrame = {
    val pfx = ensureBm25Index(s, dir)
    bm25ServeFrom(s, s"$pfx.postings", s"$pfx.doclen", s"$pfx.bm25_stats",
        Bm25Queries)
      .filter(col("rn") <= 10)
      .orderBy(col("query_id"), col("rn"))
  }

  /** The fixed phrase-query set q140 and its oracle share — mixed
    * lengths, because the evaluator is general: the 3-word phrase
    * exercises the iterated-adjacency fold. */
  private[graft] val PhraseQueries: Seq[(Int, String)] =
    Seq((1, "order fast"), (2, "window agg"), (3, "big order scan"))

  /** Exact phrase search served from the POSITIONAL postings (q140) —
    * the capability positions buy: find documents where the phrase's
    * words are ADJACENT in order, not merely co-present (BM25's
    * bag-of-words cannot tell "merge scan dup" from "dup merge scan").
    * Classic positional-index query evaluation (Manning, Raghavan &
    * Schütze, IIR §2.4.2), generalized to ANY phrase length by the
    * iterated-adjacency fold: a phrase w₀…w_{L-1} matches at anchor a
    * iff a+i ∈ positions(wᵢ) for every i, so the candidate anchor set
    * folds left across the terms — shift the accumulated anchors by
    * the offset delta and intersect with the next term's ordinals.
    * phrase_tf = |surviving anchors|; integer-exact across engines.
    * Docs rank by (phrase_tf desc, doc_id), top-10 per query.
    *
    * Scale shape: the q132 serving shape exactly — the In(term)
    * pushdown prunes the bucket(term) layout to the phrase
    * vocabulary's dirs, each fold step is a doc_id equi-join that only
    * documents containing EVERY phrase word so far survive (candidate
    * sets shrink monotonically), and the adjacency test is a map-side
    * array intersect — positions never shuffle on their own, and
    * document text is never scanned (PlanSpec gates it). Per-phrase
    * subplans (lengths differ) union; the top-10 window partitions by
    * query_id over final candidates only. */
  def q140PhraseSearch(s: SparkSession, dir: String): DataFrame = {
    val pfx = ensureBm25Index(s, dir)
    phraseSearchFrom(s, s"$pfx.postings", PhraseQueries)
  }

  private[graft] def phraseSearchFrom(s: SparkSession, postingsFqn: String,
                                      phrases: Seq[(Int, String)])
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val termLits = phrases.flatMap(q => Tok.spStr(q._2)).distinct
    val post = s.table(postingsFqn)
      .filter(col("term").isin(termLits: _*))
      .select(col("term"), col("doc_id"), col("positions"))
    // one subplan per phrase (lengths differ): fold the anchor set
    // left across the terms — anchors after step i are the ordinals
    // of w_i that extend a match of w_0..w_i; all intersects map-side
    val perPhrase = phrases.map { case (qid, phrase) =>
      val terms = Tok.spStr(phrase).toSeq
      val first = post.filter(col("term") === terms.head)
        .select(col("doc_id"), col("positions").as("anchors"))
      val folded = terms.tail.foldLeft(first) { (acc, t) =>
        acc.join(post.filter(col("term") === t)
            .select(col("doc_id"), col("positions").as("p")),
          Seq("doc_id"))
          .select(col("doc_id"), array_intersect(
            transform(col("anchors"), x => x + 1), col("p")).as("anchors"))
      }
      folded
        .select(lit(qid).as("query_id"), col("doc_id"),
          size(col("anchors")).cast("long").as("phrase_tf"))
    }
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("phrase_tf").desc, col("doc_id"))
    perPhrase.reduce(_ unionByName _)
      .filter(col("phrase_tf") > 0)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("query_id"), col("doc_id"), col("phrase_tf"), col("rn"))
      .orderBy(col("query_id"), col("rn"))
  }

  /** DuckDB replay of q140 in the equivalent anchor-counting form:
    * positions recomputed from the text by the same space-split
    * 1-based ordinals; an anchor matches when every phrase offset i
    * finds term wᵢ at anchor+i (COUNT(DISTINCT i) = L — identical to
    * the fold's surviving-anchor set); same (phrase_tf desc, doc_id)
    * top-10. */
  lazy val q140Sql: String = {
    val qvals = PhraseQueries.flatMap { case (id, p) =>
      Tok.spStr(p).zipWithIndex.map { case (t, i) =>
        s"($id, '$t', $i, ${Tok.spStr(p).length})" }
    }.mkString(", ")
    s"""WITH q(query_id, term, i, len) AS (VALUES $qvals),
      |d AS (SELECT doc_id, ${Tok.spSql("text")} AS w FROM documents),
      |tp AS (
      |  SELECT doc_id, UNNEST(w) AS term,
      |    UNNEST(range(1, len(w) + 1)) AS pos
      |  FROM d),
      |hits AS (
      |  SELECT q.query_id, tp.doc_id, tp.pos - q.i AS anchor, q.len, q.i
      |  FROM q JOIN tp ON tp.term = q.term),
      |anchors AS (
      |  SELECT query_id, doc_id, anchor
      |  FROM hits GROUP BY query_id, doc_id, anchor, len
      |  HAVING COUNT(DISTINCT i) = len),
      |cand AS (
      |  SELECT query_id, doc_id, CAST(COUNT(*) AS BIGINT) AS phrase_tf
      |  FROM anchors GROUP BY 1, 2),
      |rk AS (
      |  SELECT query_id, doc_id, phrase_tf,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY phrase_tf DESC, doc_id) AS rn
      |  FROM cand WHERE phrase_tf > 0)
      |SELECT query_id, doc_id, phrase_tf, CAST(rn AS INTEGER) AS rn
      |FROM rk WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin
  }

  /** Snapshot-summary fence key for [[bm25IngestStream]]'s per-batch
    * exactly-once commits. */
  val Bm25BatchKey = "graft-bm25-batch"

  /** The inverted index as an unattended INGEST maintainer — the
    * retrieval-side sibling of the dedup band maintainer: tail a
    * documents catalog table; per micro-batch, tokenize ONLY the
    * arrivals (O(batch) work, the corpus is never rescanned) and
    * append their postings, stats delta, and doclen rows, all fenced
    * on the micro-batch id ([[AnnIndex.fencedAppend]] with
    * [[Bm25BatchKey]]) so a crash replays into fenced no-ops — a
    * document can never count its terms twice (which would inflate tf
    * AND df). Commit order postings → stats → doclen: a document
    * becomes scoreable only at the final doclen commit, and
    * [[bm25ServeFrom]] derives df from the postings⋈doclen inner
    * join, so at EVERY crash point served rankings equal the corpus
    * without the half-committed batch — the one mid-crash skew is the
    * stats ledger briefly counting the batch before its docs score
    * (idf conservatively low by one batch), repaired by the replay.
    * Append-only, like dedupIngestStream: a data-stream tail cannot
    * absorb CoW survivor re-delivery; departures are
    * [[bm25MaintainStream]]'s job ($changes tail) or [[bm25Vacuum]]'s
    * (batch reconcile). */
  def bm25IngestStream(s: SparkSession, corpusFqn: String,
                       postingsFqn: String, doclenFqn: String,
                       statsFqn: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    AnnIndex.validateCheckpointStamps(s, checkpoint, postingsFqn,
      Bm25BatchKey)
    s.readStream.table(corpusFqn)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val docs = batch
          .select(col("doc_id"), Tok.sp(col("text")).as("toks"))
          .localCheckpoint() // feeds postings, stats, AND doclen
        AnnIndex.fencedAppend(postingsOf(docs),
          postingsFqn, id.toInt, Bm25BatchKey)
        AnnIndex.fencedAppend(
          docs.agg(count(lit(1)).as("n_delta"),
            coalesce(sum(size(col("toks")).cast("long")), lit(0L))
              .as("sumdl_delta")),
          statsFqn, id.toInt, Bm25BatchKey)
        AnnIndex.fencedAppend(
          docs.select(col("doc_id"), size(col("toks")).cast("long").as("dl")),
          doclenFqn, id.toInt, Bm25BatchKey)
        // keyword rows for the batch's docs, priced under the
        // post-append stats ([[repriceKeywords]] — no-op when the
        // index namespace carries no doc_keywords table)
        repriceKeywords(s, docs.select(col("doc_id")), postingsFqn,
          statsFqn)
        ()
      }
      .start()
  }

  /** Fence keys for [[bm25MaintainStream]]'s two fenced commit groups
    * per micro-batch: the departure stats decrement (must stamp BEFORE
    * the merge-deletes — its value derives from pre-delete doclen rows,
    * so an unfenced replay after the deletes would recompute zero) and
    * the arrival appends. Distinct from [[Bm25BatchKey]] so the
    * maintainer composes with [[bm25IngestStream]] on the same tables
    * without fence collisions. */
  val Bm25DepKey = "graft-bm25-dep-batch"
  val Bm25ArrKey = "graft-bm25-arr-batch"

  /** The inverted index's DEPARTURE path as an unattended maintainer —
    * the retrieval twin of [[AnnIndex.maintainStream]]: tail the
    * corpus table's `$changes` feed (a plain data tail sleeps through
    * DELETE-only commits and cannot see departures at all); per
    * micro-batch, walk the delta exactly:
    *
    *  1. when the batch contains ANY departure row (delete /
    *     update_preimage), every TOUCHED doc_id reconciles: the
    *     indexed token mass of all touched docs (doclen ⋈ touched
    *     ids, read BEFORE the deletes) appends as a fenced NEGATIVE
    *     stats delta under [[Bm25DepKey]] — fenced first so a
    *     crash-replay after the deletes (when the mass would
    *     recompute as zero) lands on the fence, never a wrong
    *     delta — then the touched ids MERGE-delete from postings and
    *     doclen. Dead documents stop scoring AND stop inflating df
    *     the moment the batch lands; a pure-append batch skips the
    *     whole leg (one bounded isEmpty, no MERGE commits);
    *  2. arrivals resolve to each doc's FINAL state in the batch —
    *     the insert/update_postimage row at its max _commit_version,
    *     absent when the doc's last change is a delete — so a
    *     same-batch insert-then-delete nets to ABSENT (the micro-batch
    *     may group multiple commits; change types alone cannot order
    *     them), a CoW file-granular rewrite's delete+insert re-delivery
    *     nets to unchanged (remove + re-add, stats zero), and an
    *     update re-indexes only the postimage;
    *  3. the final arrivals anti-join the (now-reconciled) doclen ids
    *     — a replayed or historical arrival whose doclen row already
    *     exists is dropped before it can double-count — then append
    *     postings → positive stats delta → doclen, fenced under
    *     [[Bm25ArrKey]] (same crash-ordering argument as
    *     [[bm25IngestStream]]).
    *
    * All work is O(|batch|) plus id-keyed MERGEs; the corpus is never
    * rescanned and text never enters the index. With this running,
    * served BM25 tracks a corpus under INSERT/DELETE/UPDATE/MERGE
    * exactly (DedupIndexSpec proves served ≡ fresh corpus-scan ranking
    * after each mutation class, that sum(stats) ≡ the doclen aggregate
    * at every quiesce point, and that replays from BOTH emulated crash
    * points — between the fenced decrement and the deletes, and after
    * the fenced arrival appends but before the checkpoint commit —
    * land consistent). */
  def bm25MaintainStream(s: SparkSession, corpusFqn: String,
                         postingsFqn: String, doclenFqn: String,
                         statsFqn: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // refuse a checkpoint whose numbering restarts below ANY fence
    // this stream stamps: the departure decrement (Bm25DepKey on
    // stats — the FIRST-stamped fence each batch, so it alone can
    // carry a stamp after a crash mid-departure-leg) and the arrival
    // appends (Bm25ArrKey on postings, which the replay gate reads)
    AnnIndex.validateCheckpointStamps(s, checkpoint, statsFqn,
      Bm25DepKey)
    AnnIndex.validateCheckpointStamps(s, checkpoint, postingsFqn,
      Bm25ArrKey)
    val parts = corpusFqn.split("\\.")
    val changesFqn = (parts.init :+ s"`${parts.last}$$changes`").mkString(".")
    s.readStream.table(changesFqn)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        bm25MaintainBatch(s, batch, postingsFqn, doclenFqn, statsFqn, id)
      }
      .start()
  }

  /** The per-batch body of [[bm25MaintainStream]], exposed so the
    * crash-emulation specs can drive an exact replay (same batch frame,
    * same id) without forging checkpoint state. */
  private[graft] def bm25MaintainBatch(s: SparkSession, batch: DataFrame,
                                       postingsFqn: String, doclenFqn: String,
                                       statsFqn: String, id: Long): Unit = {
    val b = batch.localCheckpoint()
    val hasDepartures = !b
      .filter(col("_change_type").isin("delete", "update_preimage"))
      .isEmpty
    // REPLAY GATE for the departure leg: `touched` includes ARRIVAL
    // doc_ids (an update's pre- and postimage share an id), and the
    // merge-deletes themselves are unfenced — so a replay of a batch
    // whose first run got PAST them (crashed any time after the fenced
    // postings append, including after the whole body but before the
    // checkpoint commit) would delete the first run's committed arrival
    // rows, which the Bm25ArrKey fence then refuses to re-append: the
    // document would stay live in the corpus but permanently lose its
    // postings. The postings stamp is the proof the first run passed
    // the delete point: EVERY run stamps Bm25ArrKey = batch id on
    // postings at the arrival append (an empty arrivals frame still
    // commits its stamped summary — the metadata-only-carrier property
    // [[AnnIndex.refresh]] relies on), and that append sits AFTER the
    // deletes, so stamp >= id ⟹ the deletes already ran ⟹ skip the
    // whole leg. Stamp < id ⟹ the first run died at or before the
    // deletes, where re-running them is idempotent (rows already gone
    // or still dead) and the decrement has its own fence. Same
    // checkpoint ⟹ same batch ids — the contract every fence here
    // already assumes.
    val departuresDone =
      AnnIndex.maxStamp(s, postingsFqn, Bm25ArrKey).exists(_ >= id)
    // a pure-append batch pays one bounded isEmpty over the pinned
    // batch, never a MERGE or a decrement row (replay-deterministic:
    // the discriminator derives from the redelivered batch alone)
    if (hasDepartures && !departuresDone) {
      val touched = b.select(col("doc_id")).distinct().localCheckpoint()
      // touched docs' indexed token mass from the INDEX's own
      // doclen rows (what was actually indexed), read before the
      // deletes; docs never indexed contribute nothing; docs whose
      // final state survives re-add their mass in the arrival leg
      AnnIndex.fencedAppend(
        s.table(doclenFqn)
          .join(touched, Seq("doc_id"), "left_semi")
          .agg((-count(lit(1))).as("n_delta"),
            (-coalesce(sum(col("dl")), lit(0L))).as("sumdl_delta")),
        statsFqn, id.toInt, Bm25DepKey)
      // foreachBatch frames live in a cloned micro-batch session —
      // the view must register AND resolve in that same session
      val bs = touched.sparkSession
      val view = "graft_bm25_dep_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      touched.createOrReplaceTempView(view)
      try Seq(postingsFqn, doclenFqn).foreach { t =>
        bs.sql(s"MERGE INTO $t x USING $view d ON x.doc_id = d.doc_id " +
          "WHEN MATCHED THEN DELETE")
      } finally bs.catalog.dropTempView(view)
    }
    // each doc's FINAL state in the batch: the arrival row at its
    // max commit version — absent when its last change is a delete
    val vmax = b.groupBy(col("doc_id"))
      .agg(max(col("_commit_version")).as("vmax"))
    val arrivals = b
      .filter(col("_change_type").isin("insert", "update_postimage"))
      .join(vmax, Seq("doc_id"))
      .filter(col("_commit_version") === col("vmax"))
      .dropDuplicates("doc_id")
      .select(col("doc_id"), Tok.sp(col("text")).as("toks"))
      .join(s.table(doclenFqn).select("doc_id"), Seq("doc_id"),
        "left_anti")
      .localCheckpoint() // feeds postings, stats, AND doclen
    // Arrival commit order postings → stats → doclen is LOAD-BEARING:
    // the doclen anti-join above is how a replay detects which arrivals
    // the first run already indexed, so doclen must land LAST among the
    // arrival-derived appends — committing it earlier would make a
    // replay after a doclen-but-not-stats crash recompute `arrivals` as
    // empty and stamp a zero stats delta under an unspent fence,
    // permanently losing the batch's mass. The cost of this order is
    // the one mid-crash skew the ingest path documents: between the
    // stats and doclen commits, n/avgdl briefly count a batch whose
    // docs cannot yet score (idf conservatively low by one batch). The
    // window closes at the next replay — which completes doclen under
    // its fence — and any residual drift is the exact thing
    // [[bm25Vacuum]]'s corrective delta self-heals.
    AnnIndex.fencedAppend(postingsOf(arrivals),
      postingsFqn, id.toInt, Bm25ArrKey)
    AnnIndex.fencedAppend(
      arrivals.agg(count(lit(1)).as("n_delta"),
        coalesce(sum(size(col("toks")).cast("long")), lit(0L))
          .as("sumdl_delta")),
      statsFqn, id.toInt, Bm25ArrKey)
    AnnIndex.fencedAppend(
      arrivals.select(col("doc_id"),
        size(col("toks")).cast("long").as("dl")),
      doclenFqn, id.toInt, Bm25ArrKey)
    // keyword repricing for EVERY touched id (arrivals get fresh rows
    // under the post-batch stats; departed docs have no postings left,
    // so the MERGE-delete retires theirs) — an idempotent state
    // function, safe on replays regardless of which fences skipped
    repriceKeywords(s, b.select(col("doc_id")), postingsFqn, statsFqn)
    ()
  }

  /** Batch departure reconciliation for the inverted index — the
    * [[AnnIndex.vacuum]] twin: anti-join each index table against the
    * CURRENT corpus id set (`MERGE … WHEN NOT MATCHED BY SOURCE THEN
    * DELETE`, ids only) so documents that left the corpus by ANY
    * history shape — CoW delete, overwrite, truncate-and-reload —
    * stop scoring and stop inflating df; then reconcile the stats
    * ledger to the live doclen aggregate (self-healing: one corrective
    * delta row repairs any accumulated drift, not just this run's).
    * An ids-only corpus scan plus two merge-deletes plus one doclen
    * aggregate — a maintenance-schedule cost, same class as
    * compaction. Returns index rows removed. */
  def bm25Vacuum(s: SparkSession, corpusFqn: String, postingsFqn: String,
                 doclenFqn: String, statsFqn: String): Long = {
    val view = "graft_bm25_live_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    s.table(corpusFqn).select(col("doc_id").cast("bigint").as("doc_id"))
      .createOrReplaceTempView(view)
    val kwFqn = keywordsFqnOf(postingsFqn)
    val removed =
      try {
        // the keyword artifact retires departed docs' rows in the same
        // sweep (its rows are doc-keyed like postings/doclen); indexes
        // without the table skip it
        val tables = Seq(postingsFqn, doclenFqn) ++
          (if (s.catalog.tableExists(kwFqn)) Seq(kwFqn) else Nil)
        tables.map { t =>
          val before = s.table(t).count()
          s.sql(s"MERGE INTO $t x USING $view l ON x.doc_id = l.doc_id " +
            "WHEN NOT MATCHED BY SOURCE THEN DELETE")
          before - s.table(t).count()
        }.sum
      } finally s.catalog.dropTempView(view)
    val live = s.table(doclenFqn)
      .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("s"))
      .head()
    val cur = s.table(statsFqn)
      .agg(coalesce(sum(col("n_delta")), lit(0L)),
        coalesce(sum(col("sumdl_delta")), lit(0L))).head()
    val (dn, ds) = (live.getLong(0) - cur.getLong(0),
      live.getLong(1) - cur.getLong(1))
    if (dn != 0L || ds != 0L) {
      import s.implicits._
      Seq((dn, ds)).toDF("n_delta", "sumdl_delta")
        .writeTo(statsFqn).append()
    }
    removed
  }

  /** Hard-negative mining for retriever training (q117) — the ANCE/
    * RocketQA-style recipe run without labels: per query, the BM25
    * rank-1 hit serves as the pseudo-POSITIVE, the next-ranked docs
    * (pool: top-20) are candidate negatives, and candidates that are
    * the positive itself or a VERIFIED NEAR-DUP of it (q52's MinHash
    * pairs — a near-duplicate of the positive is a false negative that
    * would poison the training signal) are excluded; the survivors
    * re-rank to the top-5 hard negatives per query.
    *
    * Scale shape: the ranking is q101's audited bounded plan; the
    * positive set is |queries| rows and its near-dup partners join
    * ids-only against q52's pair list, so the exclusion anti-join is a
    * broadcast against an O(queries × dups) set; the final re-rank
    * touches O(queries × 20) rows. */
  def q117HardNegatives(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = bm25Top20Artifact(s, dir)
    val pool = ranked.filter(col("rn") <= 20)
    val pos = ranked.filter(col("rn") === 1)
      .select(col("query_id"), col("doc_id").as("pos_id"))
    val pairs = Dedup.verifiedPairsArtifact(s, dir)
    val excl = pos.join(pairs, col("pos_id") === col("doc_a"))
        .select(col("query_id"), col("doc_b").as("doc_id"))
      .unionByName(pos.join(pairs, col("pos_id") === col("doc_b"))
        .select(col("query_id"), col("doc_a").as("doc_id")))
      .unionByName(pos.select(col("query_id"), col("pos_id").as("doc_id")))
      .distinct()
    val w = Window.partitionBy(col("query_id")).orderBy(col("rn"))
    pool.join(excl, Seq("query_id", "doc_id"), "left_anti")
      .withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= 5)
      .select(col("query_id"), col("doc_id"), col("score"), col("neg_rank"))
      .orderBy(col("query_id"), col("neg_rank"))
  }

  /** The q101 pipeline's CTE block WITHOUT the leading WITH / final
    * SELECT, so [[Similarity.q107Sql]] can reuse the identical sparse
    * channel (one source of truth — a drifted copy would silently
    * verify two different BM25s). Ends with CTE `ranked`. */
  val bm25Ctes: String =
    raw"""queries(query_id, qtext) AS (
      |  VALUES (1, 'dup merge scan'), (2, 'spark window agg'),
      |         (3, 'fast hash join key')),
      |qterms AS (SELECT DISTINCT query_id,
      |                  unnest(${Tok.spSql("qtext")}) AS term FROM queries),
      |docs AS (SELECT doc_id, ${Tok.spSql("text")} AS toks FROM documents),
      |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM docs),
      |stats AS (SELECT COUNT(*) AS n, SUM(dl) AS sumdl FROM dl),
      |tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf
      |  FROM (SELECT doc_id, unnest(toks) AS term FROM docs)
      |  WHERE term IN (SELECT term FROM qterms) GROUP BY 1, 2),
      |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |contrib AS (
      |  SELECT q.query_id, t.doc_id,
      |    CAST(ROUND(LN((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
      |      * (t.tf * 2.2)
      |      / (t.tf + 1.2 * (0.25 + 0.75 * l.dl / (CAST(s.sumdl AS DOUBLE) / s.n)))
      |      * 1000000.0) AS BIGINT) AS contrib_u
      |  FROM tf t JOIN qterms q USING (term) JOIN dfreq d USING (term)
      |       JOIN dl l USING (doc_id) CROSS JOIN stats s),
      |scored AS (SELECT query_id, doc_id, SUM(contrib_u) / 1000000.0 AS score
      |           FROM contrib GROUP BY 1, 2),
      |ranked AS (SELECT query_id, doc_id, score,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |                       ORDER BY score DESC, doc_id) AS rn
      |  FROM scored)""".stripMargin

  val q101Sql: String =
    s"""WITH $bm25Ctes
      |SELECT query_id, doc_id, score, CAST(rn AS INTEGER) AS rn
      |FROM ranked WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin

  /** DuckDB replay of q117: [[bm25Ctes]] verbatim for the ranking and
    * [[Dedup.pairCtes]] verbatim for the near-dup exclusion (the exact
    * all-pairs form proven equal to the LSH pipeline on these corpora)
    * — positives, exclusions, and the re-rank all recomputed. */
  val q117Sql: String =
    s"""WITH $bm25Ctes,
      |${Dedup.pairCtes},
      |vp AS (SELECT doc_a, doc_b FROM p WHERE jaccard >= 0.5),
      |pos AS (SELECT query_id, doc_id AS pos_id FROM ranked WHERE rn = 1),
      |excl AS (
      |  SELECT query_id, pos_id AS doc_id FROM pos
      |  UNION
      |  SELECT pos.query_id, vp.doc_b FROM pos JOIN vp ON vp.doc_a = pos.pos_id
      |  UNION
      |  SELECT pos.query_id, vp.doc_a FROM pos JOIN vp ON vp.doc_b = pos.pos_id),
      |cand AS (
      |  SELECT r.query_id, r.doc_id, r.score, r.rn
      |  FROM ranked r LEFT JOIN excl e USING (query_id, doc_id)
      |  WHERE r.rn <= 20 AND e.doc_id IS NULL),
      |neg AS (SELECT query_id, doc_id, score,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rn) AS neg_rank
      |  FROM cand)
      |SELECT query_id, doc_id, score, CAST(neg_rank AS INTEGER) AS neg_rank
      |FROM neg WHERE neg_rank <= 5 ORDER BY query_id, neg_rank""".stripMargin

  /** BPE vocabulary induction, the measurement round (q112): the
    * adjacent-symbol pair frequencies a byte-pair-encoding tokenizer
    * trainer computes to pick its next merge (Sennrich et al. 2016 —
    * the algorithm behind GPT/Llama tokenizers). Corpus text reduces to
    * a WEIGHTED DISTINCT VOCABULARY first (word → occurrence count),
    * and all pair work runs over that vocab with counts as weights —
    * exactly how production trainers (SentencePiece, HF tokenizers)
    * make BPE tractable: at sf0.001 the corpus's 27,939 token
    * occurrences collapse to a 31-word vocab before the first pair is
    * enumerated, and at 100 TB the vocab table is still only
    * O(distinct words) — millions of rows, kilobytes per row — while
    * the corpus is petabytes.
    *
    * Plan shape: one token-count aggregation (map-side combined; the
    * only corpus-sized shuffle, and it shuffles (word, partial-count)
    * pairs, never text) → a vocab-sized map-only pair explode → one
    * tiny keyed weighted sum → global top-25 via TakeOrdered. Ordering
    * is fully deterministic (count desc, then both symbols), so the
    * LIMIT boundary cannot diverge between engines. */
  def q112BpePairs(s: SparkSession, dir: String): DataFrame = {
    val vocab = Tables.documents(s, dir)
      .select(explode(Tok.ws(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wf"))
    // split(w, '') yields code points (same convention the q61 oracle
    // verified against DuckDB's regexp_extract_all(w, '(?s).'))
    val pairs = vocab
      .select(col("wf"), split(col("w"), "").as("cs"))
      .filter(size(col("cs")) >= 2)
      .select(col("wf"), explode(expr(
        "transform(sequence(1, size(cs) - 1), i -> " +
          "struct(element_at(cs, i) AS a, element_at(cs, i + 1) AS b))"))
        .as("p"))
    pairs.groupBy(col("p.a").as("sym_a"), col("p.b").as("sym_b"))
      .agg(sum(col("wf")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("sym_a"), col("sym_b"))
      .limit(25)
  }

  /** BPE tokenizer TRAINING (q114: the 3-round oracle instance of the
    * N-merge [[trainBpeChain]] loop) — the full Sennrich et al. 2016
    * loop that q112's measurement round
    * feeds: each round counts adjacent-symbol pair frequencies over the
    * weighted vocab, picks the top pair (count desc, then both symbols
    * — fully deterministic), and APPLIES the merge to every vocab entry
    * before the next round counts again. Merge application is the
    * greedy leftmost-first fold BPE prescribes, expressed as a
    * higher-order `aggregate` over the symbol list: the accumulator is
    * the rebuilt U+001F-delimited symbol string, and a symbol merges
    * exactly when the accumulator's ENTIRE last symbol equals the
    * merge's left side (the delimiter-anchored endswith test) and the
    * incoming symbol is the right side — so "a a a" under (a,a) becomes
    * "aa a", never "a aa". Emits the learned merge table.
    *
    * Scale shape: identical to q112 — one corpus-sized token-count
    * shuffle builds the weighted vocab ONCE (localCheckpointed, the
    * q108/q113 pattern: rounds re-derive from the checkpoint, not the
    * corpus), then every round is pair-explode + keyed weighted sum +
    * global top-1 over O(|vocab|) rows. Real trainers (SentencePiece,
    * HF tokenizers) scale exactly this way: corpus → weighted vocab →
    * iterate on the vocab. The merge fold is deterministic and
    * engine-neutral, so the DuckDB oracle replays ALL THREE rounds —
    * application included — via the same unrolled-CTE recipe as q57's
    * Lloyd's replay. */
  // the BPE symbol delimiter: never in the corpus (verified all 3
  // SFs); the catalog's own component separator
  private val BpeD = "\u001f"

  /** Greedy leftmost-first application of ONE merge (ma, mb) to a
    * [[BpeD]]-delimited symbol string — the accumulator fold described
    * in [[q114BpeTrain]]'s Scaladoc. A symbol merges exactly when the
    * accumulator's ENTIRE last symbol equals `ma` (the delimiter-
    * anchored endswith test) and the incoming symbol is `mb`; the
    * freshly merged symbol never re-merges within the same pass.
    * Factored out so the property suite can drive it on adversarial
    * token lists (prefix-confusable symbols) against the canonical
    * trainer. */
  private[graft] def mergeFoldExpr(ts: Column, ma: Column, mb: Column): Column =
    substring(aggregate(split(ts, BpeD), lit(""),
      (acc, x) => when(acc.endsWith(concat(lit(BpeD), ma))
          && x === mb, concat(acc, x))
        .otherwise(concat(acc, lit(BpeD), x))),
      2, Integer.MAX_VALUE)

  /** The [[BpeD]] delimiter, visible to the property suite. */
  private[graft] def bpeDelimiter: String = BpeD

  // one trained chain per (session, sfDir) — the same artifact memo
  // discipline as AnnIndex/the band index: a tokenizer is a pipeline
  // artifact, so q114/q115 (and a bench pass running both) must not
  // re-train it per query
  private val bpeChainMemo =
    new graft.SessionMemo[(Seq[DataFrame], DataFrame)]

  /** The shared 3-round training chain: returns each round's learned
    * merge (1-row frames) and the post-merge vocab (w, ts, wf) after
    * every round — q114 reads the merges, q115 encodes with the final
    * vocab. The weighted vocab is built from the corpus ONCE and
    * localCheckpointed; all rounds derive from the checkpoint. */
  private def bpeTrainChain(s: SparkSession, dir: String)
      : (Seq[DataFrame], DataFrame) =
    bpeChainMemo.getOrBuild(s, dir)(trainBpeChain(s, dir, 3))

  /** BPE training generalized to N merges at O(1) plan depth per round
    * (the q67 loop discipline): each round's 1-row merge AND the merged
    * vocab are localCheckpoint-truncated, so round r's plan is always
    * [vocab RDD] → pair explode → keyed sum → top-1 → fold — constant
    * size, never r nested crossJoins — and real vocabularies (10k-50k
    * merges) train with flat analysis cost and ZERO corpus rescans
    * (only the initial vocab reduction touches parquet; PlanSpec gates
    * this at 100 merges). Training stops early if the vocab exhausts
    * (every word a single symbol) before `rounds` merges exist — the
    * returned merge list is exactly the learnable prefix. The 3-round
    * instance is the oracle-replayed q114 chain. */
  private[graft] def trainBpeChain(s: SparkSession, dir: String, rounds: Int)
      : (Seq[DataFrame], DataFrame) = {
    val D = BpeD
    val vocab0 = Tables.documents(s, dir)
      .select(explode(Tok.ws(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wf"))
      .select(col("w"), concat_ws(D, split(col("w"), "")).as("ts"), col("wf"))
      .localCheckpoint()
    def pairCounts(v: DataFrame): DataFrame = v
      .select(col("wf"), split(col("ts"), D).as("cs"))
      .filter(size(col("cs")) >= 2)
      .select(col("wf"), explode(expr(
        "transform(sequence(1, size(cs) - 1), i -> " +
          "struct(element_at(cs, i) AS a, element_at(cs, i + 1) AS b))"))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("wf")).as("cnt"))
    def top1(pc: DataFrame): DataFrame =
      pc.orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
    var v = vocab0
    val merges = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      val m = top1(pairCounts(v)).localCheckpoint()
      if (m.isEmpty) exhausted = true
      else {
        val withM = v.crossJoin(broadcast(
          m.select(col("a").as("ma"), col("b").as("mb"))))
        v = withM.select(col("w"),
          mergeFoldExpr(col("ts"), col("ma"), col("mb")).as("ts"), col("wf"))
          .localCheckpoint()
        merges += m
        r += 1
      }
    }
    (merges.toSeq, v)
  }

  def q114BpeTrain(s: SparkSession, dir: String): DataFrame = {
    val (merges, _) = bpeTrainChain(s, dir)
    merges.zipWithIndex.map { case (m, i) =>
      m.select(lit(i + 1).as("round"), col("a").as("sym_a"),
        col("b").as("sym_b"), col("cnt").as("pair_count"))
    }.reduce(_.unionByName(_)).orderBy(col("round"))
  }

  /** Tokenizer APPLICATION + fertility report (q115): encode the corpus
    * with the q114-trained merges and report, per source, the
    * whitespace-token count, the encoded BPE-symbol count, and their
    * ratio (symbols per word — the "fertility" metric tokenizer teams
    * track per language/domain when choosing a vocabulary).
    *
    * Scale shape — encode cost amortizes over DISTINCT words: each
    * vocab entry is encoded ONCE (the training chain's final vocab IS
    * the encoded form), per-(source, word) occurrence counts are the
    * only corpus-sized shuffle (small key rows, text never moves), and
    * the symbol counts arrive by a vocab-keyed join — the encoded
    * length of "the" is not recomputed ten billion times. */
  def q115BpeEncode(s: SparkSession, dir: String): DataFrame = {
    val (_, vFinal) = bpeTrainChain(s, dir)
    val encoded = vFinal
      .select(col("w"), size(split(col("ts"), BpeD)).cast("long").as("n_syms"))
    val perSW = Tables.documents(s, dir)
      .select(col("source"),
        explode(Tok.ws(col("text"))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("cnt"))
    perSW.join(encoded, Seq("w"))
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("ws_tokens"),
        sum(col("cnt") * col("n_syms")).as("bpe_symbols"))
      .withColumn("fertility6",
        round(col("bpe_symbols") * 1.0 / col("ws_tokens"), 6))
      .orderBy(col("source"))
  }

  /** The unrolled 3-round training CTE block (the q57 Lloyd's-replay
    * recipe), WITHOUT the leading WITH / final SELECT — shared verbatim
    * by q114's and q115's oracles (one source of truth): identical
    * vocab reduction, pair counting, top-1 tiebreaks, and the same
    * delimiter-anchored list_reduce merge fold the Spark side runs.
    * Ends with `m1..m3` (the merges) and `v3` (the encoded vocab). */
  private val bpeCtes: String = {
    def pc(i: Int): String =
      s"""pc$i AS (
        |  SELECT p.a AS a, p.b AS b, CAST(SUM(wf) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(list_transform(range(1, len(cs)),
        |               j -> {'a': cs[j], 'b': cs[j+1]})) AS p, wf
        |        FROM (SELECT string_split(ts, chr(31)) AS cs, wf FROM v${i - 1})
        |        WHERE len(cs) >= 2)
        |  GROUP BY 1, 2),
        |m$i AS (SELECT a, b, cnt FROM pc$i ORDER BY cnt DESC, a, b LIMIT 1)"""
        .stripMargin
    def vn(i: Int): String =
      s"""v$i AS (
        |  SELECT v.w,
        |    substr(list_reduce(list_prepend('', string_split(v.ts, chr(31))),
        |    (acc, x) -> CASE WHEN ends_with(acc, chr(31) || m.a) AND x = m.b
        |                THEN acc || x ELSE acc || chr(31) || x END), 2) AS ts,
        |    v.wf
        |  FROM v${i - 1} v CROSS JOIN m$i m)""".stripMargin
    s"""tok AS (
      |  SELECT unnest(${Tok.wsSql("text")}) AS w
      |  FROM documents),
      |vocab AS (SELECT w, COUNT(*) AS wf FROM tok GROUP BY w),
      |v0 AS (SELECT w, array_to_string(regexp_extract_all(w, '(?s).'), chr(31)) AS ts, wf
      |       FROM vocab),
      |${pc(1)},
      |${vn(1)},
      |${pc(2)},
      |${vn(2)},
      |${pc(3)},
      |${vn(3)}""".stripMargin
  }

  /** DuckDB replay of q114 — all three rounds unrolled ([[bpeCtes]]). */
  val q114Sql: String =
    s"""WITH $bpeCtes
      |SELECT CAST(1 AS INTEGER) AS round, a AS sym_a, b AS sym_b,
      |       cnt AS pair_count FROM m1
      |UNION ALL SELECT 2, a, b, cnt FROM m2
      |UNION ALL SELECT 3, a, b, cnt FROM m3
      |ORDER BY round""".stripMargin

  /** DuckDB replay of q115: [[bpeCtes]] verbatim, then the per-word
    * encoded symbol counts (v3 IS the encoded vocab) joined to
    * per-(source, word) occurrence counts. */
  val q115Sql: String =
    s"""WITH $bpeCtes,
      |enc AS (SELECT w, CAST(len(string_split(ts, chr(31))) AS BIGINT) AS n_syms
      |        FROM v3),
      |sw AS (
      |  SELECT source, w, COUNT(*) AS cnt
      |  FROM (SELECT source, unnest(${Tok.wsSql("text")}) AS w
      |        FROM documents)
      |  GROUP BY 1, 2)
      |SELECT source,
      |  CAST(SUM(cnt) AS BIGINT) AS ws_tokens,
      |  CAST(SUM(cnt * n_syms) AS BIGINT) AS bpe_symbols,
      |  ROUND(SUM(cnt * n_syms) * 1.0 / SUM(cnt), 6) AS fertility6
      |FROM sw JOIN enc USING (w)
      |GROUP BY source ORDER BY source""".stripMargin

  /** DuckDB replay of q112: the identical vocab reduction and 1-based
    * adjacent pairing (`range(1, len)` = Spark's `sequence(1, size-1)`;
    * both engines index lists from 1 and split to code points). */
  val q112Sql: String =
    raw"""WITH tok AS (
      |  SELECT unnest(${Tok.wsSql("text")}) AS w
      |  FROM documents),
      |vocab AS (SELECT w, COUNT(*) AS wf FROM tok GROUP BY w),
      |chars AS (SELECT wf, regexp_extract_all(w, '(?s).') AS cs FROM vocab),
      |prs AS (
      |  SELECT unnest(list_transform(range(1, len(cs)),
      |           i -> {'a': cs[i], 'b': cs[i+1]})) AS p, wf
      |  FROM chars WHERE len(cs) >= 2)
      |SELECT p.a AS sym_a, p.b AS sym_b, CAST(SUM(wf) AS BIGINT) AS pair_count
      |FROM prs GROUP BY 1, 2
      |ORDER BY pair_count DESC, sym_a, sym_b LIMIT 25""".stripMargin

  /** Per-source boilerplate n-gram mining (q121) — the top-5 5-grams
    * of each source by DOCUMENT frequency with their doc-share: the
    * report a curator reads to discover templated headers, license
    * blocks, and nav spam worth stripping source-wide (the discovery
    * step that feeds rules like q97's span removal; document frequency
    * rather than raw occurrences, so one spammy document can't promote
    * its own refrain). df_share6's denominator is ALL documents of the
    * source — including those under 5 tokens, which cannot form a
    * 5-gram — so the share reads as "fraction of the source's corpus
    * carrying this gram", slightly understating the share among
    * gram-eligible documents for sources with many short docs (the
    * oracle computes the identical ratio).
    *
    * Scale shape: gram formation AND within-document dedup are
    * map-only array ops (transform + array_distinct before the
    * explode — one doc contributes each gram once without a
    * doc-keyed shuffle); (source, gram) doc-frequency is one map-side
    * combined aggregation. The top-5 selection deliberately does NOT
    * window by source alone — gram cardinality per source is
    * corpus-scale, and a |sources|-key window funnels it through one
    * task (the q76 lesson) — instead grams first bucket by hash into
    * 32 shards, a (source, shard)-keyed window keeps each shard's
    * top 5 (bounded partitions), and the final window ranks the
    * surviving 160 rows per source. The shard hash never reaches the
    * output, so any partition of grams yields the same answer and the
    * DuckDB replay is a plain one-window top-5. */
  def q121Boilerplate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        Tok.ws(col("text")).as("t"))
      .filter(size(col("t")) >= 5)
    val grams = docs.select(col("source"), explode(array_distinct(expr(
      "transform(sequence(1, size(t) - 4), i -> concat_ws(' ', " +
        "element_at(t, i), element_at(t, i + 1), element_at(t, i + 2), " +
        "element_at(t, i + 3), element_at(t, i + 4)))"))).as("gram"))
    val df = grams.groupBy(col("source"), col("gram"))
      .agg(count(lit(1)).as("df"))
    val nd = Tables.documents(s, dir).groupBy(col("source"))
      .agg(count(lit(1)).as("nd"))
    val sharded = df.withColumn("shard", pmod(xxhash64(col("gram")), lit(32L)))
    val wShard = Window.partitionBy(col("source"), col("shard"))
      .orderBy(col("df").desc, col("gram"))
    val wFinal = Window.partitionBy(col("source"))
      .orderBy(col("df").desc, col("gram"))
    sharded.withColumn("r1", row_number().over(wShard)).filter(col("r1") <= 5)
      .withColumn("rn", row_number().over(wFinal).cast("int"))
      .filter(col("rn") <= 5)
      .join(broadcast(nd), Seq("source"))
      .select(col("source"), col("rn"), col("gram"), col("df"),
        round(col("df") * 1.0 / col("nd"), 6).as("df_share6"))
      .orderBy(col("source"), col("rn"))
  }

  /** DuckDB replay of q121: identical gram formation (1-based list
    * slicing, within-doc list_distinct), document-frequency counts,
    * and the same (df desc, gram) tiebroken top-5 — the Spark side's
    * shard pre-pass is invisible to the result. */
  val q121Sql: String =
    raw"""WITH d AS (
      |  SELECT doc_id, source,
      |    ${Tok.wsSql("text")} AS t
      |  FROM documents),
      |g AS (
      |  SELECT source, UNNEST(list_distinct(list_transform(
      |    range(1, len(t) - 3),
      |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
      |      || ' ' || t[i+4]))) AS gram
      |  FROM d WHERE len(t) >= 5),
      |df AS (SELECT source, gram, COUNT(*) AS df FROM g GROUP BY 1, 2),
      |nd AS (SELECT source, COUNT(*) AS nd FROM documents GROUP BY 1),
      |r AS (
      |  SELECT source, gram, df,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY df DESC, gram) AS INTEGER) AS rn
      |  FROM df)
      |SELECT source, rn, gram, df,
      |  ROUND(df * 1.0 / nd, 6) AS df_share6
      |FROM r JOIN nd USING (source)
      |WHERE rn <= 5 ORDER BY source, rn""".stripMargin

  /** Per-language Zipf fit (q133) — the corpus-health diagnostic a
    * dataset card reports: least-squares slope of ln(frequency) vs
    * ln(rank) over each language's top-100 vocabulary, with the fit's
    * R². Natural language sits near slope −1 (Zipf's law); a slope
    * far off — or a poor fit — flags machine-generated spam, template
    * floods, or a broken tokenizer for that slice.
    *
    * Determinism: ln(rank) and ln(frequency) round ONCE to integer
    * micro-units; all five regression sums are LONG sums over ≤100
    * rows per language (order-free); slope and R² are single double
    * divisions of products of those longs (identical IEEE both
    * engines; magnitudes stay under 2⁶³ for corpus frequencies up to
    * ~10¹² tokens). Ranks tiebreak on (frequency desc, word).
    *
    * Scale shape: the (lang, word) frequency aggregation is map-side
    * combined and vocabulary-bounded; the top-100 selection reuses
    * q121's shard-then-rank shape — a (lang, hash-shard) window
    * bounds every partition, then the final window ranks ≤ 32×100
    * surviving rows per language — never a |languages|-key window
    * over the full vocabulary (the q76 funnel). The regression is a
    * |languages|-key aggregation over ≤100 rows each. */
  def q133ZipfFit(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vocab = Tables.documents(s, dir)
      .select(col("lang"),
        explode(Tok.ws(col("text"))).as("w"))
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("f"))
      .localCheckpoint() // feeds the type count AND the top-100 rank
    val nTypes = vocab.groupBy(col("lang")).agg(count(lit(1)).as("n_types"))
    val wShard = Window.partitionBy(col("lang"),
        pmod(xxhash64(col("w")), lit(32L)))
      .orderBy(col("f").desc, col("w"))
    val wFinal = Window.partitionBy(col("lang"))
      .orderBy(col("f").desc, col("w"))
    val top = vocab.withColumn("r1", row_number().over(wShard))
      .filter(col("r1") <= 100)
      .withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= 100)
    val terms = top.select(col("lang"),
      round(log(col("rank")) * lit(1000000.0)).cast("long").as("xu"),
      round(log(col("f")) * lit(1000000.0)).cast("long").as("yu"))
    terms.groupBy(col("lang"))
      .agg(count(lit(1)).as("k"),
        sum(col("xu")).as("sx"), sum(col("yu")).as("sy"),
        sum(col("xu") * col("yu")).as("sxy"),
        sum(col("xu") * col("xu")).as("sxx"),
        sum(col("yu") * col("yu")).as("syy"))
      .filter(col("k") >= 2) // a 1-type language has no rank spread
      .withColumn("num", col("k") * col("sxy") - col("sx") * col("sy"))
      .withColumn("denx", col("k") * col("sxx") - col("sx") * col("sx"))
      .withColumn("deny", col("k") * col("syy") - col("sy") * col("sy"))
      .join(nTypes, Seq("lang"))
      .select(col("lang"), col("n_types"), col("k").cast("int").as("k"),
        round(col("num").cast("double") / col("denx").cast("double"), 6)
          .as("zipf_slope6"),
        when(col("deny") > 0,
          round(col("num").cast("double") * col("num").cast("double") /
            (col("denx").cast("double") * col("deny").cast("double")), 6))
          .as("r2_6"))
      .orderBy(col("lang"))
  }

  /** DuckDB replay of q133: identical tokenization, top-100 ranks with
    * the same tiebreak (a plain window — the oracle need not shard),
    * the same once-rounded micro-unit logs, long regression sums, and
    * the same double divisions. */
  val q133Sql: String =
    raw"""WITH vocab AS (
      |  SELECT lang, w, COUNT(*) AS f
      |  FROM (SELECT lang, UNNEST(${Tok.wsSql("text")}) AS w
      |        FROM documents)
      |  GROUP BY 1, 2),
      |nt AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_types FROM vocab GROUP BY 1),
      |top AS (
      |  SELECT lang, f, rank FROM (
      |    SELECT lang, f,
      |      ROW_NUMBER() OVER (PARTITION BY lang ORDER BY f DESC, w) AS rank
      |    FROM vocab) WHERE rank <= 100),
      |terms AS (
      |  SELECT lang,
      |    CAST(ROUND(LN(rank) * 1000000.0) AS BIGINT) AS xu,
      |    CAST(ROUND(LN(f) * 1000000.0) AS BIGINT) AS yu
      |  FROM top),
      |reg AS (
      |  SELECT lang, COUNT(*) AS k,
      |    SUM(xu) AS sx, SUM(yu) AS sy, SUM(xu * yu) AS sxy,
      |    SUM(xu * xu) AS sxx, SUM(yu * yu) AS syy
      |  FROM terms GROUP BY 1 HAVING COUNT(*) >= 2),
      |fit AS (
      |  SELECT lang, k,
      |    k * sxy - sx * sy AS num,
      |    k * sxx - sx * sx AS denx,
      |    k * syy - sy * sy AS deny
      |  FROM reg)
      |SELECT lang, n_types, CAST(k AS INTEGER) AS k,
      |  ROUND(CAST(num AS DOUBLE) / CAST(denx AS DOUBLE), 6) AS zipf_slope6,
      |  CASE WHEN deny > 0 THEN
      |    ROUND(CAST(num AS DOUBLE) * CAST(num AS DOUBLE) /
      |      (CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE)), 6)
      |  END AS r2_6
      |FROM fit JOIN nt USING (lang) ORDER BY lang""".stripMargin

  /** Per-document n-gram novelty audit (q134) — the memorization /
    * copy-risk signal a training-data release reports: for every
    * document (≥ 8 tokens), the share of its distinct 8-grams that
    * appear in NO other document (novelty), plus the document
    * frequency of its most widespread 8-gram (how viral its most
    * viral phrase is). Low novelty means the document is largely
    * assembled from corpus-common text — template floods, mirrored
    * articles, license blocks — exactly the content that inflates
    * memorization; the 8-token window is the overlap unit
    * deduplication and eval-contamination literature standardizes on.
    *
    * Scale shape: gram formation, 64-bit hashing, and within-doc
    * dedup are one map-only kernel pass (q79's `shingleKernel(·, 8)` —
    * this op's gram former); the gram-df aggregation and the
    * (doc, gram)⋈df join shuffle 8-BYTE HASH KEYS with map-side
    * combine, never gram text (the q54/q79 hash-for-exactness
    * precedent: df over hashes ≡ df over strings modulo 64-bit
    * collision odds), so a viral gram — a license block in 100M
    * docs — rides one long key, not 100M copies of its text;
    * everything after is ids and counts. No windows; per-doc
    * aggregation is map-side combined. */
  def q134NoveltyAudit(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .filter(size(Tok.ws(col("text"))) >= 8)
      .select(col("doc_id"), col("text"))
    // map-only: recomputed for each consumer subtree rather than
    // pinning a corpus-scale gram frame (the q116 stage-0 decision);
    // the kernel distincts within-doc, so rows are (doc, gram-hash)
    def grams = docs.select(col("doc_id"),
      explode(Dedup.gram8HashUdf(col("text"))).as("gh"))
    val dfreq = grams.groupBy(col("gh")).agg(count(lit(1)).as("df"))
    grams.join(dfreq, Seq("gh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"),
        max(col("df")).as("max_df"))
      .select(col("doc_id"), col("n_grams"),
        round(col("n_unique") / col("n_grams"), 6).as("novelty6"),
        col("max_df"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB replay of q134 over STRING 8-grams: identical gram
    * formation (1-based inclusive slice), within-doc dedup, df, and
    * ratios — per-gram df over 64-bit hashes equals df over the
    * strings modulo hash collisions (the q54/q79 oracle convention). */
  val q134Sql: String =
    raw"""WITH d AS (
      |  SELECT doc_id, ${Tok.wsSql("text")} AS t
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, UNNEST(list_distinct(list_transform(
      |    range(1, len(t) - 6),
      |    i -> array_to_string(t[i:i+7], ' ')))) AS gram
      |  FROM d WHERE len(t) >= 8),
      |df AS (SELECT gram, COUNT(*) AS df FROM g GROUP BY 1)
      |SELECT doc_id, COUNT(*) AS n_grams,
      |  ROUND(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
      |    AS novelty6,
      |  CAST(MAX(df) AS BIGINT) AS max_df
      |FROM g JOIN df USING (gram)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Line-level cleaning (q128) — the RefinedWeb/CCNet line-wise
    * correction pass: drop lines that are navigation/counter spam
    * (fewer than 3 words, or mostly-uppercase shouting) and emit the
    * cleaned text with per-document removal stats. Complements q88
    * (line-level MEASUREMENT) and q98 (cross-document span removal):
    * this is the within-document structural cleanup that runs before
    * either. Map-only: the line split, the keep lambda, and the
    * re-join are all codegen'd array HOFs — no shuffle at all, the
    * embarrassingly-parallel shape line cleaning must have at 100 TB.
    * (The sf corpora are single-line, so the oracle covers the
    * degenerate pass-through; RetrievalCurationSpec drives multi-line
    * fixtures through the real rules.) */
  /** The q128 line-keep rule and its derived expressions — ONE source
    * of truth shared by q128 (the standalone audit), the batch funnel
    * (q116's stage 0 cleans BEFORE document-level filtering and dedup,
    * the RefinedWeb ordering) and the streaming funnel
    * ([[graft.llm.Curation.funnelIngestStream]]), so batch/stream/
    * audit rule parity cannot drift. All pure map-only array HOFs. */
  private[llm] def keptLinesExpr(text: Column): Column = {
    def nWords(l: Column) = size(Tok.ws(l))
    def upperRatio(l: Column) =
      length(regexp_replace(l, "[^A-Z]", "")) /
        greatest(lit(1.0), length(regexp_replace(l, "[^A-Za-z]", "")))
    filter(split(text, "\n"), l => nWords(l) >= 3 && upperRatio(l) <= 0.5)
  }
  private[llm] def cleanedTextExpr(text: Column): Column =
    array_join(keptLinesExpr(text), "\n")
  private[llm] def linesRemovedExpr(text: Column): Column =
    (size(split(text, "\n")) - size(keptLinesExpr(text))).cast("long")

  /** The DuckDB forms of the line-keep trio, over the `text` column of
    * the enclosing FROM — embedded verbatim in [[q128Sql]] and the
    * funnel oracle ([[graft.llm.Curation.q116Sql]]). */
  private[llm] val sqlKeptLinesExpr: String =
    raw"""list_filter(string_split(text, chr(10)), l ->
      |      len(${Tok.wsSql("l")}) >= 3
      |      AND LENGTH(regexp_replace(l, '[^A-Z]', '', 'g')) * 1.0 /
      |        GREATEST(1.0, LENGTH(regexp_replace(l, '[^A-Za-z]', '', 'g')))
      |        <= 0.5)""".stripMargin
  private[llm] val sqlCleanedTextExpr: String =
    s"array_to_string($sqlKeptLinesExpr, chr(10))"
  private[llm] val sqlLinesRemovedExpr: String =
    s"CAST(len(string_split(text, chr(10))) - len($sqlKeptLinesExpr) AS BIGINT)"

  def q128LineFilter(s: SparkSession, dir: String): DataFrame = {
    val lines = split(col("text"), "\n")
    val kept = keptLinesExpr(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(lines).cast("long").as("n_lines"),
        size(kept).cast("long").as("n_kept"),
        (length(col("text")) - length(array_join(kept, "\n")))
          .cast("long").as("chars_removed"),
        array_join(kept, "\n").as("text_clean"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB replay of q128: identical line split, word floor,
    * uppercase-ratio arithmetic, and re-join. */
  val q128Sql: String =
    s"""SELECT doc_id,
      |  CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
      |  CAST(len(kept) AS BIGINT) AS n_kept,
      |  CAST(LENGTH(text) - LENGTH(array_to_string(kept, chr(10))) AS BIGINT)
      |    AS chars_removed,
      |  array_to_string(kept, chr(10)) AS text_clean
      |FROM (
      |  SELECT doc_id, text,
      |    $sqlKeptLinesExpr AS kept
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** PMI collocations (q145) — the classic bigram-association mine
    * (Church & Hanks 1990) a corpus linguist (or a tokenizer-vocab
    * designer deciding which word pairs deserve merged tokens — the
    * q112/q114 BPE family's statistical cousin) runs first: which
    * adjacent word pairs co-occur far MORE than their unigram
    * frequencies predict? PMI(a,b) = ln(p(ab) / (p(a)·p(b))); since
    * ln is monotone, ranking by the RAW LIFT cnt_ab·N / (cnt_a·cnt_b)
    * is rank-identical — and lift, unlike PMI, is computable in EXACT
    * integer arithmetic: lift_u = (cnt_ab·N·10⁶) div (cnt_a·cnt_b),
    * one BIGINT truncating division, bit-equal across engines with no
    * ln rounding convention at all. Pairs below 5 occurrences are
    * noise-floored (the standard Church-Hanks guard: a hapax pair has
    * huge PMI and zero evidence); top-20 by (lift_u desc, pair text).
    *
    * Scale shape: bigram generation is a map-only index-zip over each
    * doc's token array (no self-join — adjacency is positional); the
    * bigram aggregation is the ONLY vocabulary²-bounded shuffle and
    * rides map-side combine (observed bigrams, not vocab² — Zipf makes
    * this ≪ n_tokens); unigram counts join by token (vocab-keyed, the
    * q127 class); N is a 1-row broadcast. Headroom: the numerator is
    * computed in DECIMAL(38,0) (DuckDB: HUGEINT), NOT int64 — with
    * ANSI off a long cnt_ab·N·10⁶ would silently WRAP once
    * cnt_ab·N > 9.2·10¹² (cnt_ab = 10⁴ at N = 10⁹ tokens already
    * does), corrupting rankings at exactly the corpus sizes this
    * engine targets. cnt·N·10⁶ < 10³¹ even at 10⁷ bigram count over
    * 10¹³ tokens, far inside decimal38; the quotient itself stays
    * int64 (max N·10⁶/5 under the cnt ≥ 5 floor at ≤ 10¹² tokens —
    * the documented ceiling for the emitted column). */
  def q145Collocations(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // deliberately NOT pinned: the tokenized corpus is LARGER than the
    // source parquet, and a localCheckpoint of it is a non-fault-
    // tolerant corpus-sized materialization (one lost executor kills
    // the query at 100 TB). The map-only tokenization recomputes per
    // consumer instead — two scan-bound passes beat one corpus pin.
    val toks = Tables.documents(s, dir)
      .select(Tok.sp(col("text")).as("w"))
    val uni = toks.select(explode(col("w")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("cnt_t"))
      .localCheckpoint() // VOCAB-sized; feeds both unigram joins AND the total
    val tot = uni.agg(sum(col("cnt_t")).as("n"))
    // adjacent pairs by position: 0-based array indexing in the SQL
    // expression — slice drops the last token, the lambda index i
    // addresses the successor
    val bg = toks.select(explode(expr(
        "transform(slice(w, 1, size(w) - 1), " +
          "(x, i) -> named_struct('a', x, 'b', w[i + 1]))"))
        .as("p"))
      .select(col("p.a").as("term_a"), col("p.b").as("term_b"))
      .groupBy(col("term_a"), col("term_b")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 5)
    val scored = bg
      .join(uni.select(col("t").as("term_a"), col("cnt_t").as("cnt_a")),
        Seq("term_a"))
      .join(uni.select(col("t").as("term_b"), col("cnt_t").as("cnt_b")),
        Seq("term_b"))
      .crossJoin(broadcast(tot))
      // `div`, not `/`: Spark's Divide is double division; div is the
      // truncating integral division the oracle's // mirrors exactly.
      // The numerator MUST be decimal: long·long wraps silently with
      // ANSI off (see the headroom note above)
      .withColumn("lift_u",
        expr("(cast(cnt as decimal(20,0)) * cast(n as decimal(20,0)) " +
          "* 1000000) div (cnt_a * cnt_b)"))
    // distributed TakeOrdered for the top-20, THEN rank the 20
    // survivors — a global row_number window over all scored bigrams
    // would funnel the frame through one task (the q119 lesson)
    scored.orderBy(col("lift_u").desc, col("term_a"), col("term_b"))
      .limit(20)
      .withColumn("rn", row_number().over(Window
        .orderBy(col("lift_u").desc, col("term_a"), col("term_b"))).cast("int"))
      .select(col("rn"), col("term_a"), col("term_b"), col("cnt"),
        col("lift_u"))
      .orderBy(col("rn"))
  }

  /** Windowed skip-gram collocations (q168) — q145's adjacency mine
    * widened to the window-w co-occurrence statistic SGNS/GloVe
    * training data is built from (Mikolov et al. 2013 use w = 5;
    * w = 3 here keeps the pair volume ≤ 3·tokens): every ORDERED pair
    * (a, b) with b at most 3 positions after a, ranked by the same
    * exact integer lift as q145 — (cnt_ab·N·10⁶) div (cnt_a·cnt_b),
    * rank-identical to PMI with no ln convention — under the same
    * cnt ≥ 5 hapax floor. Adjacent-only q145 finds fixed PHRASES;
    * the windowed statistic also surfaces loose associations
    * (subject…verb, entity…qualifier) that never sit adjacent — the
    * difference between a merged-token candidate list and an
    * embedding-training co-occurrence table.
    *
    * Scale shape: pair generation is a map-only positional
    * double-zip (never a self-join — the window rides the token
    * array); the pair aggregation is the only shuffle that can exceed
    * vocab size and it is ≤ 3·corpus-tokens rows with map-side
    * combine; unigram counts and N are the q145 frames verbatim;
    * DECIMAL numerator (the q145 headroom argument); distributed
    * TakeOrdered top-20, then the 20-row rank. */
  def q168SkipgramCollocations(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, dir)
      .select(Tok.sp(col("text")).as("w"))
    val uni = toks.select(explode(col("w")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("cnt_t"))
      .localCheckpoint() // VOCAB-sized; feeds both joins AND the total
    val tot = uni.agg(sum(col("cnt_t")).as("n"))
    // size ≥ 2 guard: Spark's sequence(1, 0) DESCENDS ([1, 0]) on a
    // single-token doc and would conjure null/self pairs the oracle's
    // empty range(1, 1) never emits
    val pairs = toks.filter(size(col("w")) >= 2)
      .select(explode(expr(
        "flatten(transform(sequence(1, size(w) - 1), i -> " +
          "transform(sequence(i + 1, least(i + 3, size(w))), j -> " +
          "named_struct('a', w[i - 1], 'b', w[j - 1]))))")).as("p"))
      .select(col("p.a").as("term_a"), col("p.b").as("term_b"))
      .groupBy(col("term_a"), col("term_b")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 5)
    val scored = pairs
      .join(uni.select(col("t").as("term_a"), col("cnt_t").as("cnt_a")),
        Seq("term_a"))
      .join(uni.select(col("t").as("term_b"), col("cnt_t").as("cnt_b")),
        Seq("term_b"))
      .crossJoin(broadcast(tot))
      .withColumn("lift_u",
        expr("(cast(cnt as decimal(20,0)) * cast(n as decimal(20,0)) " +
          "* 1000000) div (cnt_a * cnt_b)"))
    scored.orderBy(col("lift_u").desc, col("term_a"), col("term_b"))
      .limit(20)
      .withColumn("rn", row_number().over(Window
        .orderBy(col("lift_u").desc, col("term_a"), col("term_b"))).cast("int"))
      .select(col("rn"), col("term_a"), col("term_b"), col("cnt"),
        col("lift_u"))
      .orderBy(col("rn"))
  }

  /** DuckDB replay of q168: identical tokenization, the same windowed
    * positional double-zip, HUGEINT lift, same tiebreaks. */
  val q168Sql: String =
    s"""WITH w AS (SELECT ${Tok.spSql("text")} AS w FROM documents),
      |uni AS (
      |  SELECT t, CAST(COUNT(*) AS BIGINT) AS cnt_t
      |  FROM (SELECT UNNEST(w) AS t FROM w) GROUP BY 1),
      |tot AS (SELECT CAST(SUM(cnt_t) AS BIGINT) AS n FROM uni),
      |pg AS (
      |  SELECT UNNEST(flatten(list_transform(range(1, len(w)), i ->
      |    list_transform(range(i + 1, least(i + 3, len(w)) + 1), j ->
      |      {'a': w[i], 'b': w[j]})))) AS p
      |  FROM w),
      |bg AS (
      |  SELECT p.a AS term_a, p.b AS term_b, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM pg GROUP BY 1, 2 HAVING COUNT(*) >= 5),
      |sc AS (
      |  SELECT bg.term_a, bg.term_b, bg.cnt,
      |    CAST((CAST(bg.cnt AS HUGEINT) * t.n * 1000000)
      |      // (ua.cnt_t * ub.cnt_t) AS BIGINT) AS lift_u
      |  FROM bg JOIN uni ua ON ua.t = bg.term_a
      |  JOIN uni ub ON ub.t = bg.term_b, tot t)
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY lift_u DESC, term_a, term_b)
      |    AS INTEGER) AS rn,
      |  term_a, term_b, cnt, lift_u
      |FROM sc QUALIFY rn <= 20 ORDER BY rn""".stripMargin

  /** DuckDB replay of q145: identical tokenization, positional bigram
    * zip, the same BIGINT truncating division (// in DuckDB), same
    * tiebreaks. */
  val q145Sql: String =
    raw"""WITH w AS (SELECT ${Tok.spSql("text")} AS w FROM documents),
      |uni AS (
      |  SELECT t, CAST(COUNT(*) AS BIGINT) AS cnt_t
      |  FROM (SELECT UNNEST(w) AS t FROM w) GROUP BY 1),
      |tot AS (SELECT CAST(SUM(cnt_t) AS BIGINT) AS n FROM uni),
      |bg AS (
      |  SELECT term_a, term_b, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
      |    SELECT UNNEST(list_transform(range(1, len(w)), i -> w[i])) AS term_a,
      |           UNNEST(list_transform(range(1, len(w)), i -> w[i + 1])) AS term_b
      |    FROM w)
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 5),
      |sc AS (
      |  SELECT bg.term_a, bg.term_b, bg.cnt,
      |    CAST((CAST(bg.cnt AS HUGEINT) * t.n * 1000000)
      |      // (ua.cnt_t * ub.cnt_t) AS BIGINT) AS lift_u
      |  FROM bg JOIN uni ua ON ua.t = bg.term_a
      |  JOIN uni ub ON ub.t = bg.term_b, tot t)
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY lift_u DESC, term_a, term_b)
      |    AS INTEGER) AS rn,
      |  term_a, term_b, cnt, lift_u
      |FROM sc QUALIFY rn <= 20 ORDER BY rn""".stripMargin

  /** Per-document tf·idf keywords served from the inverted index
    * (q147) — the doc-summary surface a curation UI shows next to
    * every document (and the feature a keyword-based router eats):
    * for EVERY corpus document, its top-3 terms by tf·idf with
    * idf_u = round(ln(N/df)·10⁶) (the q137 micro-unit ln convention)
    * and score_u = tf·idf_u — an exact integer product, so ranking
    * and emitted scores are engine-portable.
    *
    * Scale shape: served from the MAINTAINED `doc_keywords` artifact
    * (PlanSpec gates zero parquet scans and zero per-read scoring):
    * [[ensureBm25Index]] seeds the table from the postings it just
    * wrote ([[keywordsOf]] — tf on postings rows, term-keyed df, N
    * from the stats ledger), and the maintainers re-price exactly the
    * docs each batch touches ([[repriceKeywords]]); a curation UI
    * reads 3 rows by id instead of re-pricing the corpus per read (the
    * r13/r14 verdict ask). Staleness contract: an untouched doc's rows
    * keep the (N, df) pricing of its last (re)index — the rd-lag
    * class, converging at rebuild. */
  def q147DocKeywords(s: SparkSession, dir: String): DataFrame = {
    val pfx = ensureBm25Index(s, dir)
    s.table(s"$pfx.doc_keywords")
      .select(col("doc_id"), col("rn"), col("term"), col("tf"),
        col("score_u"))
      .orderBy(col("doc_id"), col("rn"))
  }

  /** The tf·idf keyword scoring core — top-3 terms per document from
    * explicit (doc_id, term, tf), (term, df), and 1-row (n) frames —
    * shared by the offline `doc_keywords` build and the maintainers'
    * per-batch repricing ([[repriceKeywords]]) so the persisted rows
    * and a fresh recompute can never disagree on arithmetic. The
    * window partitions by doc_id — bounded by a doc's distinct-term
    * count, never the corpus. */
  private def keywordsOf(tf: DataFrame, dfreq: DataFrame,
                         n: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_u").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("idf_u", round(log(col("n") / col("df")) * 1e6).cast("long"))
      .withColumn("score_u", col("tf") * col("idf_u"))
      .withColumn("rn", row_number().over(w).cast("int"))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("rn"), col("term"), col("tf"),
        col("score_u"))
  }

  /** The `doc_keywords` table FQN implied by a postings FQN — same
    * namespace, fixed name — so the maintainers can adopt the keyword
    * artifact without signature churn: an index whose namespace never
    * created the table (pre-keyword builds, the band/pair test
    * fixtures) is maintained exactly as before. */
  private def keywordsFqnOf(postingsFqn: String): String =
    postingsFqn.split('.').init.mkString(".") + ".doc_keywords"

  /** Re-price the keyword rows of `ids` under the CURRENT index state
    * — the maintenance primitive behind keywords-as-artifact: a doc's
    * top-3 changes exactly when the doc itself is (re)indexed or
    * departs, so the maintainers call this with each batch's touched
    * ids (O(touched) output rows). Idempotent by construction — a pure
    * state function of (postings, stats) at run time, the refreshRdFor
    * recipe: MERGE-delete the touched rows, insert the fresh top-3 of
    * ids still indexed (departed docs simply have no postings and stay
    * deleted); replays converge without a fence.
    *
    * Staleness contract (documented, the rd-lag class): rows of
    * UNTOUCHED docs keep the (N, df) pricing of their last (re)index —
    * a global repricing per batch would be a full-index job. The df
    * lookup joins postings term-keyed (index-sized scan of ids+counts,
    * never corpus text); a `term_df` delta ledger is the declared next
    * increment if maintenance cadence ever demands true O(batch). */
  private def repriceKeywords(s: SparkSession, ids: DataFrame,
                              postingsFqn: String,
                              statsFqn: String): Unit = {
    val kwFqn = keywordsFqnOf(postingsFqn)
    if (!s.catalog.tableExists(kwFqn)) return
    val post = s.table(postingsFqn)
      .select(col("term"), col("doc_id"), col("tf"))
    val mine = post.join(ids.select(col("doc_id")).distinct(),
      Seq("doc_id"), "left_semi").localCheckpoint()
    val dfreq = post.join(mine.select(col("term")).distinct(),
        Seq("term"), "left_semi")
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = s.table(statsFqn)
      .agg(coalesce(sum(col("n_delta")), lit(0L)).as("n"))
    val fresh = keywordsOf(mine, dfreq, n).localCheckpoint()
    val bs = ids.sparkSession
    val dv = "graft_kw_del_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    ids.select(col("doc_id")).distinct().createOrReplaceTempView(dv)
    try bs.sql(s"MERGE INTO $kwFqn x USING $dv d ON x.doc_id = d.doc_id " +
      "WHEN MATCHED THEN DELETE")
    finally bs.catalog.dropTempView(dv)
    fresh.writeTo(kwFqn).append()
  }

  /** DuckDB replay of q147 from the raw corpus: same tokenization as
    * the postings build, identical tf/df/N, the same micro-unit ln —
    * a hash match proves the index serves exactly what a fresh corpus
    * scan would say. */
  val q147Sql: String =
    raw"""WITH tk AS (
      |  SELECT doc_id, UNNEST(${Tok.spSql("text")}) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      |       FROM tk GROUP BY 1, 2),
      |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM tk),
      |sc AS (
      |  SELECT tf.doc_id, tf.term, tf.tf,
      |    tf.tf * CAST(ROUND(LN(n.n * 1.0 / df.df) * 1e6) AS BIGINT)
      |      AS score_u
      |  FROM tf JOIN df USING (term), n)
      |SELECT doc_id,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
      |    ORDER BY score_u DESC, term) AS INTEGER) AS rn,
      |  term, tf, score_u
      |FROM sc QUALIFY rn <= 3 ORDER BY doc_id, rn""".stripMargin

  /** RAG context packing (q151) — the assembly step between retrieval
    * and the prompt: given each query's BM25 ranking, admit documents
    * in rank order until a fixed context budget (250 tokens) is
    * exhausted — the token-window constraint every RAG serving tier
    * enforces. "Admit while the running total fits" is a PREFIX rule
    * (the cumulative length is monotone in rank), so the whole
    * decision is one per-query prefix-sum window over the top-20
    * frame. Emits all 20 candidates with their cumulative mass and
    * verdict, so the card also audits how much budget the cut wasted.
    *
    * Scale shape: rides two artifacts — the memoized BM25 top-20
    * (|queries|·20 rows) and the index's `doclen` table for lengths
    * (id join; text never scanned) — and the window partitions per
    * query over ≤20 rows. Nothing grows with the corpus. */
  def q151ContextPack(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 250L
    val pfx = ensureBm25Index(s, dir)
    val top = bm25Top20Artifact(s, dir)
      .select(col("query_id"), col("doc_id"), col("rn"))
    val dl = s.table(s"$pfx.doclen")
    val w = Window.partitionBy(col("query_id")).orderBy(col("rn"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.join(dl, Seq("doc_id"))
      .withColumn("cum_tokens", sum(col("dl")).over(w))
      .select(col("query_id"), col("rn").cast("int").as("rn"),
        col("doc_id"), col("dl"), col("cum_tokens"),
        (col("cum_tokens") <= budget).as("kept"))
      .orderBy(col("query_id"), col("rn"))
  }

  /** DuckDB replay of q151: [[bm25Ctes]] verbatim for the ranking,
    * identical lengths and prefix-sum cut. */
  val q151Sql: String =
    s"""WITH $bm25Ctes,
      |top AS (SELECT query_id, doc_id, rn FROM ranked WHERE rn <= 20),
      |pk AS (
      |  SELECT t.query_id, t.rn, t.doc_id, l.dl,
      |    SUM(l.dl) OVER (PARTITION BY t.query_id ORDER BY t.rn) AS cum
      |  FROM top t JOIN dl l USING (doc_id))
      |SELECT query_id, CAST(rn AS INTEGER) AS rn, doc_id,
      |  CAST(dl AS BIGINT) AS dl, CAST(cum AS BIGINT) AS cum_tokens,
      |  cum <= 250 AS kept
      |FROM pk ORDER BY query_id, rn""".stripMargin

  /** Heaps'-law vocabulary growth (q158) — the corpus-curve every
    * tokenizer-vocab and dedup budget decision consults: how fast does
    * the type count grow as the corpus grows (Heaps 1978: V(n) ≈
    * K·n^β; a β drifting toward 1 means unbounded novel vocabulary —
    * OCR noise, random ids, or a language the tokenizer has never
    * seen). Emits the EXACT curve — docs, tokens, and distinct terms
    * at 10/25/50/75/100% corpus prefixes (by doc_id, the stable
    * arrival proxy) — and leaves the K/β regression to the notebook
    * reading it: the curve is the engine-portable fact, the fit is a
    * modeling choice.
    *
    * Scale shape: NO global rank anywhere — prefixes cut by doc_id
    * VALUE against 5 broadcast cutoffs computed from one max()
    * aggregate. The vocabulary contribution of each term is its
    * FIRST-occurrence doc (one vocab-keyed min aggregate, map-side
    * combined), so each checkpoint is a filter + count over the vocab
    * frame, never a re-scan of the corpus per checkpoint: one corpus
    * pass total, then vocab-sized and |docs|-sized frames × 5. */
  def q158HeapsLaw(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), Tok.ws(col("text")).as("ws"))
      // unpinned: a (doc_id, token-array) pin is corpus-TEXT-sized and
      // non-fault-tolerant — the map-only tokenization recomputes for
      // each consumer (max cutoff, lengths, first occurrences) instead
    val cut = docs.agg(max(col("doc_id")).as("mid"))
      .select(explode(array(Seq(10, 25, 50, 75, 100).map(lit): _*))
        .as("pct"), col("mid"))
      .withColumn("cutoff", expr("(mid * pct) div 100"))
      .select(col("pct"), col("cutoff"))
      .localCheckpoint() // 5 rows, feeds both conditional aggregates
    val firstOcc = docs.select(col("doc_id"), explode(col("ws")).as("t"))
      .groupBy(col("t")).agg(min(col("doc_id")).as("fd"))
    val v = firstOcc.crossJoin(broadcast(cut))
      .filter(col("fd") <= col("cutoff"))
      .groupBy(col("pct"), col("cutoff"))
      .agg(count(lit(1)).as("vocab"))
    val t = docs.select(col("doc_id"), size(col("ws")).cast("long").as("n"))
      .crossJoin(broadcast(cut))
      .filter(col("doc_id") <= col("cutoff"))
      .groupBy(col("pct"), col("cutoff"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
    t.join(v, Seq("pct", "cutoff"))
      .select(col("pct"), col("cutoff"), col("n_docs"), col("n_tokens"),
        col("vocab"))
      .orderBy(col("pct"))
  }

  /** DuckDB replay of q158: identical tokenization, the same
    * value-cut prefixes, first-occurrence vocabulary attribution. */
  val q158Sql: String =
    raw"""WITH d AS (
      |  SELECT doc_id, ${Tok.wsSql("text")} AS ws
      |  FROM documents),
      |cut AS (
      |  SELECT pct, (mid * pct) // 100 AS cutoff
      |  FROM (SELECT MAX(doc_id) AS mid FROM d),
      |    (VALUES (10), (25), (50), (75), (100)) AS p(pct)),
      |fo AS (
      |  SELECT t, MIN(doc_id) AS fd
      |  FROM (SELECT doc_id, UNNEST(ws) AS t FROM d) GROUP BY 1),
      |v AS (
      |  SELECT pct, cutoff, CAST(COUNT(*) AS BIGINT) AS vocab
      |  FROM cut JOIN fo ON fo.fd <= cut.cutoff GROUP BY 1, 2),
      |t AS (
      |  SELECT pct, cutoff, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(len(ws)) AS BIGINT) AS n_tokens
      |  FROM cut JOIN d ON d.doc_id <= cut.cutoff GROUP BY 1, 2)
      |SELECT CAST(pct AS INTEGER) AS pct, CAST(cutoff AS BIGINT) AS cutoff,
      |  n_docs, n_tokens, vocab
      |FROM t JOIN v USING (pct, cutoff) ORDER BY pct""".stripMargin

  /** Template-prefix detection (q159) — the doc-level sibling of
    * q121's boilerplate-line mining: web and log corpora are full of
    * TEMPLATE FAMILIES (same generated opening, different tails —
    * product pages, error dumps, license headers) that whole-doc
    * dedup misses (tails differ) and near-dup banding only partially
    * catches. Grouping on the literal first-8-token prefix surfaces
    * them exactly: every family of ≥2 docs sharing an opening, with
    * its size, earliest member, and token mass — the frame a curator
    * caps per-template admission with. Top-20 by family size.
    *
    * Scale shape: one map-only prefix projection, one prefix-keyed
    * aggregation (map-side combined; the prefix is ≤8 tokens, so the
    * shuffle moves short strings + counts, never documents), then the
    * distributed TakeOrdered top-20 + 20-row rank (the q145 shape). */
  def q159TemplatePrefix(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = Tables.documents(s, dir)
      .select(col("doc_id"), Tok.ws(col("text")).as("ws"))
      .select(col("doc_id"), array_join(slice(col("ws"), 1, 8), " ")
        .as("prefix"), size(col("ws")).cast("long").as("n"))
      .groupBy(col("prefix"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("rep_doc"),
        sum(col("n")).as("tokens"))
      .filter(col("n_docs") >= 2)
    g.orderBy(col("n_docs").desc, col("prefix")).limit(20)
      .withColumn("rn", row_number().over(Window
        .orderBy(col("n_docs").desc, col("prefix"))).cast("int"))
      .select(col("rn"), col("prefix"), col("n_docs"), col("rep_doc"),
        col("tokens"))
      .orderBy(col("rn"))
  }

  /** DuckDB replay of q159: same tokenization, literal 8-token
    * prefixes, identical grouping and (n_docs desc, prefix) top-20. */
  val q159Sql: String =
    raw"""WITH d AS (
      |  SELECT doc_id, ${Tok.wsSql("text")} AS ws
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, array_to_string(ws[1:8], ' ') AS prefix,
      |    CAST(len(ws) AS BIGINT) AS n
      |  FROM d),
      |g AS (
      |  SELECT prefix, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    MIN(doc_id) AS rep_doc, CAST(SUM(n) AS BIGINT) AS tokens
      |  FROM p GROUP BY 1 HAVING COUNT(*) >= 2)
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_docs DESC, prefix)
      |    AS INTEGER) AS rn,
      |  prefix, n_docs, rep_doc, tokens
      |FROM g QUALIFY rn <= 20 ORDER BY rn""".stripMargin

  /** Generation-loop and keyword-stuffing card (q160) — the two
    * repetition pathologies q88's LINE-level card cannot see (a
    * looping generator repeats phrases inside one long line; keyword
    * stuffing repeats one token across distinct lines): per document,
    * the count of its most-repeated 5-gram (a 5-gram appearing ≥3
    * times is the standard decoding-loop signature), the repeated-
    * 5-gram mass share, and the single most frequent token's share of
    * all tokens. Exact integer counts; ratios round once to 6dp.
    *
    * Scale shape: both features are (doc, key)-keyed counts with
    * map-side combine followed by doc-keyed folds — the gram shuffle
    * carries (doc_id, 5-gram hash-sized string, count), never text;
    * partitions are bounded by a document's distinct grams. No
    * windows, no self-joins. */
  def q160RepNgram(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), Tok.ws(col("text")).as("ws"))
      // unpinned (the q156/q158 rationale): the gram and term passes
      // each re-tokenize map-only rather than pin a corpus-TEXT-sized,
      // lineage-truncated frame to executor memory+disk
    val grams = docs
      .filter(size(col("ws")) >= 5)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ws) - 4), " +
          "i -> concat_ws(' ', slice(ws, i, 5)))")).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top5_cnt"), sum(col("c")).as("n5"),
        count(lit(1)).as("d5"))
      .withColumn("loop_ratio6",
        round((col("n5") - col("d5")) / col("n5"), 6))
    val terms = docs.select(col("doc_id"), explode(col("ws")).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_tf"), sum(col("c")).as("n_tokens"))
      .withColumn("top_term_share6",
        round(col("top_tf") / col("n_tokens"), 6))
    terms.join(grams, Seq("doc_id"), "left") // docs < 5 tokens: no grams
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("top5_cnt"), lit(0L)).as("top5_cnt"),
        coalesce(col("loop_ratio6"), lit(0.0)).as("loop_ratio6"),
        col("top_term_share6"),
        (coalesce(col("top5_cnt"), lit(0L)) >= 3).as("looped"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB replay of q160: identical positional 5-gram zip, the same
    * per-doc count folds, the same short-doc conventions. */
  val q160Sql: String =
    raw"""WITH d AS (
      |  SELECT doc_id, ${Tok.wsSql("text")} AS ws
      |  FROM documents),
      |g5 AS (
      |  SELECT doc_id, array_to_string(ws[CAST(i AS INTEGER):CAST(i + 4 AS INTEGER)], ' ') AS g
      |  FROM (SELECT doc_id, ws, UNNEST(range(1, len(ws) - 3)) AS i
      |        FROM d WHERE len(ws) >= 5)),
      |gc AS (SELECT doc_id, g, COUNT(*) AS c FROM g5 GROUP BY 1, 2),
      |ga AS (
      |  SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top5_cnt,
      |    ROUND((SUM(c) - COUNT(*)) * 1.0 / SUM(c), 6) AS loop_ratio6
      |  FROM gc GROUP BY 1),
      |tc AS (SELECT doc_id, t, COUNT(*) AS c
      |       FROM (SELECT doc_id, UNNEST(ws) AS t FROM d) GROUP BY 1, 2),
      |ta AS (
      |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    ROUND(MAX(c) * 1.0 / SUM(c), 6) AS top_term_share6
      |  FROM tc GROUP BY 1)
      |SELECT ta.doc_id, ta.n_tokens,
      |  COALESCE(ga.top5_cnt, 0) AS top5_cnt,
      |  COALESCE(ga.loop_ratio6, 0.0) AS loop_ratio6,
      |  ta.top_term_share6,
      |  COALESCE(ga.top5_cnt, 0) >= 3 AS looped
      |FROM ta LEFT JOIN ga USING (doc_id) ORDER BY ta.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q158_heaps_law" -> q158HeapsLaw _,
    "q159_template_prefix" -> q159TemplatePrefix _,
    "q160_rep_ngram" -> q160RepNgram _,
    "q145_collocations" -> q145Collocations _,
    "q168_skipgram_collocations" -> q168SkipgramCollocations _,
    "q147_doc_keywords" -> q147DocKeywords _,
    "q151_context_pack" -> q151ContextPack _,
    "q121_boilerplate" -> q121Boilerplate _,
    "q128_line_filter" -> q128LineFilter _,
    "q133_zipf_fit" -> q133ZipfFit _,
    "q134_novelty_audit" -> q134NoveltyAudit _,
    "q58_lang_id"     -> q58LangId _,
    "q59_quality"     -> q59Quality _,
    "q60_token_count" -> q60TokenCount _,
    "q61_fingerprint" -> q61Fingerprint _,
    "q88_repetition"  -> q88Repetition _,
    "q91_quality_filter" -> q91QualityFilter _,
    "q92_pii_redact"  -> q92PiiRedact _,
    "q139_encoding_audit" -> q139EncodingAudit _,
    "q190_pii_census" -> q190PiiCensus _,
    "q191_pii_redact" -> q191PiiRedact _,
    "q140_phrase_search" -> q140PhraseSearch _,
    "q142_heavy_hitters" -> q142HeavyHitters _,
    "q101_bm25_search" -> q101Bm25 _,
    "q132_bm25_indexed" -> q132Bm25Indexed _,
    "q112_bpe_pairs"  -> q112BpePairs _,
    "q114_bpe_train"  -> q114BpeTrain _,
    "q115_bpe_encode" -> q115BpeEncode _,
    "q117_hard_negatives" -> q117HardNegatives _,
  )

  val oracle: Map[String, String] = Map(
    "q158_heaps_law" -> q158Sql,
    "q159_template_prefix" -> q159Sql,
    "q160_rep_ngram" -> q160Sql,
    "q145_collocations" -> q145Sql,
    "q168_skipgram_collocations" -> q168Sql,
    "q147_doc_keywords" -> q147Sql,
    "q151_context_pack" -> q151Sql,
    "q58_lang_id"     -> q58Sql,
    "q59_quality"     -> q59Sql,
    "q60_token_count" -> q60Sql,
    "q61_fingerprint" -> q61Sql,
    "q88_repetition"  -> q88Sql,
    "q91_quality_filter" -> q91Sql,
    "q92_pii_redact"  -> q92Sql,
    "q139_encoding_audit" -> q139Sql,
    "q190_pii_census" -> q190Sql,
    "q191_pii_redact" -> q191Sql,
    "q140_phrase_search" -> q140Sql,
    "q142_heavy_hitters" -> q142Sql,
    "q101_bm25_search" -> q101Sql,
    // identical rows by construction: the index serves the same corpus
    // through the same shared scoring core
    "q132_bm25_indexed" -> q101Sql,
    "q112_bpe_pairs"  -> q112Sql,
    "q114_bpe_train"  -> q114Sql,
    "q115_bpe_encode" -> q115Sql,
    "q117_hard_negatives" -> q117Sql,
    "q121_boilerplate" -> q121Sql,
    "q128_line_filter" -> q128Sql,
    "q133_zipf_fit" -> q133Sql,
    "q134_novelty_audit" -> q134Sql,
  )
}
