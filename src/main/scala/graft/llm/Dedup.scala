package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication operators for a training-data pipeline, designed for
  * 100 TB: every variant is keyed-shuffle only — content hashes, LSH band
  * buckets, or blocking keys — never a cross join, never a driver-side
  * collect. (The reference catalog stores tables; these are the first-class
  * data-prep operators a catalog-fronted corpus needs.)
  */
object Dedup {

  /** Word-k-shingle set, hashed to 64-bit via xxhash64 — the unit of
    * near-dup similarity. `transform(sequence(...))` keeps shingling
    * inside Catalyst expressions (no UDF). */
  private def shingleHashes(text: Column, k: Int = 3): Column = {
    val words = split(trim(text), "\\s+")
    val shingles = transform(
      sequence(lit(1), greatest(size(words) - (k - 1), lit(1))),
      i => concat_ws(" ", (0 until k).map(j => element_at(words, i + j)): _*))
    array_distinct(transform(shingles, s => xxhash64(s)))
  }

  /** Exact dedup: hash-groupBy on sha256(text), keep the smallest doc_id.
    * At 100 TB the shuffle key is the 32-byte digest, not the document —
    * the payload never moves. */
  def q50Exact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("dup_cnt"))
      .select(col("doc_id"), col("dup_cnt"))
      .orderBy(col("doc_id"))

  val q50Sql: String =
    """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_cnt
      |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin

  /** Normalized exact dedup (lowercase, strip non-alnum, collapse ws). */
  def q51Norm(s: SparkSession, dir: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    Tables.documents(s, dir)
      .groupBy(sha2(norm, 256).as("h"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("dup_cnt"))
      .select(col("doc_id"), col("dup_cnt"))
      .orderBy(col("doc_id"))
  }

  val q51Sql: String =
    """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_cnt FROM documents
      |GROUP BY trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))
      |ORDER BY doc_id""".stripMargin

  /** MinHash + LSH near-dup detection.
    *
    * Pipeline (all shuffle-by-key, 100 TB safe):
    *   1. shingle + hash each doc (map-only);
    *   2. 64-"permutation" MinHash signature: permutation i is the
    *      seed-salted rehash xxhash64(shingleHash, i) (ANSI-safe — no
    *      overflowing multiply — and well mixed), minimized per doc with
    *      one `transform`+`array_min` per permutation — map-only;
    *   3. LSH banding 16 bands × 4 rows: explode to (band, bandHash),
    *      self-equi-join on the band bucket (never a cross join);
    *   4. verify candidates with exact shingle-set Jaccard
    *      (array_intersect/union on the two docs' shingle sets).
    * Emits verified pairs with jaccard >= 0.5. Not SQL-expressible in
    * DuckDB → rows-only oracle.
    */
  def q52MinHashLsh(s: SparkSession, dir: String): DataFrame = {
    val nPerm = 64; val bands = 16; val rowsPerBand = nPerm / bands

    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), shingleHashes(col("text")).as("sh"))

    // signature: per permutation, min over shingles of xxhash64(h, i)
    val sigCols = (0 until nPerm).map { i =>
      array_min(transform(col("sh"), h => xxhash64(h, lit(i))))
    }
    val signed = docs.select(col("doc_id"), col("sh"), array(sigCols: _*).as("sig"))

    // bands: hash the 4-slot slice of the signature
    val bandEntries = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bh"))
    }
    val buckets = signed
      .select(col("doc_id"), col("sh"), explode(array(bandEntries: _*)).as("e"))
      .select(col("doc_id"), col("sh"), col("e.band").as("band"), col("e.bh").as("bh"))

    val a = buckets.select(col("band"), col("bh"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = buckets.select(col("band"), col("bh"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))) * 1.0 /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** SimHash near-dup: 64-bit signature from word-frequency-weighted bit
    * votes, banded into 4×16-bit blocks for candidate generation (a pair
    * within hamming distance 3 must share at least one exact block), then
    * verified with bit_count(xor) <= 3. Map-only signature + band
    * equi-join: 100 TB safe. Rows-only oracle. */
  def q53SimHash(s: SparkSession, dir: String): DataFrame = {
    // per-word 64-bit hash; simhash bit j = 1 iff the sum over word
    // occurrences of (bit_j(hash) ? +1 : -1) is >= 0. One Catalyst
    // `aggregate` fold per bit (static j, so shiftright stays literal).
    val words = split(trim(lower(col("text"))), "\\s+")
    def voteBit(j: Int): Column = aggregate(words, lit(0L),
      (acc, w) => acc +
        when(shiftright(xxhash64(w), j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
    val sim = (0 until 64)
      .map(j => when(voteBit(j) >= 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))

    val sigs = Tables.documents(s, dir).select(col("doc_id"), sim.as("sig"))
    val blockEntries = (0 until 4).map { b =>
      struct(lit(b).as("blk"),
        shiftright(col("sig"), b * 16).bitwiseAND(0xFFFFL).as("bh"))
    }
    val buckets = sigs.select(col("doc_id"), col("sig"),
        explode(array(blockEntries: _*)).as("e"))
      .select(col("doc_id"), col("sig"), col("e.blk").as("blk"), col("e.bh").as("bh"))
    val a = buckets.select(col("blk"), col("bh"), col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = buckets.select(col("blk"), col("bh"), col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("blk", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= 3)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Blocked exact n-gram Jaccard: candidate pairs only within a
    * (source, length-bucket) block — the classic blocking pattern that
    * bounds pair count without a cross join — then exact word-bigram
    * Jaccard per pair. Rows-only oracle. */
  def q54NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val words = split(trim(col("text")), "\\s+")
    val bigrams = array_distinct(transform(
      sequence(lit(1), greatest(size(words) - 1, lit(1))),
      i => concat_ws(" ", element_at(words, i), element_at(words, i + 1))))
    val blocked = Tables.documents(s, dir).select(
      col("doc_id"), col("source"),
      (col("n_chars") / 100).cast("int").as("len_bucket"),
      bigrams.as("grams"))
    val a = blocked.select(col("source"), col("len_bucket"),
      col("doc_id").as("doc_a"), col("grams").as("g_a"))
    val b = blocked.select(col("source"), col("len_bucket"),
      col("doc_id").as("doc_b"), col("grams").as("g_b"))
    a.join(b, Seq("source", "len_bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("g_a"), col("g_b"))) * 1.0 /
          size(array_union(col("g_a"), col("g_b"))), 4))
      .filter(col("jaccard") >= 0.6)
      .select(col("doc_a"), col("doc_b"), col("source"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_dedup_exact"   -> q50Exact _,
    "q51_dedup_norm"    -> q51Norm _,
    "q52_dedup_minhash" -> q52MinHashLsh _,
    "q53_dedup_simhash" -> q53SimHash _,
    "q54_ngram_jaccard" -> q54NgramJaccard _,
  )

  val oracle: Map[String, String] = Map(
    "q50_dedup_exact" -> q50Sql,
    "q51_dedup_norm"  -> q51Sql,
    // q52/q53/q54: LSH banding + array ops not expressible in ANSI SQL →
    // rows-only checks.
  )
}
