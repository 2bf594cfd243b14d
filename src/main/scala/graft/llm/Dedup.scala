package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Tables, Tok}

/** Deduplication operators for a training-data pipeline, designed for
  * 100 TB: every variant is keyed-shuffle only — content hashes, LSH band
  * buckets, or blocking keys — never a cross join, never a driver-side
  * collect. (The reference catalog stores tables; these are the first-class
  * data-prep operators a catalog-fronted corpus needs.)
  */
object Dedup {

  /** Exact Jaccard over two distinct-element long arrays in one pass
    * (one HashSet build + one probe sweep — cheaper than
    * array_intersect + array_union, which each build their own set).
    * Rounded to 4dp, same as the expression form it replaces. */
  private[llm] val jaccardUdf = udf { (a: Seq[Long], b: Seq[Long]) =>
    val set = new java.util.HashSet[java.lang.Long](a.size * 2)
    a.foreach(set.add(_))
    var inter = 0
    b.foreach(x => if (set.contains(x)) inter += 1)
    math.round(inter.toDouble / (a.size + b.size - inter) * 10000.0) / 10000.0
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

  /** splitmix64 finalizer — the per-permutation mixer for MinHash. */
  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val minhashSeeds: Array[Long] = {
    val rnd = new scala.util.Random(42); Array.fill(64)(rnd.nextLong())
  }

  /** Shingling kernel: word-split + per-word FNV-1a 64 + k-window combine
    * + distinct, one pass over the text. The Catalyst expression form
    * (transform/sequence/concat_ws) costs ~µs per shingle interpreted;
    * this is the per-row imperative case where a JVM loop is the right
    * tool — and the plan stays a map-only projection either way. */
  private def shingleKernel(text: String, k: Int): Array[Long] = {
    val words = text.trim.split("\\s+")
    def fnv(s: String): Long = {
      var h = 0xcbf29ce484222325L; var i = 0
      while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
      h
    }
    val wh = new Array[Long](words.length)
    var i = 0
    while (i < words.length) { wh(i) = fnv(words(i)); i += 1 }
    val n = math.max(words.length - (k - 1), 1)
    val out = new java.util.HashSet[java.lang.Long](n * 2)
    i = 0
    while (i < n) {
      var acc = 0L; var j = 0
      while (j < k && i + j < words.length) { acc = acc * 0x9e3779b97f4a7c15L + wh(i + j); j += 1 }
      out.add(mix64(acc)); i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator; i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    arr
  }

  private[llm] val shingleUdf = udf { text: String => shingleKernel(text, 3) }

  /** 8-token window of [[shingleKernel]] — the standard dedup /
    * contamination overlap unit, shared by q79's decontamination and
    * q134's novelty audit so both aggregate 64-bit gram hashes, never
    * gram text. */
  private[llm] val gram8HashUdf = udf { text: String => shingleKernel(text, 8) }

  /** MinHash + LSH near-dup detection.
    *
    * Pipeline (all shuffle-by-key, 100 TB safe):
    *   1. word-3-shingle + 64-bit hash per doc (one-pass kernel, map-only);
    *   2. 64-permutation MinHash signature: permutation i is
    *      min over shingles of splitmix64(h ^ seed_i) — a tight JVM loop,
    *      one UDF call per doc, map-only;
    *   3. LSH banding 16 bands × 4 rows: explode to (band, bandHash) and
    *      self-equi-join on the bucket — ids only through the shuffle,
    *      never a cross join;
    *   4. re-attach shingle sets to the deduped pair list and verify with
    *      exact single-pass Jaccard; emit pairs >= 0.5.
    * Oracle-checked ([[q52Sql]]): the banding itself is
    * engine-specific, but the exact all-pairs replay provably equals
    * the LSH pipeline's output on the test corpora — verified
    * pair-for-pair at sf0.001/sf0.01/sf0.1, including the handful of
    * mid-band (J 0.5–0.9) pairs where 16×4 banding recall is merely
    * ≈0.65–0.99 per pair; the banding is deterministic, so this is a
    * fixed fact of the corpus, not a coin flip, and a recall miss
    * would fail the hash.
    */
  /** MinHash geometry — ONE definition shared by the full-corpus query
    * (q52) and the persisted band index (q93): both sides of an
    * incremental bucket join must hash with identical kernels. */
  private val NPerm = 64
  private val NBands = 16
  private val RowsPerBand = NPerm / NBands

  /** (doc_id, sh) → (doc_id, sig): 64-perm MinHash signatures. */
  private[llm] def minhashSignatures(docs: DataFrame): DataFrame = {
    val seeds = minhashSeeds
    val sigUdf = udf { sh: Seq[Long] =>
      val mins = Array.fill(NPerm)(Long.MaxValue)
      val it = sh.iterator
      while (it.hasNext) {
        val h = it.next(); var i = 0
        while (i < NPerm) {
          val x = mix64(h ^ seeds(i))
          if (x < mins(i)) mins(i) = x
          i += 1
        }
      }
      mins
    }
    docs.select(col("doc_id"), sigUdf(col("sh")).as("sig"))
  }

  /** (doc_id, sig) → (doc_id, band, bh): banded bucket entries. Only
    * ids and band hashes flow into bucket joins — the shingle arrays
    * stay home and re-attach to the deduped pair list afterwards, so
    * the shuffle moves ids, not payloads (the rule that matters at
    * 100 TB). */
  private[llm] def bandBuckets(signed: DataFrame): DataFrame = {
    val bandEntries = (0 until NBands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(col("sig"), b * RowsPerBand + 1, RowsPerBand)).as("bh"))
    }
    signed
      .select(col("doc_id"), explode(array(bandEntries: _*)).as("e"))
      .select(col("doc_id"), col("e.band").as("band"), col("e.bh").as("bh"))
  }

  // the verified near-dup pair set as a memoized session artifact for
  // CONSUMERS (q116's funnel, q117's exclusion): one build serves them
  // all. q52 itself deliberately does NOT read this memo — its bench
  // number must price the pipeline, not a cache hit.
  private val pairsArtifact = new graft.SessionMemo[DataFrame]

  /** q52's verified pairs (doc_a < doc_b), built once per (session,
    * sfDir) and pinned. */
  private[llm] def verifiedPairsArtifact(s: SparkSession, dir: String): DataFrame =
    pairsArtifact.getOrBuild(s, dir)(
      q52MinHashLsh(s, dir).select(col("doc_a"), col("doc_b"))
        .localCheckpoint())

  def q52MinHashLsh(s: SparkSession, dir: String): DataFrame =
    verifiedPairsOver(Tables.documents(s, dir))
      .orderBy(col("doc_a"), col("doc_b"))

  /** The q52 MinHash-LSH verified-pair pipeline over an EXPLICIT
    * (doc_id, text, …) frame — shared by q52 (the raw corpus) and the
    * curation funnel (the LINE-CLEANED corpus: q116's stage 0 runs
    * before dedup, the RefinedWeb ordering, so its pair set must be
    * computed over what survived cleaning). Same banding, same exact
    * Jaccard ≥ 0.5 verification, ids-only through every shuffle. */
  private[llm] def verifiedPairsOver(corpus: DataFrame): DataFrame = {
    val docs = corpus
      .select(col("doc_id"), shingleUdf(col("text")).as("sh"))
    val buckets = bandBuckets(minhashSignatures(docs))

    val a = buckets.select(col("band"), col("bh"), col("doc_id").as("doc_a"))
    val b = buckets.select(col("band"), col("bh"), col("doc_id").as("doc_b"))
    val pairs = a.join(b, Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")

    pairs
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .withColumn("jaccard", jaccardUdf(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  // one band-index build per (session, sfDir) — same weak-key memo
  // discipline as AnnIndex/CatalogQueries
  private val bandIndexBuilt = new graft.SessionMemo[String]

  /** Catalog-persisted MinHash band index over the BASE corpus
    * (`doc_id % 10 != 7`; the held-out tenth plays the "newly ingested
    * batch"). Same artifact lifecycle as the ANN indexes: built once as
    * an ordinary graft table of (band, bh, doc_id) — ids only, the
    * corpus payload never copies into the index — then every later
    * ingest dedups against it with an ids-only bucket join. This is the
    * shape incremental dedup must take at 100 TB: re-pairing the whole
    * corpus per ingest is quadratic re-work, while (batch signatures +
    * index join + append) is linear in the batch. */
  def ensureBandIndex(s: SparkSession, dir: String): String =
    bandIndexBuilt.getOrBuild(s, dir) {
        if (s.conf.getOption("spark.sql.catalog.graft_dedup").isEmpty) {
          val wh = java.nio.file.Files.createTempDirectory("graft-dedup-wh").toString
          s.conf.set("spark.sql.catalog.graft_dedup",
            classOf[graft.catalog.GraftCatalog].getName)
          s.conf.set("spark.sql.catalog.graft_dedup.warehouse", wh)
        }
        val ns = "sf_" + java.security.MessageDigest.getInstance("MD5")
          .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
        val prefix = s"graft_dedup.$ns"
        s.sql(s"CREATE NAMESPACE IF NOT EXISTS graft_dedup.$ns")
        s.sql(s"DROP TABLE IF EXISTS $prefix.minhash_bands")
        s.sql(s"CREATE TABLE $prefix.minhash_bands (band INT, bh BIGINT, doc_id BIGINT)")
        val base = Tables.documents(s, dir)
          .filter(col("doc_id") % 10 =!= 7)
          .select(col("doc_id"), shingleUdf(col("text")).as("sh"))
        bandBuckets(minhashSignatures(base))
          .select(col("band"), col("bh"), col("doc_id"))
          .writeTo(s"$prefix.minhash_bands").append()
        prefix
    }

  /** Incremental near-dup dedup: the "new batch" (`doc_id % 10 == 7`)
    * is signed and banded, joined against the PERSISTED band index for
    * batch-vs-corpus candidates, self-joined for batch-vs-batch pairs,
    * and every candidate is exact-Jaccard verified. Work per ingest =
    * O(batch) signatures + ids-only joins; corpus shingles are
    * recomputed only for the candidate partners (joined back by id).
    * Must produce exactly q52's pairs restricted to pairs touching the
    * batch (DedupIndexSpec proves it). Oracle-checked ([[q93Sql]]):
    * exact all-pairs Jaccard window-restricted to batch-touching pairs
    * — sound for the same J ≥ 0.9 recall argument as q52/q67. */
  def q93IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val prefix = ensureBandIndex(s, dir)
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val batch = docs.filter(col("doc_id") % 10 === 7)
      .select(col("doc_id"), shingleUdf(col("text")).as("sh"))
    batchPairs(bandBuckets(minhashSignatures(batch)),
        s.table(s"$prefix.minhash_bands"), docs)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** The batch-vs-index near-dup core q93 and [[dedupIngestStream]]
    * share: index-join + batch self-join candidates, exact-Jaccard
    * verification at 0.5, ids-only through every shuffle. `docs` is the
    * raw (doc_id, text) corpus; shingles are recomputed ONLY for ids
    * appearing in candidate pairs — the candidate id set joins the
    * corpus BEFORE the shingle kernel runs, so per-batch verify cost is
    * O(candidates), never a full-corpus re-shingle (at 100 TB the
    * candidate set is batch-sized; a full-corpus UDF pass per
    * micro-batch would dwarf the batch itself). */
  private def batchPairs(newBands: DataFrame, idx: DataFrame,
                         docs: DataFrame): DataFrame = {
    val vsCorpus = newBands.select(col("band"), col("bh"), col("doc_id").as("new_id"))
      .join(idx.select(col("band"), col("bh"), col("doc_id").as("old_id")),
        Seq("band", "bh"))
      .select(least(col("new_id"), col("old_id")).as("doc_a"),
        greatest(col("new_id"), col("old_id")).as("doc_b"))
    val a = newBands.select(col("band"), col("bh"), col("doc_id").as("doc_a"))
    val b = newBands.select(col("band"), col("bh"), col("doc_id").as("doc_b"))
    val vsBatch = a.join(b, Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
    // pinned: the candidate ids feed the shingle restriction AND both
    // verify joins — the band joins must not re-run per consumer
    val cands = vsCorpus.unionByName(vsBatch).dropDuplicates("doc_a", "doc_b")
      .localCheckpoint()
    val ids = cands.select(col("doc_a").as("doc_id"))
      .unionByName(cands.select(col("doc_b").as("doc_id"))).distinct()
    val shById = docs.join(ids, Seq("doc_id"))
      .select(col("doc_id"), shingleUdf(col("text")).as("sh"))
    cands
      .join(shById.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(shById.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .withColumn("jaccard", jaccardUdf(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Dedup-on-INGEST as a stream: tail a documents catalog table and,
    * per micro-batch, near-dup the arriving docs against the PERSISTED
    * band index (plus batch-vs-batch), append the verdict pairs to
    * `outFqn`, then fold the batch's bands into `indexFqn` — every
    * batch dedups against everything ingested before it, at O(batch)
    * signature cost plus ids-only joins (the q93 scale argument,
    * running unattended). Exactly-once: BOTH appends are fenced on the
    * micro-batch id through the snapshot-summary ledger
    * ([[AnnIndex.fencedAppend]] with [[IngestBatchKey]]), and verdicts
    * land before bands — a crash between them replays into one fenced
    * no-op and one completing append, never a lost or doubled batch.
    * The streamed table's docs are already committed when the batch
    * fires, so partner shingles resolve from the corpus itself; the
    * index lags by exactly the in-flight batch, which the batch
    * self-join covers. */
  def dedupIngestStream(s: SparkSession, corpusFqn: String, indexFqn: String,
                        outFqn: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    AnnIndex.validateCheckpointStamps(s, checkpoint, outFqn, IngestBatchKey)
    s.readStream.table(corpusFqn)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        dedupBatch(s, batch, corpusFqn, indexFqn, outFqn, id, IngestBatchKey)
      }
      .start()
  }

  /** The shared per-batch ingest body: sign + band the arrivals, pair
    * them against the persisted index (and each other), append pairs
    * then bands, both fenced on the batch id under `key`. */
  private def dedupBatch(s: SparkSession, arrivals: DataFrame,
                         corpusFqn: String, indexFqn: String, outFqn: String,
                         id: Long, key: String): Unit = {
    // the batch frame feeds bands AND partner lookups — pin it once
    val b = arrivals.select(col("doc_id"), shingleUdf(col("text")).as("sh"))
      .localCheckpoint()
    val newBands = bandBuckets(minhashSignatures(b)).localCheckpoint()
    // raw (doc_id, text): batchPairs shingles only candidate ids
    val corpus = s.table(corpusFqn).select(col("doc_id"), col("text"))
    val pairs = batchPairs(newBands, s.table(indexFqn), corpus)
    AnnIndex.fencedAppend(pairs, outFqn, id.toInt, key)
    AnnIndex.fencedAppend(
      newBands.select(col("band"), col("bh"), col("doc_id")),
      indexFqn, id.toInt, key)
    // the verified-pair adjacency grew: recorded degree ceilings over
    // it are stale — clear so the next guarded wedge join re-measures.
    // Scoped to THIS pair table's families (r17 ADVICE): the dir-keyed
    // census families measure the session pairs ARTIFACT, not this
    // maintained table, and must survive an unrelated ingest commit
    graft.Skew.invalidateAdvice(s"$outFqn#dups.verified_adjacency")
    ()
  }

  /** Fence key for [[dedupMaintainStream]]'s per-batch commits —
    * distinct from [[IngestBatchKey]] so the two stream forms never
    * collide on a shared index. */
  val MaintainBatchKey = "graft-dedup-maintain-batch"

  /** The band index's DEPARTURE path as an unattended maintainer — the
    * dedup twin of the BM25/ANN `$changes` maintainers, closing the
    * hole the append-only [[dedupIngestStream]] documents: after a
    * corpus DELETE or UPDATE, stale bands keep nominating the dead
    * document as a near-dup partner (a FALSE DROP for every future
    * arrival that matches it) and the verdict-pairs table keeps
    * asserting pairs about text that no longer exists. Per micro-batch
    * of the `$changes` tail:
    *
    *  1. with any departure row present, every TOUCHED doc reconciles:
    *     its band rows MERGE-delete from the index, and every verdict
    *     pair with a touched endpoint MERGE-deletes from `outFqn`
    *     (idempotent against THEMSELVES, but not against the batch's
    *     own later appends — the replay gate in [[dedupMaintainBatch]]
    *     skips the leg once the arrival stamp proves the first run
    *     passed the delete point);
    *  2. arrivals resolve to each doc's FINAL state at max
    *     _commit_version (the bm25MaintainStream argument: a
    *     micro-batch may group several commits, so change types alone
    *     cannot order them — same-batch insert-then-delete nets to
    *     absent, CoW survivor re-delivery to unchanged, an update
    *     re-signs only the postimage), anti-joined against the
    *     reconciled index ids so replays and historical re-deliveries
    *     cannot double-band;
    *  3. the shared [[dedupBatch]] body signs, pairs, and appends,
    *     fenced under [[MaintainBatchKey]].
    *
    * An updated document re-pairs against the CURRENT corpus, so a
    * revision that newly duplicates retained content is caught the
    * moment it lands — the property DedupIndexSpec pins. */
  def dedupMaintainStream(s: SparkSession, corpusFqn: String,
                          indexFqn: String, outFqn: String,
                          checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // the departure replay gate compares MaintainBatchKey stamps to
    // batch ids — refuse a checkpoint whose numbering restarts below
    AnnIndex.validateCheckpointStamps(s, checkpoint, outFqn,
      MaintainBatchKey)
    val parts = corpusFqn.split("\\.")
    val changesFqn = (parts.init :+ s"`${parts.last}$$changes`").mkString(".")
    s.readStream.table(changesFqn)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        dedupMaintainBatch(s, batch, corpusFqn, indexFqn, outFqn, id)
      }
      .start()
  }

  /** The per-batch body of [[dedupMaintainStream]], exposed so the
    * crash-emulation specs can drive an exact replay (same batch
    * frame, same id) without forging checkpoint state. */
  private[graft] def dedupMaintainBatch(s: SparkSession, batch: DataFrame,
                                        corpusFqn: String, indexFqn: String,
                                        outFqn: String, id: Long): Unit = {
    val b = batch.localCheckpoint()
    val hasDepartures = !b
      .filter(col("_change_type").isin("delete", "update_preimage"))
      .isEmpty
    // REPLAY GATE — the bm25MaintainBatch argument verbatim: `touched`
    // includes arrival doc_ids and the dead-pair endpoints include
    // them too, so replaying the unfenced MERGE-deletes after a first
    // run that got past them would retract the first run's committed
    // arrival bands and verdict pairs, which the MaintainBatchKey
    // fence then refuses to re-append — arrivals would end up
    // permanently un-banded and un-paired, silently disabling near-dup
    // detection for those docs. [[dedupBatch]] appends pairs to
    // `outFqn` FIRST, so a MaintainBatchKey stamp >= id on `outFqn`
    // proves the first run already passed the delete point (every run
    // stamps it — an empty arrivals frame still commits its stamped
    // summary); stamp < id means the first run died at or before the
    // deletes, where re-running them is idempotent.
    val departuresDone =
      AnnIndex.maxStamp(s, outFqn, MaintainBatchKey).exists(_ >= id)
    if (hasDepartures && !departuresDone) {
      val touched = b.select(col("doc_id")).distinct().localCheckpoint()
      val bs = touched.sparkSession
      val view = "graft_dedup_dep_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      touched.createOrReplaceTempView(view)
      try {
        bs.sql(s"MERGE INTO $indexFqn x USING $view d " +
          "ON x.doc_id = d.doc_id WHEN MATCHED THEN DELETE")
        // verdict pairs with a touched endpoint: their claim is
        // about text that just left (or changed) — retract them
        val deadPairs = bs.table(outFqn)
          .join(touched.withColumnRenamed("doc_id", "doc_a"),
            Seq("doc_a"), "left_semi")
          .unionByName(bs.table(outFqn)
            .join(touched.withColumnRenamed("doc_id", "doc_b"),
              Seq("doc_b"), "left_semi"))
          .select(col("doc_a"), col("doc_b")).distinct()
        val pview = "graft_dedup_deadpairs_" +
          java.util.UUID.randomUUID.toString.replace("-", "")
        deadPairs.createOrReplaceTempView(pview)
        try bs.sql(s"MERGE INTO $outFqn p USING $pview d " +
          "ON p.doc_a = d.doc_a AND p.doc_b = d.doc_b " +
          "WHEN MATCHED THEN DELETE")
        finally bs.catalog.dropTempView(pview)
      } finally bs.catalog.dropTempView(view)
    }
    val vmax = b.groupBy(col("doc_id"))
      .agg(max(col("_commit_version")).as("vmax"))
    val arrivals = b
      .filter(col("_change_type").isin("insert", "update_postimage"))
      .join(vmax, Seq("doc_id"))
      .filter(col("_commit_version") === col("vmax"))
      .dropDuplicates("doc_id")
      .select(col("doc_id"), col("text"))
      .join(s.table(indexFqn).select("doc_id").distinct(),
        Seq("doc_id"), "left_anti")
    dedupBatch(s, arrivals, corpusFqn, indexFqn, outFqn, id,
      MaintainBatchKey)
  }

  /** Batch departure reconciliation for the band index — the
    * [[AnnIndex.vacuum]] twin: drop band rows whose documents LEFT the
    * corpus (`MERGE … WHEN NOT MATCHED BY SOURCE THEN DELETE`, ids
    * only) and retract verdict pairs with a dead endpoint. Unlike the
    * search indexes — where a stale entry merely wastes probe cost —
    * a stale BAND actively harms: it nominates the dead doc as a
    * near-dup partner and can false-drop future arrivals. Returns
    * index + pair rows removed. */
  def bandVacuum(s: SparkSession, corpusFqn: String, indexFqn: String,
                 outFqn: String): Long = {
    val view = "graft_dedup_live_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    s.table(corpusFqn).select(col("doc_id").cast("bigint").as("doc_id"))
      .createOrReplaceTempView(view)
    try {
      val b0 = s.table(indexFqn).count()
      s.sql(s"MERGE INTO $indexFqn x USING $view l ON x.doc_id = l.doc_id " +
        "WHEN NOT MATCHED BY SOURCE THEN DELETE")
      val live = s.table(view)
      val deadPairs = s.table(outFqn)
        .join(live.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"),
          "left_anti")
        .unionByName(s.table(outFqn)
          .join(live.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"),
            "left_anti"))
        .select(col("doc_a"), col("doc_b")).distinct()
      val pview = "graft_dedup_deadpairs_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      deadPairs.createOrReplaceTempView(pview)
      val p0 = s.table(outFqn).count()
      try s.sql(s"MERGE INTO $outFqn p USING $pview d " +
        "ON p.doc_a = d.doc_a AND p.doc_b = d.doc_b " +
        "WHEN MATCHED THEN DELETE")
      finally s.catalog.dropTempView(pview)
      val removed = (b0 - s.table(indexFqn).count()) +
        (p0 - s.table(outFqn).count())
      // adjacency shrank — same scoped registry contract as the ingest
      if (removed > 0)
        graft.Skew.invalidateAdvice(s"$outFqn#dups.verified_adjacency")
      removed
    } finally s.catalog.dropTempView(view)
  }

  /** Snapshot-summary fence key for [[dedupIngestStream]]'s per-batch
    * exactly-once commits. */
  val IngestBatchKey = "graft-dedup-batch"

  private val SimP = 1000000007L

  /** 64 affine projection constants for the SimHash parities, derived
    * from one fixed splitmix64 walk and clamped into [1, p-1] (never
    * the degenerate zero projection). The SAME values are interpolated
    * verbatim into [[q53Sql]] — one source of truth for both engines. */
  private def simConst(seed: Long): Array[Long] = {
    var z = seed
    Array.fill(64) {
      z += 0x9E3779B97F4A7C15L
      var x = z
      x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
      x ^= (x >>> 27); x *= 0x94D049BB133111EBL
      x ^= (x >>> 31)
      math.floorMod(x, SimP - 1) + 1
    }
  }
  private val SimA: Array[Long] = simConst(0x51L)
  private val SimB: Array[Long] = simConst(0xB7L)

  /** SimHash near-dup: 64-bit signature from word-frequency-weighted bit
    * votes, banded into 4×16-bit blocks for candidate generation, then
    * verified with bit_count(xor) <= 3. Candidate recall is EXACTLY 1
    * by pigeonhole — 3 differing bits touch at most 3 of the 4 blocks,
    * so every qualifying pair shares an exact block — which makes the
    * output equal to the all-pairs hamming filter and the pipeline
    * oracle-checkable. Map-only signature + band equi-join: 100 TB
    * safe.
    *
    * Signature bit j votes by the PARITY of an affine projection
    * (a_j·base(w) + b_j mod p, p = 1e9+7) of the word's poly-31 byte
    * fold — a universal-hash-parity simhash family chosen over the
    * previous xxhash64 bit extraction so the DuckDB oracle can
    * recompute identical signatures from first principles (the q63/q65
    * replayable-kernel precedent) and replay the exact all-pairs form.
    * Tokens are raw whitespace splits (no lower()): ASCII-only case
    * folding is the one step whose engine replays could diverge on
    * non-ASCII text. */
  def q53SimHash(s: SparkSession, dir: String): DataFrame = {
    val pa = SimA; val pb = SimB; val pm = SimP
    val simUdf = udf { ws: Seq[String] =>
      val votes = new Array[Int](64)
      val it = ws.iterator
      while (it.hasNext) {
        val bs = it.next().getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var base = 7L
        var i = 0
        while (i < bs.length) { base = (base * 31 + (bs(i) & 0xFF)) % pm; i += 1 }
        var j = 0
        while (j < 64) {
          // a_j, base < p < 2^30 → the product stays far under Long.Max
          if (((pa(j) * base + pb(j)) % pm & 1L) == 0L) votes(j) += 1
          else votes(j) -= 1
          j += 1
        }
      }
      var sig = 0L; var j = 0
      while (j < 64) { if (votes(j) >= 0) sig |= (1L << j); j += 1 }
      sig
    }
    val sigs = Tables.documents(s, dir)
      .select(col("doc_id"),
        simUdf(Tok.ws(col("text"))).as("sig"))
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

  /** HOT-BLOCK GUARD for blocked self-joins: blocking is only scale-safe
    * while blocks stay bounded, and real corpora skew (one source, one
    * popular length). A block of n rows would otherwise put all ~n²/2
    * candidate pairs in ONE join key = one straggler task. Blocks larger
    * than `maxBlock` are subdivided into k = ceil(n/maxBlock) hash
    * shards and covered by the ORDERED SHARD-PAIR trick: side A of the
    * self-join carries key (shard(doc), t) for every t, side B carries
    * (t, shard(doc)) for every t, so each doc pair meets at key
    * (shard_a, shard_b) EXACTLY once — the pair set is identical to the
    * naive block join (nothing silently dropped), but no join key holds
    * more than ~(n/k)² pairs and the shuffle grows only k× on the hot
    * block's ids. Cold blocks get k=1 and degenerate to the plain join.
    * Block sizes ride a broadcast aggregate — no driver round-trip. */
  private[graft] def guardedBlockPairs(blocked: DataFrame,
                                     maxBlock: Int = 4096): DataFrame = {
    val sizes = blocked.groupBy(col("source"), col("len_bucket"))
      .agg(count(lit(1)).as("bn"))
      .withColumn("k", least(ceil(col("bn") / maxBlock), lit(64)).cast("int"))
    val withK = blocked.select(col("source"), col("len_bucket"), col("doc_id"))
      .join(broadcast(sizes.select(col("source"), col("len_bucket"), col("k"))),
        Seq("source", "len_bucket"))
    val a = withK.select(col("source"), col("len_bucket"),
      pmod(hash(col("doc_id")), col("k")).as("x"),
      explode(sequence(lit(0), col("k") - 1)).as("y"),
      col("doc_id").as("doc_a"))
    val b = withK.select(col("source"), col("len_bucket"),
      explode(sequence(lit(0), col("k") - 1)).as("x"),
      pmod(hash(col("doc_id")), col("k")).as("y"),
      col("doc_id").as("doc_b"))
    a.join(b, Seq("source", "len_bucket", "x", "y"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("source"), col("len_bucket"), col("doc_a"), col("doc_b"))
  }

  /** Blocks that trip the guard (k > 1) — the observability half: a
    * pipeline monitors this to catch skew growth. */
  private[graft] def hotBlocks(blocked: DataFrame, maxBlock: Int = 4096): DataFrame =
    blocked.groupBy(col("source"), col("len_bucket"))
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") > maxBlock)

  /** Blocked exact n-gram Jaccard: candidate pairs only within a
    * (source, length-bucket) block — the classic blocking pattern that
    * bounds pair count without a cross join — then exact word-bigram
    * Jaccard per pair. Oversized blocks are subdivided by
    * [[guardedBlockPairs]] (same pair set, bounded tasks). Oracle-checked:
    * the cover is exact, so the pair set matches the naive SQL join. */
  def q54NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    // grams are hashed to 64-bit (one-pass kernel) before the pairwise
    // set ops: long-array intersection is several times cheaper than
    // string arrays, and the shuffled candidate rows shrink accordingly
    val bigrams = udf { text: String => shingleKernel(text, 2) }.apply(col("text"))
    val blocked = Tables.documents(s, dir).select(
      col("doc_id"), col("source"),
      (col("n_chars") / 100).cast("int").as("len_bucket"),
      bigrams.as("grams"))
    // pair generation carries ids only; gram arrays re-attach afterwards
    val pairs = guardedBlockPairs(blocked.select("source", "len_bucket", "doc_id"))
    val grams = blocked.select(col("doc_id"), col("grams"))
    pairs
      .join(grams.select(col("doc_id").as("doc_a"), col("grams").as("g_a")), Seq("doc_a"))
      .join(grams.select(col("doc_id").as("doc_b"), col("grams").as("g_b")), Seq("doc_b"))
      .withColumn("jaccard", jaccardUdf(col("g_a"), col("g_b")))
      .filter(col("jaccard") >= 0.6)
      .select(col("doc_a"), col("doc_b"), col("source"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Benchmark decontamination (the eval-overlap check run before every
    * training run): a corpus document is contaminated if it shares any
    * 8-word-gram with the eval set (here: doc_id < 50 stands in for the
    * benchmark). Eval grams and corpus grams are hashed 64-bit by the
    * same one-pass kernel as MinHash shingling, so the overlap join
    * moves (gram-hash, doc_id) pairs only — never text — and the eval
    * side is small enough to broadcast; at 100 TB this is a broadcast
    * semi-join over a map-only explode. Oracle: string 8-grams in
    * DuckDB (hash membership ≡ string membership modulo collision; a
    * sub-8-word document contributes its whole word sequence as one
    * gram on both sides, mirroring the kernel's short-doc window). */
  def q79Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        explode(gram8HashUdf(col("text"))).as("gh"))
    val evalGrams = g.filter(col("doc_id") < 50).select(col("gh")).distinct()
    g.filter(col("doc_id") >= 50)
      .join(broadcast(evalGrams), Seq("gh"), "left_semi")
      .select(col("doc_id"), col("source")).distinct()
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_contaminated"))
      .orderBy(col("source"))
  }

  val q79Sql: String =
    raw"""WITH w AS (
      |  SELECT doc_id, source, ${Tok.wsSql("text")} AS w
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, source,
      |    unnest(CASE WHEN len(w) < 8 THEN [array_to_string(w, ' ')]
      |           ELSE list_distinct(list_transform(range(1, len(w) - 6),
      |             i -> array_to_string(w[i:i+7], ' '))) END) AS gram
      |  FROM w),
      |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id < 50),
      |hits AS (
      |  SELECT DISTINCT doc_id, source FROM g
      |  WHERE doc_id >= 50 AND gram IN (SELECT gram FROM ev))
      |SELECT source, COUNT(*) AS n_contaminated
      |FROM hits GROUP BY source ORDER BY source""".stripMargin

  /** DuckDB replay of q54: Jaccard over DISTINCT word-bigram strings
    * equals Jaccard over their 64-bit hashes (the Spark side) as long as
    * FNV doesn't collide inside a block — verified value-identical on the
    * corpus. Blocking, threshold, and 4dp rounding replayed exactly. */
  val q54Sql: String =
    raw"""WITH w AS (
      |  SELECT doc_id, source, CAST(FLOOR(n_chars/100.0) AS INTEGER) AS len_bucket,
      |         ${Tok.wsSql("text")} AS w
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, source, len_bucket,
      |    CASE WHEN len(w) < 2 THEN [w[1]]
      |         ELSE list_distinct(list_transform(range(1, len(w)),
      |           i -> w[i] || ' ' || w[i+1])) END AS grams
      |  FROM w),
      |j AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.source,
      |    ROUND(len(list_intersect(a.grams, b.grams)) * 1.0 /
      |      (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 4) AS jaccard
      |  FROM g a JOIN g b ON a.source = b.source AND a.len_bucket = b.len_bucket
      |    AND a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b, source, jaccard FROM j
      |WHERE jaccard >= 0.6 ORDER BY doc_a, doc_b""".stripMargin

  /** Connected components over an undirected pair list (doc_a, doc_b)
    * → (doc_id, label) with label = the component's min doc_id.
    *
    * Each round does min-label propagation (every doc adopts the
    * smallest label among itself and its neighbors) followed by a
    * POINTER JUMP (label := label's label) — the jump halves the
    * remaining label-chain depth, so convergence is O(log diameter)
    * rounds instead of O(diameter): a 1000-hop boilerplate chain at
    * 100 TB converges in ~10 rounds, not 1000. All steps are equi-joins
    * and an aggregation on doc ids; each round is truncated with
    * localCheckpoint so the plan stays O(1) deep, and the convergence
    * bit rides INSIDE the checkpointed frame (the isEmpty probe scans
    * cached partitions — one action per round).
    *
    * FAIL-LOUD: if the cap is ever hit unconverged the method refuses
    * rather than return wrong labels — q118's train/test-leakage
    * guarantee rests on labels being actually converged, and a silent
    * cap would leak exactly when the corpus is at its most duplicated
    * (DedupGuardSpec drives a >10-hop chain through this). */
  private[graft] def connectedComponents(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("doc_a"), col("doc_b"))
      .unionByName(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .localCheckpoint()
    var labels = edges.select(col("doc_a").as("doc_id")).distinct()
      .withColumn("label", col("doc_id"))
      .localCheckpoint()
    var converged = false
    var rounds = 0
    // 48 pointer-jumping rounds cover diameters ~2^48 — unreachable in
    // practice; the require below still refuses if it is ever hit
    val MaxRounds = 48
    while (!converged && rounds < MaxRounds) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"))
        .groupBy(col("doc_a").as("doc_id"))
        .agg(min(col("label")).as("nlabel"))
      val stepped = labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"),
          (col("label") > coalesce(col("nlabel"), col("label"))).as("changed"))
      // pointer jump: follow one indirection — labels are always node
      // ids (min over node ids), and label(x) <= x, so the jump only
      // ever decreases; left join + coalesce guards the roots
      val jump = stepped
        .select(col("doc_id").as("label"), col("label").as("jlabel"))
      val next = stepped.join(jump, Seq("label"), "left")
        .select(col("doc_id"),
          coalesce(col("jlabel"), col("label")).as("label"),
          (col("changed") ||
            coalesce(col("jlabel"), col("label")) =!= col("label")).as("changed"))
        .localCheckpoint(false)
      converged = next.filter(col("changed")).isEmpty
      labels = next.drop("changed")
      rounds += 1
    }
    require(converged,
      s"connected-components did not converge in $MaxRounds pointer-jumping " +
        "rounds — the near-dup graph's diameter exceeds ~2^48 hops, which " +
        "indicates a degenerate pair list; refusing to emit unconverged " +
        "labels (they would mislabel clusters and leak near-dups across " +
        "train/test splits)")
    labels
  }

  // cluster labels as a memoized session artifact for CONSUMERS (q106's
  // keep-best, q118's leakage-safe split): one propagation serves them
  // all, built over the equally-memoized verified-pairs artifact. q67
  // itself deliberately does NOT read this memo — its bench number must
  // price the propagation, not a cache hit.
  private val labelsArtifact = new graft.SessionMemo[DataFrame]

  /** q67's converged cluster labels (doc_id, cluster_rep), built once
    * per (session, sfDir) and pinned. */
  private[llm] def clusterLabelsArtifact(s: SparkSession, dir: String): DataFrame =
    labelsArtifact.getOrBuild(s, dir)(
      connectedComponents(verifiedPairsArtifact(s, dir))
        .select(col("doc_id"), col("label").as("cluster_rep"))
        .localCheckpoint())

  /** Near-dup clusters + keep/drop decisions: connected components over
    * the verified MinHash pairs via min-label propagation with pointer
    * jumping ([[connectedComponents]] — O(log diameter) rounds, all
    * equi-joins on doc ids, fail-loud on non-convergence). Output:
    * every clustered doc with its cluster representative (min doc_id)
    * and the keep decision.
    *
    * Oracle-checked ([[q67Sql]]): the corpus's near-dup pairs all sit
    * at J ≥ 0.9, where 16-band/4-row LSH recall is 1 − (1−0.9⁴)¹⁶ ≈
    * 1 − 4e-8 — so the LSH candidate set provably equals the exact
    * all-pairs set here, and DuckDB replays it as exact trigram Jaccard
    * plus a WITH RECURSIVE min-label propagation. A missed pair or a
    * wrong cluster representative fails the hash. */
  def q67DedupClusters(s: SparkSession, dir: String): DataFrame =
    connectedComponents(q52MinHashLsh(s, dir).select(col("doc_a"), col("doc_b")))
      .select(col("doc_id"), col("label").as("cluster_rep"),
        (col("doc_id") === col("label")).as("keep"))
      .orderBy(col("doc_id"))

  /** KEEP-BEST near-dup consolidation — the curation decision real
    * pipelines make after clustering: drop the WORSE copies, not the
    * later ones. Clusters come from the q67 label propagation; the kept
    * member is each cluster's highest-QUALITY document (the q59
    * composite; doc_id tiebreak for rounded-quality ties); documents
    * with no near-dup keep themselves.
    *
    * Scale shape: labels come from the memoized session artifact
    * ([[clusterLabelsArtifact]] — one propagation per session serves
    * q106 AND q118; q67 itself still prices its own build); quality is
    * map-only arithmetic; the representative choice is ONE window
    * ranked within clusters (cluster-sized partitions — never a global
    * sort). Oracle-checked end-to-end ([[q106Sql]]): closure +
    * composite + rank all recomputed independently in DuckDB. */
  def q106DedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val labels = clusterLabelsArtifact(s, dir)
    val quality = TextAnalysis.q59Quality(s, dir).select(col("doc_id"), col("quality"))
    val docs = quality.join(labels, Seq("doc_id"), "left")
      .withColumn("cluster_rep", coalesce(col("cluster_rep"), col("doc_id")))
    val w = Window.partitionBy(col("cluster_rep"))
      .orderBy(col("quality").desc, col("doc_id"))
    docs.withColumn("rk", row_number().over(w))
      .select(col("doc_id"), col("cluster_rep"), col("quality"),
        (col("rk") === 1).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Substring-level exact dedup — the Spark shape of cross-document
    * suffix-array substring dedup (the "Deduplicating Training Data
    * Makes Language Models Better" recipe): every ≥k-token span a
    * document shares VERBATIM with any other document, merged into
    * maximal spans per document, reported as per-doc duplication stats.
    * Complements the whole-document family (q50-q54): boilerplate
    * headers, license blocks and templated paragraphs duplicate at the
    * substring level inside otherwise-unique documents.
    *
    * Plan shape at 100 TB: tokens explode to (doc, pos, token) — linear
    * in corpus tokens, ids + one token per row; each k-window hashes to
    * 64 bits (windowed collect over k rows, one doc-keyed shuffle); a
    * gram is cross-doc duplicated iff min(doc) != max(doc) within its
    * hash group — combiner-friendly, no distinct, no pair explosion, so
    * a boilerplate gram in a million documents costs one aggregation
    * cell, never a hot join; marked offsets merge into spans with a
    * running-max island window. Two keyed shuffles total (doc,
    * gram-hash); document payloads never move. */
  /** Merged cross-document duplicated spans as (doc_id, start, end) in
    * token offsets — the shared core of [[substringSpans]] (stats) and
    * [[stripDuplicateSpans]] (removal). */
  private def crossDocSpans(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tokenize = Tok.ws(col("text"))
    val toks = docs.select(col("doc_id"),
        posexplode(tokenize).as(Seq("pos", "tok")))
    val wGram = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, k - 1)
    // xxhash64 hashes the array STRUCTURALLY (per element, length-
    // aware), so distinct k-grams can never merge the way a separator-
    // joined string could when a token itself contains the separator;
    // the 64-bit space makes a residual hash collision astronomically
    // unlikely and at worst marks one extra span
    val grams = toks
      .withColumn("win", collect_list(col("tok")).over(wGram))
      .where(size(col("win")) === k)
      .select(col("doc_id"), col("pos"), xxhash64(col("win")).as("gh"))
    val dup = grams.groupBy(col("gh"))
      .agg(min(col("doc_id")).as("d0"), max(col("doc_id")).as("d1"))
      .where(col("d0") =!= col("d1"))
      .select(col("gh"))
    val marked = grams.join(dup, Seq("gh")).select(col("doc_id"), col("pos"))
    // island detection: a marked offset extends the current span iff it
    // starts before-or-at the running max end (adjacent spans merge —
    // the duplicated text is contiguous)
    val wOrd = Window.partitionBy("doc_id").orderBy("pos")
    val prevEnd = max(col("pos") + lit(k))
      .over(wOrd.rowsBetween(Window.unboundedPreceding, -1))
    marked
      .withColumn("new_span",
        when(prevEnd.isNull || col("pos") > prevEnd, 1).otherwise(0))
      .withColumn("span_id",
        sum(col("new_span")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("pos")).as("start"), (max(col("pos")) + lit(k)).as("end"))
      .select(col("doc_id"), col("start"), col("end"))
  }

  def substringSpans(docs: DataFrame, k: Int = 16): DataFrame = {
    val spans = crossDocSpans(docs, k)
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("end") - col("start")).as("dup_tokens"))
    docs.select(col("doc_id"),
        size(Tok.ws(col("text"))).as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        col("n_tokens").cast("long").as("n_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)) / col("n_tokens"), 4)
          .as("dup_ratio"))
      .orderBy(col("doc_id"))
  }

  /** The actionable twin of [[substringSpans]]: rewrite each document
    * with its cross-document duplicated spans REMOVED (the canonical
    * "keep one copy" policy keeps a span in the LOWEST doc_id that
    * carries its first gram — implemented as: a doc keeps its text
    * unless the span was also seen elsewhere; spans here are cut in
    * every doc, the conservative "drop boilerplate everywhere" policy
    * of the C4/Lee-et-al pipelines). Span lists are per-doc small
    * (collect_list after the island merge); the cut itself is a
    * map-only higher-order filter over token indexes — no second
    * shuffle beyond [[crossDocSpans]]'s own. */
  def stripDuplicateSpans(docs: DataFrame, k: Int = 16): DataFrame = {
    val spanList = crossDocSpans(docs, k)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("start"), col("end"))).as("spans"))
    docs.join(spanList, Seq("doc_id"), "left")
      .withColumn("toks", Tok.ws(col("text")))
      .select(col("doc_id"),
        when(col("spans").isNull, col("text")).otherwise(
          concat_ws(" ", transform(filter(
            zip_with(col("toks"),
              sequence(lit(0), size(col("toks")) - 1),
              (t, i) => struct(t.as("t"), i.as("i"))),
            x => !exists(col("spans"),
              s => x("i") >= s("start") && x("i") < s("end"))),
            x => x("t")))).as("clean_text"),
        coalesce(aggregate(col("spans"),
            lit(0L), (acc, s) => acc + (s("end") - s("start"))),
          lit(0L)).as("removed_tokens"))
      .orderBy(col("doc_id"))
  }

  /** q97: cross-document repeated substrings over the corpus.
    * Oracle-checked ([[q97Sql]]): window STRINGS replay the structural
    * gram hashes (tokens carry no whitespace, so space-joining is
    * injective); exactness additionally proven on a hand-built fixture
    * in DedupGuardSpec. */
  def q97SubstringDedup(s: SparkSession, dir: String): DataFrame =
    substringSpans(Tables.documents(s, dir), k = 16)

  /** q98: the span-REMOVAL form — documents rewritten without their
    * cross-doc duplicated spans. Oracle-checked ([[q98Sql]]): the
    * cleaned text reconstructs token-for-token in SQL; also proven on
    * the DedupGuardSpec fixture. */
  def q98StripSpans(s: SparkSession, dir: String): DataFrame =
    stripDuplicateSpans(Tables.documents(s, dir), k = 16)

  /** Cross-source contamination matrix (q120) — for every ordered
    * source pair, how many verified near-dup pairs straddle them: the
    * audit a curator runs before mixing corpora (a benchmark source
    * leaking into a web crawl shows up as an off-diagonal cell; heavy
    * diagonal cells flag sources that self-duplicate). Pairs come from
    * the memoized verified-pairs artifact (a consumer, like q117/q118
    * — one MinHash pipeline per session serves all of them); sources
    * attach by two ids-only joins; the matrix is a |sources|²-bounded
    * aggregation and the total a 1-row broadcast. Text never moves.
    *
    * Oracle-checked ([[q120Sql]]): the exact all-pairs replay
    * (pairCtes, the q52 soundness argument) joined to sources and
    * re-aggregated — a missed pair, wrong side normalization, or
    * drifted share fails the hash. */
  def q120SourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    val pairs = verifiedPairsArtifact(s, dir)
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")),
        Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")),
        Seq("doc_b"))
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
    val tot = pairs.agg(count(lit(1)).as("t"))
    pairs.groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .crossJoin(broadcast(tot))
      .select(col("source_a"), col("source_b"), col("n_pairs"),
        round(col("n_pairs") * 1.0 / col("t"), 6).as("pair_share6"),
        (col("source_a") === col("source_b")).as("within_source"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** DuckDB replay of q120: [[pairCtes]] verbatim (the exact pair
    * list), the same J >= 0.5 verification floor, side normalization
    * via least/greatest, and the share over the same total. */
  // lazy: [[pairCtes]] is defined further down the object body
  lazy val q120Sql: String =
    s"""WITH $pairCtes,
      |vp AS (SELECT doc_a, doc_b FROM p WHERE jaccard >= 0.5),
      |sp AS (
      |  SELECT LEAST(a.source, b.source) AS source_a,
      |    GREATEST(a.source, b.source) AS source_b
      |  FROM vp
      |  JOIN documents a ON a.doc_id = vp.doc_a
      |  JOIN documents b ON b.doc_id = vp.doc_b),
      |tot AS (SELECT COUNT(*) AS t FROM sp)
      |SELECT source_a, source_b, COUNT(*) AS n_pairs,
      |  ROUND(COUNT(*) * 1.0 / ANY_VALUE(t), 6) AS pair_share6,
      |  source_a = source_b AS within_source
      |FROM sp CROSS JOIN tot
      |GROUP BY source_a, source_b
      |ORDER BY source_a, source_b""".stripMargin

  /** Train/held-out n-gram containment curve (q156) — the
    * contamination DIAL q79's single-n decontaminator reads one point
    * of: for n = 1, 2, 3, how much of the held-out tenth (doc_id % 10
    * = 7, the q93/q131 split convention) is already visible in the
    * training slice — at the GRAM level (share of the held-out slice's
    * distinct n-grams that occur in train) and the DOC level (share of
    * held-out docs containing ANY train-seen n-gram). The curve's
    * shape is the decision input: unigram containment is always ~1
    * (shared vocabulary, harmless), and the n where containment
    * finally collapses is the n a decontamination filter must use to
    * separate leakage from language.
    *
    * Scale shape: per n, one map-only gram projection (per-doc
    * distinct, positional zip — no self-join), one gram-keyed
    * left-join of held-out grams against the train gram set (the
    * gram-keyed shuffle class of q79), and two 1-row aggregates; the
    * three n's union 3 rows. Docs shorter than n carry no n-gram and
    * are out of that row's universe — stated, and mirrored in the
    * oracle. */
  def q156ContainmentCurve(s: SparkSession, dir: String): DataFrame = {
    // deliberately UNPINNED end-to-end: both the tokenized corpus and
    // the per-n held-out gram join grow with corpus TEXT, so a
    // localCheckpoint of either is a non-fault-tolerant corpus-sized
    // materialization (lineage truncated: one lost executor kills the
    // query instead of recomputing a partition). The map-only gram
    // projection and the gram-keyed join recompute per consumer —
    // scan-bound work a 1000-executor job absorbs; a corpus-sized pin
    // it cannot
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), Tok.ws(col("text")).as("ws"))
    Seq(1, 2, 3).map { n =>
      val g = docs.filter(size(col("ws")) >= n)
        .select(col("doc_id"), explode(expr(
          s"array_distinct(transform(sequence(1, size(ws) - ${n - 1}), " +
            s"i -> concat_ws(' ', slice(ws, i, $n))))")).as("g"))
      val train = g.filter(col("doc_id") % 10 =!= 7)
        .select(col("g")).distinct()
        .withColumn("hit", lit(1L))
      val test = g.filter(col("doc_id") % 10 === 7)
        .join(train, Seq("g"), "left")
      val docsAgg = test.groupBy(col("doc_id"))
        .agg(max(coalesce(col("hit"), lit(0L))).as("h"))
        .agg(count(lit(1)).as("test_docs"),
          sum(col("h")).as("contaminated_docs"))
      val gramsAgg = test.groupBy(col("g"))
        .agg(max(coalesce(col("hit"), lit(0L))).as("h"))
        .agg(count(lit(1)).as("test_grams"),
          sum(col("h")).as("contained_grams"))
      docsAgg.crossJoin(gramsAgg).select(lit(n).as("n"),
        col("test_docs"), col("contaminated_docs"),
        col("test_grams"), col("contained_grams"))
    }.reduce(_ unionByName _)
      .withColumn("doc_rate6",
        round(col("contaminated_docs") / col("test_docs"), 6))
      .withColumn("gram_rate6",
        round(col("contained_grams") / col("test_grams"), 6))
      .orderBy(col("n"))
  }

  /** DuckDB replay of q156: identical tokenization, positional gram
    * zips, the same split and containment folds, one block per n. */
  val q156Sql: String = {
    def block(n: Int): String =
      s"""g$n AS (
        |  SELECT doc_id, UNNEST(list_distinct(list_transform(
        |    range(1, len(ws) - ${n - 1} + 1),
        |    i -> array_to_string(ws[CAST(i AS INTEGER):CAST(i + ${n - 1} AS INTEGER)], ' ')))) AS g
        |  FROM d WHERE len(ws) >= $n),
        |tr$n AS (SELECT DISTINCT g FROM g$n WHERE doc_id % 10 <> 7),
        |te$n AS (
        |  SELECT t.doc_id, t.g,
        |    CASE WHEN tr$n.g IS NULL THEN 0 ELSE 1 END AS h
        |  FROM (SELECT * FROM g$n WHERE doc_id % 10 = 7) t
        |  LEFT JOIN tr$n USING (g)),
        |row$n AS (
        |  SELECT $n AS n,
        |    CAST(COUNT(*) AS BIGINT) AS test_docs,
        |    CAST(SUM(h) AS BIGINT) AS contaminated_docs
        |  FROM (SELECT doc_id, MAX(h) AS h FROM te$n GROUP BY 1)),
        |gr$n AS (
        |  SELECT $n AS n,
        |    CAST(COUNT(*) AS BIGINT) AS test_grams,
        |    CAST(SUM(h) AS BIGINT) AS contained_grams
        |  FROM (SELECT g, MAX(h) AS h FROM te$n GROUP BY 1))""".stripMargin
    s"""WITH d AS (
      |  SELECT doc_id, ${Tok.wsSql("text")} AS ws
      |  FROM documents),
      |${block(1)},
      |${block(2)},
      |${block(3)}
      |SELECT CAST(r.n AS INTEGER) AS n, r.test_docs, r.contaminated_docs,
      |  g.test_grams, g.contained_grams,
      |  ROUND(r.contaminated_docs * 1.0 / r.test_docs, 6) AS doc_rate6,
      |  ROUND(g.contained_grams * 1.0 / g.test_grams, 6) AS gram_rate6
      |FROM (SELECT * FROM row1 UNION ALL SELECT * FROM row2
      |      UNION ALL SELECT * FROM row3) r
      |JOIN (SELECT * FROM gr1 UNION ALL SELECT * FROM gr2
      |      UNION ALL SELECT * FROM gr3) g USING (n)
      |ORDER BY n""".stripMargin
  }

  /** Near-dup cluster size histogram (q157) — the shape number behind
    * q153's per-family ROI totals: dedup savings concentrate in a few
    * big clusters or spread across many pairs, and the remediation
    * differs (a 500-member cluster is a template or a mirror — fix
    * the SOURCE; ten thousand 2-clusters are organic near-dups — the
    * banding is doing its job). Per cluster size: how many clusters,
    * how many docs that is, and their token mass. Size 1 = the
    * undeduplicated bulk, reported too (it's the denominator).
    *
    * Scale shape: labels come from the memoized q67 propagation
    * artifact (one build per session serves q106/q118/q153 and this);
    * lengths are map-only; then a cluster-keyed count and a size-keyed
    * fold — the histogram is bounded by the largest cluster, never the
    * corpus. */
  def q157ClusterSizes(s: SparkSession, dir: String): DataFrame = {
    val labels = clusterLabelsArtifact(s, dir)
    val per = Tables.documents(s, dir)
      .select(col("doc_id"),
        size(Tok.ws(col("text"))).cast("long").as("n"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("cluster_rep"), col("doc_id")))
      .groupBy(col("rep"))
      .agg(count(lit(1)).as("cluster_size"), sum(col("n")).as("tokens"))
    per.groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"), sum(col("tokens")).as("tokens"))
      .withColumn("n_docs", col("cluster_size") * col("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"), col("n_docs"),
        col("tokens"))
      .orderBy(col("cluster_size"))
  }

  /** Near-dup cluster edge-density audit (q172) — the SHAPE check on
    * q67's clusters that q157's size histogram cannot see: a cluster
    * is a connected component of the verified-pair graph, so its
    * members can be a CLIQUE (every pair verified ≥ threshold — a true
    * mutual near-dup family: one template, one mirror) or a sparse
    * CHAIN (A~B~C verified but A≁C — transitive-closure bleed, where
    * keep-one dedup silently drops documents that are NOT near-dups of
    * the kept representative). Per cluster: member count, verified
    * edges, exact density_u = (2·e·10⁶) div (n·(n−1)), and the clique
    * flag. A density collapsing with size is the signal to tighten the
    * band threshold or switch to per-edge (not per-cluster) dropping.
    *
    * Scale shape: both inputs are memoized session artifacts (labels,
    * verified pairs — ids only); edges attribute to a cluster by ONE
    * id-keyed join (both endpoints share the component by
    * construction); two cluster-keyed folds and a cluster-keyed join,
    * all bounded by dup-involved docs, never the corpus. */
  def q172ClusterDensity(s: SparkSession, dir: String): DataFrame = {
    val labels = clusterLabelsArtifact(s, dir) // (doc_id, cluster_rep)
    val pairs = verifiedPairsArtifact(s, dir).select(col("doc_a"), col("doc_b"))
    val m = labels.groupBy(col("cluster_rep"))
      .agg(count(lit(1)).as("n_members"))
    val e = pairs
      .join(labels.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
      .groupBy(col("cluster_rep")).agg(count(lit(1)).as("n_edges"))
    m.join(e, Seq("cluster_rep"))
      .withColumn("density_u",
        expr("(cast(2 * n_edges as decimal(20,0)) * 1000000) " +
          "div (n_members * (n_members - 1))"))
      .withColumn("is_clique",
        col("n_edges") * 2 === col("n_members") * (col("n_members") - 1))
      .select(col("cluster_rep"), col("n_members"), col("n_edges"),
        col("density_u"), col("is_clique"))
      .orderBy(col("cluster_rep"))
  }

  /** DuckDB replay of q172: the q67 closure for labels AND its `p` CTE
    * as the verified edge list (one derivation serves both — exactly
    * the property the audit measures), HUGEINT density numerator.
    * (lazy: [[ccCte]] is declared below.) */
  lazy val q172Sql: String = ccCte +
    """,
      |lab AS (SELECT doc_id, MIN(label) AS cluster_rep FROM cc GROUP BY 1),
      |m AS (SELECT cluster_rep, CAST(COUNT(*) AS BIGINT) AS n_members
      |      FROM lab GROUP BY 1),
      |ed AS (SELECT l.cluster_rep, CAST(COUNT(*) AS BIGINT) AS n_edges
      |       FROM p JOIN lab l ON l.doc_id = p.doc_a GROUP BY 1)
      |SELECT m.cluster_rep, m.n_members, ed.n_edges,
      |  CAST((CAST(2 * ed.n_edges AS HUGEINT) * 1000000)
      |    // (m.n_members * (m.n_members - 1)) AS BIGINT) AS density_u,
      |  ed.n_edges * 2 = m.n_members * (m.n_members - 1) AS is_clique
      |FROM m JOIN ed USING (cluster_rep) ORDER BY cluster_rep""".stripMargin

  /** Near-dup triangle census (q177) — the per-NODE shape statistic
    * under q172's per-cluster density: for each dup-involved document,
    * its verified-pair degree, the number of triangles through it, and
    * its local clustering coefficient cc_u = (2·tri·10⁶) div
    * (deg·(deg−1)) (Watts & Strogatz 1998). A high-degree node with
    * cc ≈ 1 sits in a clique (a template family — drop all but one);
    * high degree with cc ≈ 0 is a STAR — a hub document that chains
    * unrelated near-dups together, exactly the node whose removal
    * splits a transitive-closure cluster, which q172's cluster-level
    * density can only hint at. Top-10 by (triangles, degree, doc),
    * with the corpus-wide triangle count as the headline column.
    *
    * Scale shape: edges are the memoized verified-pair artifact (ids
    * only); the wedge build — the canonical per-key quadratic, a
    * 10⁴-degree hub emits 10⁸ wedges on ONE key — rides
    * [[graft.Skew.guardedKeyJoin]] on the center node, so no task holds
    * a hub's full neighborhood square; closure is one equi-join back to
    * the canonical (a<b) edge list, counts are keyed folds with
    * map-side combine, and everything is bounded by dup-involved docs,
    * never the corpus.
    *
    * Oracle-parity dependency (shared with q67/q157/q172): the Spark
    * side counts over the MinHash-LSH verified-pair artifact while the
    * DuckDB replay edges come from ccCte's exact all-pairs Jaccard —
    * hash equality therefore relies on the LSH banding having ZERO
    * false negatives on the test corpora (currently true at both SFs;
    * banding recall is separately gated in the bench). If a future SF
    * ever breaks q177 parity, check LSH recall FIRST — a banding miss
    * drops an edge and with it every triangle through it — before
    * suspecting the wedge/closure logic. */
  def q177TriangleCensus(s: SparkSession, dir: String): DataFrame =
    triangleCensusOver(verifiedPairsArtifact(s, dir), // (doc_a < doc_b)
      family = Some(s"$dir#dups.verified_adjacency"))

  /** The q177 census over an EXPLICIT canonical edge list (doc_a <
    * doc_b, distinct) — the seam GraphOpsSpec replays on random graphs
    * the fixed corpus cannot shape (stars, cliques, chains); spec
    * callers pass no `family` so every planted graph gets its own
    * pre-check instead of a stale registry reading. */
  private[graft] def triangleCensusOver(pairs: DataFrame,
                                        family: Option[String] = None)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val adj = pairs.select(col("doc_a").as("ctr"), col("doc_b").as("nb"))
      .union(pairs.select(col("doc_b").as("ctr"), col("doc_a").as("nb")))
    val deg = adj.groupBy(col("ctr")).agg(count(lit(1)).as("degree"))
    // wedges (nb1 < nb2 once each) centered at ctr, hub-guarded; the
    // cover's multiset equals the naive self-join's (DedupGuardSpec)
    val wedges = graft.Skew.guardedKeyJoin(
        adj.select(col("ctr"), col("nb").as("nb1")),
        adj.select(col("ctr"), col("nb").as("nb2")),
        "ctr", "nb1", "nb2", family = family)
      .filter(col("nb1") < col("nb2"))
    val tri = wedges
      .join(pairs.select(col("doc_a").as("nb1"), col("doc_b").as("nb2")),
        Seq("nb1", "nb2"))
      .groupBy(col("ctr")).agg(count(lit(1)).as("triangles"))
    // every triangle closes at each of its 3 centers exactly once; the
    // fold stays integral (a double quotient would round past 2^53)
    val total = tri.agg(expr(
      "coalesce(sum(triangles), 0L) div 3").as("corpus_triangles"))
    val card = deg.join(tri, Seq("ctr"), "left")
      .select(col("ctr").as("doc_id"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("cc_u",
        when(col("degree") < 2, lit(0L)).otherwise(
          expr("(cast(2 * triangles as decimal(20,0)) * 1000000) " +
            "div (degree * (degree - 1))")))
    card.orderBy(col("triangles").desc, col("degree").desc, col("doc_id"))
      .limit(10)
      .withColumn("rn", row_number().over(Window
        .orderBy(col("triangles").desc, col("degree").desc,
          col("doc_id"))).cast("int"))
      .crossJoin(broadcast(total)) // 1-row headline
      .select(col("rn"), col("doc_id"), col("degree"), col("triangles"),
        col("cc_u"), col("corpus_triangles"))
      .orderBy(col("rn"))
  }

  /** DuckDB replay of q177: the q67 closure's `p` CTE as the verified
    * edge list, the NAIVE wedge self-join (the cover's equivalence
    * proof on real data, the q171 precedent), identical closure join,
    * HUGEINT cc numerator, same top-10 tiebreaks. (lazy: [[ccCte]] is
    * declared below.) */
  lazy val q177Sql: String = ccCte +
    """,
      |adj AS (SELECT doc_a AS ctr, doc_b AS nb FROM p
      |        UNION ALL SELECT doc_b AS ctr, doc_a AS nb FROM p),
      |deg AS (SELECT ctr, CAST(COUNT(*) AS BIGINT) AS degree
      |        FROM adj GROUP BY 1),
      |wdg AS (SELECT a.ctr, a.nb AS nb1, b.nb AS nb2
      |        FROM adj a JOIN adj b ON a.ctr = b.ctr AND a.nb < b.nb),
      |tri AS (SELECT w.ctr, CAST(COUNT(*) AS BIGINT) AS triangles
      |        FROM wdg w JOIN p ON p.doc_a = w.nb1 AND p.doc_b = w.nb2
      |        GROUP BY 1),
      |tot AS (SELECT CAST(COALESCE(SUM(triangles), 0) // 3 AS BIGINT)
      |          AS corpus_triangles FROM tri),
      |card AS (
      |  SELECT d.ctr AS doc_id, d.degree,
      |    COALESCE(t.triangles, 0) AS triangles,
      |    CASE WHEN d.degree < 2 THEN 0
      |      ELSE CAST((CAST(2 * COALESCE(t.triangles, 0) AS HUGEINT)
      |        * 1000000) // (d.degree * (d.degree - 1)) AS BIGINT)
      |    END AS cc_u
      |  FROM deg d LEFT JOIN tri t ON t.ctr = d.ctr)
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY triangles DESC,
      |    degree DESC, doc_id) AS INTEGER) AS rn,
      |  doc_id, degree, triangles, cc_u,
      |  (SELECT corpus_triangles FROM tot) AS corpus_triangles
      |FROM card QUALIFY rn <= 10 ORDER BY rn""".stripMargin

  /** DuckDB replay of q157: the q67 closure for labels (shared CTE),
    * singletons kept as their own clusters, identical folds. (lazy:
    * [[ccCte]] is declared below.) */
  lazy val q157Sql: String = ccCte +
    raw""",
      |lab AS (SELECT doc_id, MIN(label) AS rep FROM cc GROUP BY 1),
      |dl AS (
      |  SELECT doc_id,
      |    CAST(len(${Tok.wsSql("text")}) AS BIGINT) AS n
      |  FROM documents),
      |m AS (
      |  SELECT dl.doc_id, COALESCE(lab.rep, dl.doc_id) AS rep, dl.n
      |  FROM dl LEFT JOIN lab USING (doc_id)),
      |per AS (
      |  SELECT rep, CAST(COUNT(*) AS BIGINT) AS cluster_size,
      |    CAST(SUM(n) AS BIGINT) AS tokens
      |  FROM m GROUP BY 1)
      |SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
      |  CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(tokens) AS BIGINT) AS tokens
      |FROM per GROUP BY 1 ORDER BY cluster_size""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q156_containment_curve" -> q156ContainmentCurve _,
    "q157_cluster_sizes" -> q157ClusterSizes _,
    "q172_cluster_density" -> q172ClusterDensity _,
    "q177_triangle_census" -> q177TriangleCensus _,
    "q120_source_overlap" -> q120SourceOverlap _,
    "q97_substring_dedup" -> q97SubstringDedup _,
    "q98_strip_spans" -> q98StripSpans _,
    "q67_dedup_clusters" -> q67DedupClusters _,
    "q50_dedup_exact"   -> q50Exact _,
    "q51_dedup_norm"    -> q51Norm _,
    "q52_dedup_minhash" -> q52MinHashLsh _,
    "q53_dedup_simhash" -> q53SimHash _,
    "q153_dedup_roi"    -> q153DedupRoi _,
    "q106_dedup_keep_best" -> q106DedupKeepBest _,
    "q54_ngram_jaccard" -> q54NgramJaccard _,
    "q79_decontaminate" -> q79Decontaminate _,
    "q93_incremental_dedup" -> q93IncrementalDedup _,
  )

  /** DuckDB replay of q67: exact word-trigram Jaccard over ALL pairs
    * (no LSH — sound because every corpus near-dup pair is J ≥ 0.9,
    * where the banding's recall is ~1; see [[q67DedupClusters]]), then
    * connected components as a recursive min-label closure: a node's
    * label set is everything reachable, and MIN over it is the
    * component representative. Trigram strings stand in for the 64-bit
    * hashed shingles — Jaccard is equal modulo collisions (the q54
    * precedent). */
  /** The recursive min-label closure CTE shared by [[q67Sql]] and
    * [[q106Sql]] (exact all-pairs trigram Jaccard edges + connected
    * components). */
  private[llm] val ccCte: String =
    raw"""WITH RECURSIVE w AS (
      |  SELECT doc_id, ${Tok.wsSql("text")} AS w FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
      |         ELSE list_distinct(list_transform(range(1, len(w) - 1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) END AS grams
      |  FROM w),
      |p AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM g a JOIN g b ON a.doc_id < b.doc_id
      |  WHERE len(list_intersect(a.grams, b.grams)) * 1.0 /
      |      (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.5),
      |e AS (SELECT doc_a AS s, doc_b AS d FROM p
      |      UNION ALL SELECT doc_b AS s, doc_a AS d FROM p),
      |cc AS (
      |  SELECT DISTINCT s AS doc_id, s AS label FROM e
      |  UNION
      |  SELECT e.d AS doc_id, cc.label FROM cc JOIN e ON cc.doc_id = e.s
      |)
      |""".stripMargin

  val q67Sql: String = ccCte +
    """SELECT doc_id, MIN(label) AS cluster_rep, (doc_id = MIN(label)) AS keep
      |FROM cc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** DuckDB replay of q106: the q67 closure for cluster labels, the q59
    * composite for quality (both already hash-proven oracles), singleton
    * docs keeping themselves, and the same quality-then-id window rank
    * — an independent recomputation of the entire keep-best decision. */
  val q106Sql: String = ccCte +
    raw""",
      |lab AS (SELECT doc_id, MIN(label) AS cluster_rep FROM cc GROUP BY doc_id),
      |qual AS (
      |  SELECT doc_id,
      |    ROUND(LEAST(len(${Tok.wsSql("text")}) / 100.0, 1.0) * 0.4
      |      + LEAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in)\b')) * 1.0
      |          / len(${Tok.wsSql("text")}) * 5.0, 1.0) * 0.3
      |      + (1.0 - LEAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) * 1.0
      |          / GREATEST(LENGTH(text), 1) * 10.0, 1.0)) * 0.3, 6) AS quality
      |  FROM documents),
      |d AS (
      |  SELECT q.doc_id, COALESCE(l.cluster_rep, q.doc_id) AS cluster_rep, q.quality
      |  FROM qual q LEFT JOIN lab l USING (doc_id)),
      |r AS (
      |  SELECT doc_id, cluster_rep, quality,
      |    ROW_NUMBER() OVER (PARTITION BY cluster_rep
      |                       ORDER BY quality DESC, doc_id) AS rk
      |  FROM d)
      |SELECT doc_id, cluster_rep, quality, (rk = 1) AS keep
      |FROM r ORDER BY doc_id""".stripMargin

  /** DuckDB replay of q52 (and, window-restricted, q93): exact
    * all-pairs trigram Jaccard, rounded-then-thresholded exactly like
    * [[jaccardUdf]]. Sound as an oracle because the deterministic
    * banding's candidate set equals the exact set on the test corpora
    * — verified pair-for-pair at all three scale factors, mid-band
    * pairs included (same verification as [[q67Sql]]); string trigrams
    * stand in for the 64-bit hashed shingles modulo collisions (the
    * q54 precedent). A jaccard value mismatch, a missed pair, or an
    * invented pair all fail the hash. */
  /** [[pairCtes]] over an EXPLICIT corpus relation (a base table or an
    * earlier CTE) — the SQL twin of [[verifiedPairsOver]]; q116's
    * funnel oracle runs it over its line-cleaned CTE. */
  private[llm] def pairCtesOver(src: String): String =
    s"""w AS (
      |  SELECT doc_id, ${Tok.wsSql("text")} AS w FROM $src),
      |g AS (
      |  SELECT doc_id,
      |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
      |         ELSE list_distinct(list_transform(range(1, len(w) - 1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) END AS grams
      |  FROM w),
      |p AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    ROUND(len(list_intersect(a.grams, b.grams)) * 1.0 /
      |      (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 4)
      |      AS jaccard
      |  FROM g a JOIN g b ON a.doc_id < b.doc_id)""".stripMargin

  /** The exact all-pairs shingle-Jaccard CTE block (no leading WITH),
    * ending with CTE `p` (doc_a < doc_b, jaccard) over the raw
    * `documents` table — shared by the q52/q93/q117/q120 oracles (one
    * source of truth; CTE names `w`/`g`/`p` are reserved by it). */
  private[llm] val pairCtes: String = pairCtesOver("documents")

  private def pairSql(extra: String): String =
    s"""WITH $pairCtes
      |SELECT doc_a, doc_b, jaccard FROM p
      |WHERE jaccard >= 0.5 $extra ORDER BY doc_a, doc_b""".stripMargin

  val q52Sql: String = pairSql("")
  val q93Sql: String = pairSql("AND (doc_a % 10 = 7 OR doc_b % 10 = 7)")

  /** Shared DuckDB replay of the cross-doc span machinery behind
    * q97/q98: 16-token window STRINGS (tokens carry no whitespace, so
    * space-joined windows are injective — standing in for the
    * structural xxhash64), cross-doc mark via min(doc) != max(doc),
    * and the same running-max gaps-and-islands merge. */
  private val spanCte: String =
    raw"""WITH w AS (
      |  SELECT doc_id, text, ${Tok.wsSql("text")} AS w FROM documents),
      |g AS (
      |  SELECT doc_id, w, UNNEST(range(0, GREATEST(len(w) - 15, 0))) AS pos FROM w),
      |g2 AS (
      |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
      |         array_to_string(w[CAST(pos+1 AS INTEGER):CAST(pos+16 AS INTEGER)], ' ') AS gram
      |  FROM g),
      |dup AS (SELECT gram FROM g2 GROUP BY gram HAVING MIN(doc_id) <> MAX(doc_id)),
      |m AS (SELECT doc_id, pos FROM g2 WHERE gram IN (SELECT gram FROM dup)),
      |i AS (SELECT doc_id, pos,
      |        CASE WHEN pos > COALESCE(MAX(pos + 16) OVER
      |          (PARTITION BY doc_id ORDER BY pos
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
      |        THEN 1 ELSE 0 END AS new_span FROM m),
      |s AS (SELECT doc_id, pos, SUM(new_span) OVER
      |        (PARTITION BY doc_id ORDER BY pos) AS span_id FROM i),
      |sp AS (SELECT doc_id, span_id, MIN(pos) AS st, MAX(pos) + 16 AS en
      |       FROM s GROUP BY doc_id, span_id)""".stripMargin

  val q97Sql: String = spanCte +
    raw""",
      |agg AS (SELECT doc_id, COUNT(*) AS n_spans, SUM(en - st) AS dup_tokens
      |        FROM sp GROUP BY doc_id)
      |SELECT d.doc_id, COALESCE(a.n_spans, 0) AS n_spans,
      |  CAST(COALESCE(a.dup_tokens, 0) AS BIGINT) AS dup_tokens,
      |  CAST(len(${Tok.wsSql("d.text")}) AS BIGINT) AS n_tokens,
      |  ROUND(COALESCE(a.dup_tokens, 0) * 1.0 /
      |    len(${Tok.wsSql("d.text")}), 4) AS dup_ratio
      |FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id""".stripMargin

  val q98Sql: String = spanCte +
    """,
      |tok AS (SELECT doc_id, UNNEST(w) AS t, UNNEST(range(0, len(w))) AS i FROM w),
      |keep AS (SELECT tk.doc_id, tk.t, tk.i FROM tok tk
      |         WHERE NOT EXISTS (SELECT 1 FROM sp
      |           WHERE sp.doc_id = tk.doc_id AND tk.i >= sp.st AND tk.i < sp.en)),
      |clean AS (SELECT doc_id, string_agg(t, ' ' ORDER BY i) AS ct FROM keep GROUP BY doc_id),
      |rem AS (SELECT doc_id, SUM(en - st) AS removed FROM sp GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CASE WHEN r.doc_id IS NULL THEN d.text ELSE COALESCE(c.ct, '') END AS clean_text,
      |  CAST(COALESCE(r.removed, 0) AS BIGINT) AS removed_tokens
      |FROM documents d LEFT JOIN clean c USING (doc_id) LEFT JOIN rem r USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** DuckDB replay of q53: the SAME simhash signatures recomputed from
    * first principles — per-word poly-31 byte fold (the q63 byte-fold
    * machinery over `hex(encode(w))`), the 64 affine parity projections
    * with [[SimA]]/[[SimB]] interpolated verbatim, majority votes,
    * HUGEINT bit assembly mapped to the signed BIGINT — then the exact
    * ALL-PAIRS hamming filter, which the Spark side's 4×16-bit banding
    * equals by pigeonhole (recall exactly 1). A signature divergence,
    * a missed pair, or an invented pair all fail the hash. */
  /** The q53 oracle's SimHash-signature CTE chain (tok → … → `sig`) —
    * shared by [[q53Sql]] and the dedup-ROI card's [[q153Sql]], so the
    * constants and bit conventions have one SQL rendering. */
  private[llm] val simCtes: String = {
    val al = SimA.mkString("[", ",", "]")
    val bl = SimB.mkString("[", ",", "]")
    val pw = (0 until 64)
      .map(j => "'" + java.math.BigInteger.ONE.shiftLeft(j) + "'")
      .mkString("[", ",", "]")
    s"""tok AS (
      |  SELECT doc_id, UNNEST(${Tok.wsSql("text")}) AS w
      |  FROM documents),
      |wb AS (
      |  SELECT doc_id,
      |    list_reduce(list_prepend(CAST(7 AS BIGINT),
      |      list_transform(range(0, octet_length(encode(w))),
      |        i -> CAST(CAST(concat('0x', hex(encode(w))[i*2+1:i*2+2]) AS INTEGER) AS BIGINT))),
      |      (acc, c) -> (acc * 31 + c) % 1000000007) AS base
      |  FROM tok),
      |v AS (
      |  SELECT doc_id, u.j,
      |    SUM(CASE WHEN (($al[CAST(u.j AS INTEGER)+1] * base +
      |                    $bl[CAST(u.j AS INTEGER)+1]) % 1000000007) % 2 = 0
      |        THEN 1 ELSE -1 END) AS vote
      |  FROM wb CROSS JOIN (SELECT UNNEST(range(0, 64)) AS j) u
      |  GROUP BY doc_id, u.j),
      |sg AS (
      |  SELECT doc_id,
      |    SUM(CASE WHEN vote >= 0
      |        THEN CAST($pw AS HUGEINT[])[CAST(j AS INTEGER)+1]
      |        ELSE CAST(0 AS HUGEINT) END) AS su
      |  FROM v GROUP BY doc_id),
      |sig AS (
      |  SELECT doc_id,
      |    CAST(CASE WHEN su >= CAST('9223372036854775808' AS HUGEINT)
      |         THEN su - CAST('18446744073709551616' AS HUGEINT)
      |         ELSE su END AS BIGINT) AS sig
      |  FROM sg)""".stripMargin
  }

  val q53Sql: String =
    s"""WITH $simCtes
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
      |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.sig, b.sig)) <= 3
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Dedup ROI card (q153) — the method-comparison table a curator
    * reads before choosing which dedup passes to run at corpus scale:
    * for each of the pack's five dedup families — exact text,
    * normalized text, MinHash-verified near-dup, SimHash, and
    * SemDeDup — the documents it would remove under the shared
    * keep-lowest-id convention and the TOKEN MASS those documents
    * carry (the number that prices a method: dedup buys training
    * tokens back, and methods differ in how many). Each method's drop
    * rule is the exact rule its own operator ships (q50/q51 grouping,
    * q52's verified pairs, q53's hamming band, q100's within-cell
    * cosine band) — the card is a COMPOSITION, not a re-definition,
    * so its oracle reuses those operators' SQL fragments verbatim.
    *
    * Scale shape: every branch is the audited bounded plan of its
    * operator (hash groupings; the memoized pairs artifact; blocked/
    * banded pair generation; the guarded cell cover) followed by an
    * ids-only distinct + one token-sum join; the card itself adds
    * five 1-row aggregates. */
  def q153DedupRoi(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val tokens = docs.select(col("doc_id"),
        size(Tok.ws(col("text"))).cast("long").as("n"))
      .localCheckpoint() // feeds every method's mass join AND the total
    val tot = tokens.agg(sum(col("n")).as("total"))
    def card(label: String, flagged: DataFrame): DataFrame =
      flagged.select(col("doc_id")).distinct()
        .join(tokens, Seq("doc_id"))
        .agg(count(lit(1)).as("docs_flagged"),
          coalesce(sum(col("n")), lit(0L)).as("tokens_flagged"))
        .crossJoin(broadcast(tot))
        .select(lit(label).as("method"), col("docs_flagged"),
          col("tokens_flagged"),
          round(col("tokens_flagged") / col("total"), 6).as("share6"))
    val exactFlag = docs
      .join(docs.groupBy(col("text")).agg(min(col("doc_id")).as("keep")),
        Seq("text"))
      .filter(col("doc_id") =!= col("keep")).select(col("doc_id"))
    // q51's normalization verbatim
    val normE = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    val normFlag = docs.withColumn("h", normE)
      .join(docs.select(normE.as("h"), col("doc_id").as("k"))
        .groupBy(col("h")).agg(min(col("k")).as("keep")), Seq("h"))
      .filter(col("doc_id") =!= col("keep")).select(col("doc_id"))
    val mhFlag = verifiedPairsArtifact(s, dir)
      .select(col("doc_b").as("doc_id"))
    val shFlag = q53SimHash(s, dir).select(col("doc_b").as("doc_id"))
    val sdFlag = Similarity.semDropList(s, dir)
      .select(col("vec_id").as("doc_id"))
    Seq(card("exact", exactFlag), card("minhash", mhFlag),
      card("normalized", normFlag), card("semdedup", sdFlag),
      card("simhash", shFlag))
      .reduce(_ unionByName _).orderBy(col("method"))
  }

  /** DuckDB replay of q153: each method's published SQL fragment
    * verbatim — [[pairCtes]] (MinHash ≡ exact Jaccard), [[simCtes]],
    * [[Similarity.ivfCtes]] (`i_`-prefixed to avoid the `v` clash) —
    * plus the q50/q51 groupings inline, under one shared token fold. */
  lazy val q153Sql: String =
    s"""WITH $pairCtes,
      |$simCtes,
      |${Similarity.ivfCtes("i_")},
      |tkn AS (
      |  SELECT doc_id,
      |    CAST(len(${Tok.wsSql("text")}) AS BIGINT) AS n
      |  FROM documents),
      |ttot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM tkn),
      |exf AS (
      |  SELECT d.doc_id FROM documents d
      |  JOIN (SELECT text, MIN(doc_id) AS keep FROM documents GROUP BY 1) x
      |    ON x.text = d.text WHERE d.doc_id <> x.keep),
      |nrm AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '',
      |      'g'), ' +', ' ', 'g')) AS h
      |  FROM documents),
      |nof AS (
      |  SELECT d.doc_id FROM nrm d
      |  JOIN (SELECT h, MIN(doc_id) AS keep FROM nrm GROUP BY 1) x
      |    ON x.h = d.h WHERE d.doc_id <> x.keep),
      |mhf AS (SELECT DISTINCT doc_b AS doc_id FROM p WHERE jaccard >= 0.5),
      |shf AS (
      |  SELECT DISTINCT b.doc_id FROM sig a JOIN sig b
      |    ON a.doc_id < b.doc_id
      |  WHERE bit_count(xor(a.sig, b.sig)) <= 3),
      |sdf AS (
      |  SELECT DISTINCT b.vec_id AS doc_id
      |  FROM i_cells a JOIN i_cells b
      |    ON a.cell = b.cell AND a.vec_id < b.vec_id
      |  WHERE list_dot_product(a.ev, b.ev) /
      |    (SQRT(list_dot_product(a.ev, a.ev)) *
      |     SQRT(list_dot_product(b.ev, b.ev))) >= 0.35),
      |u AS (
      |  SELECT 'exact' AS method, doc_id FROM exf
      |  UNION ALL SELECT 'minhash', doc_id FROM mhf
      |  UNION ALL SELECT 'normalized', doc_id FROM nof
      |  UNION ALL SELECT 'semdedup', doc_id FROM sdf
      |  UNION ALL SELECT 'simhash', doc_id FROM shf),
      |agg AS (
      |  SELECT method, CAST(COUNT(*) AS BIGINT) AS docs_flagged,
      |    CAST(COALESCE(SUM(n), 0) AS BIGINT) AS tokens_flagged
      |  FROM (SELECT DISTINCT method, doc_id FROM u) JOIN tkn USING (doc_id)
      |  GROUP BY 1),
      |mth(method) AS (VALUES ('exact'), ('minhash'), ('normalized'),
      |                       ('semdedup'), ('simhash'))
      |SELECT m.method,
      |  CAST(COALESCE(docs_flagged, 0) AS BIGINT) AS docs_flagged,
      |  CAST(COALESCE(tokens_flagged, 0) AS BIGINT) AS tokens_flagged,
      |  ROUND(COALESCE(tokens_flagged, 0) * 1.0 / t.total, 6) AS share6
      |FROM mth m LEFT JOIN agg USING (method), ttot t
      |ORDER BY method""".stripMargin

  val oracle: Map[String, String] = Map(
    "q156_containment_curve" -> q156Sql,
    "q157_cluster_sizes" -> q157Sql,
    "q172_cluster_density" -> q172Sql,
    "q177_triangle_census" -> q177Sql,
    "q153_dedup_roi"    -> q153Sql,
    "q50_dedup_exact"   -> q50Sql,
    "q51_dedup_norm"    -> q51Sql,
    "q54_ngram_jaccard" -> q54Sql,
    "q79_decontaminate" -> q79Sql,
    "q67_dedup_clusters" -> q67Sql,
    "q52_dedup_minhash" -> q52Sql,
    "q53_dedup_simhash" -> q53Sql,
    "q106_dedup_keep_best" -> q106Sql,
    "q93_incremental_dedup" -> q93Sql,
    "q97_substring_dedup" -> q97Sql,
    "q98_strip_spans" -> q98Sql,
    "q120_source_overlap" -> q120Sql,
  )
}
