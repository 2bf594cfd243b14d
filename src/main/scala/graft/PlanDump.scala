package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for the headline queries to PLANS.md —
  * the artifact of the "explain the plan and iterate until it's the plan
  * you'd want" loop. Run: spark-submit --class graft.PlanDump <jar> [sfDir].
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val headline = Seq(
      "q01_pricing_summary" -> ("exact-cents aggregation: filter+projection pushed to scan, " +
        "partial_sum before the shuffle, 6-row final agg"),
      "q03_top_revenue" -> ("fact⋈fact shuffles on orderkey once; customer broadcast; " +
        "top-k is TakeOrderedAndProject"),
      "q10_join_asof" -> ("as-of = union of timelines + one shuffle on the key + " +
        "last(ignoreNulls) window — no per-row subquery, no NLJ"),
      "q52_dedup_minhash" -> ("banding self-join moves (band,hash,doc_id) only; shingle " +
        "arrays re-attach to the deduped pair list"),
      "q55_cosine_topk" -> ("50-row query side broadcast under BroadcastNestedLoopJoin; " +
        "graft_dot/graft_l2norm are codegen'd expressions"),
      "q23_window_ntile" -> ("global distribution stats WITHOUT a single-partition window: " +
        "range-partition + per-pid row_number + broadcast offset map; " +
        "no Exchange SinglePartition anywhere"),
      "q86_mor_dml" -> ("merge-on-read read after DELETE/UPDATE/MERGE: the scan " +
        "splits by applicable-delete set — untouched files keep the parquet " +
        "delegate, delete-affected groups subtract equality keys row-based " +
        "(BatchScan graft-mor); compaction would fold the deletes and restore " +
        "full vectorization"),
      "q89_spj_join" -> ("storage-partitioned join: both scans report " +
        "KeyGroupedPartitioning over bucket(8, orderkey), so the sort-merge " +
        "join AND the orderkey-keyed aggregation run with ZERO Exchange " +
        "nodes — the co-located plan a 100 TB fact-fact join needs; the " +
        "query itself refuses any plan containing an exchange"),
      "q101_bm25_search" -> ("BM25 retrieval: postings semi-join the " +
        "broadcast query vocabulary BEFORE the (doc,term) aggregation, so " +
        "the term shuffle carries only query-term keys; df/length stats " +
        "and the query side stay broadcast; one keyed agg per (query,doc) " +
        "then a bounded top-10 window"),
      "q102_sorted_spj" -> ("sorted storage-partitioned merge join: both " +
        "sides report KeyGroupedPartitioning AND the stamped per-file sort " +
        "order, so the SortMergeJoin runs with ZERO Exchange and ZERO Sort " +
        "nodes — the query itself refuses any plan containing either"),
      "q103_add_files_partitioned" -> ("hive-lake onboarding read: the " +
        "import-overlay scan plans one delegate group per imported " +
        "partition dir and patches the identity column from the dir value " +
        "(hive files keep it out of the footer); since r9 the patch is " +
        "COLUMNAR — a ConstantColumnVector per overlayed ordinal on the " +
        "delegate's batch, so native and imported files alike read " +
        "vectorized; the partition filter prunes dirs at the manifest " +
        "layer before any file opens"),
      "q105_add_files_bucketed" -> ("bucketBy-lake onboarding read: files " +
        "registered zero-copy under __part_ bucket dirs (ids witnessed by " +
        "the Spark bucketBy names, hash family proven per-row at import), " +
        "so the scan reports the keyed bucket layout (keyed(N partition " +
        "groups)) and SPJ/bucket pruning treat the import natively — the " +
        "filtered aggregation pushes its predicate into the scan and " +
        "partial-aggregates before the shuffle (SortAggregate only " +
        "because min(string) forbids hash buffers — Spark's choice, " +
        "same as q103)"),
      "q119_lm_xent" -> ("per-language LM cross-entropy (r16 shape): " +
        "raw bigram rows straight off the corpus scan — no per-doc " +
        "pre-aggregation (a corpus-scale shuffle that shrank nothing) " +
        "and no corpus-text cache (measured slower than the map-only " +
        "recompute); the cab exchange is computed once and REUSED by " +
        "ca/vlang/uTable, the scoring join hash-builds the bounded " +
        "u-table side (no corpus sort); V is a broadcast; " +
        "tertile cut points fold from the resolution-bounded " +
        "(lang, xent6) histogram inside an aggregation tree and " +
        "broadcast back — bucket assignment is map-side, NO window " +
        "anywhere in the plan (PlanSpec-gated; the r10 per-language " +
        "ntile was the q23/q76 single-task funnel)"),
      "q130_bitext_ann" -> ("bitext mining, scale path: non-en vectors " +
        "rank against the 8 broadcast centroids (the one allowed " +
        "nested loop, KCells rows); candidates come from the probed " +
        "cells' English members via a cell-key equi-join — never the " +
        "|src|×|tgt| product q124's exactness baseline uses; the " +
        "shared margin arithmetic windows by document id over the " +
        "checkpointed ids+longs pair frame"),
      "q122_cascade_rerank" -> ("retrieve-then-rerank cascade: stage 1 is " +
        "the audited q101 BM25 subtree; stage 2 probes the embedding " +
        "table through an ids-only BroadcastHashJoin on the 60-row " +
        "candidate pool — the dense model never scans the corpus, so " +
        "stage-2 cost is corpus-size independent"),
      "q132_bm25_indexed" -> ("index-served BM25: the postings scan " +
        "carries PushedFilters In(term, …) which the bucket(16, term) " +
        "layout prunes to the query vocabulary's dirs; df aggregates " +
        "from the same pruned rows; doclen joins by id; document text " +
        "is never read (PlanSpec gates zero corpus parquet scans) — " +
        "q101's tokenize-the-corpus cost becomes O(query postings)"),
      "q125_retrieval_eval" -> ("index scorecard over BOTH indexes: all " +
        "three inputs are the pack's existing top-k frames " +
        "(checkpointed once each); per channel the evaluation is two " +
        "ids-only joins and a |queries|-key aggregate — nothing beyond " +
        "the searches scales with the corpus"),
      "q143_csls_search" -> ("CSLS search with r(d) persisted (r13): the " +
        "neighborhood statistic attaches from the ivf_rd artifact by one " +
        "id join — no within-cell pair subtree anywhere in the plan; " +
        "candidates keep the q57 probed-cells-first geometry (r16: " +
        "In-pruned membership read, ids-only broadcast restriction, " +
        "payloads by id) and the only nested loop is the 8-row " +
        "centroid ranking"),
      "q144_sq8_search" -> ("SQ8 two-stage search over the persisted " +
        "code table (r13): stage 1 scans sq8_codes (one byte/dim + " +
        "scale) through the codegen'd Int8DotF kernel; the embeddings " +
        "parquet appears only under the pushed vec_id<50 query filter " +
        "and the two ≤10-per-query rescore joins"),
      "q148_probe_sweep" -> ("nProbe tuning curve from ONE scored pass: " +
        "each candidate is admitted at a unique probe rank (one cell " +
        "per vector), so the rank-tagged frame pins once and all five " +
        "sweep points are filters + per-query top-3 windows over it"),
      "q153_dedup_roi" -> ("dedup method-comparison card: five branches, " +
        "each its operator's exact drop rule and audited plan, then " +
        "ids-only distincts, one token-sum join, and five 1-row " +
        "aggregates — a composition, adding no new corpus-scale work"),
      "q154_mutual_knn" -> ("kNN-graph reciprocity (r14): within-cell " +
        "ordered pairs from the guarded shard cover (ids only, " +
        "embeddings re-attach by id), the top-1 window partitions by " +
        "source vector (≤ occupancy rows), reciprocity is ONE ids-only " +
        "self-join of the |members|-row edge list, and the output " +
        "aggregates by cell — bounded by K, never the corpus"),
      "q155_sq8_error" -> ("SQ8 reconstruction-error audit over the " +
        "persisted code table (r14): one sq8_codes⋈embeddings id join " +
        "feeds a map-only decode; the top-10 worst vectors come from " +
        "TakeOrderedAndProject — no global window ever sees the " +
        "corpus-sized error frame"),
      "q158_heaps_law" -> ("Heaps vocabulary curve with NO global rank: " +
        "five value cutoffs broadcast from one max(doc_id); vocabulary " +
        "attributes to each term's first-occurrence doc, so every " +
        "checkpoint is a filter + count over the vocab frame — one " +
        "corpus pass total, windowless (PlanSpec-gated)"),
      "q164_item_pagerank" -> ("iterative computation done the Spark " +
        "way (r14): the co-engagement edge list, degrees, and node set " +
        "pin once; each of the three unrolled PageRank iterations is " +
        "one edge⋈rank join + a node-keyed fold over the pinned frames " +
        "— zero source rescans (PlanSpec-gated), integer micro-unit " +
        "ranks, TakeOrdered top-10; r15: the edge build rides the " +
        "one-sided shard cover, so a power user cannot concentrate k² " +
        "rows on one join key"),
      "q167_centered_ivf" -> ("q146's index-served scale path (r15; " +
        "r16 probed-first): the corpus mean folds from the mean_stats " +
        "delta ledger (#commits×64 rows — never a corpus scan), probe " +
        "ranking centers the 8 persisted centroids against it and " +
        "materializes once as a driver-local relation, the In-pruned " +
        "cell membership restricts ids-only and broadcasts, and the " +
        "embeddings parquet appears only for the candidate payload " +
        "(PlanSpec-gated ≤2 scans + pruned-file asserts)"),
      "q147_doc_keywords" -> ("keywords as a MAINTAINED artifact " +
        "(r15): a read is the doc_keywords table plus an order — no " +
        "postings read, no df aggregate, no scoring window per read; " +
        "the maintainers re-price exactly the docs each batch touches"),
      "q177_triangle_census" -> ("triangle counting the skew-safe way " +
        "(r15): the wedge self-join on the center node rides the " +
        "one-sided shard cover (no task holds a hub's full " +
        "neighborhood square), closure is one ids-only equi-join back " +
        "to the canonical edge list, and the card is TakeOrdered " +
        "top-10 over dup-involved docs only"),
      "q179_principal_direction" -> ("PCA power iteration the Spark " +
        "way (r15): one map-only corpus pass hash-aggregates the d² " +
        "fixed-point Gram with map-side combine (the shuffle carries " +
        "4096 partials per task, never rows); the six unrolled " +
        "iterations join the pinned d²-bounded matrix with a d-row " +
        "vector frame — the corpus parquet appears exactly once, at " +
        "artifact build (memoized: q184's deflated pass rides it)"),
      "q182_mmr_rerank" -> ("greedy selection the Spark way (r15): " +
        "candidates ride the q55 broadcast shape, the q·k²-bounded " +
        "pairwise-sim frame pins once, and the four unrolled MMR " +
        "steps are anti-join + max-fold + per-query rank-1 windows " +
        "over those pinned frames — integral scores, zero corpus " +
        "rescans"),
      "q194_watermark_replay" -> ("global running max WITHOUT a global " +
        "window and WITHOUT a pin (r17): bucket boundaries are literal " +
        "longs from one bounded approxQuantile collect, the bucket id " +
        "is a pure row expression (size(filter(...))) , the window " +
        "partitions per bucket, and the preceding-buckets max arrives " +
        "as a broadcast literal map — no repartitionByRange, no " +
        "localCheckpoint, fault-tolerant end to end"))

    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of headline queries\n\n")
    sb.append(s"Generated by `graft.PlanDump` on `$sfDir`. Regenerate:\n")
    sb.append("`spark-submit --class graft.PlanDump target/scala-2.13/*.jar`.\n")
    headline.foreach { case (name, note) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name\n\n$note\n\n```\n$plan```\n")
    }
    // hand-written scale narratives live below the marker — regenerating
    // the plan dumps must never destroy them
    val marker = "<!-- scale narratives: hand-written; PlanDump preserves " +
      "everything below this marker -->"
    val path = Paths.get("PLANS.md")
    val tail =
      if (Files.exists(path)) {
        val old = Files.readString(path)
        val i = old.indexOf(marker)
        if (i >= 0) old.substring(i) else marker + "\n"
      } else marker + "\n"
    Files.writeString(path, sb.toString + "\n" + tail)
    println(s"wrote PLANS.md (${headline.size} plans; narratives preserved)")
    spark.stop()
  }
}
