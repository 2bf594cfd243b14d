package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.{Tables, Tok}

/** Remaining SURVEY.md §2.B surfaces: generator (UDTF via explode/
  * posexplode), typed Aggregator (UDAF), pivot, and correlated scalar
  * subqueries.
  */
object Extended {

  /** Generator surface: posexplode over per-document word arrays →
    * token frequency table. The generate runs map-side; only the
    * (token, count) aggregate shuffles. */
  def q14Explode(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(Tok.ws(col("text")))
        .as(Seq("pos", "word")))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"),
        min(col("pos")).cast("int").as("min_pos"))
      .filter(col("n") >= 100)
      .orderBy(col("word"))

  val q14Sql: String =
    raw"""SELECT word, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs,
      |  CAST(MIN(pos) AS INTEGER) AS min_pos
      |FROM (
      |  SELECT doc_id, UNNEST(${Tok.wsSql("text")}) AS word,
      |    generate_subscripts(${Tok.wsSql("text")}, 1) - 1 AS pos
      |  FROM documents)
      |GROUP BY word HAVING COUNT(*) >= 100 ORDER BY word""".stripMargin

  /** Typed Aggregator (UDAF surface): exact money-sum over cents — the
    * Aggregator form of the Exact.sumMoney pattern, registered as a
    * column aggregator via `udaf`-style `toColumn` on a typed Dataset. */
  object CentsSum extends Aggregator[Double, Long, Double] {
    def zero: Long = 0L
    def reduce(b: Long, a: Double): Long = b + math.round(a * 100)
    def merge(b1: Long, b2: Long): Long = b1 + b2
    def finish(r: Long): Double = r / 100.0
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def q15Udaf(s: SparkSession, dir: String): DataFrame = {
    val centsSum = udaf(CentsSum)
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(centsSum(col("o_totalprice")).as("total_spend"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))
  }

  val q15Sql: String =
    s"""SELECT o_orderstatus, ${Exact.sqlSumMoney("o_totalprice")} AS total_spend,
       |  COUNT(*) AS n
       |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Pivot: order counts per priority, pivoted on status (fixed value
    * list so the output schema is static — the scalable form; pivot with
    * value discovery would need an extra pass). */
  def q16Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("o_orderpriority"))

  val q16Sql: String =
    """SELECT o_orderpriority,
      |  CAST(SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
      |  CAST(SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
      |  CAST(SUM(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Correlated scalar subquery + uncorrelated scalar subquery, via
    * spark.sql so Catalyst's decorrelation rewrites both into joins. */
  def q17Subquery(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("sq_orders")
    Tables.customer(s, dir).createOrReplaceTempView("sq_customer")
    s.sql(
      """SELECT c_custkey,
        |  (SELECT COUNT(*) FROM sq_orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |  CAST(c_acctbal > (SELECT AVG(c_acctbal) FROM sq_customer) AS BOOLEAN) AS above_avg
        |FROM sq_customer c ORDER BY c_custkey""".stripMargin)
  }

  val q17Sql: String =
    """SELECT c_custkey,
      |  (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
      |  c_acctbal > (SELECT AVG(c_acctbal) FROM customer) AS above_avg
      |FROM customer c ORDER BY c_custkey""".stripMargin

  /** Map-typed column functions: construction, lookup, cardinality,
    * key/value extraction — per-row deterministic (no collect_list). */
  def q18Map(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      map(lit("status"), col("o_orderstatus"),
        lit("prio"), col("o_orderpriority")).as("m"))
      .select(
        col("o_orderkey"),
        element_at(col("m"), "status").as("status"),
        element_at(col("m"), "prio").as("prio"),
        size(col("m")).as("m_size"),
        array_join(map_keys(col("m")), ",").as("keys_joined"))
      .orderBy(col("o_orderkey"))

  val q18Sql: String =
    """SELECT o_orderkey,
      |  m['status'][1] AS status, m['prio'][1] AS prio,
      |  CAST(cardinality(m) AS INTEGER) AS m_size,
      |  array_to_string(map_keys(m), ',') AS keys_joined
      |FROM (SELECT o_orderkey,
      |        MAP {'status': o_orderstatus, 'prio': o_orderpriority} AS m
      |      FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  /** INTERSECT ALL (multiset intersection) — completes the set-op family. */
  def q19IntersectAll(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_nationkey").cast("int").as("nationkey"))
      .intersectAll(Tables.supplier(s, dir)
        .select(col("s_nationkey").cast("int").as("nationkey")))
      .groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("nationkey"))

  val q19Sql: String =
    """SELECT nationkey, COUNT(*) AS n FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  INTERSECT ALL SELECT s_nationkey FROM supplier)
      |GROUP BY nationkey ORDER BY nationkey""".stripMargin

  /** DecimalType arithmetic: exact fixed-point aggregation (the decimal
    * half of the type-system table, SURVEY.md §1.2); final cast to double
    * keeps the output dtype engine-neutral while every intermediate step
    * is exact decimal math. */
  def q35Decimal(s: SparkSession, dir: String): DataFrame = {
    val dec = col("o_totalprice").cast("decimal(12,2)")
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        sum(dec).cast("double").as("sum_dec"),
        max(dec).cast("double").as("max_dec"),
        min(dec).cast("double").as("min_dec"),
        (sum(dec).cast("double") / count(lit(1))).as("avg_dec"))
      .orderBy(col("o_orderstatus"))
  }

  val q35Sql: String =
    """SELECT o_orderstatus,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_dec,
      |  CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_dec,
      |  CAST(MIN(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS min_dec,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_dec
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Pure non-equi (range) join: events banded by value against an
    * inline band dimension — no equi key, so Catalyst plans a
    * BroadcastNestedLoopJoin; correct at scale only because the build
    * side is O(bands). (The equi+residual theta shape is q09.) */
  def q36RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val bands = s.range(5).select(
      col("id").cast("int").as("band_id"),
      (col("id") * 100.0).as("lo"), ((col("id") + 1) * 100.0).as("hi"))
    graft.Tables.events(s, dir)
      .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n"), Exact.sumMoney(col("value")).as("val"))
      .orderBy(col("band_id"))
  }

  val q36Sql: String =
    s"""SELECT band_id, COUNT(*) AS n, ${Exact.sqlSumMoney("value")} AS val
       |FROM events JOIN (
       |  SELECT CAST(r AS INTEGER) AS band_id, r*100.0 AS lo, (r+1)*100.0 AS hi
       |  FROM range(5) t(r)) bands
       |ON value >= lo AND value < hi
       |GROUP BY band_id ORDER BY band_id""".stripMargin

  /** Deterministic integer PageRank over the item co-engagement graph
    * (q164) — the ITERATIVE-computation shape (power method as
    * repeated joins) every graph workload reduces to on Spark, done
    * the way it survives scale: the edge list is built ONCE (per-user
    * distinct items, one user-keyed self-join, pair-keyed weights) and
    * pinned; each of the 3 unrolled iterations is one edge⋈rank join +
    * one node-keyed aggregation against that pinned frame — no
    * recursion, no driver loop over rows, and at 100 TB the edge frame
    * would be bucketed by item so every iteration's join is
    * co-located. The pins here are localCheckpoints — adjudicated for
    * the iterative shape (recompute is exponential in iterations) —
    * but NON-fault-tolerant; a real 1000-executor run moves the graph
    * to a reliable checkpoint or a warehouse table (the bucketed edge
    * table above IS that table) so a lost executor re-reads instead of
    * killing the job. Items are the events' `props.k` payload;
    * co-engaging the same user makes an (undirected, weight =
    * co-engaging users) edge.
    *
    * Determinism (the q119/q145 integer discipline): ranks live in
    * PER-NODE micro-units — every node starts at 10⁶ and the jump
    * term is the constant 0.15·10⁶ (total mass 10⁶·N), so the fixed
    * point keeps full resolution at ANY node count (a shared-mass
    * unit of 10⁶ would truncate to all-zero ranks past ~10⁵ items —
    * exactly the scale this card targets); each contribution
    * (pr(b)·w(ab)) div d(b) multiplies in DECIMAL (DuckDB: HUGEINT —
    * rank·weight passes int64 once users reach 10¹²) and truncates
    * independently (order-free sum); the damping mix is a constant
    * plus one truncating division. Isolated items keep the jump term.
    * Top-10 by (rank desc, item) via distributed TakeOrdered. */
  def q164ItemPagerank(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ui = Tables.events(s, dir)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      // events without a '$.k' payload carry no item: excluded as a
      // stated convention (Spark orders NULLs first, DuckDB last — a
      // NULL node would silently diverge the oracle tiebreaks)
      .filter(col("item").isNotNull)
      .distinct()
      .localCheckpoint() // pins the bipartite frame for the self-join
    // the co-engagement self-join rides the one-sided shard cover: a
    // bot/power user with k items would otherwise emit k² pairs on ONE
    // user_id key (10⁶ items ⇒ 10¹² rows in one task); the cover's
    // output multiset is exactly the naive join's (DedupGuardSpec), so
    // the edge weights — and the oracle hash — are unchanged
    val edges = graft.Skew.guardedKeyJoin(
        ui, ui.select(col("user_id"), col("item").as("item_b")),
        "user_id", "item", "item_b",
        // same family as q171 (the identical ui self-join): one
        // pre-check measurement serves both, and q169's audit names it
        family = Some(s"$dir#events.user_id.distinct_items"))
      .filter(col("item") =!= col("item_b"))
      .groupBy(col("item"), col("item_b")).agg(count(lit(1)).as("w"))
      .localCheckpoint() // the graph: all three iterations re-join it
    val deg = edges.groupBy(col("item_b")).agg(sum(col("w")).as("d"))
      .localCheckpoint() // out-degree of each flow SOURCE
    val nodes = ui.select(col("item")).distinct().localCheckpoint()
    var pr = nodes.select(col("item"), lit(1000000L).as("pr_u"))
    for (_ <- 1 to 3) {
      val flow = edges
        .join(pr.select(col("item").as("item_b"), col("pr_u").as("prb")),
          Seq("item_b"))
        .join(deg, Seq("item_b"))
        .withColumn("c", expr("(cast(prb as decimal(20,0)) * w) div d"))
        .groupBy(col("item")).agg(sum(col("c")).as("flow_u"))
      pr = nodes
        .join(flow, Seq("item"), "left")
        .select(col("item"),
          (lit(150000L) +
            expr("(85 * coalesce(flow_u, 0L)) div 100")).as("pr_u"))
    }
    pr.join(deg.select(col("item_b").as("item"), col("d")), Seq("item"),
        "left")
      .select(col("item"), col("pr_u"),
        coalesce(col("d"), lit(0L)).as("degree"))
      .orderBy(col("pr_u").desc, col("item")).limit(10)
      .withColumn("rn", row_number().over(Window
        .orderBy(col("pr_u").desc, col("item"))).cast("int"))
      .select(col("rn"), col("item"), col("pr_u"), col("degree"))
      .orderBy(col("rn"))
  }

  /** DuckDB replay of q164: the same edge construction and the three
    * iterations unrolled (the Lloyd's-replay recipe), HUGEINT
    * contribution products, identical truncating divisions. */
  val q164Sql: String = {
    def iter(i: Int): String =
      s"""f$i AS (
        |  SELECT e.item,
        |    CAST(SUM((CAST(p.pr_u AS HUGEINT) * e.w) // d.d) AS BIGINT)
        |      AS flow_u
        |  FROM e JOIN p${i - 1} p ON p.item = e.item_b
        |  JOIN deg d ON d.item_b = e.item_b
        |  GROUP BY 1),
        |p$i AS (
        |  SELECT n.item,
        |    CAST(150000
        |      + (85 * COALESCE(f.flow_u, 0)) // 100 AS BIGINT) AS pr_u
        |  FROM nodes n LEFT JOIN f$i f USING (item))""".stripMargin
    s"""WITH ui AS (
      |  SELECT DISTINCT user_id, item FROM (
      |    SELECT user_id,
      |      CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
      |    FROM events) WHERE item IS NOT NULL),
      |e AS (
      |  SELECT a.item AS item, b.item AS item_b,
      |    CAST(COUNT(*) AS BIGINT) AS w
      |  FROM ui a JOIN ui b
      |    ON a.user_id = b.user_id AND a.item <> b.item
      |  GROUP BY 1, 2),
      |deg AS (SELECT item_b, CAST(SUM(w) AS BIGINT) AS d FROM e GROUP BY 1),
      |nodes AS (SELECT DISTINCT item FROM ui),
      |p0 AS (SELECT item, CAST(1000000 AS BIGINT) AS pr_u FROM nodes),
      |${iter(1)},
      |${iter(2)},
      |${iter(3)}
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY p3.pr_u DESC, p3.item)
      |    AS INTEGER) AS rn,
      |  p3.item, p3.pr_u, CAST(COALESCE(deg.d, 0) AS BIGINT) AS degree
      |FROM p3 LEFT JOIN deg ON deg.item_b = p3.item
      |QUALIFY rn <= 10 ORDER BY rn""".stripMargin
  }

  /** HITS hubs & authorities (q183) — Kleinberg's mutual-reinforcement
    * scores (JACM 1999) run directly on the BIPARTITE user-item
    * engagement graph, the shape q164's PageRank flattens away: an
    * AUTHORITY is an item engaged by broad users (hubs), a HUB is a
    * user who engages authoritative items — the two-sided ranking a
    * recommender bootstrap or crawl scheduler starts from. Three
    * mutual-reinforcement rounds (h = A·a then a = Aᵀ·h), each
    * half-step rescaled to ≤10⁶ by its max (all values non-negative,
    * so the truncating division is engine-identical); top-10 items by
    * (authority, item) with the item's distinct-user degree.
    *
    * Scale shape: the q164/q171 ids-only distinct frame pins once;
    * every half-step is one edge⋈score join + a keyed fold with
    * map-side combine + a 1-row broadcast max — bounded by |users| and
    * |items|, never re-touching the events source (the unrolled-
    * iteration discipline, PlanSpec-gated for q164's family). */
  def q183Hits(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ui = Tables.events(s, dir)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .filter(col("item").isNotNull) // the q164 itemless-event convention
      .distinct()
      .localCheckpoint() // ids-only bipartite frame; 6 half-steps re-join it
    var a = ui.select(col("item")).distinct()
      .select(col("item"), lit(1000000L).as("a_u"))
      .localCheckpoint()
    var h: DataFrame = null
    for (_ <- 1 to 3) {
      val hRaw = ui.join(a, Seq("item"))
        .groupBy(col("user_id")).agg(sum(col("a_u")).as("hr"))
      val hMax = hRaw.agg(greatest(max(col("hr")), lit(1L)).as("hm"))
      h = hRaw.crossJoin(broadcast(hMax))
        .select(col("user_id"),
          expr("(cast(hr as decimal(20,0)) * 1000000) div hm").as("h_u"))
        .localCheckpoint()
      val aRaw = ui.join(h, Seq("user_id"))
        .groupBy(col("item")).agg(sum(col("h_u")).as("ar"))
      val aMax = aRaw.agg(greatest(max(col("ar")), lit(1L)).as("am"))
      a = aRaw.crossJoin(broadcast(aMax))
        .select(col("item"),
          expr("(cast(ar as decimal(20,0)) * 1000000) div am").as("a_u"))
        .localCheckpoint()
    }
    val deg = ui.groupBy(col("item")).agg(count(lit(1)).as("n_users"))
    a.join(deg, Seq("item"))
      .orderBy(col("a_u").desc, col("item")).limit(10)
      .withColumn("rn", row_number().over(Window
        .orderBy(col("a_u").desc, col("item"))).cast("int"))
      .select(col("rn"), col("item"), col("a_u"), col("n_users"))
      .orderBy(col("rn"))
  }

  /** DuckDB replay of q183: the q164 `ui` derivation, the three rounds
    * unrolled with HUGEINT folds and the same max-rescale, identical
    * top-10 tiebreaks. */
  val q183Sql: String = {
    def round(r: Int): String =
      s"""hr$r AS MATERIALIZED (
        |  SELECT ui.user_id, CAST(SUM(a.a_u) AS HUGEINT) AS raw
        |  FROM ui JOIN a${r - 1} a USING (item) GROUP BY 1),
        |h$r AS MATERIALIZED (
        |  SELECT user_id,
        |    CAST((raw * 1000000) //
        |      GREATEST((SELECT MAX(raw) FROM hr$r), 1) AS BIGINT) AS h_u
        |  FROM hr$r),
        |ar$r AS MATERIALIZED (
        |  SELECT ui.item, CAST(SUM(h.h_u) AS HUGEINT) AS raw
        |  FROM ui JOIN h$r h USING (user_id) GROUP BY 1),
        |a$r AS MATERIALIZED (
        |  SELECT item,
        |    CAST((raw * 1000000) //
        |      GREATEST((SELECT MAX(raw) FROM ar$r), 1) AS BIGINT) AS a_u
        |  FROM ar$r)""".stripMargin
    s"""WITH ui AS MATERIALIZED (
      |  SELECT DISTINCT user_id, item FROM (
      |    SELECT user_id,
      |      CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
      |    FROM events) WHERE item IS NOT NULL),
      |a0 AS (SELECT DISTINCT item, CAST(1000000 AS BIGINT) AS a_u FROM ui),
      |${round(1)},
      |${round(2)},
      |${round(3)},
      |deg AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_users
      |        FROM ui GROUP BY 1)
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY a.a_u DESC, a.item)
      |    AS INTEGER) AS rn,
      |  a.item, a.a_u, deg.n_users
      |FROM a3 a JOIN deg USING (item)
      |QUALIFY rn <= 10 ORDER BY rn""".stripMargin
  }

  /** Co-engagement pair mining (q171) — the item-item co-occurrence
    * table every "users who engaged with X also engaged with Y"
    * recommender starts from (the swing/co-view statistic), and the
    * standalone surface of q164's edge build: unordered item pairs
    * weighted by the number of distinct users engaging BOTH, top-20 by
    * (weight, pair). The self-join rides the one-sided shard cover
    * ([[graft.Skew.guardedKeyJoin]]) so a bot/power user cannot
    * concentrate k² candidate rows on one user_id key — the cover's
    * multiset equals the naive join's (DedupGuardSpec), so the weights
    * are exact.
    *
    * Scale shape: per-user distinct items (ids only), the guarded
    * self-join, one pair-keyed aggregation with map-side combine,
    * distributed TakeOrdered top-20 + 20-row rank. Itemless events
    * excluded (the q164 convention). */
  def q171CopairTopk(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ui = Tables.events(s, dir)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .filter(col("item").isNotNull)
      .distinct()
      // ids-only bounded frame, pinned (the q164 convention): the
      // cover's sizes + both sharded sides would otherwise re-run the
      // events scan and the distinct shuffle ~4×
      .localCheckpoint()
    val pairs = graft.Skew.guardedKeyJoin(
        ui, ui.select(col("user_id"), col("item").as("item_b")),
        "user_id", "item", "item_b",
        family = Some(s"$dir#events.user_id.distinct_items")) // = q164's
      .filter(col("item") < col("item_b")) // each unordered pair once
      .groupBy(col("item"), col("item_b"))
      .agg(count(lit(1)).as("n_users"))
    pairs.orderBy(col("n_users").desc, col("item"), col("item_b"))
      .limit(20)
      .withColumn("rn", row_number().over(Window
        .orderBy(col("n_users").desc, col("item"), col("item_b"))).cast("int"))
      .select(col("rn"), col("item"), col("item_b"), col("n_users"))
      .orderBy(col("rn"))
  }

  /** DuckDB replay of q171: the NAIVE self-join (the cover's output
    * multiset is identical by construction — this oracle is also the
    * guard's cross-engine equivalence proof on real data), same
    * distinct/exclusion conventions, same top-20 tiebreaks. */
  val q171Sql: String =
    s"""WITH ui AS (
      |  SELECT DISTINCT user_id, item FROM (
      |    SELECT user_id,
      |      CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
      |    FROM events) WHERE item IS NOT NULL),
      |p AS (
      |  SELECT a.item, b.item AS item_b, CAST(COUNT(*) AS BIGINT) AS n_users
      |  FROM ui a JOIN ui b
      |    ON a.user_id = b.user_id AND a.item < b.item
      |  GROUP BY 1, 2)
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_users DESC, item, item_b)
      |    AS INTEGER) AS rn,
      |  item, item_b, n_users
      |FROM p QUALIFY rn <= 20 ORDER BY rn""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q164_item_pagerank" -> q164ItemPagerank _,
    "q171_copair_topk" -> q171CopairTopk _,
    "q183_hits" -> q183Hits _,
    "q36_range_join"    -> q36RangeJoin _,
    "q35_decimal_agg"   -> q35Decimal _,
    "q14_explode_udtf"  -> q14Explode _,
    "q15_udaf_centssum" -> q15Udaf _,
    "q16_pivot"         -> q16Pivot _,
    "q17_scalar_subq"   -> q17Subquery _,
    "q18_map_funcs"     -> q18Map _,
    "q19_intersect_all" -> q19IntersectAll _,
  )

  val oracle: Map[String, String] = Map(
    "q164_item_pagerank" -> q164Sql,
    "q171_copair_topk" -> q171Sql,
    "q183_hits" -> q183Sql,
    "q36_range_join"    -> q36Sql,
    "q35_decimal_agg"   -> q35Sql,
    "q14_explode_udtf"  -> q14Sql,
    "q15_udaf_centssum" -> q15Sql,
    "q16_pivot"         -> q16Sql,
    "q17_scalar_subq"   -> q17Sql,
    "q18_map_funcs"     -> q18Sql,
    "q19_intersect_all" -> q19Sql,
  )
}
