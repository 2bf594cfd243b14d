package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import Exact._

/** Window functions (ranking / analytic / frames), multi-dimensional
  * grouping (rollup / cube / grouping sets), distinct and approx-distinct
  * aggregation, and set operations (SURVEY.md §2.B). All window specs
  * partition on a key so the sort is per-key within a shuffle partition —
  * no global sort at 100 TB; skew lands on the largest single key only.
  */
object Windows {

  /** Ranking trio: row_number (with full tiebreak → deterministic), and
    * rank/dense_rank over the value alone (tie-stable). */
  def q20Rank(s: SparkSession, dir: String): DataFrame = {
    val byPrice = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_extendedprice").desc)
    val exact = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .withColumn("rn", row_number().over(exact))
      .withColumn("rnk", rank().over(byPrice))
      .withColumn("drnk", dense_rank().over(byPrice))
      .filter(col("rn") <= 3)
      .orderBy(col("l_orderkey"), col("rn"))
  }

  val q20Sql: String =
    """SELECT * FROM (
      |  SELECT l_orderkey, l_linenumber, l_extendedprice,
      |    ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber) AS rn,
      |    RANK() OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC) AS rnk,
      |    DENSE_RANK() OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC) AS drnk
      |  FROM lineitem)
      |WHERE rn <= 3 ORDER BY l_orderkey, rn""".stripMargin

  /** Running total (rows frame) with exact cents arithmetic. */
  def q21Running(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("run_spend", sum(cents(col("o_totalprice"))).over(w) / 100.0)
      .select(col("o_custkey"), col("o_orderkey"), col("run_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q21Sql: String =
    s"""SELECT o_custkey, o_orderkey,
       |  SUM(${sqlCents("o_totalprice")}) OVER (PARTITION BY o_custkey
       |    ORDER BY o_orderdate, o_orderkey
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)/100.0 AS run_spend
       |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** lag/lead analytics over each user's event time-line. */
  def q22LagLead(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .select(col("event_id"), col("user_id"), col("prev_value"), col("next_type"))
      .orderBy(col("event_id"))
  }

  val q22Sql: String =
    s"""WITH ${Tables.eventsOracleCte}
       |SELECT event_id, user_id,
       |  LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
       |  LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
       |FROM events_n ORDER BY event_id""".stripMargin

  /** ntile / percent_rank / cume_dist distribution stats — computed
    * WITHOUT a partition-less window (`Window.orderBy` with no
    * partitionBy funnels every row through one task: correct at sf0.1,
    * a guaranteed straggler/OOM at 100×).
    *
    * Two-pass global-index plan (the zipWithIndex pattern, declarative):
    * range-partition on the sort key, collect only the per-partition row
    * COUNTS (numShufflePartitions longs — metadata-scale, same class as
    * an AQE stat), broadcast the prefix-sum offsets back as a literal
    * map, and add them to per-partition row_numbers — every window below
    * partitions on a key. One descending global row number `rn` then
    * gives all three stats arithmetically:
    *   ntile(k): bucket boundaries are pure functions of (rn, N);
    *   rank_asc(v)  = N - max(rn over value group) + 1
    *     → percent_rank = (rank_asc-1)/(N-1) = (N - max rn)/(N-1);
    *   #rows ≤ v    = N - min(rn over value group) + 1 → cume_dist.
    * The localCheckpoint pins partition ids so the counts job and the
    * main job see identical layouts — and unlike a persist() it bypasses
    * the CacheManager (no plan-substitution surprises for later queries)
    * and is released by the ContextCleaner once unreferenced. At cluster
    * scale: a reliable checkpoint plays the same role. */
  def q23Ntile(s: SparkSession, dir: String): DataFrame = {
    val key = Seq(col("c_acctbal").desc, col("c_custkey").asc)
    val parts = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_acctbal"))
      .repartitionByRange(key: _*)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val sizes = parts.groupBy(col("pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val n = sizes.map(_._2).sum
    val offsets: Map[Int, Long] =
      sizes.map(_._1).zip(sizes.map(_._2).scanLeft(0L)(_ + _)).toMap
    val offset = element_at(typedLit(offsets), col("pid"))
    val wPid = Window.partitionBy(col("pid")).orderBy(key: _*)
    val vGroup = Window.partitionBy(col("c_acctbal"))
    // ntile(4) split: first (n mod 4) buckets take ceil(n/4) rows
    val (q4, r4) = (n / 4, n % 4)
    val rn = col("rn_desc")
    val tile =
      when(lit(r4) > 0 && rn <= lit((q4 + 1) * r4),
        floor((rn - 1) / lit(q4 + 1)) + 1)
      .otherwise(lit(r4) + floor((rn - lit((q4 + 1) * r4) - 1) / lit(math.max(q4, 1L))) + 1)
    parts
      .withColumn("rn_desc", offset + row_number().over(wPid))
      .withColumn("tile", tile.cast("int"))
      .withColumn("pr", (lit(n) - max(rn).over(vGroup)) / lit(math.max(n - 1, 1L)))
      .withColumn("cd", (lit(n) - min(rn).over(vGroup) + 1) / lit(n))
      .select(col("c_custkey"), col("c_acctbal"), col("tile"), col("pr"), col("cd"))
      .orderBy(col("c_custkey"))
  }

  val q23Sql: String =
    """SELECT c_custkey, c_acctbal,
      |  NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS tile,
      |  PERCENT_RANK() OVER (ORDER BY c_acctbal) AS pr,
      |  CUME_DIST() OVER (ORDER BY c_acctbal) AS cd
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Value-range frame (RANGE BETWEEN n PRECEDING) over a numeric order key. */
  def q24RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      .rangeBetween(-100, 0)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("spend_win", sum(cents(col("o_totalprice"))).over(w) / 100.0)
      .select(col("o_custkey"), col("o_orderkey"), col("n_win"), col("spend_win"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q24Sql: String =
    s"""SELECT o_custkey, o_orderkey,
       |  COUNT(*) OVER w AS n_win,
       |  SUM(${sqlCents("o_totalprice")}) OVER w/100.0 AS spend_win
       |FROM orders
       |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
       |  RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
       |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** ROLLUP over the region→nation hierarchy; gid disambiguates the null
    * subtotal rows deterministically on both engines. */
  def q25Rollup(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), sumMoney(col("c_acctbal")).as("acct"),
        (grouping(col("r_name")) * 2 + grouping(col("n_name"))).as("gid"))
      .orderBy(col("gid"), col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  val q25Sql: String =
    s"""SELECT r_name, n_name, COUNT(*) AS n_cust, ${sqlSumMoney("c_acctbal")} AS acct,
       |  GROUPING(r_name)*2 + GROUPING(n_name) AS gid
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP (r_name, n_name)
       |ORDER BY gid, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin

  /** CUBE over two independent dimensions. */
  def q26Cube(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .cube(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sumMoney(col("o_totalprice")).as("spend"),
        (grouping(col("c_mktsegment")) * 2 + grouping(col("o_orderpriority"))).as("gid"))
      .orderBy(col("gid"), col("c_mktsegment").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  val q26Sql: String =
    s"""SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n,
       |  ${sqlSumMoney("o_totalprice")} AS spend,
       |  GROUPING(c_mktsegment)*2 + GROUPING(o_orderpriority) AS gid
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY CUBE (c_mktsegment, o_orderpriority)
       |ORDER BY gid, c_mktsegment NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** GROUPING SETS via Spark SQL over a temp view. */
  def q27GroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("gs_lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(l_quantity) AS BIGINT) AS qty,
        |  GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS gid
        |FROM gs_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  val q27Sql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(l_quantity) AS BIGINT) AS qty,
      |  GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS gid
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** DISTINCT projection (dropDuplicates). */
  def q28Distinct(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .dropDuplicates()
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))

  val q28Sql: String =
    """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  /** Exact COUNT(DISTINCT) per group (Catalyst plans the expand +
    * two-phase aggregate; at scale this is the partial-distinct pattern). */
  def q29CountDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"), count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  val q29Sql: String =
    """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** approx_count_distinct (HLL++, default 5% rsd) gated against the
    * exact distincts: the output carries the exact counts plus booleans
    * asserting each estimate sits within 3 standard errors (15%) — the
    * shape that makes an approximate operator oracle-checkable (DuckDB
    * replays the exact side and the literal TRUEs; a drifting estimator
    * flips a boolean and fails the hash). The estimates themselves stay
    * out of the output — they are engine-specific by construction. The
    * 100 TB answer to COUNT(DISTINCT). */
  def q30ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("ap"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_orderkey")).as("ao"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
        (abs(col("ap") - col("exact_parts")) <=
          col("exact_parts") * 0.15).as("parts_within_bound"),
        (abs(col("ao") - col("exact_orders")) <=
          col("exact_orders") * 0.15).as("orders_within_bound"))
      .orderBy(col("l_returnflag"))

  val q30Sql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS exact_parts,
      |  COUNT(DISTINCT l_orderkey) AS exact_orders,
      |  TRUE AS parts_within_bound, TRUE AS orders_within_bound
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** UNION ALL of two keyed projections, re-aggregated. */
  def q31UnionAll(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_nationkey").cast("int").as("nationkey"))
    val p = Tables.supplier(s, dir).select(col("s_nationkey").cast("int").as("nationkey"))
    c.unionByName(p).groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("nationkey"))
  }

  val q31Sql: String =
    """SELECT nationkey, COUNT(*) AS n FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  UNION ALL SELECT s_nationkey FROM supplier)
      |GROUP BY nationkey ORDER BY nationkey""".stripMargin

  /** INTERSECT (distinct set semantics). */
  def q32Intersect(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_nationkey").cast("int").as("nationkey"))
      .intersect(Tables.supplier(s, dir).select(col("s_nationkey").cast("int").as("nationkey")))
      .orderBy(col("nationkey"))

  val q32Sql: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin

  /** EXCEPT ALL (multiset difference), re-aggregated to stay compact. */
  def q33ExceptAll(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_nationkey").cast("int").as("nationkey"))
      .exceptAll(Tables.supplier(s, dir).select(col("s_nationkey").cast("int").as("nationkey")))
      .groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("nationkey"))

  val q33Sql: String =
    """SELECT nationkey, COUNT(*) AS n FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  EXCEPT ALL SELECT s_nationkey FROM supplier)
      |GROUP BY nationkey ORDER BY nationkey""".stripMargin

  /** Skew-safe two-stage aggregation: the skewed key (event_type has ~8
    * values over 100k+ rows) is salted into 16 sub-keys for the first
    * shuffle, then the partials re-aggregate on the bare key — the salt
    * bounds any single reducer's share at 1/16 of the hottest key. Exact
    * cents arithmetic keeps the result equal to the unsalted oracle. */
  def q34SaltedAgg(s: SparkSession, dir: String): DataFrame = {
    val salted = graft.Tables.events(s, dir)
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("n_part"), sum(cents(col("value"))).as("cents_part"))
    salted.groupBy(col("event_type"))
      .agg(sum(col("n_part")).as("n"), (sum(col("cents_part")) / 100.0).as("val"))
      .orderBy(col("event_type"))
  }

  val q34Sql: String =
    s"""SELECT event_type, COUNT(*) AS n, ${sqlSumMoney("value")} AS val
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Statistical aggregate family: stddev/variance (sample + population),
    * correlation, covariance — Spark's distributed moment merge vs
    * DuckDB's streaming accumulation differ only in final-ulp float
    * noise, so results round to 4dp (columns kept at small magnitudes:
    * quantity 1-50, discount 0-0.1 — a 4dp round leaves 1e-6 relative
    * headroom, far above either engine's error). */
  def q37StatsAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(stddev_samp(col("l_quantity")), 4).as("qty_sd"),
        round(stddev_pop(col("l_quantity")), 4).as("qty_sd_pop"),
        round(var_samp(col("l_discount")), 6).as("disc_var"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("qty_disc_cov"))
      .orderBy(col("l_returnflag"))

  val q37Sql: String =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  ROUND(STDDEV_SAMP(l_quantity), 4) AS qty_sd,
      |  ROUND(STDDEV_POP(l_quantity), 4) AS qty_sd_pop,
      |  ROUND(VAR_SAMP(l_discount), 6) AS disc_var,
      |  ROUND(CORR(l_quantity, l_extendedprice), 6) AS qty_price_corr,
      |  ROUND(COVAR_SAMP(l_quantity, l_discount), 6) AS qty_disc_cov
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Exact (interpolating) percentiles + median per group — the exact
    * complement to q30's approximate HLL path. Spark `percentile` and
    * DuckDB `quantile_cont` share the same linear-interpolation
    * definition; 6dp rounding absorbs ulp noise.
    *
    * Scale note: Spark's Percentile buffers a value→count map per group,
    * so memory is bounded by the DISTINCT-value domain, not row count —
    * fine for 2dp money (≤ ~1e7 entries worst case at any data size).
    * For unbounded-domain columns at 100 TB the scale path is
    * approx_percentile (t-digest sketch, merged map-side like q30's
    * HLL), engine-specific → it would be a rows-only query. */
  def q38Percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.25)"), 6).as("p25"),
        round(expr("percentile(o_totalprice, 0.5)"), 6).as("p50"),
        round(expr("percentile(o_totalprice, 0.75)"), 6).as("p75"),
        round(expr("median(o_totalprice)"), 6).as("med"))
      .orderBy(col("o_orderstatus"))

  val q38Sql: String =
    """SELECT o_orderstatus,
      |  ROUND(QUANTILE_CONT(o_totalprice, 0.25), 6) AS p25,
      |  ROUND(QUANTILE_CONT(o_totalprice, 0.5), 6) AS p50,
      |  ROUND(QUANTILE_CONT(o_totalprice, 0.75), 6) AS p75,
      |  ROUND(MEDIAN(o_totalprice), 6) AS med
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_stats_agg"       -> q37StatsAgg _,
    "q38_percentiles"     -> q38Percentiles _,
    "q34_salted_agg"      -> q34SaltedAgg _,
    "q20_window_rank"     -> q20Rank _,
    "q21_window_running"  -> q21Running _,
    "q22_window_laglead"  -> q22LagLead _,
    "q23_window_ntile"    -> q23Ntile _,
    "q24_window_range"    -> q24RangeFrame _,
    "q25_rollup"          -> q25Rollup _,
    "q26_cube"            -> q26Cube _,
    "q27_grouping_sets"   -> q27GroupingSets _,
    "q28_distinct"        -> q28Distinct _,
    "q29_count_distinct"  -> q29CountDistinct _,
    "q30_approx_distinct" -> q30ApproxDistinct _,
    "q31_union_all"       -> q31UnionAll _,
    "q32_intersect"       -> q32Intersect _,
    "q33_except_all"      -> q33ExceptAll _,
  )

  val oracle: Map[String, String] = Map(
    "q37_stats_agg"      -> q37Sql,
    "q38_percentiles"    -> q38Sql,
    "q34_salted_agg"     -> q34Sql,
    "q20_window_rank"    -> q20Sql,
    "q21_window_running" -> q21Sql,
    "q22_window_laglead" -> q22Sql,
    "q23_window_ntile"   -> q23Sql,
    "q24_window_range"   -> q24Sql,
    "q25_rollup"         -> q25Sql,
    "q26_cube"           -> q26Sql,
    "q27_grouping_sets"  -> q27Sql,
    "q28_distinct"       -> q28Sql,
    "q29_count_distinct" -> q29Sql,
    "q31_union_all"      -> q31Sql,
    "q32_intersect"      -> q32Sql,
    "q33_except_all"     -> q33Sql,
    // q30 is oracle-checked via the error-bound gate: exact counts and
    // literal TRUEs replay in SQL; the estimates stay out of the output
    "q30_approx_distinct" -> q30Sql,
  )
}
