package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Exact._

/** Core relational query pack: scans, filters, projections, the full join
  * family (inner/left/right/full/semi/anti/theta/as-of), aggregation,
  * top-k, and multi-key sort. Every query is declarative DataFrame API so
  * Catalyst plans pushdown/pruning/broadcast automatically; scale notes per
  * query describe the 100 TB shape.
  *
  * Reference scope note: the reference (an Iceberg REST catalog,
  * `/root/reference/api/handlers/tables.go`) manages table metadata only;
  * this pack is the query surface such a catalog serves (SURVEY.md §2.B).
  */
object Relational {

  /** TPC-H Q1-flavor pricing summary. Scale: partial aggregation map-side
    * reduces 100 TB of lineitem to |flag×status| rows before the shuffle;
    * filter + 7-column projection reach the parquet scan. */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
    val discBp = lit(100L) - cents(col("l_discount"))     // basis-ish: 100-100d
    val taxBp  = lit(100L) + cents(col("l_tax"))
    l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        (sum(cents(col("l_extendedprice"))) / 100.0).as("sum_base_price"),
        (sum(cents(col("l_extendedprice")) * discBp) / 10000.0).as("sum_disc_price"),
        (sum(cents(col("l_extendedprice")) * discBp * taxBp) / 1000000.0).as("sum_charge"),
        (sum(col("l_quantity")) / count(col("l_quantity"))).as("avg_qty"),
        ((sum(cents(col("l_extendedprice"))) / 100.0) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
       |  SUM(${sqlCents("l_extendedprice")})/100.0 AS sum_base_price,
       |  SUM(${sqlCents("l_extendedprice")} * (100 - ${sqlCents("l_discount")}))/10000.0 AS sum_disc_price,
       |  SUM(${sqlCents("l_extendedprice")} * (100 - ${sqlCents("l_discount")}) * (100 + ${sqlCents("l_tax")}))/1000000.0 AS sum_charge,
       |  SUM(l_quantity)/COUNT(l_quantity) AS avg_qty,
       |  (SUM(${sqlCents("l_extendedprice")})/100.0)/COUNT(*) AS avg_price,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Selective filter + computed projection; filters/projection push to the
    * parquet scan (PushedFilters in explain). */
  def q02FilterProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") >= 45 && col("l_discount") >= 0.05)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))) / 10000.0)
          .as("disc_price"),
        col("l_returnflag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val q02Sql: String =
    s"""SELECT l_orderkey, l_linenumber,
       |  ${sqlCents("l_extendedprice")} * (100 - ${sqlCents("l_discount")}) / 10000.0 AS disc_price,
       |  l_returnflag
       |FROM lineitem WHERE l_quantity >= 45 AND l_discount >= 0.05
       |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** 3-way join (fact⋈fact⋈dim) + agg + top-k revenue. Scale: customer is
    * the small side → broadcast; lineitem⋈orders shuffles on orderkey;
    * top-k is TakeOrderedAndProject (no global sort). */
  def q03TopRevenue(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"))
      .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))) / 10000.0)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q03Sql: String =
    s"""SELECT l_orderkey,
       |  SUM(${sqlCents("l_extendedprice")} * (100 - ${sqlCents("l_discount")}))/10000.0 AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |GROUP BY l_orderkey
       |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** Left outer join preserving order rows with no lineitems. */
  def q04LeftJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    o.join(l, col("o_orderkey") === col("l_orderkey"), "left")
      .groupBy(col("o_orderkey"))
      .agg(count(col("l_linenumber")).as("n_lines"),
        coalesce(sum(col("l_quantity")), lit(0.0)).cast("long").as("tot_qty"))
      .orderBy(col("o_orderkey"))
  }

  val q04Sql: String =
    """SELECT o_orderkey, COUNT(l_linenumber) AS n_lines,
      |  CAST(COALESCE(SUM(l_quantity), 0) AS BIGINT) AS tot_qty
      |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin

  /** Right outer join (same semantics driven from the other side). */
  def q05RightJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"), "right")
      .groupBy(col("o_orderstatus"))
      .agg(count(col("l_linenumber")).as("n_lines"), count(lit(1)).as("n_rows"))
      .orderBy(col("o_orderstatus"))
  }

  val q05Sql: String =
    """SELECT o_orderstatus, COUNT(l_linenumber) AS n_lines, COUNT(*) AS n_rows
      |FROM lineitem RIGHT JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Full outer join of two aggregates (customers vs suppliers per nation). */
  def q06FullJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val sp = Tables.supplier(s, dir).groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(sp, col("c_nationkey") === col("s_nationkey"), "full")
      .select(
        coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  val q06Sql: String =
    """SELECT COALESCE(c.k, s.k) AS nationkey,
      |  COALESCE(c.n_cust, 0) AS n_cust, COALESCE(s.n_supp, 0) AS n_supp
      |FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
      |FULL JOIN (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
      |ON c.k = s.k ORDER BY nationkey""".stripMargin

  /** Left-semi join: customers having at least one order (EXISTS). */
  def q07SemiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  val q07Sql: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Left-anti join: orders with no lineitems (NOT EXISTS). */
  def q08AntiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select(col("o_orderkey"), col("o_orderstatus"))
      .orderBy(col("o_orderkey"))

  val q08Sql: String =
    """SELECT o_orderkey, o_orderstatus FROM orders o
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  /** Theta join: equi key + inequality residual (hash join on the key with
    * a post-filter — stays a shuffled hash join at scale, never NLJ). */
  def q09ThetaJoin(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir)
    l.join(broadcast(p),
        col("l_partkey") === col("p_partkey") && col("l_quantity") > col("p_size"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("long").as("qty"))
      .orderBy(col("p_brand"))
  }

  val q09Sql: String =
    """SELECT p_brand, COUNT(*) AS n, CAST(SUM(l_quantity) AS BIGINT) AS qty
      |FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity > p_size
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** As-of join: for each event, the latest order date of the same
    * customer at-or-before the event time. Spark-first pattern: UNION the
    * two time-lines, one shuffle on the key, and `last(_, ignoreNulls)`
    * over an unbounded-preceding window — no per-row subquery, no range
    * explosion; at 100 TB this is a single sort-shuffle per key.
    * (Reference has no executor; this is SURVEY.md §2.B's CUSTOM as-of.) */
  def q10AsofJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, dir).select(
      col("user_id").as("k"), col("ts").as("t"),
      lit(1).as("kind"), col("event_id"), lit(null).cast("timestamp_ntz").as("odate"))
    val o = Tables.orders(s, dir).select(
      col("o_custkey").as("k"), col("o_orderdate").as("t"),
      lit(0).as("kind"), lit(null).cast("long").as("event_id"),
      col("o_orderdate").as("odate"))
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.unionByName(e)
      .withColumn("asof_orderdate", last(col("odate"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("asof_orderdate"))
      .orderBy(col("event_id"))
  }

  val q10Sql: String =
    s"""WITH ${Tables.eventsOracleCte}
       |SELECT e.event_id,
       |  (SELECT MAX(o.o_orderdate) FROM orders o
       |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) AS asof_orderdate
       |FROM events_n e ORDER BY e.event_id""".stripMargin

  /** Global top-k: Catalyst plans TakeOrderedAndProject — per-partition
    * heap + single driver merge, no full sort at scale. */
  def q11TopK(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(15)

  val q11Sql: String =
    """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin

  /** Multi-key global sort (range-partitioned exchange + local sort). */
  def q12MultiSort(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      .orderBy(col("c_mktsegment"), col("c_acctbal").desc, col("c_custkey"))

  val q12Sql: String =
    """SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment FROM customer
      |ORDER BY c_mktsegment, c_acctbal DESC, c_custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> q01PricingSummary _,
    "q02_filter_project"  -> q02FilterProject _,
    "q03_top_revenue"     -> q03TopRevenue _,
    "q04_join_left"       -> q04LeftJoin _,
    "q05_join_right"      -> q05RightJoin _,
    "q06_join_full"       -> q06FullJoin _,
    "q07_join_semi"       -> q07SemiJoin _,
    "q08_join_anti"       -> q08AntiJoin _,
    "q09_join_theta"      -> q09ThetaJoin _,
    "q10_join_asof"       -> q10AsofJoin _,
    "q11_topk"            -> q11TopK _,
    "q12_multisort"       -> q12MultiSort _,
  )

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project"  -> q02Sql,
    "q03_top_revenue"     -> q03Sql,
    "q04_join_left"       -> q04Sql,
    "q05_join_right"      -> q05Sql,
    "q06_join_full"       -> q06Sql,
    "q07_join_semi"       -> q07Sql,
    "q08_join_anti"       -> q08Sql,
    "q09_join_theta"      -> q09Sql,
    "q10_join_asof"       -> q10Sql,
    "q11_topk"            -> q11Sql,
    "q12_multisort"       -> q12Sql,
  )
}
