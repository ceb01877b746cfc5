package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsOfJoin, Dedup}

/** Relational completeness, part 2: join families, set operations,
  * multi-dimensional aggregation, analytic windows, range and as-of
  * joins, distinct aggregation, JSON extraction (SURVEY §2.3/§5).
  */
object RelQueries2 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** Semi join (EXISTS): customers that placed at least one high-value
    * order. Spark plans a broadcast/shuffled hash semi — no row blowup. */
  def joinSemi(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  val joinSemiSql: String = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
ORDER BY c_custkey
"""

  /** Anti join (NOT EXISTS): customers who never placed a large order. */
  def joinAnti(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_totalprice") > 250000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  val joinAntiSql: String = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
ORDER BY c_custkey
"""

  /** Set operations, SQL evaluation order: ((A ∩ B) ∪ C) − D, all
    * distinct variants. */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    val a = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("custkey"))
    val b = c.filter(col("c_acctbal") > 5000).select(col("c_custkey").as("custkey"))
    val u = o.filter(col("o_totalprice") > 400000).select(col("o_custkey").as("custkey"))
    val d = c.filter(col("c_nationkey") === 3).select(col("c_custkey").as("custkey"))
    a.intersect(b).union(u).distinct().except(d).orderBy("custkey")
  }

  val setOpsSql: String = """
SELECT custkey FROM (
  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
  UNION
  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
  EXCEPT
  SELECT c_custkey AS custkey FROM customer WHERE c_nationkey = 3
) ORDER BY custkey
"""

  /** ROLLUP: hierarchical subtotals (status → priority → grand total). */
  def rollupAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        (sum(round(col("o_totalprice") * 100).cast("long")).cast("double") / 100.0).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("sum_price"))
      .orderBy("status", "priority")

  val rollupAggSql: String = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
ORDER BY status, priority
"""

  /** CUBE: all grouping-set combinations of two dimensions. */
  def cubeAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  val cubeAggSql: String = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n, SUM(l_quantity) AS sum_qty
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""

  /** GROUPING SETS through the engine's SQL surface (`spark.sql`), the
    * general form rollup/cube specialize. */
  def groupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_gs")
    s.sql("""
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             count(*) AS n_orders
      FROM orders_gs
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY status, priority""")
  }

  val groupingSetsSql: String = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY status, priority
"""

  /** Analytic windows: lag/lead neighbors + exact running total per user
    * (running sum accumulates in cents so the fold is order-exact). */
  def windowAnalytics(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("vcents", round(col("value") * 100).cast("long"))
      .select(
        col("event_id"), col("user_id"), col("event_type"),
        lag(col("vcents"), 1).over(w).as("prev_cents"),
        lead(col("vcents"), 1).over(w).as("next_cents"),
        (sum(col("vcents")).over(wRun).cast("double") / 100.0).as("running_value"),
        row_number().over(w).as("seq"))
      .orderBy("event_id")
  }

  /** The remaining window surface: distribution ranks (ntile,
    * percent_rank, cume_dist — exact integer-quotient doubles), bounded
    * sliding ROW frames (4-row moving sum over exact cents), value-range
    * RANGE frames (peers within 5.00 below), and first_value. One
    * shuffle on the partition key serves every frame. */
  def windowFrames(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wSlide = w.rowsBetween(-3, Window.currentRow)
    val wRange = Window.partitionBy("user_id").orderBy(col("vcents"))
      .rangeBetween(-500, Window.currentRow)
    e.withColumn("vcents", round(col("value") * 100).cast("long"))
      .select(
        col("event_id"), col("user_id"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        (sum(col("vcents")).over(wSlide).cast("double") / 100.0).as("moving_sum"),
        count(lit(1)).over(wRange).as("n_within_5"),
        first(col("vcents")).over(w).as("first_cents"))
      .orderBy("event_id")
  }

  val windowFramesSql: String = """
SELECT event_id, user_id,
  ntile(4) OVER w AS quartile,
  percent_rank() OVER w AS pct_rank,
  cume_dist() OVER w AS cume,
  CAST(SUM(vcents) OVER (PARTITION BY user_id ORDER BY ts, event_id
       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS moving_sum,
  COUNT(*) OVER (PARTITION BY user_id ORDER BY vcents
       RANGE BETWEEN 500 PRECEDING AND CURRENT ROW) AS n_within_5,
  first_value(vcents) OVER w AS first_cents
FROM (SELECT *, CAST(round(value * 100) AS BIGINT) AS vcents FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id
"""

  val windowAnalyticsSql: String = """
SELECT event_id, user_id, event_type,
  lag(vcents, 1) OVER w AS prev_cents,
  lead(vcents, 1) OVER w AS next_cents,
  CAST(SUM(vcents) OVER (PARTITION BY user_id ORDER BY ts, event_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS running_value,
  row_number() OVER w AS seq
FROM (SELECT *, CAST(round(value * 100) AS BIGINT) AS vcents FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id
"""

  /** Range join: lineitems shipped within 90 days of their order's date.
    * Equi key + range predicate → hash join with residual filter, no
    * quadratic blowup. */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select("o_orderkey", "o_orderdate")
    val l = t(s, dir, "lineitem").select("l_orderkey", "l_shipdate", "l_extendedprice")
    o.join(l,
      o("o_orderkey") === l("l_orderkey") &&
        l("l_shipdate") >= o("o_orderdate") &&
        l("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 90 DAYS"),
      "left")
      .groupBy("o_orderkey")
      .agg(count(col("l_orderkey")).as("n_shipped_90d"),
        (sum(round(col("l_extendedprice") * 100).cast("long")).cast("double") / 100.0).as("value_shipped_90d"))
      .orderBy("o_orderkey")
  }

  val rangeJoinSql: String = """
SELECT o.o_orderkey,
       COUNT(l.l_orderkey) AS n_shipped_90d,
       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS value_shipped_90d
FROM orders o
LEFT JOIN lineitem l
  ON o.o_orderkey = l.l_orderkey
 AND l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAY
GROUP BY o.o_orderkey
ORDER BY o.o_orderkey
"""

  /** Backward as-of join: each event picks up the customer's most recent
    * order as of the event time. Right side is pre-deduped per
    * (key, time) so the match is well-defined in both engines. */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val o = Dedup.keepFirst(
      t(s, dir, "orders").select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"),
      Seq("o_custkey", "o_orderdate"), Seq(col("o_orderkey").desc))
    AsOfJoin.backward(e, "user_id", "ts", o, "o_custkey", "o_orderdate",
      rightPayload = Seq("o_orderkey", "o_totalprice"))
      .select(col("event_id"), col("user_id"),
        col("o_orderkey").as("asof_orderkey"),
        col("o_totalprice").as("asof_totalprice"))
      .orderBy("event_id")
  }

  val asofJoinSql: String = """
WITH odedup AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
        FROM orders) x
  WHERE rn = 1)
SELECT e.event_id, e.user_id,
       o.o_orderkey AS asof_orderkey,
       o.o_totalprice AS asof_totalprice
FROM events e
ASOF LEFT JOIN odedup o
  ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
ORDER BY e.event_id
"""

  /** Distinct aggregation: exact distinct counts per group. */
  def distinctAgg(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")
  }

  val distinctAggSql: String = """
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(DISTINCT o_orderpriority) AS n_priorities,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""

  /** Approximate distinct (HLL++). Sketch estimates are engine-specific,
    * so the oracle contract is a tolerance gate: the query emits the
    * exact counts plus booleans asserting |approx − exact| ≤ 10% · exact
    * (rsd = 0.02, so 10% is a ≥5σ bound); the DuckDB twin emits the same
    * exact counts with literal TRUE. An out-of-tolerance sketch flips the
    * boolean and fails the hash-compare — a real check, not rows-only.
    * At 100 TB HLL replaces exact distinct wherever a ±2% answer is
    * acceptable: no shuffle of the distinct keys, just mergeable
    * sketches. */
  def approxDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        approx_count_distinct(col("l_partkey"), 0.02).as("__ap"),
        approx_count_distinct(col("l_suppkey"), 0.02).as("__as"))
      .select(col("l_returnflag"), col("n_parts"), col("n_supps"),
        (abs(col("__ap") - col("n_parts")).cast("double") <=
          col("n_parts").cast("double") * 0.10).as("parts_ok"),
        (abs(col("__as") - col("n_supps")).cast("double") <=
          col("n_supps").cast("double") * 0.10).as("supps_ok"))
      .orderBy("l_returnflag")

  val approxDistinctSql: String = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       TRUE AS parts_ok, TRUE AS supps_ok
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

  /** Semi-structured JSON column: schema-on-read extraction + aggregate. */
  def jsonProps(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    e.withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")
  }

  val jsonPropsSql: String = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       min(k) AS min_k, max(k) AS max_k
FROM (SELECT event_type, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
GROUP BY event_type
ORDER BY event_type
"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_semi" -> (joinSemi _),
    "q_join_anti" -> (joinAnti _),
    "q_setops" -> (setOps _),
    "q_rollup" -> (rollupAgg _),
    "q_cube" -> (cubeAgg _),
    "q_grouping_sets" -> (groupingSets _),
    "q_window_analytics" -> (windowAnalytics _),
    "q_window_frames" -> (windowFrames _),
    "q_range_join" -> (rangeJoin _),
    "q_asof_join" -> (asofJoin _),
    "q_distinct_agg" -> (distinctAgg _),
    "q_approx_distinct" -> (approxDistinct _),
    "q_json_props" -> (jsonProps _))

  val oracles: Map[String, String] = Map(
    "q_join_semi" -> joinSemiSql,
    "q_join_anti" -> joinAntiSql,
    "q_setops" -> setOpsSql,
    "q_rollup" -> rollupAggSql,
    "q_cube" -> cubeAggSql,
    "q_grouping_sets" -> groupingSetsSql,
    "q_window_analytics" -> windowAnalyticsSql,
    "q_window_frames" -> windowFramesSql,
    "q_range_join" -> rangeJoinSql,
    "q_asof_join" -> asofJoinSql,
    "q_distinct_agg" -> distinctAggSql,
    "q_approx_distinct" -> approxDistinctSql,
    "q_json_props" -> jsonPropsSql)
}
