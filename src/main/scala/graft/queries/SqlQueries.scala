package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Correlated-subquery surface, exercised through the engine's SQL front
  * end (`spark.sql`): LATERAL per-row top-n and correlated scalar
  * aggregates. Catalyst decorrelates both into joins (no per-row
  * re-execution — `.explain` shows a window/aggregate + join plan), which
  * is exactly why they survive 100 TB while the naive nested-loop
  * reading never would.
  */
object SqlQueries {

  private def view(s: SparkSession, dir: String, name: String): Unit =
    Tables(s, dir, name).createOrReplaceTempView(name + "_v")

  /** LATERAL: each customer's 3 largest orders. */
  def lateralTopN(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "customer"); view(s, dir, "orders")
    s.sql("""
      SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
      FROM customer_v c, LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders_v o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o
      WHERE c.c_custkey < 300
      ORDER BY c_custkey, o_totalprice DESC, o_orderkey""")
  }

  val lateralTopNSql: String = """
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o
WHERE c.c_custkey < 300
ORDER BY c_custkey, o_totalprice DESC, o_orderkey
"""

  /** Correlated scalar aggregate: orders more than twice the customer's
    * average (exact cents arithmetic inside the subquery). */
  def correlatedScalar(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "orders")
    s.sql("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders_v o
      WHERE o_totalprice > 2 * (
        SELECT CAST(SUM(CAST(round(o2.o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*)
        FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey)
      ORDER BY o_orderkey""")
  }

  val correlatedScalarSql: String = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice > 2 * (
  SELECT CAST(SUM(CAST(round(o2.o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*)
  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
ORDER BY o_orderkey
"""

  /** Recursive CTE (hierarchical query surface, Spark ≥ 4.0): walk a
    * key-derived tree — parent(c) = c div 10, roots under 10 — and
    * aggregate subtree population and balance per (root, depth). Each
    * recursion step is a distributed join of the frontier against the
    * table; depth is O(log₁₀ N) so the step count stays bounded at any
    * scale. (For data-dependent graphs with unknown depth, the
    * ConnectedComponents operator is the scale path; this exercises the
    * SQL front end.) */
  def recursiveCte(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "customer")
    s.sql("""
      WITH RECURSIVE h(id, root, depth, bal_cents) AS (
        SELECT c_custkey, c_custkey, 0,
               CAST(round(c_acctbal * 100) AS BIGINT)
        FROM customer_v WHERE c_custkey < 10
        UNION ALL
        SELECT c.c_custkey, h.root, h.depth + 1,
               CAST(round(c.c_acctbal * 100) AS BIGINT)
        FROM customer_v c JOIN h ON c.c_custkey div 10 = h.id
        WHERE c.c_custkey >= 10)
      SELECT root, depth, COUNT(*) AS n_nodes,
             CAST(SUM(bal_cents) AS DOUBLE) / 100.0 AS total_bal
      FROM h GROUP BY root, depth
      ORDER BY root, depth""")
  }

  val recursiveCteSql: String = """
WITH RECURSIVE h(id, root, depth, bal_cents) AS (
  SELECT c_custkey, c_custkey, 0, CAST(round(c_acctbal * 100) AS BIGINT)
  FROM customer WHERE c_custkey < 10
  UNION ALL
  SELECT c.c_custkey, h.root, h.depth + 1, CAST(round(c.c_acctbal * 100) AS BIGINT)
  FROM customer c JOIN h ON c.c_custkey // 10 = h.id
  WHERE c.c_custkey >= 10)
SELECT root, depth, COUNT(*) AS n_nodes,
       CAST(SUM(bal_cents) AS DOUBLE) / 100.0 AS total_bal
FROM h GROUP BY root, depth
ORDER BY root, depth
"""

  /** TPC-H Q17 shape — correlated AGGREGATE subquery at a different
    * grain than the outer row (per-part average vs per-lineitem filter):
    * the nested-loop reading re-scans lineitem once per row; Catalyst
    * decorrelates it into one per-part aggregate joined back, the only
    * plan that survives scale. Revenue through exact cents; the per-part
    * avg is exact (integral quantities sum exactly in doubles) and the
    * final /100/7 is a deterministic scalar chain. One output row per
    * bucketed part keeps the oracle row set meaningful at every SF. */
  def q17SmallQty(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "lineitem")
    s.sql("""
      SELECT l.l_partkey,
             CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / 7.0 AS avg_yearly
      FROM lineitem_v l
      WHERE l.l_partkey % 10 = 0
        AND l.l_quantity < 0.2 * (
          SELECT AVG(l2.l_quantity) FROM lineitem_v l2 WHERE l2.l_partkey = l.l_partkey)
      GROUP BY l.l_partkey
      ORDER BY l.l_partkey""")
  }

  val q17SmallQtySql: String = """
SELECT l.l_partkey,
       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / 7.0 AS avg_yearly
FROM lineitem l
WHERE l.l_partkey % 10 = 0
  AND l.l_quantity < 0.2 * (
    SELECT AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
GROUP BY l.l_partkey
ORDER BY l.l_partkey
"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_lateral_topn" -> (lateralTopN _),
    "q_correlated_scalar" -> (correlatedScalar _),
    "q_recursive_cte" -> (recursiveCte _),
    "q17_small_qty" -> (q17SmallQty _))

  val oracles: Map[String, String] = Map(
    "q_lateral_topn" -> lateralTopNSql,
    "q_correlated_scalar" -> correlatedScalarSql,
    "q_recursive_cte" -> recursiveCteSql,
    "q17_small_qty" -> q17SmallQtySql)
}
