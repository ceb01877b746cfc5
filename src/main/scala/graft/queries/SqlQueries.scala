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

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_lateral_topn" -> (lateralTopN _),
    "q_correlated_scalar" -> (correlatedScalar _))

  val oracles: Map[String, String] = Map(
    "q_lateral_topn" -> lateralTopNSql,
    "q_correlated_scalar" -> correlatedScalarSql)
}
