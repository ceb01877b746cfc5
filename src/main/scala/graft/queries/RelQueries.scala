package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TopK

/** Relational query surface over the landed tables — the capabilities the
  * reference's Postgres tables exist to serve (SURVEY §2.3: absent from
  * the reference itself, demanded by the engine contract).
  *
  * Float-sum determinism: double columns are converted to exact scaled
  * integers BEFORE aggregation (`cents`), so sums are order-independent
  * and hash-match the DuckDB oracle bit-for-bit. Scalar double math stays
  * double (identical IEEE ops on both engines are bitwise reproducible);
  * only multi-row accumulation order is engine-dependent, hence the
  * integer trick exactly where accumulation happens.
  */
object RelQueries {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** sum(round(c * 10^scale)) as an exact long. */
  private def centsSum(c: Column, scale: Int): Column =
    sum(round(c * math.pow(10, scale).toLong).cast("long"))

  /** TPC-H Q1 shape: scan → partial agg → final agg, no joins. */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).as("sum_qty"), // integer-valued: exact
        (centsSum(col("l_extendedprice"), 2).cast("double") / 100.0).as("sum_base_price"),
        (centsSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).cast("double") / 10000.0).as("sum_disc_price"),
        (centsSum(col("l_discount"), 2).cast("double") / count(lit(1)).cast("double") / 100.0).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1AggSql: String = """
SELECT l_returnflag, l_linestatus,
  SUM(l_quantity) AS sum_qty,
  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
  CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0 AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

  /** TPC-H Q3 shape: selective dim filter → join → agg → global top-k.
    * Catalyst broadcasts the filtered customer side; the top-k is
    * TakeOrderedAndProject (per-partition heaps, no global sort). */
  def q3TopRevenue(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    val l = t(s, dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    val rev = l.groupBy("l_orderkey")
      .agg(centsSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("rev_e4"))
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(rev, o("o_orderkey") === rev("l_orderkey"))
      .select(col("o_orderkey"), col("o_orderdate"),
        (col("rev_e4").cast("double") / 10000.0).as("revenue"), col("rev_e4"))
      .orderBy(col("rev_e4").desc, col("o_orderkey"))
      .limit(10)
      .drop("rev_e4")
  }

  val q3TopRevenueSql: String = """
WITH rev AS (
  SELECT l_orderkey, SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS rev_e4
  FROM lineitem GROUP BY l_orderkey)
SELECT o.o_orderkey, o.o_orderdate, CAST(r.rev_e4 AS DOUBLE) / 10000.0 AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_mktsegment = 'BUILDING'
JOIN rev r ON r.l_orderkey = o.o_orderkey
ORDER BY r.rev_e4 DESC, o.o_orderkey
LIMIT 10
"""

  /** Ranking windows: per-segment top-3 customers by balance. */
  def topkPerGroup(s: SparkSession, dir: String): DataFrame =
    TopK.perGroup(t(s, dir, "customer"), Seq("c_mktsegment"),
      Seq(col("c_acctbal").desc, col("c_custkey")), 3)
      .select("c_mktsegment", "c_custkey", "c_name", "c_acctbal")
      .orderBy("c_mktsegment", "c_custkey")

  val topkPerGroupSql: String = """
SELECT c_mktsegment, c_custkey, c_name, c_acctbal
FROM (SELECT *, row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer) x
WHERE rn <= 3
ORDER BY c_mktsegment, c_custkey
"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q3_top_revenue" -> (q3TopRevenue _),
    "q_topk_per_group" -> (topkPerGroup _))

  val oracles: Map[String, String] = Map(
    "q1_agg" -> q1AggSql,
    "q3_top_revenue" -> q3TopRevenueSql,
    "q_topk_per_group" -> topkPerGroupSql)
}
