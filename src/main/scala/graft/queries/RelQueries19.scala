package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Nineteenth analytics batch — the remaining classic TPC-H
  * decorrelation shapes, restated on the house schema (no partsupp
  * table; per-(part,supplier) unit-cost/stock facts derive from
  * lineitem). Each oracle twin keeps the CORRELATED subquery form —
  * the query side is the decorrelated plan Catalyst should (and does)
  * reach, per the q17-shape house pattern.
  */
object RelQueries19 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** Per-(part,supplier) minimum unit cost in exact cents — the
    * partsupp stand-in: unit cost = extendedprice·100 DIV quantity.
    * `keys` (if given) left-semi-joins a broadcast part-key set below
    * the aggregation, so the fact scan and the groupBy shrink to just
    * the parts a caller can actually emit. */
  private def ps(s: SparkSession, dir: String,
                 keys: Option[DataFrame] = None): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_quantity") > 0)
    val pruned = keys.fold(li)(k =>
      li.join(broadcast(k), col("l_partkey") === col("p_partkey"), "left_semi"))
    pruned
      .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .agg(min(expr("CAST(round(l_extendedprice*100) AS BIGINT) DIV CAST(l_quantity AS BIGINT)"))
        .as("cost"))
  }

  // --------------------------------------------------- Q2 shape

  /** TPC-H Q2 shape — cheapest supplier per part within one region:
    * the correlated `cost = (SELECT min(cost) … WHERE pk = outer.pk)`
    * decorrelates into ONE per-part min aggregation joined back on
    * (pk, cost) equality; supplier→nation→region are broadcast dims.
    * The twin keeps the correlated form so DuckDB plans it its own
    * way and values must still agree. */
  def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    // The correlated min is per-part over ALL suppliers, so the p_size
    // predicate commutes below it: semi-join the filtered part keys into
    // the fact BEFORE aggregating and both the groupBy and the min-join
    // shrink ~25×. No localCheckpoint — at 100 TB an eager full-partsupp
    // cache is a table materialization; re-scanning the pruned,
    // filter-pushed parquet scan twice is strictly cheaper.
    val smallParts = t(s, dir, "part")
      .filter(col("p_size") <= 10).select("p_partkey")
    val p = ps(s, dir, keys = Some(smallParts))
    val minCost = p.groupBy("pk").agg(min("cost").as("mc"))
      .withColumnRenamed("pk", "mpk")
    val dims = t(s, dir, "supplier").as("s")
      .join(broadcast(t(s, dir, "nation").as("n")),
        col("n.n_nationkey") === col("s.s_nationkey"))
      .join(broadcast(t(s, dir, "region").as("r")),
        col("r.r_regionkey") === col("n.n_regionkey"))
      .filter(col("r.r_name") === "AMERICA")
    p.join(minCost, col("pk") === col("mpk") && col("cost") === col("mc"))
      .join(t(s, dir, "part").as("pt").filter(col("pt.p_size") <= 10),
        col("pt.p_partkey") === col("pk"))
      .join(dims, col("s.s_suppkey") === col("sk"))
      .select(col("pt.p_partkey").as("p_partkey"), col("s.s_suppkey").as("s_suppkey"),
        col("s.s_name").as("s_name"), col("cost").as("min_cost_cents"))
      .orderBy("p_partkey", "s_suppkey").limit(25)
  }

  val q2MinCostSupplierSql: String = """
WITH ps AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         min(CAST(round(l_extendedprice*100) AS BIGINT) // CAST(l_quantity AS BIGINT)) AS cost
  FROM lineitem WHERE l_quantity > 0 GROUP BY 1, 2)
SELECT p.p_partkey, s.s_suppkey, s.s_name, ps.cost AS min_cost_cents
FROM part p JOIN ps ON ps.pk = p.p_partkey
JOIN supplier s ON s.s_suppkey = ps.sk
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'AMERICA' AND p.p_size <= 10
  AND ps.cost = (SELECT min(ps2.cost) FROM ps ps2 WHERE ps2.pk = p.p_partkey)
ORDER BY p.p_partkey, s.s_suppkey LIMIT 25
"""

  // --------------------------------------------------- Q11 shape

  /** TPC-H Q11 shape — parts whose lineitem value exceeds 1.5× the
    * mean per-part share: the correlated global-total HAVING
    * decorrelates into a broadcast singleton (total, count) row.
    * Threshold is RELATIVE (v·c > 1.5·t), so the predicate is
    * scale-free — the same query is meaningful at any SF. */
  def q11ValueShare(s: SparkSession, dir: String): DataFrame = {
    val pv = t(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("v"))
    val tot = pv.agg(sum("v").as("t"), count(lit(1)).as("c"))
    pv.crossJoin(broadcast(tot))
      .filter(col("v") * col("c") * 2 > col("t") * 3)
      .select("pk", "v")
      .orderBy(col("v").desc, col("pk")).limit(25)
  }

  val q11ValueShareSql: String = """
WITH pv AS (
  SELECT l_partkey AS pk, CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS v
  FROM lineitem GROUP BY 1)
SELECT pk, v FROM pv
WHERE v * (SELECT COUNT(*) FROM pv) * 2 > (SELECT SUM(v) FROM pv) * 3
ORDER BY v DESC, pk LIMIT 25
"""

  // --------------------------------------------------- Q15 shape

  /** TPC-H Q15 shape — the top-revenue supplier(s) for 1996Q1, ties
    * kept: `rev = (SELECT max(rev))` decorrelates into a broadcast
    * singleton max row and an equality filter (never a LIMIT 1, which
    * would drop ties nondeterministically). */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) >= lit("1996-01-01")
        && to_date(col("l_shipdate")) < lit("1996-04-01"))
      .groupBy(col("l_suppkey").as("sk"))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
        .cast("long")).as("r"))
    val mx = rev.agg(max("r").as("m"))
    t(s, dir, "supplier").as("s")
      .join(rev, col("sk") === col("s.s_suppkey"))
      .crossJoin(broadcast(mx))
      .filter(col("r") === col("m"))
      .select(col("s.s_suppkey").as("s_suppkey"), col("s.s_name").as("s_name"),
        col("r").as("total_rev_cents"))
      .orderBy("s_suppkey")
  }

  val q15TopSupplierSql: String = """
WITH rev AS (
  SELECT l_suppkey AS sk,
         CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS r
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01' AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
  GROUP BY 1)
SELECT s.s_suppkey, s.s_name, rev.r AS total_rev_cents
FROM supplier s JOIN rev ON rev.sk = s.s_suppkey
WHERE rev.r = (SELECT max(r) FROM rev)
ORDER BY s.s_suppkey
"""

  // --------------------------------------------------- Q20 shape

  /** TPC-H Q20 shape — suppliers holding surplus stock of red parts:
    * all-time stocked quantity > 1.5× the 1996-shipped quantity for
    * the same (part, supplier). The doubly-nested IN + correlated SUM
    * decorrelates into two aggregations LEFT-joined on the composite
    * key, a broadcast semi-join on the filtered part dim, and a final
    * supplier semi-join — no subquery survives in the plan. */
  def q20StockSurplus(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val sp = li.groupBy(col("l_suppkey").as("sk"), col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity").cast("long")).as("avail"))
    val shipped = li
      .filter(to_date(col("l_shipdate")) >= lit("1996-01-01")
        && to_date(col("l_shipdate")) < lit("1997-01-01"))
      .groupBy(col("l_partkey").as("pk2"), col("l_suppkey").as("sk2"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
    val redParts = t(s, dir, "part").filter(col("p_name").startsWith("red"))
      .select(col("p_partkey").as("pk"))
    val surplus = sp.join(broadcast(redParts), "pk")
      .join(shipped, col("pk") === col("pk2") && col("sk") === col("sk2"), "left")
      .filter(col("avail") * 2 > coalesce(col("q"), lit(0L)) * 3)
      .select(col("sk")).distinct()
    t(s, dir, "supplier")
      .join(surplus, col("sk") === col("s_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy("s_suppkey").limit(25)
  }

  val q20StockSurplusSql: String = """
WITH sp AS (
  SELECT l_suppkey AS sk, l_partkey AS pk, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS avail
  FROM lineitem GROUP BY 1, 2),
shipped AS (
  SELECT l_partkey AS pk, l_suppkey AS sk, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01' AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
  GROUP BY 1, 2)
SELECT s.s_suppkey, s.s_name FROM supplier s
WHERE s.s_suppkey IN (
  SELECT sp.sk FROM sp
  WHERE sp.pk IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    AND sp.avail * 2 > (SELECT COALESCE(SUM(q),0) FROM shipped WHERE shipped.pk = sp.pk AND shipped.sk = sp.sk) * 3)
ORDER BY s.s_suppkey LIMIT 25
"""

  // ------------------------------------------------------- registry

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost_supplier" -> (q2MinCostSupplier _),
    "q11_value_share" -> (q11ValueShare _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q20_stock_surplus" -> (q20StockSurplus _))

  def oracles: Map[String, String] = Map(
    "q2_min_cost_supplier" -> q2MinCostSupplierSql,
    "q11_value_share" -> q11ValueShareSql,
    "q15_top_supplier" -> q15TopSupplierSql,
    "q20_stock_surplus" -> q20StockSurplusSql)
}
