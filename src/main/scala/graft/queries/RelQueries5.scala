package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsOfJoin, DataQuality, Dedup, FuzzyJoin, IncrementalAgg, SnapshotDiff}

/** Fifth relational batch: nearest as-of join, declarative data-quality
  * gates, CDC snapshot diffing, and blocked fuzzy (edit-distance)
  * matching.
  */
object RelQueries5 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** Nearest-in-time as-of join: each event takes the customer's closest
    * order (before or after; exact ties prefer the earlier one). Same
    * single-shuffle union+window shape as backward; the oracle is the
    * per-row argmin LATERAL, which DuckDB can afford at oracle scale. */
  def asofNearest(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val o = Dedup.keepFirst(
      t(s, dir, "orders").select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"),
      Seq("o_custkey", "o_orderdate"), Seq(col("o_orderkey").desc))
    AsOfJoin.nearest(e, "user_id", "ts", o, "o_custkey", "o_orderdate",
        rightPayload = Seq("o_orderkey", "o_totalprice"))
      .select(col("event_id"), col("user_id"),
        col("o_orderkey").as("near_orderkey"),
        col("o_totalprice").as("near_totalprice"))
      .orderBy("event_id")
  }

  val asofNearestSql: String = """
WITH odedup AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
        FROM orders) x
  WHERE rn = 1)
SELECT e.event_id, e.user_id,
       p.o_orderkey AS near_orderkey,
       p.o_totalprice AS near_totalprice
FROM events e LEFT JOIN LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM odedup o
  WHERE o.o_custkey = e.user_id
  ORDER BY abs(epoch(e.ts) - epoch(o.o_orderdate)),
           CASE WHEN o.o_orderdate <= e.ts THEN 0 ELSE 1 END
  LIMIT 1) p ON TRUE
ORDER BY e.event_id
"""

  /** Data-quality constraint suite over orders — five checks, one
    * aggregation pass. */
  def dqChecks(s: SparkSession, dir: String): DataFrame = {
    import DataQuality._
    run(t(s, dir, "orders"), Seq(
      Check("custkey_complete", completeness(col("o_custkey")), _ >= 1.0),
      Check("orderkey_unique", uniqueness(col("o_orderkey")), _ >= 1.0),
      Check("price_min", min(col("o_totalprice")), _ > 0.0),
      Check("priority_complete", completeness(col("o_orderpriority")), _ >= 1.0),
      Check("status_domain", domain(col("o_orderstatus"), Seq("O", "F", "P")), _ >= 1.0)))
      .orderBy("check")
  }

  val dqChecksSql: String = """
WITH m AS (
  SELECT CAST(COUNT(o_custkey) AS DOUBLE) / COUNT(*) AS custkey_complete,
         CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) / COUNT(*) AS orderkey_unique,
         min(o_totalprice) AS price_min,
         CAST(COUNT(o_orderpriority) AS DOUBLE) / COUNT(*) AS priority_complete,
         CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS status_domain
  FROM orders)
SELECT * FROM (
  SELECT 'custkey_complete' AS "check", custkey_complete AS metric_value, custkey_complete >= 1.0 AS passed FROM m
  UNION ALL SELECT 'orderkey_unique', orderkey_unique, orderkey_unique >= 1.0 FROM m
  UNION ALL SELECT 'price_min', price_min, price_min > 0.0 FROM m
  UNION ALL SELECT 'priority_complete', priority_complete, priority_complete >= 1.0 FROM m
  UNION ALL SELECT 'status_domain', status_domain, status_domain >= 1.0 FROM m)
ORDER BY "check"
"""

  /** CDC snapshot diff: v2 of orders is derived deterministically
    * (delete keys ≡0 mod 89, bump price on ≡0 mod 97, insert shifted
    * copies of ≡0 mod 101), then every key is classified and the delta
    * summarized per class. */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val v2 = o.filter(col("o_orderkey") % 89 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 97 === 0, col("o_totalprice") + 10.0)
          .otherwise(col("o_totalprice")))
      .unionByName(o.filter(col("o_orderkey") % 101 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 100000000L))
    SnapshotDiff.diff(o, v2, Seq("o_orderkey"),
        Seq("o_custkey", "o_totalprice", "o_orderstatus"))
      .groupBy("change_type")
      .agg(count(lit(1)).as("n"),
        (sum(round(coalesce(col("o_totalprice"), lit(0.0)) * 100).cast("long"))
          .cast("double") / 100.0).as("total_new_price"))
      .orderBy("change_type")
  }

  val snapshotDiffSql: String = """
WITH o AS (SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders),
v2 AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 10.0 ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM o WHERE o_orderkey % 89 <> 0
  UNION ALL
  SELECT o_orderkey + 100000000, o_custkey, o_totalprice, o_orderstatus
  FROM o WHERE o_orderkey % 101 = 0),
d AS (
  SELECT CASE WHEN o.o_orderkey IS NULL THEN 'inserted'
              WHEN v2.o_orderkey IS NULL THEN 'deleted'
              WHEN o.o_custkey IS DISTINCT FROM v2.o_custkey
                OR o.o_totalprice IS DISTINCT FROM v2.o_totalprice
                OR o.o_orderstatus IS DISTINCT FROM v2.o_orderstatus THEN 'updated'
              ELSE 'unchanged' END AS change_type,
         v2.o_totalprice AS new_price
  FROM o FULL OUTER JOIN v2 ON o.o_orderkey = v2.o_orderkey)
SELECT change_type, COUNT(*) AS n,
       CAST(SUM(CAST(round(COALESCE(new_price, 0) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_new_price
FROM d GROUP BY change_type ORDER BY change_type
"""

  /** Incremental view maintenance: the per-customer (n, sum) aggregate
    * of orders v1 is MAINTAINED under the v1→v2 CDC delta (same
    * deterministic mutation as q_snapshot_diff) — the oracle recomputes
    * from v2 directly, so a hash match proves maintained == recomputed
    * bit-for-bit. Work scales with the delta (one diff join + one delta
    * agg + one merge join), never the snapshot. */
  def incrementalAgg(s: SparkSession, dir: String): DataFrame = {
    val v1 = t(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val v2 = v1.filter(col("o_orderkey") % 89 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 97 === 0, col("o_totalprice") + 10.0)
          .otherwise(col("o_totalprice")))
      .unionByName(v1.filter(col("o_orderkey") % 101 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 100000000L))
    val base = IncrementalAgg.sumCount(v1, Seq("o_custkey"), col("o_totalprice"))
    val wide = SnapshotDiff.diffWide(v1, v2, Seq("o_orderkey"),
      Seq("o_custkey", "o_totalprice"))
    IncrementalAgg.applyDelta(base, wide, Seq("o_custkey"), "o_totalprice")
      .select(col("o_custkey"), col("n"),
        (col("sum_cents").cast("double") / 100.0).as("total_price"))
      .orderBy("o_custkey")
  }

  val incrementalAggSql: String = """
WITH v1 AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
v2 AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 10.0 ELSE o_totalprice END AS o_totalprice
  FROM v1 WHERE o_orderkey % 89 <> 0
  UNION ALL
  SELECT o_orderkey + 100000000, o_custkey, o_totalprice FROM v1 WHERE o_orderkey % 101 = 0)
SELECT o_custkey, COUNT(*) AS n,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price
FROM v2 GROUP BY o_custkey ORDER BY o_custkey
"""

  /** Entity resolution: customer names corrupted by a deterministic
    * one-character deletion, re-matched to the clean dim by blocked
    * levenshtein and resolved to the single best candidate per probe.
    *
    * The block is COMPOSITE — (nation, last name character) — because
    * nation alone has 25 distinct values: block width then grows
    * linearly with the corpus and the candidate join shuffles on at
    * most 25 keys, a parallelism ceiling at scale. The last character
    * is recall-safe by construction: the corruption deletes a character
    * at position 10..17 of an 18-char name, so the final character
    * always survives into the probe — the true match is always
    * in-block. Cardinality: 25 nations × 10 tail digits = 250 keys,
    * and ~10× fewer candidate pairs paying the O(len²) levenshtein. */
  def fuzzyMatch(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val pos = lit(10) + (col("c_custkey") % 8).cast("int")
    val corrupted = concat(
      col("c_name").substr(lit(1), pos - 1),
      col("c_name").substr(pos + 1, lit(100)))
    val probe = c.filter(col("c_custkey") < 1500)
      .select(col("c_custkey").as("p_id"),
        col("c_nationkey").as("p_nat"), corrupted.as("p_name"))
    val target = c.select(col("c_custkey").as("t_id"),
      col("c_nationkey").as("t_nat"), col("c_name").as("t_name"))
    def block(nat: Column, name: Column): Column =
      concat(nat.cast("string"), lit("|"), substring(name, -1, 1))
    FuzzyJoin.bestMatch(probe, target,
        block(col("p_nat"), col("p_name")), block(col("t_nat"), col("t_name")),
        col("p_name"), col("t_name"),
        col("p_id"), col("t_id"), maxDist = 2)
      .select(col("p_id"), col("t_id").as("matched_id"), col("edit_dist"))
      .orderBy("p_id")
  }

  val fuzzyMatchSql: String = """
WITH probe AS (
  SELECT c_custkey AS p_id, c_nationkey AS p_nat,
         concat(substr(c_name, 1, CAST(9 + (c_custkey % 8) AS INTEGER)),
                substr(c_name, CAST(11 + (c_custkey % 8) AS INTEGER), 100)) AS p_name
  FROM customer WHERE c_custkey < 1500),
target AS (SELECT c_custkey AS t_id, c_nationkey AS t_nat, c_name AS t_name FROM customer),
cand AS (
  SELECT p_id, t_id, levenshtein(p_name, t_name) AS edit_dist
  FROM probe JOIN target
    ON p_nat = t_nat
   AND substr(p_name, length(p_name), 1) = substr(t_name, length(t_name), 1)
  WHERE levenshtein(p_name, t_name) <= 2),
r AS (SELECT *, row_number() OVER (PARTITION BY p_id ORDER BY edit_dist, t_id) AS rn FROM cand)
SELECT p_id, t_id AS matched_id, edit_dist FROM r WHERE rn = 1 ORDER BY p_id
"""

  /** Native per-group top-k through the whole-operator extension
    * (`plans/TopKPerGroup`: LogicalPlan → injected strategy → two-phase
    * bounded-heap SparkPlan — no sort exec, k·groups rows cross the
    * exchange). Total order (price desc, key) keeps the boundary
    * deterministic; oracle is the ranking-window twin. */
  def nativeTopK(s: SparkSession, dir: String): DataFrame =
    graft.plans.TopKPerGroup.topK(t(s, dir, "orders"),
        Seq(col("o_orderpriority")),
        Seq(col("o_totalprice").desc, col("o_orderkey")), k = 5)
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc, col("o_orderkey"))

  val nativeTopKSql: String = """
SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
  SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) x
WHERE rn <= 5
ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey
"""

  /** Frequent-items sketch (`approx_top_k`, DataSketches frequent-items
    * under the hood — completes the sketch family next to HLL distinct
    * and approx percentiles). Tracked capacity (default 10k) exceeds the
    * column's cardinality, so counts are exact and k ≥ distinct leaves
    * no tie-boundary — the result is deterministic and hash-oracled
    * against the exact GROUP BY twin. At real cardinality the sketch is
    * mergeable map-side state, no key shuffle. */
  def approxTopK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .agg(expr("approx_top_k(o_orderpriority, 5)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("item"), col("e.count").as("count"))
      .orderBy(col("count").desc, col("item"))

  val approxTopKSql: String = """
SELECT o_orderpriority AS item, COUNT(*) AS count
FROM orders GROUP BY o_orderpriority
ORDER BY count DESC, item
"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_approx_topk" -> (approxTopK _),
    "q_native_topk" -> (nativeTopK _),
    "q_asof_nearest" -> (asofNearest _),
    "q_dq_checks" -> (dqChecks _),
    "q_snapshot_diff" -> (snapshotDiff _),
    "q_incremental_agg" -> (incrementalAgg _),
    "q_fuzzy_match" -> (fuzzyMatch _))

  val oracles: Map[String, String] = Map(
    "q_approx_topk" -> approxTopKSql,
    "q_native_topk" -> nativeTopKSql,
    "q_asof_nearest" -> asofNearestSql,
    "q_dq_checks" -> dqChecksSql,
    "q_snapshot_diff" -> snapshotDiffSql,
    "q_incremental_agg" -> incrementalAggSql,
    "q_fuzzy_match" -> fuzzyMatchSql)
}
