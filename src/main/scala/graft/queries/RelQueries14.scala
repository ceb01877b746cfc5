package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Sssp

/** Fourteenth analytics batch: blocked fuzzy (Levenshtein) entity
  * matching, cumulative-distinct user counting via the first-touch
  * rewrite, rolling 7-day distinct actives via the interval-coverage
  * rewrite (the oracle states the textbook windowed COUNT(DISTINCT)
  * definition — the query proves the scalable rewrite equals it), and
  * hop-bounded weighted shortest paths ([[Sssp]] Bellman–Ford rounds
  * twinned by a bounded recursive-CTE walk enumeration).
  */
object RelQueries14 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  // ------------------------------------------------------- fuzzy join

  /** Blocked fuzzy entity match: document titles (first 30 chars)
    * against a planted perturbed replica (one char deleted past the
    * block prefix), candidate pairs restricted by a 4-char-prefix
    * equi-join key plus a ±2 length band — the SSJoin-style blocking
    * that keeps Levenshtein evaluations to prefix-bucket-sized groups
    * (max natural bucket at sf0.01 is 26 titles), never the corpus
    * cross product. Every planted pair must surface at lev ≤ 2
    * (deletion ⇒ lev = 1); natural near-dup titles ride along and both
    * engines compute the identical edit distance. */
  def fuzzyJoin(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").filter(col("doc_id") < 400)
      .select(col("doc_id").as("id"), substring(col("text"), 1, 30).as("title"))
    val probe = base.select((col("id") + 1000000L).as("id"),
      concat(substring(col("title"), 1, 4), expr("substr(title, 6)")).as("title"))
    probe.as("p").join(base.as("b"),
        substring(col("p.title"), 1, 4) === substring(col("b.title"), 1, 4) &&
        abs(length(col("p.title")) - length(col("b.title"))) <= 2)
      .select(col("p.id").as("probe_id"), col("b.id").as("base_id"),
        levenshtein(col("p.title"), col("b.title")).cast("long").as("lev"))
      .filter(col("lev") <= 2)
      .orderBy("probe_id", "base_id")
  }

  val fuzzyJoinSql: String = """
WITH base AS (
  SELECT doc_id AS id, substr(text, 1, 30) AS title FROM documents WHERE doc_id < 400),
probe AS (
  SELECT id + 1000000 AS id, substr(title, 1, 4) || substr(title, 6) AS title FROM base),
cand AS (
  SELECT p.id AS probe_id, b.id AS base_id, levenshtein(p.title, b.title) AS lev
  FROM probe p JOIN base b
    ON substr(p.title, 1, 4) = substr(b.title, 1, 4)
   AND abs(length(p.title) - length(b.title)) <= 2)
SELECT CAST(probe_id AS BIGINT) AS probe_id, CAST(base_id AS BIGINT) AS base_id,
       CAST(lev AS BIGINT) AS lev
FROM cand WHERE lev <= 2 ORDER BY probe_id, base_id
"""

  // --------------------------------------------- cumulative distinct

  /** Daily active / new / cumulative-distinct users. The cumulative
    * distinct count NEVER runs COUNT(DISTINCT) over a growing frame —
    * each user collapses to a first-touch date (one groupBy), and the
    * running sum of first-touches IS the cumulative distinct count.
    * That rewrite is the 100 TB shape: per-day distincts are bounded
    * by that day's traffic, the window runs over the (tiny) day
    * series, and nothing rescans history. */
  def cumulativeUsers(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(to_date(col("ts")).as("d"), col("user_id"))
    val dau = ev.distinct().groupBy("d").agg(count(lit(1)).as("dau"))
    val nu = ev.groupBy("user_id").agg(min(col("d")).as("d"))
      .groupBy("d").agg(count(lit(1)).as("new_users"))
    // global window audit (r19): frame = day-grain series (one row per
    // calendar day) — bounded by the date range, never event volume
    val w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dau.join(nu, Seq("d"), "left")
      .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
      .withColumn("cum_users", sum("new_users").over(w))
      .select(date_format(col("d"), "yyyy-MM-dd").as("d"),
        col("dau"), col("new_users"), col("cum_users"))
      .orderBy("d")
  }

  val cumulativeUsersSql: String = """
WITH ud AS (SELECT user_id, min(CAST(ts AS DATE)) AS first_d FROM events GROUP BY 1),
dau AS (SELECT CAST(ts AS DATE) AS d, COUNT(DISTINCT user_id) AS dau FROM events GROUP BY 1),
nu AS (SELECT first_d AS d, COUNT(*) AS new_users FROM ud GROUP BY 1)
SELECT strftime(dau.d, '%Y-%m-%d') AS d, CAST(dau.dau AS BIGINT) AS dau,
       CAST(COALESCE(nu.new_users, 0) AS BIGINT) AS new_users,
       CAST(SUM(COALESCE(nu.new_users, 0)) OVER (ORDER BY dau.d) AS BIGINT) AS cum_users
FROM dau LEFT JOIN nu ON dau.d = nu.d
ORDER BY d
"""

  // --------------------------------------------- rolling distinct (WAU)

  /** Weekly active users (rolling 7-day distinct purchasers) WITHOUT a
    * windowed COUNT(DISTINCT): each user's active days merge into
    * maximal coverage intervals [a, last+6] (gap > 6 starts a new
    * island), intervals become ±1 boundary deltas, and a running sum
    * over the day series is exactly "users with ≥1 purchase in
    * [d−6, d]". The oracle is the TEXTBOOK definition — a day-grid ⋈
    * range join with COUNT(DISTINCT) — so the hash-match proves the
    * interval-coverage rewrite equal to the definition. At scale the
    * rewrite is one sort per user + day-series arithmetic; the
    * definition rescans a week of raw events per day. */
  def wauCoverage(s: SparkSession, dir: String): DataFrame = {
    val ud = t(s, dir, "events").filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val wOrd = Window.partitionBy("user_id").orderBy("d")
    val iv = ud
      .withColumn("prev", lag(col("d"), 1).over(wOrd))
      .withColumn("brk", when(col("prev").isNull ||
        datediff(col("d"), col("prev")) > 6, 1L).otherwise(0L))
      .withColumn("island", sum("brk").over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "island")
      .agg(min("d").as("st"), date_add(max(col("d")), 6).as("en"))
    val deltas = iv.select(col("st").as("day"), lit(1L).as("delta"))
      .unionByName(iv.select(date_add(col("en"), 1).as("day"), lit(-1L).as("delta")))
    val grid = t(s, dir, "events").select(to_date(col("ts")).as("day")).distinct()
    val cum = grid.select(col("day"), lit(0L).as("delta")).unionByName(deltas)
      .groupBy("day").agg(sum("delta").as("delta"))
      // global window audit (r19): frame = the day grid (one row per
      // calendar day) — date-range-bounded, never event volume
      .withColumn("cov", sum("delta").over(
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    grid.join(cum, "day")
      .select(date_format(col("day"), "yyyy-MM-dd").as("d"), col("cov").as("wau"))
      .orderBy("d")
  }

  val wauCoverageSql: String = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events WHERE event_type = 'purchase'),
grid AS (SELECT DISTINCT CAST(ts AS DATE) AS g FROM events)
SELECT strftime(g, '%Y-%m-%d') AS d, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
FROM grid JOIN ud ON ud.d BETWEEN g - 6 AND g
GROUP BY g ORDER BY d
"""

  // --------------------------------------------- bounded weighted SSSP

  /** Hop-bounded weighted shortest paths over the part-derived sparse
    * graph (the q_bfs_hops graph with weight 1 + partkey%7): [[Sssp]]
    * runs ≤4 Bellman–Ford rounds; the twin enumerates the same bounded
    * walk set with a recursive CTE and takes MIN(dist) — equal because
    * after round k the label table is exactly the ≤k-edge walk minimum. */
  def ssspBounded(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "part").select(
      (col("p_partkey") % 1000).as("src"),
      ((col("p_partkey") + col("p_size")) % 1000).as("dst"),
      (lit(1) + col("p_partkey") % 7).as("w"))
    Sssp.bounded(e, source = 0L, maxHops = 4).orderBy("id")
  }

  val ssspBoundedSql: String = """
WITH RECURSIVE d AS (
  SELECT p_partkey % 1000 AS src, (p_partkey + p_size) % 1000 AS dst,
         1 + p_partkey % 7 AS w
  FROM part),
e AS (
  SELECT src, dst, MIN(w) AS w FROM (
    SELECT src, dst, w FROM d WHERE src <> dst
    UNION ALL
    SELECT dst, src, w FROM d WHERE src <> dst) GROUP BY 1, 2),
walk(id, dist, hops) AS (
  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0
  UNION
  SELECT e.dst, w2.dist + e.w, w2.hops + 1
  FROM walk w2 JOIN e ON e.src = w2.id WHERE w2.hops < 4)
SELECT CAST(id AS BIGINT) AS id, CAST(MIN(dist) AS BIGINT) AS dist
FROM walk GROUP BY id ORDER BY id
"""

  // ------------------------------------------------------- registry

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fuzzy_join" -> (fuzzyJoin _),
    "q_cumulative_users" -> (cumulativeUsers _),
    "q_wau_coverage" -> (wauCoverage _),
    "q_sssp_bounded" -> (ssspBounded _))

  def oracles: Map[String, String] = Map(
    "q_fuzzy_join" -> fuzzyJoinSql,
    "q_cumulative_users" -> cumulativeUsersSql,
    "q_wau_coverage" -> wauCoverageSql,
    "q_sssp_bounded" -> ssspBoundedSql)
}
