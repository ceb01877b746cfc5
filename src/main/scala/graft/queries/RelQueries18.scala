package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Eighteenth analytics batch — robust/time-series statistics and a
  * storage-layout study: Theil–Sen robust trend (median of pairwise
  * slopes, Sen 1968) over a calendar-bounded window, Holt double
  * exponential smoothing as an exact-integer fold, and a zone-map
  * file-skipping profile that MEASURES why range-sorted layout matters
  * (the q_zorder/q_range_sorted story, quantified).
  */
object RelQueries18 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** Daily revenue series in exact cents, x = days since corpus min. */
  private def daySeries(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val mn = o.agg(min(to_date(col("o_orderdate"))).as("d0"))
    o.crossJoin(broadcast(mn))
      .groupBy(datediff(to_date(col("o_orderdate")), col("d0")).cast("long").as("x"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
  }

  // ------------------------------------------------------ Theil–Sen

  /** Theil–Sen robust slope of daily revenue over the LAST 120 days:
    * median of all pairwise slopes. The pair inventory is bounded by
    * CALENDAR cardinality (120 days → 7 140 pairs), not data volume —
    * the self-join is explicitly time-boxed, the house answer to
    * all-pairs shapes. Slopes are ⌊Δy·1000/Δx⌋ with the numerator
    * exact in a double (|Δy|·1000 ≪ 2⁵³), then ONE floor; the median
    * is the deterministic lower median by exact rank. */
  def theilSen(s: SparkSession, dir: String): DataFrame = {
    val all = daySeries(s, dir)
    val mx = all.agg(max(col("x")).as("m"))
    val day = all.crossJoin(broadcast(mx))
      .filter(col("x") >= col("m") - 119).select("x", "y")
      .localCheckpoint(true) // both sides of the bounded pair join
    val pairs = day.as("a").join(day.as("b"), col("b.x") > col("a.x"))
      .select(floor((col("b.y") - col("a.y")) * lit(1000.0) / (col("b.x") - col("a.x")))
        .cast("long").as("slope_milli"))
    val n = pairs.agg(count(lit(1)).as("n"))
    pairs.withColumn("r", row_number().over(Window.orderBy("slope_milli")))
      .crossJoin(broadcast(n))
      .filter(col("r") === expr("(n + 1) DIV 2"))
      .select(col("n").as("n_pairs"), col("slope_milli").as("median_slope_milli"))
  }

  val theilSenSql: String = """
WITH dall AS (
  SELECT CAST(date_diff('day', (SELECT min(CAST(o_orderdate AS DATE)) FROM orders), CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
         CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1),
mx AS (SELECT max(x) AS m FROM dall),
day AS (SELECT x, y FROM dall, mx WHERE x >= m - 119),
pairs AS (
  SELECT CAST(floor((b.y - a.y) * 1000.0 / (b.x - a.x)) AS BIGINT) AS slope_milli
  FROM day a JOIN day b ON b.x > a.x),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pairs),
rk AS (SELECT slope_milli, row_number() OVER (ORDER BY slope_milli) AS r FROM pairs)
SELECT n.n AS n_pairs, rk.slope_milli AS median_slope_milli
FROM rk, n WHERE rk.r = (n.n + 1) // 2
"""

  // ------------------------------------------------ Holt smoothing

  /** Holt double exponential smoothing (α=0.3, β=0.2) over the whole
    * daily-revenue series, exact integers end to end: state carries
    * (level, trend) ×10 so the DIV-10 smoothing steps keep one decimal
    * digit; both engines truncate integral division toward zero, so
    * negative trends stay bit-identical. The fold runs inside ONE
    * `aggregate()` higher-order expression over the calendar-bounded
    * ordered series (the q_bpe_merges fold discipline) — the twin is a
    * recursive CTE unrolling the identical recurrence. Output: final
    * state + the 7-day-ahead forecast. */
  def holtSmooth(s: SparkSession, dir: String): DataFrame = {
    daySeries(s, dir)
      .agg(transform(array_sort(collect_list(struct(col("x"), col("y")))),
        p => p.getField("y")).as("ys"))
      .select(expr("""
        aggregate(
          slice(ys, 3, size(ys) - 2),
          named_struct(
            'r', CAST(2 AS BIGINT),
            'l', element_at(ys, 2) * 10L,
            't', (element_at(ys, 2) - element_at(ys, 1)) * 10L),
          (acc, yv) -> named_struct(
            'r', acc.r + 1L,
            'l', (3L * yv * 10L + 7L * (acc.l + acc.t)) DIV 10L,
            't', (2L * ((3L * yv * 10L + 7L * (acc.l + acc.t)) DIV 10L - acc.l)
                  + 8L * acc.t) DIV 10L),
          acc -> named_struct(
            'n_days', acc.r, 'level_x10', acc.l, 'trend_x10', acc.t,
            'forecast7_x10', acc.l + 7L * acc.t))
      """).as("h"))
      .select(col("h.n_days").as("n_days"), col("h.level_x10").as("level_x10"),
        col("h.trend_x10").as("trend_x10"), col("h.forecast7_x10").as("forecast7_x10"))
  }

  val holtSmoothSql: String = """
WITH RECURSIVE day AS (
  SELECT CAST(date_diff('day', (SELECT min(CAST(o_orderdate AS DATE)) FROM orders), CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
         CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1),
idx AS (SELECT y, row_number() OVER (ORDER BY x) AS r FROM day),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM idx),
h AS (
  SELECT CAST(2 AS BIGINT) AS r,
         (SELECT y FROM idx WHERE r = 2) * 10 AS l10x,
         ((SELECT y FROM idx WHERE r = 2) - (SELECT y FROM idx WHERE r = 1)) * 10 AS t10x
  UNION ALL
  SELECT h.r + 1,
         (3 * i.y * 10 + 7 * (h.l10x + h.t10x)) // 10,
         (2 * ((3 * i.y * 10 + 7 * (h.l10x + h.t10x)) // 10 - h.l10x) + 8 * h.t10x) // 10
  FROM h JOIN idx i ON i.r = h.r + 1)
SELECT h.r AS n_days, h.l10x AS level_x10, h.t10x AS trend_x10,
       CAST(h.l10x + 7 * h.t10x AS BIGINT) AS forecast7_x10
FROM h, n WHERE h.r = n.n
"""

  // ------------------------------------------------ zone-map study

  /** Zone-map file-skipping profile: the same orders are laid out two
    * ways — hash-by-key (16 pseudo-files by o_orderkey % 16) and
    * range-sorted-by-date (16 equal day-range files) — and a 15-day
    * date predicate is tested against each file's (min,max) day zone
    * map. `n_pruned` is the number of files a reader never opens:
    * 0/16 under hash layout, 15/16 under range layout at any scale —
    * the measured argument for q_range_sorted/q_zorder. Two bounded
    * aggregations; the singleton (min,span) row is broadcast. */
  def fileSkipping(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val bounds = o.agg(min(to_date(col("o_orderdate"))).as("d0"),
      datediff(max(to_date(col("o_orderdate"))), min(to_date(col("o_orderdate"))))
        .cast("long").as("span"))
    val d = o.crossJoin(broadcast(bounds))
      .select(col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), col("d0")).cast("long").as("dx"),
        col("span"))
    def profile(name: String, fileCol: org.apache.spark.sql.Column) =
      d.groupBy(fileCol.as("f"))
        .agg(min("dx").as("lo"), max("dx").as("hi"))
        .agg(lit(name).as("layout"), count(lit(1)).as("n_files"),
          sum(when(col("hi") < 30 || col("lo") > 44, 1L).otherwise(0L)).as("n_pruned"))
    profile("key_layout", col("o_orderkey") % 16)
      .unionByName(profile("date_sorted", expr("(dx * 16) DIV (span + 1)")))
      .orderBy("layout")
  }

  val fileSkippingSql: String = """
WITH d AS (
  SELECT o_orderkey,
         CAST(date_diff('day', (SELECT min(CAST(o_orderdate AS DATE)) FROM orders), CAST(o_orderdate AS DATE)) AS BIGINT) AS dx,
         (SELECT CAST(date_diff('day', min(CAST(o_orderdate AS DATE)), max(CAST(o_orderdate AS DATE))) AS BIGINT) FROM orders) AS span
  FROM orders),
fa AS (SELECT o_orderkey % 16 AS f, min(dx) AS lo, max(dx) AS hi FROM d GROUP BY 1),
fb AS (SELECT (dx * 16) // (span + 1) AS f, min(dx) AS lo, max(dx) AS hi FROM d GROUP BY 1)
SELECT 'key_layout' AS layout, CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(CASE WHEN hi < 30 OR lo > 44 THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned
FROM fa
UNION ALL
SELECT 'date_sorted', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN hi < 30 OR lo > 44 THEN 1 ELSE 0 END) AS BIGINT)
FROM fb ORDER BY layout
"""

  // ------------------------------------------------------- registry

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_theil_sen" -> (theilSen _),
    "q_holt_smooth" -> (holtSmooth _),
    "q_file_skipping" -> (fileSkipping _))

  def oracles: Map[String, String] = Map(
    "q_theil_sen" -> theilSenSql,
    "q_holt_smooth" -> holtSmoothSql,
    "q_file_skipping" -> fileSkippingSql)
}
