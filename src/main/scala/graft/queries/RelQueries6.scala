package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Sixth relational batch — event-analytics operators: conversion
  * funnel, cohort retention, robust (MAD) outlier detection, stratified
  * sampling, and an exact finite-window EWMA.
  *
  * Determinism notes: every double is produced by one scalar IEEE op
  * over exact integers (cents, counts, integer weights); medians come
  * from `percentile` over cents (interpolation = one add + one divide,
  * reproducible against DuckDB's quantile_cont — same contract as
  * q_percentiles); window orders carry an id tiebreak so ties cannot
  * reorder between engines.
  */
object RelQueries6 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** Conversion funnel view → click → purchase: per user the earliest
    * view, the earliest click strictly after it, the earliest purchase
    * strictly after that. Each step is one groupBy(user) min — map-side
    * combine, shuffle keyed by user — and the step frames join back on
    * the same key, so AQE coalesces the whole funnel onto one exchange
    * footprint. No windows over the full event stream. */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("user_id"), col("ts"), col("event_type"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("view_ts"))
    val c = ev.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts") > col("view_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("click_ts"))
    val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts") > col("click_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("purchase_ts"))
    v.join(c, Seq("user_id"), "left_outer")
      .join(p, Seq("user_id"), "left_outer")
      .select(col("user_id"), col("view_ts"), col("click_ts"), col("purchase_ts"),
        (lit(1) +
          when(col("click_ts").isNotNull, 1).otherwise(0) +
          when(col("purchase_ts").isNotNull, 1).otherwise(0)).as("steps"))
      .orderBy("user_id")
  }

  val funnelSql: String = """
WITH v AS (
  SELECT user_id, min(ts) AS view_ts FROM events WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, min(e.ts) AS click_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.view_ts GROUP BY e.user_id),
p AS (
  SELECT e.user_id, min(e.ts) AS purchase_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts GROUP BY e.user_id)
SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts,
       1 + CAST(c.click_ts IS NOT NULL AS INTEGER)
         + CAST(p.purchase_ts IS NOT NULL AS INTEGER) AS steps
FROM v LEFT JOIN c ON v.user_id = c.user_id
       LEFT JOIN p ON v.user_id = p.user_id
ORDER BY v.user_id
"""

  /** Cohort retention: users grouped by first-activity day, counted per
    * day-offset of later activity. Two aggregations keyed by user then
    * (cohort, offset) — the first-touch frame is tiny (one row per user)
    * and broadcasts onto the distinct-activity frame. */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val first = ev.groupBy("user_id").agg(to_date(min(col("ts"))).as("cohort_day"))
    val act = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    act.join(broadcast(first), "user_id")
      .select(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("offset_days"))
      .groupBy("cohort_day", "offset_days")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "offset_days")
  }

  val cohortRetentionSql: String = """
WITH first AS (
  SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day FROM events GROUP BY user_id),
act AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
SELECT f.cohort_day, date_diff('day', f.cohort_day, a.day) AS offset_days,
       COUNT(*) AS n_users
FROM act a JOIN first f ON a.user_id = f.user_id
GROUP BY f.cohort_day, offset_days
ORDER BY f.cohort_day, offset_days
"""

  /** Robust outlier detection via median absolute deviation: per event
    * type, median(value), mad = median(|value − median|), and how many
    * events sit outside median ± 3·mad. Medians run over exact cents;
    * the group count is 5, so the two join-backs broadcast. At fact
    * scale the exact `percentile` swaps for the approx ladder the same
    * way q_percentiles documents. */
  def madOutliers(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("event_type"), cents(col("value")).as("c"))
    // med/mad are k-row frames each feeding two consumers — materialize
    // them (localCheckpoint) so Catalyst doesn't re-run the events scan
    // and percentile once per reuse (subplans aren't shared across
    // self-joins).
    val med = ev.groupBy("event_type")
      .agg(percentile(col("c"), lit(0.5)).as("med_c")).localCheckpoint(true)
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("c").cast("double") - col("med_c")))
    val mad = dev.groupBy("event_type")
      .agg(percentile(col("dev"), lit(0.5)).as("mad_c")).localCheckpoint(true)
    dev.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("dev") > col("mad_c") * 3.0, 1L).otherwise(0L)).as("n_outliers"))
      .join(med, "event_type").join(mad, "event_type")
      .select(col("event_type"), col("n"),
        (col("med_c") / 100.0).as("median_value"),
        (col("mad_c") / 100.0).as("mad_value"),
        col("n_outliers"))
      .orderBy("event_type")
  }

  val madOutliersSql: String = """
WITH ev AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events),
med AS (
  SELECT event_type, quantile_cont(c, 0.5) AS med_c FROM ev GROUP BY event_type),
dev AS (
  SELECT ev.event_type, abs(CAST(ev.c AS DOUBLE) - med.med_c) AS dev
  FROM ev JOIN med ON ev.event_type = med.event_type),
mad AS (
  SELECT event_type, quantile_cont(dev, 0.5) AS mad_c FROM dev GROUP BY event_type),
agg AS (
  SELECT dev.event_type, COUNT(*) AS n,
         CAST(SUM(CASE WHEN dev.dev > mad.mad_c * 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
  FROM dev JOIN mad ON dev.event_type = mad.event_type
  GROUP BY dev.event_type)
SELECT a.event_type, a.n, med.med_c / 100.0 AS median_value,
       mad.mad_c / 100.0 AS mad_value, a.n_outliers
FROM agg a JOIN med ON a.event_type = med.event_type
           JOIN mad ON a.event_type = mad.event_type
ORDER BY a.event_type
"""

  /** Deterministic stratified sample: 5 rows per event-type stratum,
    * picked by md5 of the row id — a seedless pseudo-random draw both
    * engines replay exactly. A ranking window partitioned by the
    * handful of strata would sort the WHOLE fact table across ~5 tasks
    * (one task per stratum — the r6 scale-killer); the bounded-heap
    * TopKPerGroup keeps 5 rows per stratum with map-side partials, so
    * only k·strata rows cross the shuffle and nothing sorts. The rank
    * is then re-derived by a window over the ≤ k·strata survivors —
    * trivially bounded. */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("__ord")
    val picked = graft.plans.TopKPerGroup.topK(
      t(s, dir, "events")
        .select(col("event_type"), col("event_id"), col("user_id"))
        .withColumn("__ord",
          md5(concat(lit("smp|"), col("event_id").cast("string")))),
      Seq(col("event_type")), Seq(col("__ord")), k = 5)
    picked.withColumn("rk", row_number().over(w))
      .drop("__ord")
      .orderBy("event_type", "rk")
  }

  val stratifiedSampleSql: String = """
SELECT event_type, event_id, user_id, rk FROM (
  SELECT event_type, event_id, user_id,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY md5('smp|' || CAST(event_id AS VARCHAR))) AS rk
  FROM events) x
WHERE rk <= 5 ORDER BY event_type, rk
"""

  /** Exact 8-tap EWMA (α = 1/2) of event value per user: integer
    * weights 128,64,…,1 over the last 8 events' cents, one final
    * division. A textbook recursive EWMA accumulates doubles in
    * arrival order — irreproducible across engines and partitionings;
    * the truncated form is a fixed dot product of longs, bitwise equal
    * everywhere, and windows with a (ts, event_id) total order so ties
    * can't reorder. One shuffle, keyed by user. */
  def ewma(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val ev = t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"), cents(col("value")).as("c"))
    val taps = (0 until 8).map { k =>
      val weight = 1L << (7 - k)
      val l = if (k == 0) col("c") else lag(col("c"), k).over(w)
      (coalesce(l, lit(0L)) * weight,
        when(l.isNotNull, lit(weight)).otherwise(lit(0L)))
    }
    val num = taps.map(_._1).reduce(_ + _)
    val den = taps.map(_._2).reduce(_ + _)
    ev.withColumn("ewma",
        num.cast("double") / (den * 100L).cast("double"))
      .select(col("event_id"), col("user_id"), (col("c") / 100.0).as("value"), col("ewma"))
      .orderBy("event_id")
  }

  val ewmaSql: String = {
    val lags = (0 until 8).map { k =>
      val weight = 1L << (7 - k)
      val l = if (k == 0) "c"
      else s"lag(c, $k) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
      (s"COALESCE($l, 0) * $weight",
        s"CASE WHEN $l IS NOT NULL THEN ${weight} ELSE 0 END")
    }
    val num = lags.map(_._1).mkString(" + ")
    val den = lags.map(_._2).mkString(" + ")
    s"""
WITH ev AS (
  SELECT event_id, user_id, ts, CAST(round(value * 100) AS BIGINT) AS c FROM events),
x AS (
  SELECT event_id, user_id, c,
         CAST($num AS DOUBLE) AS num,
         CAST($den AS BIGINT) AS den
  FROM ev)
SELECT event_id, user_id, c / 100.0 AS value, num / CAST(den * 100 AS DOUBLE) AS ewma
FROM x ORDER BY event_id
"""
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel" -> (funnel _),
    "q_cohort_retention" -> (cohortRetention _),
    "q_mad_outliers" -> (madOutliers _),
    "q_stratified_sample" -> (stratifiedSample _),
    "q_ewma" -> (ewma _))

  val oracles: Map[String, String] = Map(
    "q_funnel" -> funnelSql,
    "q_cohort_retention" -> cohortRetentionSql,
    "q_mad_outliers" -> madOutliersSql,
    "q_stratified_sample" -> stratifiedSampleSql,
    "q_ewma" -> ewmaSql)
}
