package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (the Deequ-style gate a
  * production ingest runs before publishing a table): every check's
  * metric is an aggregate expression, so the whole suite computes in ONE
  * distributed pass over the data — no per-check scans, no driver-side
  * row iteration — and the verdicts land as rows a pipeline can assert
  * on or sink to a monitoring table.
  *
  * Complements `Audit` (observe-based counters riding an existing job):
  * DataQuality is a standalone pass with pass/fail semantics per
  * constraint.
  */
object DataQuality {

  /** One constraint: an aggregate `metric` and a predicate over the
    * computed metric value. */
  final case class Check(name: String, metric: Column, pass: Column => Column)

  /** Fraction of non-null values (1.0 = complete). */
  def completeness(c: Column): Column =
    count(c).cast("double") / count(lit(1)).cast("double")

  /** Distinct-to-total ratio (1.0 = unique). Exact, not HLL: uniqueness
    * gates need certainty. */
  def uniqueness(c: Column): Column =
    countDistinct(c).cast("double") / count(lit(1)).cast("double")

  /** Fraction of values inside an allowed domain. */
  def domain(c: Column, allowed: Seq[String]): Column =
    sum(when(c.isInCollection(allowed), 1L).otherwise(0L)).cast("double") /
      count(lit(1)).cast("double")

  /** Run all checks in one aggregation pass:
    * (check, metric_value, passed) — one row per check. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val agg = df.agg(
      checks.head.metric.cast("double").as(checks.head.name),
      checks.tail.map(c => c.metric.cast("double").as(c.name)): _*)
    val rows = array(checks.map { c =>
      struct(lit(c.name).as("check"),
        col(c.name).as("metric_value"),
        c.pass(col(c.name)).as("passed"))
    }: _*)
    agg.select(explode(rows).as("r")).select("r.*")
  }
}
