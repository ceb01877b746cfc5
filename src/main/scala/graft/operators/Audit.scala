package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline observability via `Dataset.observe`: audit metrics (row
  * counts, null counts, domain violations) collected DURING the job's
  * existing pass — no second scan, no extra action. The streaming-safe
  * alternative to `df.count()` bookkeeping, and the production answer to
  * the reference's print-style logging (`CSV PARSER/gcp_csv.py:196`).
  *
  * Usage: attach at any pipeline stage, read the map after the action.
  * At 100 TB this is the only affordable audit: metrics ride the
  * already-running tasks as accumulator-style aggregates.
  */
object Audit {

  /** Attach standard ingest audit metrics; returns (df, observation).
    * Read `observation.get` after the first action on `df`. */
  def observed(df: DataFrame, name: String,
               nullChecked: Seq[String] = Nil,
               extra: Seq[Column] = Nil): (DataFrame, Observation) = {
    val obs = Observation(name)
    val metrics: Seq[Column] =
      count(lit(1)).as("rows") +:
        nullChecked.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c")) ++:
        extra
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
