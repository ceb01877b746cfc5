package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calendar gap-fill / resample — the time-series densification step:
  * give every key one row per day between its first and last
  * observation, carrying the last observed value forward across the
  * gaps (the relational form of pandas `resample().ffill()`).
  *
  * Shape: per-key daily closes are a max_by aggregation (map-side
  * combine, one shuffle keyed by key); the spine is a codegen'd
  * `sequence` explode of each key's [min, max] day span — generated,
  * never joined against a calendar dim; the forward fill is one
  * `last(ignoreNulls)` running window over the (key, day) frame the
  * aggregation already produced. Two shuffles total, both keyed by the
  * entity key, regardless of how sparse the data is.
  */
object GapFill {

  /** @param tieBreak orders observations within (key, day); the row
    *                 sorting LAST wins the day — pass a total order for
    *                 determinism (e.g. event time + unique id). */
  def dailyFfill(df: DataFrame, keyCol: String, tsCol: String,
                 valCol: Column, tieBreak: Seq[Column]): DataFrame = {
    val daily = df
      .select(col(keyCol), to_date(col(tsCol)).as("day"),
        valCol.as("__v"), struct(col(tsCol) +: tieBreak: _*).as("__ord"))
      .groupBy(keyCol, "day")
      .agg(max_by(col("__v"), col("__ord")).as("__close"))
    val spine = daily.groupBy(keyCol)
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
      .select(col(keyCol),
        explode(sequence(col("__d0"), col("__d1"), expr("INTERVAL 1 DAY"))).as("day"))
    val w = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq(keyCol, "day"), "left_outer")
      .withColumn("value", last(col("__close"), ignoreNulls = true).over(w))
      .select(col(keyCol), col("day"), col("value"))
  }
}
