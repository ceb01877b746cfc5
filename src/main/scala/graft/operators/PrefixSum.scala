package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Range-bucketed two-pass prefix sum — the scale-safe replacement for
  * `sum(x).over(Window.orderBy(o))`, which Spark plans as ONE partition
  * holding (and sorting) every row (`WindowExec: No Partition Defined`
  * — the warning wall in the r6 bench).
  *
  * Two passes, both distributed:
  *   1. each row gets a range-bucket id; buckets compute their local
  *      running sums via a window PARTITIONED by bucket (parallel,
  *      spillable);
  *   2. per-bucket totals (≤ numShufflePartitions rows — bounded by
  *      cluster config, not data) get their own tiny prefix to form
  *      each bucket's offset, broadcast-joined back.
  * The textbook scan-then-propagate parallel prefix (Blelloch '90) in
  * DataFrame ops, so Catalyst still prunes and pushes below it.
  *
  * The bucket id is a PURE FUNCTION of the row — `bucketKey` compared
  * against an approx-percentile cut-point array computed once and
  * broadcast — NOT `spark_partition_id()` over `repartitionByRange`.
  * The physical-partition spelling is wrong under AQE: the offsets
  * branch and the main branch re-evaluate the exchange independently
  * and may coalesce to different bucketings, silently corrupting the
  * offsets. Data-derived ids agree across any number of plan branches
  * by construction. Ties on `bucketKey` always share a bucket
  * (strictly-greater comparison), so boundary placement can never
  * split equal keys.
  *
  * Contract: `orderCols` must be a TOTAL order (same contract as
  * Dedup.keepFirst); `bucketKey` must be non-null, numeric, and
  * ascending along that order (pass a negated column for descending
  * heads); `value` must be long-typed (exact integer discipline —
  * doubles would make results depend on bucket boundaries).
  */
object PrefixSum {

  /** Adds `out` = running sum of `value` over the total order
    * `orderCols` (exclusive by default: sum of strictly-preceding rows,
    * 0 for the first — the `rowsBetween(unboundedPreceding, -1)`
    * shape). `inclusive = true` gives the current-row-included form. */
  def runningSum(df: DataFrame, bucketKey: Column, orderCols: Seq[Column],
                 value: Column, out: String,
                 inclusive: Boolean = false): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val probs = (1 until n).map(_.toDouble / n).toArray
    // Greenwald-Khanna is deterministic for a given input, and the cut
    // array is evaluated once per branch to the same values — every
    // consumer sees identical bucket boundaries.
    val cuts = df.agg(
      percentile_approx(bucketKey, typedLit(probs), lit(10000)).as("__pscuts"))
    val bucketed = df.crossJoin(broadcast(cuts))
      .withColumn("__psbucket",
        aggregate(col("__pscuts"), lit(0),
          (acc, c) => acc + when(bucketKey > c, 1).otherwise(0)))
      .drop("__pscuts")
    val wLocal = Window.partitionBy("__psbucket").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Bucket offsets via a triangular self-join over the per-bucket
    // totals — ≤ n² cells with n bounded by cluster config, not data.
    // Spelled as a join (not an unpartitioned window) so NO plan node
    // anywhere funnels rows to a single partition.
    val totals = bucketed.groupBy("__psbucket").agg(sum(value).as("__pstot"))
    val offsets = totals.as("a")
      .join(totals.as("b"), col("b.__psbucket") < col("a.__psbucket"), "left")
      .groupBy(col("a.__psbucket").as("__psbucket"))
      .agg(coalesce(sum(col("b.__pstot")), lit(0L)).as("__psoff"))
    val incl = col("__psoff") + sum(value).over(wLocal)
    bucketed.join(broadcast(offsets), "__psbucket")
      .withColumn(out, if (inclusive) incl else incl - value)
      .drop("__psbucket", "__psoff")
  }

  /** 1-based rank under the total order `orderCols` — `row_number()
    * .over(Window.orderBy(...))` without the single-partition sort.
    * A prefix count of 1s: rank = (# strictly-preceding rows) + 1. */
  def rank(df: DataFrame, bucketKey: Column, orderCols: Seq[Column],
           out: String): DataFrame =
    runningSum(df, bucketKey, orderCols, lit(1L), out)
      .withColumn(out, col(out) + lit(1L))
}
