package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): rows not dominated on
  * (minimize `xCol`, maximize `yCol`). Reference behavior: fxblue-etl
  * has no skyline; this extends the SURVEY §2.4 analytics family with
  * the classic multi-criteria shortlist operator ("cheapest-but-best"
  * part/supplier selection).
  *
  * Algorithm — sort-filter skyline, distributed as a two-phase prune
  * (the standard shape for skylines on partitioned data, cf. the
  * sort-first skyline of Chomicki et al., ICDE'03):
  *
  *   1. group: one hash aggregation to per-x heads (x, max y) — a row
  *      can only be dominated by a same-x row with larger y, so only
  *      group heads can be skyline members. Fully parallel.
  *   2. coarse prune: bucket x into fixed-width ranges, take per-bucket
  *      max y (one small aggregation), and a running best over
  *      strictly-lower buckets (window over ≤ a few thousand bucket
  *      rows). A head survives only if its y beats every strictly
  *      lower bucket's best — conservative, never drops a true skyline
  *      head: lower buckets hold only strictly smaller x.
  *   3. exact pass: running max-y over the pruned survivors ordered by
  *      x, PARTITIONED by bucket (r8). Sound because a survivor already
  *      beats every strictly-lower bucket's best (step 2's filter), so
  *      the only dominators left to check share its bucket; and within
  *      a bucket, heads dropped by the coarse prune have y ≤ that same
  *      lower-bucket best, so they can never exceed the surviving
  *      prefix max. No single-partition window over a data-growing
  *      frame remains — the only global-ordered window left is step
  *      2's bucket series (one row per fixed-width x-range:
  *      granularity-bounded by the key domain, not by row count).
  *   4. join back on (x, y = max y) to recover every id at a surviving
  *      head, keeping exact tie semantics: two rows with identical
  *      (x, y) dominate each other only weakly, so both are skyline.
  *
  * Output: (all input columns) of skyline rows.
  */
object Skyline {

  /** Skyline of `df` minimizing `xCol`, maximizing `yCol` (both
    * numeric, non-null). `bucketWidth` is the coarse-prune granularity
    * in x units. */
  def pareto(df: DataFrame, xCol: String, yCol: String,
             bucketWidth: Long): DataFrame = {
    val heads = df.groupBy(col(xCol).as("sk_x"))
      .agg(max(col(yCol)).as("sk_y"))
    val bucketed = heads.withColumn("sk_b", floor(col("sk_x") / bucketWidth))
    val bmax = bucketed.groupBy("sk_b").agg(max(col("sk_y")).as("sk_bmax"))
    // global window audit (r19): frame = one row per x-BUCKET, i.e.
    // ≤ (x value range)/bucketWidth rows — bounded by the caller's
    // bucketWidth choice against the domain's value range (q_skyline:
    // ~130k cents of price range / 100k ≈ 3 buckets), independent of
    // row count. GlobalWindowBoundSpec pins the q_skyline instance.
    val wB = Window.orderBy("sk_b").rowsBetween(Window.unboundedPreceding, -1)
    val prevB = bmax.withColumn("sk_prevbmax", max(col("sk_bmax")).over(wB))
    val pruned = bucketed.join(prevB.select("sk_b", "sk_prevbmax"), "sk_b")
      .filter(col("sk_prevbmax").isNull || col("sk_y") > col("sk_prevbmax"))
    val wX = Window.partitionBy("sk_b").orderBy("sk_x")
      .rowsBetween(Window.unboundedPreceding, -1)
    val exact = pruned.withColumn("sk_prevmax", max(col("sk_y")).over(wX))
      .filter(col("sk_prevmax").isNull || col("sk_y") > col("sk_prevmax"))
      .select(col("sk_x"), col("sk_y"))
    df.join(exact, df(xCol) === col("sk_x") && df(yCol) === col("sk_y"))
      .drop("sk_x", "sk_y")
  }
}
