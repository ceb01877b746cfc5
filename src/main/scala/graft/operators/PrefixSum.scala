package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Range-bucketed two-pass prefix sum — the scale-safe replacement for
  * `sum(x).over(Window.orderBy(o))`, which Spark plans as ONE partition
  * holding (and sorting) every row (`WindowExec: No Partition Defined`
  * — the warning wall in the r6 bench).
  *
  * The textbook scan-then-propagate parallel prefix (Blelloch '90):
  *   1. each row gets a range-bucket id; buckets compute their local
  *      running sums via a window PARTITIONED by bucket (parallel,
  *      spillable);
  *   2. per-bucket totals (≤ numShufflePartitions rows — bounded by
  *      cluster config, not data) become each bucket's exclusive
  *      offset, added back as a literal-map lookup.
  *
  * Determinism is pinned BY CONSTRUCTION (the r7 advisory): the input
  * is staged once behind a lazy localCheckpoint, the percentile cut
  * array is collected ONCE and embedded as literals, and the bucket
  * offsets are folded on the driver from the collected per-bucket
  * totals. No plan branch re-derives the cuts, so correctness cannot
  * depend on exchange reuse or on Greenwald-Khanna partial-merge order
  * (which is fetch-order-sensitive) agreeing across branches — the
  * same failure class as the `spark_partition_id()` spelling this
  * operator was written to avoid. Both driver collects are
  * config-bounded (n-1 cut doubles; ≤ n total rows), never
  * data-bounded, and the literal spelling also deletes the former
  * cuts crossJoin + triangular offsets join: the main pass is one
  * scan of the staged blocks plus one bucket-partitioned window.
  *
  * Ties on `bucketKey` always share a bucket (strictly-greater
  * comparison against the cut), so boundary placement can never split
  * equal keys.
  *
  * Contract: `orderCols` must be a TOTAL order (same contract as
  * Dedup.keepFirst); `bucketKey` must be non-null, numeric, and
  * ascending along that order (pass a negated column for descending
  * heads); `value` must be long-typed and non-null (exact integer
  * discipline — doubles would make results depend on bucket
  * boundaries). Calling this is eager: it runs two small jobs (stage +
  * cuts, totals) at plan-construction time.
  */
object PrefixSum {

  /** Adds `out` = running sum of `value` over the total order
    * `orderCols` (exclusive by default: sum of strictly-preceding rows,
    * 0 for the first — the `rowsBetween(unboundedPreceding, -1)`
    * shape). `inclusive = true` gives the current-row-included form. */
  def runningSum(df: DataFrame, bucketKey: Column, orderCols: Seq[Column],
                 value: Column, out: String,
                 inclusive: Boolean = false,
                 preStaged: Boolean = false,
                 keyRange: Option[(Double, Double)] = None,
                 cutsOverride: Option[Seq[Double]] = None,
                 offsetsOverride: Option[Map[Int, Long]] = None,
                 keepBucket: Option[String] = None): DataFrame =
    runningSumTotal(df, bucketKey, orderCols, value, out, inclusive,
      preStaged, keyRange, cutsOverride, offsetsOverride, keepBucket)._1

  /** [[runningSum]] plus the GRAND TOTAL of `value`, read for free from
    * the per-bucket totals fold the offset pass already runs — callers
    * that need Σvalue (NTILE arithmetic, target-mass derivation, a
    * frequency-weighted vocabulary's position count) stop paying a
    * separate aggregation scan. */
  def runningSumWithTotal(df: DataFrame, bucketKey: Column,
                 orderCols: Seq[Column], value: Column, out: String,
                 inclusive: Boolean = false): (DataFrame, Long) =
    runningSumTotal(df, bucketKey, orderCols, value, out, inclusive)

  /** [[runningSumWithTotal]]'s engine. Total is `-1` when
    * `offsetsOverride` short-circuits the fold (the caller supplied the
    * offsets, so it already knows the total). */
  private def runningSumTotal(df: DataFrame, bucketKey: Column,
                 orderCols: Seq[Column], value: Column, out: String,
                 inclusive: Boolean = false,
                 preStaged: Boolean = false,
                 keyRange: Option[(Double, Double)] = None,
                 cutsOverride: Option[Seq[Double]] = None,
                 offsetsOverride: Option[Map[Int, Long]] = None,
                 keepBucket: Option[String] = None): (DataFrame, Long) = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    // Lazy checkpoint: the first action below materializes the blocks;
    // the totals pass and the main pass then read the SAME data.
    // `preStaged = true` promises df is ALREADY materialized
    // (checkpointed/cached) by the caller — skip the second staging so
    // small consumers don't pay a redundant persist pass.
    val keyed = df.withColumn("__pskey", bucketKey.cast("double"))
    val staged = if (preStaged) keyed else keyed.localCheckpoint(false)
    // `keyRange = Some((lo, hi))` declares bucketKey ∈ [lo, hi]: cut
    // points come from a uniform literal grid and the percentile stats
    // job is skipped entirely. Right when the key is (pseudo-)uniform
    // over a caller-known range (e.g. a mod-stot remainder); the
    // percentile path remains the default for unknown/skewed keys.
    // `cutsOverride` supplies the cut array directly — for callers that
    // batch the stats for several runningSum calls into one job.
    val cuts = cutsOverride.map(_.distinct.sorted).getOrElse(keyRange match {
      case Some((lo, hi)) =>
        (1 until n).map(i => lo + (hi - lo) * i / n).distinct.sorted
      case None => approxCuts(staged, n)
    })
    val bucketed = staged.withColumn("__psbucket",
      bucketExpr(col("__pskey"), cuts))
    // Exclusive bucket offsets, folded on the driver over ≤ n rows.
    // `offsetsOverride` promises offsets(b) = Σ value over buckets < b
    // (same batching rationale as cutsOverride); with both overrides
    // this operator runs fully lazily — zero jobs at build time.
    val (offsets, grandTotal): (Map[Int, Long], Long) = offsetsOverride match {
      case Some(o) => (o, -1L)
      case None =>
        val totals = bucketed.groupBy("__psbucket").agg(sum(value).as("__pstot"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
        var acc = 0L
        val m = totals.map { case (b, t) => val o = b -> acc; acc += t; o }.toMap
        (m, acc)
    }
    val offExpr =
      if (offsets.isEmpty) lit(0L)
      else coalesce(element_at(typedLit(offsets), col("__psbucket")), lit(0L))
    val wLocal = Window.partitionBy("__psbucket").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val incl = offExpr + sum(value).over(wLocal)
    // `keepBucket = Some(name)` exposes the internal range-bucket id:
    // rows equal on bucketKey always share a bucket, so a follow-up
    // window partitioned by (bucket, <bucketKey-determined cols>) is
    // already clustered — the caller fuses it onto this pass's
    // distribution with a partition-local sort, no extra shuffle.
    val summed = bucketed.withColumn(out, if (inclusive) incl else incl - value)
    (keepBucket.map(name => summed.withColumnRenamed("__psbucket", name)
        .drop("__pskey"))
      .getOrElse(summed.drop("__psbucket", "__pskey")), grandTotal)
  }

  /** Percentile-sketch cut points over a staged frame's `__pskey` —
    * the ONE spelling of the cuts job shared by runningSum and
    * selectRanks (accuracy 1000: cuts only balance bucket load, never
    * touch result values, so sketch precision is wasted merge cost). */
  private def approxCuts(staged: DataFrame, n: Int): Seq[Double] = {
    val probs = (1 until n).map(_.toDouble / n).toArray
    val cutsRaw = staged
      .agg(percentile_approx(col("__pskey"), typedLit(probs), lit(1000)).as("c"))
      .head().getSeq[Double](0)
    Option(cutsRaw).map(_.distinct.sorted.toSeq).getOrElse(Seq.empty[Double])
  }

  /** ⌈p·n⌉ target ranks for the quartiles — the ONE spelling of the
    * p25/p50/p75 rank arithmetic shared by q_exact_quantiles,
    * q_weighted_quantiles and q_stream_quantiles. Integer-exact:
    * (n+3)/4 = ⌈n/4⌉ etc.; agreement with DuckDB `percentile_disc`'s
    * rank choice is load-bearing for all three oracle twins, so the
    * arithmetic must not be re-stated per query. */
  def quartileRanks(n: Long): Seq[(String, Long)] = Seq(
    "p25" -> (n + 3) / 4, "p50" -> (n + 1) / 2, "p75" -> (3 * n + 3) / 4)

  /** The bucket id a row with key `key` gets for cut array `cuts`
    * (must be sorted distinct): # cuts strictly below the key. Public
    * so offsetsOverride callers can histogram rows by the IDENTICAL
    * bucket function in their own batched job. */
  def bucketExpr(key: Column, cuts: Seq[Double]): Column =
    cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(key.cast("double") > lit(c), 1).otherwise(0)
    }

  /** Pushable twin of `bucketExpr(key, cuts) ∈ hit`: bucket b holds
    * exactly the keys in (cuts(b−1), cuts(b)] (open-ended at the
    * extremes), so membership is a FLAT range disjunction over the few
    * hit buckets. The selection passes filter with THIS instead of
    * re-evaluating the bucket expression per row: the 31-deep chained
    * CaseWhen, inlined into a codegen'd Filter and re-substituted
    * through the projects, exceeds the JIT's method-compile budget and
    * ran INTERPRETED (~100× slower — measured 17 s vs 0.4 s on a 6M-row
    * staged frame); the range form is a handful of double compares, and
    * at production scale it is also the predicate a parquet scan can
    * prune row groups with, which a computed-column filter never is. */
  private def bucketRangeFilter(key: Column, cuts: Seq[Double],
                                hit: Seq[Int]): Column =
    if (cuts.isEmpty) lit(true)
    else {
      val ranges = hit.map { b =>
        val lo = if (b == 0) None else Some(cuts(b - 1))
        val hi = if (b == cuts.length) None else Some(cuts(b))
        (lo, hi) match {
          case (None, Some(h))    => key <= lit(h)
          case (Some(l), Some(h)) => key > lit(l) && key <= lit(h)
          case (Some(l), None)    => key > lit(l)
          case (None, None)       => lit(true)
        }
      }.reduce(_ || _)
      // Null keys are outside the operator contract, but bucketExpr
      // tallies them into bucket 0 (every `null > cut` is false), so the
      // counts/offsets include them — keep the final pass consistent
      // with that rather than silently mis-selecting by a null-count
      // offset when bucket 0 is a hit.
      if (hit.contains(0)) ranges || key.isNull else ranges
    }

  /** SQL-standard NTILE bucket (1-based) for a 1-based global rank when
    * the total row count `n` is driver-known: the first n mod k buckets
    * take ⌈n/k⌉ rows, the rest ⌊n/k⌋. Combined with [[rank]] this gives
    * `ntile(k).over(Window.orderBy(...))` without the single-partition
    * sort. floor() keeps the arithmetic integral (Spark's `/` on longs
    * is double division); operands stay far under 2^53, so exact. */
  def ntileExpr(rank: Column, n: Long, k: Long): Column = {
    require(k > 0, "k must be positive")
    val q = n / k
    val r = n % k
    when(lit(r) > 0 && rank <= lit((q + 1) * r),
        floor((rank - 1) / lit((q + 1).toDouble)) + 1)
      .otherwise(lit(r) +
        floor((rank - lit((q + 1) * r) - 1) / lit(math.max(q, 1L).toDouble)) + 1)
  }

  /** 1-based rank under the total order `orderCols` — `row_number()
    * .over(Window.orderBy(...))` without the single-partition sort.
    * A prefix count of 1s: rank = (# strictly-preceding rows) + 1. */
  def rank(df: DataFrame, bucketKey: Column, orderCols: Seq[Column],
           out: String, preStaged: Boolean = false,
           keyRange: Option[(Double, Double)] = None,
           keepBucket: Option[String] = None): DataFrame =
    rankWithCount(df, bucketKey, orderCols, out, preStaged, keyRange,
      keepBucket)._1

  /** [[rank]] plus the EXACT total row count n, read from the same
    * per-bucket totals fold the rank pass already collects — the NTILE
    * caller's n comes for free instead of from a separate `count()`
    * scan of the input. */
  def rankWithCount(df: DataFrame, bucketKey: Column, orderCols: Seq[Column],
           out: String, preStaged: Boolean = false,
           keyRange: Option[(Double, Double)] = None,
           keepBucket: Option[String] = None): (DataFrame, Long) = {
    val (r, n) = runningSumTotal(df, bucketKey, orderCols, lit(1L), out,
      preStaged = preStaged, keyRange = keyRange, keepBucket = keepBucket)
    (r.withColumn(out, col(out) + lit(1L)), n)
  }

  /** Distributed SELECTION: the rows at specific global ranks under the
    * total order, without ranking (or even window-scanning) anything
    * beyond the buckets that contain a target. [[rank]] + filter pays a
    * partitioned window over EVERY row; a selection only needs the
    * per-bucket counts (a driver-folded ≤ numShufflePartitions-row
    * aggregate) to locate each target's bucket, then one
    * bucket-partitioned row_number over the few hit buckets — at 32
    * shuffle partitions that is ~|targets|/32 of the data, and the
    * fraction SHRINKS as the cluster grows.
    *
    * `ranksOf` receives the exact total row count and returns labeled
    * target ranks (1-based) — letting callers derive ⌈p·n⌉-style ranks
    * without a separate count() scan. Output: one row per label, the
    * source columns plus `labelOut`. Same contracts as [[runningSum]]
    * (total order, non-null ascending numeric bucketKey); like it, this
    * is eager (stage + cuts + counts jobs run at call time). */
  def selectRanks(df: DataFrame, bucketKey: Column, orderCols: Seq[Column],
                  ranksOf: Long => Seq[(String, Long)],
                  labelOut: String, stable: Boolean = false): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    // `stable = true` promises df re-evaluates to the SAME ROW SET on
    // every job (a pure scan/project chain — no sampling, limits, or
    // shuffle-order dependence), letting the cuts/counts/final passes
    // re-scan the source instead of paying a checkpoint of every row.
    // All three passes are row-ORDER-insensitive, so set-stability is
    // the whole contract. RECOMMENDED default for inputs that are
    // already materialized or cheaply re-scannable — in particular
    // anything off `Tables.staged` (one-time per-session staged layout):
    // re-scanning its cached blocks beats paying a fresh per-call
    // checkpoint. The staging default remains for ad-hoc inputs whose
    // re-evaluation would re-pay an expensive upstream (the pre-r9
    // `Tables.apply` compaction repartition was exactly that case).
    val keyed = df.withColumn("__pskey", bucketKey.cast("double"))
    val staged = if (stable) keyed else keyed.localCheckpoint(false)
    val cuts = approxCuts(staged, n)
    val bucketed = staged.withColumn("__psbucket",
      bucketExpr(col("__pskey"), cuts))
    val counts = bucketed.groupBy("__psbucket").agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val total = counts.map(_._2).sum
    val targets = if (total == 0) Seq.empty else ranksOf(total)
    require(targets.forall { case (_, r) => r >= 1 && r <= total },
      s"target rank out of [1, $total]")
    // Exclusive offsets per bucket, then locate each target's bucket.
    var acc = 0L
    val offsets = counts.map { case (b, c) => val o = (b, acc, c); acc += c; o }
    val hits = targets.map { case (lbl, r) =>
      val (b, off, _) = offsets.find { case (_, off, c) => r > off && r <= off + c }.get
      (lbl, r, b, off)
    }
    if (hits.isEmpty)
      return bucketed.filter(lit(false))
        .withColumn(labelOut, lit(null).cast("string"))
        .drop("__psbucket", "__pskey")
    val hitBuckets = hits.map(_._3).distinct
    val offExpr = coalesce(
      element_at(typedLit(hits.map(h => h._3 -> h._4).toMap), col("__psbucket")), lit(0L))
    val wLocal = Window.partitionBy("__psbucket").orderBy(orderCols: _*)
    // One row per LABEL, not per physical row: distinct labels can land
    // on the same rank (tiny inputs, coincident ⌈p·n⌉ targets), so the
    // row's labels are gathered into an array and exploded — rows
    // matching no target explode to nothing.
    val labelArr = array(hits.map { case (lbl, r, _, _) =>
      when(col("__psrank") === r, lbl)
    }: _*)
    bucketed.filter(bucketRangeFilter(col("__pskey"), cuts, hitBuckets))
      .withColumn("__psrank", row_number().over(wLocal).cast("long") + offExpr)
      .withColumn(labelOut, explode(filter(labelArr, x => x.isNotNull)))
      .drop("__psbucket", "__pskey", "__psrank")
  }

  /** WEIGHTED distributed selection — the generalization of
    * [[selectRanks]] from row counts to a positive integer `weight`
    * column: for each labeled target mass t (1-based, derived from the
    * exact total weight via `targetsOf`), return the CROSSING row — the
    * first row in the total order whose inclusive cumulative weight
    * reaches t. With weight ≡ 1 this is exactly selectRanks; with
    * weight = token counts it answers "the document at the p-th
    * token-weighted percentile" — the batch-sizing / corpus-budget
    * quantile a training pipeline wants, since short and long documents
    * should not count equally. Same two driver-folded stats passes
    * (cuts, per-bucket weight sums), then one bucket-partitioned
    * running sum over only the hit buckets; the crossing test
    * `cum ≥ t ∧ cum − w < t` selects exactly one row per target.
    * Contracts as [[runningSum]], plus: `weight` non-null positive
    * longs (exact integer discipline). `preStaged = true` promises df
    * is already materialized (same contract as runningSum's knob) and
    * skips the staging checkpoint. */
  def selectWeighted(df: DataFrame, bucketKey: Column, orderCols: Seq[Column],
                     weight: Column, targetsOf: Long => Seq[(String, Long)],
                     labelOut: String, preStaged: Boolean = false): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val withCols = df.withColumn("__pskey", bucketKey.cast("double"))
      .withColumn("__psw", weight.cast("long"))
    val keyed = if (preStaged) withCols else withCols.localCheckpoint(false)
    val cuts = approxCuts(keyed, n)
    val bucketed = keyed.withColumn("__psbucket",
      bucketExpr(col("__pskey"), cuts))
    val sums = bucketed.groupBy("__psbucket").agg(sum(col("__psw")).as("__ws"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val total = sums.map(_._2).sum
    val targets = if (total == 0) Seq.empty else targetsOf(total)
    require(targets.forall { case (_, t) => t >= 1 && t <= total },
      s"target weight out of [1, $total]")
    var acc = 0L
    val offsets = sums.map { case (b, w) => val o = (b, acc, w); acc += w; o }
    val hits = targets.map { case (lbl, t) =>
      // A validated target can still miss every [off, off+w] span if a
      // NEGATIVE per-bucket weight broke offset monotonicity — name the
      // violated contract instead of a bare NoSuchElementException.
      val (b, off, _) = offsets.find { case (_, off, w) => t > off && t <= off + w }
        .getOrElse(throw new IllegalArgumentException(
          s"selectWeighted: target '$lbl' ($t of $total) falls in no bucket " +
            "span — the positive-weight contract is violated (a per-bucket " +
            "weight sum is negative): " +
            offsets.map { case (b, o, w) => s"b$b[off=$o,w=$w]" }.mkString(", ")))
      (lbl, t, b, off)
    }
    if (hits.isEmpty)
      return bucketed.filter(lit(false))
        .withColumn(labelOut, lit(null).cast("string"))
        .drop("__psbucket", "__pskey", "__psw")
    val hitBuckets = hits.map(_._3).distinct
    val offExpr = coalesce(
      element_at(typedLit(hits.map(h => h._3 -> h._4).toMap), col("__psbucket")), lit(0L))
    val wLocal = Window.partitionBy("__psbucket").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val labelArr = array(hits.map { case (lbl, t, _, _) =>
      when(col("__pscum") >= t && col("__pscum") - col("__psw") < t, lbl)
    }: _*)
    bucketed.filter(bucketRangeFilter(col("__pskey"), cuts, hitBuckets))
      .withColumn("__pscum", sum(col("__psw")).over(wLocal) + offExpr)
      .withColumn(labelOut, explode(filter(labelArr, x => x.isNotNull)))
      .drop("__psbucket", "__pskey", "__psw", "__pscum")
  }
}
