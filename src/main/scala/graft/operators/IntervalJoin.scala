package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join as a shuffle equi-join.
  *
  * Spark has no native interval join: the direct spelling
  * `a.join(b, a.s <= b.e && b.s <= a.e)` has no equality conjunct, so
  * Catalyst plans a broadcast-nested-loop / cartesian pass — O(|a|·|b|)
  * comparisons, hopeless at scale. The standard fix (DuckDB's IEJoin,
  * genomics bin joins, Flink's interval join) is to discretize time
  * into fixed-width buckets:
  *
  *   1. replicate every interval to each bucket it touches
  *      (`explode(sequence(s DIV w, e DIV w))` — replication factor
  *      `len/w + 1`, ≤ 2 when `w` ≥ the longest interval);
  *   2. hash-join on the bucket id (a plain shuffle equi-join Catalyst
  *      and AQE already know how to plan, skew-split, and reorder);
  *   3. keep a candidate pair only in its ANCHOR bucket — the bucket
  *      containing `greatest(a.s, b.s)` — so a pair meeting in several
  *      shared buckets is emitted exactly once, with no downstream
  *      `distinct` shuffle;
  *   4. apply the exact overlap predicate `a.s <= b.e && b.s <= a.e`
  *      (closed intervals) as a post-join filter.
  *
  * `width` only tunes cost, never correctness: any positive width
  * yields the same rows. Pick it near the longest common interval
  * length — smaller widths cut false candidates per bucket, larger
  * widths cut replication. Omitting it (width = 0) derives the width
  * from the data as `max(e - s)` over both sides — one bounded
  * single-row agg per side — which pins the replication factor at ≤ 2
  * and keeps the bound self-maintaining as data changes (a hand-picked
  * constant silently under-sizes when intervals grow, and every bucket
  * then pays the replication overshoot). At 100 TB both sides shuffle once on the
  * bucket id and every bucket is an independent join task; a hot
  * bucket (everyone online at the same hour) is exactly the skew shape
  * AQE's skew-join split handles, since the join IS a plain equi-join.
  *
  * Contract: start/end columns are non-negative longs with
  * `start <= end` (DIV truncates toward zero, so negative epochs would
  * mis-bucket); the two frames' column names must be disjoint (alias
  * before calling for self-joins); `extra` is any additional join
  * predicate over the combined columns (e.g. a cross-entity guard).
  */
object IntervalJoin {

  def overlap(a: DataFrame, aStart: String, aEnd: String,
              b: DataFrame, bStart: String, bEnd: String,
              width: Long = 0L, extra: Column = lit(true)): DataFrame = {
    require(width >= 0, s"bucket width must be non-negative, got $width")
    val w = if (width > 0) width
            else derivedWidth(a, aStart, aEnd, b, bStart, bEnd)
    overlapWith(a, aStart, aEnd, b, bStart, bEnd, w, extra)
  }

  /** The longest interval on either side (one single-row agg each) —
    * the width that caps replication at 2 rows per interval. Empty or
    * all-null sides contribute 1. Runs Spark jobs at call time: callers
    * in analysis-only contexts should pass an explicit width. */
  def derivedWidth(a: DataFrame, aStart: String, aEnd: String,
                   b: DataFrame, bStart: String, bEnd: String): Long = {
    def longest(df: DataFrame, s0: String, e0: String): Long =
      Option(df.agg(max(col(e0) - col(s0))).head().get(0))
        .fold(1L)(v => math.max(1L, v.asInstanceOf[Number].longValue()))
    math.max(longest(a, aStart, aEnd), longest(b, bStart, bEnd))
  }

  private def overlapWith(a: DataFrame, aStart: String, aEnd: String,
              b: DataFrame, bStart: String, bEnd: String,
              width: Long, extra: Column): DataFrame = {
    val ab = a.withColumn("__bkt_a",
      explode(sequence(expr(s"$aStart DIV ${width}L"), expr(s"$aEnd DIV ${width}L"))))
    val bb = b.withColumn("__bkt_b",
      explode(sequence(expr(s"$bStart DIV ${width}L"), expr(s"$bEnd DIV ${width}L"))))
    ab.join(bb,
        col("__bkt_a") === col("__bkt_b") &&
          col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd) &&
          expr(s"greatest($aStart, $bStart) DIV ${width}L") === col("__bkt_a") &&
          extra)
      .drop("__bkt_a", "__bkt_b")
  }
}
