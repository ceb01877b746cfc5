package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting: two-phase aggregation for hot keys.
  *
  * A plain `groupBy(k)` sends every row of a hot key to one reducer; at
  * 100 TB a single celebrity key stalls the stage. Salting splits each
  * key into `buckets` sub-keys for the first (heavy) aggregation, so the
  * hot key's rows spread across `buckets` reducers; the second phase
  * combines the per-salt partials — its input is only
  * `buckets × distinct-keys` rows, trivially cheap.
  *
  * Works for any algebraic aggregate (sum/count here). AQE's skew
  * handling covers joins; salting is the aggregation-side tool, and
  * explicit salting also works when AQE is off or stats mislead it.
  * Results are identical to the unsalted plan (oracle-verified) as long
  * as the partials use exact (integer) accumulation.
  */
object Salted {

  /** Salted sum/count: returns (keys…, sums…, count) exactly as the
    * unsalted `groupBy(keys).agg(...)` would.
    *
    * @param sums (outputName → input column) summed; use exact integer
    *             inputs for cross-engine determinism
    */
  def sumCount(df: DataFrame, keys: Seq[String], sums: Seq[(String, Column)],
               countName: String = "n", buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", salt(df, buckets))
    val pAggs = sums.map { case (n, c) => sum(c).as(s"__p_$n") } :+
      count(lit(1)).as("__p_cnt")
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(pAggs.head, pAggs.tail: _*)
    val fAggs = sums.map { case (n, _) => sum(col(s"__p_$n")).as(n) } :+
      sum(col("__p_cnt")).as(countName)
    partial
      .groupBy(keys.map(col): _*)
      .agg(fAggs.head, fAggs.tail: _*)
  }

  /** Deterministic salt: a content hash of every column, stable across
    * task re-execution. The earlier `spark_partition_id() +
    * monotonically_increasing_id()` form was the classic
    * nondeterministic-expression-before-shuffle hazard: on a fetch
    * failure or speculative re-run, a recomputed row could land in a
    * different salt bucket than the attempt some reducers already
    * fetched — duplicating or losing rows at exactly the scale this
    * operator targets. The content hash reproduces bucket assignment on
    * recomputation by construction. Trade-off: fully identical rows
    * share a bucket, so salting spreads a hot key only as far as its
    * rows are distinct — the normal case for fact rows, which carry a
    * high-cardinality column beyond the key. */
  private def salt(df: DataFrame, buckets: Int): Column =
    pmod(hash(df.columns.map(col).toSeq: _*), lit(buckets))

  /** Join types under which salting is semantics-preserving: each
    * big-side row keeps exactly one salt value, so inner/left joins and
    * semi/anti existence checks see the same matches as the unsalted
    * join. right/full outer are NOT safe — an unmatched small-side row
    * is replicated once per bucket and would surface `buckets` times. */
  private val SafeJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti")

  /** Salted equi-join — the join-side twin of `sumCount` for when AQE's
    * skew split can't kick in (disabled, or stats mislead it): the big
    * side gets a uniform salt, the small side is replicated once per
    * salt bucket, and the join key becomes (keys…, salt). A hot key's
    * rows thereby spread over `buckets` reducers instead of one. For
    * the permitted join types the result is identical to the unsalted
    * join (every big-side row still meets every matching small-side row
    * exactly once); right/full outer are rejected — see `SafeJoinTypes`.
    * Cost: the small side shuffles ×`buckets` — only pay it when the
    * small side is genuinely small and the big side genuinely skewed. */
  def join(big: DataFrame, small: DataFrame, keys: Seq[String],
           buckets: Int = 16, joinType: String = "inner"): DataFrame = {
    require(SafeJoinTypes.contains(joinType.toLowerCase.replace(" ", "_")),
      s"salted join preserves semantics only for $SafeJoinTypes, got: $joinType")
    val bigS = big.withColumn("__salt", salt(big, buckets))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    bigS.join(smallS, keys :+ "__salt", joinType).drop("__salt")
  }
}
