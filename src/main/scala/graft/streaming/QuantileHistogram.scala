package graft.streaming

/** Bounded LOG-SCALE histogram for streaming quantiles — the state a
  * `flatMapGroupsWithState` query carries to answer "running p25/p50/
  * p75 of everything seen so far" with a deterministic guarantee and
  * WITHOUT per-value state (an exact streaming quantile would hold
  * every distinct value; GK/t-digest sketches are arrival-order
  * sensitive, which breaks cross-engine hash comparison).
  *
  * HdrHistogram-style bucketing over positive longs: values below
  * 2^SubBits are their own bucket (exact); above, each power-of-two
  * octave splits into 2^SubBits equal sub-buckets, so the bucket width
  * is ≤ value / 2^SubBits — a fixed RELATIVE-error bound (12.5% at
  * SubBits = 3) with at most 2^SubBits × 64 buckets of state total, no
  * matter how many values or how wide their range. Counts are
  * ORDER-INDEPENDENT (pure per-bucket tallies), so the emitted answer
  * is identical however micro-batches interleave — the property that
  * lets the DuckDB twin state the answer exactly: the first bucket
  * whose cumulative count reaches the target rank IS the bucket of the
  * exact discrete percentile, so stream output and
  * `percentile_disc`-derived bucket bounds must hash-match.
  *
  * At 100 TB: per-group state is O(512) longs; merging two histograms
  * is bucket-wise addition (associative, commutative), so the same
  * structure serves map-side partial aggregation.
  */
object QuantileHistogram {

  /** Sub-bucket resolution: 2^SubBits sub-buckets per octave. */
  val SubBits: Int = 3

  /** Inclusive lower bound of v's bucket (v > 0). */
  def bucketLo(v: Long): Long =
    if (v < (1L << SubBits)) v
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val step = 1L << (e - SubBits)
      (v / step) * step
    }

  /** Inclusive upper bound of v's bucket (v > 0). */
  def bucketHi(v: Long): Long =
    if (v < (1L << SubBits)) v
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val step = 1L << (e - SubBits)
      (v / step) * step + step - 1
    }

  /** Fold one value into the per-bucket tally. */
  def add(state: Map[Long, Long], v: Long): Map[Long, Long] = {
    require(v > 0, s"QuantileHistogram is defined over positive values, got $v")
    val lo = bucketLo(v)
    state.updated(lo, state.getOrElse(lo, 0L) + 1L)
  }

  /** The labeled quantile answers for the tallies: for each (label,
    * targetRank) from `targetsOf(n)`, the first bucket (ascending) whose
    * cumulative count reaches the rank — (label, bucketLo, bucketHi, n).
    * This bucket contains the exact rank-targetRank value by
    * construction (buckets are disjoint ascending ranges). */
  def quantiles(state: Map[Long, Long],
                targetsOf: Long => Seq[(String, Long)]): Seq[(String, Long, Long, Long)] = {
    val n = state.valuesIterator.sum
    if (n == 0) return Seq.empty
    val sorted = state.toSeq.sortBy(_._1)
    targetsOf(n).map { case (label, r) =>
      require(r >= 1 && r <= n, s"target rank $r out of [1, $n]")
      var cum = 0L
      val lo = sorted.iterator.map { case (b, c) => cum += c; (b, cum) }
        .collectFirst { case (b, c) if c >= r => b }.get
      // every value in a bucket shares both bounds, and a bucket's lo is
      // its own smallest member — bucketHi(lo) IS the bucket's hi
      (label, lo, bucketHi(lo), n)
    }
  }
}
