package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed suffix-array construction by prefix doubling (Manber &
  * Myers, SIAM J. Computing 22(5), 1993) over a tokenized document
  * corpus — the machinery behind EXACT substring-level deduplication of
  * training corpora (Lee et al., "Deduplicating Training Data Makes
  * Language Models Better", ACL 2022, which builds a suffix array over
  * the whole corpus to find verbatim repeated spans).
  *
  * Shape: each suffix (doc_id, pos) starts ranked by its first 2^base
  * tokens; round k combines each position's level-(k-1) rank with the
  * rank at pos + 2^(k-1) and re-ranks the pairs, so after round k two
  * suffixes share a rank iff their first 2^k tokens are IDENTICAL —
  * exact equality, not a hash: windowed-fingerprint dedup
  * (q_substr_dedup) pays O(n·L) hashing work for one fixed window
  * length L and carries a collision probability, while ⌈log2 L⌉
  * doubling rounds give every power-of-two window length at once,
  * collision-free, in O(n log L) total work.
  *
  * Scale design, per round (there are only ⌈log2 L⌉ rounds — 7 for
  * L = 100-token documents, 30 for gigabyte ones):
  *   - the successor rank is `lead(rank, 2^(k-1))` over a window
  *     partitioned BY DOCUMENT — bounded by document length, the unit
  *     this operator tokenizes; a corpus modeled as one unbounded
  *     sequence should be chunked into documents first;
  *   - pair re-ranking goes through [[PrefixSum.rank]] (range-bucketed
  *     two-pass ranking): only bucket-partitioned windows, never a
  *     global sort. Ranks are MASS-UNIFORM over [1, n] by construction
  *     (see [[levelRanks]]), so the combined key r1·B + r2 uses the
  *     driver-known uniform `keyRange` grid — one data pass per round,
  *     no per-round percentile job. Double rounding keeps the key
  *     monotone NON-STRICTLY at any corpus size (rounding a monotone
  *     sequence preserves ≤), so past ~9·10^7 positions the grid
  *     merely coarsens — balance degrades, correctness does not,
  *     because exact order always comes from the orderCols. MEASURED
  *     at 1.05·10^8 positions (key range 1.22 × 2^53,
  *     tools/SaBoundaryTier, BENCHLOG round-12): 2.9% of exact pairs
  *     collapse onto shared doubles, bucket balance max/mean 1.00
  *     (collapse granularity ~2 vs ~3·10^14-wide buckets), zero
  *     windows lose their duplicate groups. Balance only starts to
  *     move when the collapse width nears the bucket width
  *     n²/#buckets — key ranges past ~2^57 — where the fix is more
  *     buckets or a two-level grid, not a different key;
  *   - equal pairs collapse to one rank via `min(ord)` over a window
  *     partitioned by (range-bucket, pair) — equal pairs share a
  *     bucket, so this FUSES onto the rank pass's distribution
  *     (partition-local sort, no shuffle). Its width is the
  *     multiplicity of the most-repeated 2^k-gram; a corpus that is
  *     one document duplicated millions of times would skew it — such
  *     corpora should exact-dedup whole documents first
  *     (Dedup.keepFirst), the standard pipeline order.
  *
  * Each round stages the full position set once (PrefixSum's internal
  * round-boundary materialization — the same rhythm as any iterative
  * distributed SA construction); rounds stop at the span length the
  * caller cares about, not at document length, when only
  * bounded-length repeats matter.
  *
  * Eager: the base-vocabulary ranking and each doubling round run
  * bounded driver-fold jobs at call time.
  */
object SuffixArray {

  /** Explodes (doc_id, toks) into one row per suffix:
    * (doc_id, pos 0-based, tok, dlen). */
  def positions(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("toks"), size(col("toks")).as("dlen"))
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")),
        col("dlen"))

  /** Monotone numeric proxy of a [a-z0-9 ]-string's lexicographic order
    * (first 4 bytes, big-endian) — ONLY balances PrefixSum's range
    * buckets; exact order always comes from the string itself. */
  private def strKey(c: Column): Column =
    (ascii(substring(c, 1, 1)) * 16777216.0 +
      ascii(substring(c, 2, 1)) * 65536.0 +
      ascii(substring(c, 3, 1)) * 256.0 +
      ascii(substring(c, 4, 1))).cast("double")

  /** Prefix-doubling rank frames, one per level k in
    * [baseLevel, levels]: (level, frame of doc_id | pos | dlen | rank)
    * where rank is order-isomorphic to the lexicographic order of the
    * suffix's first 2^k tokens (end-of-document compares BELOW every
    * token, so a proper prefix sorts first — the `$`-sentinel
    * convention). Two positions with ≥ 2^k real tokens remaining share
    * a level-k rank iff their 2^k-token windows are equal. Frames stay
    * CONSTANT-WIDTH — each is rooted at its own round's staged result,
    * so consumers of several levels (repeated-span profiles) read each
    * round once instead of carrying every level through every round.
    *
    * `baseLevel` jumps the start: base ranks come from ranking the
    * space-JOINED first-2^base-token strings directly (one pass)
    * rather than `base` doubling rounds — callers that only need the
    * final order save rounds. A separator below the [a-z0-9] alphabet
    * makes string order equal tokenwise order with the same
    * shorter-prefix-first sentinel, so the jump is order-exact.
    *
    * Ranks are MASS-UNIFORM, not dense: each base window string is
    * ranked at the cumulative frequency of its predecessors + 1 — the
    * ord of its first occurrence in the sorted position list. A gram
    * with m occurrences then owns a rank-space interval of width m, so
    * positions are uniform over [1, n] by construction — exactly what
    * the doubling rounds' uniform keyRange grid needs (dense vocab
    * ranks would pile the whole corpus into the grid's first bucket).
    * Doubling preserves the property: min-of-ord pair ranks are again
    * first-occurrence ords. The base ranking runs on the SMALL
    * aggregated vocabulary, never a per-position window over
    * Zipf-heavy tokens. */
  def levelRanks(docs: DataFrame, levels: Int,
                 baseLevel: Int = 0): Vector[(Int, DataFrame)] =
    build(docs, levels, baseLevel)._1

  private def build(docs: DataFrame, levels: Int,
                    baseLevel: Int): (Vector[(Int, DataFrame)], Long, Double) = {
    require(levels >= 0 && levels <= 30, s"levels out of range: $levels")
    require(baseLevel >= 0 && baseLevel <= levels,
      s"baseLevel out of range: $baseLevel")
    val pos = positions(docs)
    val based = (if (baseLevel == 0) pos.withColumn("__w", col("tok"))
      else docs.select(col("doc_id"), col("toks"), size(col("toks")).as("dlen"))
        .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")),
          col("dlen"), col("toks"))
        .withColumn("__w",
          concat_ws(" ", slice(col("toks"), col("pos") + 1, lit(1 << baseLevel)))))
      .select("__w", "doc_id", "pos", "dlen") // toks dropped pre-shuffle
    val vocab = based.groupBy("__w").agg(count(lit(1L)).as("__freq"))
    val (vrRaw, n) = PrefixSum.runningSumWithTotal(vocab, strKey(col("__w")),
      Seq(col("__w")), col("__freq"), "rank")
    val vr = vrRaw.withColumn("rank", col("rank") + lit(1L))
      .select(col("__w"), col("rank"))
    // Round boundaries stage the round OUTPUT (lazy localCheckpoint):
    // each round's windows then execute exactly once — the next round's
    // lead and any per-level consumer both read the materialized rows.
    // PrefixSum runs preStaged: its two passes re-derive only the cheap
    // lead off the previous round's checkpoint instead of paying a
    // second full staging per round.
    var cur = based.join(vr, Seq("__w"))
      .select(col("doc_id"), col("pos"), col("dlen"), col("rank"))
      .localCheckpoint(false)
    // B > any rank + 2 makes r1·B + r2 order-aligned with (r1, r2);
    // ranks are bounded by the position count n = Σ freq, read for free
    // from the vocabulary ranking's own totals fold.
    val b = n.toDouble + 3.0
    val out = Vector.newBuilder[(Int, DataFrame)]
    out += baseLevel -> cur
    for (k <- baseLevel + 1 to levels) {
      val step = 1 << (k - 1)
      val wDoc = Window.partitionBy("doc_id").orderBy("pos")
      val paired = cur.withColumn("__r2",
        coalesce(lead(col("rank"), step).over(wDoc), lit(-1L)))
      val ord = PrefixSum.rank(paired,
        col("rank") * b + col("__r2"),
        Seq(col("rank"), col("__r2"), col("doc_id"), col("pos")), "__ord",
        preStaged = true,
        keyRange = Some((b - 2.0, n * b + n + 2.0)),
        keepBucket = Some("__b"))
      cur = ord.withColumn("__rank2",
          min(col("__ord")).over(
            Window.partitionBy(col("__b"), col("rank"), col("__r2"))))
        .select(col("doc_id"), col("pos"), col("dlen"),
          col("__rank2").as("rank"))
        .localCheckpoint(false)
      out += k -> cur
    }
    (out.result(), n, b)
  }

  /** The final-level frame only — the suffix array's rank column for
    * the longest span the caller asked for. */
  def ranks(docs: DataFrame, levels: Int, baseLevel: Int = 0): DataFrame =
    levelRanks(docs, levels, baseLevel).last._2

  /** The suffix array itself: (doc_id, pos, dlen, sa_rank) with
    * sa_rank a 1..n permutation — lexicographic suffix order,
    * ties between identical full suffixes broken by (doc_id, pos).
    * `levels` must cover the longest document (2^levels ≥ maxlen).
    *
    * No ranking happens AFTER the last doubling round: that round's
    * internal pair row-number is already ordered by (level-(L-1) rank,
    * successor rank, doc_id, pos) = the full suffix order with the
    * tiebreak, so the final round IS the suffix array — collapsing the
    * pair ties to a level rank and re-ranking them with a tiebreak
    * would only undo and redo the same work. */
  def suffixOrder(docs: DataFrame, levels: Int, baseLevel: Int = 0): DataFrame = {
    require(levels > baseLevel,
      s"suffixOrder needs ≥ 1 doubling round (levels $levels, base $baseLevel)")
    val (lv, n, b) = build(docs, levels - 1, baseLevel)
    val cur = lv.last._2
    val step = 1 << (levels - 1)
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    val paired = cur.withColumn("__r2",
      coalesce(lead(col("rank"), step).over(wDoc), lit(-1L)))
    PrefixSum.rank(paired,
        col("rank") * b + col("__r2"),
        Seq(col("rank"), col("__r2"), col("doc_id"), col("pos")), "sa_rank",
        preStaged = true,
        keyRange = Some((b - 2.0, n * b + n + 2.0)))
      .select(col("doc_id"), col("pos"), col("dlen"), col("sa_rank"))
  }
}
