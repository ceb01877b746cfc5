package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns.{bpeTokenCount, normalizeText}
import graft.operators.{MinHashDedup, PrefixSum}

/** Thirteenth LLM-pipeline batch: exact global order statistics without
  * a global sort (distributed selection, curriculum bucketing) and the
  * LSH index-quality audit a 100 TB dedup pipeline runs before trusting
  * its banding parameters.
  */
object LlmQueries13 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** EXACT global quantiles by distributed selection — the exact
    * companion to q_global_bins' sketch: `percentile_disc(p)` over the
    * whole fact table. The naive spelling (global `percentile` agg or
    * `ntile` window) funnels every row through ONE reducer; here
    * [[PrefixSum.rank]] assigns exact global ranks with only
    * bucket-partitioned windows (Blelloch two-pass), and the three
    * target ranks ⌈p·n⌉ are literal filters on that rank — a selection,
    * not a sort. n comes from one count action (a bounded driver
    * scalar, same discipline as the PrefixSum offsets fold). Exact
    * integer cents end-to-end; the quantile VALUE is tie-insensitive
    * even though rank assignment within a cents tie follows the
    * (cents, orderkey, linenumber) total order. */
  def exactQuantiles(s: SparkSession, dir: String): DataFrame = {
    // One 4-column staged artifact shared with weightedQuantiles (same
    // column set → same memo entry): narrow rows keep the re-scan passes
    // cheap (checkpoint blocks have no columnar pruning).
    val li = Tables.staged(s, dir, "lineitem",
        Seq("l_extendedprice", "l_quantity", "l_orderkey", "l_linenumber"))
      .select(round(col("l_extendedprice") * 100).cast("long").as("cents"),
        col("l_orderkey"), col("l_linenumber"))
    // ⌈p·n⌉ target ranks (PrefixSum.quartileRanks — the shared
    // spelling), derived from the exact total the selection's own
    // per-bucket counts already carry — no separate count() scan, and
    // only the (≤3) hit buckets are ever window-scanned.
    val targets = PrefixSum.quartileRanks _
    // `stable = true` re-scan IS the fast path now that the input rides
    // the one-time per-session staged layout (Tables.staged): each of
    // the cuts/counts/final passes reads cached blocks, and no per-call
    // checkpoint is paid. (Pre-r9, re-scan re-paid Tables' compaction
    // repartition every pass and measured 6× slower — that shuffle now
    // happens once, at staging.)
    PrefixSum.selectRanks(li, col("cents"),
        Seq(col("cents"), col("l_orderkey"), col("l_linenumber")), targets, "q",
        stable = true)
      .select(col("q"), (col("cents").cast("double") / 100.0).as("value"))
      .orderBy("q")
  }

  val exactQuantilesSql: String = """
WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem)
SELECT q, value FROM (
  SELECT 'p25' AS q, CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY cents) AS DOUBLE) / 100.0 AS value FROM c
  UNION ALL
  SELECT 'p50' AS q, CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY cents) AS DOUBLE) / 100.0 AS value FROM c
  UNION ALL
  SELECT 'p75' AS q, CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY cents) AS DOUBLE) / 100.0 AS value FROM c) x
WHERE value IS NOT NULL
ORDER BY q
"""

  /** WEIGHTED exact quantiles — [[exactQuantiles]] generalized from row
    * counts to a mass column ([[PrefixSum.selectWeighted]]): the value
    * at the p-th QUANTITY-weighted percentile of price, i.e. each row
    * counts l_quantity units. The LLM-pipeline reading: with weight =
    * token count this is "the document length at the p-th token-weighted
    * percentile" — the batch-sizing quantile where long documents count
    * proportionally. Crossing-row semantics (first row in the total
    * order whose inclusive cumulative weight reaches ⌈p·W⌉), exact
    * integer weights end-to-end, and only the hit buckets are ever
    * window-scanned. */
  def weightedQuantiles(s: SparkSession, dir: String): DataFrame = {
    // Staged-layout input + preStaged: all three selection passes
    // re-scan the session's cached lineitem blocks (see exactQuantiles).
    val li = Tables.staged(s, dir, "lineitem",
        Seq("l_extendedprice", "l_quantity", "l_orderkey", "l_linenumber"))
      .select(round(col("l_extendedprice") * 100).cast("long").as("cents"),
        col("l_quantity").cast("long").as("w"),
        col("l_orderkey"), col("l_linenumber"))
    val targets = PrefixSum.quartileRanks _ // targets in token MASS, not rows
    PrefixSum.selectWeighted(li, col("cents"),
        Seq(col("cents"), col("l_orderkey"), col("l_linenumber")), col("w"),
        targets, "q", preStaged = true)
      .select(col("q"), (col("cents").cast("double") / 100.0).as("value"))
      .orderBy("q")
  }

  val weightedQuantilesSql: String = """
WITH c AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(l_quantity AS BIGINT) AS w, l_orderkey, l_linenumber
  FROM lineitem),
cw AS (
  SELECT cents, w,
         SUM(w) OVER (ORDER BY cents, l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM c),
tot AS (SELECT SUM(w) AS tw FROM c)
SELECT q, CAST(v AS DOUBLE) / 100.0 AS value FROM (
  SELECT 'p25' AS q, min(cents) AS v FROM cw, tot WHERE cum >= (tw + 3) // 4
  UNION ALL
  SELECT 'p50' AS q, min(cents) AS v FROM cw, tot WHERE cum >= (tw + 1) // 2
  UNION ALL
  SELECT 'p75' AS q, min(cents) AS v FROM cw, tot WHERE cum >= (3 * tw + 3) // 4) x
WHERE v IS NOT NULL
ORDER BY q
"""

  /** Curriculum bucketing — the training-order op (easy→hard document
    * scheduling): EXACT `ntile(4)` of the whole corpus by difficulty
    * (BPE-ish token count) without the single-partition ntile window.
    * [[PrefixSum.rank]] gives the exact global rank under the total
    * order (n_tok, doc_id); the NTILE bucket is then pure literal
    * arithmetic in n (first n mod k buckets take ⌈n/k⌉ rows — the SQL
    * standard's definition), so the bucket boundary rows are
    * bit-identical to the oracle's window. Per-bucket stats are one
    * grouped aggregate over k=4 groups. */
  def curriculum(s: SparkSession, dir: String): DataFrame = {
    // Staged-layout input + preStaged (see exactQuantiles); NTILE's n
    // comes out of the rank pass's own per-bucket totals fold
    // (rankWithCount) instead of a separate count() scan — one fewer
    // job per invocation, identical n by construction.
    val docs = Tables.staged(s, dir, "documents", Seq("doc_id", "text"))
      .select(col("doc_id"), bpeTokenCount(col("text")).cast("long").as("n_tok"))
    val (rk, n) = PrefixSum.rankWithCount(docs, col("n_tok"),
      Seq(col("n_tok"), col("doc_id")), "rk", preStaged = true)
    rk.withColumn("bucket", PrefixSum.ntileExpr(col("rk"), n, 4).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_tok")).as("min_tok"),
        max(col("n_tok")).as("max_tok"),
        sum(col("n_tok")).as("sum_tok"))
      .orderBy("bucket")
  }

  val curriculumSql: String = """
WITH base AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tok
  FROM documents),
nt AS (
  SELECT doc_id, n_tok,
         CAST(ntile(4) OVER (ORDER BY n_tok, doc_id) AS BIGINT) AS bucket
  FROM base)
SELECT bucket, COUNT(*) AS n_docs, MIN(n_tok) AS min_tok, MAX(n_tok) AS max_tok,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tok
FROM nt GROUP BY bucket ORDER BY bucket
"""

  /** LSH index-quality audit — measure the banding before trusting it:
    * for every candidate pair the banded join surfaces, compare the
    * MinHash-ESTIMATED similarity (# agreeing signature slots of 16)
    * against the EXACT shingle Jaccard, grouped by agreement count.
    * This is the s-curve calibration a 100 TB dedup pipeline runs on a
    * sample whenever bands/rows change: precision per estimate band
    * tells you where the verify threshold can safely sit. Reuses the
    * production pipeline verbatim ([[MinHashDedup.signatures]] →
    * [[MinHashDedup.candidatePairs]] → exact-Jaccard verify), so the
    * audit measures the index that actually runs, not a replica. */
  def lshPrecision(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val norm = normalizeText(col("text"))
    // The signature frame feeds the candidate self-join AND both sides
    // of the estimate join — eager localCheckpoint (1 row/doc) so the
    // shingle/md5 pipeline runs exactly once. Staged PACKED (one
    // array<bigint> column, r15): the estimate join ships one array per
    // side and compares with a codegen'd agreement loop instead of
    // shipping 16 separate BIGINT columns per side through both joins
    // and evaluating a 16-term chained CASE WHEN per pair — the per-pair
    // EST join dominated this query's 100× tier. Banding unpacks slots
    // by local getItem projection off the same checkpoint.
    val sigA = MinHashDedup.signaturesArr(docs, "doc_id", norm).localCheckpoint(true)
    val sig = MinHashDedup.unpackSignature(sigA, "doc_id")
    val pairs = MinHashDedup.candidatePairs(sig, "doc_id").localCheckpoint(true)
    // Estimate and exact verify in ONE scored pass (r15). The split
    // spelling ran FIVE pair-scale joins — two shipping signatures
    // (est), two shipping shingle arrays (exact), plus the per-pair
    // est⋈exact join-back — where both statistics are per-(doc_a,doc_b)
    // functions of per-doc payloads. One payload frame per candidate
    // doc (packed signature + shingle array, semi-join pruned, built
    // once behind an eager checkpoint: Catalyst does not share subplans
    // across self-joins) feeds TWO pair joins that compute n_match and
    // jaccard side by side; the join-back disappears.
    val ids = pairs.select(col("id_a").as("doc_id"))
      .union(pairs.select(col("id_b").as("doc_id"))).distinct()
    val payload = docs.join(ids, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), MinHashDedup.shingles(norm).as("__sh"))
      .join(sigA, "doc_id")
      .localCheckpoint(true)
    val scored = pairs
      .join(payload.toDF("id_a", "sh_a", "sig_a"), "id_a")
      .join(payload.toDF("id_b", "sh_b", "sig_b"), "id_b")
      .select(
        MinHashDedup.signatureAgreement(col("sig_a"), col("sig_b"))
          .cast("long").as("n_match"),
        MinHashDedup.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
    scored
      .groupBy("n_match")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("jaccard") >= 0.7, 1L).otherwise(0L)).as("n_dup"))
      .orderBy("n_match")
  }

  /** Twin derived from [[LlmQueries.minhashNearDupSql]] by text surgery
    * (the q_lsh_index discipline): the shared CTE chain — norm →
    * shingles → signatures → banding → candidates → exact jaccard —
    * is taken verbatim, so index and audit can never drift apart; only
    * the final projection differs (per-band agreement counts instead of
    * the thresholded pair list). */
  val lshPrecisionSql: String = {
    val base = LlmQueries.minhashNearDupSql
    val cut = base.lastIndexOf("SELECT id_a, id_b, jaccard")
    require(cut > 0, "minhashNearDupSql shape changed")
    val matches = (0 until 16)
      .map(j => s"CASE WHEN a.mh$j = b.mh$j THEN 1 ELSE 0 END")
      .mkString("\n           + ")
    base.substring(0, cut) + s""",
m AS (
  SELECT id_a, id_b,
         CAST($matches AS BIGINT) AS n_match
  FROM cand JOIN sig a ON cand.id_a = a.doc_id JOIN sig b ON cand.id_b = b.doc_id)
SELECT m.n_match, COUNT(*) AS n_pairs,
       CAST(SUM(CASE WHEN j.jaccard >= 0.7 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
FROM m JOIN j ON m.id_a = j.id_a AND m.id_b = j.id_b
GROUP BY m.n_match ORDER BY m.n_match
"""
  }

  // ------------------------------------------------------- registry

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_curriculum" -> (curriculum _),
    "q_exact_quantiles" -> (exactQuantiles _),
    "q_lsh_precision" -> (lshPrecision _),
    "q_weighted_quantiles" -> (weightedQuantiles _))

  def oracles: Map[String, String] = Map(
    "q_curriculum" -> curriculumSql,
    "q_exact_quantiles" -> exactQuantilesSql,
    "q_lsh_precision" -> lshPrecisionSql,
    "q_weighted_quantiles" -> weightedQuantilesSql)
}
