package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns.{normalizeText, tokens}

/** Fifth LLM-pipeline batch: cross-document substring-level dedup.
  */
object LlmQueries5 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** Substring-level cross-document dedup — the rolling-window
    * restatement of ExactSubstr (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"): suffix arrays find
    * repeated substrings exactly but don't distribute; fixed-width
    * 8-token rolling windows (shingles) find the same cross-document
    * repetition with an embarrassingly parallel plan. Distinct from
    * q_dup_ngram_ratio (WITHIN-doc repetition) and q_line_dedup
    * (line-granularity boilerplate): this catches verbatim passages
    * copied ACROSS documents at arbitrary offsets.
    *
    * Positives are planted (house pattern — the corpus carries none):
    * every 10th doc gets a partial copy (its first 12 normalized
    * tokens) appended as a new doc, so 5 windows per planted pair are
    * genuinely shared and every count below is load-bearing.
    *
    * Scale shape: window keys are md5 digests (fixed 32-byte shuffle
    * keys, not unbounded 8-token strings); "appears in ≥2 docs" is
    * `min(doc_id) <> max(doc_id)` — one map-side-combinable agg, no
    * count-distinct expansion; the dup-key set joins back by digest
    * equi-join. Explode fan-out ≈ tokens per doc, the same bound as
    * q_line_dedup. No sort, no window function, no driver loop. */
  def substrDedup(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"),
        tokens(normalizeText(col("text"))).as("toks"))
    val planted = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 10000).as("doc_id"),
        slice(col("toks"), 1, 12).as("toks"))
    val wins = base.union(planted)
      .filter(size(col("toks")) >= 8)
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), size(col("toks")) - 8),
          i => md5(array_join(slice(col("toks"), i + 1, lit(8)), " ")))).as("wkey"))
    val dup = wins.groupBy("wkey")
      .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select(col("wkey"), lit(1L).as("dup"))
    wins.join(dup, Seq("wkey"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_win"),
        sum(coalesce(col("dup"), lit(0L))).as("n_dup"))
      .select(col("doc_id"), col("n_win"), col("n_dup"),
        expr("n_dup * 10000 DIV n_win").as("dup_bp"))
      .withColumn("keep", col("dup_bp") < 5000)
      .orderBy("doc_id")
  }

  val substrDedupSql: String = """
WITH base AS (
  SELECT doc_id,
         CASE WHEN length(s) > 0 THEN string_split(s, ' ') ELSE [] END AS toks
  FROM (SELECT doc_id,
               trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s
        FROM documents)),
corpus AS (
  SELECT doc_id, toks FROM base
  UNION ALL
  SELECT doc_id + 10000 AS doc_id, toks[1:12] AS toks
  FROM base WHERE doc_id % 10 = 0),
wins AS (
  SELECT doc_id, md5(array_to_string(toks[g.i:g.i+7], ' ')) AS wkey
  FROM corpus, unnest(range(1, len(toks) - 6)) g(i)
  WHERE len(toks) >= 8),
dup AS (
  SELECT wkey FROM wins GROUP BY wkey
  HAVING min(doc_id) <> max(doc_id)),
per_doc AS (
  SELECT w.doc_id, COUNT(*) AS n_win, COUNT(d.wkey) AS n_dup
  FROM wins w LEFT JOIN dup d USING (wkey)
  GROUP BY w.doc_id)
SELECT doc_id, n_win, n_dup, n_dup * 10000 // n_win AS dup_bp,
       (n_dup * 10000 // n_win) < 5000 AS keep
FROM per_doc ORDER BY doc_id
"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_substr_dedup" -> (substrDedup _))

  val oracles: Map[String, String] = Map(
    "q_substr_dedup" -> substrDedupSql)
}
