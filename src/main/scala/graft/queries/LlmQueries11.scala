package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns.{normalizeText, tokens}

/** Eleventh LLM-data batch — evaluation and pretraining-objective
  * plumbing: ROUGE-1/2 recall between paired documents (the summary-
  * eval metric, Lin 2004, as exact clipped-count arithmetic) and
  * T5-style span-corruption masking statistics (Raffel 2020 §3.1.4 —
  * deterministic md5 span selection, the repo's seed-free twin of the
  * random 15% mask).
  */
object LlmQueries11 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** Positional token stream, optionally id-bounded. */
  private def tok(s: SparkSession, dir: String, bound: Long): DataFrame = {
    val d = t(s, dir, "documents")
    val b = if (bound > 0) d.filter(col("doc_id") < bound) else d
    b.filter(length(normalizeText(col("text"))) > 0)
      .select(col("doc_id"),
        posexplode(tokens(normalizeText(col("text")))).as(Seq("pos", "w")))
  }

  // ------------------------------------------------------ ROUGE

  /** ROUGE-1 and ROUGE-2 recall over planted (even, odd) doc pairs —
    * doc 2k is the reference, 2k+1 the candidate. Overlap is the
    * CLIPPED multiset intersection Σ min(tf_ref, tf_cand) (the
    * original ROUGE counting rule), recall = overlap·1e6 DIV ref_total
    * — pure integers, no float anywhere. Bigrams come from the
    * positional equi-join on (doc, pos+1), the q_phrase_search
    * adjacency probe. Everything is term-keyed equi-joins; pair
    * inventory bounded at 50. */
  def rougePairs(s: SparkSession, dir: String): DataFrame = {
    val tk = tok(s, dir, 100).localCheckpoint(true) // unigram + both bigram sides
    val uni = tk.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val big = tk.as("a")
      .join(tk.as("b"),
        col("b.doc_id") === col("a.doc_id") && col("b.pos") === col("a.pos") + 1)
      .groupBy(col("a.doc_id").as("doc_id"),
        concat(col("a.w"), lit(" "), col("b.w")).as("w"))
      .agg(count(lit(1)).as("tf"))
    def recall(grams: DataFrame, out: String): DataFrame = {
      val r = grams.filter(col("doc_id") % 2 === 0)
      val c = grams.select((col("doc_id") - 1).as("cd"), col("w").as("cw"),
        col("tf").as("ctf"))
      r.join(c, col("cd") === col("doc_id") && col("cw") === col("w"), "left")
        .groupBy(expr("doc_id DIV 2").as("pair_id"))
        .agg(sum(least(col("tf"), coalesce(col("ctf"), lit(0L)))).as("ov"),
          sum(col("tf")).as("rt"))
        .select(col("pair_id"), expr(s"(ov * 1000000) DIV rt").as(out))
    }
    recall(uni, "rouge1_micro")
      .join(recall(big, "rouge2_micro"), "pair_id")
      .orderBy("pair_id").limit(30)
  }

  val rougePairsSql: String = """
WITH tok AS (
  SELECT doc_id, g.i - 1 AS pos, a[g.i] AS w
  FROM (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS a
        FROM documents
        WHERE doc_id < 100 AND length(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) > 0),
       unnest(range(1, len(a) + 1)) g(i)),
uni AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
big AS (
  SELECT a.doc_id, a.w || ' ' || b.w AS w, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 GROUP BY 1, 2),
r1 AS (
  SELECT r.doc_id // 2 AS pair_id,
         CAST(SUM(least(r.tf, COALESCE(c.tf, 0))) AS BIGINT) AS ov, CAST(SUM(r.tf) AS BIGINT) AS rt
  FROM uni r LEFT JOIN uni c ON c.doc_id = r.doc_id + 1 AND c.w = r.w
  WHERE r.doc_id % 2 = 0 GROUP BY 1),
r2 AS (
  SELECT r.doc_id // 2 AS pair_id,
         CAST(SUM(least(r.tf, COALESCE(c.tf, 0))) AS BIGINT) AS ov, CAST(SUM(r.tf) AS BIGINT) AS rt
  FROM big r LEFT JOIN big c ON c.doc_id = r.doc_id + 1 AND c.w = r.w
  WHERE r.doc_id % 2 = 0 GROUP BY 1)
SELECT r1.pair_id AS pair_id, (r1.ov * 1000000) // r1.rt AS rouge1_micro,
       (r2.ov * 1000000) // r2.rt AS rouge2_micro
FROM r1 JOIN r2 ON r2.pair_id = r1.pair_id ORDER BY pair_id LIMIT 30
"""

  // ------------------------------------------------ span corruption

  /** T5 span-corruption masking statistics: 3-token spans selected by
    * the deterministic md5 gate `substr(md5(doc:span),1,2) ≤ '25'`
    * (38/256 ≈ 14.8% — the house seed-free stand-in for the random
    * 15% mask). Per doc: token count, masked tokens, sentinel count
    * (= distinct masked spans, what the corrupted sequence length
    * depends on), mask ratio in micros. One scan, one aggregation. */
  def spanMask(s: SparkSession, dir: String): DataFrame = {
    tok(s, dir, 0L)
      .select(col("doc_id"), col("pos"), expr("pos DIV 3").as("span_id"))
      .withColumn("m",
        when(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
          col("span_id").cast("string"))), 1, 2) <= "25", 1L).otherwise(0L))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("m").as("n_masked"),
        countDistinct(when(col("m") === 1, col("span_id"))).as("n_sentinels"),
        expr("(sum(m) * 1000000) DIV count(1)").as("mask_ratio_micro"))
      .orderBy("doc_id").limit(30)
  }

  val spanMaskSql: String = """
WITH tok AS (
  SELECT doc_id, g.i - 1 AS pos
  FROM (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS a
        FROM documents WHERE length(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) > 0),
       unnest(range(1, len(a) + 1)) g(i)),
sp AS (
  SELECT doc_id, pos, pos // 3 AS span_id,
         CASE WHEN substr(md5(doc_id || ':' || (pos // 3)), 1, 2) <= '25' THEN 1 ELSE 0 END AS m
  FROM tok)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(m) AS BIGINT) AS n_masked,
       CAST(COUNT(DISTINCT CASE WHEN m = 1 THEN span_id END) AS BIGINT) AS n_sentinels,
       CAST((SUM(m) * 1000000) // COUNT(*) AS BIGINT) AS mask_ratio_micro
FROM sp GROUP BY 1 ORDER BY doc_id LIMIT 30
"""

  // ------------------------------------------------------- registry

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rouge_pairs" -> (rougePairs _),
    "q_span_mask" -> (spanMask _))

  def oracles: Map[String, String] = Map(
    "q_rouge_pairs" -> rougePairsSql,
    "q_span_mask" -> spanMaskSql)
}
