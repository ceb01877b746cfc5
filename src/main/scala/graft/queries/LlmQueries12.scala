package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns.{normalizeText, tokens}

/** Twelfth LLM-pipeline batch: Bloom-gated decontamination — the
  * filter-as-data shape the 100 TB pipeline actually runs when the
  * benchmark n-gram set outgrows an exact broadcast.
  */
object LlmQueries12 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** Doc → hashed 3-gram stream (the q_decontaminate token pipeline:
    * normalize → whitespace tokens → positional lead-2 shingles). */
  private def grams(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    t(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(tokens(normalizeText(col("text")))).as(Seq("pos", "tk")))
      .withColumn("t2", lead(col("tk"), 2).over(w))
      .withColumn("ng",
        md5(concat_ws(" ", col("tk"), lead(col("tk"), 1).over(w), col("t2"))))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"), col("ng"))
  }

  /** Bloom-gated benchmark decontamination: build a Bloom filter over
    * the held-out benchmark's 3-gram hashes (distributed partial build,
    * one merged ~1 MB filter), probe every training gram through the
    * native `bloom_contains` expression, and send ONLY the "maybe"
    * survivors to exact verification (semi-join against the true bench
    * set). Bloom false ⇒ definitely absent, so the gate discards the
    * overwhelming clean majority without shuffling it; false positives
    * are killed by the exact join — the final answer is EXACT and
    * independent of fpp, which is why it can be oracled by plain SQL
    * with no bloom at all. This is q_decontaminate's scale path: an
    * exact broadcast of the bench set caps at driver memory, a Bloom
    * filter of the same set is ~10 bits/item at fpp=1%.
    *
    * Sizing is a capacity CONSTANT (2^20 items) rather than a count
    * action: overflow past capacity degrades fpp — more survivors into
    * exact verify, same answer — never correctness. Differentiated from
    * q_decontaminate's parameters (bench slice doc_id%89, threshold ≥2,
    * contaminated docs only) so the two queries' oracles stay distinct. */
  def bloomDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val g = grams(s, dir)
    val bench = g.filter(col("doc_id") % 89 === 0).select("ng").distinct()
    val bloom = bench.stat.bloomFilter("ng", 1L << 20, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val filterLit = lit(bos.toByteArray)
    g.filter(col("doc_id") % 89 =!= 0)
      .filter(graft.functions.SketchFns.bloomContains(filterLit, col("ng")))
      .join(bench, Seq("ng"), "left_semi")
      .groupBy("doc_id").agg(countDistinct(col("ng")).as("n_overlap"))
      .filter(col("n_overlap") >= 2)
      .orderBy("doc_id")
  }

  val bloomDecontaminateSql: String = """
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s
  FROM documents),
tok AS (
  SELECT doc_id, u.i - 1 AS pos, u.tk FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(ts) + 1),
                                 i -> struct_pack(i := i, tk := ts[i]))) AS u
    FROM (SELECT doc_id, string_split(s, ' ') AS ts FROM norm WHERE length(s) > 0) x) y),
g AS (
  SELECT doc_id,
         md5(concat_ws(' ', tk,
                       lead(tk, 1) OVER (PARTITION BY doc_id ORDER BY pos),
                       lead(tk, 2) OVER (PARTITION BY doc_id ORDER BY pos))) AS ng,
         lead(tk, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
  FROM tok),
grams AS (SELECT doc_id, ng FROM g WHERE t2 IS NOT NULL),
bench AS (SELECT DISTINCT ng FROM grams WHERE doc_id % 89 = 0),
train AS (SELECT doc_id, ng FROM grams WHERE doc_id % 89 <> 0)
SELECT doc_id, COUNT(DISTINCT ng) AS n_overlap
FROM train WHERE ng IN (SELECT ng FROM bench)
GROUP BY doc_id
HAVING COUNT(DISTINCT ng) >= 2
ORDER BY doc_id
"""

  /** Hard-negative mining — the contrastive-training data op: for each
    * anchor, the top-5 most-similar vectors carrying a DIFFERENT label
    * (the negatives the loss learns most from; easy negatives teach
    * nothing). Shape: the q_knn_bruteforce exhaustive baseline (8-row
    * anchor broadcast × corpus — allowlisted bounded nested loop) with
    * the label-mismatch gate BELOW the ranking, then the r7 discipline:
    * bounded-heap TopKPerGroup prunes to 5·anchors survivors before the
    * rank window, so no per-anchor full sort exists even though anchors
    * are low-cardinality. At 100 TB the corpus side swaps to the staged
    * IVF probe (q_ann_ivf_persisted) unchanged above this line. */
  def hardNegatives(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFns.{cosineFast, toDoubleVec}
    import graft.operators.Knn
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), toDoubleVec(col("embedding")).as("e"))
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"), col("e").as("qe"))
    val sims = e.crossJoin(broadcast(q))
      .filter(col("label") =!= col("qlabel"))
      .select(col("qid"), col("vec_id"),
        Knn.truncSim(cosineFast(col("qe"), col("e"))).as("sim"))
    val picked = graft.plans.TopKPerGroup.topK(
      sims, Seq(col("qid")), Seq(col("sim").desc, col("vec_id")), k = 5)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    picked.withColumn("rank", row_number().over(w))
      .orderBy("qid", "rank")
  }

  val hardNegativesSql: String = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
q AS (SELECT vec_id AS qid, label AS qlabel, e AS qe FROM e WHERE vec_id < 8),
sims AS (
  SELECT qid, vec_id,
         CAST(floor(list_cosine_similarity(qe, e.e) * 1000000) AS DOUBLE) / 1000000.0 AS sim
  FROM e CROSS JOIN q WHERE e.label <> q.qlabel),
r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank FROM sims)
SELECT qid, vec_id, sim, rank FROM r WHERE rank <= 5 ORDER BY qid, rank
"""

  // ------------------------------------------------------- registry

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bloom_decontaminate" -> (bloomDecontaminate _),
    "q_hard_negatives" -> (hardNegatives _))

  def oracles: Map[String, String] = Map(
    "q_bloom_decontaminate" -> bloomDecontaminateSql,
    "q_hard_negatives" -> hardNegativesSql)
}
