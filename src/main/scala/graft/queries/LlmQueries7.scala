package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns.normalizeText
import graft.functions.VectorFns.{cosineFast, toDoubleVec}

/** Seventh LLM-pipeline batch: retrieval diversification (MMR) and
  * content-defined chunking — the rerank half of a RAG serving stack and
  * the shift-stable chunking half of an ingest stack.
  */
object LlmQueries7 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** Maximal Marginal Relevance reranking (Carbonell & Goldstein
    * SIGIR'98): from the top-20 cosine candidates for one query vector,
    * greedily pick 5 maximizing λ·rel − (1−λ)·max-sim-to-picked with
    * λ = 0.7 — the diversification pass a retrieval stack runs after
    * ANN so near-duplicate hits don't crowd the context window.
    *
    * Determinism + scale shape: similarities are micro-floored BIGINTs
    * (house float rule), so the greedy score 7·rel − 3·ms is pure
    * integer with a vec_id tiebreak. The corpus-sized work is ONE
    * broadcast-query cosine pass + top-k (the q_knn_bruteforce shape —
    * at 100 TB the IVF index replaces it, q_ann_ivf_persisted); every
    * greedy round after that touches only the bounded candidate set:
    * a 1-row argmax broadcast against ≤20 rows, the q_bpe_merges
    * round pattern. The 20×20 pairwise-sim table is computed once,
    * checkpointed, and probed per round. */
  def mmrRerank(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val rel = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"), col("v"),
        floor(cosineFast(col("v"), col("qv")) * 1e6).cast("long").as("rel"))
    val cand = rel.orderBy(col("rel").desc, col("vec_id")).limit(20)
      .localCheckpoint(true) // feeds self-join + every greedy round
    val sims = cand.as("a")
      .join(cand.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("x"), col("b.vec_id").as("y"),
        floor(cosineFast(col("a.v"), col("b.v")) * 1e6).cast("long").as("sim"))
      .localCheckpoint(true)
    var rem = cand.select(col("vec_id"), col("rel"), lit(0L).as("ms"))
    var out: DataFrame = null
    for (k <- 1 to 5) {
      val pick = rem
        .select(col("vec_id"), col("rel"),
          (lit(7L) * col("rel") - lit(3L) * col("ms")).as("score"))
        .orderBy(col("score").desc, col("vec_id")).limit(1)
        .localCheckpoint(true) // one row — emitted AND drives the update
      val row = pick.select(lit(k.toLong).as("pick_no"), col("vec_id"),
        col("rel").as("rel_micro"), col("score").as("score_micro"))
      out = if (out == null) row else out.unionByName(row)
      rem = rem
        .join(broadcast(pick.select(col("vec_id").as("pid"))),
          col("vec_id") =!= col("pid"))
        .join(sims, col("x") === col("vec_id") && col("y") === col("pid"))
        .select(col("vec_id"), col("rel"),
          greatest(col("ms"), col("sim")).as("ms"))
        .localCheckpoint(true)
    }
    out.orderBy("pick_no")
  }

  val mmrRerankSql: String = {
    def round(k: Int): String = s""",
p$k AS (SELECT vec_id, rel, 7*rel - 3*ms AS score FROM r${k - 1}
        ORDER BY score DESC, vec_id LIMIT 1),
r$k AS (SELECT c.vec_id, c.rel, GREATEST(c.ms, s.sim) AS ms
        FROM r${k - 1} c JOIN p$k p ON c.vec_id <> p.vec_id
        JOIN sims s ON s.x = c.vec_id AND s.y = p.vec_id)"""
    s"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v FROM e WHERE vec_id = 0),
rel AS (
  SELECT e.vec_id, CAST(floor(list_cosine_similarity(e.v, q.v) * 1000000) AS BIGINT) AS rel, e.v
  FROM e, q WHERE e.vec_id <> 0),
cand AS (SELECT * FROM rel ORDER BY rel DESC, vec_id LIMIT 20),
sims AS (
  SELECT a.vec_id AS x, b.vec_id AS y,
         CAST(floor(list_cosine_similarity(a.v, b.v) * 1000000) AS BIGINT) AS sim
  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
r0 AS (SELECT vec_id, rel, CAST(0 AS BIGINT) AS ms FROM cand)${(1 to 5).map(round).mkString}
SELECT 1 AS pick_no, vec_id, rel AS rel_micro, score AS score_micro FROM p1
${(2 to 5).map(k => s"UNION ALL SELECT $k, vec_id, rel, score FROM p$k").mkString("\n")}
ORDER BY pick_no
"""
  }

  /** Content-defined chunking (the Rabin-fingerprint boundary idea
    * behind LBFS/rsync-style dedup, Muthitacharoen SOSP'01, restated
    * for text): a chunk boundary falls wherever the rolling 3-char
    * polynomial hash of the normalized text hits 0 mod 61, so
    * boundaries move WITH content — an insertion early in a document
    * shifts fixed-size chunk edges everywhere, but content-defined
    * edges re-align, which is what makes chunk-level dedup stable
    * across near-identical documents. Emits per-doc chunk count and
    * mean chunk length (integer centi-chars). Shape: one codegen'd
    * fold per document (sequence → aggregate, zero UDFs, no shuffle
    * before the final ordering); boundary decisions are per-position
    * pure integer arithmetic, bit-identical in the twin. */
  def cdcChunks(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), normalizeText(col("text")).as("s"))
      .filter(length(col("s")) >= 3)
      .select(col("doc_id"), length(col("s")).cast("long").as("n"),
        expr("""aggregate(sequence(3, length(s)), 0L, (acc, i) ->
          acc + CASE WHEN (ascii(substring(s, i, 1))
                           + 131 * ascii(substring(s, i - 1, 1))
                           + 17161 * ascii(substring(s, i - 2, 1))) % 61 = 0
                     THEN 1L ELSE 0L END)""").as("nb"))
      .select(col("doc_id"), col("n"), (lit(1L) + col("nb")).as("n_chunks"),
        expr("(100 * n) div (1 + nb)").as("mean_len_c100"))
      .orderBy("doc_id")

  val cdcChunksSql: String = """
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s
  FROM documents),
pos AS (
  SELECT doc_id, CAST(length(s) AS BIGINT) AS n,
    list_sum(list_transform(range(3, length(s) + 1), i ->
      CASE WHEN (ascii(s[i:i]) + 131 * ascii(s[i-1:i-1]) + 17161 * ascii(s[i-2:i-2])) % 61 = 0
           THEN 1 ELSE 0 END)) AS nb
  FROM norm WHERE length(s) >= 3)
SELECT doc_id, n, CAST(1 + nb AS BIGINT) AS n_chunks,
       CAST(100 * n // (1 + nb) AS BIGINT) AS mean_len_c100
FROM pos ORDER BY doc_id
"""

  /** Persisted LSH dedup index exercised end-to-end ([[MinHashIndex]]):
    * build on the doc_id < 400 corpus, delta-append the rest, probe for
    * new-vs-corpus near-dups in keep-first orientation (id_b ≥ 400) —
    * the ingest-time "is this batch already in the corpus?" gate,
    * served from staged bucket rows instead of a corpus re-signature.
    * Staging runs inside the query for oracle determinism (house
    * pattern of q_ann_ivf_persisted: the architecture is the point;
    * at scale build amortizes over batches). */
  def lshIndex(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val norm = normalizeText(col("text"))
    val idxDir = "target/lsh_index_" + dir.replaceAll("[^A-Za-z0-9]", "_")
    // Build+append staged once per session (StagedOnce): later
    // invocations go straight to the probe, per the index's own
    // build-amortizes-over-batches contract.
    graft.operators.StagedOnce(s, idxDir, owner = "q_lsh_index", dir = dir) {
      graft.operators.MinHashIndex.build(
        docs.filter(col("doc_id") < 400), "doc_id", norm, idxDir)
      graft.operators.MinHashIndex.append(
        docs.filter(col("doc_id") >= 400), "doc_id", norm, idxDir)
    }
    graft.operators.MinHashIndex.probeNew(
        s, idxDir, docs, "doc_id", norm, threshold = 0.7, minNewId = 400L)
      .orderBy("id_a", "id_b")
  }

  /** Twin = the full-corpus minhash twin restricted to pairs whose later
    * side is a delta doc — derived by text substitution from
    * [[LlmQueries.minhashNearDupSql]] so index and in-query pipelines
    * can never drift apart. */
  val lshIndexSql: String = {
    val full = LlmQueries.minhashNearDupSql
    val restricted = full.replace(
      "WHERE jaccard >= 0.7", "WHERE jaccard >= 0.7 AND id_b >= 400")
    require(restricted != full, "minhash twin anchor moved; update lshIndexSql")
    restricted
  }

  /** Near-dup canonicalization — the composite that turns q_dedup_clusters'
    * components into a DEDUP DECISION: within every cluster keep the
    * highest-quality member (ties → smallest doc_id), mark the rest as
    * duplicates of it. This is the end of the dedup funnel a corpus
    * actually executes (clusters alone don't shrink a corpus; choosing
    * canonicals does). Shape on top of the cluster pass: one broadcast-
    * sized quality join and one per-component argmax window — components
    * are near-dup clusters, so partitions are small by construction.
    * Quality score doubles order identically cross-engine (same closed
    * form as q_quality_scores, already hash-verified); the score itself
    * never reaches the output. */
  def dedupCanonical(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFns.qualityScore
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    // Edge build + CC staged once per (session, dir) and shared with
    // q_dedup_clusters — see operators/DedupStage.
    val comp = graft.operators.DedupStage.components(s, dir)
    val scored = comp.join(
      docs.select(col("doc_id"), qualityScore(col("text")).as("__q")),
      col("id") === col("doc_id"))
    val w = Window.partitionBy("component").orderBy(col("__q").desc, col("doc_id"))
    val rep = scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("component"), col("doc_id").as("canonical_id"))
    comp.join(rep, "component")
      .select(col("id").as("doc_id"), col("component"), col("canonical_id"),
        (col("id") === col("canonical_id")).as("is_canonical"))
      .orderBy("doc_id")
  }

  /** Twin derived from the cluster twin by replacing its final SELECT
    * with the quality-argmax canonical choice (same substitution
    * discipline as lshIndexSql — composites may not drift from their
    * base queries). */
  val dedupCanonicalSql: String = {
    val base = LlmQueries2.dedupClustersSql
    val anchor = """SELECT c.doc_id, c.component, s.cluster_size
FROM comp c JOIN sizes s USING (component)
ORDER BY doc_id
"""
    require(base.contains(anchor), "cluster twin anchor moved; update dedupCanonicalSql")
    base.replace(anchor, """, q AS (
  SELECT doc_id,
    least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.3
      + least(CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|for|it|was)\b')) AS DOUBLE)
              / CAST(greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                                   ELSE len(regexp_split_to_array(trim(text), '\s+')) END, 1) AS DOUBLE) * 4.0, 1.0) * 0.5
      + (1.0 - least(CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE)
                     / CAST(greatest(length(text), 1) AS DOUBLE) * 5.0, 1.0)) * 0.2 AS score
  FROM documents),
canon AS (
  SELECT c.doc_id, c.component,
         row_number() OVER (PARTITION BY c.component ORDER BY q.score DESC, c.doc_id) AS rn
  FROM comp c JOIN q USING (doc_id)),
rep AS (SELECT component, doc_id AS canonical_id FROM canon WHERE rn = 1)
SELECT c.doc_id, c.component, r.canonical_id,
       c.doc_id = r.canonical_id AS is_canonical
FROM comp c JOIN rep r USING (component)
ORDER BY doc_id
""")
  }

  /** Preprocessing-funnel yield accounting per source: raw docs →
    * keep-first exact dedup survivors → quality-gate survivors, with the
    * kept token mass — the shrinkage report every corpus build publishes
    * alongside its output (which stage ate the data, per slice). One
    * pass computes all three stage flags as columns; the rollup is a
    * single map-side-combinable aggregation — the funnel costs one scan,
    * not one scan per stage. */
  def pipelineYield(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFns.{fingerprint, qualityScore, tokenCount}
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    val w = Window.partitionBy("__fp").orderBy("doc_id")
    docs
      .select(col("doc_id"), col("source"), fingerprint(col("text")).as("__fp"),
        qualityScore(col("text")).as("__q"), tokenCount(col("text")).as("__tok"))
      .withColumn("__first", row_number().over(w) === 1)
      .groupBy("source").agg(
        count(lit(1)).as("n_raw"),
        sum(when(col("__first"), 1L).otherwise(0L)).as("n_dedup"),
        sum(when(col("__first") && col("__q") >= 0.5, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__first") && col("__q") >= 0.5, col("__tok")).otherwise(0L)).as("kept_tokens"))
      .orderBy("source")
  }

  val pipelineYieldSql: String = """
WITH base AS (
  SELECT doc_id, source, text,
    md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS tok,
    least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.3
      + least(CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|for|it|was)\b')) AS DOUBLE)
              / CAST(greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                                   ELSE len(regexp_split_to_array(trim(text), '\s+')) END, 1) AS DOUBLE) * 4.0, 1.0) * 0.5
      + (1.0 - least(CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE)
                     / CAST(greatest(length(text), 1) AS DOUBLE) * 5.0, 1.0)) * 0.2 AS score
  FROM documents),
flagged AS (
  SELECT source, tok, score,
         row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1 AS first
  FROM base)
SELECT source, COUNT(*) AS n_raw,
       CAST(SUM(CASE WHEN first THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup,
       CAST(SUM(CASE WHEN first AND score >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN first AND score >= 0.5 THEN tok ELSE 0 END) AS BIGINT) AS kept_tokens
FROM flagged GROUP BY source ORDER BY source
"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mmr_rerank" -> (mmrRerank _),
    "q_cdc_chunks" -> (cdcChunks _),
    "q_lsh_index" -> (lshIndex _),
    "q_dedup_canonical" -> (dedupCanonical _),
    "q_pipeline_yield" -> (pipelineYield _))

  val oracles: Map[String, String] = Map(
    "q_mmr_rerank" -> mmrRerankSql,
    "q_cdc_chunks" -> cdcChunksSql,
    "q_lsh_index" -> lshIndexSql,
    "q_dedup_canonical" -> dedupCanonicalSql,
    "q_pipeline_yield" -> pipelineYieldSql)
}
