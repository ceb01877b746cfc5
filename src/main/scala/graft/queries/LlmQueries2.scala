package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns._
import graft.operators.{ConnectedComponents, SimHash}

/** Second batch of LLM-training-data pipeline operators: transitive
  * dedup clustering (connected components over the near-dup pair graph)
  * and TF-IDF term scoring.
  */
object LlmQueries2 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** Transitive dedup clusters: edges = exact-fingerprint duplicate pairs
    * ∪ SimHash Hamming-≤2 near-dup pairs; components via alternating
    * large-star/small-star (O(log n) shuffle rounds, no driver-side
    * graph). One row per clustered doc with its canonical (min) id — the
    * doc a deduplicating pipeline would keep — and the cluster size.
    * Docs in no pair (the vast majority) are untouched singletons and do
    * not appear. */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    // Edge build + CC staged once per (session, dir) and shared with
    // q_dedup_canonical — see operators/DedupStage.
    val comp = graft.operators.DedupStage.components(s, dir)
    comp.join(ConnectedComponents.clusterSizes(comp), "component")
      .select(col("id").as("doc_id"), col("component"), col("cluster_size"))
      .orderBy("doc_id")
  }

  /** DuckDB twin: same edge set, components via recursive-CTE transitive
    * closure (min reachable id). Closure is O(n·m) rows — fine for the
    * oracle's small data, and exactly why the engine side uses
    * large-star/small-star instead. */
  val dedupClustersSql: String = {
    val nBits = 32; val nBlocks = 3
    val blockSelects = (0 until nBlocks).map { b =>
      val lo = b * nBits / nBlocks
      val hi = (b + 1) * nBits / nBlocks
      val mask = (1L << (hi - lo)) - 1
      s"SELECT doc_id, simhash, $b AS blk, (simhash >> $lo) & $mask AS bval FROM sim"
    }.mkString("\n  UNION ALL\n  ")
    LlmQueries.simhashBaseSql.replaceFirst("WITH", "WITH RECURSIVE") + s""",
fp AS (
  SELECT doc_id, md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint
  FROM documents),
fpe AS (
  SELECT m.src, f.doc_id AS dst
  FROM fp f
  JOIN (SELECT fingerprint, min(doc_id) AS src FROM fp GROUP BY fingerprint) m USING (fingerprint)
  WHERE f.doc_id <> m.src),
blocked AS (
  $blockSelects),
hp AS (
  SELECT DISTINCT x.doc_id AS src, y.doc_id AS dst
  FROM blocked x JOIN blocked y
    ON x.blk = y.blk AND x.bval = y.bval AND x.doc_id < y.doc_id
  WHERE bit_count(xor(x.simhash, y.simhash)) <= 2),
edges AS (SELECT src, dst FROM fpe UNION SELECT src, dst FROM hp),
sym AS (SELECT src, dst FROM edges UNION SELECT dst AS src, src AS dst FROM edges),
reach(a, b) AS (
  SELECT src AS a, dst AS b FROM sym
  UNION
  SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src),
comp AS (SELECT a AS doc_id, least(a, min(b)) AS component FROM reach GROUP BY a),
sizes AS (SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY component)
SELECT c.doc_id, c.component, s.cluster_size
FROM comp c JOIN sizes s USING (component)
ORDER BY doc_id
"""
  }

  /** TF-IDF top-5 terms per doc (linear-ratio idf variant: score =
    * tf · N / df). The ratio form keeps the score an exact integer
    * quotient — one IEEE division, bitwise reproducible cross-engine —
    * where ln-based idf would hinge on libm agreement in the last ulp.
    * tf and df come from one explode→groupBy cascade: the explode output
    * never shuffles twice (tf aggregates map-side per (doc, term); df
    * reuses the tf frame, not the token rows). */
  def tfidfTopTerms(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val tok = docs.select(col("doc_id"),
      explode(tokens(normalizeText(col("text")))).as("term"))
    // tf feeds two consumers (df derivation + the scoring join) and
    // Catalyst does not share subplans across them — materialize once so
    // the explode→groupBy cascade runs a single time.
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .filter(col("doc_id") < 50)
      .withColumn("score",
        (col("tf") * col("n_docs")).cast("double") / col("df").cast("double"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("doc_id", "term", "tf", "df", "score", "rank")
      .orderBy("doc_id", "rank")
  }

  val tfidfTopTermsSql: String = """
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s
  FROM documents),
tok AS (
  SELECT doc_id, unnest(string_split(s, ' ')) AS term FROM norm WHERE length(s) > 0),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, tf, df.df,
         CAST(tf * n_docs AS DOUBLE) / CAST(df.df AS DOUBLE) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
  WHERE doc_id < 50),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
      FROM scored)
SELECT doc_id, term, tf, df, score, rank FROM r WHERE rank <= 5 ORDER BY doc_id, rank
"""

  /** Training-sequence packing (concat-and-chunk): per language, docs
    * concatenate in doc_id order and split into 4096-token context
    * windows; a doc's chunk is where its first token lands. The running
    * total is a window cumsum over exact longs — deterministic, and at
    * scale one shuffle keyed by the pack partition (lang), the same key
    * the output is written by. */
  def seqPacking(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    t(s, dir, "documents")
      .select(col("lang"), col("doc_id"), bpeTokenCount(col("text")).cast("long").as("toks"))
      .withColumn("cum", sum(col("toks")).over(w))
      .withColumn("chunk_id", // exact DIV: long >> 12, not double division
        shiftright(col("cum") - col("toks"), 12))
      .groupBy("lang", "chunk_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("chunk_tokens"))
      .orderBy("lang", "chunk_id")
  }

  val seqPackingSql: String = """
WITH d AS (
  SELECT lang, doc_id,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS toks
  FROM documents),
c AS (
  SELECT lang, doc_id, toks,
         SUM(toks) OVER (PARTITION BY lang ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM d)
SELECT lang, CAST((cum - toks) // 4096 AS BIGINT) AS chunk_id, COUNT(*) AS n_docs,
       CAST(SUM(toks) AS BIGINT) AS chunk_tokens
FROM c GROUP BY lang, chunk_id ORDER BY lang, chunk_id
"""

  /** Repetition signal (Gopher-style quality filter): fraction of
    * duplicate word 3-grams per doc. The n-grams come from lead() windows
    * over exploded token rows — fully codegen'd relational ops, no
    * higher-order array lambdas — so the shape survives fact-table scale:
    * one shuffle keyed by doc. */
  def dupNgramRatio(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val tok = t(s, dir, "documents")
      .select(col("doc_id"), posexplode(tokens(normalizeText(col("text")))).as(Seq("pos", "tk")))
    val ng = tok
      .withColumn("t2", lead(col("tk"), 2).over(w))
      .withColumn("ng", concat_ws(" ",
        col("tk"), lead(col("tk"), 1).over(w), col("t2")))
      .filter(col("t2").isNotNull)
    ng.groupBy("doc_id")
      .agg(count(lit(1)).as("n_ngrams"),
        countDistinct(col("ng")).as("n_distinct"))
      .withColumn("dup_ratio",
        lit(1.0) - col("n_distinct").cast("double") / col("n_ngrams").cast("double"))
      .orderBy("doc_id")
  }

  val dupNgramRatioSql: String = """
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s
  FROM documents),
tok AS (
  SELECT doc_id, u.i - 1 AS pos, u.tk FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(ts) + 1),
                                 i -> struct_pack(i := i, tk := ts[i]))) AS u
    FROM (SELECT doc_id, string_split(s, ' ') AS ts FROM norm WHERE length(s) > 0) x) y),
ng AS (
  SELECT doc_id,
         concat_ws(' ', tk,
                   lead(tk, 1) OVER (PARTITION BY doc_id ORDER BY pos),
                   lead(tk, 2) OVER (PARTITION BY doc_id ORDER BY pos)) AS ng,
         lead(tk, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
  FROM tok)
SELECT doc_id, COUNT(*) AS n_ngrams, COUNT(DISTINCT ng) AS n_distinct,
       1.0 - CAST(COUNT(DISTINCT ng) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS dup_ratio
FROM ng WHERE t2 IS NOT NULL
GROUP BY doc_id ORDER BY doc_id
"""

  /** Corpus vocabulary head: global top-20 tokens by frequency with a
    * deterministic tiebreak. explode → partial-agg count → TakeOrdered:
    * the shuffle carries one row per distinct token, the driver sees 20
    * rows. */
  def vocabTopK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(tokens(normalizeText(col("text")))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)

  val vocabTopKSql: String = """
WITH norm AS (
  SELECT trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s FROM documents),
tok AS (SELECT unnest(string_split(s, ' ')) AS token FROM norm WHERE length(s) > 0)
SELECT token, COUNT(*) AS n FROM tok GROUP BY token
ORDER BY n DESC, token LIMIT 20
"""

  /** RAG/window chunking: overlapping fixed-width character chunks
    * (size 200, stride 150) per doc — the retrieval-prep twin of
    * q_seq_packing's training-prep. The chunk starts come from
    * `explode(sequence(...))`, so chunking is a codegen'd generator in
    * the scan stage: no shuffle until (and unless) something aggregates.
    * Chunk text is fingerprinted, not carried — the id/offset/hash tuple
    * is what an index ingest needs, and it keeps the result narrow. */
  def docChunks(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").filter(col("doc_id") < 100)
    docs.select(col("doc_id"), col("text"),
        explode(sequence(lit(1),
          greatest(length(col("text")) - 49, lit(1)), lit(150))).as("start"))
      .select(col("doc_id"),
        (((col("start") - 1) / 150).cast("long")).as("chunk_idx"),
        col("start"),
        length(col("text").substr(col("start").cast("int"), lit(200))).as("chunk_len"),
        md5(col("text").substr(col("start").cast("int"), lit(200))).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")
  }

  val docChunksSql: String = """
SELECT doc_id,
       CAST((u.start - 1) // 150 AS BIGINT) AS chunk_idx,
       u.start AS start,
       length(substr(text, CAST(u.start AS INTEGER), 200)) AS chunk_len,
       md5(substr(text, CAST(u.start AS INTEGER), 200)) AS chunk_md5
FROM (
  SELECT doc_id, text, unnest(range(1, greatest(length(text) - 49, 1) + 1, 150)) AS start
  FROM documents WHERE doc_id < 100) u
ORDER BY doc_id, chunk_idx
"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_clusters" -> (dedupClusters _),
    "q_tfidf_topterms" -> (tfidfTopTerms _),
    "q_seq_packing" -> (seqPacking _),
    "q_dup_ngram_ratio" -> (dupNgramRatio _),
    "q_vocab_topk" -> (vocabTopK _),
    "q_doc_chunks" -> (docChunks _))

  val oracles: Map[String, String] = Map(
    "q_dedup_clusters" -> dedupClustersSql,
    "q_tfidf_topterms" -> tfidfTopTermsSql,
    "q_seq_packing" -> seqPackingSql,
    "q_dup_ngram_ratio" -> dupNgramRatioSql,
    "q_vocab_topk" -> vocabTopKSql,
    "q_doc_chunks" -> docChunksSql)
}
