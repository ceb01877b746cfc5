package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns._
import graft.functions.VectorFns._
import graft.operators.{Dedup, Knn, MinHashDedup, Multimodal, SimHash}

/** LLM-training-data pipeline operators (SURVEY §2.4 mandated
  * extensions): dedup families, similarity search, text analysis,
  * multimodal plumbing — over `documents` and `embeddings`.
  */
object LlmQueries {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** Exact dedup after canonical normalization (fingerprint keep-first). */
  def docExactDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.keepFirst(
      t(s, dir, "documents").withColumn("fingerprint", fingerprint(col("text"))),
      Seq("fingerprint"), Seq(col("doc_id")))
      .select("doc_id", "lang", "source", "n_chars", "fingerprint")
      .orderBy("doc_id")

  val docExactDedupSql: String = """
SELECT doc_id, lang, source, n_chars, fingerprint
FROM (SELECT *, md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint,
             row_number() OVER (PARTITION BY md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
                                ORDER BY doc_id) AS rn
      FROM documents) x
WHERE rn = 1 ORDER BY doc_id
"""

  /** Duplicate clusters by fingerprint (who got deduped, and to what).
    * The corpus plants no exact-normalized duplicates, so the raw query
    * returned 0 rows — a green oracle that could not fail. Every 25th
    * doc therefore gets a planted case/punctuation variant (upper-cased,
    * trailing punctuation) that MUST collide with its source under the
    * normalization; a fingerprint regression to never-match now breaks
    * the hash, not just the vibes. */
  def docFingerprintClusters(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select("doc_id", "text")
    val planted = d.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(upper(col("text")), lit(" !!")).as("text"))
    d.unionByName(planted)
      .withColumn("fingerprint", fingerprint(col("text")))
      .groupBy("fingerprint")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_doc"))
      .filter(col("n_docs") > 1)
      .orderBy("fingerprint")
  }

  val docFingerprintClustersSql: String = """
WITH d AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, upper(text) || ' !!' FROM documents WHERE doc_id % 25 = 0)
SELECT fingerprint, COUNT(*) AS n_docs, min(doc_id) AS canonical_doc
FROM (SELECT doc_id, md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint
      FROM d) x
GROUP BY fingerprint HAVING COUNT(*) > 1
ORDER BY fingerprint
"""

  /** MinHash-LSH near-dup pairs, exact-Jaccard verified at ≥ 0.7. */
  def minhashNearDup(s: SparkSession, dir: String): DataFrame =
    MinHashDedup.nearDuplicates(t(s, dir, "documents"), "doc_id",
        normalizeText(col("text")), threshold = 0.7)
      .orderBy("id_a", "id_b")

  /** Twin of the Carter–Wegman signature pipeline: one md5 per shingle
    * ROW (no distinct — min over a multiset equals min over its set,
    * mirroring `MinHashDedup.shingleRows`), `CAST('0x'||hex AS BIGINT)`
    * decoding the same uint32 Spark's `conv` produces, and the identical
    * (a_j, b_j) constants interpolated from `MinHashDedup.hashParams`. */
  /** The shared minhash pair chain (norm → shingles → signatures →
    * banding → candidates → exact Jaccard), ending in CTE
    * `j(id_a, id_b, jaccard)` with NO final SELECT — reused by
    * q_minhash_neardup (pairs) and q_incremental_dedup (pairs →
    * recursive-CTE closure, LlmQueries19). */
  val minhashPairChainSql: String = {
    val P = MinHashDedup.P
    val mins = MinHashDedup.hashParams(16).zipWithIndex.map { case ((a, b), j) =>
      s"MIN((x * $a + $b) % $P) AS mh$j"
    }.mkString(",\n         ")
    // bucket = first 15 md5 hex chars as BIGINT — the same 60 bits
    // MinHashDedup.banded's Md5PrefixLong decodes (long join keys, r14)
    val bandRows = (0 until 4).map { b =>
      val cols = (0 until 4).map(i => s"mh${b * 4 + i}").mkString(", ',', ")
      s"SELECT doc_id, $b AS b, CAST('0x' || substr(md5(concat($cols)), 1, 15) AS BIGINT) AS bucket FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""
WITH norm AS (
  SELECT doc_id, substr(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), 1, 200) AS s
  FROM documents),
sh AS (
  SELECT doc_id, list_distinct([substr(s, i, 9) for i in range(1, greatest(length(s)-8, 1)+1)]) AS shingles
  FROM norm),
shrow AS (
  SELECT doc_id, unnest([substr(s, i, 9) for i in range(1, greatest(length(s)-8, 1)+1)]) AS shg
  FROM norm),
xv AS (
  SELECT doc_id, CAST('0x' || substr(md5(shg), 1, 8) AS BIGINT) % $P AS x
  FROM shrow),
sig AS (
  SELECT doc_id,
         $mins
  FROM xv GROUP BY doc_id),
banded AS (
  $bandRows),
wb AS (
  SELECT doc_id, b, bucket,
         COUNT(*) OVER (PARTITION BY b, bucket) AS bw,
         MIN(doc_id) OVER (PARTITION BY b, bucket) AS rep
  FROM banded),
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM (SELECT doc_id, b, bucket FROM wb WHERE bw <= 64) x
  JOIN (SELECT doc_id, b, bucket FROM wb WHERE bw <= 64) y
    ON x.b = y.b AND x.bucket = y.bucket AND x.doc_id < y.doc_id
  UNION
  SELECT rep AS id_a, doc_id AS id_b FROM wb WHERE bw > 64 AND doc_id <> rep),
j AS (
  SELECT id_a, id_b,
         CAST(len(list_filter(a.shingles, v -> list_contains(b.shingles, v))) AS DOUBLE) /
         (len(a.shingles) + len(b.shingles) - len(list_filter(a.shingles, v -> list_contains(b.shingles, v)))) AS jaccard
  FROM cand JOIN sh a ON cand.id_a = a.doc_id JOIN sh b ON cand.id_b = b.doc_id)"""
  }

  val minhashNearDupSql: String = minhashPairChainSql + """
SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.7 ORDER BY id_a, id_b
"""

  /** SimHash clusters over md5-derived 32-bit token hashes (exact
    * cross-engine twin below decodes the same bits from md5 hex). */
  def simhashClusters(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val withSim = SimHash.withSimhash(docs, "doc_id", tokens(normalizeText(col("text"))))
    SimHash.clusters(withSim, "doc_id").orderBy("doc_id")
  }

  /** Shared oracle CTE chain ending in `sim(doc_id, simhash)` — the
    * DuckDB twin of `SimHash.withSimhash`: token-hash word w (w = bit/32)
    * is md5 hex chars [8w+1, 8w+8]; bit j lives in hex char
    * (w+1)·8 − (j%32)/4 (big-endian within each word), at in-nibble
    * position j%4. Vote/pack expressions are generated so both engines
    * agree bit-for-bit; bit 63's pack term renders as the MIN_VALUE
    * literal directly (DuckDB rejects `1 << 63` as overflow) and the
    * pack ADDITION stays in range because that one term is negative. */
  private[queries] def simhashBaseSqlFor(nBits: Int): String = {
    require(nBits >= 1 && nBits <= 64)
    val nNib = (nBits + 3) / 4
    val nibbles = (0 until nNib).map { i =>
      val pos = if (i < 8) 8 - i else 24 - i
      s"strpos('0123456789abcdef', substr(hx, $pos, 1)) - 1 AS n$i"
    }.mkString(",\n    ")
    val votes = (0 until nBits).map { j =>
      s"SUM(CASE WHEN ((n${j / 4} >> ${j % 4}) & 1) = 1 THEN 1 ELSE -1 END) AS v$j"
    }.mkString(",\n    ")
    val pack = (0 until nBits).map(j => s"CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")
    s"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s
  FROM documents),
tok AS (
  SELECT doc_id, unnest(string_split(s, ' ')) AS tk FROM norm WHERE length(s) > 0),
nib AS (
  SELECT doc_id,
    $nibbles
  FROM (SELECT doc_id, substr(md5(tk), 1, ${if (nBits <= 32) 8 else 16}) AS hx FROM tok)),
votes AS (
  SELECT doc_id,
    $votes
  FROM nib GROUP BY doc_id),
sim AS (
  SELECT doc_id, CAST($pack AS BIGINT) AS simhash FROM votes)
"""
  }

  private[queries] val simhashBaseSql: String = simhashBaseSqlFor(32)

  val simhashClustersSql: String = simhashBaseSql + """
SELECT s.doc_id, s.simhash, c.cluster_size
FROM sim s
JOIN (SELECT simhash, COUNT(*) AS cluster_size FROM sim GROUP BY simhash) c USING (simhash)
ORDER BY doc_id
"""

  /** Hamming-≤2 near-fingerprint pairs (Manku pigeonhole blocks) over the
    * corpus plus planted 1-bit-flip copies — the case exact-equality
    * clustering can never find. Copies live at doc_id + 1,000,000 with
    * bit (doc_id % 32) toggled. */
  def simhashHamming(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // base feeds both union branches — materialize the tiny signature
    // frame so the token-hash aggregation runs once, not per branch.
    val base = SimHash.withSimhash(docs, "doc_id", tokens(normalizeText(col("text"))))
      .localCheckpoint(true)
    val planted = base.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      col("simhash").bitwiseXOR(
        expr("shiftleft(bigint(1), int(doc_id % 32))")).as("simhash"))
    SimHash.hammingPairs(base.union(planted), "doc_id", nBits = 32, maxDist = 2)
      .orderBy("id_a", "id_b")
  }

  val simhashHammingSql: String = {
    val nBits = 32; val nBlocks = 3
    val blockSelects = (0 until nBlocks).map { b =>
      val lo = b * nBits / nBlocks
      val hi = (b + 1) * nBits / nBlocks
      val mask = (1L << (hi - lo)) - 1
      s"SELECT doc_id, simhash, $b AS blk, (simhash >> $lo) & $mask AS bval FROM allsim"
    }.mkString("\n  UNION ALL\n  ")
    simhashBaseSql + s""",
pert AS (
  SELECT doc_id + 1000000 AS doc_id,
         xor(simhash, CAST(1 AS BIGINT) << CAST(doc_id % 32 AS INTEGER)) AS simhash
  FROM sim),
allsim AS (SELECT * FROM sim UNION ALL SELECT * FROM pert),
blocked AS (
  $blockSelects),
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
         CAST(bit_count(xor(x.simhash, y.simhash)) AS INTEGER) AS hamming
  FROM blocked x JOIN blocked y
    ON x.blk = y.blk AND x.bval = y.bval AND x.doc_id < y.doc_id)
SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 2 ORDER BY id_a, id_b
"""
  }

  /** Exact brute-force cosine top-10 for a small query batch. */
  def knnBruteForce(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("e"))
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    Knn.bruteForceTopK(q, e, k = 10)
      .select("qid", "vec_id", "sim", "rank")
      .orderBy("qid", "rank")
  }

  val knnBruteForceSql: String = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
q AS (SELECT vec_id AS qid, e AS qe FROM e WHERE vec_id < 8),
sims AS (
  SELECT qid, vec_id,
         CAST(floor(list_cosine_similarity(qe, e.e) * 1000000) AS DOUBLE) / 1000000.0 AS sim
  FROM e CROSS JOIN q WHERE vec_id <> qid),
r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank FROM sims)
SELECT qid, vec_id, sim, rank FROM r WHERE rank <= 10 ORDER BY qid, rank
"""

  /** Approximate top-5 via sign-bit LSH bucket equi-join (the scale path:
    * no cross join — candidates live in the query's bucket). */
  def annLshBucket(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("e"))
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    Knn.lshBucketTopK(q, e, k = 5, nBits = 8)
      .select("qid", "vec_id", "bucket", "sim", "rank")
      .orderBy("qid", "rank")
  }

  val annLshBucketSql: String = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
b AS (SELECT vec_id, e,
        (CASE WHEN e[1] > 0 THEN 1 ELSE 0 END) + (CASE WHEN e[2] > 0 THEN 2 ELSE 0 END) +
        (CASE WHEN e[3] > 0 THEN 4 ELSE 0 END) + (CASE WHEN e[4] > 0 THEN 8 ELSE 0 END) +
        (CASE WHEN e[5] > 0 THEN 16 ELSE 0 END) + (CASE WHEN e[6] > 0 THEN 32 ELSE 0 END) +
        (CASE WHEN e[7] > 0 THEN 64 ELSE 0 END) + (CASE WHEN e[8] > 0 THEN 128 ELSE 0 END) AS bucket
      FROM e),
q AS (SELECT vec_id AS qid, e AS qe, bucket FROM b WHERE vec_id < 8),
sims AS (
  SELECT q.qid, b.vec_id, b.bucket,
         CAST(floor(list_cosine_similarity(q.qe, b.e) * 1000000) AS DOUBLE) / 1000000.0 AS sim
  FROM b JOIN q USING (bucket) WHERE b.vec_id <> q.qid),
r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank FROM sims)
SELECT qid, vec_id, bucket, sim, rank FROM r WHERE rank <= 5 ORDER BY qid, rank
"""

  /** IVF-style ANN: probe the 2 nearest of 10 label-cluster centroids. */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), toDoubleVec(col("embedding")).as("e"))
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    Knn.ivfTopK(q, e, "label", k = 5, nprobe = 2)
      .select("qid", "vec_id", "label", "sim", "rank")
      .orderBy("qid", "rank")
  }

  val annIvfSql: String = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
sums AS (
  SELECT label, i, SUM(CAST(round(v[i] * 1e6) AS BIGINT)) AS s, COUNT(*) AS n
  FROM e CROSS JOIN range(1, 65) t(i)
  GROUP BY label, i),
cent AS (
  SELECT label, list(CAST(s AS DOUBLE) / 1e6 / n ORDER BY i) AS cv
  FROM sums GROUP BY label),
q AS (SELECT vec_id AS qid, v AS qe FROM e WHERE vec_id < 8),
assign AS (
  SELECT qid, label FROM (
    SELECT q.qid, c.label,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY list_cosine_similarity(q.qe, c.cv) DESC, c.label) AS crank
    FROM q CROSS JOIN cent c) x
  WHERE crank <= 2),
sims AS (
  SELECT a.qid, e.vec_id, e.label,
         CAST(floor(list_cosine_similarity(q.qe, e.v) * 1000000) AS DOUBLE) / 1000000.0 AS sim
  FROM assign a
  JOIN e ON e.label = a.label
  JOIN q ON q.qid = a.qid
  WHERE e.vec_id <> a.qid),
r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank FROM sims)
SELECT qid, vec_id, label, sim, rank FROM r WHERE rank <= 5 ORDER BY qid, rank
"""

  /** IVF over k-means clusters learned in-query (no precomputed labels):
    * deterministic Lloyd's (k=4, 2 iterations, md5-seeded init), then the
    * same probe-2-clusters search as q_ann_ivf. The 100 TB path for an
    * unclustered corpus. */
  def annIvfKmeans(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.KMeans
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("e"))
    val cents = KMeans.fit(e, "vec_id", "e", k = 4, iters = 2)
    val clustered = KMeans.assign(e, "vec_id", "e", cents)
      .withColumnRenamed("cid", "cluster")
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    Knn.ivfTopK(q, clustered, "cluster", k = 5, nprobe = 2)
      .select("qid", "vec_id", "cluster", "sim", "rank")
      .orderBy("qid", "rank")
  }

  /** DuckDB twin of annIvfKmeans: the two Lloyd's iterations unrolled as
    * CTE pairs (assign → scaled-int centroid recompute), then the final
    * assignment and the IVF probe — generated so both engines share the
    * exact expression shapes (raw cosine for argmax ranks, floor-trunc
    * for reported sims). */
  /** Shared DuckDB twin of `KMeans.fit(k, iters=2)` + final `assign`:
    * CTE chain ending in `af(vec_id, v, cid)` (final assignment) and
    * `cf(cid, cv)` (final centroids), the two Lloyd's iterations
    * unrolled as assign → scaled-int centroid recompute pairs.
    * Parameterized by k so each consumer picks its cluster count. */
  private[queries] def kmeansBaseSql(k: Int): String = {
    val seedOrder = "md5(concat('km|', CAST(vec_id AS VARCHAR)))"
    def assignCte(out: String, cents: String) =
      s"""$out AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS r
    FROM e CROSS JOIN $cents c) x
  WHERE r = 1)"""
    def centCte(out: String, src: String) =
      s"""$out AS (
  SELECT cid, list(CAST(s AS DOUBLE) / 1e6 / n ORDER BY i) AS cv
  FROM (SELECT cid, i, SUM(CAST(round(v[i] * 1e6) AS BIGINT)) AS s, COUNT(*) AS n
        FROM $src CROSS JOIN range(1, 65) t(i)
        GROUP BY cid, i)
  GROUP BY cid)"""
    s"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
seed AS (SELECT vec_id, v FROM e ORDER BY $seedOrder LIMIT $k),
c0 AS (SELECT row_number() OVER (ORDER BY $seedOrder) - 1 AS cid, v AS cv FROM seed),
${assignCte("a1", "c0")},
${centCte("c1", "a1")},
${assignCte("a2", "c1")},
${centCte("c2", "a2")},
${assignCte("af", "c2")},
${centCte("cf", "af")}"""
  }

  val annIvfKmeansSql: String = kmeansBaseSql(4) + """,
q AS (SELECT vec_id AS qid, v AS qe FROM e WHERE vec_id < 8),
probe AS (
  SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY list_cosine_similarity(q.qe, c.cv) DESC, c.cid) AS crank
    FROM q CROSS JOIN cf c) x
  WHERE crank <= 2),
sims AS (
  SELECT p.qid, a.vec_id, a.cid AS cluster,
         CAST(floor(list_cosine_similarity(q.qe, a.v) * 1000000) AS DOUBLE) / 1000000.0 AS sim
  FROM probe p JOIN af a ON a.cid = p.cid JOIN q ON q.qid = p.qid
  WHERE a.vec_id <> p.qid),
r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank FROM sims)
SELECT qid, vec_id, cluster, sim, rank FROM r WHERE rank <= 5 ORDER BY qid, rank
"""

  /** Semantic dedup over k-means clusters (SemDeDup): every vector
    * marked with its cluster and whether a lower-id cluster-mate lies
    * within truncated cosine ≥ 0.4 — cluster-bucketed pairing, the
    * scale-safe contrast to the corpus-wide all-pairs form. */
  def semdedup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{KMeans, SemDeDup}
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("e"))
    val cents = KMeans.fit(e, "vec_id", "e", k = 8, iters = 2)
    SemDeDup.markDuplicates(KMeans.assign(e, "vec_id", "e", cents),
        "vec_id", "e", threshold = 0.4)
      .select(col("vec_id"), col("cid").as("cluster"), col("is_dup"))
      .orderBy("vec_id")
  }

  val semdedupSql: String = kmeansBaseSql(8) + """,
pairs AS (
  SELECT DISTINCT y.vec_id AS vid
  FROM af x JOIN af y ON x.cid = y.cid AND x.vec_id < y.vec_id
  WHERE CAST(floor(list_cosine_similarity(x.v, y.v) * 1000000) AS DOUBLE) / 1000000.0 >= 0.4)
SELECT a.vec_id, a.cid AS cluster, (p.vid IS NOT NULL) AS is_dup
FROM af a LEFT JOIN pairs p ON a.vec_id = p.vid
ORDER BY a.vec_id
"""

  /** Language-ID heuristic vs ground truth: confusion matrix. */
  def langIdConfusion(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("pred_lang", langId(col("text")))
      .groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "pred_lang")

  val langIdConfusionSql: String = """
WITH scored AS (
  SELECT lang,
    len(regexp_extract_all(text, '[一-鿿]')) AS cjk,
    len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist|nicht|mit|ein|zu|den)\b')) AS s_de,
    len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|for|it|was)\b')) AS s_en,
    len(regexp_extract_all(lower(text), '\b(el|los|las|de|que|y|en|un|una|por)\b')) AS s_es,
    len(regexp_extract_all(lower(text), '\b(le|la|les|et|des|est|une|que|dans|pour)\b')) AS s_fr
  FROM documents),
pred AS (
  SELECT lang,
    CASE WHEN cjk > 0 THEN 'zh'
         WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
         WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
         WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
         WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
         ELSE 'fr' END AS pred_lang
  FROM scored)
SELECT lang, pred_lang, COUNT(*) AS n
FROM pred GROUP BY lang, pred_lang ORDER BY lang, pred_lang
"""

  /** Per-doc quality signals + composite score + keep decision. */
  def qualityScores(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        bpeTokenCount(col("text")).as("n_bpe_tokens"),
        punctRatio(col("text")).as("punct_ratio"),
        stopwordRatio(col("text")).as("stopword_ratio"),
        qualityScore(col("text")).as("score"),
        (qualityScore(col("text")) >= 0.5).as("keep"))
      .orderBy("doc_id")

  val qualityScoresSql: String = """
WITH base AS (
  SELECT doc_id, text,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
    CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio,
    CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|for|it|was)\b')) AS DOUBLE) AS sw_hits,
    least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS len_score
  FROM documents),
scored AS (
  SELECT doc_id, n_tokens, n_bpe_tokens, punct_ratio,
    sw_hits / CAST(greatest(n_tokens, 1) AS DOUBLE) AS stopword_ratio,
    len_score * 0.3
      + least(sw_hits / CAST(greatest(n_tokens, 1) AS DOUBLE) * 4.0, 1.0) * 0.5
      + (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.2 AS score
  FROM base)
SELECT doc_id, n_tokens, n_bpe_tokens, punct_ratio, stopword_ratio, score,
       score >= 0.5 AS keep
FROM scored ORDER BY doc_id
"""

  /** Corpus token statistics per language. */
  def tokenStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("lang"), tokenCount(col("text")).as("toks"),
        bpeTokenCount(col("text")).as("bpe"), length(col("text")).as("chars"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("total_tokens"),
        sum(col("bpe")).as("total_bpe_tokens"),
        sum(col("chars")).as("total_chars"),
        (sum(col("toks")).cast("double") / count(lit(1)).cast("double")).as("avg_tokens"))
      .orderBy("lang")

  val tokenStatsSql: String = """
SELECT lang, COUNT(*) AS n_docs,
  CAST(SUM(toks) AS BIGINT) AS total_tokens,
  CAST(SUM(bpe) AS BIGINT) AS total_bpe_tokens,
  CAST(SUM(chars) AS BIGINT) AS total_chars,
  CAST(SUM(toks) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_tokens
FROM (
  SELECT lang,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS toks,
    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe,
    length(text) AS chars
  FROM documents)
GROUP BY lang ORDER BY lang
"""

  /** Deterministic hash-based dataset split (train/val/test) — the
    * reproducible, engine-portable alternative to `sample()`: assignment
    * is a pure function of the id, so re-runs, different partitionings,
    * and different engines all agree, and membership is stable as the
    * corpus grows (no reshuffling rows between splits on append). First
    * 4 md5 hex chars = 65536 buckets; '0ccd' ≈ 5%, '199a' ≈ 10%. */
  def datasetSplit(s: SparkSession, dir: String): DataFrame = {
    val h = substring(md5(concat(lit("split|"), col("doc_id").cast("string"))), 1, 4)
    t(s, dir, "documents")
      .withColumn("split",
        when(h < "0ccd", lit("val"))
          .when(h < "199a", lit("test"))
          .otherwise(lit("train")))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy("split", "lang")
  }

  val datasetSplitSql: String = """
SELECT split, lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM (
  SELECT lang, n_chars,
    CASE WHEN substr(md5(concat('split|', CAST(doc_id AS VARCHAR))), 1, 4) < '0ccd' THEN 'val'
         WHEN substr(md5(concat('split|', CAST(doc_id AS VARCHAR))), 1, 4) < '199a' THEN 'test'
         ELSE 'train' END AS split
  FROM documents)
GROUP BY split, lang
ORDER BY split, lang
"""

  /** Multimodal plumbing: binary payloads decoded partition-parallel via
    * the mapPartitions stub, then aggregated. */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.asMedia(s, t(s, dir, "documents"), "doc_id", "source", "text")
    Multimodal.decode(media).toDF()
      .groupBy(col("group").as("source"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("width")).as("sum_width"),
        sum(col("height")).as("sum_height"),
        sum(col("frames")).as("sum_frames"))
      .orderBy("source")
  }

  val multimodalMetaSql: String = """
SELECT source, COUNT(*) AS n_media,
  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
  CAST(SUM(n_bytes % 640) AS BIGINT) AS sum_width,
  CAST(SUM((n_bytes * 7) % 480) AS BIGINT) AS sum_height,
  CAST(SUM(n_bytes % 16) AS BIGINT) AS sum_frames
FROM (SELECT source, octet_length(encode(text)) AS n_bytes FROM documents)
GROUP BY source ORDER BY source
"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_doc_exact_dedup" -> (docExactDedup _),
    "q_doc_fingerprint_clusters" -> (docFingerprintClusters _),
    "q_minhash_neardup" -> (minhashNearDup _),
    "q_simhash_clusters" -> (simhashClusters _),
    "q_simhash_hamming" -> (simhashHamming _),
    "q_knn_bruteforce" -> (knnBruteForce _),
    "q_ann_lsh_bucket" -> (annLshBucket _),
    "q_ann_ivf" -> (annIvf _),
    "q_ann_ivf_kmeans" -> (annIvfKmeans _),
    "q_semdedup" -> (semdedup _),
    "q_langid_confusion" -> (langIdConfusion _),
    "q_quality_scores" -> (qualityScores _),
    "q_token_stats" -> (tokenStats _),
    "q_dataset_split" -> (datasetSplit _),
    "q_multimodal_meta" -> (multimodalMeta _))

  val oracles: Map[String, String] = Map(
    "q_doc_exact_dedup" -> docExactDedupSql,
    "q_doc_fingerprint_clusters" -> docFingerprintClustersSql,
    "q_minhash_neardup" -> minhashNearDupSql,
    "q_simhash_clusters" -> simhashClustersSql,
    "q_simhash_hamming" -> simhashHammingSql,
    "q_knn_bruteforce" -> knnBruteForceSql,
    "q_ann_lsh_bucket" -> annLshBucketSql,
    "q_ann_ivf" -> annIvfSql,
    "q_ann_ivf_kmeans" -> annIvfKmeansSql,
    "q_semdedup" -> semdedupSql,
    "q_langid_confusion" -> langIdConfusionSql,
    "q_quality_scores" -> qualityScoresSql,
    "q_token_stats" -> tokenStatsSql,
    "q_dataset_split" -> datasetSplitSql,
    "q_multimodal_meta" -> multimodalMetaSql)
}
