package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns._
import graft.operators.SimHash

/** Seventeenth batch: the linear-output SimHash cluster contract and the
  * 64-bit fingerprint width (r14) — the two operators that close the
  * near-dup family's 100 TB story. `q_simhash_hamming`'s all-pairs
  * output is quadratic in copy count BY CONSTRUCTION on replica-heavy
  * corpora (485M true pairs at the r13 100× tier); a dedup pipeline
  * consumes cluster membership, which [[SimHash.hammingClusters]] emits
  * in O(n) rows. And production web-scale SimHash runs 64-bit
  * fingerprints (Manku et al., WWW'07 §3) — `q_simhash64_hamming` pins
  * the two-word md5 basis, the full-width packing (bit 63 = the sign
  * bit) and the 64-bit pigeonhole block math cross-engine.
  */
object LlmQueries17 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** Corpus + planted 1-bit-flip copies (the simhashHamming fixture),
    * clustered linearly: star edges to each pigeonhole bucket's min-id
    * rep, verified at Hamming ≤ 2, closed by connected components.
    * Parametrized by fingerprint width (r15): `q_hamming_clusters64`
    * composes the round-14 pair — 64-bit production fingerprints AND
    * linear cluster output — which the 32-bit cluster query and the
    * 64-bit PAIRS query each exercise only half of. */
  private def hammingClustersQ(nBits: Int)(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val base = SimHash.withSimhash(docs, "doc_id",
        tokens(normalizeText(col("text"))), nBits = nBits)
      .localCheckpoint(true)
    // Java shift semantics make bit 63 exact here: 1L << 63 IS the sign
    // bit (the twin needs a MIN_VALUE special case instead).
    val planted = base.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      col("simhash").bitwiseXOR(
        expr(s"shiftleft(bigint(1), int(doc_id % $nBits))")).as("simhash"))
    SimHash.hammingClusters(base.union(planted), "doc_id", nBits = nBits, maxDist = 2)
      .orderBy("doc_id")
  }

  def hammingClusters(s: SparkSession, dir: String): DataFrame =
    hammingClustersQ(32)(s, dir)

  def hammingClusters64(s: SparkSession, dir: String): DataFrame =
    hammingClustersQ(64)(s, dir)

  /** Twin: the same star-edge graph (per-bucket min-id rep, popcount
    * verification), components via recursive-CTE closure — the
    * dedupClustersSql discipline. The star graph is the CONTRACT, not an
    * approximation the oracle smooths over: both engines build exactly
    * the verified member→rep edge set, so the components match row for
    * row. At 64 bits the planted flip spells bit 63 as a MIN_VALUE
    * literal (DuckDB rejects `1 << 63` as BIGINT overflow where Java
    * wraps to the sign bit — the simhash64HammingSql discipline). */
  private def hammingClustersSqlFor(nBits: Int): String = {
    val nBlocks = 3
    val blockSelects = (0 until nBlocks).map { b =>
      val lo = b * nBits / nBlocks
      val hi = (b + 1) * nBits / nBlocks
      val mask = (1L << (hi - lo)) - 1
      s"SELECT doc_id, simhash, $b AS blk, (simhash >> $lo) & $mask AS bval FROM allsim"
    }.mkString("\n  UNION ALL\n  ")
    val flip =
      if (nBits == 64)
        """CASE WHEN doc_id % 64 = 63 THEN CAST(-9223372036854775808 AS BIGINT)
                  ELSE CAST(1 AS BIGINT) << CAST(doc_id % 64 AS INTEGER) END"""
      else s"CAST(1 AS BIGINT) << CAST(doc_id % $nBits AS INTEGER)"
    LlmQueries.simhashBaseSqlFor(nBits).replaceFirst("WITH", "WITH RECURSIVE") + s""",
pert AS (
  SELECT doc_id + 1000000 AS doc_id,
         xor(simhash, $flip) AS simhash
  FROM sim),
allsim AS (SELECT * FROM sim UNION ALL SELECT * FROM pert),
blocked AS (
  $blockSelects),
rep AS (SELECT blk, bval, min(doc_id) AS rid FROM blocked GROUP BY blk, bval),
edges AS (
  SELECT DISTINCT r.rid AS src, b.doc_id AS dst
  FROM blocked b
  JOIN rep r USING (blk, bval)
  JOIN allsim rs ON rs.doc_id = r.rid
  WHERE b.doc_id <> r.rid AND bit_count(xor(b.simhash, rs.simhash)) <= 2),
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

  val hammingClustersSql: String = hammingClustersSqlFor(32)
  val hammingClusters64Sql: String = hammingClustersSqlFor(64)

  /** 64-bit fingerprints end-to-end: two-word md5 token basis, bit 63 in
    * the sign position, planted flips across all 64 bit positions, and
    * Hamming-≤2 pairs via the 64-bit pigeonhole (blocks of 21/21/22
    * bits). */
  def simhash64Hamming(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val base = SimHash.withSimhash(docs, "doc_id",
        tokens(normalizeText(col("text"))), nBits = 64)
      .localCheckpoint(true)
    val planted = base.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      col("simhash").bitwiseXOR(
        expr("shiftleft(bigint(1), int(doc_id % 64))")).as("simhash"))
    SimHash.hammingPairs(base.union(planted), "doc_id", nBits = 64, maxDist = 2)
      .orderBy("id_a", "id_b")
  }

  /** Twin: 64-bit base chain (two hex words), planted flip spelled with
    * a MIN_VALUE special case — DuckDB rejects `1 << 63` as BIGINT
    * overflow where Java wraps to the sign bit — and the same pigeonhole
    * candidate join. Arithmetic `>>` sign-extension agrees between
    * engines and the block masks kill the extended bits. */
  val simhash64HammingSql: String = {
    val nBits = 64; val nBlocks = 3
    val blockSelects = (0 until nBlocks).map { b =>
      val lo = b * nBits / nBlocks
      val hi = (b + 1) * nBits / nBlocks
      val mask = (1L << (hi - lo)) - 1
      s"SELECT doc_id, simhash, $b AS blk, (simhash >> $lo) & $mask AS bval FROM allsim"
    }.mkString("\n  UNION ALL\n  ")
    LlmQueries.simhashBaseSqlFor(64) + s""",
pert AS (
  SELECT doc_id + 1000000 AS doc_id,
         xor(simhash,
             CASE WHEN doc_id % 64 = 63 THEN CAST(-9223372036854775808 AS BIGINT)
                  ELSE CAST(1 AS BIGINT) << CAST(doc_id % 64 AS INTEGER) END) AS simhash
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

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hamming_clusters" -> (hammingClusters _),
    "q_hamming_clusters64" -> (hammingClusters64 _),
    "q_simhash64_hamming" -> (simhash64Hamming _))

  val oracles: Map[String, String] = Map(
    "q_hamming_clusters" -> hammingClustersSql,
    "q_hamming_clusters64" -> hammingClusters64Sql,
    "q_simhash64_hamming" -> simhash64HammingSql)
}
