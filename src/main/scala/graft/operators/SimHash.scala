package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash document fingerprinting (Charikar '02, as used for web-scale
  * near-dup detection in Manku et al. WWW'07).
  *
  * Per doc: hash every token to `nBits` bits; for each bit position sum
  * +1/−1 votes across tokens; the sign vector packed into a long is the
  * fingerprint. The token hash is the first 8 hex chars of md5 parsed as
  * an unsigned 32-bit value — md5 (not xxhash64) so a DuckDB oracle can
  * reproduce the fingerprints bit-for-bit (same trick as
  * MinHashDedup.signatures; xxhash64 has no cross-engine twin).
  *
  * Shape at scale: explode(tokens) → groupBy(doc) is one shuffle keyed by
  * doc id; the per-bit votes are map-side partial sums. No all-pairs
  * anything. `hammingPairs` adds the Manku pigeonhole-block candidate
  * join for near-fingerprint (Hamming ≤ k) matches — equi-join on block
  * values, never a cross join.
  */
object SimHash {

  /** Adds `simhash` to one-row-per-doc input. `tokensCol` must be an
    * array<string> column; docs with no tokens drop out (no votes). */
  def withSimhash(docs: DataFrame, idCol: String, tokensCol: Column,
                  nBits: Int = 32): DataFrame = {
    require(nBits >= 1 && nBits <= 32, "token hash is 32 bits (8 md5 hex chars)")
    val tok = docs.select(col(idCol), explode(tokensCol).as("__tok"))
      .withColumn("__h", conv(substring(md5(col("__tok")), 1, 8), 16, 10).cast("long"))
    val votes = (0 until nBits).map { i =>
      sum(when(shiftright(col("__h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"__v$i")
    }
    val agg = tok.groupBy(idCol).agg(votes.head, votes.tail: _*)
    val packed = (0 until nBits).map { i =>
      when(col(s"__v$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col(idCol), packed.as("simhash"))
  }

  /** Cluster docs sharing a simhash; `cluster_size` > 1 ⇒ near-dup set.
    *
    * The input feeds two consumers (rows + counts) and Catalyst does not
    * share subplans across a self-join, so the signature frame — tiny,
    * one (id, long) row per doc — is eagerly materialized first; the
    * token-hash aggregation behind it runs once, not twice. */
  def clusters(withSim: DataFrame, idCol: String): DataFrame = {
    val sim = withSim.localCheckpoint(true)
    val counts = sim.groupBy("simhash").agg(count(lit(1)).as("cluster_size"))
    sim.join(counts, "simhash").select(col(idCol), col("simhash"), col("cluster_size"))
  }

  /** Pairs within Hamming distance ≤ `maxDist` of each other, via the
    * Manku WWW'07 pigeonhole split: `nBits` split into `maxDist + 1`
    * contiguous blocks — a pair differing in ≤ maxDist bits must agree
    * exactly on at least one whole block. Candidates = equi-join per
    * (block index, block value); verification = popcount of the XOR.
    * At scale this is one shuffle on uniformly-distributed block values;
    * the all-pairs form never appears.
    *
    * Input must carry (`idCol`, `simhash`); output (id_a, id_b, hamming).
    */
  def hammingPairs(withSim: DataFrame, idCol: String, nBits: Int = 32,
                   maxDist: Int = 2): DataFrame = {
    require(maxDist >= 0 && maxDist + 1 <= nBits, "need at least one bit per block")
    // Same self-join recompute guard as `clusters`: materialize the
    // (id, simhash) frame once before fanning out to x/y sides.
    val sim = withSim.localCheckpoint(true)
    val nBlocks = maxDist + 1
    val blocks = (0 until nBlocks).map { b =>
      val lo = b * nBits / nBlocks
      val hi = (b + 1) * nBits / nBlocks
      val mask = (1L << (hi - lo)) - 1
      struct(lit(b).as("blk"),
        shiftright(col("simhash"), lo).bitwiseAND(lit(mask)).as("bval"))
    }
    val blocked = sim
      .select(col(idCol), col("simhash"), explode(array(blocks: _*)).as("bb"))
      .select(col(idCol), col("simhash"), col("bb.blk").as("blk"), col("bb.bval").as("bval"))
    blocked.as("x").join(blocked.as("y"),
        col("x.blk") === col("y.blk") && col("x.bval") === col("y.bval") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
