package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash document fingerprinting (Charikar '02, as used for web-scale
  * near-dup detection in Manku et al. WWW'07).
  *
  * Per doc: hash every token to 64 bits (`xxhash64`, codegen'd); for each
  * of the low `nBits` bit positions sum +1/−1 votes across tokens; the
  * sign vector packed into a long is the fingerprint. Near-dups share
  * fingerprints (or differ in ≤ k bits — the equality form here clusters
  * exact-simhash matches, the cheapest variant).
  *
  * Shape at scale: explode(tokens) → groupBy(doc) is one shuffle keyed by
  * doc id; the per-bit votes are map-side partial sums. No all-pairs
  * anything. (xxhash64 has no DuckDB twin, so queries built on this are
  * rows-only checked.)
  */
object SimHash {

  /** Adds `simhash` to one-row-per-doc input. `tokensCol` must be an
    * array<string> column. */
  def withSimhash(docs: DataFrame, idCol: String, tokensCol: Column,
                  nBits: Int = 32): DataFrame = {
    val tok = docs.select(col(idCol), explode(tokensCol).as("__tok"))
      .withColumn("__h", xxhash64(col("__tok")))
    val votes = (0 until nBits).map { i =>
      sum(when(shiftright(col("__h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"__v$i")
    }
    val agg = tok.groupBy(idCol).agg(votes.head, votes.tail: _*)
    val packed = (0 until nBits).map { i =>
      when(col(s"__v$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col(idCol), packed.as("simhash"))
  }

  /** Cluster docs sharing a simhash; `cluster_size` > 1 ⇒ near-dup set. */
  def clusters(withSim: DataFrame, idCol: String): DataFrame = {
    val counts = withSim.groupBy("simhash").agg(count(lit(1)).as("cluster_size"))
    withSim.join(counts, "simhash").select(col(idCol), col("simhash"), col("cluster_size"))
  }
}
