package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the missing step
  * between near-duplicate PAIR detection (MinHash bands, SimHash Hamming
  * blocks) and actual corpus deduplication: transitive closure of the
  * pair relation groups docs into clusters, from which one canonical
  * representative survives.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). Each round
  * is two shuffles (a groupBy-min and a join) over the current edge set;
  * the edge set converges to a star per component — every node linked
  * directly to its component's minimum id — in O(log n) rounds. This is
  * the 100 TB shape: no driver-side graph, no transitive-closure blowup
  * (closure is O(n·m) rows; stars stay O(n)), each round embarrassingly
  * parallel. Result at convergence is exactly "min id per component",
  * independent of iteration order — deterministic, so it can be oracled
  * against a recursive-CTE twin on small data.
  *
  * The driver loop is control flow only (one checksum action per round);
  * per-round `localCheckpoint` truncates the join lineage that would
  * otherwise grow exponentially. Edge frames are (id, id) pairs — tiny
  * relative to the corpus — so the checkpoint blocks are cheap; the
  * previous round's blocks are explicitly released each iteration.
  */
object ConnectedComponents {

  /** (id, component) for every node appearing in `edges`, where
    * `component` is the minimum node id reachable from it. Node ids may
    * be any orderable type (long, string). Self-loops are dropped.
    * Throws if not converged within `maxIter` rounds (each round roughly
    * halves star depth; 20 covers any graph with diameter < 2^20). */
  def components(edges: DataFrame, srcCol: String = "src",
                 dstCol: String = "dst", maxIter: Int = 20): DataFrame = {
    var e = edges
      .select(least(col(srcCol), col(dstCol)).as("src"),
        greatest(col(srcCol), col(dstCol)).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    var prev: DataFrame = null
    var prevSig: (Long, Long) = checksum(e)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      val sig = checksum(next)
      if (prev != null) prev.unpersist()
      prev = e
      e = next
      converged = sig == prevSig
      prevSig = sig
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    if (prev != null) prev.unpersist()
    // Converged star edges are (root, member) in canonical least-first
    // form; add the roots themselves.
    e.select(col("dst").as("id"), col("src").as("component"))
      .union(e.select(col("src").as("id"), col("src").as("component")).distinct())
  }

  /** One row per component: (component, cluster_size). */
  def clusterSizes(comp: DataFrame): DataFrame =
    comp.groupBy("component").agg(count(lit(1)).as("cluster_size"))

  /** Large-star: every node connects its strictly-larger neighbors to the
    * minimum of its neighborhood (including itself). One groupBy-min +
    * one equi-join on the symmetrized edges. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val mins = sym.groupBy("src").agg(least(min(col("dst")), col("src")).as("m"))
    // No distinct here: smallStar dedups its output, so an extra exchange
    // per round buys nothing (duplicate edges only inflate the round's
    // own groupBy input, which map-side combine absorbs).
    sym.join(mins, "src")
      .filter(col("dst") > col("src"))
      .select(col("m").as("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
  }

  /** Small-star: every node connects its strictly-smaller neighbors (and
    * itself) to the minimum of those neighbors. Edges arrive and leave in
    * canonical least-first orientation. */
  private def smallStar(e: DataFrame): DataFrame = {
    // e is least-first: (src < dst) ⇒ group by the larger endpoint.
    val mins = e.groupBy("dst").agg(min(col("src")).as("m"))
    val relink = e.join(mins, "dst")
      .select(col("m").as("src"), col("src").as("dst"))
    val self = mins.select(col("m").as("src"), col("dst"))
    relink.union(self)
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** (count, order-independent hash fold) — one action, used as the
    * convergence signature of an edge set. `bit_xor`, not `sum`: edge
    * hashes span the full long range, so a sum overflows under ANSI
    * arithmetic; xor is overflow-free and order-independent (edges are
    * distinct, so no pair-cancellation ambiguity). */
  private def checksum(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(src, dst))")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }
}
