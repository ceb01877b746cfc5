package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling (Matula & Beck 1983; the
  * distributed-round formulation follows Batagelj & Zaveršnik 2003's
  * degree-peeling view): repeatedly delete every node whose degree in
  * the SURVIVING subgraph is below k; what remains after convergence is
  * the k-core — the standard coarse filter for "dense, well-connected"
  * regions of a document-similarity or interaction graph before more
  * expensive community/centrality passes.
  *
  * Determinism: peeling is confluent — the fixpoint is unique no matter
  * the deletion order — and synchronous whole-rounds are reproducible on
  * a cluster, so a DuckDB twin can unroll the same rounds and match
  * bit-for-bit even BEFORE convergence.
  *
  * Shape per round (the 100 TB contract): one map-side-combinable
  * degree count keyed by node, then two LEFT SEMI joins keyed by src
  * and dst; no window function, no collect, and the graph only ever
  * shrinks. The survivor set is eagerly staged per round (r15): its
  * aggregate feeds BOTH semi-joins, and the planner does not reuse the
  * exchange across the two build sides (verified: two BroadcastExchange
  * subtrees, zero ReusedExchange) — unstaged, every round computed the
  * degree count twice. Lineage is cut per round with an eager localCheckpoint
  * (house pattern of [[ConnectedComponents]] / [[LabelProp]] /
  * [[PageRank]]) so the plan stays round-sized. `rounds` is the unroll
  * knob — production callers loop with a convergence probe (count
  * stabilizes) exactly like [[ConnectedComponents.run]]; the oracled
  * query fixes rounds so both engines compute the identical prefix.
  */
object KCore {

  /** Survivors of `rounds` peel rounds at threshold k, with their final
    * degree inside the surviving subgraph. Input edges are taken as
    * undirected: symmetrized, self-loop-free, deduped here.
    */
  def core(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    val raw = edges.select(col("src"), col("dst")).filter(col("src") =!= col("dst"))
    var e = raw
      .union(raw.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      // one slim column of surviving node ids — staging beats computing
      // the degree aggregate once per consuming semi-join
      val alive = e.groupBy("src").agg(count(lit(1)).as("c"))
        .filter(col("c") >= k)
        .select(col("src"))
        .localCheckpoint(true)
      val prev = e
      e = e
        .join(alive, Seq("src"), "left_semi")
        .join(alive.select(col("src").as("dst")), Seq("dst"), "left_semi")
        .select("src", "dst")
        .localCheckpoint(true) // eager: alive + prev releasable now
      Checkpoints.release(alive)
      Checkpoints.release(prev)
    }
    e.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("id"), col("deg"))
  }
}
