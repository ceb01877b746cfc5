package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an edge list — the graph-side
  * quality signal for corpus neighborhood structure (a kNN graph's
  * triangle density is its local clustering), complementing
  * `ConnectedComponents` (reachability) and `PageRank` (centrality).
  * Reference behavior: fxblue-etl has no graph surface; this extends
  * the SURVEY §2.4 analytics family.
  *
  * Algorithm: degree-ordered edge orientation (Suri & Vassilvitskii,
  * WWW'11 "Counting Triangles and the Curse of the Last Reducer").
  * Orient every undirected edge from its lower-(degree, id) endpoint to
  * the higher one — an acyclic total order. Every triangle then has
  * exactly one node with two out-edges, so enumerating wedges (pairs of
  * out-neighbors) and closing them against the edge set counts each
  * triangle exactly once. The orientation is the scale insight: a
  * node's OUT-degree under this order is O(√m) even if its raw degree
  * is huge (a celebrity node's edges all point INTO it), so the wedge
  * self-join — the quadratic step — is bounded per node by √m, never by
  * the hub's full neighborhood. Total wedges ≤ O(m^1.5), the provably
  * optimal bound for exact counting.
  *
  * Shapes: two groupBy-count shuffles (degrees), two equi-joins to
  * attach degrees, one self-equi-join on the wedge apex, one semi-join
  * closure. No driver-side graph, no windows, everything codegen'd.
  */
object Triangles {

  /** (node, n_tri): triangle participation count per node — only nodes
    * in ≥ 1 triangle appear. Input edges may be directed/duplicated;
    * they are canonicalized (least-first, self-loops dropped, distinct).
    * The canonical edge list feeds three consumers (degrees, orientation,
    * closure), so it is materialized once — it is id pairs, tiny
    * relative to any corpus the graph was derived from. */
  def perNode(edges: DataFrame, srcCol: String = "src",
              dstCol: String = "dst"): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    val deg = und.select(col("u").as("n")).union(und.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
    val fwd = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    val oriented = withDeg.select(
      when(fwd, col("u")).otherwise(col("v")).as("a"),
      when(fwd, col("v")).otherwise(col("u")).as("b"))
    // Wedge = two out-edges of one apex; (u, v) kept least-first so the
    // closure is a direct semi-join against the canonical edge list.
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.a") === col("y.a") && col("x.b") < col("y.b"))
      .select(col("x.a").as("w0"), col("x.b").as("u"), col("y.b").as("v"))
    val tri = wedges.join(und, Seq("u", "v"), "left_semi")
    tri.select(explode(array(col("w0"), col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
  }
}
