package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hop-bounded single-source shortest paths over a WEIGHTED edge list —
  * Bellman–Ford rounds (each round is one min-plus relaxation), the
  * weighted sibling of [[Bfs]].
  *
  * Each round relaxes only out of the frontier (nodes whose distance
  * improved last round — the SPFA refinement): if a node's label didn't
  * change, every relaxation out of it already happened, so re-relaxing
  * adds nothing. Work per round is one shuffle keyed by node id
  * (edges ⋈ frontier → per-target min, then a full-outer merge with the
  * label table), lineage cut per round with an eager localCheckpoint.
  * After round k the label table holds the exact minimum weight over
  * all walks of ≤ k edges — the invariant the DuckDB recursive-CTE twin
  * states directly by enumerating the same bounded walk set.
  *
  * At 100 TB: the frontier shrinks geometrically on real graphs; the
  * edge table is scanned per round but never reshaped, so a bucketed
  * edge layout joins without a per-round edge shuffle. The hop cap
  * bounds both engines and makes the result well-defined regardless of
  * graph diameter.
  */
object Sssp {

  /** @param edges   (src, dst, w) weighted edge list, treated as
    *                undirected; self-loops dropped, parallel edges
    *                collapsed to their minimum weight
    * @param source  start node id
    * @param maxHops inclusive cap on walk length (edge count)
    * @return (id, dist) — minimum total weight over walks of ≤ maxHops
    *         edges from `source`, for every node so reachable
    */
  def bounded(edges: DataFrame, source: Long, maxHops: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val d = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
    val e = d.union(d.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(min("w").as("w"))
      .localCheckpoint(true)
    var dist = Seq((source, 0L)).toDF("id", "dist").localCheckpoint(true)
    var frontier = dist
    var k = 1
    while (k <= maxHops && !frontier.isEmpty) {
      val cand = e.join(frontier
          .withColumnRenamed("id", "src").withColumnRenamed("dist", "fd"), "src")
        .select(col("dst").as("id"), (col("fd") + col("w")).as("nd"))
        .groupBy("id").agg(min("nd").as("nd"))
      val merged = dist.as("l").join(cand.as("c"), Seq("id"), "full_outer")
        .select(col("id"),
          least(col("l.dist"), col("c.nd")).as("dist"),
          (col("c.nd").isNotNull &&
            (col("l.dist").isNull || col("c.nd") < col("l.dist"))).as("improved"))
        .localCheckpoint(true)
      frontier = merged.filter(col("improved")).select("id", "dist")
      dist = merged.select("id", "dist")
      k += 1
    }
    dist
  }
}
