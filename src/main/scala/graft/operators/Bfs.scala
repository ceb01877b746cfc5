package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-source BFS shortest paths (minimum hop counts) by frontier
  * expansion — the iterative-graph sibling of [[PageRank]] /
  * [[LabelProp]] / [[ConnectedComponents]].
  *
  * Each round the current frontier's unvisited neighbors become the
  * next frontier at distance k. Work per round is one shuffle keyed by
  * node id (edges ⋈ frontier, then distinct) and one anti-join against
  * the settled set — both hash-partitioned on the same key, so AQE
  * reuses the exchange. The settled set only ever grows by the new
  * frontier (union, no rewrite), and lineage is cut per round with an
  * eager localCheckpoint so the plan stays round-sized regardless of
  * graph diameter. The loop stops at an empty frontier (one driver-side
  * isEmpty probe per round, same pattern as [[ConnectedComponents]]'s
  * convergence check) or after `maxHops` rounds — the cap that lets a
  * DuckDB recursive-CTE twin bound its walk set and makes the result
  * well-defined on graphs whose far reaches don't matter.
  *
  * At 100 TB the frontier is at most node-set-sized and usually far
  * smaller; the expensive side (edges) is scanned per round but never
  * reshaped, so a pre-partitioned/bucketed edge table joins with no
  * per-round edge shuffle.
  */
object Bfs {

  /** @param edges   (src, dst) edge list, treated as undirected;
    *                self-loops dropped, duplicates deduped
    * @param source  start node id
    * @param maxHops inclusive cap on path length explored
    * @return (id, hops) — minimum hop count from `source` for every
    *         node reachable within `maxHops` hops (source itself at 0)
    */
  def hops(edges: DataFrame, source: Long, maxHops: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val d = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val e = d.union(d.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct().localCheckpoint(true)
    var settled = Seq((source, 0L)).toDF("id", "hops").localCheckpoint(true)
    var frontier = settled.select("id")
    var prevNext: DataFrame = null
    var k = 1
    while (k <= maxHops && !frontier.isEmpty) {
      val next = e.join(frontier.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id")).distinct()
        .join(settled, Seq("id"), "left_anti")
        .select(col("id"), lit(k.toLong).as("hops"))
        .localCheckpoint(true)
      val prevSettled = settled
      settled = settled.union(next).localCheckpoint(true)
      // both eager checkpoints above are materialized, so the previous
      // round's frames have no remaining readers — release for real
      // (r16: Dataset.unpersist was a no-op on checkpoints; unreleased,
      // a deep BFS pins every round's cumulative settled frame)
      Checkpoints.release(prevSettled)
      if (prevNext != null) Checkpoints.release(prevNext)
      frontier = next.select("id")
      prevNext = next
      k += 1
    }
    if (prevNext != null) Checkpoints.release(prevNext)
    Checkpoints.release(e) // settled is a checkpoint at every exit path
    settled
  }
}
