package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{ConnectedComponents, IncrementalCC}

/** IncrementalCC.addEdges must be row-identical to a full
  * ConnectedComponents recompute over base ∪ delta — the operator's
  * whole contract is "same answer at delta cost". Cases: component
  * merges, brand-new nodes (attached and pairwise-new), intra-component
  * no-op edges, empty-effect deltas, and a randomized split sweep. */
class IncrementalCCSpec extends GraftSuite {

  import spark.implicits._

  private def edges(pairs: Seq[(Long, Long)]): DataFrame =
    pairs.toDF("src", "dst")

  private def sortedRows(df: DataFrame): Seq[(Long, Long)] =
    df.select(col("id").cast("long"), col("component").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  private def check(base: Seq[(Long, Long)], delta: Seq[(Long, Long)]): Unit = {
    val incremental = IncrementalCC.addEdges(
      ConnectedComponents.components(edges(base)), edges(delta))
    val full = ConnectedComponents.components(edges(base ++ delta))
    assert(sortedRows(incremental) == sortedRows(full),
      s"incremental != recompute for base=$base delta=$delta")
  }

  test("delta merges two existing components") {
    check(base = Seq((1L, 2L), (3L, 4L)), delta = Seq((2L, 3L)))
  }

  test("delta attaches new nodes and creates a new pairwise component") {
    check(base = Seq((1L, 2L)), delta = Seq((2L, 10L), (20L, 21L)))
  }

  test("intra-component delta edges change nothing") {
    val base = Seq((1L, 2L), (2L, 3L))
    val assign = ConnectedComponents.components(edges(base))
    val out = IncrementalCC.addEdges(assign, edges(Seq((1L, 3L), (3L, 2L))))
    assert(sortedRows(out) == sortedRows(assign))
  }

  test("new node with a smaller id than the old root becomes the root") {
    check(base = Seq((5L, 6L)), delta = Seq((0L, 6L)))
  }

  test("chain of merges across several components in one delta") {
    check(base = Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L)),
      delta = Seq((2L, 3L), (4L, 5L), (8L, 100L)))
  }

  test("plan pin: the assignment joins broadcast the delta-sized side, never sort-merge") {
    // The operator's 100 TB contract is that the corpus-sized
    // assignment is scanned with broadcast probes and NEVER shuffled:
    // a SortMergeJoin on the assignment would re-partition the corpus
    // per delta batch.
    val base = (0L until 2000L).map(i => (i, i + 2000L))
    val delta = Seq((1L, 2001L), (5L, 9999L))
    val assign = ConnectedComponents.components(edges(base))
    val out = IncrementalCC.addEdges(assign, edges(delta))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast joins in:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"),
      s"assignment-side sort-merge join leaked into:\n${plan.take(2000)}")
  }

  test("randomized split sweep: every split of a fixed edge set agrees with recompute") {
    // deterministic pseudo-random edge set over 40 nodes
    val all = (0 until 120).map { i =>
      val a = (i * 7919L) % 40
      val b = (i * 104729L + 13) % 40
      (a, b)
    }.filter { case (a, b) => a != b }
    Seq(2, 3, 5).foreach { mod =>
      val base = all.zipWithIndex.collect { case (e, i) if i % mod != 0 => e }
      val delta = all.zipWithIndex.collect { case (e, i) if i % mod == 0 => e }
      check(base, delta)
    }
  }
}
