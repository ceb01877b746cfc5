package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{ConnectedComponents, IncrementalCC}

/** IncrementalCC.removeEdges must be row-identical to a full
  * ConnectedComponents recompute over `edges ∖ deletes` — retraction at
  * delta cost, including the cases addEdges can never produce:
  * components SPLITTING and nodes DROPPING OUT when their last edge
  * goes. Cases: splits, last-edge drops, whole-component removal,
  * untouched pass-through, orientation-insensitive deletes, deletes of
  * absent edges, and a randomized delete sweep (the IncrementalCCSpec
  * template, VERDICT r16 #2). */
class DecrementalCCSpec extends GraftSuite {

  import spark.implicits._

  private def edges(pairs: Seq[(Long, Long)]): DataFrame =
    pairs.toDF("src", "dst")

  private def sortedRows(df: DataFrame): Seq[(Long, Long)] =
    df.select(col("id").cast("long"), col("component").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  private def canon(e: (Long, Long)): (Long, Long) =
    (math.min(e._1, e._2), math.max(e._1, e._2))

  private def check(base: Seq[(Long, Long)], deletes: Seq[(Long, Long)]): Unit = {
    val assign = ConnectedComponents.components(edges(base))
    val dec = IncrementalCC.removeEdges(assign, edges(base), edges(deletes))
    val kept = base.map(canon).distinct
      .filterNot(deletes.map(canon).toSet)
      .filter(e => e._1 != e._2)
    val full = ConnectedComponents.components(edges(kept))
    assert(sortedRows(dec) == sortedRows(full),
      s"decremental != recompute for base=$base deletes=$deletes")
  }

  test("deleting a bridge splits one component into two") {
    check(base = Seq((1L, 2L), (2L, 3L), (3L, 4L)), deletes = Seq((2L, 3L)))
  }

  test("a node that loses its last edge drops out of the assignment") {
    check(base = Seq((1L, 2L), (2L, 3L)), deletes = Seq((1L, 2L)))
  }

  test("deleting every edge of a component removes it entirely") {
    check(base = Seq((1L, 2L), (2L, 3L), (10L, 11L)),
      deletes = Seq((1L, 2L), (2L, 3L)))
  }

  test("untouched components pass through unchanged") {
    val base = Seq((1L, 2L), (10L, 11L), (11L, 12L), (20L, 21L))
    val assign = ConnectedComponents.components(edges(base))
    val out = IncrementalCC.removeEdges(assign, edges(base), edges(Seq((1L, 2L))))
    val expect = sortedRows(assign).filterNot { case (id, _) => id == 1L || id == 2L }
    assert(sortedRows(out) == expect)
  }

  test("deletes are orientation-insensitive") {
    check(base = Seq((1L, 2L), (2L, 3L)), deletes = Seq((3L, 2L)))
  }

  test("deleting an edge that was never present changes nothing") {
    val base = Seq((1L, 2L), (2L, 3L))
    val assign = ConnectedComponents.components(edges(base))
    val out = IncrementalCC.removeEdges(assign, edges(base), edges(Seq((7L, 8L))))
    assert(sortedRows(out) == sortedRows(assign))
  }

  test("redundant edge: deletion keeps the component connected via the other path") {
    // triangle: removing one side leaves the component intact
    check(base = Seq((1L, 2L), (2L, 3L), (1L, 3L)), deletes = Seq((1L, 3L)))
  }

  test("plan pin: assignment and edge scans take broadcast probes, never sort-merge") {
    // removeEdges' 100 TB contract: the corpus-sized assignment and edge
    // set are scanned with broadcast semi/anti probes and never
    // shuffled; the only recompute is the touched components' induced
    // subgraph (behind a checkpoint in the final plan).
    val base = (0L until 2000L).map(i => (i, i + 2000L)) ++
      Seq((1L, 3L), (3L, 5L))
    val assign = ConnectedComponents.components(edges(base))
    val out = IncrementalCC.removeEdges(assign, edges(base), edges(Seq((3L, 5L))))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast joins in:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"),
      s"assignment-side sort-merge join leaked into:\n${plan.take(2000)}")
  }

  test("giant-component gate: past the cap the members probe drops its broadcast hint; rows unchanged") {
    // VERDICT r17 finding 1: `members` is the only probe frame not
    // bounded by the delete batch — one giant component makes it
    // corpus-sized, and a FORCED broadcast then dies with driver OOM
    // instead of degrading. Past graft.cc.membersBroadcastCap the hint
    // is dropped (the planner may still broadcast if runtime stats
    // allow — the gate removes only the unconditional force).
    val base = (1L until 40L).map(i => (i, i + 1)) // one 40-node giant chain
    val assign = ConnectedComponents.components(edges(base))
    val del = edges(Seq((20L, 21L))).select(
      least(col("src"), col("dst")).as("src"),
      greatest(col("src"), col("dst")).as("dst"))
    val members = assign.select("id")
    def hintCount(cap: String): Long = {
      val prev = spark.conf.getOption(IncrementalCC.MembersBroadcastCapKey)
      spark.conf.set(IncrementalCC.MembersBroadcastCapKey, cap)
      try {
        val induced = IncrementalCC.inducedSurviving(
          edges(base), del, members, memberRows = 40L)
        "rightHint=\\(strategy=broadcast\\)".r
          .findAllIn(induced.queryExecution.optimizedPlan.toString).size
      } finally {
        prev match {
          case Some(v) => spark.conf.set(IncrementalCC.MembersBroadcastCapKey, v)
          case None => spark.conf.unset(IncrementalCC.MembersBroadcastCapKey)
        }
      }
    }
    // default cap: members semi-join AND del anti-join both hinted;
    // cap 0: only the (delete-sized) del anti-join keeps its hint
    assert(hintCount("5000000") == 2)
    assert(hintCount("0") == 1)

    // end-to-end through removeEdges with the gate triggered: the
    // shuffle fallback must still land exactly on the full recompute
    val prev = spark.conf.getOption(IncrementalCC.MembersBroadcastCapKey)
    spark.conf.set(IncrementalCC.MembersBroadcastCapKey, "0")
    try check(base, deletes = Seq((20L, 21L)))
    finally prev match {
      case Some(v) => spark.conf.set(IncrementalCC.MembersBroadcastCapKey, v)
      case None => spark.conf.unset(IncrementalCC.MembersBroadcastCapKey)
    }
  }

  test("streamed retractions: per-batch eager folds carry state and land on the one-shot result") {
    import graft.operators.Checkpoints
    // chain 1-2-3-4 plus an untouched chain; batch 1 splits the long
    // chain, batch 2 deletes the split-off pair's last edge so both its
    // nodes drop — each fold probing the PREVIOUS fold's assignment and
    // the current (post-takedown) edge set, q_stream_decremental_cc's
    // exact loop shape.
    val base = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L))
    var assign = ConnectedComponents.componentsEager(edges(base))
    var removed = Set.empty[(Long, Long)]
    val batches = Seq(Seq((2L, 3L)), Seq((3L, 4L)))
    batches.zipWithIndex.foreach { case (d, i) =>
      val current = edges(base.filterNot(removed))
      val next = IncrementalCC.removeEdgesEager(assign, current, edges(d))
      Checkpoints.release(assign)
      assign = next
      removed ++= d
      if (i == 0)
        assert(sortedRows(assign) == Seq((1L, 1L), (2L, 1L), (3L, 3L),
          (4L, 3L), (10L, 10L), (11L, 10L), (12L, 10L)))
    }
    assert(sortedRows(assign) ==
      Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L), (12L, 10L)))
    Checkpoints.release(assign)
  }

  test("randomized delete sweep: every delete slice of a fixed edge set agrees with recompute") {
    // deterministic pseudo-random edge set over 40 nodes — sparse enough
    // (60 edges pre-dedup) that slices genuinely split components
    val all = (0 until 60).map { i =>
      val a = (i * 7919L) % 40
      val b = (i * 104729L + 13) % 40
      (a, b)
    }.filter { case (a, b) => a != b }
    Seq(2, 3, 5).foreach { mod =>
      val deletes = all.zipWithIndex.collect { case (e, i) if i % mod == 0 => e }
      check(all, deletes)
    }
  }
}
