package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, DataQuality, FuzzyJoin, IncrementalAgg, SnapshotDiff}

class Operators2Spec extends GraftSuite {
  import spark.implicits._

  private val quotes = Seq(
    ("k", 10L, 1.0), ("k", 20L, 2.0), ("k", 30L, 3.0)).toDF("qk", "qt", "px")

  test("asof forward picks earliest right at-or-after; equal time matches") {
    val trades = Seq(("k", 5L), ("k", 20L), ("k", 25L), ("k", 31L)).toDF("tk", "tt")
    val out = AsOfJoin.forward(trades, "tk", "tt", quotes, "qk", "qt", Seq("px"))
      .orderBy("tt").select("tt", "px").as[(Long, Option[Double])].collect().toSeq
    assert(out == Seq((5L, Some(1.0)), (20L, Some(2.0)), (25L, Some(3.0)), (31L, None)))
  }

  test("asof nearest prefers closer side, backward on exact tie, honors tolerance") {
    val trades = Seq(("k", 14L), ("k", 15L), ("k", 29L), ("k", 100L)).toDF("tk", "tt")
    val near = AsOfJoin.nearest(trades, "tk", "tt", quotes, "qk", "qt", Seq("px"))
      .orderBy("tt").select("tt", "px").as[(Long, Option[Double])].collect().toSeq
    // 14 → 10 closer than 20; 15 → equidistant, backward (10) wins; 29 → 30
    assert(near == Seq((14L, Some(1.0)), (15L, Some(1.0)), (29L, Some(3.0)), (100L, Some(3.0))))
    val tol = AsOfJoin.nearest(trades, "tk", "tt", quotes, "qk", "qt", Seq("px"),
        tolerance = Some(lit(5.0)))
      .orderBy("tt").select("tt", "px").as[(Long, Option[Double])].collect().toSeq
    assert(tol == Seq((14L, Some(1.0)), (15L, Some(1.0)), (29L, Some(3.0)), (100L, None)))
  }

  test("asof nearest plans one hash exchange (both window orderings share it)") {
    val trades = Seq(("k", 14L), ("k", 29L)).toDF("tk", "tt")
    val j = AsOfJoin.nearest(trades, "tk", "tt", quotes, "qk", "qt", Seq("px"))
    val plan = j.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"union+window must shuffle once:\n$plan")
  }

  test("data-quality suite: one pass, per-check verdicts") {
    val df = Seq((1, Some("a"), "O"), (2, None, "F"), (3, Some("c"), "X"))
      .toDF("id", "opt", "status")
    val out = DataQuality.run(df, Seq(
      DataQuality.Check("id_unique", DataQuality.uniqueness(col("id")), _ >= 1.0),
      DataQuality.Check("opt_complete", DataQuality.completeness(col("opt")), _ >= 1.0),
      DataQuality.Check("status_domain", DataQuality.domain(col("status"), Seq("O", "F")), _ >= 1.0)))
      .as[(String, Double, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("id_unique") == ((1.0, true)))
    assert(out("opt_complete")._2 == false)
    assert(math.abs(out("status_domain")._1 - 2.0 / 3.0) < 1e-15 && !out("status_domain")._2)
  }

  test("snapshot diff classifies insert/delete/update/unchanged; null transitions are updates") {
    val old = Seq((1L, Some("a")), (2L, Some("b")), (3L, None: Option[String]), (4L, Some("d")))
      .toDF("k", "v")
    val cur = Seq((1L, Some("a")), (2L, None: Option[String]), (3L, Some("c")), (5L, Some("e")))
      .toDF("k", "v")
    val out = SnapshotDiff.diff(old, cur, Seq("k"), Seq("v"))
      .select("k", "change_type").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "unchanged", 2L -> "updated", 3L -> "updated",
      4L -> "deleted", 5L -> "inserted"))
  }

  test("snapshot diff invariants: self-diff all unchanged; empty-old all inserted") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val self = SnapshotDiff.diff(df, df, Seq("k"), Seq("v"))
      .select("change_type").distinct().as[String].collect().toSeq
    assert(self == Seq("unchanged"))
    val empty = df.filter(col("k") < 0)
    val ins = SnapshotDiff.diff(empty, df, Seq("k"), Seq("v"))
      .select("change_type").distinct().as[String].collect().toSeq
    assert(ins == Seq("inserted"))
  }

  test("connected components invariants on a random-ish graph") {
    import graft.operators.ConnectedComponents
    // Deterministic pseudo-random edges: (i*7 % 40, i*13 % 40)
    val edges = (0 until 60).map(i => ((i * 7 % 40).toLong, (i * 13 % 40).toLong))
      .filter { case (a, b) => a != b }
    val m = ConnectedComponents.components(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    // component id is a member and the minimum of its own component
    assert(m.values.toSet.subsetOf(m.keySet))
    m.values.foreach(root => assert(m(root) == root))
    m.foreach { case (id, comp) => assert(comp <= id) }
    // invariant under edge reversal
    val rev = ConnectedComponents.components(
      edges.map(_.swap).toDF("src", "dst")).as[(Long, Long)].collect().toMap
    assert(rev == m)
  }

  test("asof nearest with zero tolerance keeps only exact-time matches") {
    val trades = Seq(("k", 10L), ("k", 11L)).toDF("tk", "tt")
    val out = AsOfJoin.nearest(trades, "tk", "tt", quotes, "qk", "qt", Seq("px"),
        tolerance = Some(lit(0.0)))
      .orderBy("tt").select("tt", "px").as[(Long, Option[Double])].collect().toSeq
    assert(out == Seq((10L, Some(1.0)), (11L, None)))
  }

  test("incremental agg handles group migration and group emptying") {
    // v1: g1 = {r1: 10.0, r2: 20.0}, g2 = {r3: 5.0}
    // v2: r1 moves g1→g2 with new value, r2 deleted (g1 empties), r4 inserted in g3
    val v1 = Seq((1L, "g1", 10.0), (2L, "g1", 20.0), (3L, "g2", 5.0)).toDF("k", "g", "m")
    val v2 = Seq((1L, "g2", 11.0), (3L, "g2", 5.0), (4L, "g3", 7.0)).toDF("k", "g", "m")
    val base = IncrementalAgg.sumCount(v1, Seq("g"), col("m"))
    val wide = SnapshotDiff.diffWide(v1, v2, Seq("k"), Seq("g", "m"))
    val maintained = IncrementalAgg.applyDelta(base, wide, Seq("g"), "m")
      .as[(String, Long, Long)].collect().toSet
    val recomputed = IncrementalAgg.sumCount(v2, Seq("g"), col("m"))
      .as[(String, Long, Long)].collect().toSet
    assert(maintained == recomputed)
    assert(maintained == Set(("g2", 2L, 1600L), ("g3", 1L, 700L))) // g1 gone
  }

  test("fuzzy bestMatch resolves to minimum distance with deterministic tiebreak") {
    val probe = Seq((1L, "b", "hallo"), (2L, "b", "zzz")).toDF("pid", "pb", "ps")
    val target = Seq((10L, "b", "hello"), (11L, "b", "hallo"), (12L, "b", "help"))
      .toDF("tid", "tb", "ts")
    val out = FuzzyJoin.bestMatch(probe, target, col("pb"), col("tb"),
        col("ps"), col("ts"), col("pid"), col("tid"), maxDist = 2)
      .select("pid", "tid", "edit_dist").as[(Long, Long, Int)].collect().toSeq
    assert(out == Seq((1L, 11L, 0))) // exact match beats dist-1; "zzz" unmatched
  }

  test("triangles: one per wedge closure, duplicate/directed input canonicalized") {
    import graft.operators.Triangles
    // Triangle {1,2,3}; pendant 3-4; square 5-6-7-8 (no triangle);
    // duplicate and reversed edges must not double-count.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 2L), (3L, 4L),
      (5L, 6L), (6L, 7L), (7L, 8L), (5L, 8L), (2L, 1L))
      .toDF("src", "dst")
    val r = Triangles.perNode(edges).as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // Two triangles sharing an edge: {1,2,3} + {2,3,4}
    val r2 = Triangles.perNode(
      Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(r2 == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }
}
