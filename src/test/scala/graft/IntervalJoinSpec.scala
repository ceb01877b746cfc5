package graft

import org.apache.spark.sql.functions._

import graft.operators.IntervalJoin

class IntervalJoinSpec extends GraftSuite {
  import spark.implicits._

  // Intervals crossing bucket boundaries, touching endpoints, nesting,
  // zero-length points, and same-owner pairs (to exercise `extra`).
  private val left = Seq(
    (1L, 0L, 10L), (2L, 5L, 25L), (3L, 30L, 30L), (4L, 8L, 42L), (5L, 60L, 70L))
    .toDF("a_id", "a_s", "a_e")
  private val right = Seq(
    (1L, 10L, 12L), (2L, 26L, 29L), (6L, 30L, 55L), (7L, 41L, 44L), (8L, 71L, 80L))
    .toDF("b_id", "b_s", "b_e")

  private def brute(extraSql: String): Set[(Long, Long)] =
    left.join(right, expr(s"a_s <= b_e AND b_s <= a_e AND ($extraSql)"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet

  test("bucketed overlap join equals the brute-force predicate join, any width") {
    for (w <- Seq(1L, 7L, 10L, 64L, 1000L)) {
      val got = IntervalJoin.overlap(left, "a_s", "a_e", right, "b_s", "b_e", w)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
      val want = brute("true")
      assert(got.toSet == want, s"width=$w")
      // anchor-bucket dedup: multi-bucket co-occurrence emits each pair ONCE
      assert(got.size == got.toSet.size, s"width=$w produced duplicate pairs")
    }
  }

  test("extra predicate participates in the join (cross-owner guard)") {
    val got = IntervalJoin.overlap(left, "a_s", "a_e", right, "b_s", "b_e",
        10L, extra = col("a_id") =!= col("b_id"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == brute("a_id <> b_id"))
    assert(brute("true").size > got.size, "guard must have removed same-id pairs")
  }

  test("touching closed endpoints overlap; disjoint neighbors do not") {
    val got = IntervalJoin.overlap(left, "a_s", "a_e", right, "b_s", "b_e", 10L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 1L)), "a ends exactly where b starts (10=10)")
    assert(got.contains((3L, 6L)), "zero-length point at 30 touches [30,55]")
    assert(!got.contains((1L, 2L)), "[0,10] vs [26,29] disjoint")
  }

  test("plans a hash equi-join on the bucket id, never a nested-loop pass") {
    val plan = IntervalJoin.overlap(left, "a_s", "a_e", right, "b_s", "b_e", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"interval join degenerated to a nested-loop pass:\n$plan")
  }
}
