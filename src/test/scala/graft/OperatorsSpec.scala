package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, CarryForward, Dedup, Merge}

class OperatorsSpec extends GraftSuite {
  import spark.implicits._

  test("keepFirst keeps first under explicit order (C9 pandas parity)") {
    val df = Seq((1, "b", 2), (1, "a", 1), (2, "c", 1)).toDF("k", "v", "ord")
    val out = Dedup.keepFirst(df, Seq("k"), Seq(col("ord")))
      .orderBy("k").select("v").as[String].collect()
    assert(out.toSeq == Seq("a", "c"))
  }

  test("keepFirstAgg (min_by form) equals keepFirst (window form) on real data") {
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val keys = Seq("l_orderkey", "l_shipdate")
    val order = Seq(col("l_linenumber"), col("l_partkey"), col("l_quantity"),
      col("l_suppkey"), col("l_extendedprice"))
    val w = Dedup.keepFirst(li, keys, order).collect().map(_.toSeq).toSet
    val a = Dedup.keepFirstAgg(li, keys, order).collect().map(_.toSeq).toSet
    assert(w == a && w.nonEmpty)
  }

  test("keepFirst is idempotent") {
    val df = Seq((1, "b", 2), (1, "a", 1)).toDF("k", "v", "ord")
    val once = Dedup.keepFirst(df, Seq("k"), Seq(col("ord")))
    val twice = Dedup.keepFirst(once, Seq("k"), Seq(col("ord")))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("merge preserve: insert-only column keeps target value on match (C10 GPT cols)") {
    val target = Seq((1L, "old", "enriched")).toDF("k", "v", "gpt")
    val source = Seq((1L, "new", null: String), (2L, "ins", null: String)).toDF("k", "v", "gpt")
    val out = Merge.upsert(target, source, Seq("k"), Seq("v"), Seq("gpt"))
      .orderBy("k").as[(Long, String, Option[String])].collect()
    assert(out.toSeq == Seq((1L, "new", Some("enriched")), (2L, "ins", None)))
  }

  test("merge overwrite: update column takes source value even when NULL (R10)") {
    val target = Seq((1L, "old", "enriched")).toDF("k", "v", "gpt")
    val source = Seq((1L, "new", null: String)).toDF("k", "v", "gpt")
    val out = Merge.upsert(target, source, Seq("k"), Seq("v", "gpt"), Nil)
      .orderBy("k").as[(Long, String, Option[String])].collect()
    assert(out.toSeq == Seq((1L, "new", None)))
  }

  test("merge is idempotent: re-upserting the same batch is a no-op (re-run parity)") {
    val target = Seq((1L, "a", "g1"), (3L, "c", "g3")).toDF("k", "v", "gpt")
    val source = Seq((1L, "a2", null: String), (2L, "b", "g2")).toDF("k", "v", "gpt")
    val once = Merge.upsert(target, source, Seq("k"), Seq("v"), Seq("gpt"))
    val twice = Merge.upsert(once, source, Seq("k"), Seq("v"), Seq("gpt"))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("carry-forward: pre-summary rows stay null, later rows latch (R4)") {
    val df = Seq(
      ("a", 1, None: Option[Double]), ("a", 2, Some(100.0)),
      ("a", 3, None), ("a", 4, Some(200.0)), ("a", 5, None),
      ("b", 1, None)).toDF("acct", "idx", "bal")
    val out = CarryForward.lastNonNull(df, Seq("acct"), Seq(col("idx")), Seq("bal"))
      .orderBy("acct", "idx").select("bal_ff").as[Option[Double]].collect()
    assert(out.toSeq == Seq(None, Some(100.0), Some(100.0), Some(200.0), Some(200.0), None))
  }

  test("as-of backward: latest right ≤ left time, inclusive, null when none") {
    val left = Seq((1, 10, "e1"), (1, 20, "e2"), (1, 5, "e0"), (2, 10, "x"))
      .toDF("k", "t", "name")
    val right = Seq((1, 10, 1.0), (1, 15, 2.0), (3, 1, 9.9)).toDF("k", "t", "p")
    val out = AsOfJoin.backward(left, "k", "t", right, "k", "t", Seq("p"))
      .orderBy("name").select("name", "p").as[(String, Option[Double])].collect()
    assert(out.toSeq == Seq(
      ("e0", None),          // before any right row
      ("e1", Some(1.0)),     // equal timestamps match (<=)
      ("e2", Some(2.0)),     // latest preceding
      ("x", None)))          // key with no right rows
  }

  test("label propagation: deterministic min-label tie-break, synchronous rounds") {
    // two triangles bridged by one edge; labels hand-computed for 2
    // synchronous rounds with most-frequent/min-label-on-tie semantics
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 4L), (3L, 4L), (4L, 3L)) // dupes + reverse collapse to one edge
      .toDF("src", "dst")
    val out = graft.operators.LabelProp.propagate(edges, iters = 2)
      .orderBy("id").as[(Long, Long)].collect()
    assert(out.toSeq == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 3L, 6L -> 3L))
    // self-loops must not vote
    val loop = Seq((1L, 1L), (1L, 2L)).toDF("src", "dst")
    val l = graft.operators.LabelProp.propagate(loop, iters = 1)
      .orderBy("id").as[(Long, Long)].collect()
    assert(l.toSeq == Seq(1L -> 2L, 2L -> 1L))
  }
}
