package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.PrefixSum

class PrefixSumSpec extends GraftSuite {

  test("runningSum matches the single-partition window on a total order") {
    import spark.implicits._
    // Deterministic scramble: values arrive in md5 order, keys 0..999.
    val df = (0 until 1000).map(i => (i.toLong, (i % 37 + 1).toLong))
      .toDF("k", "v")
      .orderBy(md5(col("k").cast("string")))
    val expected = df
      .withColumn("cum", coalesce(sum("v").over(
        Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("k", "cum").as[(Long, Long)].collect().toMap
    val got = PrefixSum.runningSum(df, col("k"), Seq(col("k")), col("v"), "cum")
      .select("k", "cum").as[(Long, Long)].collect().toMap
    assert(got === expected)
    // Inclusive form shifts by exactly the row's own value.
    val incl = PrefixSum.runningSum(df, col("k"), Seq(col("k")), col("v"), "cum",
        inclusive = true)
      .select("k", "cum").as[(Long, Long)].collect().toMap
    assert(incl === expected.map { case (k, c) => k -> (c + (k % 37 + 1)) })
  }

  test("rank matches row_number under bucket-key ties broken by a second column") {
    import spark.implicits._
    // Many ties on the bucket key (only 5 distinct) — percentile cut
    // points MUST not split equal keys across buckets, or exclusive
    // counts go nondeterministic. The tiebreak column completes the
    // total order.
    val df = (0 until 500).map(i => (i.toLong % 5, s"s${i / 5}%03d-$i"))
      .toDF("b", "s")
    val expected = df
      .withColumn("rn", row_number().over(Window.orderBy(col("b"), col("s"))))
      .select("s", "rn").as[(String, Int)].collect().toMap
    val got = PrefixSum.rank(df, col("b"), Seq(col("b"), col("s")), "rn")
      .select("s", "rn").as[(String, Long)].collect().toMap
    assert(got === expected.map { case (k, v) => k -> v.toLong })
  }

  test("keepBucket: equal keys share the exposed bucket; fused group window needs no shuffle") {
    import spark.implicits._
    val df = (0 until 400).map(i => (i.toLong % 20, i.toLong)).toDF("k", "v")
    val r = PrefixSum.rank(df, col("k"), Seq(col("k"), col("v")), "rn",
      keepBucket = Some("bkt"))
    // Rows equal on the bucket key never straddle buckets — the
    // contract that lets a (bucket, key...) window fuse shuffle-free.
    val perKey = r.groupBy("k").agg(countDistinct(col("bkt")).as("nb"))
      .as[(Long, Long)].collect()
    perKey.foreach { case (k, nb) => assert(nb === 1L, s"key $k straddles buckets") }
    // The fused min-per-group window over (bkt, k) adds no Exchange
    // beyond the rank pass's own: group-min == global min(rn) per key.
    val fused = r.withColumn("mn",
      min(col("rn")).over(Window.partitionBy(col("bkt"), col("k"))))
    val exchanges = fused.queryExecution.executedPlan.toString()
      .split('\n').count(_.contains("Exchange"))
    val plain = r.queryExecution.executedPlan.toString()
      .split('\n').count(_.contains("Exchange"))
    assert(exchanges === plain,
      s"fused window added a shuffle ($plain -> $exchanges)")
    val wantMin = r.groupBy("k").agg(min("rn").as("want")).as[(Long, Long)]
      .collect().toMap
    fused.select("k", "mn").as[(Long, Long)].collect()
      .foreach { case (k, mn) => assert(mn === wantMin(k)) }
    // Default path drops the internal column entirely.
    assert(!PrefixSum.rank(df, col("k"), Seq(col("k"), col("v")), "rn")
      .columns.contains("bkt"))
  }

  test("ntileExpr matches SQL NTILE for every (n, k) boundary shape") {
    import spark.implicits._
    // Sweep sizes around every divisibility boundary of several k —
    // the bucket-boundary arithmetic is exactly what could drift from
    // the window function's definition.
    for (n <- (1L to 17L) ++ Seq(100L, 101L, 103L); k <- Seq(1L, 2L, 4L, 7L)) {
      val df = (1L to n).toDF("rk")
      val expected = df
        .withColumn("b", ntile(k.toInt).over(Window.orderBy("rk")).cast("long"))
        .select("rk", "b").as[(Long, Long)].collect().toMap
      val got = df
        .withColumn("b", PrefixSum.ntileExpr(col("rk"), n, k).cast("long"))
        .select("rk", "b").as[(Long, Long)].collect().toMap
      assert(got === expected, s"ntileExpr diverges at n=$n k=$k")
    }
  }

  test("selectRanks picks exactly the rows a full global sort would") {
    import spark.implicits._
    val df = (0 until 1000).map(i => ((i * 37) % 1000).toLong).toDF("k")
      .orderBy(md5(col("k").cast("string"))) // scrambled arrival order
    val sorted = df.orderBy("k").as[Long].collect()
    val want = Seq("first" -> 1L, "mid" -> 500L, "shared_a" -> 501L,
      "last" -> 1000L)
    val got = PrefixSum.selectRanks(df, col("k"), Seq(col("k")),
        n => { assert(n === 1000L); want }, "lbl")
      .select("lbl", "k").as[(String, Long)].collect().toMap
    assert(got === want.map { case (l, r) => l -> sorted((r - 1).toInt) }.toMap)
    // stable = true (re-scan instead of checkpoint) picks identically on
    // a deterministic source, and an empty target set selects nothing.
    val gotStable = PrefixSum.selectRanks(df, col("k"), Seq(col("k")),
        _ => want, "lbl", stable = true)
      .select("lbl", "k").as[(String, Long)].collect().toMap
    assert(gotStable === got)
    assert(PrefixSum.selectRanks(df, col("k"), Seq(col("k")),
      _ => Seq.empty, "lbl").count() === 0L)
    // Distinct labels landing on the SAME rank each get their row.
    val dup = PrefixSum.selectRanks(df, col("k"), Seq(col("k")),
        _ => Seq("a" -> 7L, "b" -> 7L), "lbl")
      .select("lbl", "k").as[(String, Long)].collect().toMap
    assert(dup === Map("a" -> sorted(6), "b" -> sorted(6)))
    // Empty input with ⌈p·0⌉-style targets selects nothing (no throw).
    val empty = df.filter(lit(false))
    assert(PrefixSum.selectRanks(empty, col("k"), Seq(col("k")),
      n => Seq("p50" -> (n + 1) / 2), "lbl").count() === 0L)
    // And the selection's plan contains no empty-partitionSpec window.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val plan = PrefixSum.selectRanks(df, col("k"), Seq(col("k")),
      _ => Seq("x" -> 1L), "lbl").queryExecution.optimizedPlan
    assert(plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }.isEmpty)
  }

  test("selectWeighted: crossing rows match a driver-side scan; weight 1 = selectRanks") {
    import spark.implicits._
    val rows = (0 until 500).map(i => (((i * 41) % 500).toLong, (i % 7 + 1).toLong))
    val df = rows.toDF("k", "w").orderBy(md5(col("k").cast("string")))
    // Driver-side truth: sort by k, walk cumulative weight.
    val sorted = rows.sortBy(_._1)
    val total = sorted.map(_._2).sum
    def crossing(t: Long): Long = {
      var cum = 0L
      sorted.find { case (_, w) => cum += w; cum >= t }.get._1
    }
    val want = Seq("a" -> total / 3, "b" -> (total + 1) / 2, "c" -> total)
    val got = PrefixSum.selectWeighted(df, col("k"), Seq(col("k")), col("w"),
        tw => { assert(tw === total); want }, "lbl")
      .select("lbl", "k").as[(String, Long)].collect().toMap
    assert(got === want.map { case (l, t) => l -> crossing(t) }.toMap)
    // weight ≡ 1 degenerates to selectRanks.
    val byRank = PrefixSum.selectRanks(df, col("k"), Seq(col("k")),
        _ => Seq("r" -> 123L), "lbl")
      .select("k").as[Long].collect().toSeq
    val byWeight = PrefixSum.selectWeighted(df, col("k"), Seq(col("k")), lit(1L),
        _ => Seq("r" -> 123L), "lbl")
      .select("k").as[Long].collect().toSeq
    assert(byRank === byWeight)
  }

  test("no single-partition window in the plan") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, 1L)).toDF("k", "v")
    val plan = PrefixSum.runningSum(df, col("k"), Seq(col("k")), col("v"), "cum")
      .queryExecution.optimizedPlan
    val bad = plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
    assert(bad.isEmpty, "PrefixSum itself reintroduced a global window")
  }
}
