package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.functions.Cleansing._
import graft.operators.{AsOfJoin, Merge}
import graft.sources.SkipRowsCsv

/** Edge cases beyond the happy paths: simultaneous events, degenerate
  * files, invalid calendar dates, multi-column keys. */
class RobustnessSpec extends GraftSuite {
  import spark.implicits._

  test("as-of: multiple right rows at identical (key, time) — tiebreak wins") {
    val left = Seq((1, 10)).toDF("k", "t")
    val right = Seq((1, 10, 101L, "a"), (1, 10, 103L, "c"), (1, 10, 102L, "b"))
      .toDF("k", "t", "seq", "v")
    val out = AsOfJoin.backward(left, "k", "t", right, "k", "t",
      rightPayload = Seq("v"), rightTieBreak = Seq("seq"))
      .select("v").as[String].head()
    assert(out == "c") // highest tiebreak = last in window order
  }

  test("as-of: simultaneous left rows all see the same state") {
    val left = Seq((1, 10, "x"), (1, 10, "y")).toDF("k", "t", "name")
    val right = Seq((1, 9, 1.5)).toDF("k", "t", "p")
    val out = AsOfJoin.backward(left, "k", "t", right, "k", "t", Seq("p"))
      .select("p").as[Double].collect().toSeq
    assert(out == Seq(1.5, 1.5))
  }

  test("merge: multi-column keys match as a tuple, not independently") {
    val target = Seq((1L, "A", "old"), (1L, "B", "keep")).toDF("k1", "k2", "v")
    val source = Seq((1L, "A", "new"), (2L, "A", "ins")).toDF("k1", "k2", "v")
    val out = Merge.upsert(target, source, Seq("k1", "k2"), Seq("v"), Nil)
      .orderBy("k1", "k2").as[(Long, String, String)].collect().toSeq
    assert(out == Seq((1L, "A", "new"), (1L, "B", "keep"), (2L, "A", "ins")))
  }

  test("parseFeedTs: valid day name but impossible calendar date → null") {
    val r = Seq("Mon 32 Jan 2020 00:00:00", "Mon 29 Feb 2021 00:00:00")
      .toDF("x").select(parseFeedTs($"x")).as[Option[java.sql.Timestamp]].collect()
    assert(r.forall(_.isEmpty))
  }

  test("toPct: negative and fractional percent strings") {
    val r = Seq("-5%", "0.5%", "-12").toDF("x")
      .select(toPct($"x")).as[Option[Double]].collect()
    assert(r.toSeq == Seq(Some(-0.05), Some(0.005), Some(-12.0)))
  }

  test("SkipRowsCsv: preamble+header-only file yields zero rows, no crash") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_csv")
    java.nio.file.Files.writeString(dir.resolve("acct_0.csv"),
      "title\nTicket,Lots\n")
    java.nio.file.Files.writeString(dir.resolve("acct_1.csv"),
      "title\nTicket,Lots\n7,1.5\n")
    val schema = StructType(Seq(StructField("Ticket", StringType),
      StructField("Lots", StringType)))
    val out = SkipRowsCsv.read(spark, dir.toString + "/*.csv", schema)
    assert(out.count() == 1)
    assert(out.select("Ticket").as[String].head() == "7")
  }

  test("audit observation: metrics collected in the job's own pass") {
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("c")))
      .toDF("k", "v")
    val (observed, obs) = graft.operators.Audit.observed(df, "ingest",
      nullChecked = Seq("v"),
      extra = Seq(sum(col("k")).as("sum_k")))
    assert(observed.count() == 3)
    val m = obs.get
    assert(m("rows") == 3L && m("null_v") == 1L && m("sum_k") == 6L)
  }

  test("keep-first dedup: fully identical duplicate rows collapse to one") {
    val df = Seq((1, "same", 5), (1, "same", 5), (2, "x", 1)).toDF("k", "v", "ord")
    val out = graft.operators.Dedup.keepFirst(df, Seq("k"),
      Seq(col("ord"), col("v")))
    assert(out.count() == 2)
  }

  test("minhash mega-bucket star pairing: linear pairs, cluster stays connected") {
    import graft.operators.MinHashDedup
    // 200 identical boilerplate docs → every band bucket has width 200;
    // uncapped, the band self-join squares to ~19,900 candidate pairs in
    // one reducer. Over the width cap (64) the bucket degrades to star
    // pairing — each member pairs only with the min-id representative —
    // so the candidate count is linear (199 pairs, all anchored at doc 0)
    // and transitive clustering still connects the whole cluster, while
    // the two genuine near-dup docs (unique text, width-2 bucket) pair up
    // through the normal self-join path.
    val boiler = (0 until 200).map(i =>
      (i.toLong, "subscribe to our newsletter terms and conditions apply all rights reserved"))
    val realA = (1000L, "the quick brown fox jumps over the lazy dog near the river bank today")
    val realB = (1001L, "the quick brown fox jumps over the lazy dog near the river bank")
    val docs = (boiler :+ realA :+ realB).toDF("doc_id", "text")
    val pairs = MinHashDedup.nearDuplicates(docs, "doc_id",
        graft.functions.TextFns.normalizeText(col("text")), threshold = 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = (1L until 200L).map(i => (0L, i)).toSet + ((1000L, 1001L))
    assert(pairs == expected,
      s"expected 199 star pairs + the genuine pair, got ${pairs.size} pairs")
  }
}
