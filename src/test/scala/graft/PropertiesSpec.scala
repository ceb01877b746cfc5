package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Cleansing._
import graft.operators.{Dedup, Merge}

/** Property tests (SURVEY §5.2 item 3) — driver-level invariants the
  * reference relies on operationally (idempotent re-runs). Raw ScalaCheck
  * generators with a fixed seed (no scalatestplus bridge in the offline
  * cache); samples are batched into single Spark jobs.
  */
class PropertiesSpec extends GraftSuite {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("toPct on generated percent strings: 'n%' == n/100") {
    val ns = sample(Gen.listOfN(200, Gen.chooseNum(-10000, 10000)), 1L)
    val got = ns.map(n => s"$n%").toDF("x").select(toPct($"x")).as[Double].collect()
    assert(got.toSeq == ns.map(_ / 100.0))
  }

  test("feed timestamp format→parse round-trip at second resolution") {
    val secs = sample(Gen.listOfN(200, Gen.chooseNum(0L, 4102444800L)), 2L)
    val pairs = secs.toDF("s")
      .select(isoFormat(parseFeedTs(date_format(timestamp_seconds($"s"), FeedTsFmt))).as("got"),
        isoFormat(timestamp_seconds($"s")).as("want"))
      .as[(String, String)].collect()
    pairs.foreach { case (got, want) => assert(got == want) }
  }

  test("dedup idempotence on random multisets: f(f(x)) == f(x)") {
    (0 until 3).foreach { i =>
      val rows = sample(Gen.listOfN(60, Gen.zip(Gen.chooseNum(0, 9), Gen.chooseNum(0, 99))), 3L + i)
      val df = rows.toDF("k", "ord")
      val once = Dedup.keepFirst(df, Seq("k"), Seq(col("ord"), col("k")))
      val twice = Dedup.keepFirst(once, Seq("k"), Seq(col("ord"), col("k")))
      assert(once.collect().map(_.toSeq).sortBy(_.toString()).toSeq ==
        twice.collect().map(_.toSeq).sortBy(_.toString()).toSeq)
    }
  }

  test("merge idempotence: applying the same source twice == once") {
    (0 until 3).foreach { i =>
      val kv = Gen.zip(Gen.chooseNum(0L, 30L), Gen.oneOf("a", "b", "c", "d"))
      val t = sample(Gen.listOfN(20, kv), 10L + i).distinctBy(_._1)
      val s = sample(Gen.listOfN(20, kv), 20L + i).distinctBy(_._1)
      val once = Merge.upsert(t.toDF("k", "v"), s.toDF("k", "v"), Seq("k"), Seq("v"), Nil)
      val twice = Merge.upsert(once, s.toDF("k", "v"), Seq("k"), Seq("v"), Nil)
      assert(once.collect().map(_.toSeq).toSet == twice.collect().map(_.toSeq).toSet)
    }
  }
}
