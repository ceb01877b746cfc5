package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Cleansing._
import graft.operators.{Dedup, GapFill, Merge}

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

  test("gap-fill invariants on sparse generated series: contiguous, non-null, gap-transparent") {
    (0 until 3).foreach { i =>
      // sparse observations: (key, random day-of-2024, value)
      val obs = sample(Gen.listOfN(40,
        Gen.zip(Gen.chooseNum(1, 3), Gen.chooseNum(0, 60), Gen.chooseNum(1L, 999L))), 30L + i)
        .distinctBy(t => (t._1, t._2))
      val df = obs.map { case (k, d, v) =>
        (k.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 12:00:00").toLocalDateTime
          .plusDays(d).toString.replace("T", " ") + ":00", v)
      }.toDF("k", "tss", "v")
        .select($"k", to_timestamp($"tss").as("ts"), $"v")
      val out = GapFill.dailyFfill(df, "k", "ts", col("v"), Seq(col("v")))
        .orderBy("k", "day")
        .as[(Long, java.sql.Date, Long)].collect().toSeq
      // 1) every value non-null (first spine day always has an observation)
      assert(out.forall(_._3 > 0))
      out.groupBy(_._1).foreach { case (_, rows) =>
        val days = rows.map(_._2.toLocalDate.toEpochDay)
        // 2) spine is contiguous: consecutive day numbers, span = count
        assert(days.zip(days.tail).forall { case (a, b) => b == a + 1 })
        // 3) gap days repeat the last observed value: the set of distinct
        //    values equals the set of observed values for that key
        val observed = obs.filter(_._1.toLong == rows.head._1).map(_._3).toSet
        assert(rows.map(_._3).toSet.subsetOf(observed))
      }
    }
  }

  test("funnel step timestamps are strictly ordered whenever present") {
    val f = graft.queries.RelQueries6.funnel(spark, "/root/testdata/sf0.001")
      .as[(Long, java.sql.Timestamp, Option[java.sql.Timestamp], Option[java.sql.Timestamp], Int)]
      .collect()
    assert(f.nonEmpty)
    f.foreach { case (_, v, c, p, steps) =>
      c.foreach(ct => assert(ct.after(v)))
      (c, p) match {
        case (Some(ct), Some(pt)) => assert(pt.after(ct))
        case (None, Some(_)) => fail("purchase without click")
        case _ =>
      }
      assert(steps == 1 + c.size + p.size)
    }
  }

  test("ewma stays within the running window's min/max bounds") {
    val e = graft.queries.RelQueries6.ewma(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double, Double)].collect()
    assert(e.nonEmpty)
    // global bounds suffice as a sanity envelope: a weighted mean of
    // window values can never escape the global value range
    val (lo, hi) = (e.map(_._3).min, e.map(_._3).max)
    e.foreach { case (_, _, _, w) => assert(w >= lo - 1e-9 && w <= hi + 1e-9) }
  }
}
