package graft

import org.apache.spark.sql.functions._

import graft.queries.{LlmQueries, LlmQueries13}

class LlmQueries13Spec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"

  test("q_exact_quantiles: distributed selection equals a driver-side sort") {
    val cents = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(round(col("l_extendedprice") * 100).cast("long").as("c"))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length.toLong
    def at(num: Long, den: Long): Double =
      cents(((n * num + den - 1) / den - 1).toInt) / 100.0
    val expected = Map("p25" -> at(1, 4), "p50" -> at(1, 2), "p75" -> at(3, 4))
    val got = LlmQueries13.exactQuantiles(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === expected)
  }

  test("q_curriculum: NTILE bucket sizes and contiguous difficulty ranges") {
    val rows = LlmQueries13.curriculum(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    val sizes = rows.map(_.getLong(1))
    val total = sizes.sum
    // SQL NTILE: first (total mod 4) buckets hold ⌈total/4⌉ rows.
    val (q, r) = (total / 4, total % 4)
    val wantSizes = (1 to 4).map(i => if (i <= r) q + 1 else q)
    assert(sizes.toSeq === wantSizes)
    // Buckets partition the (n_tok, doc_id) order: ranges never overlap
    // backwards (bucket i's max_tok <= bucket i+1's min_tok).
    val bounds = rows.map(r2 => (r2.getLong(2), r2.getLong(3))) // (min, max)
    bounds.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(hi <= lo2, s"bucket ranges overlap: $hi > $lo2")
    }
  }

  test("q_weighted_quantiles: crossing values match a driver-side weighted walk") {
    val rows = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(round(col("l_extendedprice") * 100).cast("long").as("c"),
        col("l_quantity").cast("long").as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val tw = rows.map(_._2).sum
    def crossing(t: Long): Double = {
      var cum = 0L
      rows.find { case (_, w) => cum += w; cum >= t }.get._1 / 100.0
    }
    val expected = Map("p25" -> crossing((tw + 3) / 4),
      "p50" -> crossing((tw + 1) / 2), "p75" -> crossing((3 * tw + 3) / 4))
    val got = LlmQueries13.weightedQuantiles(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === expected)
  }

  test("q_lsh_precision: true-duplicate mass equals q_minhash_neardup's pair count") {
    val audit = LlmQueries13.lshPrecision(spark, dir).collect()
    assert(audit.nonEmpty)
    audit.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_dup must be <= n_pairs")
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 16)
    }
    // Cross-pin: Σ n_dup over all agreement bands = # pairs the
    // production near-dup query emits (same candidates, same exact
    // verify, same threshold).
    val nearDup = LlmQueries.defs("q_minhash_neardup")(spark, dir).count()
    assert(audit.map(_.getLong(2)).sum === nearDup)
  }
}
