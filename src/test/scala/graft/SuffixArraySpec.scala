package graft

import org.apache.spark.sql.functions._

import graft.operators.SuffixArray

class SuffixArraySpec extends GraftSuite {

  private def corpus(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
  }

  test("full-depth ranks reproduce the lexicographic suffix order") {
    import spark.implicits._
    val docs = corpus(
      1L -> "b a n a n a",
      2L -> "a n a b",
      3L -> "b a n a n a") // exact duplicate of doc 1: full-suffix ties
    val r = SuffixArray.ranks(docs, 3) // 2^3 = 8 >= max doc length 6
    val got = r.select("doc_id", "pos", "rank")
      .as[(Long, Int, Long)].collect()
      .sortBy { case (d, p, rk) => (rk, d, p) }
      .map { case (d, p, _) => (d, p) }
    // Reference: sort suffix token sequences directly, tie-break (doc, pos).
    val toks = Map(
      1L -> Array("b", "a", "n", "a", "n", "a"),
      2L -> Array("a", "n", "a", "b"),
      3L -> Array("b", "a", "n", "a", "n", "a"))
    val expected = toks.toSeq.flatMap { case (d, ts) =>
      ts.indices.map(p => (d, p, ts.drop(p).toSeq))
    }.sortBy { case (d, p, sfx) =>
      // space separator sorts below [a-z], so joined-string order is
      // tokenwise order and a proper prefix sorts first
      (sfx.mkString(" "), d, p)
    }.map { case (d, p, _) => (d, p) }
    assert(got.toSeq === expected)
    // Duplicate docs 1 and 3 really do tie at full depth (rank equality
    // is exact suffix equality, so each doc-1 suffix shares its rank
    // with the same position in doc 3).
    val ranks = r.select("doc_id", "pos", "rank")
      .as[(Long, Int, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    (0 until 6).foreach(p => assert(ranks((1L, p)) === ranks((3L, p))))
  }

  test("level-k rank equality is exact 2^k-window equality (full windows)") {
    import spark.implicits._
    // Docs 10/11 share the 4-gram "x y z w" at different positions;
    // doc 12 shares only the 2-gram "x y".
    val docs = corpus(
      10L -> "q x y z w r",
      11L -> "x y z w s t",
      12L -> "x y u v a b")
    val lv = SuffixArray.levelRanks(docs, 2).toMap
    def byPos(k: Int) = lv(k).select("doc_id", "pos", "rank")
      .as[(Long, Int, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val l1 = byPos(1); val l2 = byPos(2)
    // 4-token windows at (10, pos 1) and (11, pos 0) are equal → equal
    // level-2 rank; doc 12's window differs.
    assert(l2((10L, 1)) === l2((11L, 0)))
    assert(l2((12L, 0)) !== l2((10L, 1)))
    // 2-token windows "x y" agree across all three docs at their offsets.
    assert(l1((10L, 1)) === l1((12L, 0)))
    assert(l1((11L, 0)) === l1((12L, 0)))
    // And a different 2-gram ("y z" vs "y u") does not alias.
    assert(l1((10L, 2)) !== l1((12L, 1)))
  }

  test("baseLevel jump is order-exact: same final order as full doubling") {
    import spark.implicits._
    val docs = corpus(
      1L -> "b a n a n a",
      2L -> "a n a b",
      3L -> "n a b a")
    def order(base: Int) =
      SuffixArray.ranks(docs, 3, baseLevel = base)
        .select("doc_id", "pos", "rank").as[(Long, Int, Long)].collect()
        .sortBy { case (d, p, rk) => (rk, d, p) }
        .map { case (d, p, _) => (d, p) }.toSeq
    val full = order(0)
    assert(order(2) === full)
    assert(order(3) === full) // degenerate: base IS the final level
  }

  test("suffixOrder is the 1..n permutation of the full-depth rank order") {
    import spark.implicits._
    val docs = corpus(
      1L -> "b a n a n a",
      2L -> "a n a b",
      3L -> "b a n a n a")
    val got = SuffixArray.suffixOrder(docs, 3)
      .select("doc_id", "pos", "sa_rank").as[(Long, Int, Long)].collect()
    // a permutation of 1..n ...
    assert(got.map(_._3).sorted.toSeq === (1L to got.length.toLong))
    // ... in exactly the order ranks+tiebreak produce
    val viaRanks = SuffixArray.ranks(docs, 3)
      .select("doc_id", "pos", "rank").as[(Long, Int, Long)].collect()
      .sortBy { case (d, p, rk) => (rk, d, p) }
      .map { case (d, p, _) => (d, p) }.toSeq
    assert(got.sortBy(_._3).map(t => (t._1, t._2)).toSeq === viaRanks)
  }

  test("property: random corpora match brute-force suffix sort and window equality") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.pureApply(Gen.Parameters.default, Seed(seed))
    (0 until 3).foreach { i =>
      // Small alphabet + short docs force heavy rank ties and repeats —
      // the regime where doubling bookkeeping can go wrong.
      val gDoc = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "ab", "ba", "c"))
        .map(_.take(12))
      val docsList = sample(Gen.listOfN(8, gDoc), 42L + i)
      val docs = docsList.zipWithIndex
        .map { case (ts, d) => (d.toLong, ts) }.toDF("doc_id", "toks")
      // suffixOrder vs brute-force sort of token sequences
      val got = SuffixArray.suffixOrder(docs, 4)
        .select("doc_id", "pos", "sa_rank").as[(Long, Int, Long)].collect()
        .sortBy(_._3).map(t => (t._1, t._2)).toSeq
      val want = docsList.zipWithIndex.flatMap { case (ts, d) =>
        ts.indices.map(p => (d.toLong, p, ts.drop(p)))
      }.sortBy { case (d, p, sfx) => (sfx.mkString(" "), d, p) }
        .map(t => (t._1, t._2))
      assert(got === want, s"iteration $i suffix order diverged")
      // level-2 rank equality == exact 4-token-window equality for
      // positions with a full window
      val l2 = SuffixArray.levelRanks(docs, 2).toMap.apply(2)
        .filter(col("pos") + 4 <= col("dlen"))
        .select("doc_id", "pos", "rank").as[(Long, Int, Long)].collect()
      val win = docsList.zipWithIndex.flatMap { case (ts, d) =>
        (0 to ts.length - 4).map(p => (d.toLong, p) -> ts.slice(p, p + 4).mkString(" "))
      }.toMap
      val byRank = l2.groupBy(_._3).values
      byRank.foreach { grp =>
        val wins = grp.map(t => win((t._1, t._2))).distinct
        assert(wins.size == 1, s"iteration $i: one rank, windows $wins")
      }
      val byWin = l2.groupBy(t => win((t._1, t._2))).values
      byWin.foreach { grp =>
        assert(grp.map(_._3).distinct.size == 1,
          s"iteration $i: equal windows got different ranks")
      }
    }
  }

  test("grid coarsening: pair ranking survives a weakly-monotone bucket key") {
    // Executable form of the SuffixArray docstring's boundary claim:
    // past ~9·10^7 positions the combined pair key r1·B + r2 loses
    // precision in double arithmetic — DISTINCT pairs round to the SAME
    // key and the grid coarsens. Correctness must not care, because
    // PrefixSum.rank's contract is only WEAK monotonicity of the bucket
    // key along orderCols (ties share a bucket; exact order comes from
    // orderCols). Simulate the rounding directly: quantize the exact
    // pair key onto a coarse grid (64 keys per cell — far harsher than
    // real double rounding) and assert the ranking is bit-identical to
    // the exact-key ranking AND to the brute-force row_number. If
    // PrefixSum.rank ever started requiring STRICT bucket-key
    // monotonicity, the coarse variant would mis-rank inside collapsed
    // cells and this test would fail.
    import spark.implicits._
    import graft.operators.PrefixSum
    val rnd = new scala.util.Random(7)
    val n = 3000
    // The doubling-round pair shape: r1 ∈ [1, 50], r2 ∈ [-1, 49]
    // (−1 = past-end sentinel), id the (doc_id, pos) tiebreak stand-in.
    val rows = (1 to n).map(i =>
      (rnd.nextInt(50).toLong + 1, rnd.nextInt(51).toLong - 1, i.toLong))
    val df = rows.toDF("r1", "r2", "id").localCheckpoint(false)
    val b = 53.0
    val exactKey = col("r1") * b + col("r2")
    val coarseKey = floor((col("r1") * b + col("r2")) / 64.0) * 64.0
    def ranked(key: org.apache.spark.sql.Column,
               range: (Double, Double) = (-64.0, 50 * b + 50)) =
      PrefixSum.rank(df, key, Seq(col("r1"), col("r2"), col("id")), "ord",
          preStaged = true, keyRange = Some(range))
        .select("r1", "r2", "id", "ord").as[(Long, Long, Long, Long)]
        .collect().sortBy(_._3).toSeq
    val exact = ranked(exactKey)
    val coarse = ranked(coarseKey)
    assert(exact === coarse, "coarsened grid changed the ranking")
    val brute = rows.sortBy(t => (t._1, t._2, t._3)).zipWithIndex
      .map { case ((_, _, id), ix) => id -> (ix + 1L) }.toMap
    exact.foreach { case (_, _, id, ord) =>
      assert(ord === brute(id), s"rank of id=$id diverges from row_number")
    }
    // And the REAL mechanism, not a simulation: shift the key to the
    // ~9·10^15 magnitude where a double's ulp is 2 — adjacent integer
    // keys literally collapse to the same double, exactly what happens
    // to r1·B + r2 past ~9·10^7 positions. Ranking must still be the
    // brute-force row_number.
    val shifted = ranked(lit(9.0e15) + col("r1") * b + col("r2"),
      range = (9.0e15 - 64.0, 9.0e15 + 50 * b + 50))
    assert(shifted === exact, "ulp-collapsed keys changed the ranking")
  }

  test("sentinel: a proper prefix sorts strictly before its extension") {
    import spark.implicits._
    val docs = corpus(1L -> "a", 2L -> "a b")
    val m = SuffixArray.ranks(docs, 1)
      .select("doc_id", "pos", "rank").as[(Long, Int, Long)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(m((1L, 0)) < m((2L, 0)), "\"a\" must rank below \"a b\"")
    assert(m((2L, 1)) > m((2L, 0)), "suffix \"b\" ranks above \"a b\"")
  }
}
