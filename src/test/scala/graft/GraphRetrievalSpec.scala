package graft

import org.apache.spark.sql.functions._

import graft.operators.Bfs
import graft.queries.RelQueries9

class GraphRetrievalSpec extends GraftSuite {
  import spark.implicits._

  test("bfs hops: min distance, undirected, cap honored, unreachable excluded") {
    // Path 0-1-2-3-4 (mixed edge directions) plus a separate 10-11 island
    // and a shortcut 0-3 that must win over the long way round.
    val e = Seq((1L, 0L), (1L, 2L), (3L, 2L), (3L, 4L), (10L, 11L), (0L, 3L))
      .toDF("src", "dst")
    val out = Bfs.hops(e, source = 0L, maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 0L, 1L -> 1L, 3L -> 1L, 2L -> 2L, 4L -> 2L))
    val capped = Bfs.hops(e, source = 0L, maxHops = 1)
      .as[(Long, Long)].collect().toMap
    assert(capped == Map(0L -> 0L, 1L -> 1L, 3L -> 1L))
  }

  test("bfs loop stops early on an empty frontier") {
    val e = Seq((0L, 1L)).toDF("src", "dst")
    // maxHops far beyond the graph's diameter must still terminate with
    // the exact reachable set.
    val out = Bfs.hops(e, source = 0L, maxHops = 50)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 0L, 1L -> 1L))
  }

  private val sf = "/root/testdata/sf0.001"

  test("bm25 scores are integral micro-units and ranked descending") {
    val rows = RelQueries9.bm25(spark, sf)
      .select("score_micro").as[Long].collect().toSeq
    assert(rows.nonEmpty && rows == rows.sortBy(-_))
  }

  test("dsir bucket LM is bounded at 256 buckets; weights rank en docs first") {
    val top = RelQueries9.dsirSelect(spark, sf)
      .select("lang").as[String].collect().toSeq
    // Importance resampling toward the en target must surface mostly en
    // docs at the head of the ranking.
    assert(top.nonEmpty && top.count(_ == "en") * 2 > top.size)
  }

  test("ahash blocks: identical images hash equal, a tiny perturbation stays near, " +
    "non-multiple-of-8 dims are quarantined") {
    import graft.operators.Multimodal
    import graft.operators.Multimodal.MediaRow
    def img(id: Long, w: Int, h: Int, bump: Long) = MediaRow(id, "g",
      Multimodal.encodeGrayPng(w, h, { (x, y) =>
        val p = x * 16L + y
        ((p * p + (if (x == 0 && y == 0) bump else 0L)) % 251).toInt
      }))
    val media = Seq(img(1L, 16, 16, 0), img(2L, 16, 16, 0), img(3L, 16, 16, 2),
      img(4L, 15, 16, 0)).toDS()
    val out = Multimodal.ahashBlocks(media).collect().map(b => b.id -> b).toMap
    assert(!out.contains(4L), "15x16 image must be dropped, not mis-hashed")
    val (a, b, c) = (out(1L), out(2L), out(3L))
    assert((a.b0, a.b1, a.b2, a.b3) == ((b.b0, b.b1, b.b2, b.b3)))
    val ham = java.lang.Long.bitCount(a.b0 ^ c.b0) + java.lang.Long.bitCount(a.b1 ^ c.b1) +
      java.lang.Long.bitCount(a.b2 ^ c.b2) + java.lang.Long.bitCount(a.b3 ^ c.b3)
    assert(ham <= 3, s"one-pixel bump must stay within the near-dup radius, got $ham")
  }

  test("q21 decorrelation never re-scans lineitem in the consuming plan") {
    // The (order, supplier) grain is materialized ONCE (localCheckpoint —
    // that job holds the sole lineitem file scan); the consuming plan must
    // show zero lineitem scans and exactly two readers of the checkpointed
    // grain (profile pass + join back) — i.e. the doubly-correlated shape
    // collapsed to one pass over the fact table, not a scan per subquery.
    val plan = RelQueries9.q21Waiting(spark, sf).queryExecution.executedPlan.toString
    val scans = "lineitem\\.parquet".r.findAllIn(plan).size
    val grainReads = "Scan ExistingRDD".r.findAllIn(plan).size
    assert(scans == 0,
      s"consuming plan must read the materialized grain, saw $scans lineitem scans:\n$plan")
    assert(grainReads == 2,
      s"profile + join-back must both read the checkpointed grain, saw $grainReads:\n$plan")
  }

  test("chi-square cell table: margins consistent, statistic is the cell sum") {
    val df = RelQueries9.chiSquare(spark, sf)
    val cells = df.select("n_obs", "contrib_micro", "chi2_micro")
      .as[(Long, Long, Long)].collect()
    assert(cells.map(_._2).sum == cells.head._3)
    val total = df.agg(sum("n_obs")).as[Long].head()
    val nTot = Tables(spark, sf, "orders").count()
    assert(total == nTot)
  }
}
