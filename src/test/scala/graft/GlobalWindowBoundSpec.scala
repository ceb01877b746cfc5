package graft

import org.apache.spark.sql.functions._

/** r19 global-window audit (VERDICT r18 #5): every unpartitioned
  * `Window.orderBy` in the engine funnels its frame through ONE
  * partition, so each site must carry a proof that the frame is
  * BOUNDED — by a preceding LIMIT, by calendar grain, or by a
  * value-range/bucket-width ratio — never corpus-sized. The syntactic
  * bounds (LIMIT k directly upstream: LlmQueries8 ×4, LlmQueries4
  * vocab, KMeans seeds) hold by construction; this spec pins the three
  * NON-syntactic bounds numerically so a data or query change that
  * breaks the boundedness argument fails a test instead of silently
  * reintroducing a single-partition corpus sort.
  */
class GlobalWindowBoundSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"

  test("q_skyline: bucket-window frame is value-range/bucketWidth bounded") {
    // Skyline.pareto(part, price_c, p_size, bucketWidth = 100000): the
    // global window runs over one row per price BUCKET. TPC-H retail
    // prices span ~90k-210k cents at every SF (price is a per-part
    // formula, not volume-dependent), so the frame is ~3 rows.
    val part = Tables(spark, dir, "part")
      .withColumn("price_c", round(col("p_retailprice") * 100).cast("long"))
    val nBuckets = part.select((col("price_c") / 100000L).cast("long").as("b"))
      .distinct().count()
    assert(nBuckets <= 8, s"skyline bucket frame grew to $nBuckets rows; " +
      "the bucketWidth choice no longer bounds the global window")
  }

  test("q_theil_sen: pair frame is calendar-boxed (<= 120 days -> <= 7140 pairs)") {
    // The pairwise-slope self-join is time-boxed to the LAST 120 days;
    // the global rank window runs over at most C(120,2) = 7140 rows no
    // matter the order volume.
    val days = Tables(spark, dir, "orders")
      .select(col("o_orderdate").cast("date").as("d")).distinct()
    val mx = days.agg(max(col("d")).as("m"))
    val boxed = days.crossJoin(broadcast(mx))
      .filter(datediff(col("m"), col("d")) <= 119).count()
    assert(boxed <= 120, s"theil-sen day box holds $boxed days (> 120)")
  }

  test("q_hybrid_search: every ranked list is a preceding top-25") {
    // The three row_number windows in hybridSearch rank bm25 / tf /
    // cosine lists each cut by LIMIT 25 upstream; bm25 is the one list
    // built outside the function body, so pin it here.
    val bm = queries.RelQueries9.bm25(spark, dir).count()
    assert(bm <= 25, s"bm25 list carries $bm rows (> 25); the hybrid " +
      "rank windows are only bounded if each list stays a top-25")
  }
}
