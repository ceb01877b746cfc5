package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFns._

/** Relational completeness, part 3: sessionization, pivot, percentiles —
  * plus the remaining dedup families over embeddings and word n-grams.
  */
object RelQueries3 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** Time-series bucketing: calendar truncation + arbitrary-width epoch
    * buckets in one pass (partition-pruning-friendly group keys). */
  def timeBuckets(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.groupBy(
        date_trunc("month", col("o_orderdate")).as("month"),
        col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(round(col("o_totalprice") * 100).cast("long")).cast("double") / 100.0).as("month_total"))
      .orderBy("month", "o_orderstatus")
  }

  val timeBucketsSql: String = """
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month, o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS month_total
FROM orders
GROUP BY date_trunc('month', o_orderdate), o_orderstatus
ORDER BY month, o_orderstatus
"""

  /** Data-profiling: per-column stats in ONE scan (the generalized form
    * of the reference's required-column gate C6 — schema plus content
    * health). Long-format output: one row per profiled column. */
  def profileTable(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    def prof(name: String, c: Column) = struct(
      lit(name).as("column"),
      count(lit(1)).as("n_rows"),
      sum(when(c.isNull, 1L).otherwise(0L)).as("n_null"),
      countDistinct(c).as("n_distinct"),
      min(c.cast("string")).as("min_s"),
      max(c.cast("string")).as("max_s"))
    val wide = o.agg(
      prof("o_orderstatus", col("o_orderstatus")).as("p1"),
      prof("o_orderpriority", col("o_orderpriority")).as("p2"),
      prof("o_custkey", col("o_custkey")).as("p3"))
    wide.select(explode(array(col("p1"), col("p2"), col("p3"))).as("p"))
      .select(col("p.*"))
      .orderBy("column")
  }

  val profileTableSql: String = """
WITH p AS (
  SELECT
    COUNT(*) AS n_rows,
    SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS null1,
    COUNT(DISTINCT o_orderstatus) AS dist1,
    min(CAST(o_orderstatus AS VARCHAR)) AS min1, max(CAST(o_orderstatus AS VARCHAR)) AS max1,
    SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS null2,
    COUNT(DISTINCT o_orderpriority) AS dist2,
    min(CAST(o_orderpriority AS VARCHAR)) AS min2, max(CAST(o_orderpriority AS VARCHAR)) AS max2,
    SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null3,
    COUNT(DISTINCT o_custkey) AS dist3,
    min(CAST(o_custkey AS VARCHAR)) AS min3, max(CAST(o_custkey AS VARCHAR)) AS max3
  FROM orders)
SELECT 'o_orderstatus' AS "column", n_rows, CAST(null1 AS BIGINT) AS n_null, dist1 AS n_distinct, min1 AS min_s, max1 AS max_s FROM p
UNION ALL
SELECT 'o_orderpriority', n_rows, CAST(null2 AS BIGINT), dist2, min2, max2 FROM p
UNION ALL
SELECT 'o_custkey', n_rows, CAST(null3 AS BIGINT), dist3, min3, max3 FROM p
ORDER BY "column"
"""

  /** Skew-safe salted aggregation — identical output to the plain
    * groupBy (the oracle IS the plain groupBy), different physical shape:
    * hot keys spread over 16 salt buckets in the heavy phase. */
  def saltedAgg(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .withColumn("cents", round(col("l_extendedprice") * 100).cast("long"))
    graft.operators.Salted.sumCount(li, Seq("l_returnflag", "l_linestatus"),
        Seq("sum_cents" -> col("cents")))
      .withColumn("sum_price", col("sum_cents").cast("double") / 100.0)
      .drop("sum_cents")
      .orderBy("l_returnflag", "l_linestatus")
  }

  val saltedAggSql: String = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

  /** Gap-based sessionization (30-min inactivity ⇒ new session): the
    * classic running-sum-of-boundary-flags window, one shuffle per entity
    * key. Emits per-session aggregates. */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000000
    val flagged = e
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("new_session",
        when(col("us") - lag(col("us"), 1).over(w) > gapUs, 1)
          .when(lag(col("us"), 1).over(w).isNull, 1).otherwise(0))
      .withColumn("session_idx",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        ((max(col("us")) - min(col("us"))).cast("double") / 1e6).as("duration_sec"))
      .orderBy("user_id", "session_idx")
  }

  val sessionizeSql: String = """
WITH flagged AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
    CASE WHEN lag(epoch_us(ts), 1) OVER w IS NULL THEN 1
         WHEN epoch_us(ts) - lag(epoch_us(ts), 1) OVER w > 1800000000 THEN 1
         ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, us,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, COUNT(*) AS n_events,
       CAST(max(us) - min(us) AS DOUBLE) / 1e6 AS duration_sec
FROM sess GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
"""

  /** Pivot: events wide by type, one row per user. Fixed value list keeps
    * the single-pass pivoted aggregation (no values-discovery job). */
  def pivotCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")

  val pivotCountsSql: String = """
SELECT user_id,
  COUNT(*) FILTER (event_type = 'click') AS click,
  COUNT(*) FILTER (event_type = 'error') AS error,
  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
  COUNT(*) FILTER (event_type = 'signup') AS signup,
  COUNT(*) FILTER (event_type = 'view') AS view
FROM events GROUP BY user_id ORDER BY user_id
"""

  /** Exact interpolated percentiles over exact cents (sort-based; the
    * approx ladder for 100 TB is approx_percentile in the rows-only
    * query). */
  def percentiles(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
    o.groupBy("o_orderstatus")
      .agg(
        (percentile(col("cents"), lit(0.5)) / 100.0).as("p50"),
        (percentile(col("cents"), lit(0.9)) / 100.0).as("p90"),
        (percentile(col("cents"), lit(0.99)) / 100.0).as("p99"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }

  val percentilesSql: String = """
SELECT o_orderstatus,
  quantile_cont(cents, 0.5) / 100.0 AS p50,
  quantile_cont(cents, 0.9) / 100.0 AS p90,
  quantile_cont(cents, 0.99) / 100.0 AS p99,
  COUNT(*) AS n
FROM (SELECT o_orderstatus, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""

  /** Approximate percentiles (mergeable sketch). Oracle contract is a
    * tolerance gate (same pattern as q_approx_distinct): exact exact-cents
    * percentiles plus booleans asserting the sketch lands within 5% of
    * exact (accuracy 10000 → rank error ≤ n/10000, far inside 5% value
    * error here); the DuckDB twin emits literal TRUE. An out-of-tolerance
    * sketch fails the hash-compare. */
  def approxPercentiles(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
    o.groupBy("o_orderstatus")
      .agg(
        (percentile(col("cents"), lit(0.5)) / 100.0).as("p50"),
        (percentile(col("cents"), lit(0.99)) / 100.0).as("p99"),
        approx_percentile(col("o_totalprice"), lit(0.5), lit(10000)).as("__a50"),
        approx_percentile(col("o_totalprice"), lit(0.99), lit(10000)).as("__a99"))
      .select(col("o_orderstatus"), col("p50"), col("p99"),
        (abs(col("__a50") - col("p50")) <= col("p50") * 0.05).as("p50_ok"),
        (abs(col("__a99") - col("p99")) <= col("p99") * 0.05).as("p99_ok"))
      .orderBy("o_orderstatus")
  }

  val approxPercentilesSql: String = """
SELECT o_orderstatus,
  quantile_cont(cents, 0.5) / 100.0 AS p50,
  quantile_cont(cents, 0.99) / 100.0 AS p99,
  TRUE AS p50_ok, TRUE AS p99_ok
FROM (SELECT o_orderstatus, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""

  /** Word-bigram Jaccard similarity between documents (the n-gram-Jaccard
    * dedup family; char-shingle MinHash covers the hashed variant). All
    * pairs within a bounded id range — the unbounded form goes through
    * MinHash banding instead of a cross join. */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    // The natural corpus has no ≥0.2-Jaccard bigram pairs in the slice
    // (0 rows — a hash-match that proved nothing), so every 10th doc is
    // paired with a planted near-duplicate: same text with one appended
    // word. The planted pair shares all n original bigrams and differs
    // in exactly one, so jaccard = n/(n+1) — guaranteed ≥ 0.2 for any
    // doc with ≥1 bigram, and an intersection/union regression now
    // flips real rows instead of preserving an empty result.
    val base = t(s, dir, "documents").filter(col("doc_id") < 100)
      .select("doc_id", "text")
    val planted = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" zzzz")).as("text"))
    val d = base.unionByName(planted)
    val words = split(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")), " ")
    val bigrams = when(size(words) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(words) - 1),
        i => concat(element_at(words, i), lit(" "), element_at(words, i + 1))))
    val g = d.select(col("doc_id"), array_distinct(bigrams).as("bg"))
      .filter(size(col("bg")) > 0)
    val inter = size(filter(col("a.bg"), x => array_contains(col("b.bg"), x))).cast("double")
    g.as("a").join(g.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        (inter / (size(col("a.bg")) + size(col("b.bg")) - inter)).as("jaccard"))
      .filter(col("jaccard") >= 0.2)
      .orderBy("id_a", "id_b")
  }

  val ngramJaccardSql: String = """
WITH d AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 100
  UNION ALL
  SELECT doc_id + 1000000, text || ' zzzz' FROM documents
  WHERE doc_id < 100 AND doc_id % 10 = 0),
g AS (
  SELECT doc_id, bg FROM (
    SELECT doc_id, list_distinct(
      CASE WHEN len(w) < 2 THEN []
           ELSE [concat(w[i], ' ', w[i+1]) for i in range(1, len(w))] END) AS bg
    FROM (SELECT doc_id,
            string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS w
          FROM d)) x
  WHERE len(bg) > 0)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  CAST(len(list_filter(a.bg, x -> list_contains(b.bg, x))) AS DOUBLE) /
  (len(a.bg) + len(b.bg) - len(list_filter(a.bg, x -> list_contains(b.bg, x)))) AS jaccard
FROM g a JOIN g b ON a.doc_id < b.doc_id
WHERE CAST(len(list_filter(a.bg, x -> list_contains(b.bg, x))) AS DOUBLE) /
      (len(a.bg) + len(b.bg) - len(list_filter(a.bg, x -> list_contains(b.bg, x)))) >= 0.2
ORDER BY id_a, id_b
"""

  /** Embedding-cosine near-dup, sign-bucket LSH form: candidates come
    * from an equi-join on the 8-bit sign bucket (both sides hash-partition
    * on it), never a theta self-join — the shape that survives an
    * unbounded corpus. Approximate by construction: a near-dup pair in
    * different buckets is unreported, the standard LSH recall tradeoff
    * (probe neighbor buckets to raise recall). Canonical = lowest id. */
  def embeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("e"))
      .withColumn("bucket", signBucket(col("e"), 8))
    e.as("a").join(e.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("keep_id"), col("b.vec_id").as("dup_id"),
        graft.operators.Knn.truncSim(
          cosineFast(col("a.e"), col("b.e"))).as("sim"))
      .filter(col("sim") >= 0.4)
      .orderBy("keep_id", "dup_id")
  }

  val embeddingNearDupSql: String = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (SELECT vec_id, v,
        (CASE WHEN v[1] > 0 THEN 1 ELSE 0 END) + (CASE WHEN v[2] > 0 THEN 2 ELSE 0 END) +
        (CASE WHEN v[3] > 0 THEN 4 ELSE 0 END) + (CASE WHEN v[4] > 0 THEN 8 ELSE 0 END) +
        (CASE WHEN v[5] > 0 THEN 16 ELSE 0 END) + (CASE WHEN v[6] > 0 THEN 32 ELSE 0 END) +
        (CASE WHEN v[7] > 0 THEN 64 ELSE 0 END) + (CASE WHEN v[8] > 0 THEN 128 ELSE 0 END) AS bucket
      FROM e)
SELECT a.vec_id AS keep_id, b2.vec_id AS dup_id,
       CAST(floor(list_cosine_similarity(a.v, b2.v) * 1000000) AS DOUBLE) / 1000000.0 AS sim
FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
WHERE CAST(floor(list_cosine_similarity(a.v, b2.v) * 1000000) AS DOUBLE) / 1000000.0 >= 0.4
ORDER BY keep_id, dup_id
"""

  /** Per-group top-k through the typed bounded-heap Aggregator (shuffle
    * volume k×groups, vs the window form's full-group shuffle). Output
    * matches the ranking-window oracle exactly. */
  def topkAggregate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.TopKAggregate
    val c = t(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
      .as[(String, Long, Double)]
    c.groupByKey(_._1)
      .mapValues(r => TopKAggregate.Entry(r._2, r._3))
      .agg(new TopKAggregate.TopKByValue(3).toColumn)
      .flatMap { case (seg, list) =>
        list.zipWithIndex.map { case (e, i) => (seg, e.id, e.value, i + 1) }
      }
      .toDF("c_mktsegment", "c_custkey", "c_acctbal", "rank")
      .orderBy("c_mktsegment", "rank")
  }

  val topkAggregateSql: String = """
SELECT c_mktsegment, c_custkey, c_acctbal, CAST(rn AS INTEGER) AS rank
FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer)
WHERE rn <= 3
ORDER BY c_mktsegment, rank
"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_topk_agg" -> (topkAggregate _),
    "q_time_buckets" -> (timeBuckets _),
    "q_salted_agg" -> (saltedAgg _),
    "q_profile" -> (profileTable _),
    "q_sessionize" -> (sessionize _),
    "q_pivot" -> (pivotCounts _),
    "q_percentiles" -> (percentiles _),
    "q_approx_percentiles" -> (approxPercentiles _),
    "q_ngram_jaccard" -> (ngramJaccard _),
    "q_embedding_neardup" -> (embeddingNearDup _))

  val oracles: Map[String, String] = Map(
    "q_topk_agg" -> topkAggregateSql,
    "q_time_buckets" -> timeBucketsSql,
    "q_salted_agg" -> saltedAggSql,
    "q_profile" -> profileTableSql,
    "q_sessionize" -> sessionizeSql,
    "q_pivot" -> pivotCountsSql,
    "q_percentiles" -> percentilesSql,
    "q_approx_percentiles" -> approxPercentilesSql,
    "q_ngram_jaccard" -> ngramJaccardSql,
    "q_embedding_neardup" -> embeddingNearDupSql)
}
