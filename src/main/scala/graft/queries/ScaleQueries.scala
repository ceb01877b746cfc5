package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsOfJoin, Bucketing, PageRank, Salted}
import graft.sinks.ZOrderedParquet

/** Scale-technique surface: each query exercises an operator whose
  * whole point is behavior at 100 TB (skew-safe joins, broadcast as-of,
  * z-order layout, columnar-format round trips, iterative graph rank)
  * while producing an exactly-oracled result at test scale.
  */
object ScaleQueries {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** Skew-safe salted equi-join: lineitem ⋈ supplier on suppkey with the
    * key salted 8 ways, aggregated to per-nation revenue. The oracle is
    * the PLAIN join — proving the salted plan is result-identical while
    * no single reducer ever sees a whole hot key. */
  def saltedJoin(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_suppkey").as("suppkey"), cents(col("l_extendedprice")).as("c"))
    val sup = t(s, dir, "supplier")
      .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
    Salted.join(li, sup, Seq("suppkey"), buckets = 8)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sum_cents"))
      .select(col("s_nationkey"), col("n"), (col("sum_cents") / 100.0).as("revenue"))
      .orderBy("s_nationkey")
  }

  val saltedJoinSql: String = """
SELECT s.s_nationkey, COUNT(*) AS n,
       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS revenue
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_nationkey ORDER BY s.s_nationkey
"""

  /** Confs that make AQE's skew-join re-plan observable at test scale:
    * broadcast off (force a shuffled join), skew thresholds lowered to
    * the planted-skew sizes, partition coalescing off (it would merge
    * away the skew signal). Shared with ScaleTechniquesSpec, which
    * asserts `skew=true` appears in this exact query's final plan. */
  val skewJoinConfs: Seq[(String, String)] = Seq(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "false")

  /** The skewed-join plan itself: a planted celebrity key collapses
    * half of lineitem onto hk ∈ {0, 1} (the other half spreads over
    * 2..24), equi-joined to the 25-row nation dim and aggregated per
    * nation. Under `skewJoinConfs` the two hot shuffle partitions
    * exceed factor×median and AQE splits them at runtime. */
  def skewJoinPlan(s: SparkSession, dir: String): DataFrame = {
    val fact = t(s, dir, "lineitem").select(
      when(col("l_orderkey") % 4 < 2, col("l_orderkey") % 4)
        .otherwise(col("l_partkey") % 23 + 2).cast("long").as("hk"),
      cents(col("l_extendedprice")).as("c"))
    val dim = t(s, dir, "nation")
      .select(col("n_nationkey").cast("long").as("hk"), col("n_name"))
    fact.join(dim, "hk")
      .groupBy("n_name")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sum_cents"))
      .select(col("n_name"), col("n"), (col("sum_cents") / 100.0).as("revenue"))
      .orderBy("n_name")
  }

  /** AQE skew-join, oracled — the zero-code-change counterpart to
    * `Salted.join` (q_salted_join): same hot-key problem, solved by
    * Spark's runtime re-plan instead of manual salting. The query runs
    * eagerly under the scoped confs (set → execute → restore, the
    * streaming-harness pattern — AQE finalizes the physical plan at
    * execution, so the confs must be live then, not at plan build) and
    * returns the 25-row aggregate, which must be identical however many
    * splits AQE chose — that's what the oracle checks. */
  def skewJoin(s: SparkSession, dir: String): DataFrame = {
    val saved = skewJoinConfs.map { case (k, _) => k -> s.conf.getOption(k) }
    skewJoinConfs.foreach { case (k, v) => s.conf.set(k, v) }
    val plan = skewJoinPlan(s, dir)
    val rows = try plan.collect() finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
    s.createDataFrame(java.util.Arrays.asList(rows: _*), plan.schema)
  }

  val skewJoinSql: String = """
WITH f AS (
  SELECT CASE WHEN l_orderkey % 4 < 2 THEN l_orderkey % 4
              ELSE l_partkey % 23 + 2 END AS hk,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS c
  FROM lineitem)
SELECT n_name, COUNT(*) AS n,
       CAST(SUM(c) AS BIGINT) / 100.0 AS revenue
FROM f JOIN nation ON f.hk = n_nationkey
GROUP BY n_name ORDER BY n_name
"""

  /** The bucketed join plan over already-staged tables (dir-tagged
    * names, so scale factors don't collide in the warehouse). Both
    * sides bucketed 8-way on the join key: bucket i joins bucket i with
    * NO exchange on either side — pay the shuffle once at write time,
    * never per join (the repeatedly-joined-fact layout at 100 TB).
    * ScaleTechniquesSpec asserts zero `Exchange hashpartitioning` in
    * exactly this plan. */
  def bucketedJoinPlan(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    // Bucketed layout staged ONCE per (session, dir) — r18. The whole
    // point of the layout is "pay the shuffle once at write time, never
    // per join", yet the write ran on every invocation (bench: warmup +
    // 3 timed reps = 4 drop/rewrite cycles of both tables). StagedOnce
    // is the house amortization contract for persisted artifacts
    // (MinHash/IVF/text indexes, Tables.staged): build once, keep the
    // cost visible in the bench's build_s line under the owning query.
    // The join result is identical either way — the writes are
    // deterministic functions of the testdata dir.
    graft.operators.StagedOnce(s, s"bucketed_tables@$dir",
      owner = "q_bucketed_join", dir = dir) {
      val o = t(s, dir, "orders").filter(col("o_orderkey") < 8000)
        .select(col("o_orderkey"), col("o_orderpriority"))
      val l = t(s, dir, "lineitem").filter(col("l_orderkey") < 8000)
        .select(col("l_orderkey"), cents(col("l_extendedprice")).as("c"))
      Bucketing.writeBucketed(o, s"orders_bj_$tag", "o_orderkey", 8, Some("o_orderkey"))
      Bucketing.writeBucketed(l, s"lineitem_bj_$tag", "l_orderkey", 8, Some("l_orderkey"))
    }
    Bucketing.readBucketed(s, s"orders_bj_$tag")
      .join(Bucketing.readBucketed(s, s"lineitem_bj_$tag"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sum_cents"))
      .select(col("o_orderpriority"), col("n"),
        (col("sum_cents") / 100.0).as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** Bucketed co-located join, oracled. Runs eagerly under scoped
    * broadcast-off conf (the no-exchange property is the point; at a
    * bounded test slice Catalyst would otherwise just broadcast) and
    * returns the 5-row priority rollup — which must equal the plain
    * join of the raw tables, proving the bucketed layout changes the
    * PLAN, never the answer. */
  def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = s.conf.get(key)
    s.conf.set(key, "-1")
    val plan = bucketedJoinPlan(s, dir)
    val rows = try plan.collect() finally s.conf.set(key, prev)
    s.createDataFrame(java.util.Arrays.asList(rows: _*), plan.schema)
  }

  val bucketedJoinSql: String = """
SELECT o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey < 8000 AND l_orderkey < 8000
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

  /** Broadcast backward as-of: every event looks up the latest per-type
    * daily rollup at-or-before its timestamp. The rollup is dim-sized →
    * broadcast; the only exchange is the max_by aggregation keyed by
    * event_id (uniform — contrast with the union+window as-of, which
    * shuffles the facts on the skewable join key). DuckDB's native
    * ASOF JOIN is the oracle. */
  def asofBroadcast(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val daily = ev.groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("day_ts"))
      .agg(sum(cents(col("value"))).as("day_cents"))
    AsOfJoin.backwardBroadcast(
        ev.select("event_id", "event_type", "ts"), "event_id", "event_type", "ts",
        daily, "event_type", "day_ts", Seq("day_cents"))
      .select(col("event_id"), col("event_type"),
        (col("day_cents") / 100.0).as("day_total"))
      .orderBy("event_id")
  }

  val asofBroadcastSql: String = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day_ts,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS day_cents
  FROM events GROUP BY event_type, date_trunc('day', ts))
SELECT e.event_id, e.event_type, d.day_cents / 100.0 AS day_total
FROM events e ASOF LEFT JOIN daily d
  ON e.event_type = d.event_type AND d.day_ts <= e.ts
ORDER BY e.event_id
"""

  /** Morton z-values over (partkey, suppkey) buckets — the expression
    * behind `ZOrderedParquet.write`'s clustered layout, checked
    * bit-for-bit cross-engine. Top-20 curve positions with a total-order
    * tiebreak. */
  def zorder(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "lineitem").select(
      (col("l_partkey") % 1024).as("xb"),
      (col("l_suppkey") % 1024).as("yb"),
      col("l_orderkey"), col("l_linenumber"))
    base.withColumn("z", ZOrderedParquet.interleave(col("xb"), col("yb"), 10))
      .orderBy(col("z").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(20)
  }

  val zorderSql: String = s"""
SELECT xb, yb, l_orderkey, l_linenumber,
       ${ZOrderedParquet.interleaveSql("xb", "yb", 10)} AS z
FROM (SELECT l_partkey % 1024 AS xb, l_suppkey % 1024 AS yb, l_orderkey, l_linenumber
      FROM lineitem) b
ORDER BY z DESC, l_orderkey, l_linenumber LIMIT 20
"""

  /** ORC round trip: a filtered orders slice is written to ORC, read
    * back, and aggregated; the oracle aggregates the original parquet.
    * Equality proves type fidelity (decimal-ish doubles, dates) through
    * the second columnar format the engine supports. */
  def orcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir, "orders").filter(col("o_orderkey") < 5000)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    val path = "target/orc_fixture_" + dir.replaceAll("[^A-Za-z0-9]", "_")
    src.write.mode("overwrite").orc(path)
    s.read.orc(path)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(cents(col("o_totalprice"))).as("sum_cents"),
        min(col("o_orderdate")).as("first_date"),
        max(col("o_orderdate")).as("last_date"))
      .select(col("o_orderstatus"), col("n"),
        (col("sum_cents") / 100.0).as("total"), col("first_date"), col("last_date"))
      .orderBy("o_orderstatus")
  }

  val orcRoundtripSql: String = """
SELECT o_orderstatus, COUNT(*) AS n,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total,
       min(o_orderdate) AS first_date, max(o_orderdate) AS last_date
FROM orders WHERE o_orderkey < 5000
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""

  /** Integer PageRank (3 damped iterations) over the part→supplier
    * co-occurrence graph. The oracle unrolls the same three iterations
    * as CTEs with `//` floor division — ranks match exactly because
    * every operation is integer. */
  def pagerank(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "lineitem").select(
      (col("l_partkey") % 200).as("src"), (col("l_suppkey") % 200).as("dst"))
    PageRank.ranks(e, iters = 3)
      .orderBy(col("rank").desc, col("id"))
  }

  val pagerankSql: String = {
    val scale = 1000000000000L
    def iter(k: Int): String = s"""
r$k AS (
  SELECT nd.id,
         ((15 * $scale) // (100 * (SELECT c FROM n)))
           + ((85 * COALESCE(m.m, 0)) // 100) AS rank
  FROM nodes nd LEFT JOIN (
    SELECT e.dst, CAST(SUM(r.rank // d.deg) AS BIGINT) AS m
    FROM e JOIN r${k - 1} r ON e.src = r.id JOIN deg d ON e.src = d.src
    GROUP BY e.dst) m ON nd.id = m.dst)"""
    s"""
WITH e AS (
  SELECT DISTINCT l_partkey % 200 AS src, l_suppkey % 200 AS dst FROM lineitem),
nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
n AS (SELECT COUNT(*) AS c FROM nodes),
deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
r0 AS (SELECT id, ($scale // (SELECT c FROM n)) AS rank FROM nodes),${iter(1)},${iter(2)},${iter(3)}
SELECT id, rank FROM r3 ORDER BY rank DESC, id
"""
  }

  /** Calendar gap-fill: one row per (user, day) across each user's
    * active span, the day's closing value carried forward through
    * gap days. Exercises `GapFill.dailyFfill` — two shuffles keyed by
    * the entity, spine generated not joined. */
  def gapFill(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").filter(col("user_id") < 50)
      .select(col("user_id"), col("ts"), col("event_id"), cents(col("value")).as("c"))
    graft.operators.GapFill.dailyFfill(ev, "user_id", "ts",
        col("c"), Seq(col("event_id")))
      .select(col("user_id"), col("day"), (col("value") / 100.0).as("close"))
      .orderBy("user_id", "day")
  }

  val gapFillSql: String = """
WITH e AS (
  SELECT user_id, ts, event_id, CAST(round(value * 100) AS BIGINT) AS c
  FROM events WHERE user_id < 50),
daily AS (
  SELECT user_id, day, c AS close FROM (
    SELECT user_id, CAST(ts AS DATE) AS day, c,
           row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM e) x WHERE rn = 1),
span AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id),
spine AS (
  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM span),
filled AS (
  SELECT s.user_id, s.day,
         last_value(d.close IGNORE NULLS)
           OVER (PARTITION BY s.user_id ORDER BY s.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close_c
  FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day)
SELECT user_id, day, close_c / 100.0 AS close FROM filled
ORDER BY user_id, day
"""

  /** JSON-lines round trip (format-matrix completion alongside parquet /
    * csv / xlsx / xml / orc): a typed slice lands as JSON, reads back
    * under an explicit schema, aggregates; oracle reads the parquet
    * original. */
  def jsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir, "orders").filter(col("o_orderkey") < 5000)
      .select(col("o_orderkey"), col("o_orderstatus"), cents(col("o_totalprice")).as("c"))
    val path = "target/json_fixture_" + dir.replaceAll("[^A-Za-z0-9]", "_")
    src.write.mode("overwrite").json(path)
    s.read.schema("o_orderkey LONG, o_orderstatus STRING, c LONG").json(path)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sum_c"))
      .select(col("o_orderstatus"), col("n"), (col("sum_c") / 100.0).as("total"))
      .orderBy("o_orderstatus")
  }

  val jsonRoundtripSql: String = """
SELECT o_orderstatus, COUNT(*) AS n,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total
FROM orders WHERE o_orderkey < 5000
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""

  /** Triangle participation per node of the corpus 3-NN graph, built
    * the scale-safe way end to end: neighbors come from a sign-bucket
    * LSH equi-self-join (never a cross join), and the count uses
    * degree-ordered orientation so the quadratic wedge step is bounded
    * by out-degree ≤ O(√m) per node (`operators/Triangles`). */
  def triangleKnn(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFns._
    import graft.operators.{Knn, Triangles}
    import org.apache.spark.sql.expressions.Window
    // Bucketed frame feeds both sides of a self-join — materialize once.
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("e"))
      .withColumn("bucket", signBucket(col("e"), 8))
      .localCheckpoint(true)
    val sims = e.as("a").join(e.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("qid"), col("b.vec_id").as("vec_id"),
        Knn.truncSim(cosineFast(col("a.e"), col("b.e"))).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    val knn = sims.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .select(col("qid").as("src"), col("vec_id").as("dst"))
    Triangles.perNode(knn)
      .select(col("node").as("vec_id"), col("n_tri"))
      .orderBy("vec_id")
  }

  val triangleKnnSql: String = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (SELECT vec_id, v,
        (CASE WHEN v[1] > 0 THEN 1 ELSE 0 END) + (CASE WHEN v[2] > 0 THEN 2 ELSE 0 END) +
        (CASE WHEN v[3] > 0 THEN 4 ELSE 0 END) + (CASE WHEN v[4] > 0 THEN 8 ELSE 0 END) +
        (CASE WHEN v[5] > 0 THEN 16 ELSE 0 END) + (CASE WHEN v[6] > 0 THEN 32 ELSE 0 END) +
        (CASE WHEN v[7] > 0 THEN 64 ELSE 0 END) + (CASE WHEN v[8] > 0 THEN 128 ELSE 0 END) AS bucket
      FROM e),
sims AS (
  SELECT a.vec_id AS qid, b2.vec_id AS vid,
         CAST(floor(list_cosine_similarity(a.v, b2.v) * 1000000) AS DOUBLE) / 1000000.0 AS sim
  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id <> b2.vec_id),
r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vid) AS rank FROM sims),
ed AS (SELECT DISTINCT least(qid, vid) AS u, greatest(qid, vid) AS v FROM r WHERE rank <= 3),
deg AS (SELECT n, COUNT(*) AS d
        FROM (SELECT u AS n FROM ed UNION ALL SELECT v AS n FROM ed) GROUP BY n),
orx AS (
  SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN u ELSE v END AS a,
         CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN v ELSE u END AS b
  FROM ed JOIN deg du ON du.n = ed.u JOIN deg dv ON dv.n = ed.v),
tri AS (
  SELECT x.a AS w0, x.b AS tu, y.b AS tv
  FROM orx x JOIN orx y ON x.a = y.a AND x.b < y.b
  WHERE EXISTS (SELECT 1 FROM ed WHERE ed.u = x.b AND ed.v = y.b)),
nodes AS (SELECT unnest([w0, tu, tv]) AS vec_id FROM tri)
SELECT vec_id, COUNT(*) AS n_tri FROM nodes GROUP BY vec_id ORDER BY vec_id
"""

  /** Community detection on the same projected graph family as
    * q_pagerank: 2 synchronous rounds of deterministic label propagation
    * (most-frequent neighbor label, ties → smallest label — see
    * [[graft.operators.LabelProp]] for why classic random-tiebreak async
    * LPA is irreproducible on a cluster). Per round: two map-side-
    * combinable hash aggregations keyed by node id, lineage cut per
    * round — the 100 TB cost is two same-partitioning shuffles per
    * round, no window, no collect. The DuckDB twin unrolls the same two
    * rounds with QUALIFY row_number tie-breaking. */
  def labelProp(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "lineitem").select(
      (col("l_orderkey") % 300).as("src"), (col("l_partkey") % 300).as("dst"))
    graft.operators.LabelProp.propagate(e, iters = 2)
      .orderBy("id")
  }

  val labelPropSql: String = {
    def round(k: Int): String = s"""
v$k AS (
  SELECT e.src, l.label AS nlabel, COUNT(*) AS cnt
  FROM e JOIN l${k - 1} l ON e.dst = l.id GROUP BY e.src, l.label),
l$k AS (
  SELECT src AS id, nlabel AS label FROM v$k
  QUALIFY row_number() OVER (PARTITION BY src ORDER BY cnt DESC, nlabel) = 1)"""
    s"""
WITH d AS (
  SELECT DISTINCT l_orderkey % 300 AS src, l_partkey % 300 AS dst FROM lineitem),
e AS (
  SELECT src, dst FROM d WHERE src <> dst
  UNION
  SELECT dst, src FROM d WHERE src <> dst),
l0 AS (SELECT DISTINCT src AS id, src AS label FROM e),${round(1)},${round(2)}
SELECT id, label FROM l2 ORDER BY id
"""
  }

  /** Malformed-record isolation on the JSON source — the R-job's C12
    * per-record error quarantine restated for JSON lines (reference:
    * the CSV side already proves it via PERMISSIVE from_csv): a staged
    * feed plants a corrupt line on every orderkey % 7 == 0 row, the
    * PERMISSIVE read routes breakage into `_corrupt_record` without
    * failing the job or poisoning neighbors, and the aggregate reports
    * good/bad counts plus the exact cents total of the surviving rows.
    * The oracle knows only the planting arithmetic — rows the reader
    * wrongly dropped or kept flip the hash. */
  def jsonCorrupt(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir, "orders").filter(col("o_orderkey") < 3000)
      .select(col("o_orderkey"), cents(col("o_totalprice")).as("c"))
    val good = to_json(struct(col("o_orderkey"), col("c")))
    val line = when(col("o_orderkey") % 7 === 0,
      concat(lit("{corrupt "), col("o_orderkey").cast("string"))).otherwise(good)
    val path = "target/json_corrupt_" + dir.replaceAll("[^A-Za-z0-9]", "_")
    src.select(line.as("value")).write.mode("overwrite").text(path)
    s.read
      .schema("o_orderkey LONG, c LONG, _corrupt_record STRING")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .agg(
        sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L)).as("n_good"),
        sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L)).as("n_bad"),
        (sum(when(col("_corrupt_record").isNull, col("c")).otherwise(0L))
          .cast("double") / 100.0).as("total_good"))
  }

  val jsonCorruptSql: String = """
SELECT CAST(SUM(CASE WHEN o_orderkey % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
       CAST(SUM(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
       CAST(SUM(CASE WHEN o_orderkey % 7 <> 0
                     THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS DOUBLE)
         / 100.0 AS total_good
FROM orders WHERE o_orderkey < 3000
"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_json_corrupt" -> (jsonCorrupt _),
    "q_label_prop" -> (labelProp _),
    "q_triangle_knn" -> (triangleKnn _),
    "q_salted_join" -> (saltedJoin _),
    "q_skew_join" -> (skewJoin _),
    "q_bucketed_join" -> (bucketedJoin _),
    "q_asof_broadcast" -> (asofBroadcast _),
    "q_zorder" -> (zorder _),
    "q_orc_roundtrip" -> (orcRoundtrip _),
    "q_pagerank" -> (pagerank _),
    "q_gap_fill" -> (gapFill _),
    "q_json_source" -> (jsonRoundtrip _))

  val oracles: Map[String, String] = Map(
    "q_json_corrupt" -> jsonCorruptSql,
    "q_label_prop" -> labelPropSql,
    "q_triangle_knn" -> triangleKnnSql,
    "q_salted_join" -> saltedJoinSql,
    "q_skew_join" -> skewJoinSql,
    "q_bucketed_join" -> bucketedJoinSql,
    "q_asof_broadcast" -> asofBroadcastSql,
    "q_zorder" -> zorderSql,
    "q_orc_roundtrip" -> orcRoundtripSql,
    "q_pagerank" -> pagerankSql,
    "q_gap_fill" -> gapFillSql,
    "q_json_source" -> jsonRoundtripSql)
}
