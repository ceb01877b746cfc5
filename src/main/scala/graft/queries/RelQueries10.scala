package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.KCore

/** Tenth relational/analytics batch: k-core peeling, grid-bucketed
  * spatial radius join, k-anonymity profiling, and autocorrelation —
  * four families (graph density, spatial, privacy/DQ, time series) the
  * engine had not yet covered with oracled queries.
  */
object RelQueries10 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** k-core of the order–part projection graph (same bounded-slice
    * family as q_label_prop / q_pagerank): 6 synchronous peel rounds at
    * k = 7 — chosen so the core is non-empty at EVERY test sf (the
    * driver smoke-checks rows > 0 at sf0.001, where this graph is ~8×
    * sparser than at sf0.01) and the peel genuinely cascades where the
    * graph is sparse (348 → 337 nodes over 3 rounds at sf0.001,
    * converged with margin inside the unroll; the denser sf0.01 graph
    * converges in one round). See [[graft.operators.KCore]] for the
    * per-round shuffle shape; the DuckDB twin unrolls the identical
    * rounds, which is sound because synchronous peeling is
    * deterministic (and the fixpoint itself is order-independent). */
  def kcore(s: SparkSession, dir: String): DataFrame = {
    val edges = t(s, dir, "lineitem")
      .filter(col("l_orderkey") < 40000)
      .select((col("l_orderkey") % 5000).as("src"), (col("l_partkey") % 5000).as("dst"))
    KCore.core(edges, k = 7, rounds = 6).orderBy("id")
  }

  val kcoreSql: String = {
    def round(r: Int): String = s""",
a$r AS (SELECT src AS id FROM (SELECT src, COUNT(*) AS c FROM e${r - 1} GROUP BY src) WHERE c >= 7),
e$r AS (SELECT e.src, e.dst FROM e${r - 1} e JOIN a$r x ON e.src = x.id JOIN a$r y ON e.dst = y.id)"""
    s"""
WITH d AS (
  SELECT l_orderkey % 5000 AS a, l_partkey % 5000 AS b
  FROM lineitem WHERE l_orderkey < 40000 AND l_orderkey % 5000 <> l_partkey % 5000),
e0 AS (SELECT a AS src, b AS dst FROM d UNION SELECT b, a FROM d)${(1 to 6).map(round).mkString}
SELECT src AS id, COUNT(*) AS deg FROM e6 GROUP BY src ORDER BY id
"""
  }

  /** Portable integer coordinate in [0, 100000) mixed from four md5 hex
    * chars — md5 is the one hash both engines spell identically (house
    * pattern: q_psi_drift's 256 md5-prefix buckets); ascii() folds the
    * hex chars into an integer without needing base conversion, which
    * DuckDB lacks. */
  private def coord(h: Column, off: Int): Column =
    (ascii(substring(h, off, 1)) * lit(1000003L) +
      ascii(substring(h, off + 1, 1)) * lit(8191L) +
      ascii(substring(h, off + 2, 1)) * lit(131L) +
      ascii(substring(h, off + 3, 1))) % 100000L

  /** Spatial radius self-join, the scale-safe way: points land in a
    * grid of radius-sized cells, candidate pairs come from a 3×3
    * neighbor-cell EQUI-join (one side exploded over the 9 offsets —
    * never a distance cross-join), and the exact integer squared
    * distance filters candidates. The classic grid/partition-based
    * spatial join (e.g. Patel & DeWitt SIGMOD'96 PBSM): a 3×3
    * neighborhood is a complete candidate set because the cell edge
    * equals the radius. At 100 TB the shuffle is keyed by cell — skew
    * only where points pile into one cell, the same salting story as
    * any hot key. Coordinates are md5-derived integers (deterministic,
    * engine-portable), distance arithmetic stays in BIGINT — exact. */
  def geoRadius(s: SparkSession, dir: String): DataFrame = {
    val h = md5(col("c_custkey").cast("string"))
    val g = t(s, dir, "customer")
      .select(col("c_custkey").as("id"), coord(h, 1).as("x"), coord(h, 5).as("y"))
      .withColumn("cx", (col("x") / 1200L).cast("long"))
      .withColumn("cy", (col("y") / 1200L).cast("long"))
      .localCheckpoint(true) // feeds both sides of the cell self-join
    val probe = g
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("id"), col("x"), col("y"),
        (col("cx") + col("dx")).as("cx"), (col("cy") + col("dy")).as("cy"))
    val d2 = (col("a.x") - col("b.x")) * (col("a.x") - col("b.x")) +
      (col("a.y") - col("b.y")) * (col("a.y") - col("b.y"))
    probe.as("a")
      .join(g.as("b"),
        col("a.cx") === col("b.cx") && col("a.cy") === col("b.cy") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("ida"), col("b.id").as("idb"), d2.as("dist2"))
      .filter(col("dist2") <= lit(1200L * 1200L))
      .orderBy(col("dist2"), col("ida"), col("idb"))
      .limit(50)
  }

  val geoRadiusSql: String = """
WITH p AS (
  SELECT c_custkey AS id,
    (ascii(substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1)) * 1000003 +
     ascii(substr(md5(CAST(c_custkey AS VARCHAR)), 2, 1)) * 8191 +
     ascii(substr(md5(CAST(c_custkey AS VARCHAR)), 3, 1)) * 131 +
     ascii(substr(md5(CAST(c_custkey AS VARCHAR)), 4, 1))) % 100000 AS x,
    (ascii(substr(md5(CAST(c_custkey AS VARCHAR)), 5, 1)) * 1000003 +
     ascii(substr(md5(CAST(c_custkey AS VARCHAR)), 6, 1)) * 8191 +
     ascii(substr(md5(CAST(c_custkey AS VARCHAR)), 7, 1)) * 131 +
     ascii(substr(md5(CAST(c_custkey AS VARCHAR)), 8, 1))) % 100000 AS y
  FROM customer),
g AS (SELECT id, x, y, x // 1200 AS cx, y // 1200 AS cy FROM p),
offs AS (SELECT a.dx, b.dy FROM (VALUES (-1),(0),(1)) a(dx), (VALUES (-1),(0),(1)) b(dy)),
probe AS (SELECT id, x, y, cx + dx AS cx, cy + dy AS cy FROM g, offs),
cand AS (
  SELECT a.id AS ida, b.id AS idb,
         (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
  FROM probe a JOIN g b ON a.cx = b.cx AND a.cy = b.cy AND a.id < b.id)
SELECT ida, idb, dist2 FROM cand WHERE dist2 <= 1200 * 1200
ORDER BY dist2, ida, idb LIMIT 50
"""

  /** k-anonymity profile (Sweeney 2002) over the quasi-identifier tuple
    * (market segment, nation, account-balance kilobucket): the
    * anonymity-class size histogram plus the rows-at-risk flag
    * (class size < 5) — the privacy-side data-quality gate a training
    * corpus runs before release, sibling of q_pii_redact. Shape: two
    * map-side-combinable aggregations (rows → classes → size
    * histogram); class count is bounded by the QI domain, so the second
    * agg is tiny. Exact integer arithmetic throughout. */
  def kAnonymity(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer")
      .select(col("c_mktsegment").as("seg"), col("c_nationkey").as("nat"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_kb"))
      .groupBy("seg", "nat", "bal_kb").agg(count(lit(1)).as("sz"))
      .groupBy("sz").agg(count(lit(1)).as("n_groups"), sum(col("sz")).as("n_rows"))
      .select(col("sz").as("class_size"), col("n_groups"), col("n_rows"),
        when(col("sz") < 5, 1L).otherwise(0L).as("risky"))
      .orderBy("class_size")
  }

  val kAnonymitySql: String = """
WITH q AS (
  SELECT c_mktsegment AS seg, c_nationkey AS nat,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_kb
  FROM customer),
grp AS (SELECT seg, nat, bal_kb, COUNT(*) AS sz FROM q GROUP BY seg, nat, bal_kb)
SELECT sz AS class_size, COUNT(*) AS n_groups, CAST(SUM(sz) AS BIGINT) AS n_rows,
       CASE WHEN sz < 5 THEN 1 ELSE 0 END AS risky
FROM grp GROUP BY sz ORDER BY sz
"""

  /** Sample autocorrelation (Box–Jenkins ACF) of the daily event-value
    * series per event type, lags 1–3 — the stationarity probe run
    * before any forecasting/seasonality model (companion to
    * q_seasonal_anomaly and q_ewma). Float discipline (house rule):
    * daily sums are floored to integer units and every moment (Σx, Σxy,
    * …) is summed as BIGINT — shuffle-order-proof; the ONE double
    * expression at the end (Pearson corr of the lag pairs) is the same
    * closed form in both engines over identical integers, then
    * micro-floored. Shape: one daily aggregation, a row_number index
    * per type, and an index equi-self-join per lag (broadcast-sized
    * series side at any scale that groups by day). */
  def acf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value")).cast("long")).as("v"))
    val idx = daily.select(col("event_type"), col("v"),
      row_number().over(
        Window.partitionBy("event_type").orderBy("day")).cast("long").as("i"))
      .localCheckpoint(true) // both sides of the lag self-join
    val pairs = idx.as("a")
      .withColumn("lag", explode(array(lit(1L), lit(2L), lit(3L))))
      .join(idx.as("b"),
        col("b.event_type") === col("a.event_type") && col("b.i") === col("a.i") + col("lag"))
      .select(col("a.event_type").as("event_type"), col("lag"),
        col("a.v").as("x"), col("b.v").as("y"))
    val m = pairs.groupBy("event_type", "lag").agg(
      count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sx2"),
      sum(col("y") * col("y")).as("sy2"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val den = sqrt((col("n") * col("sx2") - col("sx") * col("sx")).cast("double")) *
      sqrt((col("n") * col("sy2") - col("sy") * col("sy")).cast("double"))
    m.select(col("event_type"), col("lag"), col("n"),
        floor(lit(1000000.0) * (num / den)).cast("long").as("acf_micro"))
      .orderBy("event_type", "lag")
  }

  val acfSql: String = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY event_type, CAST(ts AS DATE)),
idx AS (SELECT event_type, v,
               CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS i
        FROM daily),
lags AS (SELECT CAST(l.lag AS BIGINT) AS lag FROM (VALUES (1),(2),(3)) l(lag)),
pairs AS (
  SELECT a.event_type, lg.lag, a.v AS x, b.v AS y
  FROM idx a JOIN lags lg ON true
  JOIN idx b ON b.event_type = a.event_type AND b.i = a.i + lg.lag),
m AS (
  SELECT event_type, lag, COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x*y) AS BIGINT) AS sxy,
         CAST(SUM(x*x) AS BIGINT) AS sx2, CAST(SUM(y*y) AS BIGINT) AS sy2
  FROM pairs GROUP BY event_type, lag)
SELECT event_type, lag, n,
       CAST(FLOOR(1000000.0 * (CAST(n*sxy - sx*sy AS DOUBLE) /
         (sqrt(CAST(n*sx2 - sx*sx AS DOUBLE)) * sqrt(CAST(n*sy2 - sy*sy AS DOUBLE))))) AS BIGINT) AS acf_micro
FROM m ORDER BY event_type, lag
"""

  /** First-order Markov transition matrix over each user's event-type
    * sequence — the behavioral-model summary (what follows what, with
    * probabilities) behind next-event prediction and anomaly scoring.
    * Probabilities are integral micro-units (n·10⁶ div row-total) so
    * every output is BIGINT. Shape: one lead() window per user (the
    * sequence is already the partition), then two map-side-combinable
    * aggregations; transition-matrix size is |types|², bounded. */
  def markovTransitions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("src"),
        lead(col("event_type"), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
    val cnt = pairs.groupBy("src", "dst").agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy("src").agg(sum("n").as("row_tot"))
    cnt.join(broadcast(tot), "src")
      .select(col("src"), col("dst"), col("n"),
        expr("n * 1000000 div row_tot").as("p_micro"))
      .orderBy("src", "dst")
  }

  val markovTransitionsSql: String = """
WITH seq AS (
  SELECT user_id, event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events),
pairs AS (SELECT src, dst FROM seq WHERE dst IS NOT NULL),
cnt AS (SELECT src, dst, COUNT(*) AS n FROM pairs GROUP BY src, dst),
tot AS (SELECT src, CAST(SUM(n) AS BIGINT) AS row_tot FROM cnt GROUP BY src)
SELECT c.src, c.dst, c.n, CAST(c.n * 1000000 // t.row_tot AS BIGINT) AS p_micro
FROM cnt c JOIN tot t USING (src) ORDER BY src, dst
"""

  /** Top session paths: gap-sessionize (the q_sessionize island
    * arithmetic on exact µs), take each session's first 3 event types
    * as a '>'-joined path, rank paths by session count — the classic
    * "how do sessions start" product-analytics query. Deterministic
    * string assembly: collect_list is order-free, so the path is built
    * by sorting (rn, type) structs — never by aggregation order. */
  def sessionPaths(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
    val brk = e.withColumn("brk",
      when(lag(col("us"), 1).over(w).isNull ||
        col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1L).otherwise(0L))
    val sess = brk.withColumn("sid",
      sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val rn = sess.withColumn("rn", row_number().over(
      Window.partitionBy("user_id", "sid").orderBy("us", "event_id")))
      .filter(col("rn") <= 3)
    rn.groupBy("user_id", "sid")
      .agg(expr("array_join(transform(array_sort(collect_list(struct(rn, event_type)))," +
        " x -> x.event_type), '>')").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path")).limit(10)
  }

  val sessionPathsSql: String = """
WITH e AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events),
b AS (
  SELECT user_id, event_type, event_id, us,
    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
g AS (
  SELECT user_id, event_type, event_id, us,
    SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM b),
rn AS (
  SELECT user_id, sid, event_type,
         row_number() OVER (PARTITION BY user_id, sid ORDER BY us, event_id) AS rn
  FROM g),
paths AS (
  SELECT user_id, sid, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM rn WHERE rn <= 3 GROUP BY user_id, sid)
SELECT path, COUNT(*) AS n_sessions
FROM paths GROUP BY path ORDER BY n_sessions DESC, path LIMIT 10
"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_kcore" -> (kcore _),
    "q_geo_radius" -> (geoRadius _),
    "q_kanonymity" -> (kAnonymity _),
    "q_acf" -> (acf _),
    "q_markov_transitions" -> (markovTransitions _),
    "q_session_paths" -> (sessionPaths _))

  val oracles: Map[String, String] = Map(
    "q_kcore" -> kcoreSql,
    "q_geo_radius" -> geoRadiusSql,
    "q_kanonymity" -> kAnonymitySql,
    "q_acf" -> acfSql,
    "q_markov_transitions" -> markovTransitionsSql,
    "q_session_paths" -> sessionPathsSql)
}
