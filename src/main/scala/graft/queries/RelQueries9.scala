package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns.{normalizeText, tokens}
import graft.operators.Bfs

/** Ninth relational batch: graph shortest paths, ranked retrieval,
  * importance-resampled data selection, and a categorical independence
  * test — each exactly oracled with the house integer/micro-unit float
  * discipline (every transcendental is one scalar chain floor-truncated
  * to a long BEFORE any order-sensitive sum).
  */
object RelQueries9 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  // ------------------------------------------------------------- BFS hops

  /** Single-source BFS over the part-derived sparse graph
    * (partkey%1000 — (partkey+size)%1000, symmetrized): minimum hop
    * count from node 0, capped at 6 hops. The cap is what makes a
    * DuckDB twin possible: its recursive CTE explores the same bounded
    * walk set (UNION-dedup on (id, hops) pairs terminates under the
    * cap) and MIN(hops) per node is exactly the BFS distance. Spark
    * side is [[Bfs.hops]] — per-round frontier expansion, one shuffle
    * keyed by node id per round, lineage cut per round. */
  def bfsHops(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "part").select(
      (col("p_partkey") % 1000).as("src"),
      ((col("p_partkey") + col("p_size")) % 1000).as("dst"))
    Bfs.hops(e, source = 0L, maxHops = 6).orderBy("id")
  }

  val bfsHopsSql: String = """
WITH RECURSIVE d AS (
  SELECT p_partkey % 1000 AS src, (p_partkey + p_size) % 1000 AS dst FROM part),
e AS (
  SELECT src, dst FROM d WHERE src <> dst
  UNION
  SELECT dst, src FROM d WHERE src <> dst),
walk(id, hops) AS (
  SELECT CAST(0 AS BIGINT) AS id, CAST(0 AS BIGINT) AS hops
  UNION
  SELECT e.dst, w.hops + 1 FROM walk w JOIN e ON e.src = w.id WHERE w.hops < 6)
SELECT id, CAST(MIN(hops) AS BIGINT) AS hops FROM walk GROUP BY id ORDER BY id
"""

  // ----------------------------------------------------------------- BM25

  /** Okapi BM25 ranked retrieval (Robertson et al., TREC-3 1994) of the
    * top 25 documents for a fixed 3-term query, k1 = 1.2, b = 0.75.
    * Corpus statistics are classic one-pass aggregates: doc length,
    * per-term document frequency (restricted to the query terms before
    * the distinct — df work is O(matching postings), not O(corpus
    * vocabulary)), and a singleton (N, Σdl) row broadcast onto the
    * scoring join. avgdl is held as integer micro-units via integral
    * division so both engines divide the same longs. Each (doc, term)
    * score is one scalar chain over integers (tf, dl, df, N) floored to
    * micro-units, then summed exactly as longs per doc — shuffle-order-
    * proof, same discipline as q_lm_score. */
  def bm25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qt = Seq("merge", "hash", "window").toDF("tok")
    val docs = t(s, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"),
        tokens(normalizeText(col("text"))).as("toks"))
    val tk = docs.select(col("doc_id"), explode(col("toks")).as("tok"))
    // dl = per-doc token count: size() on the un-exploded array — no
    // corpus-wide explode→shuffle just to count. The dl > 0 filter keeps
    // explode semantics (a zero-token doc has no postings rows, so it
    // must not count toward n_docs/avgdl either).
    val dl = docs.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
      .filter(col("dl") > 0)
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val posting = tk.join(broadcast(qt), "tok")
    val dfq = posting.select("doc_id", "tok").distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val tf = posting.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    tf.join(broadcast(dfq), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl_micro", expr("sum_dl * 1000000 div n_docs"))
      .withColumn("idf_micro",
        floor(log((col("n_docs").cast("double") - col("df").cast("double") + 0.5)
          / (col("df").cast("double") + 0.5) + 1.0) * 1e6).cast("long"))
      .withColumn("sc_micro",
        floor((col("idf_micro").cast("double") / 1e6)
          * (col("tf").cast("double") * 2.2)
          / (col("tf").cast("double")
            + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") * 1e6
              / col("avgdl_micro").cast("double")))
          * 1e6).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("sc_micro").as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(25)
  }

  val bm25Sql: String = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN length(s) > 0 THEN string_split(s, ' ') ELSE [] END AS toks
  FROM (SELECT doc_id,
               trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s
        FROM documents)),
tk AS (SELECT doc_id, unnest(toks) AS tok FROM d),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tk GROUP BY doc_id),
st AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
qt AS (SELECT unnest(['merge', 'hash', 'window']) AS tok),
p AS (SELECT doc_id, tok FROM tk JOIN qt USING (tok)),
dfq AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM p GROUP BY tok),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM p GROUP BY doc_id, tok),
sc AS (
  SELECT t.doc_id,
    CAST(floor(
      (CAST(floor(ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                     / (CAST(df AS DOUBLE) + 0.5) + 1.0) * 1e6) AS BIGINT) / 1e6)
      * (CAST(tf AS DOUBLE) * 2.2)
      / (CAST(tf AS DOUBLE)
         + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) * 1e6
           / CAST(sum_dl * 1000000 // n_docs AS DOUBLE)))
      * 1e6) AS BIGINT) AS sc_micro
  FROM tf t JOIN dfq USING (tok) JOIN dl USING (doc_id), st)
SELECT doc_id, COUNT(*) AS n_terms, CAST(SUM(sc_micro) AS BIGINT) AS score_micro
FROM sc GROUP BY doc_id
ORDER BY score_micro DESC, doc_id LIMIT 25
"""

  // ----------------------------------------------------------------- DSIR

  /** DSIR-style importance-resampled data selection (Xie et al.,
    * NeurIPS 2023): rank raw-corpus documents by how target-like their
    * hashed n-gram feature distribution is. Features are 256 md5-prefix
    * unigram buckets; the bucket LM is the Laplace-smoothed log ratio
    * ln(p_target/p_raw), computed per bucket from four integers and
    * floor-truncated to micro-nats; a document's importance weight is
    * the EXACT long sum of its tokens' bucket ratios. The 256-row LM
    * broadcasts onto the token stream — corpus-sized work is one
    * explode plus two hash aggregations, the 100 TB shape. Target here:
    * lang = 'en' (selecting target-like docs out of the mixed pool). */
  def dsirSelect(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("lang"),
        tokens(normalizeText(col("text"))).as("toks"))
    val tk = docs.select(col("doc_id"), col("lang"), explode(col("toks")).as("tok"))
      .withColumn("bucket", substring(md5(col("tok")), 1, 2))
    val raw = tk.groupBy("bucket").agg(count(lit(1)).as("rawc"))
    val tgt = tk.filter(col("lang") === "en")
      .groupBy("bucket").agg(count(lit(1)).as("tgtc"))
    val w = Window.partitionBy()
    val lm = raw.join(tgt, Seq("bucket"), "left")
      .na.fill(0L, Seq("tgtc"))
      .withColumn("rawn", sum("rawc").over(w))
      .withColumn("tgtn", sum("tgtc").over(w))
      .withColumn("lr_micro", floor(log(
        ((col("tgtc") + 1L) * (col("rawn") + 256L)).cast("double")
          / ((col("rawc") + 1L) * (col("tgtn") + 256L)).cast("double")) * 1e6)
        .cast("long"))
    tk.join(broadcast(lm.select("bucket", "lr_micro")), "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"), sum("lr_micro").as("w_micro"))
      .join(docs.select("doc_id", "lang"), "doc_id")
      .select("doc_id", "lang", "n_toks", "w_micro")
      .orderBy(col("w_micro").desc, col("doc_id"))
      .limit(30)
  }

  val dsirSelectSql: String = """
WITH d AS (
  SELECT doc_id, lang,
         CASE WHEN length(s) > 0 THEN string_split(s, ' ') ELSE [] END AS toks
  FROM (SELECT doc_id, lang,
               trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s
        FROM documents)),
tk AS (
  SELECT doc_id, lang, substr(md5(tok), 1, 2) AS bucket
  FROM (SELECT doc_id, lang, unnest(toks) AS tok FROM d)),
raw AS (SELECT bucket, COUNT(*) AS rawc FROM tk GROUP BY bucket),
tgt AS (SELECT bucket, COUNT(*) AS tgtc FROM tk WHERE lang = 'en' GROUP BY bucket),
lm AS (
  SELECT bucket,
    CAST(floor(ln(CAST((tgtc + 1) * (rawn + 256) AS DOUBLE)
                  / CAST((rawc + 1) * (tgtn + 256) AS DOUBLE)) * 1e6) AS BIGINT)
      AS lr_micro
  FROM (SELECT r.bucket, rawc, COALESCE(tgtc, 0) AS tgtc,
               CAST(SUM(rawc) OVER () AS BIGINT) AS rawn,
               CAST(SUM(COALESCE(tgtc, 0)) OVER () AS BIGINT) AS tgtn
        FROM raw r LEFT JOIN tgt USING (bucket))),
sc AS (
  SELECT doc_id, COUNT(*) AS n_toks, CAST(SUM(lr_micro) AS BIGINT) AS w_micro
  FROM tk JOIN lm USING (bucket) GROUP BY doc_id)
SELECT s.doc_id, dd.lang, n_toks, w_micro
FROM sc s JOIN documents dd ON s.doc_id = dd.doc_id
ORDER BY w_micro DESC, s.doc_id LIMIT 30
"""

  // ----------------------------------------------------- chi-square test

  /** Pearson chi-square independence test (Pearson 1900) of order
    * status × priority: the 3×5 contingency table with expected counts
    * under independence and per-cell contributions. Margins and the
    * grand total are window sums over the 15-row aggregate (never the
    * fact table); expected counts are held in integer micro-units via
    * integral division, each cell's (O-E)²/E is one scalar chain floored
    * to micro-units, and the statistic is the order-independent long sum
    * of the cells. One corpus-sized hash aggregation total. */
  def chiSquare(s: SparkSession, dir: String): DataFrame = {
    val cell = t(s, dir, "orders")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_obs"))
      .withColumn("row_tot", sum("n_obs").over(Window.partitionBy("o_orderstatus")))
      .withColumn("col_tot", sum("n_obs").over(Window.partitionBy("o_orderpriority")))
      .withColumn("n_tot", sum("n_obs").over(Window.partitionBy()))
      .withColumn("exp_micro", expr("row_tot * col_tot * 1000000 div n_tot"))
    val d = col("n_obs").cast("double") - col("exp_micro").cast("double") / 1e6
    cell
      .withColumn("contrib_micro",
        floor(d * d / (col("exp_micro").cast("double") / 1e6) * 1e6).cast("long"))
      .withColumn("chi2_micro", sum("contrib_micro").over(Window.partitionBy()))
      .select(col("o_orderstatus"), col("o_orderpriority"), col("n_obs"),
        col("exp_micro"), col("contrib_micro"), col("chi2_micro"))
      .orderBy("o_orderstatus", "o_orderpriority")
  }

  val chiSquareSql: String = """
WITH obs AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_obs
  FROM orders GROUP BY o_orderstatus, o_orderpriority),
tot AS (
  SELECT o_orderstatus, o_orderpriority, n_obs,
         CAST(SUM(n_obs) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS row_tot,
         CAST(SUM(n_obs) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS col_tot,
         CAST(SUM(n_obs) OVER () AS BIGINT) AS n_tot
  FROM obs),
cell AS (
  SELECT o_orderstatus, o_orderpriority, n_obs,
         CAST(row_tot * col_tot * 1000000 // n_tot AS BIGINT) AS exp_micro
  FROM tot),
ct AS (
  SELECT o_orderstatus, o_orderpriority, n_obs, exp_micro,
    CAST(floor((CAST(n_obs AS DOUBLE) - CAST(exp_micro AS DOUBLE) / 1e6)
               * (CAST(n_obs AS DOUBLE) - CAST(exp_micro AS DOUBLE) / 1e6)
               / (CAST(exp_micro AS DOUBLE) / 1e6) * 1e6) AS BIGINT)
      AS contrib_micro
  FROM cell)
SELECT o_orderstatus, o_orderpriority, n_obs, exp_micro, contrib_micro,
       CAST(SUM(contrib_micro) OVER () AS BIGINT) AS chi2_micro
FROM ct ORDER BY o_orderstatus, o_orderpriority
"""

  // ------------------------------------------------- Q21 waiting supplier

  /** TPC-H Q21 shape (the lone-blamed-supplier query, restated over the
    * columns this schema carries: "late" = shipped > 60 days after the
    * order date): lines of finished multi-supplier orders whose supplier
    * is the ONLY late one, counted per supplier. The reference SQL is
    * doubly-correlated (EXISTS other-supplier ∧ NOT EXISTS other-late-
    * supplier — and that literal form IS the oracle); the Spark plan
    * decorrelates both subqueries into ONE per-order profile pass
    * (distinct suppliers, distinct late suppliers) joined back — two
    * shuffles keyed by orderkey instead of three correlated scans of
    * lineitem, the 100 TB rewrite Catalyst cannot do on its own for
    * this doubly-nested shape. */
  def q21Waiting(s: SparkSession, dir: String): DataFrame = {
    // One pass to (order, supplier) grain — lineitem is scanned ONCE;
    // the order profile and the join back both key on l_orderkey, so
    // the second aggregation and the join reuse one partitioning.
    val os = t(s, dir, "lineitem")
      .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("late", col("l_shipdate") > date_add(col("o_orderdate"), 60))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(sum(when(col("late"), 1L).otherwise(0L)).as("late_lines"))
      // Materialized once — the (order, supplier) grain feeds BOTH the
      // per-order profile and the join back, so lineitem is scanned a
      // single time structurally (AQE's runtime exchange reuse would
      // dedup the stages anyway, but only after execution starts; the
      // checkpoint makes the one-scan shape hold in the static plan and
      // caps the recompute risk if the two consumers schedule apart).
      .localCheckpoint(true)
    val prof = os.groupBy("l_orderkey").agg(
      count(lit(1)).as("n_supp"),
      sum(when(col("late_lines") > 0, 1L).otherwise(0L)).as("n_late_supp"))
    os.filter(col("late_lines") > 0)
      .join(prof, "l_orderkey")
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
      .join(t(s, dir, "supplier").select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(sum(col("late_lines")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  val q21WaitingSql: String = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10
"""

  // ------------------------------------------------------------ OLS trend

  /** Per-type linear trend of daily event revenue — exact OLS from the
    * five classic sufficient statistics (n, Σx, Σy, Σxy, Σx²), which
    * are map-side-combinable integer sums over cents and day indexes:
    * the closed-form slope numerator/denominator are BIGINT-exact, and
    * the only float ops are two scalar divisions at the very end (one
    * per coefficient) — no order-sensitive float accumulation anywhere.
    * The 100 TB shape: one hash aggregation to days, one to types. */
  def olsTrend(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      .withColumn("x", datediff(col("day"), lit("2024-01-01")).cast("long"))
    daily.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("slope_cents",
        col("num").cast("double") / col("den").cast("double"))
      .withColumn("intercept_cents",
        (col("sy").cast("double") - col("slope_cents") * col("sx").cast("double"))
          / col("n").cast("double"))
      .select("event_type", "n", "num", "den", "slope_cents", "intercept_cents")
      .orderBy("event_type")
  }

  val olsTrendSql: String = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY event_type, CAST(ts AS DATE)),
xy AS (
  SELECT event_type, date_diff('day', DATE '2024-01-01', day) AS x, y FROM daily),
st AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM xy GROUP BY event_type),
co AS (
  SELECT event_type, n, n * sxy - sx * sy AS num, n * sxx - sx * sx AS den,
         CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
           AS slope_cents
  FROM st)
SELECT c.event_type, c.n, c.num, c.den, c.slope_cents,
       (CAST(s.sy AS DOUBLE) - c.slope_cents * CAST(s.sx AS DOUBLE))
         / CAST(c.n AS DOUBLE) AS intercept_cents
FROM co c JOIN st s USING (event_type)
ORDER BY c.event_type
"""

  // ------------------------------------------------------------ winsorize

  /** Winsorized statistics per return flag: order-statistic cutpoints
    * at the ceil(5%)/ceil(95%) row positions under a TOTAL order (value,
    * orderkey, linenumber — duplicate cents exist by construction), all
    * values clipped into [lo, hi], then exact integer sums. Rank-based
    * winsorization (not interpolated percentiles) keeps every
    * intermediate a long, so Spark and DuckDB agree bit-for-bit. Cost
    * shape: one window rank + one windowed cutpoint broadcast within
    * the partition, both on the same groupBy key partitioning. */
  def winsorize(s: SparkSession, dir: String): DataFrame = {
    val c = round(col("l_extendedprice") * 100).cast("long")
    val base = t(s, dir, "lineitem")
      .select(col("l_returnflag"), c.as("c"), col("l_orderkey"), col("l_linenumber"))
    val wOrd = Window.partitionBy("l_returnflag")
      .orderBy(col("c"), col("l_orderkey"), col("l_linenumber"))
    val wAll = Window.partitionBy("l_returnflag")
    val ranked = base
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("lo_pos", expr("(n * 5 + 99) div 100"))
      .withColumn("hi_pos", expr("(n * 95 + 99) div 100"))
    ranked
      .withColumn("lo", max(when(col("rn") === col("lo_pos"), col("c"))).over(wAll))
      .withColumn("hi", max(when(col("rn") === col("hi_pos"), col("c"))).over(wAll))
      .withColumn("clipped", least(greatest(col("c"), col("lo")), col("hi")))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        max(col("lo")).as("lo_c"), max(col("hi")).as("hi_c"),
        sum(col("clipped")).as("sum_clip"))
      .select(col("l_returnflag"), col("n_rows"),
        (col("lo_c") / 100.0).as("lo_cut"), (col("hi_c") / 100.0).as("hi_cut"),
        (col("sum_clip").cast("double") / 100.0 / col("n_rows").cast("double"))
          .as("wins_mean"))
      .orderBy("l_returnflag")
  }

  val winsorizeSql: String = """
WITH base AS (
  SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
         l_orderkey, l_linenumber
  FROM lineitem),
ranked AS (
  SELECT l_returnflag, c,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY c, l_orderkey, l_linenumber) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM base),
cuts AS (
  SELECT l_returnflag,
         MAX(CASE WHEN rn = (n * 5 + 99) // 100 THEN c END) AS lo,
         MAX(CASE WHEN rn = (n * 95 + 99) // 100 THEN c END) AS hi
  FROM ranked GROUP BY l_returnflag)
SELECT r.l_returnflag, COUNT(*) AS n_rows,
       MAX(t.lo) / 100.0 AS lo_cut, MAX(t.hi) / 100.0 AS hi_cut,
       CAST(SUM(least(greatest(r.c, t.lo), t.hi)) AS DOUBLE) / 100.0 / CAST(COUNT(*) AS DOUBLE)
         AS wins_mean
FROM ranked r JOIN cuts t USING (l_returnflag)
GROUP BY r.l_returnflag ORDER BY r.l_returnflag
"""

  // ---------------------------------------------------------- attribution

  /** Last-touch conversion attribution: each purchase credits the most
    * recent earlier view/click/signup of the same user (no touch →
    * 'direct'), rolled up to conversions + revenue per channel — the
    * marketing restatement of the backward as-of join, reusing
    * [[graft.operators.AsOfJoin.backward]] (union + window, one
    * user-keyed shuffle). Touches are pre-deduped to unique (user, ts)
    * with a max(channel) tiebreak so equal-timestamp touches cannot
    * make the as-of pick engine-dependent; DuckDB's native ASOF LEFT
    * JOIN over the identically-deduped feed is the oracle. */
  def attribution(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.AsOfJoin
    val ev = t(s, dir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"),
        round(col("value") * 100).cast("long").as("rev"))
    val tch = ev.filter(col("event_type").isin("view", "click", "signup"))
      .groupBy(col("user_id").as("t_user"), col("ts").as("touch_ts"))
      .agg(max(col("event_type")).as("channel"))
    AsOfJoin.backward(p, "user_id", "ts", tch, "t_user", "touch_ts", Seq("channel"))
      .groupBy(coalesce(col("channel"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_conv"),
        (sum(col("rev")).cast("double") / 100.0).as("revenue"))
      .orderBy("channel")
  }

  val attributionSql: String = """
WITH p AS (
  SELECT user_id, event_id, ts, CAST(round(value * 100) AS BIGINT) AS rev
  FROM events WHERE event_type = 'purchase'),
tch AS (
  SELECT user_id AS t_user, ts AS touch_ts, max(event_type) AS channel
  FROM events WHERE event_type IN ('view', 'click', 'signup')
  GROUP BY user_id, ts),
a AS (
  SELECT p.rev, t.channel
  FROM p ASOF LEFT JOIN tch t
    ON p.user_id = t.t_user AND t.touch_ts <= p.ts)
SELECT COALESCE(channel, 'direct') AS channel, COUNT(*) AS n_conv,
       CAST(SUM(rev) AS DOUBLE) / 100.0 AS revenue
FROM a GROUP BY COALESCE(channel, 'direct') ORDER BY channel
"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_attribution" -> (attribution _),
    "q_bfs_hops" -> (bfsHops _),
    "q_bm25" -> (bm25 _),
    "q_dsir_select" -> (dsirSelect _),
    "q_chi_square" -> (chiSquare _),
    "q21_waiting" -> (q21Waiting _),
    "q_ols_trend" -> (olsTrend _),
    "q_winsorize" -> (winsorize _))

  val oracles: Map[String, String] = Map(
    "q_attribution" -> attributionSql,
    "q_bfs_hops" -> bfsHopsSql,
    "q_bm25" -> bm25Sql,
    "q_dsir_select" -> dsirSelectSql,
    "q_chi_square" -> chiSquareSql,
    "q21_waiting" -> q21WaitingSql,
    "q_ols_trend" -> olsTrendSql,
    "q_winsorize" -> winsorizeSql)
}
