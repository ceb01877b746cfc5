package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Twelfth relational/analytics batch: market-basket association rules,
  * rolling windowed correlation, Benford's-law digit profiling, Shannon
  * entropy column profiling, Herfindahl concentration, and a greedy
  * 3-step sequential conversion chain. Same exact-arithmetic discipline
  * as RelQueries11; the two queries that touch a logarithm floor each
  * term to integral micros before summing (the q_bigram_lm float
  * pattern), so aggregation order can never perturb the result.
  */
object RelQueries12 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** Association rules over order baskets (Agrawal–Srikant's
    * support/confidence/lift, VLDB'94): items are (order, brand) pairs,
    * co-occurrence from a basket self-join keyed by order — partition
    * width is one order's distinct brands (≤ basket size), never the
    * catalog. conf = P(cons|ante), lift = P(ante∧cons)/(P(ante)P(cons))
    * in integral micros; top 15 by lift. */
  def assocRules(s: SparkSession, dir: String): DataFrame = {
    // The (order, brand) basket table feeds four consumers (order count,
    // per-brand counts, both sides of the co-occurrence self-join) —
    // checkpoint the 2-column distinct projection so the lineitem⨝part
    // join runs once, not four times. This is the staged basket table a
    // market-basket pipeline persists at scale.
    val items = t(s, dir, "lineitem").as("l")
      .join(t(s, dir, "part").as("p"), col("l.l_partkey") === col("p.p_partkey"))
      .select(col("l.l_orderkey").as("ok"), col("p.p_brand").as("brand"))
      .distinct()
      .localCheckpoint(true)
    val nOrd = items.agg(countDistinct(col("ok")).as("n"))
    val cnt = items.groupBy("brand").agg(count(lit(1)).as("c"))
    val pairs = items.as("a").join(items.as("b"),
        col("a.ok") === col("b.ok") && col("a.brand") < col("b.brand"))
      .groupBy(col("a.brand").as("ante"), col("b.brand").as("cons"))
      .agg(count(lit(1)).as("cooc"))
    pairs
      .join(cnt.select(col("brand").as("ante"), col("c").as("ca")), "ante")
      .join(cnt.select(col("brand").as("cons"), col("c").as("cb")), "cons")
      .crossJoin(broadcast(nOrd))
      .select(col("ante"), col("cons"), col("cooc"),
        expr("cooc * 1000000 div ca").as("conf_micro"),
        expr("n * cooc * 1000000 div (ca * cb)").as("lift_micro"))
      .orderBy(col("lift_micro").desc, col("ante"), col("cons")).limit(15)
  }

  val assocRulesSql: String = """
WITH items AS (
  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
n_ord AS (SELECT COUNT(DISTINCT ok) AS n FROM items),
cnt AS (SELECT brand, COUNT(*) AS c FROM items GROUP BY brand),
pairs AS (
  SELECT a.brand AS ante, b.brand AS cons, COUNT(*) AS cooc
  FROM items a JOIN items b ON a.ok = b.ok AND a.brand < b.brand
  GROUP BY 1, 2)
SELECT ante, cons, CAST(cooc AS BIGINT) AS cooc,
  CAST(cooc * 1000000 // ca.c AS BIGINT) AS conf_micro,
  CAST(n.n * cooc * 1000000 // (ca.c * cb.c) AS BIGINT) AS lift_micro
FROM pairs JOIN cnt ca ON ante = ca.brand JOIN cnt cb ON cons = cb.brand, n_ord n
ORDER BY lift_micro DESC, ante, cons LIMIT 15
"""

  /** Rolling 7-day Pearson correlation between the click and purchase
    * daily-count series — the co-movement monitor behind "did the
    * funnel decouple this week". One day-grain aggregate, then every
    * moment (n, Σx, Σy, Σxy, Σx², Σy²) as an exact-integer windowed
    * prefix sum over 6 PRECEDING — the q_corr_matrix closed form
    * evaluated per window frame. Degenerate frames (zero variance) are
    * filtered before the division on both sides. */
  def rollingCorr(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
    // global window audit (r19): frame input = day-grain aggregate
    // (one row per calendar day) — date-range-bounded
    val win = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    val w = d.select(col("day"),
      count(lit(1)).over(win).as("n"),
      sum(col("x")).over(win).as("sx"), sum(col("y")).over(win).as("sy"),
      sum(col("x") * col("y")).over(win).as("sxy"),
      sum(col("x") * col("x")).over(win).as("sxx"),
      sum(col("y") * col("y")).over(win).as("syy"))
    val vx = col("n").cast("double") * col("sxx") - col("sx").cast("double") * col("sx")
    val vy = col("n").cast("double") * col("syy") - col("sy").cast("double") * col("sy")
    w.filter(col("n") === 7 && vx * vy > 0)
      .select(col("day"), col("n"),
        floor(lit(1000000.0) *
          (col("n").cast("double") * col("sxy") - col("sx").cast("double") * col("sy")) /
          sqrt(vx * vy)).cast("long").as("corr_micro"))
      .orderBy("day").limit(20)
  }

  val rollingCorrSql: String = """
WITH d AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
    SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS x,
    SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS y
  FROM events GROUP BY 1),
w AS (
  SELECT day,
    COUNT(*) OVER win AS n, SUM(x) OVER win AS sx, SUM(y) OVER win AS sy,
    SUM(x*y) OVER win AS sxy, SUM(x*x) OVER win AS sxx, SUM(y*y) OVER win AS syy
  FROM d WINDOW win AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
SELECT day, CAST(n AS BIGINT) AS n,
  CAST(floor(1000000.0 * (CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy) /
    sqrt((CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx) * (CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy))) AS BIGINT) AS corr_micro
FROM w WHERE n = 7
  AND (CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx) * (CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy) > 0
ORDER BY day LIMIT 20
"""

  /** Benford's-law first-significant-digit profile of order totals —
    * the fraud/synthetic-data smoke test (Nigrini's digit analysis):
    * observed digit frequencies vs the log10(1+1/d) expectation, both
    * in micros. The digit comes from the cents-integer's decimal
    * rendering, so no float touches the grouping key. (This testdata
    * is uniform-ish, so the deviation itself is the signal the check
    * exists to surface.) */
  def benford(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "orders").filter(col("o_totalprice") > 0)
      .select(substring(round(col("o_totalprice") * 100).cast("long").cast("string"), 1, 1)
        .cast("long").as("digit"))
    val cnt = d.groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = cnt.agg(sum(col("n")).as("t"))
    cnt.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        expr("n * 1000000 div t").as("observed_micro"),
        floor(lit(1000000.0) * log(10.0, lit(1.0) + lit(1.0) / col("digit")))
          .cast("long").as("benford_micro"))
      .orderBy("digit")
  }

  val benfordSql: String = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice*100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders WHERE o_totalprice > 0),
cnt AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
tot AS (SELECT SUM(n) AS t FROM cnt)
SELECT digit, CAST(n AS BIGINT) AS n,
  CAST(n * 1000000 // t AS BIGINT) AS observed_micro,
  CAST(floor(1000000.0 * log10(1.0 + 1.0/digit)) AS BIGINT) AS benford_micro
FROM cnt, tot ORDER BY digit
"""

  /** Shannon entropy per categorical column — the profiling signal
    * that ranks columns by information content (near-zero entropy →
    * constant column; log2(k) → uniform). Each −p·log2(p) term is
    * floored to integral micros BEFORE the sum (the q_bigram_lm
    * pattern), so the result is independent of aggregation order and
    * engine. One stacked scan, one count per (column, value) — value
    * cardinality bounds everything. */
  def columnEntropy(s: SparkSession, dir: String): DataFrame = {
    val stacked = t(s, dir, "events").select(lit("events.event_type").as("col_name"),
        col("event_type").as("v"))
      .union(t(s, dir, "orders").select(lit("orders.o_orderpriority"), col("o_orderpriority")))
      .union(t(s, dir, "documents").select(lit("documents.lang"), col("lang")))
    val cnt = stacked.groupBy("col_name", "v").agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy("col_name").agg(sum(col("n")).as("t"), count(lit(1)).as("k"))
    val p = col("n").cast("double") / col("t")
    cnt.join(tot, "col_name")
      .select(col("col_name"), col("k"),
        floor(lit(-1000000.0) * p * log2(p)).cast("long").as("h_micro"))
      .groupBy("col_name", "k").agg(sum(col("h_micro")).as("entropy_micro"))
      .select(col("col_name"), col("k").as("n_distinct"), col("entropy_micro"))
      .orderBy("col_name")
  }

  val columnEntropySql: String = """
WITH s AS (
  SELECT 'events.event_type' AS col_name, event_type AS v FROM events
  UNION ALL SELECT 'orders.o_orderpriority', o_orderpriority FROM orders
  UNION ALL SELECT 'documents.lang', lang FROM documents),
cnt AS (SELECT col_name, v, COUNT(*) AS n FROM s GROUP BY 1, 2),
tot AS (SELECT col_name, SUM(n) AS t, COUNT(*) AS k FROM cnt GROUP BY 1),
term AS (
  SELECT c.col_name, t.k,
    CAST(floor(-1000000.0 * (CAST(c.n AS DOUBLE)/t.t) * log2(CAST(c.n AS DOUBLE)/t.t)) AS BIGINT) AS h_micro
  FROM cnt c JOIN tot t ON c.col_name = t.col_name)
SELECT col_name, CAST(k AS BIGINT) AS n_distinct, CAST(SUM(h_micro) AS BIGINT) AS entropy_micro
FROM term GROUP BY col_name, k ORDER BY col_name
"""

  /** Herfindahl–Hirschman concentration of brand revenue within each
    * order-priority segment — the market-structure profile (10000·HHI
    * convention scaled to micros). Shares are exact-int divisions to
    * double; each squared share floors to micros before summing, so no
    * accumulation-order float drift — and no BIGINT rev² overflow at
    * any scale (a monopoly segment's rev² in cents would pass 2^63
    * around sf0.1). */
  def hhi(s: SparkSession, dir: String): DataFrame = {
    val seg = t(s, dir, "lineitem").as("l")
      .join(t(s, dir, "orders").as("o"), col("l.l_orderkey") === col("o.o_orderkey"))
      .join(t(s, dir, "part").as("p"), col("l.l_partkey") === col("p.p_partkey"))
      .groupBy(col("o.o_orderpriority").as("seg"), col("p.p_brand").as("brand"))
      .agg(sum(round(col("l.l_extendedprice")).cast("long")).as("rev"))
    val tot = seg.groupBy("seg").agg(sum(col("rev")).as("t"))
    val share = col("rev").cast("double") / col("t")
    seg.join(tot, "seg")
      .select(col("seg"),
        floor(lit(1000000.0) * share * share).cast("long").as("term_micro"))
      .groupBy("seg").agg(count(lit(1)).as("n_brands"), sum(col("term_micro")).as("hhi_micro"))
      .orderBy("seg")
  }

  val hhiSql: String = """
WITH s AS (
  SELECT o.o_orderpriority AS seg, p.p_brand AS brand,
         SUM(CAST(round(l.l_extendedprice) AS BIGINT)) AS rev
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2),
tot AS (SELECT seg, SUM(rev) AS t FROM s GROUP BY seg),
term AS (
  SELECT s.seg,
    CAST(floor(1000000.0 * (CAST(rev AS DOUBLE)/t) * (CAST(rev AS DOUBLE)/t)) AS BIGINT) AS term_micro
  FROM s JOIN tot ON s.seg = tot.seg)
SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_brands, CAST(SUM(term_micro) AS BIGINT) AS hhi_micro
FROM term GROUP BY seg ORDER BY seg
"""

  /** Greedy 3-step sequential conversion (signup → view → purchase):
    * step k+1 matches the EARLIEST occurrence after step k's match —
    * the earliest-occurrence greedy is exactly the subsequence-
    * existence test (if any embedding exists, the greedy one does),
    * computed as three bounded (user-keyed join + min) rounds instead
    * of an ordered scan. The 2-sequence min/max shortcut
    * (q_seqpair_support) cannot express 3 steps; this chain is the
    * general mechanism. */
  def seqTriple(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val s1 = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("us")).as("u1"))
    val s2 = e.filter(col("event_type") === "view").as("e")
      .join(s1.as("s"), col("e.user_id") === col("s.user_id"))
      .filter(col("us") > col("u1"))
      .groupBy(col("e.user_id")).agg(min(col("us")).as("u2"))
    val s3 = e.filter(col("event_type") === "purchase").as("e")
      .join(s2.as("s"), col("e.user_id") === col("s.user_id"))
      .filter(col("us") > col("u2"))
      .groupBy(col("e.user_id")).agg(min(col("us")).as("u3"))
    val tot = e.agg(countDistinct(col("user_id")).as("nu"))
    s1.agg(count(lit(1)).as("n_step1"))
      .crossJoin(s2.agg(count(lit(1)).as("n_step2")))
      .crossJoin(s3.agg(count(lit(1)).as("n_step3")))
      .crossJoin(broadcast(tot))
      .select(col("n_step1"), col("n_step2"), col("n_step3"),
        expr("n_step3 * 1000000 div nu").as("conv_micro"))
  }

  val seqTripleSql: String = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
s1 AS (SELECT user_id, min(us) AS u1 FROM e WHERE event_type='signup' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(us) AS u2 FROM e JOIN s1 ON e.user_id = s1.user_id
       WHERE event_type='view' AND us > u1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(us) AS u3 FROM e JOIN s2 ON e.user_id = s2.user_id
       WHERE event_type='purchase' AND us > u2 GROUP BY e.user_id),
tot AS (SELECT COUNT(DISTINCT user_id) AS nu FROM e)
SELECT CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_step1,
       CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_step2,
       CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n_step3,
       CAST((SELECT COUNT(*) FROM s3) * 1000000 // nu AS BIGINT) AS conv_micro
FROM tot
"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_assoc_rules" -> (assocRules _),
    "q_rolling_corr" -> (rollingCorr _),
    "q_benford" -> (benford _),
    "q_column_entropy" -> (columnEntropy _),
    "q_hhi" -> (hhi _),
    "q_seq_triple" -> (seqTriple _))

  val oracles: Map[String, String] = Map(
    "q_assoc_rules" -> assocRulesSql,
    "q_rolling_corr" -> rollingCorrSql,
    "q_benford" -> benfordSql,
    "q_column_entropy" -> columnEntropySql,
    "q_hhi" -> hhiSql,
    "q_seq_triple" -> seqTripleSql)
}
