package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Ninth LLM-pipeline batch: boilerplate removal (the DOM-strip pass
  * every web-corpus pipeline runs before quality scoring), exact
  * weighted corpus sampling (sequential Poisson / priority sampling),
  * multi-touch attribution over event streams, and sequential-pattern
  * support mining — each with the house exact-arithmetic discipline so
  * the DuckDB twin matches bit-for-bit.
  */
object LlmQueries9 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** Boilerplate strip: a deterministic HTML wrap is planted on every
    * 7th document (nav bar, ad div, footer — the classic template
    * chrome), then removed by a cascade of structure-aware regexes
    * (chrome elements WITH their content, then residual tags, then
    * whitespace collapse). The planted wrap makes the pass falsifiable:
    * `n_roundtrip = n_docs` asserts the cleaner recovers every
    * original byte-exactly, wrapped or not. Regexes are RE2-safe (no
    * backreferences) so Spark's java.util.regex and DuckDB's RE2
    * produce identical rewrites. Pure per-row codegen'd expressions —
    * zero shuffles before the final 1-row aggregate. */
  def boilerplateStrip(s: SparkSession, dir: String): DataFrame = {
    val navWrap = "<html><body><nav>HOME | ABOUT | CONTACT</nav>" +
      "<div class=\"ad\">BUY NOW!!!</div><p>"
    val footWrap = "</p><footer>copyright 2026 example.com</footer></body></html>"
    val docs = t(s, dir, "documents")
    val raw = when(col("doc_id") % 7 === 0,
      concat(lit(navWrap), col("text"), lit(footWrap))).otherwise(col("text"))
    val noTags = trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      raw,
      "<nav[^>]*>[^<]*</nav>", " "),
      "<footer[^>]*>[^<]*</footer>", " "),
      "<div class=\"ad\">[^<]*</div>", " "),
      "<[^>]*>", " "))
    val clean = regexp_replace(noTags, "\\s+", " ")
    val normOrig = regexp_replace(trim(col("text")), "\\s+", " ")
    docs.agg(
      sum(when(col("doc_id") % 7 === 0, 1L).otherwise(0L)).as("n_wrapped"),
      sum(when(clean === normOrig, 1L).otherwise(0L)).as("n_roundtrip"),
      sum(length(clean)).as("total_clean_chars"),
      count(lit(1)).as("n_docs"))
  }

  val boilerplateStripSql: String = """
WITH wrapped AS (
  SELECT doc_id,
    CASE WHEN doc_id % 7 = 0 THEN
      '<html><body><nav>HOME | ABOUT | CONTACT</nav><div class="ad">BUY NOW!!!</div><p>' || text || '</p><footer>copyright 2026 example.com</footer></body></html>'
    ELSE text END AS raw,
    text AS orig
  FROM documents),
stripped AS (
  SELECT doc_id, orig,
    trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(raw,
      '<nav[^>]*>[^<]*</nav>', ' ', 'g'),
      '<footer[^>]*>[^<]*</footer>', ' ', 'g'),
      '<div class="ad">[^<]*</div>', ' ', 'g'),
      '<[^>]*>', ' ', 'g')) AS no_tags
  FROM wrapped),
clean AS (
  SELECT doc_id, orig, regexp_replace(no_tags, '\s+', ' ', 'g') AS clean FROM stripped)
SELECT CAST(SUM(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_wrapped,
       CAST(SUM(CASE WHEN clean = regexp_replace(trim(orig), '\s+', ' ', 'g') THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip,
       CAST(SUM(length(clean)) AS BIGINT) AS total_clean_chars,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM clean
"""

  /** Weighted sampling without replacement via priority (sequential
    * Poisson) sampling — Ohlsson 1998 / Duffield–Lund–Thorup: draw
    * u_i ~ U(0,1) from a seedless md5, priority = w_i / u_i, keep the
    * top k priorities. Length-weighted here (w = n_chars), the corpus
    * subsampling step of a data-mixing pipeline. The float discipline
    * is the point: u is a 56-bit integer, priority is ONE exact-int
    * division (IEEE-correctly-rounded in every engine, unlike the
    * ln(u) of Efraimidis–Simon keys) — so the top-k set is bitwise
    * reproducible cross-engine. Plans as TakeOrdered: no global sort
    * materializes, each partition keeps k candidates. */
  def weightedSample(s: SparkSession, dir: String): DataFrame = {
    // Native decode of the 56-bit sampling key (value-identical to the
    // conv(substring(md5)) spelling the oracle keeps).
    val uKey = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.Md5PrefixLong(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          concat(lit("ws|"), col("doc_id").cast("string"))), 14))
    val h = t(s, dir, "documents").select(col("doc_id"), col("n_chars"),
      uKey.as("u"))
    val p = h.withColumn("pri", col("n_chars").cast("double") / col("u").cast("double"))
    p.select(col("doc_id"), col("n_chars"),
        floor(col("pri") * lit(1e18)).cast("long").as("pri_atto"), col("pri"))
      .orderBy(col("pri").desc, col("doc_id")).limit(25)
      .drop("pri")
  }

  val weightedSampleSql: String = """
WITH h AS (
  SELECT doc_id, n_chars,
    CAST('0x' || substr(md5('ws|' || CAST(doc_id AS VARCHAR)), 1, 14) AS BIGINT) AS u
  FROM documents),
p AS (
  SELECT doc_id, n_chars, CAST(n_chars AS DOUBLE) / CAST(u AS DOUBLE) AS pri
  FROM h)
SELECT doc_id, n_chars, CAST(floor(pri * 1e18) AS BIGINT) AS pri_atto
FROM p ORDER BY pri DESC, doc_id LIMIT 25
"""

  /** Multi-touch attribution: every non-purchase event in the 7 days
    * before a purchase by the same user is a touchpoint; credit is
    * split linearly (1/n each) and position-based (40% first, 40%
    * last, 20% across the middle — the "U-shaped" model), in integral
    * micros with `div` so both engines truncate identically. The only
    * join is user-keyed (purchases × that user's events), so partition
    * width is a user's history — the same per-user bound as
    * q_sessionize; credit windows partition by purchase id. */
  def multitouch(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("puser"),
        unix_micros(col("ts")).as("pus"))
    val touch = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id").as("tuser"), col("event_type"),
        col("event_id").as("tid"), unix_micros(col("ts")).as("tus"))
    val cand = purch.join(touch,
      col("puser") === col("tuser") && col("tus") < col("pus") &&
        col("pus") - col("tus") <= 604800000000L)
    val wOrd = Window.partitionBy("pid").orderBy("tus", "tid")
    val wAll = Window.partitionBy("pid")
    val ranked = cand
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
    val credit = ranked.select(col("pid"), col("event_type"),
      expr("1000000 div n").as("lin"),
      when(col("n") === 1, 1000000L)
        .when(col("n") === 2, 500000L)
        .when(col("rn") === 1 || col("rn") === col("n"), 400000L)
        .otherwise(expr("200000 div (n - 2)")).as("pos"))
    credit.groupBy(col("event_type").as("channel"))
      .agg(countDistinct(col("pid")).as("n_purchases"),
        sum(col("lin")).as("linear_micro"),
        sum(col("pos")).as("position_micro"))
      .orderBy("channel")
  }

  val multitouchSql: String = """
WITH purch AS (
  SELECT event_id AS pid, user_id, epoch_us(ts) AS pus FROM events WHERE event_type='purchase'),
touch AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS tus FROM events WHERE event_type <> 'purchase'),
cand AS (
  SELECT p.pid, t.event_type, t.event_id, t.tus,
    row_number() OVER (PARTITION BY p.pid ORDER BY t.tus, t.event_id) AS rn,
    COUNT(*) OVER (PARTITION BY p.pid) AS n
  FROM purch p JOIN touch t ON p.user_id = t.user_id
    AND t.tus < p.pus AND p.pus - t.tus <= 604800000000),
credit AS (
  SELECT pid, event_type,
    1000000 // n AS lin,
    CASE WHEN n = 1 THEN 1000000
         WHEN n = 2 THEN 500000
         WHEN rn = 1 OR rn = n THEN 400000
         ELSE 200000 // (n - 2) END AS pos
  FROM cand)
SELECT event_type AS channel, CAST(COUNT(DISTINCT pid) AS BIGINT) AS n_purchases,
       CAST(SUM(lin) AS BIGINT) AS linear_micro, CAST(SUM(pos) AS BIGINT) AS position_micro
FROM credit GROUP BY event_type ORDER BY channel
"""

  /** Sequential-pattern support ("a is eventually followed by b"): a
    * user supports (a, b) iff some a-occurrence precedes some
    * b-occurrence — equivalently min(ts_a) < max(ts_b), which reduces
    * the subsequence test to ONE bounded aggregate per (user, type)
    * and a |types|²-bounded self-join (the min/max reduction that
    * makes 2-sequence mining shuffle-light; longer patterns escalate
    * to the greedy earliest-occurrence chain, cf. PrefixSpan's
    * projected-database idea, Pei et al. ICDE'01). Mean min(a)→max(b)
    * gap in exact integral µs adds the dwell-time signal. */
  def seqpairSupport(s: SparkSession, dir: String): DataFrame = {
    val occ = t(s, dir, "events")
      .groupBy("user_id", "event_type")
      .agg(min(unix_micros(col("ts"))).as("mn"), max(unix_micros(col("ts"))).as("mx"))
    val tot = occ.agg(countDistinct(col("user_id")).as("nu"))
    val a = occ.select(col("user_id"), col("event_type").as("a"), col("mn"))
    val b = occ.select(col("user_id").as("ub"), col("event_type").as("b"), col("mx"))
    val sup = a.join(b, col("user_id") === col("ub") && col("a") =!= col("b") &&
        col("mn") < col("mx"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("n_users"), sum(col("mx") - col("mn")).as("gap_sum"))
    sup.crossJoin(broadcast(tot))
      .select(col("a"), col("b"), col("n_users"),
        expr("n_users * 1000000 div nu").as("support_micro"),
        expr("gap_sum div n_users").as("mean_gap_us"))
      .orderBy("a", "b")
  }

  val seqpairSupportSql: String = """
WITH occ AS (
  SELECT user_id, event_type, min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
  FROM events GROUP BY user_id, event_type),
tot AS (SELECT COUNT(DISTINCT user_id) AS nu FROM events),
sup AS (
  SELECT a.event_type AS a, b.event_type AS b, COUNT(*) AS n_users,
         SUM(b.mx - a.mn) AS gap_sum
  FROM occ a JOIN occ b ON a.user_id = b.user_id AND a.event_type <> b.event_type
  WHERE a.mn < b.mx
  GROUP BY 1, 2)
SELECT a, b, CAST(n_users AS BIGINT) AS n_users,
       CAST(n_users * 1000000 // nu AS BIGINT) AS support_micro,
       CAST(gap_sum // n_users AS BIGINT) AS mean_gap_us
FROM sup, tot ORDER BY a, b
"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_boilerplate_strip" -> (boilerplateStrip _),
    "q_weighted_sample" -> (weightedSample _),
    "q_multitouch_attribution" -> (multitouch _),
    "q_seqpair_support" -> (seqpairSupport _))

  val oracles: Map[String, String] = Map(
    "q_boilerplate_strip" -> boilerplateStripSql,
    "q_weighted_sample" -> weightedSampleSql,
    "q_multitouch_attribution" -> multitouchSql,
    "q_seqpair_support" -> seqpairSupportSql)
}
