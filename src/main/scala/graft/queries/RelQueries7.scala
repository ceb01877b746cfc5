package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns.{EmailPattern, PhonePattern, UrlPattern}

/** Seventh relational batch: mergeable-sketch rollups, equi-depth
  * binning, entity extraction, and run-length event collapse.
  */
object RelQueries7 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** Re-aggregatable distinct via HLL sketch UNION (DataSketches HLL,
    * built into Spark) — THE reason sketches matter at 100 TB: partial
    * sketches are built per group (or per partition / per day) and any
    * rollup is a cheap binary merge, never a re-scan of the fact. Here
    * per-flag sketches of l_partkey are merged with `hll_union_agg`
    * into the global distinct — the merged estimate is checked against
    * the exact global distinct (which is NOT the sum of per-group
    * distincts; partkeys recur across flags, so a broken union would
    * show). House sketch pattern: exact values + in-tolerance booleans,
    * oracle emits exact + TRUE — an off-estimate flips the hash. */
  def hllUnion(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val g = li.groupBy("l_returnflag").agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      hll_sketch_agg(col("l_partkey"), lit(14)).as("__sk"))
    val per = g.select(col("l_returnflag"), col("n_parts"),
      (abs(hll_sketch_estimate(col("__sk")) - col("n_parts")).cast("double") <=
        col("n_parts").cast("double") * 0.05).as("ok"))
    // Two singleton aggregates (merged estimate, exact global) joined
    // 1×1 — allowlisted in PlanGovernanceSpec, same class as the
    // tfidf singleton-scalar broadcast.
    val merged = g.agg(hll_union_agg(col("__sk")).as("__u"))
      .select(hll_sketch_estimate(col("__u")).as("__est"))
    val global = li.agg(countDistinct(col("l_partkey")).as("n_parts"))
      .crossJoin(merged)
      .select(lit("ALL").as("l_returnflag"), col("n_parts"),
        (abs(col("__est") - col("n_parts")).cast("double") <=
          col("n_parts").cast("double") * 0.05).as("ok"))
    per.unionByName(global).orderBy("l_returnflag")
  }

  val hllUnionSql: String = """
SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts, TRUE AS ok
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT 'ALL', COUNT(DISTINCT l_partkey), TRUE FROM lineitem
ORDER BY l_returnflag
"""

  /** Equi-depth (quantile) histogram: ntile deciles within each order
    * status over exact cents, then per-bucket count/lo/hi — the feature
    * binning step of model prep. The ntile window is PARTITIONED (one
    * sort per status, statuses parallel); binning one giant ungrouped
    * column at 100 TB goes through approx-percentile cut points instead
    * (q_percentiles family) — a global ntile would be a single-reducer
    * sort. Total order (cents, key) makes bucket edges deterministic
    * cross-engine; ntile's floor/ceil bucket-size rule is SQL-standard
    * in both engines. */
  def equidepthHist(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val w = Window.partitionBy("o_orderstatus").orderBy(col("cents"), col("o_orderkey"))
    o.withColumn("decile", ntile(10).over(w))
      .groupBy("o_orderstatus", "decile")
      .agg(count(lit(1)).as("n"),
        (min(col("cents")).cast("double") / 100.0).as("lo"),
        (max(col("cents")).cast("double") / 100.0).as("hi"))
      .orderBy("o_orderstatus", "decile")
  }

  val equidepthHistSql: String = """
WITH x AS (
  SELECT o_orderstatus, o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
d AS (
  SELECT o_orderstatus, cents,
         ntile(10) OVER (PARTITION BY o_orderstatus
                         ORDER BY cents, o_orderkey) AS decile
  FROM x)
SELECT o_orderstatus, decile, COUNT(*) AS n,
       CAST(MIN(cents) AS DOUBLE) / 100.0 AS lo,
       CAST(MAX(cents) AS DOUBLE) / 100.0 AS hi
FROM d GROUP BY o_orderstatus, decile
ORDER BY o_orderstatus, decile
"""

  /** Entity extraction into a long table: every email/URL/phone match
    * becomes its own row (doc_id, kind, entity) — the normalized shape
    * entity-level dedup, linking, and blocklists consume. PII is
    * planted deterministically (q_pii_redact's house pattern; the
    * corpus itself carries none) and extraction is regexp_extract_all
    * → one explode — single pass, no shuffle until the sort, and the
    * per-doc match arrays are bounded by construction. */
  def entityExtract(s: SparkSession, dir: String): DataFrame = {
    val idStr = col("doc_id").cast("string")
    val aug = concat(
      when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" contact user"), idStr, lit("@example.com now")))
        .otherwise(col("text")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" visit https://site"), idStr, lit(".example.org/p?id="), idStr))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        concat(lit(" call 555-123-"), lpad(idStr, 4, "0")))
        .otherwise(lit("")))
    def tagged(pattern: String, kind: String): Column =
      transform(regexp_extract_all(aug, lit(pattern), lit(0)),
        e => struct(lit(kind).as("kind"), e.as("entity")))
    t(s, dir, "documents")
      .select(col("doc_id"),
        explode(concat(tagged(EmailPattern, "email"), tagged(UrlPattern, "url"),
          tagged(PhonePattern, "phone"))).as("__e"))
      .select(col("doc_id"), col("__e.kind").as("kind"), col("__e.entity").as("entity"))
      .orderBy("doc_id", "kind", "entity")
  }

  val entityExtractSql: String = """
WITH aug AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 3 = 0
               THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
               ELSE text END)
         || (CASE WHEN doc_id % 5 = 0
                  THEN ' visit https://site' || CAST(doc_id AS VARCHAR) || '.example.org/p?id=' || CAST(doc_id AS VARCHAR)
                  ELSE '' END)
         || (CASE WHEN doc_id % 7 = 0
                  THEN ' call 555-123-' || lpad(CAST(doc_id AS VARCHAR), 4, '0')
                  ELSE '' END) AS a
  FROM documents),
e AS (
  SELECT doc_id, 'email' AS kind,
         unnest(regexp_extract_all(a, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS entity
  FROM aug
  UNION ALL
  SELECT doc_id, 'url', unnest(regexp_extract_all(a, 'https?://[^\s]+')) FROM aug
  UNION ALL
  SELECT doc_id, 'phone', unnest(regexp_extract_all(a, '\b\d{3}-\d{3}-\d{4}\b')) FROM aug)
SELECT doc_id, kind, entity FROM e
ORDER BY doc_id, kind, entity
"""

  /** Run-length collapse: drop events identical in type to the previous
    * event of the same user (sensor/telemetry dedup — repeated state
    * reports carry no information; only transitions do). One partitioned
    * lag window on the (ms, event_id) total order; timestamps compare as
    * epoch ms, sidestepping cross-engine timestamp types. */
  def collapseRuns(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").filter(col("user_id") < 50)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        col("event_id"), col("event_type"))
    val w = Window.partitionBy("user_id").orderBy(col("ms"), col("event_id"))
    e.withColumn("__prev", lag(col("event_type"), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col("event_type"))
      .select(col("user_id"), col("ms"), col("event_id"), col("event_type"))
      .orderBy("user_id", "ms", "event_id")
  }

  val collapseRunsSql: String = """
WITH e AS (
  SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type
  FROM events WHERE user_id < 50),
l AS (
  SELECT *, lag(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ms, event_id) AS prev
  FROM e)
SELECT user_id, ms, event_id, event_type FROM l
WHERE prev IS NULL OR prev <> event_type
ORDER BY user_id, ms, event_id
"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hll_union" -> (hllUnion _),
    "q_equidepth_hist" -> (equidepthHist _),
    "q_entity_extract" -> (entityExtract _),
    "q_collapse_runs" -> (collapseRuns _))

  val oracles: Map[String, String] = Map(
    "q_hll_union" -> hllUnionSql,
    "q_equidepth_hist" -> equidepthHistSql,
    "q_entity_extract" -> entityExtractSql,
    "q_collapse_runs" -> collapseRunsSql)
}
