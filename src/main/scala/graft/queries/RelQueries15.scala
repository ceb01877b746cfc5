package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns.{normalizeText, tokens}
import graft.operators.PageRank

/** Fifteenth analytics batch: positional phrase search (the exact-match
  * IR primitive the BM25/TextIndex family was missing), a Kaplan–Meier
  * survival curve in cumulative log-micro-nats (the per-term floor
  * discipline of q_bigram_lm applied to 1 − d/n factors), and
  * personalized PageRank (random-walk-with-restart proximity from one
  * seed, [[PageRank.personalized]]'s exact integer rounds).
  */
object RelQueries15 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  // --------------------------------------------------- phrase search

  /** Exact phrase search "table hash" over positional postings:
    * postings are restricted to the two query terms BEFORE the
    * position join (per-term postings, not the corpus token stream),
    * then adjacency is an equi-join on (doc, pos+1) — the standard
    * positional-index probe. Occurrence counts per doc, top 20. The
    * absolute position base (0- vs 1-indexed) cancels in the relative
    * join. */
  def phraseSearch(s: SparkSession, dir: String): DataFrame = {
    val post = t(s, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"),
        posexplode(tokens(normalizeText(col("text")))).as(Seq("pos", "tok")))
      .filter(col("tok").isin("table", "hash"))
    val a = post.filter(col("tok") === "table")
    val b = post.filter(col("tok") === "hash")
    a.as("a").join(b.as("b"),
        col("b.doc_id") === col("a.doc_id") && col("b.pos") === col("a.pos") + 1)
      .groupBy(col("a.doc_id").as("doc_id"))
      .agg(count(lit(1)).as("n_occ"))
      .orderBy(col("n_occ").desc, col("doc_id"))
      .limit(20)
  }

  val phraseSearchSql: String = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN length(s) > 0 THEN string_split(s, ' ') ELSE [] END AS w
  FROM (SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s
        FROM documents)),
post AS (
  SELECT doc_id, w[i.i] AS tok, i.i AS pos
  FROM d, unnest(range(1, len(w) + 1)) i(i)
  WHERE w[i.i] IN ('table', 'hash')),
m AS (
  SELECT a.doc_id, COUNT(*) AS n_occ
  FROM post a JOIN post b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  WHERE a.tok = 'table' AND b.tok = 'hash'
  GROUP BY 1)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_occ AS BIGINT) AS n_occ
FROM m ORDER BY n_occ DESC, doc_id LIMIT 20
"""

  // --------------------------------------------------- Kaplan–Meier

  /** Kaplan–Meier survival of "time from first activity to first
    * error" (right-censored at the observation horizon for users who
    * never error). Each event time contributes ln(1 − d/n) floored to
    * integral micro-nats BEFORE the running sum — the survival curve
    * is reported in cumulative log space (exp would reintroduce
    * cross-libm drift; the log terms themselves are the house
    * q_bigram_lm discipline). n-at-risk comes from a non-equi count
    * against the bounded per-user duration table, not the raw event
    * stream. */
  def kaplanMeier(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val f = ev.groupBy("user_id").agg(min(to_date(col("ts"))).as("d0"))
    val err = ev.filter(col("event_type") === "error")
      .groupBy("user_id").agg(min(to_date(col("ts"))).as("de"))
    val mx = ev.agg(max(to_date(col("ts"))).as("m"))
    val subj = f.join(err, Seq("user_id"), "left")
      .crossJoin(broadcast(mx))
      .select(
        when(col("de").isNull, datediff(col("m"), col("d0")))
          .otherwise(datediff(col("de"), col("d0"))).cast("long").as("dur"),
        when(col("de").isNull, 0L).otherwise(1L).as("ev"))
      .localCheckpoint(true) // both sides of the at-risk non-equi join
    val times = subj.filter(col("ev") === 1L)
      .groupBy(col("dur").as("t")).agg(count(lit(1)).as("d"))
    val risk = times.join(subj, col("dur") >= col("t"))
      .groupBy("t", "d").agg(count(lit(1)).as("n"))
    risk.filter(col("d") < col("n"))
      .withColumn("ln_term",
        floor(log(lit(1.0) - col("d").cast("double") / col("n").cast("double"))
          * 1e6).cast("long"))
      // global window audit (r19): frame = one row per distinct
      // duration-in-days with an event — bounded by the study's
      // calendar length, never subject volume
      .withColumn("cum_lnmicro", sum("ln_term").over(
        Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("t").as("t_day"), col("n").as("n_risk"),
        col("d").as("d_events"), col("cum_lnmicro"))
      .orderBy("t_day")
  }

  val kaplanMeierSql: String = """
WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY 1),
err AS (SELECT user_id, min(CAST(ts AS DATE)) AS de FROM events WHERE event_type = 'error' GROUP BY 1),
mx AS (SELECT max(CAST(ts AS DATE)) AS m FROM events),
subj AS (
  SELECT CASE WHEN err.de IS NULL THEN date_diff('day', f.d0, mx.m)
              ELSE date_diff('day', f.d0, err.de) END AS dur,
         CASE WHEN err.de IS NULL THEN 0 ELSE 1 END AS ev
  FROM f LEFT JOIN err ON f.user_id = err.user_id, mx),
times AS (SELECT dur AS t, COUNT(*) AS d FROM subj WHERE ev = 1 GROUP BY 1),
risk AS (
  SELECT t.t, t.d, COUNT(*) AS n
  FROM times t JOIN subj s ON s.dur >= t.t
  GROUP BY 1, 2),
terms AS (
  SELECT t, d, n,
         CAST(floor(ln(1.0 - CAST(d AS DOUBLE) / n) * 1000000) AS BIGINT) AS ln_term
  FROM risk WHERE d < n)
SELECT CAST(t AS BIGINT) AS t_day, CAST(n AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS d_events,
       CAST(SUM(ln_term) OVER (ORDER BY t) AS BIGINT) AS cum_lnmicro
FROM terms ORDER BY t_day
"""

  // ------------------------------------------- personalized PageRank

  /** Personalized PageRank from seed node 0 over the lineitem-derived
    * part–supplier graph (the q_pagerank graph): 3 exact-integer
    * rounds with ALL teleport mass restarting at the seed. Top 25 by
    * proximity. The twin unrolls the same three min-plus-free integer
    * rounds CTE-by-CTE, exactly as q_pagerank's does. */
  def pprSeed(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "lineitem").select(
      (col("l_partkey") % 200).as("src"), (col("l_suppkey") % 200).as("dst"))
    PageRank.personalized(e, source = 0L, iters = 3)
      .filter(col("rank") > 0)
      .orderBy(col("rank").desc, col("id"))
      .limit(25)
  }

  val pprSeedSql: String = {
    val scale = 1000000000000L
    def iter(k: Int): String = s"""
r$k AS (
  SELECT nd.id,
         (CASE WHEN nd.id = 0 THEN (15 * $scale) // 100 ELSE 0 END)
           + ((85 * COALESCE(m.m, 0)) // 100) AS rank
  FROM nodes nd LEFT JOIN (
    SELECT e.dst, CAST(SUM(r.rank // d.deg) AS BIGINT) AS m
    FROM e JOIN r${k - 1} r ON e.src = r.id JOIN deg d ON e.src = d.src
    GROUP BY e.dst) m ON nd.id = m.dst)"""
    s"""
WITH e AS (
  SELECT DISTINCT l_partkey % 200 AS src, l_suppkey % 200 AS dst FROM lineitem),
nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
r0 AS (SELECT id, CASE WHEN id = 0 THEN $scale ELSE 0 END AS rank FROM nodes),${iter(1)},${iter(2)},${iter(3)}
SELECT id, rank FROM r3 WHERE rank > 0 ORDER BY rank DESC, id LIMIT 25
"""
  }

  // ------------------------------------------------------- registry

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_phrase_search" -> (phraseSearch _),
    "q_kaplan_meier" -> (kaplanMeier _),
    "q_ppr_seed" -> (pprSeed _))

  def oracles: Map[String, String] = Map(
    "q_phrase_search" -> phraseSearchSql,
    "q_kaplan_meier" -> kaplanMeierSql,
    "q_ppr_seed" -> pprSeedSql)
}
