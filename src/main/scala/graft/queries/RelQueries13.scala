package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

/** Thirteenth analytics batch: acoustic-fingerprint near-dup recall over
  * REAL decoded PCM, cross-source vocabulary overlap (bigram Jaccard),
  * a two-proportion A/B z-test over event streams, and integer-decayed
  * trending scores. Exact-arithmetic discipline throughout — the one
  * float expression (the z statistic) is a single-row formula over
  * exact integer counts, floored to micros, so both engines evaluate
  * the identical IEEE expression once.
  */
object RelQueries13 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  // ------------------------------------------------- audio fingerprint

  /** Acoustic near-dup recall through the REAL decode path: 60 planted
    * pairs of WAVs where doc 2g+1 is doc 2g re-leveled at 2× gain — the
    * re-encoded-copy shape audio dedup must catch. The energy-delta
    * fingerprint (simplified Haitsma–Kalker 2002) is amplitude-invariant
    * by construction, so `pair_match` must be 1 for every group, and the
    * bit string itself is recomputed closed-form by the oracle (samples
    * are a quadratic residue sequence, so DuckDB can rebuild energies
    * per frame with `unnest(range())` + `lag`). Decode is
    * javax.sound.sampled on real RIFF bytes, not arithmetic shortcut —
    * the same path `q_media_audio` oracles. */
  def audioFp(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = t(s, dir, "documents").filter(col("doc_id") < 120)
      .select(col("doc_id").cast("long")).as[Long]
    val media = ids.mapPartitions(_.map { id =>
      val g = id / 2
      val scale = 1 + id % 2
      val n = (64 + (g % 3) * 16).toInt
      val samples = Array.tabulate[Short](n)(i =>
        (((g * 31 + 7L * i * i) % 201 - 100) * scale).toShort)
      MediaRow(id, "wav", Multimodal.encodePcmWav(8000, samples))
    })
    val fp = Multimodal.fingerprintAudio(media, 8).toDF()
    val even = fp.filter(col("id") % 2 === 0)
      .select(expr("CAST(id DIV 2 AS BIGINT)").as("g"),
        col("n_frames"), col("fp"))
    val odd = fp.filter(col("id") % 2 === 1)
      .select(expr("CAST(id DIV 2 AS BIGINT)").as("g"), col("fp").as("fp_b"))
    even.join(odd, "g")
      .select(col("g"), col("n_frames"), col("fp"),
        when(col("fp") === col("fp_b"), 1L).otherwise(0L).as("pair_match"))
      .orderBy("g")
  }

  val audioFpSql: String = """
WITH d AS (
  SELECT doc_id, doc_id // 2 AS g, 1 + doc_id % 2 AS scale,
         64 + (doc_id // 2 % 3) * 16 AS n
  FROM documents WHERE doc_id < 120),
samp AS (
  SELECT d.doc_id, d.g, i.i // 8 AS frame,
         (((d.g * 31 + 7 * i.i * i.i) % 201) - 100) * d.scale AS s
  FROM d, unnest(range(0, d.n)) i(i)),
energy AS (
  SELECT doc_id, g, frame, SUM(s * s) AS e FROM samp GROUP BY 1, 2, 3),
bits AS (
  SELECT doc_id, g, frame,
    CASE WHEN e > lag(e) OVER (PARTITION BY doc_id ORDER BY frame) THEN '1' ELSE '0' END AS b
  FROM energy),
fps AS (
  SELECT doc_id, g, string_agg(b, '' ORDER BY frame) AS fp, COUNT(*) AS nb
  FROM bits WHERE frame > 0 GROUP BY doc_id, g)
SELECT e.g AS g, CAST(e.nb + 1 AS BIGINT) AS n_frames, e.fp AS fp,
       CAST(CASE WHEN e.fp = o.fp THEN 1 ELSE 0 END AS BIGINT) AS pair_match
FROM fps e JOIN fps o ON e.g = o.g AND e.doc_id % 2 = 0 AND o.doc_id % 2 = 1
ORDER BY g
"""

  // ------------------------------------------------- source vocab overlap

  /** Cross-source vocabulary overlap: Jaccard similarity of the distinct
    * bigram vocabularies of every source pair (the corpus-curation
    * "which crawls duplicate each other" diagnostic; unigram vocab is
    * degenerate at this scale — every source shares the whole word
    * list — so bigrams carry the signal). Distinct (source, bigram)
    * pairs are ONE explode + combine; the pair intersection is an
    * equi-join on the bigram term — partition width is a term's source
    * list (≤ #sources), never the corpus. Jaccard in integral micros.
    *
    * Plan discipline (r12): the bigram array is `zip_with` over two
    * `slice`s of the materialized word array — a CONSTANT number of
    * split evaluations per document. The earlier
    * `transform(sequence, i => element_at(words, i))` spelling let
    * Catalyst inline the full split/regex pipeline into every
    * element_at, i.e. O(words²) regex work per doc (2.98 s of a ~4 s
    * query at sf0.1). The distinct tok frame is localCheckpoint-ed so
    * the self-join reads it twice instead of computing it twice (AQE's
    * broadcast of one side otherwise defeats exchange reuse). */
  def sourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("source"),
      split(trim(regexp_replace(lower(col("text")), "[^a-z]+", " ")), " ").as("words"))
    val n = size(col("words"))
    val bigrams = when(n < 2, array().cast("array<string>"))
      .otherwise(zip_with(
        slice(col("words"), lit(1), n - 1),
        slice(col("words"), lit(2), n - 1),
        (a, b) => concat(a, lit(" "), b)))
    val tok = docs
      .select(col("source"), explode(bigrams).as("term"))
      .distinct()
      .localCheckpoint(false) // lazy: computed once, read by both join sides
    val sz = tok.groupBy("source").agg(count(lit(1)).as("k"))
    val inter = tok.as("a").join(tok.as("b"),
        col("a.term") === col("b.term") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("sa"), col("b.source").as("sb"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sz.select(col("source").as("sa"), col("k").as("ka")), "sa")
      .join(sz.select(col("source").as("sb"), col("k").as("kb")), "sb")
      .select(col("sa"), col("sb"), col("n_common"),
        expr("n_common * CAST(1000000 AS BIGINT) DIV (ka + kb - n_common)")
          .as("jaccard_micro"))
      .orderBy(desc("jaccard_micro"), col("sa"), col("sb"))
      .limit(15)
  }

  val sourceOverlapSql: String = """
WITH d AS (
  SELECT source,
         list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')), ' '),
                     x -> x <> '') AS words
  FROM documents),
tok AS (
  SELECT DISTINCT source, words[i.i] || ' ' || words[i.i + 1] AS term
  FROM d, unnest(range(1, len(words))) i(i)),
sz AS (SELECT source, COUNT(*) AS k FROM tok GROUP BY source),
inter AS (
  SELECT a.source AS sa, b.source AS sb, COUNT(*) AS n_common
  FROM tok a JOIN tok b ON a.term = b.term AND a.source < b.source
  GROUP BY 1, 2)
SELECT sa, sb, CAST(n_common AS BIGINT) AS n_common,
       CAST(n_common * 1000000 // (x.k + y.k - n_common) AS BIGINT) AS jaccard_micro
FROM inter JOIN sz x ON sa = x.source JOIN sz y ON sb = y.source
ORDER BY jaccard_micro DESC, sa, sb LIMIT 15
"""

  // ------------------------------------------------- two-proportion z-test

  /** Two-proportion A/B z-test over the events stream: users are
    * hash-split into arms (first md5 hex digit parity — the
    * deterministic assignment a real experiment framework uses),
    * conversion is "purchased within 72 h of the user's first event"
    * (time-boxed, so the rate is non-degenerate), and the pooled
    * two-proportion z statistic is computed once over four exact
    * integer counts, floored to micros. The per-user pass is one
    * groupBy(user) for t0 + one join-back + one groupBy — no window
    * over the full stream. */
  def abZtest(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    // Arm assignment is a pure function of user_id: hash on the
    // per-USER frame (native Md5PrefixLong decode, value-identical to
    // the conv(substring(md5)) spelling the oracle keeps), not on the
    // joined per-event rows — one hash per user instead of per event.
    val armHash = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.Md5PrefixLong(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          concat(lit("ab|"), col("user_id").cast("string"))), 1))
    val arm = when(armHash % 2 === 0, "A").otherwise("B")
    val f = ev.groupBy("user_id").agg(min(unix_micros(col("ts"))).as("t0"))
      .withColumn("arm", arm)
    val u = f.join(ev, "user_id")
      .groupBy("user_id", "arm")
      .agg(max(when(col("event_type") === "purchase" &&
        unix_micros(col("ts")) - col("t0") <= 259200000000L, 1L).otherwise(0L)).as("conv"))
    u.agg(
        sum(when(col("arm") === "A", 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === "A", col("conv")).otherwise(0L)).as("ca"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("nb"),
        sum(when(col("arm") === "B", col("conv")).otherwise(0L)).as("cb"))
      .select(col("na"), col("ca"), col("nb"), col("cb"),
        expr("""CAST(floor(1000000.0 * (CAST(ca AS DOUBLE)/na - CAST(cb AS DOUBLE)/nb) /
          sqrt((CAST(ca+cb AS DOUBLE)/(na+nb)) * (1.0 - CAST(ca+cb AS DOUBLE)/(na+nb)) * (1.0/na + 1.0/nb))) AS BIGINT)""")
          .as("z_micro"))
  }

  val abZtestSql: String = """
WITH f AS (SELECT user_id, min(epoch_us(ts)) AS t0 FROM events GROUP BY user_id),
u AS (
  SELECT f.user_id,
    CASE WHEN CAST('0x' || substr(md5('ab|' || CAST(f.user_id AS VARCHAR)), 1, 1) AS BIGINT) % 2 = 0
         THEN 'A' ELSE 'B' END AS arm,
    MAX(CASE WHEN e.event_type = 'purchase' AND epoch_us(e.ts) - f.t0 <= 259200000000
             THEN 1 ELSE 0 END) AS conv
  FROM f JOIN events e ON f.user_id = e.user_id
  GROUP BY 1, 2),
a AS (
  SELECT SUM(CASE WHEN arm='A' THEN 1 ELSE 0 END) AS na,
         SUM(CASE WHEN arm='A' THEN conv ELSE 0 END) AS ca,
         SUM(CASE WHEN arm='B' THEN 1 ELSE 0 END) AS nb,
         SUM(CASE WHEN arm='B' THEN conv ELSE 0 END) AS cb
  FROM u)
SELECT CAST(na AS BIGINT) AS na, CAST(ca AS BIGINT) AS ca,
       CAST(nb AS BIGINT) AS nb, CAST(cb AS BIGINT) AS cb,
  CAST(floor(1000000.0 * (CAST(ca AS DOUBLE)/na - CAST(cb AS DOUBLE)/nb) /
    sqrt((CAST(ca+cb AS DOUBLE)/(na+nb)) * (1.0 - CAST(ca+cb AS DOUBLE)/(na+nb)) * (1.0/na + 1.0/nb))) AS BIGINT) AS z_micro
FROM a
"""

  // ------------------------------------------------- decayed trending

  /** Integer-decayed trending brands: weekly halving weights
    * (2^(8−age_weeks), zero past 8 weeks) over order lines, so the
    * score is an EXACT integer — no float decay drift, and the decay
    * window bounds the scan that matters (the predicate commutes with
    * the join). Age is whole days DIV 7 on BOTH engines (DuckDB's
    * date_diff('week') counts boundary crossings, not elapsed weeks —
    * the cross-engine trap this formulation avoids). */
  def trendingDecay(s: SparkSession, dir: String): DataFrame = {
    val mx = t(s, dir, "orders").agg(max(col("o_orderdate")).as("mx"))
    t(s, dir, "lineitem").as("l")
      .join(t(s, dir, "orders").as("o"), col("l.l_orderkey") === col("o.o_orderkey"))
      .join(t(s, dir, "part").as("p"), col("l.l_partkey") === col("p.p_partkey"))
      .crossJoin(broadcast(mx))
      .select(col("p.p_brand").as("brand"),
        expr("CAST(datediff(mx, o_orderdate) DIV 7 AS BIGINT)").as("age_w"))
      .groupBy("brand")
      .agg(sum(when(col("age_w") <= 8,
          expr("shiftleft(CAST(1 AS BIGINT), CAST(8 - age_w AS INT))"))
        .otherwise(0L)).as("score"),
        count(lit(1)).as("n_lines"))
      .orderBy(desc("score"), col("brand"))
      .limit(10)
  }

  val trendingDecaySql: String = """
WITH mx AS (SELECT max(o_orderdate) AS m FROM orders),
b AS (
  SELECT p.p_brand AS brand,
         date_diff('day', o.o_orderdate, mx.m) // 7 AS age_w
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                  JOIN part p ON l.l_partkey = p.p_partkey, mx)
SELECT brand,
       CAST(SUM(CASE WHEN age_w <= 8 THEN (1::BIGINT << (8 - age_w)) ELSE 0 END) AS BIGINT) AS score,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM b GROUP BY brand ORDER BY score DESC, brand LIMIT 10
"""

  // ------------------------------------------------- registry

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_audio_fingerprint" -> (audioFp _),
    "q_source_overlap" -> (sourceOverlap _),
    "q_ab_ztest" -> (abZtest _),
    "q_trending_decay" -> (trendingDecay _))

  def oracles: Map[String, String] = Map(
    "q_audio_fingerprint" -> audioFpSql,
    "q_source_overlap" -> sourceOverlapSql,
    "q_ab_ztest" -> abZtestSql,
    "q_trending_decay" -> trendingDecaySql)
}
