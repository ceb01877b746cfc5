package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

/** Sixth LLM-pipeline batch: image-modality dedup — perceptual hashing
  * over real codec output.
  */
object LlmQueries6 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** Perceptual near-duplicate image detection — the image-modality
    * member of the near-dup family (MinHash for token sets, SimHash for
    * text, SemDeDup for embeddings): every doc gets a REAL 16×16 gray
    * PNG (encoded executor-side, pixels a closed-form function of a
    * base id shared by planted copy pairs; copies perturb one pixel),
    * [[Multimodal.ahashBlocks]] decodes with ImageIO and computes the
    * 64-bit average-hash as four 16-bit blocks via exact integer area
    * means, and pairs within Hamming ≤ 3 are found by the Manku banded
    * join — block equality is a complete filter for Hamming ≤ 3 by
    * pigeonhole, so the plan is an equi-self-join on (block idx, block
    * value), never all-pairs. The oracle recomputes the hash bits
    * arithmetically (PNG is lossless, the downsample is integer) and
    * brute-forces pairs — equivalence of the two pair sets is exactly
    * the pigeonhole guarantee. At 100 TB: hash is one decode pass,
    * candidates are 4 bounded equi-join bands, same shape as
    * q_simhash_hamming. */
  def imageNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = t(s, dir, "documents").filter(col("doc_id") < 240)
      .select(col("doc_id").cast("long")).as[Long]
    val media = ids.mapPartitions(_.map { id =>
      val base = id % 120
      MediaRow(id, "img", Multimodal.encodeGrayPng(16, 16, { (x, y) =>
        // Squared-position mod prime decorrelates the 120 base patterns
        // (a linear-in-(x,y) formula only brightness-shifts per base and
        // aHash is brightness-invariant → cross-base collisions).
        val p = x * 16L + y + base * 89L
        ((p * p + (if (id >= 120 && x == 0 && y == 0) 2L else 0L)) % 251).toInt
      }))
    })
    val hb = Multimodal.ahashBlocks(media).toDF()
      .select("id", "b0", "b1", "b2", "b3")
      .localCheckpoint(true) // feeds both sides of the banded self-join
    val keyed = hb.select(col("id"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("bi", "bv")))
    val cand = keyed.as("a").join(keyed.as("b"),
        col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("ida"), col("b.id").as("idb")).distinct()
    cand
      .join(hb.select(col("id").as("ida"), col("b0").as("a0"), col("b1").as("a1"),
        col("b2").as("a2"), col("b3").as("a3")), "ida")
      .join(hb.select(col("id").as("idb"), col("b0").as("c0"), col("b1").as("c1"),
        col("b2").as("c2"), col("b3").as("c3")), "idb")
      .withColumn("hamming",
        expr("bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + bit_count(a2 ^ c2) + bit_count(a3 ^ c3)")
          .cast("long"))
      .filter(col("hamming") <= 3)
      .select(col("ida").as("doc_a"), col("idb").as("doc_b"), col("hamming"))
      .orderBy("doc_a", "doc_b")
  }

  val imageNearDupSql: String = """
WITH d AS (
  SELECT doc_id, doc_id % 120 AS base FROM documents WHERE doc_id < 240),
cells AS (
  SELECT doc_id, (y // 2) * 8 + (x // 2) AS k,
         CAST(SUM(val) AS BIGINT) // 4 AS cell
  FROM (SELECT doc_id, g1.x, g2.y,
          ((g1.x * 16 + g2.y + base * 89) * (g1.x * 16 + g2.y + base * 89) +
           CASE WHEN doc_id >= 120 AND g1.x = 0 AND g2.y = 0 THEN 2 ELSE 0 END) % 251
            AS val
        FROM d, unnest(range(0, 16)) g1(x), unnest(range(0, 16)) g2(y))
  GROUP BY doc_id, (y // 2) * 8 + (x // 2)),
tot AS (SELECT doc_id, CAST(SUM(cell) AS BIGINT) AS total FROM cells GROUP BY doc_id),
bits AS (
  SELECT c.doc_id, k, CASE WHEN 64 * cell > total THEN 1 ELSE 0 END AS bit
  FROM cells c JOIN tot USING (doc_id)),
ham AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS BIGINT) AS hamming
  FROM bits a JOIN bits b ON a.k = b.k AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 3 ORDER BY doc_a, doc_b
"""

  /** Corpus drift monitoring via the Population Stability Index — the
    * production tripwire between a reference snapshot and the current
    * feed (here: even vs odd doc_ids, a balanced split): token mass per
    * 256 md5-prefix buckets on each side from ONE aggregation pass (no
    * join — the side flag rides the token stream), Laplace-smoothed
    * shares, and PSI = Σ (p−q)·ln(p/q). Float discipline: each bucket's
    * contribution is one scalar chain over four integers floored to
    * NANO units (PSI contributions are O(1e-4) — micro would quantize
    * to zero), then the index is the order-independent long sum.
    * PSI < 0.1 = stable is the classic credit-scoring rule of thumb;
    * the near-identical halves here land well under it. */
  def psiDrift(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFns.{normalizeText, tokens}
    import org.apache.spark.sql.expressions.Window
    val tk = t(s, dir, "documents")
      .select((col("doc_id") % 2 === 0).as("is_ref"),
        explode(tokens(normalizeText(col("text")))).as("tok"))
      .withColumn("bucket", substring(md5(col("tok")), 1, 2))
    val w = Window.partitionBy()
    val b = tk.groupBy("bucket").agg(
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("refc"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("curc"))
      .withColumn("refn", sum("refc").over(w))
      .withColumn("curn", sum("curc").over(w))
    val p = (col("refc") + 1L).cast("double") / (col("refn") + 256L).cast("double")
    val q = (col("curc") + 1L).cast("double") / (col("curn") + 256L).cast("double")
    val lr = log(((col("refc") + 1L) * (col("curn") + 256L)).cast("double")
      / ((col("curc") + 1L) * (col("refn") + 256L)).cast("double"))
    b.withColumn("contrib_nano", floor((p - q) * lr * 1e9).cast("long"))
      .withColumn("psi_nano", sum("contrib_nano").over(w))
      .select("bucket", "refc", "curc", "contrib_nano", "psi_nano")
      .orderBy("bucket")
  }

  val psiDriftSql: String = """
WITH d AS (
  SELECT doc_id % 2 = 0 AS is_ref,
         CASE WHEN length(s) > 0 THEN string_split(s, ' ') ELSE [] END AS toks
  FROM (SELECT doc_id,
               trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s
        FROM documents)),
tk AS (
  SELECT is_ref, substr(md5(tok), 1, 2) AS bucket
  FROM (SELECT is_ref, unnest(toks) AS tok FROM d)),
b AS (
  SELECT bucket,
         CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS refc,
         CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS curc
  FROM tk GROUP BY bucket),
n AS (
  SELECT bucket, refc, curc,
         CAST(SUM(refc) OVER () AS BIGINT) AS refn,
         CAST(SUM(curc) OVER () AS BIGINT) AS curn
  FROM b),
c AS (
  SELECT bucket, refc, curc,
    CAST(floor(
      (CAST(refc + 1 AS DOUBLE) / CAST(refn + 256 AS DOUBLE)
       - CAST(curc + 1 AS DOUBLE) / CAST(curn + 256 AS DOUBLE))
      * ln(CAST((refc + 1) * (curn + 256) AS DOUBLE)
           / CAST((curc + 1) * (refn + 256) AS DOUBLE))
      * 1e9) AS BIGINT) AS contrib_nano
  FROM n)
SELECT bucket, refc, curc, contrib_nano,
       CAST(SUM(contrib_nano) OVER () AS BIGINT) AS psi_nano
FROM c ORDER BY bucket
"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_image_neardup" -> (imageNearDup _),
    "q_psi_drift" -> (psiDrift _))

  val oracles: Map[String, String] = Map(
    "q_image_neardup" -> imageNearDupSql,
    "q_psi_drift" -> psiDriftSql)
}
