package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns.bpeTokenCount
import graft.operators.PrefixSum

/** Sixteenth LLM-pipeline batch: the END-TO-END TRAINING EXPORT — the
  * last-mile composition every pre-training corpus goes through, as one
  * oracle-checked pipeline: quality gate → exact dedup → sequence
  * packing → epoch shuffle → manifest. Each stage exists as its own
  * audited operator elsewhere in the registry (q_gopher_filters,
  * q_doc_exact_dedup, q_seq_packing, q_epoch_shuffle); this query pins
  * the COMPOSITION: stage order matters (gate before dedup changes
  * which duplicate survives; packing before shuffling is what makes
  * sequences contiguous token runs), and the manifest must stay
  * deterministic through all four. Every stage is scale-shaped: the
  * gate and fingerprint are one scan, dedup is a map-side-combinable
  * groupBy, the global pack boundary is a [[PrefixSum]] running sum
  * (never an unpartitioned window), the permutation is a [[PrefixSum]]
  * rank on the md5 key, and the manifest is a bounded per-block
  * aggregate — no stage funnels data through one task.
  */
object LlmQueries16 {

  /** Export manifest: 16-position blocks of the seeded permutation of
    * packed 1024-token sequences, with block token mass and an order
    * checksum — the resume/audit artifact a training run reads. A
    * single displaced sequence anywhere in the epoch breaks `sig`;
    * a single mis-packed document moves a pack boundary and breaks
    * `blk_tokens` downstream of it; a wrongly-kept duplicate shifts
    * every later seq_id. */
  def trainingExport(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"),
        bpeTokenCount(col("text")).cast("long").as("toks"),
        md5(col("text")).as("fp"))
      .filter(col("toks") >= 5 && col("toks") <= 2000)
    // Keep-first exact dedup: duplicates share the fingerprint AND the
    // token count (identical text), so min() picks the earliest doc
    // with its own stats — no window needed.
    val deduped = docs.groupBy("fp")
      .agg(min("doc_id").as("doc_id"), min("toks").as("toks"))
    val packed = PrefixSum.runningSum(deduped, col("doc_id"),
        Seq(col("doc_id")), col("toks"), "cum0")
      .withColumn("seq_id", // exact DIV: long >> 10, not double division
        shiftright(col("cum0"), 10))
    val seqs = packed.groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("seq_tokens"))
    val keyed = seqs.withColumn("k",
      md5(concat(lit("epoch1:"), col("seq_id").cast("string"))))
    // Native permutation decode reading the EXISTING hex column k
    // (identical value to conv(substring(k,1,13),16,10)): k must stay
    // alive as the tiebreak, so decoding it runs the md5 once per
    // sequence where the r13 Md5PrefixLong-over-pre-image spelling
    // digested twice (ADVICE r13).
    val permKey = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.HexPrefixLong(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("k")), 13))
    val pos = PrefixSum.rank(keyed, permKey,
      Seq(col("k"), col("seq_id")), "pos")
    pos.groupBy(shiftright(col("pos") - 1, 4).as("blk"))
      .agg(count(lit(1)).as("n_seqs"),
        sum("seq_tokens").as("blk_tokens"),
        md5(concat_ws(",",
          transform(sort_array(collect_list(struct(col("pos"), col("seq_id")))),
            x => x.getField("seq_id").cast("string")))).as("sig"))
      .orderBy("blk")
  }

  val trainingExportSql: String = """
WITH d AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS toks,
         md5(text) AS fp
  FROM documents),
g AS (SELECT doc_id, toks, fp FROM d WHERE toks BETWEEN 5 AND 2000),
dd AS (SELECT min(doc_id) AS doc_id, min(toks) AS toks FROM g GROUP BY fp),
p AS (SELECT doc_id, toks,
        SUM(toks) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks AS cum0
      FROM dd),
seqs AS (SELECT CAST(cum0 // 1024 AS BIGINT) AS seq_id, COUNT(*) AS n_docs,
                CAST(SUM(toks) AS BIGINT) AS seq_tokens
         FROM p GROUP BY 1),
keyed AS (SELECT seq_id, seq_tokens,
                 md5(concat('epoch1:', CAST(seq_id AS VARCHAR))) AS k
          FROM seqs),
r AS (SELECT seq_id, seq_tokens, row_number() OVER (ORDER BY k, seq_id) AS pos
      FROM keyed)
SELECT CAST(floor((pos - 1) / 16) AS BIGINT) AS blk, COUNT(*) AS n_seqs,
       CAST(SUM(seq_tokens) AS BIGINT) AS blk_tokens,
       md5(string_agg(CAST(seq_id AS VARCHAR), ',' ORDER BY pos)) AS sig
FROM r GROUP BY 1 ORDER BY 1
"""

  /** BOUNDARY-SPLITTING sequence packing — the layout GPT-style
    * pre-training actually trains on: the corpus is one concatenated
    * token stream cut into fixed 1024-token sequences, and a document
    * whose tokens straddle a cut contributes a FRAGMENT to each side
    * (q_seq_packing's whole-doc bins are the padding-free simplification;
    * this is the padding-free full layout). Each doc's global token
    * interval [cum0, cum0+toks) comes from ONE PrefixSum pass; the
    * fragments are an explode of the doc's covered sequence range —
    * bounded by toks/1024 + 1 rows per doc, so total fragment rows are
    * n_docs + total_tokens/1024 (linear, never quadratic). Per sequence
    * the output is the loss-mask bookkeeping a trainer needs: fragment
    * count, token fill (exactly 1024 everywhere but the tail), docs
    * fully contained, and the largest fragment. All arithmetic is exact
    * integer (shiftright DIV, greatest/least clamps). */
  def packedFragments(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables(s, dir, "documents")
      .select(col("doc_id"),
        bpeTokenCount(col("text")).cast("long").as("toks"))
      .filter(col("toks") > 0)
    val spans = PrefixSum.runningSum(toks, col("doc_id"),
        Seq(col("doc_id")), col("toks"), "cum0")
      .withColumn("first_seq", shiftright(col("cum0"), 10))
      .withColumn("last_seq", shiftright(col("cum0") + col("toks") - 1, 10))
    val frags = spans
      .select(col("doc_id"), col("cum0"), col("toks"),
        explode(sequence(col("first_seq"), col("last_seq"))).as("seq_id"))
      .withColumn("frag_tokens",
        least(col("cum0") + col("toks"), (col("seq_id") + 1) * 1024L) -
          greatest(col("cum0"), col("seq_id") * 1024L))
      .withColumn("whole",
        when(col("frag_tokens") === col("toks"), 1L).otherwise(0L))
    frags.groupBy("seq_id")
      .agg(count(lit(1)).as("n_frags"),
        sum("frag_tokens").as("seq_tokens"),
        sum("whole").as("n_whole_docs"),
        max("frag_tokens").as("max_frag"))
      .orderBy("seq_id")
  }

  val packedFragmentsSql: String = """
WITH d AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS toks
  FROM documents),
p AS (
  SELECT doc_id, toks,
         SUM(toks) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks AS cum0
  FROM d WHERE toks > 0),
f AS (
  SELECT p.doc_id, p.cum0, p.toks, g.seq_id,
         LEAST(p.cum0 + p.toks, (g.seq_id + 1) * 1024) -
           GREATEST(p.cum0, g.seq_id * 1024) AS frag_tokens
  FROM p, LATERAL (SELECT unnest(range(CAST(p.cum0 // 1024 AS BIGINT),
                                       CAST((p.cum0 + p.toks - 1) // 1024 + 1 AS BIGINT))) AS seq_id) g)
SELECT CAST(seq_id AS BIGINT) AS seq_id, COUNT(*) AS n_frags,
       CAST(SUM(frag_tokens) AS BIGINT) AS seq_tokens,
       CAST(SUM(CASE WHEN frag_tokens = toks THEN 1 ELSE 0 END) AS BIGINT) AS n_whole_docs,
       CAST(MAX(frag_tokens) AS BIGINT) AS max_frag
FROM f GROUP BY 1 ORDER BY 1
"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_training_export" -> (trainingExport _),
    "q_packed_fragments" -> (packedFragments _))

  val oracles: Map[String, String] = Map(
    "q_training_export" -> trainingExportSql,
    "q_packed_fragments" -> packedFragmentsSql)
}
