package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFns._
import graft.operators.{IvfIndex, Multimodal}

/** Fourth LLM-pipeline batch: real audio decode and the persisted IVF
  * index (build-once / probe-many ANN).
  */
object LlmQueries4 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** REAL audio decode round trip — RIFF/WAVE header walk + PCM via
    * `javax.sound.sampled.AudioSystem` (JDK-built-in, no external
    * library), mirroring q_media_decode's lossless-image pattern: a
    * deterministic mono PCM16 WAV is encoded per doc executor-side
    * (sample count and every sample value a closed-form function of
    * doc_id), then `Multimodal.decodeAudio` recovers format fields from
    * the chunk walk and the exact signed-sample sum from the decoded
    * stream. PCM is lossless, so the oracle needs only the arithmetic —
    * a decode that didn't truly recover the samples misses the hash.
    * Compressed audio (MP3/AAC/OGG) stays quarantined at header triage
    * (no JDK codec); video remains the only stubbed family. */
  def mediaAudio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Multimodal.MediaRow
    val ids = t(s, dir, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id").cast("long")).as[Long]
    val media = ids.mapPartitions(_.map { id =>
      val n = (50 + id % 100).toInt
      val samples = Array.tabulate[Short](n)(i =>
        (((id * 37 + 11L * i) % 65536) - 32768).toShort)
      MediaRow(id, "wav", Multimodal.encodePcmWav(8000, samples))
    })
    Multimodal.decodeAudio(media)
      .select(col("id").as("doc_id"), col("sample_rate"), col("channels"),
        col("bits"), col("n_samples"), col("duration_ms"), col("sample_sum"))
      .orderBy("doc_id")
  }

  val mediaAudioSql: String = """
WITH d AS (
  SELECT doc_id, 50 + doc_id % 100 AS n
  FROM documents WHERE doc_id < 200)
SELECT d.doc_id,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(1 AS BIGINT) AS channels,
       CAST(16 AS BIGINT) AS bits,
       CAST(d.n AS BIGINT) AS n_samples,
       CAST(d.n * 1000 // 8000 AS BIGINT) AS duration_ms,
       CAST(SUM(((d.doc_id * 37 + 11 * g.i) % 65536) - 32768) AS BIGINT) AS sample_sum
FROM d, unnest(range(0, d.n)) g(i)
GROUP BY d.doc_id, d.n
ORDER BY d.doc_id
"""

  /** Build-once / probe-many IVF: `IvfIndex.build` stages centroids +
    * cluster-PARTITIONED assignments to parquet (the expensive Lloyd's
    * half, amortized over every future probe batch), then the probe
    * plan reads ONLY the staged index — broadcast the k-row centroid
    * table, rank nprobe clusters per query, scan just those cluster
    * partitions (partition pruning = the inverted file realized as
    * storage layout). Same parameters as q_ann_ivf_kmeans (k=4, 2
    * Lloyd's iterations, probe 2, top 5), so results are identical —
    * the plan shape is what changed: no iterative k-means stage
    * anywhere in the probe's lineage (plan-asserted in
    * OperatorsSpec). */
  /** The session-staged IVF index dir for `dir` — build-once-per-session
    * (StagedOnce): repeated invocations probe the staged index instead
    * of re-running Lloyd's, the documented build/probe amortization.
    * Shared with q_ann_retraction, which COPIES this index and applies
    * a takedown to the copy (a takedown mutates an existing index; the
    * pristine original keeps serving this query's oracle). */
  private[queries] def stagedIvfDir(s: SparkSession, dir: String): String = {
    val base = java.nio.file.Paths.get("target",
      "ivf_index_" + dir.replaceAll("[^A-Za-z0-9]", "_")).toString
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("e"))
    graft.operators.StagedOnce(s, base, owner = "q_ann_ivf_persisted", dir = dir) {
      val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      IvfIndex.build(e, "vec_id", "e", k = 4, iters = 2, base)
    }
    base
  }

  def annIvfPersisted(s: SparkSession, dir: String): DataFrame = {
    val base = stagedIvfDir(s, dir)
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("e"))
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    IvfIndex.probe(s, base, q, k = 5, nprobe = 2)
      .select("qid", "vec_id", "cluster", "sim", "rank")
      .orderBy("qid", "rank")
  }

  /** Identical semantics to q_ann_ivf_kmeans — the index staging changes
    * the plan, not the result. */
  val annIvfPersistedSql: String = LlmQueries.annIvfKmeansSql

  /** GLOBAL equi-depth binning — the ungrouped companion to
    * q_equidepth_hist, and the shape that would be a single-reducer
    * catastrophe done naively: a global ntile sorts the ENTIRE table on
    * one task. Instead: one bounded `percentile_approx` sketch over the
    * whole fact (map-side mergeable, no sort anywhere) yields the 9
    * decile cut points as a 1-row frame, broadcast back onto the fact
    * for a codegen'd range-bucket fold. Two hash aggregations total —
    * the plan is identical at 100 TB. Bucket depths are sketch-derived,
    * so the oracle checks them as in-tolerance booleans against the
    * exact n/10 target (3%+5 rows ≫ the 1e-4 rank error); the global
    * row count stays exact. */
  def globalBins(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val cuts = li.agg(
      count(lit(1)).as("n_rows"),
      percentile_approx(col("cents"),
        array((1 to 9).map(i => lit(i / 10.0)): _*), lit(10000)).as("__cuts"))
    li.crossJoin(broadcast(cuts))
      .select(col("n_rows"),
        (lit(1) + aggregate(col("__cuts"), lit(0),
          (acc, c) => acc + when(col("cents") > c, 1).otherwise(0)))
          .cast("long").as("bucket"))
      .groupBy("n_rows", "bucket")
      .agg(count(lit(1)).as("__n"))
      .select(col("bucket"), col("n_rows"),
        (abs(col("__n").cast("double") - col("n_rows").cast("double") / 10.0) <=
          col("n_rows").cast("double") * 0.03 + lit(5.0)).as("depth_ok"))
      .orderBy("bucket")
  }

  val globalBinsSql: String = """
SELECT CAST(b.bucket AS BIGINT) AS bucket, s.n_rows, TRUE AS depth_ok
FROM (SELECT COUNT(*) AS n_rows FROM lineitem) s
CROSS JOIN (SELECT unnest(range(1, 11)) AS bucket) b
ORDER BY bucket
"""

  /** URL canonicalization — the first normalization pass of every web
    * corpus (duplicate pages differ only by tracking params, host case,
    * fragments): lowercase the host, strip `utm_*` tracking params and
    * fragments, keep meaningful query params, then rebuild the
    * canonical form URL-dedup and robots/blocklist joins key on. Pure
    * codegen'd string/array expressions (regexp extract → split →
    * higher-order filter → rejoin), one map-side pass, no shuffle until
    * the output sort. URLs are planted deterministically (house
    * pattern — the corpus carries none), with mixed-case hosts and
    * interleaved tracking params so every normalization step is
    * load-bearing. */
  def urlCanonical(s: SparkSession, dir: String): DataFrame = {
    val idStr = col("doc_id").cast("string")
    val url = concat(lit("https://Site"), (col("doc_id") % 7).cast("string"),
      lit(".Example.ORG/p/"), idStr,
      lit("?utm_source=feed&id="), idStr,
      lit("&utm_campaign=x&ref="), (col("doc_id") % 3).cast("string"),
      lit("#frag"))
    val docs = t(s, dir, "documents").filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), url.as("url"))
    val host = lower(regexp_extract(col("url"), "^https?://([^/?#]+)", 1))
    val path = regexp_extract(col("url"), "^https?://[^/?#]+([^?#]*)", 1)
    val qs = regexp_extract(col("url"), "\\?([^#]*)", 1)
    val params = filter(split(qs, "&"),
      p => !p.startsWith("utm_") && p =!= "")
    docs.select(col("doc_id"), host.as("host"),
        concat(host, path,
          when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
            .otherwise(lit(""))).as("canon_url"))
      .orderBy("doc_id")
  }

  val urlCanonicalSql: String = """
WITH d AS (
  SELECT doc_id,
         'https://Site' || CAST(doc_id % 7 AS VARCHAR) || '.Example.ORG/p/'
           || CAST(doc_id AS VARCHAR) || '?utm_source=feed&id='
           || CAST(doc_id AS VARCHAR) || '&utm_campaign=x&ref='
           || CAST(doc_id % 3 AS VARCHAR) || '#frag' AS url
  FROM documents WHERE doc_id % 2 = 0),
x AS (
  SELECT doc_id,
         lower(regexp_extract(url, '^https?://([^/?#]+)', 1)) AS host,
         regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1) AS path,
         list_filter(str_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
                     p -> p NOT LIKE 'utm_%' AND p <> '') AS params
  FROM d)
SELECT doc_id, host,
       host || path ||
       CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&') ELSE '' END
         AS canon_url
FROM x ORDER BY doc_id
"""

  /** Vocabulary dictionary-encoding — the tokenizer step of training
    * prep: build a frequency-ranked vocab (top 100 tokens, determinist
    * tiebreak on the token), then re-encode each document's first 30
    * tokens as the dense id array a trainer consumes, OOV → 0, plus the
    * per-doc OOV count (the coverage signal that sizes a real vocab).
    * Scale shape: vocab = explode → map-side-combined count → TakeOrdered
    * (one row per DISTINCT token crosses the wire, 100 reach the
    * driver-side window); encode = broadcast the 100-row dictionary onto
    * the positional tokens, re-assemble per doc with an order-keyed
    * collect (bounded at 30 elements by construction). */
  def tokenEncode(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFns.{normalizeText, tokens}
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    val toks = docs.select(col("doc_id"),
        posexplode(tokens(normalizeText(col("text")))).as(Seq("pos", "tok")))
      .filter(col("pos") < 30)
    // row_number over the already-LIMITed 100 rows: the unpartitioned
    // window is a fixed-size frame, not data.
    val vocab = docs
      .select(explode(tokens(normalizeText(col("text")))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(100)
      .withColumn("id", row_number().over(Window.orderBy(col("n").desc, col("tok"))))
      .select("tok", "id")
    // ids is emitted space-joined, not as a raw array: the harness
    // lexsorts every output column and list cells are unsortable there.
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(transform(array_sort(collect_list(struct(col("pos"),
          coalesce(col("id"), lit(0)).cast("long").as("tid")))),
        x => x.getField("tid")).as("idarr"))
      .select(col("doc_id"),
        array_join(transform(col("idarr"), _.cast("string")), " ").as("ids"),
        size(filter(col("idarr"), x => x === 0)).cast("long").as("n_oov"))
      .orderBy("doc_id")
  }

  val tokenEncodeSql: String = """
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s
  FROM documents),
arr AS (
  SELECT doc_id,
         CASE WHEN length(s) > 0 THEN string_split(s, ' ') ELSE [] END AS a
  FROM norm),
tok AS (
  SELECT doc_id, g.i - 1 AS pos, a[g.i] AS tok
  FROM arr, unnest(range(1, least(len(a), 30) + 1)) g(i)),
vocab AS (
  SELECT tok, row_number() OVER (ORDER BY n DESC, tok) AS id
  FROM (SELECT tok, COUNT(*) AS n
        FROM (SELECT unnest(a) AS tok FROM arr)
        GROUP BY tok ORDER BY n DESC, tok LIMIT 100)),
enc AS (
  SELECT t.doc_id, t.pos, COALESCE(v.id, 0) AS tid
  FROM tok t LEFT JOIN vocab v USING (tok))
SELECT doc_id, array_to_string(list(tid ORDER BY pos), ' ') AS ids,
       len(list_filter(list(tid ORDER BY pos), x -> x = 0)) AS n_oov
FROM enc GROUP BY doc_id ORDER BY doc_id
"""

  /** REAL video-container metadata round trip — ISO-BMFF box walk
    * (ftyp → moov → mvhd/tkhd), mirroring q_media_audio's pattern: a
    * minimal structurally-valid MP4 header is encoded per doc
    * executor-side (timescale, duration and 16.16 track dimensions all
    * closed-form functions of doc_id), then `Multimodal.parseMp4`
    * recovers every field from the byte tree. Box sizes, fixed-point
    * dims and the version-0 layouts are exact, so the oracle needs only
    * arithmetic — a walk that misread any offset misses the hash.
    * Frame decode stays quarantined (no JDK video codec); container
    * triage is the real first pass of a 100 TB video pipeline anyway —
    * duration/dimension filters run before any codec is scheduled. */
  def mediaVideo(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Multimodal.MediaRow
    val ids = t(s, dir, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id").cast("long")).as[Long]
    val media = ids.mapPartitions(_.map { id =>
      val dur = (600 * (1 + id % 120) + (id * 7) % 600).toInt
      MediaRow(id, "mp4", Multimodal.encodeMp4("isom", 600, dur,
        width = (320 + (id % 8) * 16).toInt, height = (240 + (id % 6) * 16).toInt))
    })
    Multimodal.parseVideo(media)
      .select(col("id").as("doc_id"), col("brand"), col("timescale"),
        col("duration_ms"), col("width"), col("height"))
      .orderBy("doc_id")
  }

  val mediaVideoSql: String = """
SELECT doc_id, 'isom' AS brand, CAST(600 AS BIGINT) AS timescale,
       CAST((600 * (1 + doc_id % 120) + (doc_id * 7) % 600) * 1000 // 600 AS BIGINT)
         AS duration_ms,
       CAST(320 + (doc_id % 8) * 16 AS BIGINT) AS width,
       CAST(240 + (doc_id % 6) * 16 AS BIGINT) AS height
FROM documents WHERE doc_id < 200 ORDER BY doc_id
"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_token_encode" -> (tokenEncode _),
    "q_media_audio" -> (mediaAudio _),
    "q_media_video" -> (mediaVideo _),
    "q_ann_ivf_persisted" -> (annIvfPersisted _),
    "q_global_bins" -> (globalBins _),
    "q_url_canonical" -> (urlCanonical _))

  val oracles: Map[String, String] = Map(
    "q_token_encode" -> tokenEncodeSql,
    "q_media_audio" -> mediaAudioSql,
    "q_media_video" -> mediaVideoSql,
    "q_ann_ivf_persisted" -> annIvfPersistedSql,
    "q_global_bins" -> globalBinsSql,
    "q_url_canonical" -> urlCanonicalSql)
}
