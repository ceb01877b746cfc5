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
  def annIvfPersisted(s: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Paths.get("target",
      "ivf_index_" + dir.replaceAll("[^A-Za-z0-9]", "_")).toString
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("e"))
    IvfIndex.build(e, "vec_id", "e", k = 4, iters = 2, base)
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    IvfIndex.probe(s, base, q, k = 5, nprobe = 2)
      .select("qid", "vec_id", "cluster", "sim", "rank")
      .orderBy("qid", "rank")
  }

  /** Identical semantics to q_ann_ivf_kmeans — the index staging changes
    * the plan, not the result. */
  val annIvfPersistedSql: String = LlmQueries.annIvfKmeansSql

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_audio" -> (mediaAudio _),
    "q_ann_ivf_persisted" -> (annIvfPersisted _))

  val oracles: Map[String, String] = Map(
    "q_media_audio" -> mediaAudioSql,
    "q_ann_ivf_persisted" -> annIvfPersistedSql)
}
