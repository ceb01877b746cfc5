package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Merge

/** The reference's batch ingest re-expressed over Structured Streaming
  * (SURVEY §1.5/§7): the reference achieves effective exactly-once by
  * re-running keyed upserts (C10/R9/R10); the streaming translation is
  *
  *  - watermarked `dropDuplicatesWithinWatermark` ≡ C9 dedup + upsert
  *    idempotency, with bounded state (keys expire past the watermark)
  *  - event-time windowed aggregation with a late-data policy the batch
  *    jobs never had
  *  - a `foreachBatch` MERGE sink reusing the SAME batch Merge operator,
  *    so batch and streaming ingest share one upsert semantics
  *
  * All transforms are the same codegen'd expressions as the batch path —
  * a streaming DataFrame is just an unbounded plan over micro-batches.
  */
object StreamingIngest {

  /** Streaming composite-key dedup with bounded state. */
  def dedupStream(entries: DataFrame, eventTimeCol: String,
                  watermark: String, keys: Seq[String]): DataFrame =
    entries.withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Event-time tumbling-window totals (exact cents accumulation). */
  def windowedTotals(events: DataFrame, eventTimeCol: String,
                     valueCol: String, windowLen: String,
                     watermark: String, dims: Seq[String]): DataFrame =
    events.withWatermark(eventTimeCol, watermark)
      .groupBy(window(col(eventTimeCol), windowLen) +: dims.map(col): _*)
      .agg(count(lit(1)).as("n"),
        (sum(round(col(valueCol) * 100).cast("long")).cast("double") / 100.0).as("total"))

  /** `foreachBatch` MERGE into a parquet target: read-merge-swap. The
    * swap (write aside, then replace) keeps readers consistent; a table
    * format with transactional MERGE would replace this at production
    * scale, with identical column semantics. */
  def upsertBatch(batch: DataFrame, targetDir: String, keys: Seq[String],
                  updateCols: Seq[String], insertOnlyCols: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val target = java.nio.file.Paths.get(targetDir)
    val merged =
      if (java.nio.file.Files.exists(target)) {
        val current = spark.read.parquet(targetDir)
        Merge.upsert(current, batch, keys, updateCols, insertOnlyCols)
      } else batch.select((keys ++ updateCols ++ insertOnlyCols).map(col): _*)
    val tmp = targetDir + "__staged"
    merged.write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(targetDir)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }
}
