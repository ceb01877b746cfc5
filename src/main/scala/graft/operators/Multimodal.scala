package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: opaque binary payloads + typed metadata.
  *
  * Images/audio/video ride through the engine as `binary` columns with a
  * metadata struct; decode/feature-extraction runs partition-parallel via
  * `Dataset.mapPartitions` (the Scala analogue of arrow-batched UDF
  * plumbing: one iterator per partition, library handles amortized across
  * the whole partition, never per-row).
  *
  * The actual codec call is STUBBED (`decodeStub`) — no image/audio libs
  * in this environment — with a deterministic fake derived from the byte
  * payload, so the distributed plumbing (schema, encoders, partitioning,
  * batch iteration) is real and testable while the codec is swappable.
  */
object Multimodal {

  case class MediaRow(id: Long, group: String, payload: Array[Byte])

  case class MediaMeta(id: Long, group: String, n_bytes: Long,
                       width: Long, height: Long, frames: Long)

  /** STUB for the real codec: a decoder would parse `payload` headers;
    * the fake derives dimensions deterministically from payload length so
    * results are reproducible and oracle-checkable. */
  def decodeStub(r: MediaRow): MediaMeta = {
    val n = r.payload.length.toLong
    MediaMeta(r.id, r.group, n, width = n % 640, height = (n * 7) % 480,
      frames = n % 16)
  }

  /** Partition-parallel decode: one pass, no shuffle, codegen on both
    * sides of the mapPartitions boundary. */
  def decode(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** Wrap any table into media rows: `textCol`'s UTF-8 bytes stand in for
    * a real blob column. */
  def asMedia(spark: SparkSession, df: DataFrame, idCol: String,
              groupCol: String, textCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(groupCol).as("group"),
        col(textCol).cast("binary").as("payload"))
      .as[MediaRow]
  }
}
