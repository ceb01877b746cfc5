package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the engine's landed parquet tables (see TESTDATA.md).
  *
  * The reference ingests from external systems (GCS CSV blobs, RSS feeds,
  * an Excel workbook — `CSV PARSER/gcp_csv.py:203-205`,
  * `RSS PARSER/gcp_rss.py:24-28,83`); this engine models those as
  * ingest-boundary adapters and consumes already-landed columnar tables,
  * so every scan is a prunable, filter-pushable parquet read.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet TIMESTAMP(NANOS) columns per table. Spark has no nanosecond
    * timestamp type; with `spark.sql.legacy.parquet.nanosAsLong` the scan
    * yields the raw int64 and we truncate to microseconds here (floor
    * division — same truncation Spark applies elsewhere for ns→µs). */
  private val nanosCols: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"))

  /** Tiny dimension tables: keep single-partition so Catalyst broadcasts
    * them; never worth a repartition. */
  private val dims = Set("region", "nation", "supplier", "part", "customer")

  /** Loaded-table memo. `apply` is called inside every registered query
    * — hundreds of times per suite run — and each un-memoized load pays
    * a driver file listing, a parquet footer read, AND a full physical
    * planning pass (the `rdd.getNumPartitions` probe below). Reusing
    * the DataFrame per (session, dir, table) keeps one InMemoryFileIndex
    * and one resolved relation per table — the same listing-reuse a
    * catalog table gets from the shared session catalog. Session-keyed
    * and context-end-evicted via [[SessionMemo]]; testdata is
    * immutable, so staleness is not a concern. */
  private val memo = new SessionMemo[(String, String), DataFrame]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    memo(spark, (dir, name)) { load(spark, dir, name) }

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val fixed = nanosCols.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      // Integral `div`, not `/`: ns-epoch longs (~1.7e18) exceed double's
      // exact integer range, so float division would corrupt the low bits.
      d.schema(c).dataType match {
        case LongType =>
          d.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
        case TimestampNTZType =>
          // Data generators have landed `ts` both as TIMESTAMP(NANOS)
          // (→ long via nanosAsLong) and as plain TIMESTAMP(MICROS,
          // isAdjustedToUTC=false), which Spark 4 infers as TIMESTAMP_NTZ.
          // The session TZ is pinned UTC, so casting NTZ→TIMESTAMP preserves
          // every instant; downstream unix_micros/window/watermark code all
          // expects TimestampType. Loader must be robust to both encodings.
          d.withColumn(c, col(c).cast(TimestampType))
        case _ => d
      }
    }
    // Small-scan compaction guard: a fact table landed as one parquet
    // row-group scans as ONE partition, serializing all per-row compute
    // (hashing, regex, vector math) no matter how many cores exist. If the
    // scan yields fewer partitions than the session's parallelism, fan it
    // out once. At real scale (many files / many row groups) the scan
    // already exceeds core count and this is a no-op — it only triggers
    // for small landed files, where the round-robin shuffle is cents.
    val target = spark.sparkContext.defaultParallelism
    if (!dims(name) && fixed.rdd.getNumPartitions < math.max(target / 2, 1))
      fixed.repartition(target)
    else fixed
  }
}
