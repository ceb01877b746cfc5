package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Cleansing._
import graft.operators.Dedup

/** The CSV ingest dataflow (SURVEY §3.1) as one lazy declarative plan:
  * C3 path-derived account id → C4 rename → C5 timestamp normalize →
  * C6 required-column gate → C7 numeric coercion → C8 null placeholder
  * columns → C9 keep-first composite-key dedup.
  *
  * The reference executes this eagerly per file under a 10-thread pool
  * (`CSV PARSER/gcp_csv.py:71-198,208-211`); here it is a single Catalyst
  * plan over however many files the scan lists, so parallelism is
  * partition scheduling, not a driver thread pool, and the only wide
  * stage is the dedup shuffle on the composite key.
  */
object CsvJob {

  /** FXBlue export header → snake_case (C4, `CSV PARSER/gcp_csv.py:81-99`). */
  val Renames: Map[String, String] = Map(
    "Ticket" -> "ticket", "Symbol" -> "symbol", "Lots" -> "lots",
    "Buy/sell" -> "trade_type", "Open price" -> "open_price",
    "Close price" -> "close_price", "Open time" -> "open_time",
    "Close time" -> "close_time", "Profit" -> "profit", "Swap" -> "swap",
    "Commission" -> "commission", "T/P" -> "tp", "S/L" -> "sl",
    "Pips" -> "pips")

  /** C6 (`CSV PARSER/gcp_csv.py:108-119`): whole input rejected when a
    * required column is missing — schema check, zero data read. */
  def passesGate(df: DataFrame, required: Seq[String]): Boolean =
    required.forall(df.columns.contains)

  /** Core clean: rename → timestamp → numerics → placeholders → dedup.
    *
    * @param pathCol    column holding the source object path (C3)
    * @param orderCols  intra-file order, the reference's implicit row order
    *                   that makes keep-first dedup deterministic; callers
    *                   must make it a total order within each key group
    */
  def clean(raw: DataFrame, pathCol: String, orderCols: Seq[Column],
            renames: Map[String, String] = Renames,
            timestampCol: String = "timestamp",
            numericCols: Seq[String] = Seq("lots", "open_price", "close_price",
              "profit", "swap", "commission", "tp", "sl", "pips"),
            gptCols: Seq[String] = Seq("gpt_summary", "gpt_strategy",
              "gpt_risk", "gpt_quality", "gpt_timing", "gpt_comments"),
            dedupKeys: Seq[String] = Seq("account_id", "ticket", "timestamp")): DataFrame = {
    val renamed = raw
      .withColumn("account_id", accountIdFromPath(col(pathCol)))
      .withColumnsRenamed(renames)
    val ts =
      if (renamed.columns.contains(timestampCol))
        renamed.withColumn(timestampCol,
          isoFormat(try_to_timestamp(col(timestampCol))))
      else renamed
    val nums = numericCols.filter(ts.columns.contains).foldLeft(ts) {
      (d, c) => d.withColumn(c, tryDouble(col(c)))
    }
    val typed =
      if (nums.columns.contains("ticket"))
        nums.withColumn("ticket", tryLong(col("ticket")))
      else nums
    val withGpt = gptCols.foldLeft(typed) { (d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast("string"))
    }
    val hashed = withGpt.withColumn("row_hash",
      rowHash(dedupKeys.map(k => col(k).cast("string")): _*))
    // min_by aggregation form: map-side combine, no per-key sort (see
    // Dedup.keepFirstAgg) — identical result to the window form given the
    // caller's total order, verified by the oracle gate.
    Dedup.keepFirstAgg(hashed, dedupKeys, orderCols)
  }
}
