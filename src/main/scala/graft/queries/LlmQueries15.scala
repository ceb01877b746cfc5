package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.operators.PrefixSum
import graft.sinks.RangeSortedParquet

/** Fifteenth LLM-pipeline batch: the training-loop EPOCH SHUFFLE — a
  * seeded, reproducible global random permutation of the corpus. Every
  * pre-training run reshuffles its dataset once per epoch; at 100 TB
  * the permutation must be (a) deterministic given (seed, epoch) so a
  * crashed run resumes at the same order, and (b) computed without a
  * global sort funnel. Keying each row by `md5(seed || id)` gives (a);
  * the global position is then exact rank under that key — here a
  * [[PrefixSum]] distributed SELECTION of the head of the permutation,
  * which window-scans only the buckets containing the requested
  * positions (the full-epoch form is the same machinery with
  * `PrefixSum.rank`, still bucket-partitioned windows only; writers
  * would range-partition on the very same md5 key, the terasort
  * layout).
  */
object LlmQueries15 {

  /** First 30 positions of the (seed=epoch7) permutation of
    * `documents`. The md5 hex string is the sort key (collision-free
    * in practice; doc_id tiebreak makes the order total regardless);
    * the numeric bucket key is its leading 13 hex digits — < 2^53, so
    * the double cast inside PrefixSum is exact, and hex-prefix order is
    * (weakly) monotone in full-string order as the bucketing contract
    * requires. `stable = true`: the input is a pure projection of the
    * per-session staged table, so the selection's three passes re-scan
    * cached blocks instead of paying a checkpoint. */
  def epochShuffle(s: SparkSession, dir: String): DataFrame = {
    val keyed = Tables.staged(s, dir, "documents", Seq("doc_id"))
      .select(col("doc_id"),
        md5(concat(lit("epoch7:"), col("doc_id").cast("string"))).as("k"))
    // Native decode of the permutation key prefix (value-identical to
    // conv(substring(k,1,13),16,10)) — reads the EXISTING hex column k,
    // which must stay alive as the tiebreak, so the md5 digests once
    // per row (the r13 Md5PrefixLong spelling re-digested the
    // pre-image: two digests per row, ADVICE r13).
    val permKey = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.HexPrefixLong(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("k")), 13))
    PrefixSum.selectRanks(keyed, permKey,
        Seq(col("k"), col("doc_id")),
        n => (1L to math.min(30L, n)).map(i => (i.toString, i)),
        "lbl", stable = true)
      .select(col("lbl").cast("long").as("pos"), col("doc_id"), col("k"))
      .orderBy("pos")
  }

  val epochShuffleSql: String = """
WITH keyed AS (
  SELECT doc_id, md5(concat('epoch7:', CAST(doc_id AS VARCHAR))) AS k
  FROM documents),
r AS (SELECT row_number() OVER (ORDER BY k, doc_id) AS pos, doc_id, k
      FROM keyed)
SELECT pos, doc_id, k FROM r WHERE pos <= 30 ORDER BY pos
"""

  /** The full-epoch shuffle WRITER — the form a training pipeline hits
    * every epoch (the reader above is the audit). The corpus is
    * range-partitioned on the same `md5(seed‖id)` key and written
    * sorted-within-file: the terasort layout, a global permutation
    * materialized with one sampled range exchange and per-partition
    * sorts — no single-task sort funnel, so it scales to any number of
    * output files. The query then proves the LAYOUT ALONE reproduces
    * the permutation: re-read, recover each row's global position as
    * (rows in files before mine) + (my rank within my file) — file
    * offsets from a bounded per-file aggregate (≤ nFiles rows, folded
    * on the driver like PrefixSum's bucket counts), within-file ranks
    * from a file-partitioned window — and checksum every 100-position
    * block of the reconstructed permutation. The oracle computes the
    * same blocks from `row_number() OVER (ORDER BY k, doc_id)`, so a
    * single out-of-place row anywhere in the epoch breaks the match. */
  def epochWrite(s: SparkSession, dir: String): DataFrame = {
    val keyed = Tables(s, dir, "documents")
      .select(col("doc_id"),
        md5(concat(lit("epoch7:"), col("doc_id").cast("string"))).as("k"))
    val path = "target/epoch_fixture_" + dir.replaceAll("[^A-Za-z0-9]", "_")
    RangeSortedParquet.write(keyed, path, Seq(col("k"), col("doc_id")), nFiles = 8)

    val rd = s.read.parquet(path).withColumn("file", input_file_name())
    // Bounded: one row per output file. Folded on the driver into
    // exclusive offsets (cumulative row counts in file-range order).
    val files = rd.groupBy("file")
      .agg(min(col("k")).as("lo"), count(lit(1)).as("n"))
      .collect().sortBy(_.getAs[String]("lo"))
    val offsets = files.scanLeft(0L)(_ + _.getAs[Long]("n")).init
    val offsetDf = s.createDataFrame(
      s.sparkContext.parallelize(
        files.zip(offsets).map { case (r, o) =>
          org.apache.spark.sql.Row(r.getAs[String]("file"), o)
        }.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("file",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("offset",
          org.apache.spark.sql.types.LongType))))
    val pos = rd
      .withColumn("i",
        row_number().over(Window.partitionBy("file").orderBy("k", "doc_id")))
      .join(broadcast(offsetDf), Seq("file"))
      .select((col("offset") + col("i")).as("pos"), col("doc_id"))
    pos
      .groupBy(floor((col("pos") - 1) / 100).as("blk"))
      .agg(count(lit(1)).as("n"),
        sum(col("pos") * col("doc_id")).as("dot"),
        md5(concat_ws(",",
          transform(sort_array(collect_list(struct(col("pos"), col("doc_id")))),
            x => x.getField("doc_id").cast("string")))).as("sig"))
      .orderBy("blk")
  }

  val epochWriteSql: String = """
WITH keyed AS (
  SELECT doc_id, md5(concat('epoch7:', CAST(doc_id AS VARCHAR))) AS k
  FROM documents),
r AS (SELECT row_number() OVER (ORDER BY k, doc_id) AS pos, doc_id
      FROM keyed)
SELECT CAST(floor((pos - 1) / 100) AS BIGINT) AS blk, COUNT(*) AS n,
       CAST(SUM(pos * doc_id) AS BIGINT) AS dot,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY pos)) AS sig
FROM r GROUP BY 1 ORDER BY 1
"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_epoch_shuffle" -> (epochShuffle _),
    "q_epoch_write" -> (epochWrite _))

  val oracles: Map[String, String] = Map(
    "q_epoch_shuffle" -> epochShuffleSql,
    "q_epoch_write" -> epochWriteSql)
}
