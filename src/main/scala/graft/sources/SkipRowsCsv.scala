package graft.sources

import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.lib.input.{FileSplit, TextInputFormat}
import org.apache.spark.rdd.NewHadoopRDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** C2 — CSV scan with per-file preamble skip.
  *
  * FXBlue exports carry a one-line title above the header; the reference
  * handles it with `pd.read_csv(..., skiprows=1)` per downloaded blob
  * (`CSV PARSER/gcp_csv.py:75-76`). Spark's CSV reader has no `skipRows`,
  * and "drop the first N lines of each FILE" is not expressible over a
  * plain `spark.read.text` scan (row order ≠ file order across splits).
  *
  * This source keeps the scan distributed and splittable by reading via
  * Hadoop `TextInputFormat`, whose record key is the line's BYTE OFFSET
  * within its file: (file, offset) totally orders lines per file without
  * any global structure. Preamble/header dropping is then a per-file
  * `row_number` window — one shuffle keyed by file name, parallel across
  * files, which matches the reference's per-file parallelism model (C11)
  * at any file count. Records parse with `from_csv` in PERMISSIVE mode,
  * so one malformed row nulls that row, never fails the file (C12).
  */
object SkipRowsCsv {

  /** @param skipRows lines to drop before the header (the preamble)
    * @param header   whether a header line follows the preamble (dropped;
    *                 `schema` supplies names/types positionally)
    * @return parsed columns plus `_src_file` (source path, feeds C3) and
    *         `_src_offset` (byte offset = in-file order, the explicit
    *         order column keep-first dedup needs for pandas parity) */
  def read(spark: SparkSession, glob: String, schema: StructType,
           skipRows: Int = 1, header: Boolean = true,
           options: Map[String, String] = Map.empty): DataFrame = {
    val lines = spark.sparkContext
      .newAPIHadoopFile(glob, classOf[TextInputFormat],
        classOf[LongWritable], classOf[Text])
      .asInstanceOf[NewHadoopRDD[LongWritable, Text]]
      .mapPartitionsWithInputSplit { (split, iter) =>
        val path = split.asInstanceOf[FileSplit].getPath.toString
        iter.map { case (off, txt) => (path, off.get(), txt.toString) }
      }
    val session = spark
    import session.implicits._
    val df = lines.toDF("_src_file", "_src_offset", "__line")
    val drop = skipRows + (if (header) 1 else 0)
    val w = Window.partitionBy(col("_src_file")).orderBy(col("_src_offset"))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > drop)
      .select(col("_src_file"), col("_src_offset"),
        from_csv(col("__line"), schema, options).as("__r"))
      .select(col("_src_file"), col("_src_offset"), col("__r.*"))
  }
}
