package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables for shuffle-free co-located joins.
  *
  * Writing both join sides bucketed by the join key (same bucket count)
  * pre-partitions the data on disk; a subsequent equi-join reads bucket i
  * against bucket i with NO exchange on either side — the
  * pre-shuffled-layout strategy for repeatedly-joined 100 TB fact tables
  * (pay the shuffle once at write time, never at read time).
  *
  * Spark's bucketing rides the session catalog (`saveAsTable`), so these
  * helpers manage named tables in the configured warehouse dir.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sortCol: Option[String] = None): Unit = {
    val spark = df.sparkSession
    // A fresh session's metastore may not know the table while its
    // managed location survives from a previous JVM; saveAsTable then
    // fails with LOCATION_ALREADY_EXISTS. Drop both.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(wh), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).format("parquet").saveAsTable(table)
  }

  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
