package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev tool (r16): which PHASE of q_dynamic_overwrite carries its
  * persistent bench flag?
  *
  * The query is two parquet writes to target/ (disk-backed ext4; NOT
  * the tmpfs scratch) plus a read-back aggregate: (1) static
  * partitionBy overwrite of the 10k-event slice, (2) dynamic-mode
  * overwrite of one partition, (3) read + groupBy. A disk-contended
  * co-tenant inflates writes more than the compute-bound control
  * queries the band is built from — this tool decomposes the wall time
  * so the flag can be attributed to a phase instead of to the query.
  * The input frame is staged eagerly first (scan variance removed);
  * phases run interleaved across reps (the load-immune house method),
  * with a NON-partitioned overwrite of the same rows as an IO control —
  * it pays raw write bandwidth but no per-partition commit machinery.
  *
  * Usage: sbt "runMain graft.tools.DynOverwriteProfile [sfDir] [reps]"
  */
object DynOverwriteProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 6
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = "target/dynprof"
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    def rm(p: String): Unit =
      fs.delete(new org.apache.hadoop.fs.Path(p), true)

    val ev = Tables(spark, dir, "events").filter(col("event_id") < 10000)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .localCheckpoint(true)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def staticWrite(): Unit =
      ev.write.partitionBy("event_type").mode("overwrite").parquet(base)
    // r19 evidence A/B for the r18 clustered-write change: same rows,
    // with vs without the pre-write exchange keyed on the partition
    // column; reports output file count per variant.
    def countFiles(p: String): Int = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
      var n = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    def clusteredWrite(): Unit =
      ev.repartition(col("event_type"))
        .write.partitionBy("event_type").mode("overwrite").parquet(base + "_cl")
    def dynamicWrite(): Unit = {
      val key = "spark.sql.sources.partitionOverwriteMode"
      spark.conf.set(key, "dynamic")
      try ev.filter(col("event_type") === "click")
        .withColumn("cents", col("cents") * 2)
        .write.partitionBy("event_type").mode("overwrite").parquet(base)
      finally spark.conf.set(key, "STATIC")
    }
    def readAgg(): Unit =
      spark.read.parquet(base).groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
        .orderBy("event_type").collect()
    def plainWrite(): Unit =
      ev.write.mode("overwrite").parquet(base + "_plain")

    // warm-up
    rm(base); staticWrite(); dynamicWrite(); readAgg(); plainWrite()

    val phases = Seq[(String, () => Unit)](
      ("1 static partitionBy overwrite", () => { rm(base); staticWrite() }),
      ("2 dynamic-mode overwrite      ", () => dynamicWrite()),
      ("3 read-back groupBy           ", () => readAgg()),
      ("0 plain overwrite (IO control)", () => plainWrite()),
      ("4 clustered partitionBy write ", () => { rm(base + "_cl"); clusteredWrite() }))
    val acc = phases.map(_ => collection.mutable.ArrayBuffer[Double]())
    for (_ <- 1 to reps; ((_, f), i) <- phases.zipWithIndex)
      acc(i) += timed(f())
    def load(): String = scala.io.Source.fromFile("/proc/loadavg").getLines()
      .next().split(" ").head
    phases.zipWithIndex.foreach { case ((label, _), i) =>
      val xs = acc(i).toSeq
      println(f"[dynprof] $label: min=${xs.min}%.3f s  " +
        f"all=${xs.map(x => f"$x%.2f").mkString(",")}")
    }
    // File-count evidence: phase 1 (unclustered, the pre-r18 shape) vs
    // phase 4 (clustered on event_type, the registered query's shape).
    rm(base); staticWrite()
    rm(base + "_cl"); clusteredWrite()
    println(s"[dynprof] files unclustered=${countFiles(base)} " +
      s"clustered=${countFiles(base + "_cl")}")
    println(s"[dynprof] end load=${load()}")
    spark.stop()
  }
}
