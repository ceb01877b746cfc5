package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns._

/** Dev tool: build/probe timing of the persisted MinHash LSH index
  * (q_lsh_index's operator) — stage-level, fresh staging dir. */
object LshIndexProfile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[lshprof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, sfDir, "documents")
    val norm = normalizeText(col("text"))
    val idxDir = "target/lshprof_idx"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(idxDir), true)
    time("build (<400)")(graft.operators.MinHashIndex.build(
      docs.filter(col("doc_id") < 400), "doc_id", norm, idxDir))
    time("append (>=400)")(graft.operators.MinHashIndex.append(
      docs.filter(col("doc_id") >= 400), "doc_id", norm, idxDir))
    for (i <- 1 to 3)
      time(s"probe $i")(graft.operators.MinHashIndex.probeNew(
        spark, idxDir, docs, "doc_id", norm, threshold = 0.7, minNewId = 400L).count())
    // --- internals
    val fs2 = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val it = fs2.listFiles(new org.apache.hadoop.fs.Path(s"$idxDir/buckets"), true)
    var nf = 0; var bytes = 0L
    while (it.hasNext) { val f = it.next(); if (f.getPath.getName.endsWith(".parquet")) { nf += 1; bytes += f.getLen } }
    println(s"[lshprof] index files: $nf, ${bytes / 1024} KiB")
    val staged = spark.read.parquet(s"$idxDir/buckets")
    println(s"[lshprof] staged rows: ${staged.count()}, partitions: ${staged.rdd.getNumPartitions}")
    val wide = staged.groupBy("band", "bucket")
      .agg(count(lit(1)).as("__bw"), min(col("doc_id")).as("__rep"))
      .filter(col("__bw") > 64)
    time("probe: wide agg")(wide.count())
    val narrow = staged.join(broadcast(wide.select("band", "bucket")),
      Seq("band", "bucket"), "left_anti")
    val narrowPairs = narrow.as("x")
      .join(narrow.filter(col("doc_id") >= 400L).as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
    time("probe: narrowPairs")(println(s"[lshprof] narrowPairs: ${narrowPairs.count()}"))
    val pairs = narrowPairs.distinct().localCheckpoint(true)
    val ids = pairs.select(col("id_a").as("doc_id"))
      .union(pairs.select(col("id_b").as("doc_id"))).distinct()
    println(s"[lshprof] candidate docs: ${ids.count()}")
    val shArr = docs.join(ids, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), graft.operators.MinHashDedup.shingles(norm).as("__sh"))
      .localCheckpoint(true) // mirrors probeNewMulti's r15 staging
    time("probe: verify")(
      pairs
        .join(shArr.withColumnRenamed("doc_id", "id_a").withColumnRenamed("__sh", "sh_a"), "id_a")
        .join(shArr.withColumnRenamed("doc_id", "id_b").withColumnRenamed("__sh", "sh_b"), "id_b")
        .withColumn("jaccard", graft.operators.MinHashDedup.jaccard(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= 0.7).count())
    spark.stop()
  }
}
