package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns.normalizeText
import graft.operators.MinHashDedup

/** Dev tool: interleaved A/B of nearDuplicates' VERIFY TAIL under the
  * two fingerprint spellings — r14's md5(text) vs r15's 128-bit
  * sha2-256 prefix — on identical checkpointed candidate pairs, to
  * separate "the fp hash change cost something" from "today's machine
  * is slower" when tier samples drift (the EstJoinProfile method).
  *
  * Usage: runMain graft.tools.NearDupFpProfile [dir] [reps]
  */
object NearDupFpProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables(spark, dir, "documents")
    val norm = normalizeText(col("text"))
    val threshold = 0.7
    val sig = MinHashDedup.signatures(docs, "doc_id", norm).persist()
    val pairs = MinHashDedup.candidatePairs(sig, "doc_id").localCheckpoint(true)
    sig.unpersist()
    println(s"[fp-ab] n_pairs=${pairs.count()}")

    // The verify tail of MinHashDedup.nearDuplicates, fp spelling
    // injected; everything downstream of `pairs` is re-run per rep.
    def verify(fp: Column => Column): Long = {
      val ids = pairs.select(col("id_a").as("doc_id"))
        .union(pairs.select(col("id_b").as("doc_id"))).distinct()
      val cand = docs.join(ids, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), substring(norm, 1, 200).as("__t"))
        .withColumn("__fp", fp(col("__t")))
      val docFp = cand.select(col("doc_id"), col("__fp")).localCheckpoint(true)
      val repArr = cand.dropDuplicates("__fp")
        .select(col("__fp"), MinHashDedup.shingles(col("__t")).as("__sh"))
        .withColumn("__n", size(col("__sh")))
        .localCheckpoint(true)
      val fpPairs = pairs
        .join(docFp.toDF("id_a", "fp_a"), "id_a")
        .join(docFp.toDF("id_b", "fp_b"), "id_b")
      val sizes = repArr.select(col("__fp"), col("__n"))
      val pruned = fpPairs
        .join(sizes.toDF("fp_a", "n_a"), "fp_a")
        .join(sizes.toDF("fp_b", "n_b"), "fp_b")
        .filter(least(col("n_a"), col("n_b")).cast("double") >=
          (lit(threshold) - lit(1e-9)) * greatest(col("n_a"), col("n_b")))
        .select("id_a", "id_b", "fp_a", "fp_b")
      val jac = pruned.select("fp_a", "fp_b").distinct()
        .join(repArr.select(col("__fp").as("fp_a"), col("__sh").as("sh_a")), "fp_a")
        .join(repArr.select(col("__fp").as("fp_b"), col("__sh").as("sh_b")), "fp_b")
        .withColumn("jaccard", MinHashDedup.jaccard(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= threshold)
        .select("fp_a", "fp_b", "jaccard")
      val n = pruned.join(jac, Seq("fp_a", "fp_b"))
        .select("id_a", "id_b", "jaccard").count()
      docFp.unpersist(); repArr.unpersist()
      n
    }

    val md5Fp: Column => Column = c => md5(c)
    val shaFp: Column => Column = c => substring(sha2(c, 256), 1, 32)
    verify(md5Fp); verify(shaFp) // warm both
    def timed(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val a = collection.mutable.ArrayBuffer[Double]()
    val b = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to reps) { a += timed(verify(md5Fp)); b += timed(verify(shaFp)) }
    def show(n: String, xs: Seq[Double]): Unit =
      println(f"[fp-ab] $n: min=${xs.min}%.3f all=${xs.map(x => f"$x%.2f").mkString(",")}")
    show("verify tail, md5 fp (r14)", a.toSeq)
    show("verify tail, sha2-prefix fp (r15)", b.toSeq)
    val t0 = System.nanoTime()
    MinHashDedup.nearDuplicates(docs, "doc_id", norm, threshold).count()
    println(f"[fp-ab] full nearDuplicates (current code): ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
