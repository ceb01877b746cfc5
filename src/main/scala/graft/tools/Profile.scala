package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns._
import graft.operators.MinHashDedup

/** Dev tool: stage-by-stage timing of the minhash pipeline. */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
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
    time("scan")(docs.count())
    val norm = normalizeText(col("text"))
    time("shingles")(docs.select(explode(MinHashDedup.shingles(norm))).count())
    val sig = MinHashDedup.signatures(docs, "doc_id", norm)
    time("signatures")(sig.count())
    val sigC = sig.persist()
    sigC.count()
    val pairs = MinHashDedup.candidatePairs(sigC, "doc_id")
    time("candidatePairs(cached sig)")(pairs.count())
    val pairsU = MinHashDedup.candidatePairs(sig, "doc_id")
    time("candidatePairs(uncached)")(pairsU.count())
    println(s"[profile] n_pairs = ${pairs.count()}")
    time("full nearDuplicates")(
      MinHashDedup.nearDuplicates(docs, "doc_id", norm, 0.7).count())
    spark.stop()
  }
}
