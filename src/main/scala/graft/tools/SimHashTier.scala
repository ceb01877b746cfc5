package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns.{normalizeText, tokens}
import graft.operators.SimHash

/** Dev tool: structure of the q_simhash_hamming workload at a tier dir —
  * block-bucket width distribution, candidate and output pair counts —
  * to attribute tier cost between candidate generation and the size of
  * the TRUE output (replica-heavy tiers make hamming-≤2 pairs inherently
  * quadratic in copy count: every copy pair of a doc is a true pair).
  *
  * Usage: runMain graft.tools.SimHashTier [dir]
  */
object SimHashTier {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[simhash-tier] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables(spark, dir, "documents")
    val base = SimHash.withSimhash(docs, "doc_id", tokens(normalizeText(col("text"))))
      .localCheckpoint(true)
    val planted = base.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      col("simhash").bitwiseXOR(
        expr("shiftleft(bigint(1), int(doc_id % 32))")).as("simhash"))
    val sim = base.union(planted).localCheckpoint(true)
    val n = sim.count()
    val nDistinct = sim.select("simhash").distinct().count()
    println(s"[simhash-tier] rows=$n distinct_simhashes=$nDistinct")

    // block-bucket width distribution — the PRODUCTION join's key
    // space: the structs come from SimHash.blockKeys itself, so a
    // change to the block split can't silently divorce this report
    // from the operator it attributes cost for.
    val nBits = 32; val nBlocks = 3
    val widths = sim.select(
        explode(array(SimHash.blockKeys(col("simhash"), nBits, nBlocks): _*)).as("bb"))
      .groupBy(col("bb.blk").as("blk"), col("bb.bval").as("bval"))
      .agg(count(lit(1)).as("w"))
      .localCheckpoint(true)
    val stats = widths.agg(count(lit(1)).as("buckets"), max("w").as("maxw"),
      sum(col("w") * (col("w") - 1) / 2).as("pair_bound")).head
    println(s"[simhash-tier] buckets=${stats.getLong(0)} max_width=${stats.getLong(1)} " +
      s"sum_w_choose_2=${stats.get(2)}")
    widths.orderBy(desc("w")).limit(10).collect().foreach { r =>
      println(s"[simhash-tier]   blk=${r.getInt(0)} bval=${r.getLong(1)} w=${r.getLong(2)}")
    }
    // identical-simhash groups alone force this many output pairs:
    val identPairs = sim.groupBy("simhash").count()
      .agg(sum(col("count") * (col("count") - 1) / 2)).head.get(0)
    println(s"[simhash-tier] identical-simhash forced pairs=$identPairs")

    val out = time("hammingPairs full")(
      SimHash.hammingPairs(sim, "doc_id", nBits = 32, maxDist = 2).count())
    println(s"[simhash-tier] output_pairs=$out")
    spark.stop()
  }
}
