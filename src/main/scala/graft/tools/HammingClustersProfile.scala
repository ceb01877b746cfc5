package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns.{normalizeText, tokens}
import graft.operators.{ConnectedComponents, SimHash}

/** Dev tool: stage split of the q_hamming_clusters workload at a tier
  * dir — signature build vs star-edge build vs ConnectedComponents
  * closure vs sizes join — to attribute the 100× tier's seconds before
  * optimizing anything (r14 verdict #4: the star edges are linear in
  * corpus size, so the suspicion is CC's iterative rounds over the
  * largest cluster).
  *
  * Usage: runMain graft.tools.HammingClustersProfile [dir] [nBits]
  */
object HammingClustersProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBits = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[hc-profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables(spark, dir, "documents")
    // Mirrors LlmQueries17.hammingClustersQ exactly (base + planted
    // 1-bit flips), then re-runs hammingClusters' internals stage by
    // stage with an eager checkpoint between stages so each timing is
    // attributable.
    val base = time("signatures (withSimhash + checkpoint)")(
      SimHash.withSimhash(docs, "doc_id",
        tokens(normalizeText(col("text"))), nBits = nBits).localCheckpoint(true))
    val planted = base.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      col("simhash").bitwiseXOR(
        expr(s"shiftleft(bigint(1), int(doc_id % $nBits))")).as("simhash"))
    val sim = base.union(planted).localCheckpoint(true)
    println(s"[hc-profile] docs=${sim.count()}")

    val maxDist = 2
    val nBlocks = maxDist + 1
    val blocked = sim
      .select(col("doc_id"), col("simhash"),
        explode(array(SimHash.blockKeys(col("simhash"), nBits, nBlocks): _*)).as("bb"))
      .select(col("doc_id"), col("simhash"),
        col("bb.blk").as("blk"), col("bb.bval").as("bval"))
    val reps = blocked.groupBy("blk", "bval")
      .agg(min(struct(col("doc_id").as("i"), col("simhash").as("s"))).as("r"))
      .select(col("blk"), col("bval"), col("r.i").as("__rid"), col("r.s").as("__rsim"))
    val edges = time("star edges (blocked + reps + verify, checkpoint)")(
      blocked.join(reps, Seq("blk", "bval"))
        .filter(col("doc_id") =!= col("__rid") &&
          bit_count(col("simhash").bitwiseXOR(col("__rsim"))) <= maxDist)
        .select(col("__rid").as("src"), col("doc_id").as("dst"))
        .distinct()
        .localCheckpoint(true))
    println(s"[hc-profile] edges=${edges.count()}")

    val comp = time("ConnectedComponents.components")(
      ConnectedComponents.components(edges).localCheckpoint(true))
    println(s"[hc-profile] members=${comp.count()}")

    val out = time("sizes join")(
      comp.join(ConnectedComponents.clusterSizes(comp), "component")
        .select(col("id").as("doc_id"), col("component"), col("cluster_size"))
        .count())
    println(s"[hc-profile] rows=$out")
    val top = comp.groupBy("component").count().orderBy(desc("count")).head()
    println(s"[hc-profile] largest cluster: component=${top.get(0)} size=${top.getLong(1)}")
    time("full hammingClusters (bench contract)")(
      SimHash.hammingClusters(base.union(planted), "doc_id",
        nBits = nBits, maxDist = maxDist).count())
    spark.stop()
  }
}
