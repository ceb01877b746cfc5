package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns._
import graft.operators.{ConnectedComponents, SimHash}

// Scratch profiling main — not part of the library surface.
object CcProbe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    graft.queries.LlmQueries2.dedupClusters(spark, "/root/testdata/sf0.001").count()
    val docs = Tables(spark, dir, "documents")
    val fp = time("fp-checkpoint") {
      docs.select(col("doc_id"), fingerprint(col("text")).as("fingerprint")).localCheckpoint(true)
    }
    val fpMin = fp.groupBy("fingerprint").agg(min(col("doc_id")).as("src"))
    val fpEdges = fp.join(fpMin, "fingerprint").filter(col("doc_id") =!= col("src"))
      .select(col("src"), col("doc_id").as("dst"))
    val sim = SimHash.withSimhash(docs, "doc_id", tokens(normalizeText(col("text"))))
    val ham = SimHash.hammingPairs(sim, "doc_id", 32, 2)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val edges = time("edges-materialize") {
      val e = fpEdges.union(ham).localCheckpoint(true)
      println("PROBE n_edges " + e.count()); e
    }
    val comp = time("cc") {
      val c = ConnectedComponents.components(edges)
      println("PROBE n_comp_rows " + c.count()); c
    }
    time("full-query") { graft.queries.LlmQueries2.dedupClusters(spark, dir).count() }
    spark.stop()
  }
}
