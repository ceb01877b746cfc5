package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.KCore

/** Dev tool: interleaved A/B of KCore's per-round survivor staging
  * (r15) vs the unstaged r14 shape, on q_kcore's own input — the
  * load-immune measurement method (EstJoinProfile). */
object KCoreAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = Tables(spark, dir, "lineitem")
      .filter(col("l_orderkey") < 40000)
      .select((col("l_orderkey") % 5000).as("src"), (col("l_partkey") % 5000).as("dst"))
      .localCheckpoint(true)

    // r14 shape, kept verbatim as the reference
    def coreUnstaged(k: Int, rounds: Int): Long = {
      val raw = edges.select(col("src"), col("dst")).filter(col("src") =!= col("dst"))
      var e = raw.union(raw.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().localCheckpoint(true)
      for (_ <- 1 to rounds) {
        val alive = e.groupBy("src").agg(count(lit(1)).as("c"))
          .filter(col("c") >= k).select(col("src"))
        e = e.join(alive, Seq("src"), "left_semi")
          .join(alive.select(col("src").as("dst")), Seq("dst"), "left_semi")
          .select("src", "dst").localCheckpoint(true)
      }
      e.groupBy("src").agg(count(lit(1)).as("deg")).count()
    }
    def coreStaged(k: Int, rounds: Int): Long =
      KCore.core(edges, k, rounds).count()

    // r16 third variant: alive as a LAZY checkpoint — both semi-join
    // consumers reference ONE persisted RDD (the degree aggregate's
    // stages are shared, not duplicated) and the blocks materialize
    // inside the round's single eager e-job instead of behind their
    // own barrier. Candidate best-of-both: no duplicate corpus-sized
    // exchange (the r15 at-scale rationale) AND no extra per-round job
    // (the r15 shape's measured sf0.1 cost).
    def coreLazy(k: Int, rounds: Int): Long = {
      import graft.operators.Checkpoints
      val raw = edges.select(col("src"), col("dst")).filter(col("src") =!= col("dst"))
      var e = raw.union(raw.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().localCheckpoint(true)
      for (_ <- 1 to rounds) {
        val alive = e.groupBy("src").agg(count(lit(1)).as("c"))
          .filter(col("c") >= k).select(col("src"))
          .localCheckpoint(false)
        val prev = e
        e = e.join(alive, Seq("src"), "left_semi")
          .join(alive.select(col("src").as("dst")), Seq("dst"), "left_semi")
          .select("src", "dst").localCheckpoint(true)
        Checkpoints.release(alive)
        Checkpoints.release(prev)
      }
      val n = e.groupBy("src").agg(count(lit(1)).as("deg")).count()
      graft.operators.Checkpoints.release(e)
      n
    }

    coreUnstaged(7, 6); coreStaged(7, 6); coreLazy(7, 6)
    def timed(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val a = collection.mutable.ArrayBuffer[Double]()
    val b = collection.mutable.ArrayBuffer[Double]()
    val c = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to reps) {
      a += timed(coreUnstaged(7, 6)); b += timed(coreStaged(7, 6))
      c += timed(coreLazy(7, 6))
    }
    def show(n: String, xs: Seq[Double]): Unit =
      println(f"[kcore-ab] $n: min=${xs.min}%.3f all=${xs.map(x => f"$x%.2f").mkString(",")}")
    show("UNSTAGED alive (r14)", a.toSeq)
    show("STAGED alive (r15)  ", b.toSeq)
    show("LAZY-CKPT alive (r16)", c.toSeq)
    spark.stop()
  }
}
