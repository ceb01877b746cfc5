package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Checkpoints, ConnectedComponents}

/** Dev probe (r17, VERDICT r16 #6): checkpoint-pin accounting for a FULL
  * ConnectedComponents invocation at bench scale — "zero leaked pins
  * after a graph query" as a measured fact, not an inference from
  * CheckpointsSpec's toy frames.
  *
  * Measures both shapes:
  *  - the LAZY `components()` result: per-round releases happen inside
  *    the loop, but the FINAL round's checkpoint is the only copy of
  *    the converged stars and the derived output cannot release it
  *    (root-strict `Checkpoints.release`) — expected leak: exactly 1
  *    pinned RDD per invocation, corpus-assignment-sized at 100 TB;
  *  - `componentsEager()` (r17): output staged as an eager checkpoint,
  *    final internal frame released inside the operator, the returned
  *    root released by the caller — expected pins after release: 0.
  */
object CcPinProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-cc-pin-probe").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext
    def pins(): Set[Int] = sc.getPersistentRDDs.keySet.toSet
    def awaitEmpty(base: Set[Int]): Set[Int] = {
      val deadline = System.nanoTime() + 10000000000L
      while ((pins() -- base).nonEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      pins() -- base
    }

    // the q_incremental_cc graph shape at the given sf
    val edges = graft.Tables(spark, dir, "lineitem")
      .filter(col("l_orderkey") < 8000)
      .select((col("l_orderkey") % 2000).as("src"),
        (col("l_partkey") % 2000).as("dst"))

    val b0 = pins()
    val lazyOut = ConnectedComponents.components(edges)
    val n1 = lazyOut.count()
    val afterLazy = awaitEmpty(b0)
    println(s"[cc-pin-probe] LAZY components(): rows=$n1, " +
      s"pins left after consuming = ${afterLazy.size} (rdd ids $afterLazy)")

    val b1 = pins()
    val staged = ConnectedComponents.componentsEager(edges)
    val n2 = staged.count()
    val whileHeld = (pins() -- b1).size
    Checkpoints.release(staged)
    val afterRelease = awaitEmpty(b1)
    println(s"[cc-pin-probe] EAGER componentsEager(): rows=$n2, " +
      s"pins while held = $whileHeld, after caller release = ${afterRelease.size}")
    println(s"[cc-pin-probe] zero-leak eager path: ${afterRelease.isEmpty}")
    spark.stop()
  }
}
