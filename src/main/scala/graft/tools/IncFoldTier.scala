package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Checkpoints, ConnectedComponents, IncrementalCC}

/** Dev/bench tool (r17, VERDICT r16 #4): the IncrementalCC
  * PRODUCTION-REGIME tier row — fold a FIXED delta into bases of
  * increasing size and record the fold wall per tier. The r16 tier row
  * (ScaleUp'd q_incremental_dedup) was the operator's WORST case
  * (replica ids ≥ 400 make the delta approach the corpus); the law the
  * operator is FOR is the other regime — delta ≪ corpus, fold cost
  * governed by the delta plus one broadcast-probed assignment scan.
  *
  * Graph: bipartite l_orderkey ↔ (l_partkey + 1e8) over the full key
  * space, so nodes/edges scale with the staged tier (ScaleUp shifts
  * keys per copy; copy 0 keeps the originals). Delta = the original
  * copy's l_orderkey < 50 edges — IDENTICAL at every tier. Base build
  * (componentsEager) is timed separately and excluded, exactly like the
  * bench's build/probe split. Fold = addEdgesEager, so each rep's wall
  * includes materializing the full updated assignment (the honest
  * number — the output scan IS part of a fold).
  *
  * Usage: runMain graft.tools.IncFoldTier <dir> [<dir> ...]
  */
object IncFoldTier {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IncFoldTier <tierDir> [<tierDir> ...]")
    val spark = SparkSession.builder()
      .appName("graft-inc-fold-tier")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    args.foreach { dir =>
      val edges = graft.Tables(spark, dir, "lineitem")
        .select(col("l_orderkey").as("src"),
          (col("l_partkey") + lit(100000000L)).as("dst"))
      val delta = edges.filter(col("src") < 50)
      val baseEdges = edges.filter(col("src") >= 50)
      val t0 = System.nanoTime()
      val baseAssign = ConnectedComponents.componentsEager(baseEdges)
      val nBase = baseAssign.count()
      val buildS = (System.nanoTime() - t0) / 1e9
      val nDelta = delta.count()
      val folds = (0 until 4).map { _ =>
        val t = System.nanoTime()
        val out = IncrementalCC.addEdgesEager(baseAssign, delta)
        val w = (System.nanoTime() - t) / 1e9
        val nOut = out.count()
        Checkpoints.release(out)
        (w, nOut)
      }
      val timed = folds.drop(1).map(_._1) // first rep is warmup
      println(f"[inc-fold-tier] dir=$dir base_rows=$nBase delta_edges=$nDelta " +
        f"build_s=$buildS%.2f warmup=${folds.head._1}%.3f " +
        f"folds_s=${timed.map(t => f"$t%.3f").mkString(",")} " +
        f"min=${timed.min}%.3f out_rows=${folds.head._2}")
      Checkpoints.release(baseAssign)
    }
    spark.stop()
  }
}
