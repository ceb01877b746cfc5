package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Checkpoints, PageRank}

/** Dev tool (r16): third application of the eager-vs-lazy checkpoint
  * question — PageRank's per-iteration rank frame. Unlike KCore/CC,
  * PageRank has NO per-round driver action (no convergence probe at
  * fixed iters), so each round's EAGER checkpoint is a standalone
  * materialization job whose only purpose is lineage truncation — which
  * a LAZY checkpoint also provides (LogicalRDD truncates the logical
  * plan immediately; the RDD chain pipelines through the caller's one
  * action). Candidate: fixed-iteration loops with a single downstream
  * action collapse N jobs into 1.
  *
  * Caveat measured here rather than assumed: deg/e/nodes are
  * multi-consumer frames — they stay eager in both variants; only the
  * per-round rank frame differs.
  *
  * Usage: sbt "runMain graft.tools.PrAb [sfDir] [reps]"
  */
object PrAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 6
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // q_pagerank-like input
    val edges = Tables(spark, dir, "lineitem")
      .filter(col("l_orderkey") < 40000)
      .select((col("l_orderkey") % 5000).as("src"), (col("l_partkey") % 5000).as("dst"))
      .localCheckpoint(true)

    def eager(): Long = PageRank.ranks(edges, iters = 3).agg(sum("rank")).head.getLong(0)

    def lazyRanks(): Long = {
      val scale = 1000000000000L
      val raw = edges.select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
        .distinct().localCheckpoint(true)
      val nodes = raw.select(col("src").as("id"))
        .union(raw.select(col("dst").as("id")))
        .distinct().localCheckpoint(true)
      val n = nodes.count()
      val base = 15L * scale / (100L * n)
      val deg = raw.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint(true)
      var r = nodes.select(col("id"), lit(scale / n).as("rank"))
      val lazies = collection.mutable.ArrayBuffer[org.apache.spark.sql.DataFrame]()
      for (_ <- 0 until 3) {
        val m = raw.join(r.withColumnRenamed("id", "src"), "src")
          .join(deg, "src")
          .select(col("dst"), expr("rank DIV deg").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("m"))
        r = nodes.join(m.withColumnRenamed("dst", "id"), Seq("id"), "left_outer")
          .select(col("id"),
            (lit(base) + expr("(85 * coalesce(m, 0L)) DIV 100")).as("rank"))
          .localCheckpoint(false) // <- the variant
        lazies += r
      }
      val out = r.agg(sum("rank")).head.getLong(0)
      lazies.foreach(Checkpoints.release)
      Checkpoints.release(deg); Checkpoints.release(raw); Checkpoints.release(nodes)
      out
    }

    val a0 = eager(); val b0 = lazyRanks()
    require(a0 == b0, s"variant results differ: $a0 vs $b0")
    def timed(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val a = collection.mutable.ArrayBuffer[Double]()
    val b = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to reps) { a += timed(eager()); b += timed(lazyRanks()) }
    def show(n: String, xs: Seq[Double]): Unit =
      println(f"[pr-ab] $n: min=${xs.min}%.3f all=${xs.map(x => f"$x%.2f").mkString(",")}")
    show("EAGER r (r15)", a.toSeq)
    show("LAZY  r (r16)", b.toSeq)
    spark.stop()
  }
}
