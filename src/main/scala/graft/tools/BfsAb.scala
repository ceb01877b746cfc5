package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Bfs, Checkpoints}

/** Dev tool (r16): fourth application of the eager-vs-lazy checkpoint
  * audit — BFS. The current shape pays THREE jobs per round: an eager
  * `next` checkpoint, an eager `settled` union checkpoint, and the
  * loop-condition `frontier.isEmpty`. But the condition check is a
  * per-round action anyway, so it can materialize the round's whole
  * lazy chain: with `next` and `settled` lazy, each round costs ONE
  * job, releases deferred to the end (the frames are slim id lists).
  *
  * MEASURED VERDICT (r16): NEUTRAL — min 1.693 s eager vs 1.710 s lazy
  * interleaved at 6 reps; BFS's per-round cost is dominated by the
  * frontier-expansion join itself, not the checkpoint jobs, so the
  * operator keeps the simpler eager shape with its immediate
  * deterministic releases. Kept as the recorded negative result so the
  * lazy-checkpoint sweep (KCore ~15%, CC ~3%, PageRank ~5%, BFS ~0%)
  * does not get re-run on BFS next round.
  *
  * Usage: sbt "runMain graft.tools.BfsAb [sfDir] [reps]"
  */
object BfsAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 6
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val edgesIn = Tables(spark, dir, "lineitem")
      .filter(col("l_orderkey") < 40000)
      .select((col("l_orderkey") % 5000).as("src"), (col("l_partkey") % 5000).as("dst"))
      .localCheckpoint(true)

    def eager(): Long =
      Bfs.hops(edgesIn, source = 1L, maxHops = 4).agg(sum("hops")).head.getLong(0)

    def lazyBfs(): Long = {
      val d = edgesIn.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      val e = d.union(d.select(col("dst").as("src"), col("src").as("dst")))
        .filter(col("src") =!= col("dst"))
        .distinct().localCheckpoint(true)
      var settled = Seq((1L, 0L)).toDF("id", "hops").localCheckpoint(true)
      var frontier = settled.select("id")
      val pending = collection.mutable.ArrayBuffer[DataFrame]()
      var k = 1
      while (k <= 4 && !frontier.isEmpty) {
        val next = e.join(frontier.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id")).distinct()
          .join(settled, Seq("id"), "left_anti")
          .select(col("id"), lit(k.toLong).as("hops"))
          .localCheckpoint(false)
        pending += settled
        settled = settled.union(next).localCheckpoint(false)
        pending += next
        frontier = next.select("id")
        k += 1
      }
      val out = settled.localCheckpoint(true)
      pending += settled
      pending.foreach(Checkpoints.release)
      Checkpoints.release(e)
      val n = out.agg(sum("hops")).head.getLong(0)
      Checkpoints.release(out)
      n
    }

    val a0 = eager(); val b0 = lazyBfs()
    require(a0 == b0, s"variant results differ: $a0 vs $b0")
    def timed(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val a = collection.mutable.ArrayBuffer[Double]()
    val b = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to reps) { a += timed(eager()); b += timed(lazyBfs()) }
    def show(n: String, xs: Seq[Double]): Unit =
      println(f"[bfs-ab] $n: min=${xs.min}%.3f all=${xs.map(x => f"$x%.2f").mkString(",")}")
    show("EAGER next+settled (r15)", a.toSeq)
    show("LAZY  next+settled (r16)", b.toSeq)
    spark.stop()
  }
}
