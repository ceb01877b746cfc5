package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Checkpoints, ConnectedComponents}

/** Dev tool (r16): does the KCore lazy-checkpoint lesson transfer to
  * ConnectedComponents? CC's per-round `ls = largeStar(e)` is an EAGER
  * localCheckpoint (r15) because it feeds smallStar's three consuming
  * subtrees — same rationale as KCore's survivor staging, same
  * suspected cost: one extra materialization job per round. The lazy
  * variant lets the three consumers share one persisted RDD whose
  * blocks materialize during the round's convergence-check action
  * (which already materializes the lazily-checkpointed round result).
  * CC backs a dozen registered queries (hamming/simhash/dedup clusters,
  * q_incremental_cc), so a per-round job saved compounds.
  *
  * Usage: sbt "runMain graft.tools.CcAb [sfDir] [reps]"
  */
object CcAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 6
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // multi-round-converging edge set (same family as KCoreAb's input)
    val edges = Tables(spark, dir, "lineitem")
      .filter(col("l_orderkey") < 40000)
      .select((col("l_orderkey") % 5000).as("src"), (col("l_partkey") % 5000).as("dst"))
      .localCheckpoint(true)

    def eager(): Long = {
      val c = ConnectedComponents.components(edges)
      val n = c.count(); n
    }

    // inline copy of components() with ls LAZY — must stay in sync with
    // the operator if this experiment is ever re-run
    def lazyLs(): Long = {
      import org.apache.spark.sql.DataFrame
      def largeStar(e: DataFrame): DataFrame = {
        val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        val mins = sym.groupBy("src").agg(least(min(col("dst")), col("src")).as("m"))
        sym.join(mins, "src").filter(col("dst") > col("src"))
          .select(col("m").as("src"), col("dst"))
          .filter(col("src") =!= col("dst"))
      }
      def smallStar(e: DataFrame): DataFrame = {
        val mins = e.groupBy("dst").agg(min(col("src")).as("m"))
        val relink = e.join(mins, "dst").select(col("m").as("src"), col("src").as("dst"))
        val self = mins.select(col("m").as("src"), col("dst"))
        relink.union(self)
          .select(least(col("src"), col("dst")).as("src"),
            greatest(col("src"), col("dst")).as("dst"))
          .filter(col("src") =!= col("dst"))
      }
      def isMinStar(e: DataFrame): Boolean = {
        val endpoints = e.select(col("src").as("id"),
            lit(null).cast(e.schema("src").dataType).as("peer"), lit(1).as("is_src"))
          .union(e.select(col("dst"), col("src"), lit(0)))
        endpoints.groupBy("id")
          .agg(max(col("is_src")).as("ever_src"), min(col("is_src")).as("ever_dst"),
            min(col("peer")).as("pmin"), max(col("peer")).as("pmax"))
          .filter((col("ever_src") === 1 && col("ever_dst") === 0) ||
            col("pmin") =!= col("pmax"))
          .isEmpty
      }
      var e = edges
        .select(least(col("src"), col("dst")).as("src"),
          greatest(col("src"), col("dst")).as("dst"))
        .filter(col("src") =!= col("dst"))
        .localCheckpoint(false)
      var prev: DataFrame = null
      var converged = isMinStar(e)
      var iter = 0
      while (!converged && iter < 20) {
        val ls = largeStar(e).localCheckpoint(false) // <- the variant
        val next = smallStar(ls).localCheckpoint(false)
        converged = isMinStar(next)
        Checkpoints.release(ls)
        if (prev != null) Checkpoints.release(prev)
        prev = e
        e = next
        iter += 1
      }
      require(converged)
      val star = e.distinct()
      val out = star.select(col("dst").as("id"), col("src").as("component"))
        .union(star.select(col("src").as("id"), col("src").as("component")).distinct())
      val n = out.count()
      Checkpoints.release(e); if (prev != null) Checkpoints.release(prev)
      n
    }

    val nA = eager(); val nB = lazyLs()
    require(nA == nB, s"variant results differ: $nA vs $nB")
    def timed(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val a = collection.mutable.ArrayBuffer[Double]()
    val b = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to reps) { a += timed(eager()); b += timed(lazyLs()) }
    def show(n: String, xs: Seq[Double]): Unit =
      println(f"[cc-ab] $n: min=${xs.min}%.3f all=${xs.map(x => f"$x%.2f").mkString(",")}")
    show("EAGER ls (r15)", a.toSeq)
    show("LAZY  ls (r16)", b.toSeq)
    spark.stop()
  }
}
