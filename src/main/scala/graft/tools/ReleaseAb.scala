package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.operators.{Checkpoints, KCore}

/** Dev tool (r16): did making the per-round block release REAL
  * (Checkpoints.release replacing the no-op Dataset.unpersist) change
  * KCore's runtime? Interleaved A/B on q_kcore's own input: the
  * production KCore.core (releases inside) vs an in-tool copy of the
  * identical staged loop with NO release calls (the effective r15
  * runtime behavior, since its unpersists were no-ops). The release
  * path is async BlockManager removal — expected noise-level — but
  * q_kcore flagged OUTSIDE its neighbor-control band in the same
  * scoped run where this code first ran, so the change must be
  * exonerated (or indicted) by measurement, not assumption.
  *
  * Usage: sbt "runMain graft.tools.ReleaseAb [sfDir] [reps]"
  */
object ReleaseAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // q_kcore's input shape (RefQueries builds the same projection)
    val edges = Tables(spark, dir, "lineitem")
      .filter(col("l_orderkey") < 40000)
      .select((col("l_orderkey") % 5000).as("src"),
        (col("l_partkey") % 5000).as("dst"))
      .localCheckpoint(true)

    def withRelease(): Long = KCore.core(edges, 7, 6).count()

    // identical loop, no releases — r15's effective behavior
    def withoutRelease(): Long = {
      val raw = edges.select(col("src"), col("dst"))
        .filter(col("src") =!= col("dst"))
      var e = raw.union(raw.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().localCheckpoint(true)
      for (_ <- 1 to 6) {
        val alive = e.groupBy("src").agg(count(lit(1)).as("c"))
          .filter(col("c") >= 7).select(col("src"))
          .localCheckpoint(true)
        e = e.join(alive, Seq("src"), "left_semi")
          .join(alive.select(col("src").as("dst")), Seq("dst"), "left_semi")
          .select("src", "dst").localCheckpoint(true)
      }
      val n = e.groupBy("src").agg(count(lit(1)).as("deg")).count()
      Checkpoints.release(e) // don't let the A-side accumulate pins across reps
      n
    }

    withRelease(); withoutRelease() // warm-up
    def timed(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val a = collection.mutable.ArrayBuffer[Double]()
    val b = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to reps) { a += timed(withoutRelease()); b += timed(withRelease()) }
    def show(n: String, xs: Seq[Double]): Unit =
      println(f"[release-ab] $n: min=${xs.min}%.3f all=${xs.map(x => f"$x%.2f").mkString(",")}")
    show("NO release (r15 effective)", a.toSeq)
    show("Checkpoints.release (r16) ", b.toSeq)
    spark.stop()
  }
}
