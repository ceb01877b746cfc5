package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: phase timings of the PrefixSum selection path over a
  * staged lineitem at a given dir — names which pass (staging, cuts,
  * counts, final selection) carries the cost at scale.
  * Usage: runMain graft.tools.SelectProfile <dir>
  */
object SelectProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1x")
    val spark = SparkSession.builder()
      .appName("graft-selectprofile").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def ms[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 2).foreach { round =>
      println(s"ROUND $round")
      val li = ms("staged-build-or-hit") {
        graft.Tables.staged(spark, dir, "lineitem",
          Seq("l_extendedprice", "l_quantity", "l_orderkey", "l_linenumber"))
      }
      val cents = li.select(round_(col("l_extendedprice")).as("cents"),
        col("l_orderkey"), col("l_linenumber"))
        .withColumn("__pskey", col("cents").cast("double"))
      val n = spark.sessionState.conf.numShufflePartitions
      ms("raw-count")(cents.count())
      val probs = (1 until n).map(_.toDouble / n).toArray
      val cuts = ms("cuts-percentile") {
        cents.agg(percentile_approx(col("__pskey"), typedLit(probs), lit(1000)).as("c"))
          .head().getSeq[Double](0).distinct.sorted.toSeq
      }
      val bucketed = cents.withColumn("__psbucket",
        graft.operators.PrefixSum.bucketExpr(col("__pskey"), cuts))
      ms("counts-pass") {
        bucketed.groupBy("__psbucket").agg(count(lit(1))).collect()
      }
      ms("final-filter-only")(bucketed.filter(col("__psbucket").isin(7, 15, 23)).count())
      ms("final-filter-shuffle") {
        bucketed.filter(col("__psbucket").isin(7, 15, 23))
          .repartition(col("__psbucket")).count()
      }
      ms("final-3bucket-window") {
        bucketed.filter(col("__psbucket").isin(7, 15, 23))
          .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("__psbucket")
              .orderBy("cents", "l_orderkey", "l_linenumber")))
          .filter(col("rk") === 42).count()
      }
    }
    spark.stop()
  }
  private def round_(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")
}
