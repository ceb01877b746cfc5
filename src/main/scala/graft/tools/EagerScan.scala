package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: report which registered queries run Spark JOBS during the
  * query-function call itself (eager driver-side actions — staged index
  * builds, collected cut arrays, bloom builds, streaming harness runs)
  * rather than returning a lazy plan. Feeds RegistryAnalysisSpec's
  * eager-allowlist; run at sf0.001.
  *
  * Usage: sbt "runMain graft.tools.EagerScan /root/testdata/sf0.001"
  */
object EagerScan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .appName("graft-eagerscan").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    def settled(): Int = {
      // the listener bus is async; wait for the count to go quiet
      var last = -1; var cur = jobs.get()
      while (cur != last) { Thread.sleep(150); last = cur; cur = jobs.get() }
      cur
    }
    val eager = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val before = settled()
      try { fn(spark, dir).queryExecution.analyzed } catch { case _: Throwable => }
      val n = settled() - before
      if (n > 0) { println(s"EAGER $name jobs=$n"); Some(name) } else None
    }
    println(s"TOTAL ${eager.size} eager of ${SparkEntry.queries.size}")
    spark.stop()
  }
}
