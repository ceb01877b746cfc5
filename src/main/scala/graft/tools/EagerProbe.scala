package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: name the jobs a single query triggers at analysis time in
  * a FRESH session clone (the tripwire's view — fresh memos, so
  * first-touch side effects show). Prints each job's description and
  * call site. Usage:
  *   sbt "runMain graft.tools.EagerProbe q17_small_qty [sfDir]"
  */
object EagerProbe {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .appName("graft-eagerprobe").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val clone = spark.newSession()
    clone.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val d = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        val cs = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.long"))).getOrElse("")
        println(s"JOBSTART id=${j.jobId} desc=$d\n  callsite=${cs.linesIterator.take(6).mkString(" <- ")}")
      }
    })
    graft.SparkEntry.queries(name)(clone, dir).queryExecution.analyzed
    Thread.sleep(1000)
    spark.stop()
  }
}
