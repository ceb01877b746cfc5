package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Dev tool: where does a micro-batch streaming query's FIXED cost sit?
  *
  * Runs a minimal stateful MemoryStream query (dropDuplicates — the
  * q_stream_dedup shape) three times and prints, per run, the wall time
  * of each harness phase (start, per-batch processAllAvailable, stop)
  * plus Spark's own `StreamingQueryProgress.durationMs` line items
  * (triggerExecution = addBatch + getBatch + queryPlanning +
  * walCommit + commitOffsets + stateManagement ...). This names the
  * engine-machinery floor the bench's stream family pays per query.
  *
  * Usage: sbt "runMain graft.tools.StreamProfile [nRows]"
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toInt).getOrElse(5000)
    val parts = args.drop(1).headOption.getOrElse("32")
    val spark = SparkSession.builder()
      .appName("graft-streamprofile").master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def ms(t0: Long): Long = (System.nanoTime() - t0) / 1000000

    (1 to 3).foreach { run =>
      spark.catalog.dropTempView("sp_out")
      val rows = (0L until nRows).map(i => (i % 700, i))
      val in = MemoryStream[(Long, Long)]
      var t = System.nanoTime()
      val q = in.toDF().toDF("dkey", "seq")
        .dropDuplicates("dkey")
        .writeStream.format("memory").queryName("sp_out")
        .outputMode("append").start()
      val tStart = ms(t)
      val perBatch = Seq(rows.take(nRows / 2), rows.drop(nRows / 2)).map { b =>
        t = System.nanoTime()
        in.addData(b); q.processAllAvailable()
        ms(t)
      }
      t = System.nanoTime()
      val progress = q.recentProgress.toSeq
      q.stop()
      val tStop = ms(t)
      println(s"RUN $run start=${tStart}ms batches=${perBatch.mkString("/")}ms stop=${tStop}ms")
      progress.foreach { p =>
        val d = p.durationMs
        println(s"  batch=${p.batchId} rows=${p.numInputRows} durationMs=" +
          d.entrySet().toArray.map(_.toString).sorted.mkString(", "))
      }
    }
    spark.stop()
  }
}
