package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev tool (r16, VERDICT r15 #4): can the stream family's ~0.35 s/batch
  * micro-batch machinery drop WITHOUT changing the semantics the 19
  * registered stream queries exercise?
  *
  * Interleaved A/B (the load-immune house method) over two stateful
  * MemoryStream shapes — dropDuplicates (q_stream_dedup) and a
  * watermarked window aggregate (q_stream_window) — each timed
  * end-to-end (start → batches → stop) under three harness variants:
  *
  *   P32  per-batch addData + processAllAvailable at the bench
  *        session's 32 shuffle partitions. NOTE: this is NOT the
  *        registered harness — every registered stream query already
  *        scopes its stream to 4 partitions (early-round work; the
  *        r16 measurement below rediscovered that knob before reading
  *        the query bodies). P32 quantifies what that existing sizing
  *        is worth.
  *   P8   same batch boundaries, partitions scoped to 8 — measured
  *        ~2.4× faster than P32 on both shapes: the fixed cost is
  *        dominated by state-store instances × tasks/batch, which is
  *        why the registered queries' 4-partition scoping matters.
  *   AN   all batches pre-added, ONE Trigger.AvailableNow run —
  *        another ~2× below P8, which NAMES the remaining per-batch
  *        machinery share; but it collapses the batch boundaries the
  *        registry exists to exercise (cross-batch state transitions),
  *        so it is not a semantics-preserving option.
  *
  * Conclusion (r16): with partition sizing already applied and
  * WAL/offset/commit/state files already on tmpfs (build.sbt sets
  * java.io.tmpdir=/dev/shm when present), the residual ~0.35 s/batch
  * is per-batch planning + scheduling, removable only by removing
  * batches — i.e. irreducible at fixed batch-boundary semantics.
  *
  * Usage: sbt "runMain graft.tools.StreamFixedCostAb [nRows] [reps]"
  */
object StreamFixedCostAb {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toInt).getOrElse(5000)
    val reps = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder()
      .appName("graft-streamfixedcost").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val dedupRows = (0L until nRows).map(i => (i % 700, i))
    val dedupBatches = dedupRows.grouped(nRows / 6 + 1).toSeq
    val aggRows = (0L until nRows).map(i =>
      (new java.sql.Timestamp(1700000000000L + i * 1000), i % 50))
    val aggBatches = aggRows.grouped(nRows / 6 + 1).toSeq

    var viewN = 0
    def sinkName(): String = { viewN += 1; s"sfab_$viewN" }

    /** One dedup-shape run; returns (wallSec, nBatches). */
    def runDedup(parts: Option[Int], availableNow: Boolean): (Double, Int) = {
      val name = sinkName()
      parts.foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p))
      val t0 = System.nanoTime()
      val in = MemoryStream[(Long, Long)]
      val df = in.toDF().toDF("dkey", "seq").dropDuplicates("dkey")
      val nb =
        if (availableNow) {
          dedupBatches.foreach(in.addData(_))
          val q = df.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
          val n = q.recentProgress.count(_.numInputRows > 0)
          n
        } else {
          val q = df.writeStream.format("memory").queryName(name)
            .outputMode("append").start()
          try dedupBatches.foreach { b => in.addData(b); q.processAllAvailable() }
          finally q.stop()
          dedupBatches.size
        }
      parts.foreach(_ => spark.conf.set("spark.sql.shuffle.partitions", 32))
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.dropTempView(name)
      (dt, nb)
    }

    /** One watermarked-window-aggregate run (update mode). */
    def runAgg(parts: Option[Int], availableNow: Boolean): (Double, Int) = {
      val name = sinkName()
      parts.foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p))
      val t0 = System.nanoTime()
      val in = MemoryStream[(java.sql.Timestamp, Long)]
      val df = in.toDF().toDF("ts", "k")
        .withWatermark("ts", "10 seconds")
        .groupBy(window(col("ts"), "1 minute"), col("k"))
        .agg(count(lit(1)).as("n"))
        .select(col("k"), col("n"))
      val nb =
        if (availableNow) {
          aggBatches.foreach(in.addData(_))
          val q = df.writeStream.format("memory").queryName(name)
            .outputMode("update").trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
          q.recentProgress.count(_.numInputRows > 0)
        } else {
          val q = df.writeStream.format("memory").queryName(name)
            .outputMode("update").start()
          try aggBatches.foreach { b => in.addData(b); q.processAllAvailable() }
          finally q.stop()
          aggBatches.size
        }
      parts.foreach(_ => spark.conf.set("spark.sql.shuffle.partitions", 32))
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.dropTempView(name)
      (dt, nb)
    }

    // warm-up: JIT + state-store provider init for every variant shape
    runDedup(None, availableNow = false); runDedup(Some(8), availableNow = false)
    runDedup(None, availableNow = true)
    runAgg(None, availableNow = false); runAgg(Some(8), availableNow = false)
    runAgg(None, availableNow = true)

    val variants: Seq[(String, () => (Double, Int))] = Seq(
      ("dedup P32 6-batch (current)", () => runDedup(None, false)),
      ("dedup P8  6-batch          ", () => runDedup(Some(8), false)),
      ("dedup P32 AvailableNow     ", () => runDedup(None, true)),
      ("agg   P32 6-batch (current)", () => runAgg(None, false)),
      ("agg   P8  6-batch          ", () => runAgg(Some(8), false)),
      ("agg   P32 AvailableNow     ", () => runAgg(None, true)))
    val acc = variants.map(_ => collection.mutable.ArrayBuffer[Double]())
    var batchCounts = Map[String, Int]()
    for (_ <- 1 to reps; ((label, f), i) <- variants.zipWithIndex) {
      val (dt, nb) = f()
      acc(i) += dt
      batchCounts += (label -> nb)
    }
    variants.zipWithIndex.foreach { case ((label, _), i) =>
      val xs = acc(i).toSeq
      println(f"[stream-ab] $label: min=${xs.min}%.3f s  " +
        f"batches=${batchCounts(label)}  all=${xs.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
