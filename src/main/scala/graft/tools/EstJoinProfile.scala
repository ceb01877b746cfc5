package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns.normalizeText
import graft.operators.MinHashDedup

/** Dev tool: interleaved A/B timing of q_lsh_precision's ESTIMATE join —
  * the r14-verdict hotspot — old shape (16 separate mh columns per side,
  * 16-term chained CASE WHEN) vs new shape (one packed array<bigint> per
  * side, codegen'd ArrayAgreement), on identical eagerly-staged inputs
  * in one JVM. Interleaving min-of-N makes the comparison immune to the
  * machine's external load spikes in a way sequential scoped bench runs
  * are not. Also times the query's other stages so the estimate join's
  * share of the total is explicit.
  *
  * Usage: runMain graft.tools.EstJoinProfile [dir] [reps]
  */
object EstJoinProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(f: => Long): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    val docs = Tables(spark, dir, "documents")
    val norm = normalizeText(col("text"))
    val t0 = System.nanoTime()
    val sigA = MinHashDedup.signaturesArr(docs, "doc_id", norm).localCheckpoint(true)
    println(f"[est-profile] signatures+checkpoint: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val sig = MinHashDedup.unpackSignature(sigA, "doc_id").localCheckpoint(true)
    val tP = System.nanoTime()
    val pairs = MinHashDedup.candidatePairs(sig, "doc_id").localCheckpoint(true)
    println(f"[est-profile] candidatePairs+checkpoint: ${(System.nanoTime() - tP) / 1e9}%.2f s" +
      s" (n_pairs=${pairs.count()})")

    def estPacked(): Long = pairs
      .join(sigA.toDF("id_a", "sig_a"), "id_a")
      .join(sigA.toDF("id_b", "sig_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        MinHashDedup.signatureAgreement(col("sig_a"), col("sig_b"))
          .cast("long").as("n_match"))
      .groupBy("n_match").count().count()

    val nMatch = (0 until 16).map(j =>
        when(col(s"a.mh$j") === col(s"b.mh$j"), 1).otherwise(0))
      .reduce(_ + _)
    def estColumns(): Long = pairs
      .join(sig.as("a"), col("id_a") === col("a.doc_id"))
      .join(sig.as("b"), col("id_b") === col("b.doc_id"))
      .select(col("id_a"), col("id_b"), nMatch.cast("long").as("n_match"))
      .groupBy("n_match").count().count()

    // warm both paths once, then interleave
    estPacked(); estColumns()
    val packed = collection.mutable.ArrayBuffer[Double]()
    val cols16 = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to reps) {
      packed += timed(estPacked())
      cols16 += timed(estColumns())
    }
    def show(n: String, xs: Seq[Double]): Unit =
      println(f"[est-profile] $n: min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f all=${xs.map(x => f"$x%.2f").mkString(",")}")
    show("est join PACKED (array_agreement)", packed.toSeq)
    show("est join 16-COL (case-when chain)", cols16.toSeq)

    // remaining stages of the full query for share attribution
    val tf = System.nanoTime()
    graft.queries.LlmQueries13.lshPrecision(spark, dir).count()
    println(f"[est-profile] full q_lsh_precision (cold stages): ${(System.nanoTime() - tf) / 1e9}%.2f s")
    spark.stop()
  }
}
