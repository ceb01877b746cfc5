package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: exchange-reuse audit of the LSH candidate join. */
object ExplainCand {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables(spark, args.headOption.getOrElse("/root/testdata/sf0.01"), "documents")
    val sig = graft.operators.MinHashDedup.signatures(docs, "doc_id",
      graft.functions.TextFns.normalizeText(col("text"))).persist()
    val pairs = graft.operators.MinHashDedup.candidatePairs(sig, "doc_id")
    pairs.count()
    val plan = pairs.queryExecution.executedPlan.toString
    println("[explain] ReusedExchange: " + "ReusedExchange".r.findAllIn(plan).size)
    println("[explain] hash Exchange: " + "Exchange hashpartitioning".r.findAllIn(plan).size)
    println("[explain] BroadcastExchange: " + "BroadcastExchange".r.findAllIn(plan).size)
    println("[explain] SortMergeJoin: " + "SortMergeJoin".r.findAllIn(plan).size)
    println("[explain] ShuffledHashJoin: " + "ShuffledHashJoin".r.findAllIn(plan).size)
    println("[explain] BroadcastHashJoin: " + "BroadcastHashJoin".r.findAllIn(plan).size)
    println(plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("QueryStage") || l.contains("Join") || l.contains("InMemory")).map(_.take(150)).mkString("\n"))
    spark.stop()
  }
}
