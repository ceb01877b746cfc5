package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns._
import graft.operators.MinHashDedup

/** Dev tool: stage-by-stage timing of the minhash pipeline. */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, sfDir, "documents")
    time("scan")(docs.count())
    val norm = normalizeText(col("text"))
    time("shingles")(docs.select(explode(MinHashDedup.shingles(norm))).count())
    val sig = MinHashDedup.signatures(docs, "doc_id", norm)
    time("signatures")(sig.count())
    val sigC = sig.persist()
    sigC.count()
    val bandedRows = MinHashDedup.banded(sigC, "doc_id")
    time("banded(cached sig)")(bandedRows.count())
    val wide = bandedRows.groupBy("band", "bucket")
      .agg(count(lit(1)).as("__bw"), min(col("doc_id")).as("__rep"))
      .filter(col("__bw") > 64)
    time("wide agg")(wide.count())
    val narrow = bandedRows.join(broadcast(wide.select("band", "bucket")),
      Seq("band", "bucket"), "left_anti")
    val narrowPairs = narrow.as("x").join(narrow.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
    time("narrowPairs")(narrowPairs.count())
    val pairs = MinHashDedup.candidatePairs(sigC, "doc_id")
    time("candidatePairs(cached sig)")(pairs.count())
    val pairsU = MinHashDedup.candidatePairs(sig, "doc_id")
    time("candidatePairs(uncached)")(pairsU.count())
    println(s"[profile] n_pairs = ${pairs.count()}")
    // --- verification internals (mirrors nearDuplicates' fp structure)
    val threshold = 0.7
    val pairsC = time("verify: pairs checkpoint")(
      MinHashDedup.candidatePairs(sigC, "doc_id").localCheckpoint(true))
    val ids = pairsC.select(col("id_a").as("doc_id"))
      .union(pairsC.select(col("id_b").as("doc_id"))).distinct()
    println(s"[profile] n_candidate_docs = ${time("verify: ids distinct")(ids.count())}")
    val cand = docs.join(ids, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), substring(norm, 1, 200).as("__t"))
      .withColumn("__fp", substring(sha2(col("__t"), 256), 1, 32))
    val docFp = time("verify: docFp checkpoint")(
      cand.select(col("doc_id"), col("__fp")).localCheckpoint(true))
    val repArr = time("verify: repArr checkpoint")(
      cand.dropDuplicates("__fp")
        .select(col("__fp"), MinHashDedup.shingles(col("__t")).as("__sh"))
        .withColumn("__n", size(col("__sh")))
        .localCheckpoint(true))
    println(s"[profile] n_distinct_fp = ${repArr.count()}")
    val fpPairs = pairsC
      .join(docFp.toDF("id_a", "fp_a"), "id_a")
      .join(docFp.toDF("id_b", "fp_b"), "id_b")
    val sizes = repArr.select(col("__fp"), col("__n"))
    val pruned = fpPairs
      .join(sizes.toDF("fp_a", "n_a"), "fp_a")
      .join(sizes.toDF("fp_b", "n_b"), "fp_b")
      .filter(least(col("n_a"), col("n_b")).cast("double") >=
        (lit(threshold) - lit(1e-9)) * greatest(col("n_a"), col("n_b")))
      .select("id_a", "id_b", "fp_a", "fp_b")
    println(s"[profile] n_pruned = ${time("verify: fp + length prune")(pruned.count())}")
    // sub-split of the composite tail (r15): distinct fp pairs vs the
    // two array joins + jaccard vs the per-pair join back — attribution
    // for where the verify seconds actually go at the 100x tier.
    val prunedC = time("verify: pruned checkpoint")(pruned.localCheckpoint(true))
    // time() wraps the EAGER checkpoint construction — materialization
    // happens there, a later count() over cached blocks measures nothing
    val fpd = time("verify: distinct fp pairs (checkpoint)")(
      prunedC.select("fp_a", "fp_b").distinct().localCheckpoint(true))
    println(s"[profile] n_distinct_fp_pairs = ${fpd.count()}")
    val jac = time("verify: array joins + jaccard (distinct pairs, checkpoint)")(
      fpd
        .join(repArr.select(col("__fp").as("fp_a"), col("__sh").as("sh_a")), "fp_a")
        .join(repArr.select(col("__fp").as("fp_b"), col("__sh").as("sh_b")), "fp_b")
        .withColumn("jaccard", MinHashDedup.jaccard(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= threshold)
        .select("fp_a", "fp_b", "jaccard")
        .localCheckpoint(true))
    println(s"[profile] n_jac = ${jac.count()}")
    val fin = prunedC.join(jac, Seq("fp_a", "fp_b")).select("id_a", "id_b", "jaccard")
    println(s"[profile] n_final = ${time("verify: join back to per-pair rows")(fin.count())}")
    time("full nearDuplicates")(
      MinHashDedup.nearDuplicates(docs, "doc_id", norm, 0.7).count())
    spark.stop()
  }
}
