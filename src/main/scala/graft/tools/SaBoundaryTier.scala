package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns.{normalizeText, tokens}
import graft.operators.{PrefixSum, SuffixArray}

/** Dev/bench tool: run the PRODUCTION suffix-array build
  * ([[SuffixArray.levelRanks]], levels 0..4) on a replicated corpus
  * big enough that the doubling rounds' combined key r1·B + r2
  * EXCEEDS 2^53 — the double-precision boundary where distinct exact
  * pairs start collapsing onto one double and the uniform range grid
  * coarsens. SuffixArraySpec proves the ranking survives that collapse
  * on a simulated key stream; this tool makes the claim EXECUTABLE in
  * production code at a real ≥9.5·10^7-position corpus and measures
  * what actually degrades:
  *
  *   - build wall time for the five staged levels;
  *   - key collapse: distinct double keys vs distinct exact
  *     (rank, successor) pairs at the final round — the fraction the
  *     ulp rounding merges;
  *   - grid balance: per-bucket row counts of the final round's
  *     production ranking pass (PrefixSum.rank with the same uniform
  *     keyRange grid the build uses), max/mean skew;
  *   - an end-to-end correctness probe: with the corpus built from N
  *     shifted copies (ScaleUp's exact document treatment — per-copy
  *     suffix token), EVERY position whose 16-token window avoids the
  *     per-copy tail must hold a level-4 rank shared by ≥2 distinct
  *     documents; a single rank group split by the collapse would
  *     surface here as an unduplicated window.
  *
  * Usage: runMain graft.tools.SaBoundaryTier [srcDir] [copies]
  * Defaults: /root/testdata/sf0.1, 380 copies → ~1.03·10^8 positions,
  * n·(n+3) ≈ 1.06·10^16 ≈ 1.18 × 2^53.
  */
object SaBoundaryTier {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = if (args.length > 1) args(1).toInt else 380
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val dStride = base.agg(max(col("doc_id"))).head.getLong(0) + 1
    // ScaleUp's document rule: shifted ids, per-copy suffix token from
    // copy 1 on (copy 0 pristine) — cross-copy windows stay verbatim
    // duplicates everywhere except the tail token.
    val replicated = (0 until copies).map { i =>
      val shifted = base.withColumn("doc_id", col("doc_id") + lit(dStride * i))
      if (i == 0) shifted
      else shifted.withColumn("text", concat(col("text"), lit(s" zq$i")))
    }.reduce(_ unionByName _)
    val docs = replicated
      .select(col("doc_id"), tokens(normalizeText(col("text"))).as("toks"))
      .filter(size(col("toks")) > 0)
      .localCheckpoint(true) // stage the input; time the BUILD, not the union scan

    val t0 = System.nanoTime()
    val lv = SuffixArray.levelRanks(docs, 4)
    val last = lv.last._2
    val n = last.count() // forces every staged round
    val buildS = (System.nanoTime() - t0) / 1e9
    val b = n.toDouble + 3.0
    val maxKey = n * b + n
    println(f"[sa-tier] copies=$copies positions=$n build_s=$buildS%.1f " +
      f"maxKey=$maxKey%.3e vs 2^53=${math.pow(2, 53)}%.3e " +
      f"(ratio ${maxKey / math.pow(2, 53)}%.2f)")
    if (maxKey <= math.pow(2, 53))
      println("[sa-tier] WARNING: key range does NOT cross 2^53 — smoke run only")

    // --- key collapse + grid balance at the final round, production path
    val step = 1 << 3
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    // Stage the paired frame on DISK, not in heap: localCheckpoint
    // caches ~10^8 deserialized rows at MEMORY_AND_DISK, which is what
    // forced this tool onto a 48g driver (the BUILD itself spills fine
    // at the default 8g). A parquet round-trip keeps every downstream
    // stats job column-pruned and off-heap, so the whole audit runs at
    // default heap.
    val pairedPath = "target/sa_tier_paired.parquet"
    lv(3)._2.withColumn("__r2",
        coalesce(lead(col("rank"), step).over(wDoc), lit(-1L)))
      .write.mode("overwrite").parquet(pairedPath)
    val paired = spark.read.parquet(pairedPath)
    try {
      val exactPairs = paired.select("rank", "__r2").distinct().count()
      val doubleKeys = paired
        .select((col("rank") * b + col("__r2")).cast("double").as("k"))
        .distinct().count()
      println(f"[sa-tier] level-4 exact pairs=$exactPairs double keys=$doubleKeys " +
        f"collapsed=${exactPairs - doubleKeys} " +
        f"(${100.0 * (exactPairs - doubleKeys) / exactPairs}%.1f%%)")

      val ranked = PrefixSum.rank(paired,
        col("rank") * b + col("__r2"),
        Seq(col("rank"), col("__r2"), col("doc_id"), col("pos")), "__ord",
        preStaged = true,
        keyRange = Some((b - 2.0, n * b + n + 2.0)),
        keepBucket = Some("__b"))
      // Balance stats computed distributively (one agg over the per-bucket
      // counts) — no per-bucket collect to the driver.
      val bs = ranked.groupBy("__b").count()
        .agg(count(lit(1)).as("nb"), min("count").as("mn"),
          max("count").as("mx"), sum("count").as("tot")).head
      val (nb, mn, mx, tot) = (bs.getLong(0), bs.getLong(1), bs.getLong(2), bs.getLong(3))
      val mean = tot.toDouble / nb
      println(f"[sa-tier] grid buckets=$nb rows min=$mn " +
        f"max=$mx mean=$mean%.0f max/mean=${mx / mean}%.2f")
    } finally org.apache.hadoop.fs.FileSystem
      .getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(pairedPath), true)

    // --- end-to-end probe: every tail-avoiding 16-token window must be
    // cross-document duplicated (each copy carries it verbatim).
    // Staged to parquet and aggregated on 256 partitions: the level
    // checkpoints pin most of the 8g storage pool, and a 32-partition
    // countDistinct over 10^8 rows asked each task for more execution
    // memory than remained (measured: UNABLE_TO_ACQUIRE_MEMORY at the
    // default heap). Small tasks over a disk-staged two-column frame
    // keep every hash map comfortably under the per-task share.
    val probePath = "target/sa_tier_probe.parquet"
    last.filter(col("pos") + 16 <= col("dlen") - 1)
      .select("rank", "doc_id")
      .write.mode("overwrite").parquet(probePath)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "256")
    val undup =
      try spark.read.parquet(probePath)
        .distinct()
        .groupBy("rank").agg(count(lit(1)).as("nd"))
        .filter(col("nd") < 2).count()
      finally {
        spark.conf.set("spark.sql.shuffle.partitions", prevParts)
        org.apache.hadoop.fs.FileSystem
          .getLocal(spark.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(probePath), true)
      }
    println(s"[sa-tier] unduplicated tail-avoiding 16-token windows: $undup (must be 0)")
    require(undup == 0L, s"rank groups split at the boundary: $undup windows lost their duplicates")
    println("[sa-tier] OK")
    spark.stop()
  }
}
