package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns.normalizeText
import graft.functions.VectorFns.toDoubleVec
import graft.operators.{IvfIndex, MinHashIndex}

/** Dev/bench tool: the index-maintenance EVIDENCE run — accrete 15
  * overlay generations / append batches against the MinHash-LSH and
  * IVF indexes, measuring probe latency and data-file counts as the
  * layers pile up, then compact and measure the recovery. The
  * compaction specs prove probe INVARIANCE (results identical before
  * and after); this tool measures the thing compaction exists to fix —
  * probe cost growing with file/layer count while data volume barely
  * moves — and records the recovery curve for BENCHLOG.
  *
  * Usage: runMain graft.tools.CompactionTier [srcDir] [generations]
  * Defaults: /root/testdata/sf0.1, 15 generations; measurements at
  * generations 1/5/10/15 and after compaction. Run on an otherwise
  * idle machine — probe timings are min-of-2 wall clock.
  */
object CompactionTier {

  private def timedOnce[T](f: => T): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** min-of-2 for idempotent probes; compaction swaps are stateful and
    * must be timed with [[timedOnce]]. */
  private def timedMin2[T](f: => T): Double =
    math.min(timedOnce(f), timedOnce(f))

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val gens = if (args.length > 1) args(1).toInt else 15
    val checkpoints = Set(1, gens / 3, 2 * gens / 3, gens)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)

    def dataFiles(paths: Seq[String]): Int = paths.map { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      if (!fs.exists(p)) 0
      else {
        val it = fs.listFiles(p, true)
        var n = 0
        while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
        n
      }
    }.sum

    // ---------------- MinHash-LSH index ----------------
    val docs = Tables(spark, src, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .localCheckpoint(true)
    val norm = normalizeText(col("text"))
    val split = 2500L
    val nDelta = docs.filter(col("doc_id") >= split).count()
    val mhRoot = "target/ctier_mh"
    fs.delete(new org.apache.hadoop.fs.Path(mhRoot), true)
    val mhBase = s"$mhRoot/base"
    def mhOvl(g: Int) = s"$mhRoot/ovl$g"
    MinHashIndex.build(docs.filter(col("doc_id") < split), "doc_id", norm, mhBase)
    println(s"[ctier] minhash base built: docs<$split, " +
      s"files=${dataFiles(Seq(mhBase))}")
    val sliceW = math.max(1L, nDelta / gens)
    def mhProbe(dirs: Seq[String]): Long =
      MinHashIndex.probeNewMulti(spark, dirs, docs, "doc_id", norm,
        threshold = 0.7, minNewId = split).count()
    for (g <- 1 to gens) {
      val lo = split + (g - 1) * sliceW
      val hi = if (g == gens) Long.MaxValue else split + g * sliceW
      MinHashIndex.build(
        docs.filter(col("doc_id") >= lo && col("doc_id") < hi),
        "doc_id", norm, mhOvl(g))
      if (checkpoints(g)) {
        val dirs = mhBase +: (1 to g).map(mhOvl)
        val t = timedMin2(mhProbe(dirs))
        println(f"[ctier] minhash gen=$g layers=${dirs.length} " +
          f"files=${dataFiles(dirs)} probe_s=$t%.2f")
      }
    }
    val tSwapMh = timedOnce {
      MinHashIndex.compact(spark, mhBase, (1 to gens).map(mhOvl))
    }
    val tAfterMh = timedMin2(mhProbe(Seq(mhBase)))
    println(f"[ctier] minhash COMPACTED swap_s=$tSwapMh%.2f " +
      f"files=${dataFiles(Seq(mhBase))} probe_s=$tAfterMh%.2f")

    // ---------------- IVF index ----------------
    val e = Tables(spark, src, "embeddings")
      .select(col("vec_id").cast("long").as("vec_id"),
        toDoubleVec(col("embedding")).as("e"))
      .localCheckpoint(true)
    val vSplit = 1000L
    val nVDelta = e.filter(col("vec_id") >= vSplit).count()
    val ivfDir = "target/ctier_ivf/idx"
    fs.delete(new org.apache.hadoop.fs.Path("target/ctier_ivf"), true)
    IvfIndex.build(e.filter(col("vec_id") < vSplit), "vec_id", "e",
      k = 16, iters = 3, ivfDir)
    println(s"[ctier] ivf base built: vecs<$vSplit, " +
      s"files=${dataFiles(Seq(s"$ivfDir/assignments"))}")
    val q = e.filter(col("vec_id") < 32)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
      .localCheckpoint(true)
    def ivfProbe(): Long = IvfIndex.probe(spark, ivfDir, q, k = 10, nprobe = 4).count()
    val vW = math.max(1L, nVDelta / gens)
    for (g <- 1 to gens) {
      val lo = vSplit + (g - 1) * vW
      val hi = if (g == gens) Long.MaxValue else vSplit + g * vW
      IvfIndex.append(spark, ivfDir,
        e.filter(col("vec_id") >= lo && col("vec_id") < hi), "vec_id", "e")
      if (checkpoints(g)) {
        val t = timedMin2(ivfProbe())
        println(f"[ctier] ivf gen=$g files=${dataFiles(Seq(s"$ivfDir/assignments"))} " +
          f"probe_s=$t%.2f")
      }
    }
    val tSwapIvf = timedOnce(IvfIndex.compact(spark, ivfDir))
    val tAfterIvf = timedMin2(ivfProbe())
    println(f"[ctier] ivf COMPACTED swap_s=$tSwapIvf%.2f " +
      f"files=${dataFiles(Seq(s"$ivfDir/assignments"))} probe_s=$tAfterIvf%.2f")
    println("[ctier] OK")
    spark.stop()
  }
}
