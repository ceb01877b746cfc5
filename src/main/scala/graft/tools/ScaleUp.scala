package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev/bench tool: stage an N× replica of a testdata directory for
  * SCALING measurements (BENCHLOG's second scale point — the driver
  * ships no sf1 data). Copies shift every entity key by a per-copy
  * stride so referential joins keep exactly their base-SF selectivity
  * (orderkey/custkey/partkey/suppkey/event_id/user_id/doc_id/vec_id);
  * the bounded dims nation/region are NOT replicated, matching TPC-H's
  * own scaling rule. Document text gets a per-copy suffix token and
  * embeddings a deterministic per-copy tail perturbation, so content
  * dedup keeps near-dup structure per copy instead of inventing
  * cross-copy exact-duplicate cliques the base corpus doesn't have
  * (which would measure an artifact, not scaling).
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> [copies=10]
  * Writes <dstDir>/<table>.parquet mirrors readable by graft.Tables.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1

    // key strides from the base tables (referenced AND referencing
    // columns shift together, so every join keeps its base fan-out)
    val oStride = stride(read("orders"), "o_orderkey")
    val cStride = stride(read("customer"), "c_custkey")
    val sStride = stride(read("supplier"), "s_suppkey")
    val pStride = stride(read("part"), "p_partkey")
    val eStride = stride(read("events"), "event_id")
    val uStride = stride(read("events"), "user_id")
    val dStride = stride(read("documents"), "doc_id")
    val vStride = stride(read("embeddings"), "vec_id")

    /** Union `copies` shifted replicas; `shifts` maps column → stride. */
    def replicate(t: String, shifts: Map[String, Long],
                  extra: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
      val base = read(t)
      val cols = base.columns
      val parts = (0 until copies).map { i =>
        val shifted = shifts.foldLeft(base) { case (d, (c, st)) =>
          d.withColumn(c, col(c) + lit(st * i))
        }
        extra(shifted, i).select(cols.map(col).toIndexedSeq: _*)
      }
      parts.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t x$copies -> $dst/$t.parquet")
    }

    // fixed dims: copy through once
    for (t <- Seq("region", "nation")) {
      val base = read(t)
      base.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t x1 -> $dst/$t.parquet")
    }
    replicate("customer", Map("c_custkey" -> cStride))
    replicate("supplier", Map("s_suppkey" -> sStride))
    replicate("part", Map("p_partkey" -> pStride))
    replicate("orders", Map("o_orderkey" -> oStride, "o_custkey" -> cStride))
    replicate("lineitem", Map("l_orderkey" -> oStride,
      "l_partkey" -> pStride, "l_suppkey" -> sStride))
    replicate("events", Map("event_id" -> eStride, "user_id" -> uStride))
    replicate("documents", Map("doc_id" -> dStride, "n_chars" -> 0L),
      (d, i) => if (i == 0) d
        else d.withColumn("text", concat(col("text"), lit(s" zq$i")))
          .withColumn("n_chars", length(col("text")).cast("long")))
    replicate("embeddings", Map("vec_id" -> vStride),
      (d, i) => if (i == 0) d
        else d.withColumn("embedding",
          // perturb the last component by a tiny copy-dependent delta:
          // keeps geometry (cosine shifts ~1e-4) while making replicas
          // distinct for exact-match/dedup paths
          concat(slice(col("embedding"), lit(1), size(col("embedding")) - 1),
            array((element_at(col("embedding"), -1) + lit(i * 1e-4f))
              .cast("float")))))
    spark.stop()
  }
}
