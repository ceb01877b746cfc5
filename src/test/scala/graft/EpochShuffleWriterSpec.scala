package graft

import org.apache.spark.sql.functions._

import graft.queries.LlmQueries15
import graft.sinks.RangeSortedParquet

/** File-level assertions for the full-epoch shuffle WRITER
  * (q_epoch_write): the terasort layout must make the permutation
  * recoverable from the files alone — disjoint per-file key ranges,
  * within-file sort, and a re-read order that equals the direct
  * `ORDER BY (k, doc_id)` permutation row for row. */
class EpochShuffleWriterSpec extends GraftSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val path = "target/epoch_fixture_" + sf.replaceAll("[^A-Za-z0-9]", "_")

  private def keyed = Tables(spark, sf, "documents")
    .select(col("doc_id"),
      md5(concat(lit("epoch7:"), col("doc_id").cast("string"))).as("k"))

  test("epoch write: per-file key ranges are pairwise disjoint") {
    // Running the query performs the write as a side effect.
    LlmQueries15.epochWrite(spark, sf).collect()
    val ranges = RangeSortedParquet.fileRanges(spark, path, "k")
      .select("lo", "hi").as[(String, String)].collect().sortBy(_._1)
    assert(ranges.length > 1, "layout must actually split into files")
    ranges.foreach { case (lo, hi) => assert(lo <= hi) }
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"file ranges overlap: hi=$hi1 >= next lo=$lo2")
      case _ =>
    }
  }

  test("epoch write: file-order re-read IS the seeded permutation") {
    LlmQueries15.epochWrite(spark, sf).collect()
    // Reconstruct the global order the way a training reader would:
    // files in range order, rows within a file in stored order — no
    // global sort at read time.
    val fileOrder = RangeSortedParquet.fileRanges(spark, path, "k")
      .select("file", "lo").as[(String, String)].collect()
      .sortBy(_._2).map(_._1)
    val readOrder = fileOrder.flatMap { f =>
      spark.read.parquet(f).select("doc_id").as[Long].collect()
    }
    val direct = keyed.orderBy("k", "doc_id").select("doc_id")
      .as[Long].collect()
    assert(readOrder.length == direct.length)
    assert(readOrder.sameElements(direct),
      "re-read order diverges from ORDER BY (k, doc_id)")
    // And the head of that permutation is exactly what the reader query
    // (q_epoch_shuffle) reports — writer and reader agree on the epoch.
    val head = LlmQueries15.epochShuffle(spark, sf)
      .select("doc_id").as[Long].collect()
    assert(readOrder.take(head.length).sameElements(head))
  }

  test("epoch write: mid-epoch resume reads only the covering files") {
    // The crash-resume property the layout exists for: a training run
    // restarting at global position N must not rescan the epoch head —
    // the per-file offset map (bounded, nFiles rows) locates the files
    // covering [N, N+k), and only those are read.
    LlmQueries15.epochWrite(spark, sf).collect()
    val files = RangeSortedParquet.fileRanges(spark, path, "k")
      .select("file", "lo").as[(String, String)].collect().sortBy(_._2)
    val counts = files.map { case (f, _) =>
      f -> spark.read.parquet(f).count()
    }
    val offsets = counts.scanLeft(0L)(_ + _._2).init // exclusive, file order
    val (from, n) = (100L, 21L) // resume window [101, 121] (1-based)
    val covering = counts.zip(offsets).filter { case ((_, c), off) =>
      off < from + n && off + c > from // [off, off+c) ∩ [from, from+n) ≠ ∅
    }
    assert(covering.length < counts.length,
      "resume window must not require every file")
    val resumed = covering.flatMap { case ((f, _), off) =>
      spark.read.parquet(f).select("doc_id").as[Long].collect()
        .zipWithIndex.map { case (d, i) => (off + i + 1, d) } // 1-based pos
    }.filter { case (pos, _) => pos > from && pos <= from + n }
      .sortBy(_._1).map(_._2)
    val direct = keyed.orderBy("k", "doc_id").select("doc_id")
      .as[Long].collect().slice(from.toInt, (from + n).toInt)
    assert(resumed.sameElements(direct),
      "resume-read slice diverges from the direct permutation slice")
  }

  test("epoch write: deterministic given (seed, corpus) — rewrite reproduces") {
    val first = LlmQueries15.epochWrite(spark, sf)
      .select("blk", "n", "dot", "sig").as[(Long, Long, Long, String)]
      .collect().toSeq
    val second = LlmQueries15.epochWrite(spark, sf)
      .select("blk", "n", "dot", "sig").as[(Long, Long, Long, String)]
      .collect().toSeq
    assert(first == second, "epoch layout must be reproducible for resume")
  }
}
