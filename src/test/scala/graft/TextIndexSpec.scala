package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns.{normalizeText, tokens}
import graft.operators.{KCore, TextIndex}
import graft.queries.RelQueries9

class TextIndexSpec extends GraftSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("staged probe equals the inline BM25 pipeline") {
    val docs = Tables(spark, sf, "documents")
    val dir = "target/text_index_spec"
    TextIndex.build(docs, "doc_id", tokens(normalizeText(col("text"))), dir)
    val probed = TextIndex.probe(spark, dir, Seq("merge", "hash", "window"), 25)
      .as[(Long, Long, Long)].collect().toSeq
    val inline = RelQueries9.bm25(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(probed == inline, s"probe=${probed.take(3)} inline=${inline.take(3)}")
    assert(probed.nonEmpty)
  }

  test("probe prunes the postings scan to the query terms' buckets") {
    val dir = "target/text_index_spec"
    val plan = TextIndex.probe(spark, dir, Seq("merge"), 5)
      .queryExecution.executedPlan.toString
    // The bucket predicate must reach the scan as a PARTITION filter
    // (directory pruning), not a post-scan row filter.
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"postings scan must carry a bucket partition filter:\n${plan.take(3000)}")
    val pf = plan.split("PartitionFilters:")(1).split("]")(0)
    assert(pf.contains("bucket"), s"bucket not in partition filters: $pf")
  }

  test("k-core on a known graph: K4 survives k=3, pendant tail peels") {
    // K4 (0-1-2-3 complete) plus a pendant path 3-4-5: the 3-core is
    // exactly the K4; 5 peels first (deg 1), then 4 — the cascade the
    // fixpoint owes us regardless of round count.
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val core = KCore.core(e, k = 3, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(core.keySet == Set(0L, 1L, 2L, 3L), s"3-core must be the K4, got $core")
    assert(core.values.forall(_ == 3L), s"inside K4 every degree is 3: $core")
  }
}
