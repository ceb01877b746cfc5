package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns.bpeTokenCount
import graft.queries.LlmQueries16

/** Structural invariants of the boundary-splitting packer
  * (q_packed_fragments) that the value-level DuckDB oracle implies but
  * never states: the output must be a PARTITION of the concatenated
  * token stream into full sequences. A wrong clamp, an off-by-one in
  * the covered-sequence range, or a fragment double-count would
  * break one of these before it breaks the oracle hash. */
class PackedFragmentsSpec extends GraftSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  private lazy val out = LlmQueries16.packedFragments(spark, sf)
    .localCheckpoint(true)

  private lazy val totalToks: Long = Tables(spark, sf, "documents")
    .select(bpeTokenCount(col("text")).cast("long").as("toks"))
    .filter(col("toks") > 0)
    .agg(sum("toks")).head.getLong(0)

  test("sequences partition the token stream: ids contiguous from 0, full fill") {
    val rows = out.select("seq_id", "seq_tokens").as[(Long, Long)]
      .collect().sortBy(_._1)
    assert(rows.head._1 == 0L, "first sequence must be 0")
    // zip against the tail (not sliding(2)): a single-sequence corpus
    // yields one length-1 window from sliding and a MatchError here.
    rows.zip(rows.tail).foreach { case ((a, _), (b, _)) =>
      assert(b == a + 1, s"gap in seq ids: $a -> $b")
    }
    // Every sequence is exactly 1024 tokens except possibly the tail.
    rows.init.foreach { case (id, tk) =>
      assert(tk == 1024L, s"seq $id fill $tk != 1024")
    }
    assert(rows.last._2 >= 1L && rows.last._2 <= 1024L)
    assert(rows.map(_._2).sum == totalToks,
      "fragment masses must sum to the corpus token count")
  }

  test("fragment count identity: n_docs + boundary crossings") {
    val spans = Tables(spark, sf, "documents")
      .select(col("doc_id"), bpeTokenCount(col("text")).cast("long").as("toks"))
      .filter(col("toks") > 0)
    val nDocs = spans.count()
    val nFrags = out.agg(sum("n_frags")).head.getLong(0)
    // Each doc yields 1 fragment plus one per 1024-boundary it crosses;
    // summing (last_seq - first_seq) over docs counts the crossings.
    val crossings = graft.operators.PrefixSum.runningSum(spans,
        col("doc_id"), Seq(col("doc_id")), col("toks"), "cum0")
      .select((shiftright(col("cum0") + col("toks") - 1, 10) -
        shiftright(col("cum0"), 10)).as("x"))
      .agg(sum("x")).head.getLong(0)
    assert(nFrags == nDocs + crossings,
      s"fragments $nFrags != docs $nDocs + crossings $crossings")
  }

  test("whole-doc fragments never straddle; max_frag bounded by 1024") {
    val bad = out.filter(col("max_frag") > 1024L || col("max_frag") < 1L).count()
    assert(bad == 0L)
    // A doc counted whole in some sequence contributes exactly one
    // fragment, so whole-doc count can never exceed fragment count.
    assert(out.filter(col("n_whole_docs") > col("n_frags")).count() == 0L)
  }
}
