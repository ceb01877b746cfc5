package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns.normalizeText
import graft.operators.{ConnectedComponents, MinHashDedup}

/** q_stream_takedown's composed deletion on a PLANTED corpus built to
  * spring the resurrection trap: doc 1 (family-A root, hit by the
  * doc_id ≡ 1 mod 7 takedown) is near-identical to doc 478's bridge
  * text, and 478 arrives in the ADD batch AFTER the takedown. Without
  * index-side retraction the batch-3 probe would emit (1, 478) and the
  * fold would re-insert the deleted doc into the assignment; with it,
  * 478 pairs with survivors only. Reuses StreamIncrementalDedupSpec's
  * asserted A/B/X geometry (J(X,A) = J(X,B) ≈ 0.766 ≥ 0.7,
  * J(A,B) ≈ 0.674 < 0.7). */
class StreamTakedownSpec extends GraftSuite {

  import spark.implicits._

  private val A = "hbrpoig8f1cbfno6b9m80o2rak1vrjnvgfygwwqc38hyf9sxmecosfogyr3xkxwnrek8pk3yr9oudocuzrenun5z3jqip98q1zxoi65fdhjk1eyy37q9ah8r"
  private val B = "hbrpoig8f1cbfno6b9m80o2rak1vrjnvgfygwwqc38hyf9sxmechs1k3aq6l6gt6mek8pk3yr9oudocuzrenun5z3jqip98q1zxoi65fdhjk1eyy37q9ah8r"
  private val X = "hbrpoig8f1cbfno6b9m80o2rak1vrjnvgfygwwqc38hyf9sxmechs1k3aq3xkxwnrek8pk3yr9oudocuzrenun5z3jqip98q1zxoi65fdhjk1eyy37q9ah8r"
  private val C = "unrelatedbasetextthatpairsonlywithitsowncopy0123456789qwertyuiopasdfghjklzxcvbnmmuchlongerthanthewindowsize9876543210zz"

  // ids chosen around the mod-7 blocklist: 1 ≡ 1 (taken down);
  // 401, 450, 478, 3, 10, 11 all survive. Delta (≥ 400) sorted is
  // (401, 450, 478); the query's halves put 401, 450 in the ADD batch
  // BEFORE the takedown and 478 (the A/B bridge) in the one after.
  private val docs = Seq(
    (1L, A), (3L, B), (10L, C), (11L, C),
    (401L, A), (450L, B), (478L, X))

  private def rows(df: DataFrame): Set[(Long, Long)] =
    df.select(col("id").cast("long"), col("component").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("registered query: takedown holds through the following add batch") {
    val dir = "target/stakedown_spec"
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = rows(graft.queries.LlmQueries21.streamTakedown(spark, dir))
    // deleted doc 1 is gone and STAYS gone: the bridge 478 (same text
    // family as 1) merges only the surviving A copy 401 with family B
    val expect = Set((3L, 3L), (401L, 3L), (450L, 3L), (478L, 3L),
      (10L, 10L), (11L, 10L))
    assert(out == expect, s"got $out")
    assert(!out.exists(_._1 == 1L), "retracted doc resurrected")
    // and literally the from-scratch recompute over survivors' pairs
    val survivors = docs.filter(_._1 % 7 != 1)
    val full = rows(ConnectedComponents.components(
      MinHashDedup.nearDuplicates(survivors.toDF("doc_id", "text"), "doc_id",
          normalizeText(col("text")), threshold = 0.7)
        .select(col("id_a").as("src"), col("id_b").as("dst"))))
    assert(out == full)
  }

  test("the trap is real: without index retraction the bridge pairs with the deleted doc") {
    // proves the planted corpus actually exercises the hazard — an
    // unfiltered probe of the full corpus DOES emit (1, 478)
    val pairs = MinHashDedup
      .nearDuplicates(docs.toDF("doc_id", "text"), "doc_id",
        normalizeText(col("text")), threshold = 0.7)
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 478L)),
      s"trap text drifted — (1,478) missing from $pairs")
  }
}
