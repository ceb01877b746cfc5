package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns.normalizeText
import graft.operators.{Checkpoints, ConnectedComponents, IncrementalCC, MinHashDedup, MinHashIndex}

/** q_stream_incremental_dedup's state machine on a PLANTED corpus: two
  * near-dup families grow in separate batches and a bridge document in
  * the LAST batch merges them — the cross-batch merge a
  * per-batch-recompute harness never exercises. The bridge text X was
  * constructed so that J(X, A) = J(X, B) ≈ 0.766 (≥ 0.7, and the banded
  * MinHash emits both candidates) while J(A, B) ≈ 0.674 (< 0.7 — the
  * families can never pair directly); the geometry is asserted by the
  * first test so the planting can't silently rot if the shingle/hash
  * constants ever change. */
class StreamIncrementalDedupSpec extends GraftSuite {

  import spark.implicits._

  // 120-char alphanumeric texts; normalization is the identity on them.
  // B = A with a 14-char window replaced; X = A with the first half of
  // that window replaced (so X sits "between" A and B).
  private val A = "hbrpoig8f1cbfno6b9m80o2rak1vrjnvgfygwwqc38hyf9sxmecosfogyr3xkxwnrek8pk3yr9oudocuzrenun5z3jqip98q1zxoi65fdhjk1eyy37q9ah8r"
  private val B = "hbrpoig8f1cbfno6b9m80o2rak1vrjnvgfygwwqc38hyf9sxmechs1k3aq6l6gt6mek8pk3yr9oudocuzrenun5z3jqip98q1zxoi65fdhjk1eyy37q9ah8r"
  private val X = "hbrpoig8f1cbfno6b9m80o2rak1vrjnvgfygwwqc38hyf9sxmechs1k3aq3xkxwnrek8pk3yr9oudocuzrenun5z3jqip98q1zxoi65fdhjk1eyy37q9ah8r"
  // unrelated base pair — asserts untouched clusters pass through
  private val C = "unrelatedbasetextthatpairsonlywithitsowncopy0123456789qwertyuiopasdfghjklzxcvbnmmuchlongerthanthewindowsize9876543210zz"

  // base era (< 400): two singleton family roots + one real cluster;
  // delta batches (the query splits the sorted delta into positional
  // thirds — here one doc per batch): family A grows in
  // batch 1, family B in batch 2, the bridge arrives in batch 3.
  private val docs = Seq(
    (1L, A), (3L, B), (10L, C), (11L, C),
    (401L, A), (450L, B), (470L, X))

  private def writeDocs(dir: String): Unit =
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  private def rows(df: DataFrame): Set[(Long, Long)] =
    df.select(col("id").cast("long"), col("component").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("planted geometry: bridge pairs with both families, families never pair directly") {
    val d = docs.toDF("doc_id", "text")
    val pairs = MinHashDedup
      .nearDuplicates(d, "doc_id", normalizeText(col("text")), threshold = 0.7)
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 470L)) && pairs.contains((3L, 470L)),
      s"bridge must pair into both families; got $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((1L, 450L)) &&
      !pairs.contains((3L, 401L)) && !pairs.contains((401L, 450L)),
      s"families must stay below threshold without the bridge; got $pairs")
    assert(pairs.contains((1L, 401L)) && pairs.contains((3L, 450L)) &&
      pairs.contains((10L, 11L)), s"identical-copy pairs missing from $pairs")
  }

  test("registered query: the streamed fold equals the full recompute, bridge merge included") {
    val dir = "target/sidedup_spec"
    writeDocs(dir)
    val out = rows(graft.queries.LlmQueries20.streamIncrementalDedup(spark, dir))
    // merged family component = min id across both families and the bridge
    val expect = Set((1L, 1L), (3L, 1L), (401L, 1L), (450L, 1L), (470L, 1L),
      (10L, 10L), (11L, 10L))
    assert(out == expect, s"got $out")
    // and literally the from-scratch recompute over every pair ever seen
    val full = rows(ConnectedComponents.components(
      MinHashDedup.nearDuplicates(docs.toDF("doc_id", "text"), "doc_id",
          normalizeText(col("text")), threshold = 0.7)
        .select(col("id_a").as("src"), col("id_b").as("dst"))))
    assert(out == full)
  }

  test("state machine: families stay separate until the bridge batch folds them") {
    val dir = "target/sidedup_spec_manual"
    writeDocs(dir)
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val norm = normalizeText(col("text"))
    val idx = "target/sidedup_spec_idx"
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(idx), true)
    MinHashIndex.build(d.filter(col("doc_id") < 400), "doc_id", norm, idx)
    var assign = ConnectedComponents.componentsEager(
      MinHashDedup.nearDuplicates(d.filter(col("doc_id") < 400), "doc_id",
          norm, threshold = 0.7)
        .select(col("id_a").as("src"), col("id_b").as("dst")))
    def comp(id: Long): Option[Long] = rows(assign).find(_._1 == id).map(_._2)
    val batches = Seq(Seq((401L, A)), Seq((450L, B)), Seq((470L, X)))
    batches.zipWithIndex.foreach { case (batch, i) =>
      MinHashIndex.append(batch.toDF("doc_id", "text"), "doc_id", norm, idx)
      val pairs = MinHashIndex.probeNew(spark, idx, d, "doc_id", norm,
          threshold = 0.7, minNewId = batch.map(_._1).min)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      val next = IncrementalCC.addEdgesEager(assign, pairs)
      Checkpoints.release(assign)
      assign = next
      if (i == 1) {
        // after batch 2: both families exist and are DISTINCT clusters
        assert(comp(1L) == Some(1L) && comp(401L) == Some(1L))
        assert(comp(3L) == Some(3L) && comp(450L) == Some(3L))
      }
    }
    // after the bridge batch: one merged component, untouched pair intact
    assert(rows(assign) == Set((1L, 1L), (3L, 1L), (401L, 1L), (450L, 1L),
      (470L, 1L), (10L, 10L), (11L, 10L)))
    Checkpoints.release(assign)
  }
}
