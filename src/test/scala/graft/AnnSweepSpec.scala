package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFns.toDoubleVec
import graft.operators.Knn
import graft.queries.LlmQueries18

/** q_ann_sweep semantics (r16): the operating-point audit is only
  * trustworthy if its two axes behave lawfully — recall must be
  * non-decreasing and touched-fraction strictly increasing in nprobe,
  * and at nprobe = nlist the probe IS brute force (recall 1.0, touched
  * 1.0). The last property pins the sweep to ground truth instead of
  * to itself: if assignment, search, or the intersection count drifted
  * from the exact baseline, the saturated point would not hit 1.0. */
class AnnSweepSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables(spark, dir, "embeddings")
    .select(col("vec_id"), col("label"), toDoubleVec(col("embedding")).as("e"))

  test("sweep rows: recall non-decreasing, touched strictly increasing in nprobe") {
    val rows = LlmQueries18.annSweep(spark, dir)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Seq(1, 2, 4))
    val recalls = rows.map(_._2)
    val touched = rows.map(_._3)
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall decreased across nprobe points: ${recalls.toSeq}")
    assert(touched.zip(touched.tail).forall { case (a, b) => a < b },
      s"touched-fraction not strictly increasing: ${touched.toSeq}")
    assert(touched.forall(t => t > 0.0 && t <= 1.0), touched.toSeq.toString)
    assert(recalls.forall(r => r >= 0.0 && r <= 1.0), recalls.toSeq.toString)
  }

  test("saturated probe (nprobe = nlist) is exactly brute force") {
    val e = emb
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val nlist = e.select("label").distinct().count().toInt
    val cents = Knn.centroids(e, "label")
    val saturated = Knn.ivfTopK(q, e, "label", 5, nlist, cents)
      .select("qid", "vec_id")
    val brute = Knn.bruteForceTopK(q, e.select("vec_id", "e"), 5)
      .select("qid", "vec_id")
    assert(saturated.exceptAll(brute).isEmpty && brute.exceptAll(saturated).isEmpty,
      "saturated IVF probe diverges from the exact baseline")
  }

  test("ivfAssign emits exactly nprobe clusters per query, all distinct") {
    val e = emb
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val cents = Knn.centroids(e, "label")
    val a = Knn.ivfAssign(q, cents, "label", 2)
      .groupBy("qid")
      .agg(count(lit(1)).as("n"), countDistinct(col("label")).as("nd"))
      .collect()
    assert(a.nonEmpty)
    assert(a.forall(r => r.getLong(1) == 2L && r.getLong(2) == 2L),
      a.mkString(", "))
  }
}
