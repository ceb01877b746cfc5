package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFns._

/** The custom codegen'd expression must be bit-identical to the
  * higher-order-function formulation (oracle parity depends on it). */
class CosineExprSpec extends GraftSuite {
  import spark.implicits._

  test("cosineFast == cosine bitwise on real embeddings") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("e"))
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val both = e.crossJoin(broadcast(q))
      .select(cosine(col("qe"), col("e")).as("slow"),
        cosineFast(col("qe"), col("e")).as("fast"))
      .as[(Double, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (s, f) =>
      assert(java.lang.Double.doubleToLongBits(s) == java.lang.Double.doubleToLongBits(f))
    }
  }

  test("cosineFast on float arrays without cast, zero-norm guard, null propagation") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(1.0f, 2.0f))),
      (Some(Array(0.0f, 0.0f)), Some(Array(1.0f, 1.0f))),
      (None, Some(Array(1.0f, 1.0f)))).toDF("a", "b")
    val r = df.select(cosineFast(col("a"), col("b"))).as[Option[Double]].collect()
    assert(math.abs(r(0).get - 1.0) < 1e-12)
    assert(r(1).contains(0.0))
    assert(r(2).isEmpty)
  }

  test("SQL surface: cosine_sim registered and callable") {
    register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c").as[Double].head()
    assert(r == 0.0)
  }

  test("jaccard expression == interpreted HOF form bitwise on shingle arrays") {
    import graft.operators.MinHashDedup
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 40)
      .select(col("doc_id"),
        MinHashDedup.shingles(graft.functions.TextFns.normalizeText(col("text"))).as("sh"))
    val pairs = docs.as("a").join(docs.as("b"),
      col("a.doc_id") < col("b.doc_id"))
    def hofJaccard(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      val inter = size(filter(a, x => array_contains(b, x))).cast("double")
      inter / (size(a) + size(b) - inter)
    }
    val both = pairs.select(
        hofJaccard(col("a.sh"), col("b.sh")).as("slow"),
        MinHashDedup.jaccard(col("a.sh"), col("b.sh")).as("fast"))
      .as[(Double, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (s, f) =>
      assert(java.lang.Double.doubleToLongBits(s) == java.lang.Double.doubleToLongBits(f))
    }
  }

  test("SQL surface: jaccard_sim registered and callable") {
    register(spark)
    val r = spark.sql(
      "SELECT jaccard_sim(array('a','b'), array('b','c')) AS j").as[Double].head()
    assert(r == 1.0 / 3.0)
  }

  test("jaccard expression: duplicates as sets, empty arrays, null propagation") {
    val df = Seq(
      (Some(Seq("a", "b", "b")), Some(Seq("b", "c"))), // sets {a,b},{b,c} → 1/3
      (Some(Seq.empty[String]), Some(Seq.empty[String])), // 0/0 → 0.0
      (None, Some(Seq("x")))).toDF("a", "b")
    val r = df.select(graft.operators.MinHashDedup.jaccard(col("a"), col("b")))
      .as[Option[Double]].collect()
    assert(r(0).contains(1.0 / 3.0))
    assert(r(1).contains(0.0))
    assert(r(2).isEmpty)
  }
}
