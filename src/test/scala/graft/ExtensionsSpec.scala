package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TopKAggregate._

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions installs cosine_sim at session build time") {
    val base = SparkTestBase.spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        "SELECT cosine_sim(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS c")
        .collect()(0).getDouble(0)
      assert(math.abs(r - 1.0) < 1e-12)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("TopKByValue heap semantics: bounded, ordered, deterministic ties") {
    val agg = new TopKByValue(2)
    val buf = Seq(Entry(1, 5.0), Entry(2, 9.0), Entry(3, 9.0), Entry(4, 1.0))
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf == List(Entry(2, 9.0), Entry(3, 9.0))) // tie → lower id first
    val merged = agg.merge(buf, List(Entry(9, 10.0)))
    assert(agg.finish(merged) == List(Entry(9, 10.0), Entry(2, 9.0)))
  }
}
