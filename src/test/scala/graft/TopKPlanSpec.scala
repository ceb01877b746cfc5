package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopKPerGroup

class TopKPlanSpec extends GraftSuite {
  import spark.implicits._

  test("native top-k equals the ranking-window form on real data") {
    val o = Tables(spark, "/root/testdata/sf0.001", "orders")
    val native = TopKPerGroup.topK(o,
        Seq(col("o_orderpriority")),
        Seq(col("o_totalprice").desc, col("o_orderkey")), k = 7)
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
      .collect().map(_.toSeq).toSet
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val windowed = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 7)
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
      .collect().map(_.toSeq).toSet
    assert(native == windowed && native.nonEmpty)
  }

  test("plan: two heap phases, one exchange, zero sorts") {
    val o = Tables(spark, "/root/testdata/sf0.001", "orders")
    val df = TopKPerGroup.topK(o, Seq(col("o_orderpriority")),
      Seq(col("o_totalprice").desc, col("o_orderkey")), k = 3)
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerGroup \\[".r.findAllIn(plan).size == 2,
      s"expected partial+final heap phases:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"),
      s"final phase must demand a hash distribution:\n$plan")
    assert(!plan.contains("Sort "), s"no sort exec anywhere:\n$plan")
  }

  test("k larger than any group degenerates to identity set") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("g", "v")
    val out = TopKPerGroup.topK(df, Seq(col("g")), Seq(col("v")), k = 10)
      .as[(String, Int)].collect().toSet
    assert(out == Set(("a", 1), ("a", 2), ("b", 3)))
  }

  test("heap keeps the k smallest under ascending order") {
    val df = (1 to 100).map(i => ("g", i)).toDF("g", "v")
    val out = TopKPerGroup.topK(df, Seq(col("g")), Seq(col("v")), k = 4)
      .as[(String, Int)].collect().map(_._2).toSet
    assert(out == Set(1, 2, 3, 4))
  }
}
