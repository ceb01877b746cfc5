package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bucketing, Salted}

/** The explicit scale techniques: salting (skew) and bucketing
  * (co-located joins). Salting is value-checked against the unsalted
  * plan; bucketing is PLAN-checked — the join of two same-bucketed
  * tables must contain no shuffle exchange.
  */
class ScaleTechniquesSpec extends GraftSuite {
  import spark.implicits._

  test("salted two-phase aggregation equals unsalted groupBy exactly") {
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .withColumn("cents", round(col("l_extendedprice") * 100).cast("long"))
    val salted = Salted.sumCount(li, Seq("l_returnflag"),
      Seq("sum_cents" -> col("cents")), buckets = 8)
      .orderBy("l_returnflag")
      .as[(String, Long, Long)].collect().toSeq
    val plain = li.groupBy("l_returnflag")
      .agg(sum(col("cents")).as("sum_cents"), count(lit(1)).as("n"))
      .orderBy("l_returnflag")
      .as[(String, Long, Long)].collect().toSeq
    assert(salted == plain)
  }

  test("partitioned layout: partition filter prunes directories at plan time") {
    import graft.sinks.PartitionedParquet
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/orders"
    val o = Tables(spark, "/root/testdata/sf0.001", "orders")
    PartitionedParquet.writePartitioned(o, dir, "order_year", year(col("o_orderdate")))
    val all = PartitionedParquet.read(spark, dir)
    val years = all.select("order_year").distinct().count()
    assert(years > 3) // layout actually split
    val pruned = all.filter(col("order_year") === 1996)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(order_year"),
      s"partition filter must reach the scan:\n$scan")
    // pruned scan reads strictly fewer partitions than the full table
    assert(pruned.count() > 0 && pruned.count() < all.count())
  }

  test("joining two same-bucketed tables plans zero shuffle exchanges") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try {
      val o = Tables(spark, "/root/testdata/sf0.001", "orders")
      val l = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      Bucketing.writeBucketed(o, "orders_b", "o_orderkey", 8, Some("o_orderkey"))
      Bucketing.writeBucketed(l, "lineitem_b", "l_orderkey", 8, Some("l_orderkey"))
      val joined = Bucketing.readBucketed(spark, "orders_b")
        .join(Bucketing.readBucketed(spark, "lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
