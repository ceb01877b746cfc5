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

  test("runtime bloom filter injected on the fact side of a selective shuffle join") {
    // The Spark-native semi-join reduction: a selective dim-side filter
    // spawns a bloom-filter subquery that prunes fact rows BEFORE the
    // join shuffle — at 100 TB that's the difference between shuffling
    // the whole fact table and shuffling the ~matching slice.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    try {
      // Raw scans, not Tables(): the small-file Repartition guard sits
      // between filter and scan and defeats InjectRuntimeFilter's
      // selective-filter-over-scan pattern. At real scale there is no
      // such guard node and injection applies as here.
      val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      val j = l.join(o, col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"runtime bloom filter must be injected:\n$plan")
      assert(j.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
    }
  }

  test("range-sorted parquet layout yields pairwise-disjoint file ranges") {
    import graft.sinks.RangeSortedParquet
    val dir = java.nio.file.Files.createTempDirectory("graft_range").toString + "/orders"
    val o = Tables(spark, "/root/testdata/sf0.001", "orders")
    RangeSortedParquet.write(o, dir, col("o_orderkey"), nFiles = 8)
    val ranges = RangeSortedParquet.fileRanges(spark, dir, "o_orderkey")
      .orderBy("lo").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(ranges.length == 8, s"expected 8 files, got ${ranges.length}")
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"file ranges overlap: hi=$hi1 vs next lo=$lo2")
      case _ =>
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true in final plan)") {
    // One hot key dominates the build of a shuffled join; with the skew
    // thresholds lowered to test scale, AQE's runtime re-plan must mark
    // and split the skewed partition — the automatic complement to the
    // manual salting path (`Salted`).
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      val hot = (1 to 200000).map(i => (1L, s"payload_$i")) ++
        (1 to 50).map(i => (i.toLong + 1, s"p$i"))
      val left = hot.toDF("k", "v").repartition(8)
      val right = (1 to 60).map(i => (i.toLong, i * 10)).toDF("k", "w").repartition(8)
      val j = left.join(right, "k")
      // Execute j's OWN QueryExecution (count() would plan a separate
      // tree and leave this one un-finalized by AQE).
      assert(j.collect().length > 0)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must mark the skewed join side:\n${plan.take(4000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q_skew_join's registered plan gets skew-split by AQE on testdata skew") {
    // Same property as the synthetic test above, but on the REGISTERED
    // query over real testdata with its planted celebrity key — the
    // plan the correctness gate grades is the one AQE splits. Contrast:
    // q_salted_join solves the identical hot-key join manually.
    import graft.queries.ScaleQueries
    val confs = ScaleQueries.skewJoinConfs
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val plan = ScaleQueries.skewJoinPlan(spark, "/root/testdata/sf0.01")
      assert(plan.collect().length === 25)
      val s = plan.queryExecution.executedPlan.toString
      assert(s.contains("skew=true"),
        s"AQE must split q_skew_join's hot partitions:\n${s.take(4000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    import graft.sinks.PartitionedParquet
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString + "/orders"
    val o = Tables(spark, "/root/testdata/sf0.001", "orders")
    PartitionedParquet.writePartitioned(o, dir, "order_year", year(col("o_orderdate")))
    val fact = PartitionedParquet.read(spark, dir)
    // The dim filter must hit a NON-join column, or Catalyst constant-
    // folds it into a static partition filter (good, but not DPP): a
    // label column only a scan can resolve forces the runtime subquery.
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dpp_dim").toString + "/years"
    spark.range(1992, 1999).select(col("id").cast("int").as("dim_year"))
      .withColumn("label", concat(lit("y"), col("dim_year")))
      .write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("label") === "y1996")
    val j = fact.join(dim, fact("order_year") === dim("dim_year"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"fact scan must carry a runtime pruning subquery:\n$plan")
    assert(j.count() > 0)
  }

  test("compaction rewrites many small files into byte-sized targets, content intact") {
    import graft.sinks.Compaction
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/orders"
    val o = Tables(spark, "/root/testdata/sf0.001", "orders")
    o.repartition(40).write.parquet(dir) // simulate incremental-writer debris
    val before = Compaction.stats(spark, dir)
    assert(before._1 == 40)
    val sumBefore = spark.read.parquet(dir)
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))).head().getLong(0)
    val (b, a) = Compaction.compact(spark, dir, targetBytes = before._2 / 4)
    assert(b == 40 && a <= 5 && a >= 4, s"expected ~4 files, got $a")
    val sumAfter = spark.read.parquet(dir)
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))).head().getLong(0)
    assert(sumAfter == sumBefore)
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

  test("q_bucketed_join's registered plan joins bucket-to-bucket with zero exchanges") {
    import graft.queries.ScaleQueries
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try {
      val plan = ScaleQueries.bucketedJoinPlan(spark, "/root/testdata/sf0.001")
      val s = plan.queryExecution.executedPlan.toString
      // the rollup above the join may exchange on o_orderpriority; the
      // JOIN KEYS must never be re-shuffled — that's what bucketing buys
      assert(!s.contains("Exchange hashpartitioning(o_orderkey") &&
        !s.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join must not shuffle either side on the join key:\n${s.take(3000)}")
      assert(plan.collect().nonEmpty)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("salted equi-join equals the plain join exactly") {
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select(col("l_suppkey").as("suppkey"), col("l_orderkey"), col("l_linenumber"))
    val sup = Tables(spark, "/root/testdata/sf0.001", "supplier")
      .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
    val salted = Salted.join(li, sup, Seq("suppkey"), buckets = 8)
      .select("suppkey", "l_orderkey", "l_linenumber", "s_nationkey")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val plain = li.join(sup, "suppkey")
      .select("suppkey", "l_orderkey", "l_linenumber", "s_nationkey")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(salted == plain && salted.nonEmpty)
  }

  test("z-ordered layout localizes BOTH dimensions' per-file ranges") {
    // Sorting by x alone makes every file span y's full range; the
    // Morton curve must shrink the average per-file span of BOTH
    // columns well below the global span.
    import graft.sinks.{RangeSortedParquet, ZOrderedParquet}
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString + "/li"
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select((col("l_partkey") % 1024).as("xb"),
        (col("l_suppkey") % 1024).as("yb"), col("l_quantity"))
    ZOrderedParquet.write(li, dir, "xb", "yb", nFiles = 16, bits = 10)
    def avgSpanFrac(key: String): Double = {
      val r = RangeSortedParquet.fileRanges(spark, dir, key)
        .agg(avg(col("hi") - col("lo")).as("s")).head().getDouble(0)
      r / 1023.0
    }
    val (fx, fy) = (avgSpanFrac("xb"), avgSpanFrac("yb"))
    assert(fx < 0.6 && fy < 0.6,
      s"z-order should localize both dims: x span frac=$fx, y span frac=$fy")
  }

  test("q5_star_join broadcasts only the bounded dims when stats rule out the rest") {
    // Simulate 100 TB statistics: nothing fits under the broadcast
    // threshold. The hinted region/nation must still broadcast (hints
    // are binding — and those two are bounded at 5/25 rows by the data
    // model at every SF), while the SF-scaled customer/supplier joins
    // must fall back to a shuffle strategy. A hand-baked broadcast hint
    // on customer/supplier would pin them as BroadcastHashJoin here and
    // OOM the driver at scale.
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "-1"))
    try {
      val df = graft.queries.RelQueries7.q5StarJoin(spark, "/root/testdata/sf0.001")
      assert(df.collect().nonEmpty)
      val plan = df.queryExecution.executedPlan.toString
      val bhj = plan.linesIterator.filter(_.contains("BroadcastHashJoin")).toSeq
      assert(bhj.nonEmpty, s"region/nation hints must still broadcast:\n${plan.take(4000)}")
      assert(bhj.forall(l => !l.contains("c_custkey") && !l.contains("s_suppkey")),
        s"customer/supplier must NOT be broadcast when stats exceed the threshold:\n${bhj.mkString("\n")}")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"fact-side joins must pick a shuffle strategy at scale:\n${plan.take(4000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the probe side of a selective shuffled join") {
    // Catalyst's InjectRuntimeFilter: a selective predicate on the
    // build side of a shuffled join gets turned into a bloom filter
    // that prunes the probe side BEFORE the shuffle — the zero-code
    // scan-reduction a 100 TB fact⋈filtered-dim join leans on when the
    // dim is too big to broadcast. Thresholds are floored to fire at
    // test scale (production defaults gate on a 10 GB probe scan).
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // Raw scans, not Tables(): the small-scan compaction repartition
      // Tables inserts breaks InjectRuntimeFilter's filter-over-scan
      // pattern match on the creation side (at production scale the
      // guard doesn't fire, so raw is the representative shape here).
      val sf = "/root/testdata/sf0.001"
      val dim = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val j = spark.read.parquet(s"$sf/lineitem.parquet")
        .join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy().agg(count(lit(1)).as("n"))
      assert(j.collect().head.getLong(0) > 0)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter"),
        s"probe side must carry the injected bloom-filter predicate:\n${plan.take(4000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("pagerank: exact integer ranks on a known graph, sinks rank highest") {
    import graft.operators.PageRank
    // Star into node 0 plus a 2-cycle; node 0 must out-rank everything,
    // and reruns must be bit-identical (exact integer arithmetic).
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L), (1L, 2L))
      .toDF("src", "dst")
    val r1 = PageRank.ranks(edges, iters = 3).orderBy(col("rank").desc, col("id"))
      .as[(Long, Long)].collect().toSeq
    val r2 = PageRank.ranks(edges, iters = 3).orderBy(col("rank").desc, col("id"))
      .as[(Long, Long)].collect().toSeq
    assert(r1 == r2, "integer pagerank must be rerun-identical")
    assert(r1.head._1 == 0L, s"hub node should rank first, got ${r1.head}")
    assert(r1.map(_._2).sum <= 1000000000000L, "mass can only leak, never grow")
  }
}
