package graft

import java.io.File
import java.nio.file.Files

import graft.sources.Xlsx

class XlsxSpec extends GraftSuite {

  private def roundTrip(header: Seq[String], rows: Seq[Seq[Any]]): Vector[Vector[String]] = {
    val f = new File(Files.createTempDirectory("xlsx").toFile, "t.xlsx")
    Xlsx.write(header, rows, f)
    Xlsx.parseWorkbook(Files.readAllBytes(f.toPath))
  }

  test("writer → parser round-trip with mixed types") {
    val got = roundTrip(
      Seq("id", "name", "bal"),
      Seq(Seq(1L, "alice", 10.5), Seq(2L, "bob & <carol>", -3.25), Seq(3L, null, 0)))
    assert(got(0) == Vector("id", "name", "bal"))
    assert(got(1) == Vector("1", "alice", "10.5"))
    assert(got(2) == Vector("2", "bob & <carol>", "-3.25"))
    assert(got(3) == Vector("3", null, "0"))
  }

  test("shared strings are interned once and resolved by index") {
    val got = roundTrip(Seq("a", "b"),
      Seq(Seq("x", "x"), Seq("x", "y")))
    assert(got.drop(1) == Vector(Vector("x", "x"), Vector("x", "y")))
  }

  test("read() exposes header-named string columns via binaryFiles") {
    val dir = Files.createTempDirectory("xlsxr").toFile
    Xlsx.write(Seq("k", "v"), Seq(Seq(1, "one"), Seq(2, "two")),
      new File(dir, "a.xlsx"))
    val df = Xlsx.read(spark, dir.getAbsolutePath + "/*.xlsx")
    assert(df.columns.toSeq == Seq("k", "v"))
    val rows = df.orderBy("k").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("1", "one"), ("2", "two")))
  }

  test("multiple workbooks union; each file's header row is skipped") {
    val dir = Files.createTempDirectory("xlsxm").toFile
    Xlsx.write(Seq("k", "v"), Seq(Seq(1, "a")), new File(dir, "p1.xlsx"))
    Xlsx.write(Seq("k", "v"), Seq(Seq(2, "b"), Seq(3, "c")), new File(dir, "p2.xlsx"))
    val df = Xlsx.read(spark, dir.getAbsolutePath + "/*.xlsx")
    assert(df.count() == 3)
    assert(df.orderBy("k").collect().map(_.getString(1)).toSeq == Seq("a", "b", "c"))
  }

  test("sparse rows pad missing cells with null") {
    // Hand-built sheet with a gap: cell B skipped via explicit C-column ref.
    val f = new File(Files.createTempDirectory("xlsxs").toFile, "t.xlsx")
    Xlsx.write(Seq("a", "b", "c"), Seq(Seq("x", null, "z")), f)
    val got = Xlsx.parseWorkbook(Files.readAllBytes(f.toPath))
    assert(got(1) == Vector("x", null, "z"))
  }

  test("DataSource V2: short-name resolution, inferred schema, multi-file read") {
    val dir = Files.createTempDirectory("xlsxv2").toFile
    Xlsx.write(Seq("k", "v", "w"), Seq(Seq(1, "a", 10.5)), new File(dir, "p1.xlsx"))
    Xlsx.write(Seq("k", "v", "w"), Seq(Seq(2, "b", 20.5), Seq(3, "c", 30.5)),
      new File(dir, "p2.xlsx"))
    val df = spark.read.format("graft-xlsx").load(dir.getAbsolutePath)
    assert(df.columns.toSeq == Seq("k", "v", "w")) // inferred from first header
    val rows = df.orderBy("k").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(rows == Seq(("1", "a", "10.5"), ("2", "b", "20.5"), ("3", "c", "30.5")))
    // scheduling: one InputPartition per workbook
    assert(df.rdd.getNumPartitions == 2)
  }

  test("DataSource V2: column pruning reaches the BatchScan ReadSchema") {
    val dir = Files.createTempDirectory("xlsxv2p").toFile
    Xlsx.write(Seq("k", "v", "w"), Seq(Seq(1, "a", 2.0)), new File(dir, "x.xlsx"))
    val narrow = spark.read.format("graft-xlsx").load(dir.getAbsolutePath)
      .select("w", "k")
    val scan = narrow.queryExecution.executedPlan.collectLeaves().head.toString
    // Catalyst normalizes the pruned schema to declaration order (k,w);
    // the load-bearing fact is that 'v' is ABSENT from the scan.
    assert(scan.contains("pruned to k,w"), s"pruning must reach the scan:\n$scan")
    assert(!scan.contains("v#"), s"unprojected column must not be read:\n$scan")
    assert(narrow.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("2.0", "1")))
  }

  test("DataSource V2: pushed string-equality filter skips rows in the reader") {
    val dir = Files.createTempDirectory("xlsxv2f").toFile
    Xlsx.write(Seq("k", "seg"), Seq(Seq(1, "A"), Seq(2, "B"), Seq(3, "A")),
      new File(dir, "x.xlsx"))
    val df = spark.read.format("graft-xlsx").load(dir.getAbsolutePath)
      .filter(org.apache.spark.sql.functions.col("seg") === "A")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("pushed [") && scan.contains("EqualTo(seg,A)"),
      s"filter must reach the scan:\n$scan")
    // Spark's residual filter stays above the scan (reader skipping is
    // an optimization, not the correctness gate) and results agree
    assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("1", "3"))
  }

  test("DataSource V2: reported statistics let the planner auto-broadcast the dim") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("xlsxv2s").toFile
    Xlsx.write(Seq("k", "seg"), (1 to 50).map(i => Seq(i, "s" + i % 3)),
      new File(dir, "d.xlsx"))
    val dim = spark.read.format("graft-xlsx").load(dir.getAbsolutePath)
    val fact = spark.range(0, 10000).select((col("id") % 50 + 1).cast("string").as("k"))
    // no broadcast() hint anywhere — the V2 scan's sizeInBytes (a few KB,
    // far under the 10 MB threshold) must be enough for Catalyst to pick
    // BroadcastHashJoin on its own
    val joined = fact.join(dim, "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"planner should auto-broadcast the small V2 dim:\n${plan.take(2000)}")
    assert(joined.count() == 10000L)
  }

  test("DataSource V2: write path round-trips through real workbooks") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("xlsxv2w").toFile.getAbsolutePath + "/out"
    val df = spark.range(0, 100)
      .select(col("id"), concat(lit("n"), col("id")).as("name"),
        (col("id").cast("double") / 4.0).as("score"))
      .repartition(3)
    df.write.format("graft-xlsx").mode("overwrite").save(dir)
    val files = new File(dir).listFiles().filter(_.getName.endsWith(".xlsx"))
    assert(files.length == 3, s"one workbook per partition: ${files.toSeq}")
    val back = spark.read.format("graft-xlsx").load(dir)
    assert(back.columns.toSeq == Seq("id", "name", "score"))
    assert(back.count() == 100)
    val r7 = back.filter(col("id") === "7").collect().head
    assert(r7.getString(1) == "n7" && r7.getString(2) == "1.75")
    // overwrite truncates: second write must not accumulate files
    df.limit(10).repartition(1).write.format("graft-xlsx").mode("overwrite").save(dir)
    assert(spark.read.format("graft-xlsx").load(dir).count() == 10)
    // the staged-commit protocol must leave no staging dir behind
    val siblings = new File(dir).getParentFile.listFiles().map(_.getName).toSeq
    assert(!siblings.exists(_.contains("staging")), s"staging residue: $siblings")
  }

  test("DataSource V2: failed overwrite job leaves the old output intact") {
    import org.apache.spark.sql.functions._
    // Job-level atomicity: tasks stage into a sibling directory and the
    // truncate + publish happen only at BatchWrite.commit, so a job
    // that dies mid-write must neither destroy existing data nor leak
    // committed-task part files into the readable directory.
    val dir = Files.createTempDirectory("xlsxv2atomic").toFile.getAbsolutePath + "/out"
    spark.range(0, 5).select(col("id"))
      .write.format("graft-xlsx").mode("overwrite").save(dir)
    val before = spark.read.format("graft-xlsx").load(dir)
      .collect().map(_.getString(0)).sorted.toSeq
    val poison = spark.range(0, 10)
      .select(when(col("id") === 7, raise_error(lit("boom")))
        .otherwise(col("id").cast("string")).as("id"))
      .repartition(2)
    intercept[Exception] {
      poison.write.format("graft-xlsx").mode("overwrite").save(dir)
    }
    val after = spark.read.format("graft-xlsx").load(dir)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(after == before, s"failed job corrupted output: $after != $before")
    val siblings = new File(dir).getParentFile.listFiles().map(_.getName).toSeq
    assert(!siblings.exists(_.contains("staging")), s"staging residue: $siblings")
  }

  test("DataSource V2: pushed filter on an unknown attribute is a no-op, not drop-all") {
    // Pushdown is optimization-only; a lookup miss must degrade to
    // constant-true — rows the reader drops can never be restored by
    // Spark's residual filter.
    import graft.sources.v2.{HadoopConfs, XlsxInputPartition, XlsxReaderFactory}
    val dir = Files.createTempDirectory("xlsxv2ghost").toFile
    val f = new File(dir, "x.xlsx")
    Xlsx.write(Seq("k"), Seq(Seq(1), Seq(2)), f)
    val rf = XlsxReaderFactory(Array("k"), Array("k"),
      Array(org.apache.spark.sql.sources.EqualTo("ghost", "v"),
        org.apache.spark.sql.sources.IsNotNull("ghost")),
      new HadoopConfs.SerConf(spark.sessionState.newHadoopConf()))
    val r = rf.createReader(XlsxInputPartition(f.getAbsolutePath))
    var n = 0
    while (r.next()) n += 1
    assert(n == 2, s"unknown-attribute filter must not drop rows (got $n of 2)")
  }

  test("mg_summary rejects a non-literal k with a named analysis error") {
    // pre-fix this surfaced as an opaque NPE/ClassCastException from
    // eval() on the unfoldable expression; now the builder raises an
    // AnalysisException naming the function (Spark may re-wrap it)
    graft.functions.SketchFns.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT mg_summary(id, id) FROM range(5)").collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("mg_summary") && msgs.contains("foldable"),
      s"error must name the function and the contract: $msgs")
  }
}
