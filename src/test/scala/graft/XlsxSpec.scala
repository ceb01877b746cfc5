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
}
