package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Salted}
import graft.operators.Multimodal.MediaRow

/** Round-4 additions: real ImageIO pixel decode and the Salted
  * contract hardening (deterministic salt, join-type guard).
  */
class MultimodalSpec extends GraftSuite {

  test("encodeGrayPng -> decodeImage round trip recovers exact dimensions and pixels") {
    import spark.implicits._
    val media = spark.range(0, 16).as[Long].map { id =>
      val w = (1 + id % 5).toInt
      val h = (1 + (id * 3) % 5).toInt
      MediaRow(id, "img", Multimodal.encodeGrayPng(w, h,
        (x, y) => ((id * 31 + 7 * x + 13 * y) % 256).toInt))
    }
    val out = Multimodal.decodeImage(media).collect().sortBy(_.id)
    assert(out.length == 16)
    out.foreach { d =>
      val w = 1 + d.id % 5
      val h = 1 + (d.id * 3) % 5
      assert(d.format == "png")
      assert(d.width == w && d.height == h)
      val expected = (for (y <- 0L until h; x <- 0L until w)
        yield (d.id * 31 + 7 * x + 13 * y) % 256).sum
      assert(d.pix_sum == expected, s"pixel sum mismatch for id ${d.id}")
    }
  }

  test("decodeImage drops payloads no JDK codec can read") {
    import spark.implicits._
    val junk = spark.createDataset(Seq(
      MediaRow(1L, "x", Array[Byte](1, 2, 3)),
      MediaRow(2L, "x", Multimodal.encodeGrayPng(2, 2, (_, _) => 7))))
    val out = Multimodal.decodeImage(junk).collect()
    assert(out.map(_.id).toSeq == Seq(2L))
    assert(out.head.pix_sum == 4 * 7)
  }

  test("Salted.join rejects join types that would duplicate unmatched small-side rows") {
    import spark.implicits._
    val big = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val small = Seq((1, "x"), (3, "y")).toDF("k", "w")
    intercept[IllegalArgumentException] {
      Salted.join(big, small, Seq("k"), buckets = 4, joinType = "right_outer")
    }
    intercept[IllegalArgumentException] {
      Salted.join(big, small, Seq("k"), buckets = 4, joinType = "full_outer")
    }
    // semi/anti stay semantics-preserving under salting
    val semi = Salted.join(big, small, Seq("k"), buckets = 4, joinType = "left_semi")
    assert(semi.collect().map(_.getInt(0)).toSeq == Seq(1))
    val anti = Salted.join(big, small, Seq("k"), buckets = 4, joinType = "left_anti")
    assert(anti.collect().map(_.getInt(0)).toSeq == Seq(2))
  }

  test("salt is a pure function of row content (stable across recomputation)") {
    import spark.implicits._
    val df = spark.range(0, 1000).select(col("id"), (col("id") % 7).as("k"))
    val a = Salted.sumCount(df, Seq("k"), Seq("s" -> col("id")))
      .orderBy("k").collect()
    val b = Salted.sumCount(df, Seq("k"), Seq("s" -> col("id")))
      .orderBy("k").collect()
    assert(a.toSeq == b.toSeq)
    val plain = df.groupBy("k").agg(sum("id").as("s"), count(lit(1)).as("n"))
      .orderBy("k").collect()
    assert(a.toSeq == plain.toSeq)
  }
}
