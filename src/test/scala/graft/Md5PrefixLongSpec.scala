package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.Md5PrefixLong

/** The native md5-prefix decode must equal
  * conv(substring(md5(x), 1, n), 16, 10) — it feeds every MinHash
  * signature, so a nibble-order slip would silently re-bucket the
  * whole dedup family while staying plausible-looking. */
class Md5PrefixLongSpec extends GraftSuite {

  private def oracle(s: String, n: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, n), 16)
  }

  test("matches the hex/parse spelling for widths 1..15 on varied inputs") {
    val cases = Seq("", "a", "abc", "shingle九字", "the quick brown fox",
      "1234567890", "é", "🚀", "x" * 300) ++
      (0 until 200).map(i => s"doc $i body ${i * 37}")
    for (s <- cases; n <- Seq(1, 2, 7, 8, 13, 15)) {
      assert(Md5PrefixLong.eval(UTF8String.fromString(s), n) == oracle(s, n),
        s"mismatch at n=$n on '$s'")
    }
  }

  test("startHex window: second md5 word equals the substring spelling") {
    val cases = Seq("", "tok", "alpha beta", "🚀", "x" * 50)
    for (s <- cases; (start, n) <- Seq((9, 8), (17, 8), (25, 8), (2, 13), (18, 15))) {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val expected = java.lang.Long.parseLong(hex.substring(start - 1, start - 1 + n), 16)
      assert(Md5PrefixLong.eval(UTF8String.fromString(s), n, start) == expected,
        s"mismatch at start=$start n=$n on '$s'")
    }
  }

  test("hex_prefix_long decodes an existing hex column = conv(substring(...))") {
    import graft.plans.HexPrefixLong
    for (s <- Seq("deadbeef0123456789abcdefdeadbeef", "0000000000000001ffff", "ABCDEF1234567890"))
      for (n <- Seq(1, 8, 13, 15))
        assert(HexPrefixLong.eval(UTF8String.fromString(s), n) ==
          java.lang.Long.parseLong(s.substring(0, n), 16))
    // malformed or short input → null, never a silent value
    assert(HexPrefixLong.eval(UTF8String.fromString("xyz"), 2) == null)
    assert(HexPrefixLong.eval(UTF8String.fromString("ab"), 3) == null)
    // codegen path over a real frame: decode-of-k equals digest-of-preimage
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), md5(concat(lit("epoch7:"), col("doc_id").cast("string"))).as("k"))
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val viaK = ColumnBridge.column(HexPrefixLong(ColumnBridge.expression(col("k")), 13))
    val viaDigest = ColumnBridge.column(Md5PrefixLong(ColumnBridge.expression(
      concat(lit("epoch7:"), col("doc_id").cast("string"))), 13))
    val diff = docs.select(viaK.as("a"), viaDigest.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0L)
  }

  test("codegen path equals the composed spelling over corpus shingles") {
    import graft.functions.TextFns.normalizeText
    import graft.operators.MinHashDedup
    val docs = Tables(spark, "/root/testdata/sf0.01", "documents")
    val sh = MinHashDedup.shingleRows(docs, "doc_id", normalizeText(col("text")))
    val native = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      Md5PrefixLong(org.apache.spark.sql.graftbridge.ColumnBridge
        .expression(col("__sh")), 8))
    val diff = sh.select(
        native.as("fast"),
        conv(substring(md5(col("__sh")), 1, 8), 16, 10).cast("long").as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(diff == 0L, s"$diff shingle rows diverge")
  }
}
