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
