package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.NormalizeText

/** The native canonicalizer must be EXACTLY
  * trim(regexp_replace(lower(s), "[^a-z0-9]+", " ")) — its output
  * feeds md5 fingerprints, shingles, and MinHash signatures, so one
  * divergent byte silently reshuffles dedup verdicts. Pinned three
  * ways: an EXHAUSTIVE per-code-point sweep (every Unicode scalar in a
  * token context, catching any casing-table mapping into ASCII beyond
  * the two handled ones), composed adversarial strings, and the whole
  * sf0.01 corpus through the codegen path. */
class NormalizeTextSpec extends GraftSuite {

  private def oracle(s: String): String =
    s.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim

  test("exhaustive code-point sweep: no third ASCII-landing case mapping") {
    var cp = 0
    val bad = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (cp <= 0x10FFFF) {
      if (Character.isDefined(cp) && (cp < 0xD800 || cp > 0xDFFF)) {
        val s = "a" + new String(Character.toChars(cp)) + "b"
        val got = NormalizeText.normalize(UTF8String.fromString(s)).toString
        if (got != oracle(s)) bad += cp
      }
      cp += 1
    }
    assert(bad.isEmpty,
      s"code points diverging from the regex spelling: ${bad.take(20).map(c => f"U+$c%04X")}")
  }

  test("adversarial compositions") {
    val cases = Seq(
      "", " ", "  ", "ABC", "ABC123", "Hello, World!", "--a--b--",
      " lead", "trail ", "aİb", "İ", "K", "aKb",
      "KK", "a İ K b", "é é", "ΣΣ ςς", "日本 語",
      "İ", "ﬁﬂ", "KKk", "🚀x🚀", "a" * 4000 + "!" + "B" * 4000)
    cases.foreach { s =>
      assert(NormalizeText.normalize(UTF8String.fromString(s)).toString == oracle(s),
        s"mismatch on ${s.take(30).map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("equals the regex pipeline over the whole sf0.01 corpus, codegen path") {
    val docs = Tables(spark, "/root/testdata/sf0.01", "documents")
    val diff = docs.select(
        graft.functions.TextFns.normalizeText(col("text")).as("fast"),
        trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(diff == 0L, s"$diff documents diverge from the regex spelling")
  }
}
