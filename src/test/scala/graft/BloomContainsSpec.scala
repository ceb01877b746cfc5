package graft

import org.apache.spark.sql.functions._

import graft.functions.SketchFns

class BloomContainsSpec extends GraftSuite {

  test("bloom_contains: no false negatives, fpp-bounded false positives, null propagation") {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.01)
    (0 until 500).foreach(i => bf.putString(s"member-$i"))
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val filterLit = lit(bos.toByteArray)

    import spark.implicits._
    val members = (0 until 500).map(i => s"member-$i").toDF("k")
    val absent = (0 until 2000).map(i => s"absent-$i").toDF("k")

    // Bloom contract half 1: every inserted key answers true — a false
    // negative would let contamination through the gate undetected.
    assert(members.filter(SketchFns.bloomContains(filterLit, col("k"))).count() === 500)

    // Half 2: false ⇒ definitely absent; positives on the absent set
    // stay within ~3× the configured 1% fpp (slack for small-n noise).
    val fp = absent.filter(SketchFns.bloomContains(filterLit, col("k"))).count()
    assert(fp <= 60, s"false-positive count $fp exceeds 3% of 2000 probes")

    // BinaryExpression null contract.
    val n = members.limit(1)
      .select(SketchFns.bloomContains(filterLit, lit(null).cast("string")).as("r"))
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("bloom_contains probes bit-identically to the putString build path") {
    // The expression probes UTF-8 bytes directly (no String per row);
    // putString inserts the same bytes — multi-byte code points must
    // round-trip. A drift here would silently zero the gate's recall.
    val keys = Seq("käse", "日本語", "emoji-🙂", "plain")
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    keys.foreach(bf.putString)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    import spark.implicits._
    val hit = keys.toDF("k")
      .filter(SketchFns.bloomContains(lit(bos.toByteArray), col("k"))).count()
    assert(hit === keys.size.toLong)
  }
}
