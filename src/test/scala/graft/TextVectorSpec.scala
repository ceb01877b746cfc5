package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns._
import graft.functions.VectorFns._
import graft.operators.{MinHashDedup, Multimodal, SimHash}

class TextVectorSpec extends GraftSuite {
  import spark.implicits._

  test("tokens: blank → empty array, not ['']") {
    val r = Seq("", "  ", "a b  c").toDF("x")
      .select(tokenCount($"x")).as[Int].collect()
    assert(r.toSeq == Seq(0, 0, 3))
  }

  test("langId: picks dominant stopword language; CJK wins; und on no evidence") {
    val r = Seq(
      "the cat and the dog is in that house for it was",
      "der hund und die katze ist nicht mit ein zu den",
      "le chat et la maison les des est une que dans pour",
      "日本語ではない中文のテキスト",
      "zzz qqq xxx").toDF("x").select(langId($"x")).as[String].collect()
    assert(r.toSeq == Seq("en", "de", "fr", "zh", "und"))
  }

  test("fingerprint: normalization collapses case/punct/whitespace") {
    val r = Seq("Hello,  World!", "hello world", "HELLO-WORLD").toDF("x")
      .select(fingerprint($"x")).as[String].collect()
    assert(r.distinct.length == 1)
  }

  test("cosine: identical → 1, orthogonal → 0, zero-norm guarded") {
    val df = Seq(
      (Array(1.0, 0.0), Array(1.0, 0.0)),
      (Array(1.0, 0.0), Array(0.0, 1.0)),
      (Array(0.0, 0.0), Array(1.0, 1.0))).toDF("a", "b")
    val r = df.select(cosine($"a", $"b")).as[Double].collect()
    assert(math.abs(r(0) - 1.0) < 1e-12 && r(1) == 0.0 && r(2) == 0.0)
  }

  test("signBucket: bit i set iff v[i] > 0") {
    val r = Seq(Array(1.0, -1.0, 2.0, 0.0)).toDF("v")
      .select(signBucket($"v", 4)).as[Int].head()
    assert(r == (1 | 4))
  }

  test("minhash near-dup finds identical and near-identical docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content about spark query engines at scale"),
      (4L, "the quick brown fox jumps over the lazy dog again and AGAIN!"))
      .toDF("doc_id", "text")
    val pairs = MinHashDedup.nearDuplicates(docs, "doc_id",
        normalizeText($"text"), threshold = 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L))) // normalization eats case+punct
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical token sets share fingerprints") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "totally unrelated words here")).toDF("doc_id", "text")
    val sim = SimHash.withSimhash(docs, "doc_id", split($"text", " "))
      .orderBy("doc_id").select("simhash").as[Long].collect()
    assert(sim(0) == sim(1) && sim(0) != sim(2))
  }

  test("hammingPairs wide-bucket recursion is exact vs brute force") {
    // Force the wide path: 600 simhashes sharing block 0 (low bits),
    // differing only in the upper bits — the (blk=0, bval) bucket is
    // 600 wide, far over maxBucket=8, so its pairs MUST come from the
    // sub-block pigeonhole join. Mix in a narrow-path clique too.
    val rnd = new scala.util.Random(7)
    val wideGroup = (0 until 600).map { i =>
      // block 0 = bits [0,10) fixed to 0x155; upper 22 bits random but
      // with planted neighbors every 50th element (flip one high bit)
      val base = (rnd.nextInt(1 << 22).toLong << 10) | 0x155L
      val sh = if (i % 50 == 3) ((i - 1).toLong, base) else (i.toLong, base)
      sh
    }
    // planted: element i copies i-1's simhash with one high bit flipped
    val rows = wideGroup.zipWithIndex.map { case ((_, sh), i) =>
      if (i % 50 == 3) (i.toLong, wideGroup(i - 1)._2 ^ (1L << 31))
      else (i.toLong, sh)
    } ++ Seq((1000L, 0x2AAL), (1001L, 0x2AAL), (1002L, 0x2AAL ^ (1L << 15)))
    val df = rows.toDF("doc_id", "simhash")
    val gotRows = SimHash.hammingPairs(df, "doc_id", nBits = 32, maxDist = 2,
        maxBucket = 8)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect().toSeq
    val got = gotRows.toSet
    // first-agreeing-block exclusivity: every pair exactly once, no
    // dedup shuffle needed
    assert(gotRows.length == got.size,
      s"duplicate emissions: ${gotRows.groupBy(identity).filter(_._2.length > 1).keys}")
    val brute = (for {
      (a, sa) <- rows; (b, sb) <- rows if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 2
    } yield (a, b, h)).toSet
    assert(got == brute,
      s"wide-path mismatch: missing=${brute -- got} extra=${got -- brute}")
    // sanity: the wide path really engaged (bucket width 600 > 8)
    assert(brute.nonEmpty)
  }

  test("hammingPairs non-recursable config falls back instead of aborting (r13 ADVICE)") {
    // maxDist=0 → one full-width block, zero remaining bits: the old
    // unconditional `require` aborted ANY corpus over 64*maxBucket even
    // with no wide bucket. 600 distinct + one 20-replica simhash, with
    // maxBucket=8: corpus is over the gate AND a bucket is wide AND the
    // config cannot recurse — must fall back to the plain self-join.
    val rnd = new scala.util.Random(11)
    val distinct = (0 until 600).map(i => (i.toLong, rnd.nextLong() & 0xFFFFFFFFL))
    val replicas = (0 until 20).map(i => (1000L + i, 0x12345678L))
    val df = (distinct ++ replicas).toDF("doc_id", "simhash")
    val got = SimHash.hammingPairs(df, "doc_id", nBits = 32, maxDist = 0,
        maxBucket = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val brute = (for {
      (a, sa) <- distinct ++ replicas; (b, sb) <- distinct ++ replicas
      if a < b && sa == sb
    } yield (a, b)).toSet
    assert(got == brute && brute.size >= 190)
  }

  test("hammingPairs 64-bit wide-bucket recursion exact vs brute force (sign bit set)") {
    // 64-bit fingerprints with bit 63 set: negative longs through every
    // mask/shift (blockKeys, rvOf's packed remainder, sVal) — the
    // arithmetic-shift sign-extension and the 64-width mask paths.
    val rnd = new scala.util.Random(13)
    val rows = (0 until 700).map { i =>
      // block 0 = bits [0,21) fixed; upper bits random; sign bit forced
      val base = (rnd.nextLong() << 21) | 0x155555L | Long.MinValue
      if (i % 50 == 3) (i.toLong, ((rnd.nextLong() << 21) | 0x155555L | Long.MinValue) ^ (1L << 62))
      else (i.toLong, base)
    }
    // add planted neighbors: every 50th copies predecessor with a high flip
    val planted = rows.zipWithIndex.map { case ((id, sh), i) =>
      if (i % 50 == 7) (id, rows(i - 1)._2 ^ (1L << 63))
      else (id, sh)
    }
    val df = planted.toDF("doc_id", "simhash")
    val gotRows = SimHash.hammingPairs(df, "doc_id", nBits = 64, maxDist = 2,
        maxBucket = 8)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSeq
    assert(gotRows.length == gotRows.toSet.size, "duplicate emissions")
    val brute = (for {
      (a, sa) <- planted; (b, sb) <- planted if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 2
    } yield (a, b, h)).toSet
    assert(gotRows.toSet == brute,
      s"64-bit mismatch: missing=${brute -- gotRows.toSet} extra=${gotRows.toSet -- brute}")
    assert(brute.nonEmpty)
  }

  test("withSimhash 64-bit: bit 63 populated, 32-bit prefix matches the 32-bit fingerprint") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "epsilon zeta eta theta iota kappa")).toDF("doc_id", "text")
    val s64 = SimHash.withSimhash(docs, "doc_id", split($"text", " "), nBits = 64)
      .orderBy("doc_id").select("simhash").as[Long].collect()
    val s32 = SimHash.withSimhash(docs, "doc_id", split($"text", " "), nBits = 32)
      .orderBy("doc_id").select("simhash").as[Long].collect()
    assert(s64(0) == s64(1) && s64(0) != s64(2))
    // low 32 bits vote from the same first md5 word → equal prefixes
    assert(s64.zip(s32).forall { case (a, b) => (a & 0xFFFFFFFFL) == b })
    // some doc must use the upper word (probability of all-zero upper
    // words across 3 docs is ~2^-96 under the vote model)
    assert(s64.exists(v => (v >>> 32) != 0))
  }

  test("hammingClusters equals the closure of the verified star graph") {
    // replica clusters + a planted 1-bit neighbor + isolated docs
    val rows = Seq(
      (1L, 100L), (2L, 100L), (3L, 100L),        // replica cluster
      (4L, 100L ^ 2L),                            // 1 bit from the reps
      (10L, 0x0F0F0F0FL), (11L, 0x0F0F0F0FL),     // second cluster
      (20L, 0x7777000AL))                         // singleton
    val df = rows.toDF("doc_id", "simhash")
    val got = SimHash.hammingClusters(df, "doc_id", nBits = 32, maxDist = 2)
      .select("doc_id", "component", "cluster_size")
      .as[(Long, Long, Long)].collect().toSet
    // brute star graph: per (blk, bval) bucket, edges member→min id with
    // popcount ≤ 2; closure via union-find
    val nBlocks = 3
    val buckets = (for {
      (id, sh) <- rows; b <- 0 until nBlocks
      lo = b * 32 / nBlocks; hi = (b + 1) * 32 / nBlocks
    } yield ((b, (sh >> lo) & ((1L << (hi - lo)) - 1)), (id, sh)))
      .groupBy(_._1).values
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElse(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    def unite(a: Long, b: Long): Unit = { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    for (bucket <- buckets) {
      val members = bucket.map(_._2)
      val rep = members.minBy(_._1)
      for ((id, sh) <- members if id != rep._1 &&
             java.lang.Long.bitCount(sh ^ rep._2) <= 2) unite(id, rep._1)
    }
    val nodes = parent.keySet ++ parent.values
    val comps = nodes.groupBy(find)
    val expected = (for ((root, members) <- comps; m <- members)
      yield (m, root, members.size.toLong)).toSet
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
    assert(got.exists(_._3 >= 4L)) // 1..4 connect through the rep hub
    assert(!got.exists(_._1 == 20L)) // singleton absent
  }

  test("multimodal decode stub: deterministic meta from payload bytes") {
    val df = Seq((7L, "g", "abcd")).toDF("doc_id", "source", "text")
    val meta = Multimodal.decode(
      Multimodal.asMedia(spark, df, "doc_id", "source", "text")).collect()
    assert(meta.head == Multimodal.MediaMeta(7L, "g", 4L, 4L, 28L, 4L))
  }

  test("multimodal resize/frame-sample/feature plumbing over partitions") {
    val df = Seq((1L, "g", "x" * 1000)).toDF("doc_id", "source", "text")
    val media = Multimodal.asMedia(spark, df, "doc_id", "source", "text")
    // decode: n=1000 → width 360, height 280, frames 8
    val resized = Multimodal.resize(media, maxW = 180, maxH = 300).collect().head
    assert(resized.width == 180 && resized.height == 140) // 0.5 scale
    assert(resized.payload.length == 500)
    val frames = Multimodal.sampleFrames(media, everyNth = 2).collect()
    assert(frames.length == 4 && frames.map(_.frameIdx).toSeq == Seq(0L, 2L, 4L, 6L))
    assert(frames.forall(_.size == 125))
    val feats = Multimodal.extractFeatures(media).collect().head
    assert(feats.histogram.sum == 1000)
    assert(feats.histogram(('x' & 0xff) >> 4) == 1000)
  }

  test("media header parsing: real byte offsets, JPEG marker walk, quarantine") {
    def hex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // PNG 640×480: signature + IHDR length/type + BE dims
    val png = hex("89504E470D0A1A0A0000000D49484452" + "00000280" + "000001E0")
    assert(Multimodal.parseDims(png).contains(("png", 640L, 480L)))
    // BMP 320×200: 'BM' + 16 filler bytes + LE dims
    val bmp = hex("424D" + "00" * 16 + "40010000" + "C8000000")
    assert(Multimodal.parseDims(bmp).contains(("bmp", 320L, 200L)))
    // JPEG 100×50 with a DQT table segment BEFORE the SOF: the marker
    // walk must skip it by its length, not assume SOF comes first
    val jpg = hex("FFD8" + "FFDB0004" + "0000" + "FFC0001108" + "0032" + "0064" + "00")
    assert(Multimodal.parseDims(jpg).contains(("jpeg", 100L, 50L)))
    // unknown payload → None (quarantine path)
    assert(Multimodal.parseDims("not an image".getBytes).isEmpty)
    assert(Multimodal.parseDims(Array[Byte]()).isEmpty)
  }

  test("semdedup: near-identical cluster-mates marked, min id survives") {
    import graft.operators.SemDeDup
    // Two tight bundles on orthogonal axes plus one singleton: any
    // clustering puts bundle-mates in the same cluster, and within a
    // bundle cosine ≈ 1 ≥ threshold.
    val vecs = Seq(
      (1L, Array(1.0, 0.01, 0.0)), (2L, Array(1.0, 0.02, 0.0)),
      (3L, Array(1.0, 0.0, 0.03)),
      (10L, Array(0.0, 1.0, 0.01)), (11L, Array(0.01, 1.0, 0.0)),
      (20L, Array(0.5, -0.5, 0.7))).toDF("vec_id", "e")
    val clustered = vecs.withColumn("cid",
      when($"vec_id" < 10, 0).when($"vec_id" < 20, 1).otherwise(2))
    val r = SemDeDup.markDuplicates(clustered, "vec_id", "e", 0.9)
      .select("vec_id", "is_dup").as[(Long, Boolean)].collect().toMap
    assert(!r(1L) && r(2L) && r(3L)) // 1 survives its bundle
    assert(!r(10L) && r(11L))        // 10 survives its bundle
    assert(!r(20L))                  // singleton untouched
  }

  test("cms_estimate reads back count_min_sketch with the CMS overestimate guarantee") {
    import org.apache.spark.sql.functions._
    import graft.functions.SketchFns.cmsEstimate
    // key k appears k times, k = 1..50 → exact counts known
    val df = spark.range(1, 51).select(explode(sequence(lit(1), col("id"))).as("x"),
      col("id").cast("long").as("k")).select("k")
    val sk = df.agg(count_min_sketch(col("k"), lit(0.001d), lit(0.99d), lit(7)).as("s"))
    val n = df.count()
    val out = spark.range(1, 51).select(col("id").as("k"))
      .crossJoin(broadcast(sk))
      .select(col("k"), cmsEstimate(col("s"), col("k")).as("est"))
      .as[(Long, Long)].collect()
    out.foreach { case (k, est) =>
      assert(est >= k, s"CMS must never underestimate: key $k -> $est")
      assert(est <= k + (0.001 * n).toLong + 1, s"key $k overestimate too large: $est")
    }
    // null key → null estimate (BinaryExpression null semantics)
    val nulls = spark.range(1).select(lit(null).cast("long").as("k"))
      .crossJoin(sk).select(cmsEstimate(col("s"), col("k")))
      .collect()
    assert(nulls.head.isNullAt(0))
    // SQL surface registration
    graft.functions.SketchFns.register(spark)
    sk.createOrReplaceTempView("cms_sk")
    val viaSql = spark.sql("SELECT cms_estimate(s, 5L) FROM cms_sk").collect()
    assert(viaSql.head.getLong(0) >= 5L)
  }

  test("mg_summary: bounded counters, heavy keys survive, MG error bound holds") {
    import org.apache.spark.sql.functions._
    import graft.functions.SketchFns.mgSummary
    // 1000 rows of key 1, 800 of key 2, tail of 200 singletons; k = 8
    // counters. N = 2000, error bound N/(k+1) ≈ 222 — both heavy keys
    // MUST survive with estimates within the bound.
    val df = spark.range(0, 1000).select(lit(1L).as("k"))
      .union(spark.range(0, 800).select(lit(2L).as("k")))
      .union(spark.range(100, 300).select(col("id").as("k")))
    val m = df.agg(mgSummary(col("k"), 8).as("m"))
      .select(explode(col("m")).as(Seq("key", "est")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.size <= 8, s"buffer must stay bounded: ${m.size}")
    assert(m.contains(1L) && m.contains(2L), s"heavy keys lost: $m")
    assert(m(1L) <= 1000L && m(1L) >= 1000L - 223L, s"key 1 est ${m(1L)}")
    assert(m(2L) <= 800L && m(2L) >= 800L - 223L, s"key 2 est ${m(2L)}")
    m.foreach { case (key, est) => // no overestimates anywhere
      val exact = if (key == 1L) 1000L else if (key == 2L) 800L else 1L
      assert(est <= exact, s"MG must never overestimate: $key -> $est")
    }
    // exact regime: more counters than distinct keys → exact counts
    val exact = spark.range(0, 100).select((col("id") % 5).as("k"))
      .agg(mgSummary(col("k"), 16).as("m"))
      .select(explode(col("m")).as(Seq("key", "est")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact == Map(0L -> 20L, 1L -> 20L, 2L -> 20L, 3L -> 20L, 4L -> 20L))
    // SQL surface
    graft.functions.SketchFns.register(spark)
    df.createOrReplaceTempView("mg_in")
    val viaSql = spark.sql(
      "SELECT element_at(mg_summary(k, 8), 1L) FROM mg_in").collect()
    assert(viaSql.head.getLong(0) >= 1000L - 223L)
  }
}
