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

  test("parseWav walks RIFF chunks to the real format fields") {
    val samples = Array[Short](-3, 7, 100, -32768, 32767)
    val wav = Multimodal.encodePcmWav(8000, samples)
    assert(Multimodal.parseWav(wav).contains((8000L, 1L, 16L, 10L)))
    assert(Multimodal.parseWav("RIFFjunk".getBytes ++ new Array[Byte](40)).isEmpty)
    assert(Multimodal.parseWav(Array[Byte](1, 2, 3)).isEmpty)
    // Hostile chunk size 0xFFFFFFFF: truncated to Int it is -1 and the
    // cursor would walk backwards forever; the Long walk must terminate
    // and quarantine the payload.
    val hostile = Multimodal.encodePcmWav(8000, Array[Short](1, 2, 3))
    hostile(16) = -1; hostile(17) = -1; hostile(18) = -1; hostile(19) = -1
    assert(Multimodal.parseWav(hostile).isEmpty)
  }

  test("decodeAudio recovers exact PCM samples; non-audio payloads quarantined") {
    import spark.implicits._
    val samples = Array[Short](-3, 7, 100, -32768, 32767)
    val rows = spark.createDataset(Seq(
      MediaRow(1L, "a", Multimodal.encodePcmWav(8000, samples)),
      MediaRow(2L, "a", Array[Byte](9, 9, 9)), // not RIFF → dropped at triage
      MediaRow(3L, "a", Multimodal.encodeGrayPng(2, 2, (_, _) => 1)))) // not audio
    val out = Multimodal.decodeAudio(rows).collect()
    assert(out.map(_.id).toSeq == Seq(1L))
    val d = out.head
    assert(d.sample_rate == 8000L && d.channels == 1L && d.bits == 16L)
    assert(d.n_samples == 5L && d.sample_sum == samples.map(_.toLong).sum)
  }

  test("fingerprintAudio is amplitude-invariant and frame-exact over real decode") {
    import spark.implicits._
    // One signal at 1x and 3x gain, one genuinely different signal, one
    // undecodable payload. The energy-delta bits must collide for the
    // re-leveled copy and differ for the other signal.
    val base = Array.tabulate[Short](48)(i => (((i * i * 5) % 157) - 78).toShort)
    val loud = base.map(s => (s * 3).toShort)
    val other = Array.tabulate[Short](48)(i => (((i * 13) % 157) - 78).toShort)
    val rows = spark.createDataset(Seq(
      MediaRow(1L, "a", Multimodal.encodePcmWav(8000, base)),
      MediaRow(2L, "a", Multimodal.encodePcmWav(8000, loud)),
      MediaRow(3L, "a", Multimodal.encodePcmWav(8000, other)),
      MediaRow(4L, "a", Array[Byte](9, 9, 9))))
    val fp = Multimodal.fingerprintAudio(rows, frame = 8).collect()
      .map(f => f.id -> f).toMap
    assert(fp.keySet == Set(1L, 2L, 3L))
    assert(fp(1L).n_frames == 6L && fp(1L).fp.length == 5)
    assert(fp(1L).fp == fp(2L).fp) // gain-invariant
    assert(fp(1L).fp != fp(3L).fp) // discriminative
  }

  test("parseMp4 walks the ISO-BMFF box tree to the real movie/track fields") {
    val mp4 = Multimodal.encodeMp4("isom", 600, 1234, 320, 240)
    assert(Multimodal.parseMp4(mp4).contains(("isom", 600L, 1234L, 320L, 240L)))
    // non-BMFF payloads quarantined
    assert(Multimodal.parseMp4(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.parseMp4(Multimodal.encodeGrayPng(2, 2, (_, _) => 1)).isEmpty)
    assert(Multimodal.parseMp4("RIFFxxxxWAVE".getBytes ++ new Array[Byte](40)).isEmpty)
    // spec's size=0 "extends to end of file" form on the last box
    val tail = Multimodal.encodeMp4("mp42", 1000, 5000, 640, 480)
    tail(16) = 0; tail(17) = 0; tail(18) = 0; tail(19) = 0 // moov size := 0
    assert(Multimodal.parseMp4(tail).contains(("mp42", 1000L, 5000L, 640L, 480L)))
    // hostile box size 0xFFFFFFFF: as Int it is -1 and a naive cursor
    // walks backwards forever; the Long walk clamps the container to the
    // payload end — children still parse, and crucially it TERMINATES.
    val hostile = Multimodal.encodeMp4("isom", 600, 99, 64, 48)
    hostile(16) = -1; hostile(17) = -1; hostile(18) = -1; hostile(19) = -1 // moov size
    assert(Multimodal.parseMp4(hostile).contains(("isom", 600L, 99L, 64L, 48L)))
    // same corruption on a LEAF box: mvhd clamps (fields still read),
    // the cursor jumps past end, trak is never reached → dims 0
    val leaf = Multimodal.encodeMp4("isom", 600, 99, 64, 48)
    leaf(24) = -1; leaf(25) = -1; leaf(26) = -1; leaf(27) = -1 // mvhd size
    assert(Multimodal.parseMp4(leaf).contains(("isom", 600L, 99L, 0L, 0L)))
    // truncated mid-box: terminates, quarantined
    assert(Multimodal.parseMp4(mp4.take(40)).isEmpty)
  }

  test("parseVideo emits exact integer duration_ms; non-video rows dropped") {
    import spark.implicits._
    val rows = spark.createDataset(Seq(
      MediaRow(1L, "v", Multimodal.encodeMp4("isom", 600, 900, 320, 240)),
      MediaRow(2L, "v", Array[Byte](9, 9, 9)),
      MediaRow(3L, "v", Multimodal.encodePcmWav(8000, Array[Short](1, 2)))))
    val out = Multimodal.parseVideo(rows).collect()
    assert(out.map(_.id).toSeq == Seq(1L))
    val v = out.head
    assert(v.brand == "isom" && v.timescale == 600L)
    assert(v.duration_ms == 1500L && v.width == 320L && v.height == 240L)
  }

  test("IVF probe plan reads only the staged index — no k-means in its lineage") {
    import graft.operators.IvfIndex
    import graft.functions.VectorFns._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/idx"
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("e"))
    IvfIndex.build(e, "vec_id", "e", k = 4, iters = 1, dir)
    val q = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val probe = IvfIndex.probe(spark, dir, q, k = 3, nprobe = 2)
    val plan = probe.queryExecution.optimizedPlan.toString
    // Lloyd's iterations surface as localCheckpoint LogicalRDDs; a probe
    // plan must contain none — its only non-query inputs are the two
    // staged parquet relations.
    assert(!plan.contains("LogicalRDD"),
      s"probe must not re-run k-means:\n${plan.take(3000)}")
    assert("parquet".r.findAllIn(plan.toLowerCase).length >= 2,
      s"probe must read the staged centroid + assignment tables:\n${plan.take(3000)}")
    assert(probe.collect().nonEmpty)
  }

  test("IVF delta-append: probe sees old+new, centroids untouched, no Lloyd's re-run") {
    import graft.operators.{IvfIndex, KMeans}
    import graft.functions.VectorFns._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_app").toString + "/idx"
    val all = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("e"))
    val old = all.filter(col("vec_id") >= 20)
    val delta = all.filter(col("vec_id") < 20)
    IvfIndex.build(old, "vec_id", "e", k = 4, iters = 1, dir)
    val driftAtBuild = IvfIndex.drift(spark, dir, "e")
    val centsBefore = spark.read.parquet(s"$dir/centroids").collect().toSet
    // snapshot the staged assignments BEFORE append (parquet reads are
    // lazy — materialize so the reference sees only the old corpus)
    val oldAssigned = spark.read.parquet(s"$dir/assignments")
      .select("vec_id", "e", "cid").localCheckpoint(true)
    IvfIndex.append(spark, dir, delta, "vec_id", "e")
    // centroids are immutable under append — only the partitions grew
    assert(spark.read.parquet(s"$dir/centroids").collect().toSet == centsBefore)
    val q = all.filter(col("vec_id").between(30, 33))
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val probe = IvfIndex.probe(spark, dir, q, k = 5, nprobe = 2)
    val plan = probe.queryExecution.optimizedPlan.toString
    assert(!plan.contains("LogicalRDD"),
      s"append/probe must not re-run k-means:\n${plan.take(3000)}")
    val got = probe.select("qid", "vec_id", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // semantic reference: the untouched staged assignments UNIONed with
    // the delta assigned against the staged centroids — append must be
    // indistinguishable from that single-frame construction
    val cents = spark.read.parquet(s"$dir/centroids")
    val refAssigned = oldAssigned.unionByName(
      KMeans.assign(delta, "vec_id", "e", cents).select("vec_id", "e", "cid"))
    val ref = IvfIndex.probeFrames(cents, refAssigned, q, k = 5, nprobe = 2)
      .select("qid", "vec_id", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == ref)
    // non-vacuous: appended vectors are retrievable as neighbors
    assert(got.exists(_._2 < 20), s"no delta vector surfaced: $got")
    // drift re-measured over old+new stays a finite rebuild signal
    val driftAfter = IvfIndex.drift(spark, dir, "e")
    assert(driftAtBuild >= 0 && driftAfter >= 0 && driftAfter <= 2.0)
  }

  test("IVF compact: per-cluster file count drops, probe results invariant") {
    import graft.operators.IvfIndex
    import graft.functions.VectorFns._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_cmp").toString + "/idx"
    val all = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("e"))
    IvfIndex.build(all.filter(col("vec_id") >= 30), "vec_id", "e",
      k = 4, iters = 1, dir)
    // Three append generations — each adds files to every touched
    // cluster directory, the accretion compaction exists to undo.
    Seq((20L, 30L), (10L, 20L), (0L, 10L)).foreach { case (lo, hi) =>
      IvfIndex.append(spark, dir,
        all.filter(col("vec_id") >= lo && col("vec_id") < hi), "vec_id", "e")
    }
    def files(): Int = {
      val root = new java.io.File(s"$dir/assignments")
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(root)
    }
    val q = all.filter(col("vec_id").between(40, 43))
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    def probeSet() = IvfIndex.probe(spark, dir, q, k = 5, nprobe = 2)
      .select("qid", "vec_id", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val before = probeSet()
    val filesBefore = files()
    val centsBefore = spark.read.parquet(s"$dir/centroids").collect().toSet
    IvfIndex.compact(spark, dir)
    assert(files() < filesBefore,
      s"compaction must shrink the file count (was $filesBefore, now ${files()})")
    assert(probeSet() == before, "compaction changed probe results")
    assert(spark.read.parquet(s"$dir/centroids").collect().toSet == centsBefore)
    // The cid partitioning survives the rewrite — probes keep pruning.
    val cids = new java.io.File(s"$dir/assignments").listFiles()
      .map(_.getName).filter(_.startsWith("cid="))
    assert(cids.length == 4, s"expected 4 cid dirs, got ${cids.toSeq}")
  }

  test("IVF retract: deleted vectors leave probe and drift; compact purges; build resets") {
    import spark.implicits._
    import graft.operators.IvfIndex
    import graft.functions.VectorFns._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_ret").toString + "/idx"
    val all = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("e"))
    IvfIndex.build(all, "vec_id", "e", k = 4, iters = 1, dir)
    val q = all.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    def probeSet() = IvfIndex.probe(spark, dir, q, k = 5, nprobe = 2)
      .select("qid", "vec_id", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val before = probeSet()
    val gone = before.map(_._2).min // a vector that provably serves
    IvfIndex.retract(spark, dir,
      Seq(gone).toDF("vec_id"), "vec_id")
    val after = probeSet()
    assert(!after.exists(_._2 == gone), "retracted vector still serves")
    assert(after != before, "retraction must change the top-k")
    // semantic reference: probeFrames over assignments minus the id —
    // centroids untouched (retraction does not refit)
    val cents = spark.read.parquet(s"$dir/centroids")
    val ref = IvfIndex.probeFrames(cents,
        spark.read.parquet(s"$dir/assignments").filter(col("vec_id") =!= gone),
        q, k = 5, nprobe = 2)
      .select("qid", "vec_id", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(after == ref)
    // the tombstone anti-join must not break the probe's cid partition
    // pruning — the inverted file's whole point (plan-verified r18:
    // the dynamic pruning subquery pushes through the left_anti join)
    val plan = IvfIndex.probe(spark, dir, q, k = 5, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"cid pruning lost under tombstones:\n${plan.take(3000)}")
    // drift is computed over survivors only
    val refDrift = spark.read.parquet(s"$dir/assignments")
      .filter(col("vec_id") =!= gone)
      .join(broadcast(cents), "cid")
      .agg(avg(lit(1.0) - cosineFast(col("e"), col("cv")))).head.getDouble(0)
    assert(math.abs(IvfIndex.drift(spark, dir, "e") - refDrift) < 1e-12)
    // compact purges physically and clears the tombstones
    val rowsLive = spark.read.parquet(s"$dir/assignments").count() - 1
    IvfIndex.compact(spark, dir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/tombstones")))
    assert(spark.read.parquet(s"$dir/assignments").count() == rowsLive)
    assert(probeSet() == after, "probe invariant across the purge")
    // a fresh build resets the tombstones (no inherited filtering)
    IvfIndex.retract(spark, dir, Seq(gone).toDF("vec_id"), "vec_id")
    IvfIndex.build(all, "vec_id", "e", k = 4, iters = 1, dir)
    assert(probeSet() == before, "rebuild must not inherit tombstones")
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
