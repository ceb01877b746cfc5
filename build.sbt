ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "fxblueetlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output passes through raw (no [info] prefix) so Bench's
// final JSON line lands bare on stdout for the driver's parser.
run / outputStrategy := Some(StdoutOutput)
// sbt otherwise appends "[success] Total time: ..." AFTER the program's
// last stdout line, so a last-line JSON parse picks up the success banner
// instead of Bench's JSON (BENCH_r02 "parsed": null). Suppress it: the
// program's own final line is then genuinely last on stdout.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Scratch I/O (streaming temp checkpoints/offset logs/state stores,
// spark.local.dir shuffle files) on tmpfs instead of the root disk:
// the streaming micro-batch harness fsyncs offset/commit/state files
// every batch, which on /tmp (disk-backed here) is pure fixed latency.
// Production equivalent: fast local SSD scratch, per Spark's own
// spark.local.dir guidance. Guarded, not forced: containers commonly
// cap /dev/shm at 64 MB, where shuffle spill would hit no-space and
// compete with the heap for RAM — so use it only when it exists with
// ≥2 GiB free, let SPARK_GRAFT_TMPDIR override either way, and
// otherwise leave the JVM's default tmpdir alone.
javaOptions ++= {
  val pick = sys.env.get("SPARK_GRAFT_TMPDIR").orElse {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.getUsableSpace >= (2L << 30)) Some("/dev/shm")
    else None
  }
  pick.map(p => s"-Djava.io.tmpdir=$p").toSeq
}
// Suites share one SparkSession and ExtensionsSpec temporarily swaps the
// default session — run suites sequentially to keep that deterministic.
Test / parallelExecution := false
