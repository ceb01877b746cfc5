package graft

/** Round-7 tripwire (VERDICT r6 item 2): every registered query must
  * ANALYZE cleanly against every testdata scale's physical schema.
  *
  * Motivation: in round 6 the sf* generators changed `events.ts` from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS, isAdjustedToUTC=false) — which
  * Spark 4 infers as TIMESTAMP_NTZ — and 12 queries silently died at
  * analysis time (`unix_micros` rejects NTZ), poisoning the three
  * whole-registry governance sweeps along with them. One test per query
  * makes any analysis-time break fail loudly under its own name instead
  * of taking down an unrelated sweep.
  *
  * Batch queries are lazily planned, so `.queryExecution.analyzed` costs
  * only analysis (no execution) — cheap enough to run against all three
  * dirs. Streaming queries execute their micro-batches inside the query
  * function itself, so they are pinned to sf0.001 to keep the suite fast;
  * schema-sensitivity is identical across dirs (same generator).
  */
class RegistryAnalysisSpec extends GraftSuite {

  private val allDirs = Seq(
    "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    val dirs =
      if (name.startsWith("q_stream")) allDirs.take(1) else allDirs
    test(s"analyzes on all schemas: $name") {
      dirs.foreach { dir =>
        try fn(spark, dir).queryExecution.analyzed
        catch {
          case e: Throwable =>
            fail(s"$name fails analysis on $dir: ${e.getMessage}", e)
        }
      }
    }
  }
}
