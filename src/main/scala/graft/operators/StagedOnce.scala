package graft.operators

import org.apache.spark.sql.SparkSession

/** Build-once guard for in-query staged artifacts (IVF index, LSH
  * index, inverted text index, shared dedup components).
  *
  * The registered index queries stage their index INSIDE the query so
  * each remains a pure function of the testdata dir (oracle
  * determinism), but re-staging on every invocation bills the build to
  * every probe — the bench's 3-runs-plus-warmup turned each index query
  * into four full index builds. This guard runs the build exactly once
  * per (session, staging key) and lets every later invocation go
  * straight to the probe — which is precisely the production contract
  * the index operators document (build amortizes over batches; rebuild
  * cadence is an explicit knob, not an accident of call count).
  *
  * Keyed on the session so a new session (fresh JVM, fresh `target/`
  * expectations) always re-stages, and evicted when the session's
  * context ends ([[graft.SessionMemo]]). Thread-safe: the memo blocks
  * concurrent builders of the same key.
  */
object StagedOnce {

  // value = (owning query, source dir, build wall-seconds), kept so the
  // bench can report the build/probe split instead of silently folding
  // the (amortized) build into whichever invocation happened to run
  // first
  private val done = new graft.SessionMemo[String, (String, String, Double)]()

  /** `owner` names the registered query staging this artifact and `dir`
    * the testdata dir it was built from — the bench keys its build_s
    * report by owner and filters by EXACT dir (sanitized key tags are
    * lossy: one dir's tag can be a proper suffix of another's), so the
    * mapping lives at the staging site instead of being re-derived from
    * key strings. */
  def apply(s: SparkSession, key: String, owner: String = "", dir: String = "")
           (build: => Unit): Unit =
    done(s, key) {
      val t0 = System.nanoTime()
      build
      (owner, dir, (System.nanoTime() - t0) / 1e9)
    }

  /** Value-returning form for call sites that keep the built VALUE in
    * their own session memo (Tables.staged, StreamQueries.slice) and
    * only need the build-once TIMING recorded here: call from inside
    * the caller's memo-miss body; the build runs and its wall time
    * lands in [[builds]]. The fallback (this memo already had the key
    * while the caller's memo did not — possible only if the two memos
    * were populated or evicted independently, which the paired call
    * sites never do) rebuilds untimed rather than failing. */
  def timedBuild[T](s: SparkSession, key: String, owner: String = "",
                    dir: String = "")(build: => T): T = {
    var out: Option[T] = None
    apply(s, key, owner, dir) { out = Some(build) }
    out.getOrElse(build)
  }

  /** Build seconds per staging key for `s` — one entry per artifact
    * actually built in this session. */
  def buildSeconds(s: SparkSession): Map[String, Double] =
    done.entries(s).map { case (k, (_, _, sec)) => k -> sec }

  /** (staging key) → (owner query, source dir, build seconds) for `s`. */
  def builds(s: SparkSession): Map[String, (String, String, Double)] = done.entries(s)
}
