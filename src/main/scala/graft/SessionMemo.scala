package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-scoped build-once memo — the shared backing for [[Tables]],
  * [[graft.operators.StagedOnce]] and [[graft.operators.DedupStage]].
  *
  * Keyed on the owning `SparkSession` so memoized frames never leak
  * across sessions, and EVICTED when the session's SparkContext ends:
  * on first use per context a `SparkListener` is registered whose
  * `onApplicationEnd` drops every entry belonging to that context.
  * Without the eviction, a long-lived multi-session process (one JVM
  * serving many short-lived sessions) would strongly retain every
  * stopped session, its resolved relations, and any eagerly
  * `localCheckpoint`-ed blocks for the JVM lifetime.
  *
  * Known scope limit: eviction is per-CONTEXT. Sessions cloned via
  * `newSession()` share one SparkContext, so an abandoned clone's
  * entries live until that context stops (there is no per-session end
  * event to hook, and weak keys don't work here — memoized DataFrames
  * reference their session, which would pin the key). Bounded in
  * practice: entries are per-(session, dir) singletons, not per-call.
  *
  * Thread-safe: `computeIfAbsent` blocks concurrent builders of the
  * same key, so a build runs exactly once per (session, key).
  */
final class SessionMemo[K, V] {

  private val memo = new ConcurrentHashMap[(SparkSession, K), V]()

  def apply(s: SparkSession, key: K)(build: => V): V = {
    SessionMemo.registerEviction(s.sparkContext, this)
    memo.computeIfAbsent((s, key), _ => build)
  }

  /** Snapshot of this session's entries (other sessions' keys are
    * invisible). Lets callers report on what was staged — e.g. the
    * bench's build/probe split — without re-triggering builds. */
  private[graft] def entries(s: SparkSession): Map[K, V] = {
    val out = Map.newBuilder[K, V]
    memo.forEach { (k, v) => if (k._1 eq s) out += k._2 -> v }
    out.result()
  }

  /** Drop every entry whose session runs on `sc`. Called by the
    * context-end listener; exposed for tests. */
  private[graft] def evict(sc: SparkContext): Unit = {
    val it = memo.keySet().iterator()
    while (it.hasNext) if (it.next()._1.sparkContext eq sc) it.remove()
  }

  private[graft] def size: Int = memo.size()
}

object SessionMemo {

  private val registered = new ConcurrentHashMap[(SparkContext, SessionMemo[_, _]), Unit]()

  private def registerEviction(sc: SparkContext, m: SessionMemo[_, _]): Unit =
    registered.computeIfAbsent((sc, m), _ => {
      sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          m.evict(sc)
          registered.remove((sc, m))
        }
      })
    })
}
