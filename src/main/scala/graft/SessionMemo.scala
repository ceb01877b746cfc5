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
  * Known scope limit: AUTOMATIC eviction is per-CONTEXT. Sessions
  * cloned via `newSession()` share one SparkContext, so an abandoned
  * clone's entries live until that context stops (there is no
  * per-session end event to hook, and weak keys don't work here —
  * memoized DataFrames reference their session, which would pin the
  * key). A harness that retires a clone early calls
  * [[SessionMemo.evictSession]] explicitly — every memo instance drops
  * that session's entries while sibling sessions' survive; Verify and
  * Bench do so in teardown. Bounded either way: entries are
  * per-(session, dir) singletons, not per-call.
  *
  * Thread-safe: `computeIfAbsent` blocks concurrent builders of the
  * same key, so a build runs exactly once per (session, key).
  */
final class SessionMemo[K, V] {

  private val memo = new ConcurrentHashMap[(SparkSession, K), V]()

  SessionMemo.instances.add(this)

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

  /** Drop exactly `s`'s entries (sibling sessions on the same context
    * untouched) — the explicit early-retire path for `newSession()`
    * clones, which the context-end listener cannot see. */
  private[graft] def evictSession(s: SparkSession): Unit = {
    val it = memo.keySet().iterator()
    while (it.hasNext) if (it.next()._1 eq s) it.remove()
  }

  private[graft] def size: Int = memo.size()
}

object SessionMemo {

  // Weak registry of every live memo instance so evictSession can reach
  // all of them (Tables, StagedOnce, DedupStage, per-query memos) without
  // each declaring itself; weak so short-lived test instances don't pin.
  private val instances: java.util.Set[SessionMemo[_, _]] =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SessionMemo[_, _], java.lang.Boolean]()))

  /** Retire a session early: drop its entries from EVERY memo. The
    * context-end listener handles whole-context teardown; this is for
    * `newSession()` clones abandoned mid-process (the documented scope
    * limit above). Verify/Bench call it before `spark.stop()`. */
  def evictSession(s: SparkSession): Unit = {
    val snap = instances.synchronized { // WeakHashMap-backed: snapshot under lock
      new java.util.ArrayList[SessionMemo[_, _]](instances)
    }
    snap.forEach(_.evictSession(s))
  }

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
