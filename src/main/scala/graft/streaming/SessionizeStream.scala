package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization via `flatMapGroupsWithState` — the
  * custom-state form of the batch `RelQueries3.sessionize` window query.
  *
  * State per entity is O(1): the open session's bounds and count. An
  * event-time timeout closes idle sessions, so state size is bounded by
  * live entities, not history — the property that lets this run forever
  * on an unbounded stream where the batch window form needs the full
  * partition. Emitted rows are CLOSED sessions (append semantics).
  */
object SessionizeStream {

  case class Event(userId: Long, ts: Timestamp)
  case class OpenSession(start: Long, end: Long, n: Long)
  case class ClosedSession(userId: Long, startUs: Long, endUs: Long,
                           nEvents: Long, durationSec: Double)

  val GapUs: Long = 30L * 60 * 1000000

  def sessionize(events: Dataset[Event],
                 gapUs: Long = GapUs): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, batch: Iterator[Event], state: GroupState[OpenSession]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(userId, s.start, s.end, s.n,
              (s.end - s.start) / 1e6))
          } else {
            // micro-batch arrival order is not event order: sort the batch
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.hashCode))
            var cur = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            sorted.foreach { e =>
              val us = e.ts.getTime * 1000
              cur match {
                case Some(s) if us - s.end <= gapUs =>
                  cur = Some(OpenSession(s.start, math.max(s.end, us), s.n + 1))
                case Some(s) =>
                  closed += ClosedSession(userId, s.start, s.end, s.n,
                    (s.end - s.start) / 1e6)
                  cur = Some(OpenSession(us, us, 1))
                case None =>
                  cur = Some(OpenSession(us, us, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end / 1000 + gapUs / 1000)
            }
            closed.result().iterator
          }
        })
  }
}
