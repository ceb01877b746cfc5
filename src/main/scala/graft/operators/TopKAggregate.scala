package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed `Aggregator` — the map-side-partial
  * alternative to the ranking-window formulation in `TopK`.
  *
  * The window form shuffles EVERY row of a group before sorting
  * (mitigated but not eliminated by WindowGroupLimit); this aggregator's
  * partial buffers mean each map task contributes at most k entries per
  * group to the shuffle, so shuffle volume is k × groups regardless of
  * input size — the right shape when groups are huge and k is small
  * (top-k per customer over 100 TB of trades).
  *
  * Ordering is total — (value desc, id asc) — so results are
  * deterministic and oracle-comparable against the window formulation.
  */
object TopKAggregate {

  case class Entry(id: Long, value: Double)

  class TopKByValue(k: Int) extends Aggregator[Entry, List[Entry], List[Entry]] {
    private val best: Ordering[Entry] = Ordering.by(e => (-e.value, e.id))

    override def zero: List[Entry] = Nil

    override def reduce(buf: List[Entry], a: Entry): List[Entry] = {
      // buf is kept best-first and ≤ k long; skip the sort when a can't enter
      if (buf.sizeIs >= k && best.gteq(a, buf.last)) buf
      else (a :: buf).sorted(best).take(k)
    }

    override def merge(a: List[Entry], b: List[Entry]): List[Entry] =
      (a ++ b).sorted(best).take(k)

    override def finish(r: List[Entry]): List[Entry] = r.sorted(best)

    override def bufferEncoder: Encoder[List[Entry]] = Encoders.kryo[List[Entry]]
    override def outputEncoder: Encoder[List[Entry]] = Encoders.kryo[List[Entry]]
  }
}
