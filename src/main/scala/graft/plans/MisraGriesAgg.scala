package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType}

/** Misra–Gries heavy-hitter summary (Misra & Gries '82) as a native
  * `TypedImperativeAggregate` — the deterministic-memory frequency
  * summary that completes the engine's mergeable-sketch family
  * (HLL = distinct, QuantileSummaries = quantiles, CMS = per-key
  * counts in sublinear space, MG = the top-k heavy keys themselves).
  *
  * The buffer holds AT MOST k counters — contrast Spark's exact
  * `Percentile`-style aggregates, whose TypedImperative buffers grow
  * with distinct values (the q_skew_profile round-4 finding): MG is
  * what you can afford to run on a 100 TB fact. Update is classic MG
  * (increment if present; insert if room; else decrement every counter
  * by the minimum and drop zeros); merge adds counter maps then
  * re-shrinks the same way. Merge order across partitions can change
  * the surviving counter VALUES (so results are exposed through the
  * in-tolerance-boolean oracle pattern, not raw), but the mergeable-
  * summaries guarantee — trueCount − N/k ≤ estimate ≤ trueCount, and
  * every key with trueCount > N/k present — holds for ANY merge tree
  * (Agarwal et al., "Mergeable Summaries", PODS'12).
  *
  * Output is a map<long,long> of surviving key → lower-bound count;
  * probe with `element_at(map, key)` (absent ⇒ estimate 0).
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[java.lang.Long, java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, "mg_summary needs at least 2 counters")

  override def dataType: DataType = MapType(LongType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.HashMap[java.lang.Long, java.lang.Long] =
    new java.util.HashMap[java.lang.Long, java.lang.Long]()

  /** Decrement-by-min once more than k counters are live; O(k) per
    * shrink, amortized O(1) per update. */
  private def add(m: java.util.HashMap[java.lang.Long, java.lang.Long],
                  key: Long, w: Long): Unit = {
    val cur = m.get(key)
    m.put(key, if (cur == null) w else cur + w)
    if (m.size > k) {
      var minV = Long.MaxValue
      val it0 = m.values().iterator()
      while (it0.hasNext) { val v = it0.next(); if (v < minV) minV = v }
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - minV
        if (nv <= 0) it.remove() else e.setValue(nv)
      }
    }
  }

  override def update(buf: java.util.HashMap[java.lang.Long, java.lang.Long],
                      input: InternalRow): java.util.HashMap[java.lang.Long, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long], 1L)
    buf
  }

  override def merge(buf: java.util.HashMap[java.lang.Long, java.lang.Long],
                     other: java.util.HashMap[java.lang.Long, java.lang.Long]): java.util.HashMap[java.lang.Long, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); add(buf, e.getKey, e.getValue) }
    buf
  }

  override def eval(buf: java.util.HashMap[java.lang.Long, java.lang.Long]): Any = {
    // sorted by key — a canonical (if merge-order-dependent in values)
    // rendering; probes go through element_at, never map order
    val keys = new Array[Long](buf.size)
    val it = buf.keySet().iterator()
    var i = 0
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    java.util.Arrays.sort(keys)
    val vals = keys.map(k2 => buf.get(k2).longValue())
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def serialize(buf: java.util.HashMap[java.lang.Long, java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); bb.putLong(e.getKey); bb.putLong(e.getValue) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[java.lang.Long, java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.HashMap[java.lang.Long, java.lang.Long](n * 2)
    var i = 0
    while (i < n) { m.put(bb.getLong, bb.getLong); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
  override def prettyName: String = "mg_summary"
}
