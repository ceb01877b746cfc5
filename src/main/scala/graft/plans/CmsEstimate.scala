package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Point-estimate lookup into a serialized Count–Min sketch (Cormode &
  * Muthukrishnan 2005) — the read half Spark leaves out: the built-in
  * `count_min_sketch` AGGREGATE builds mergeable frequency sketches
  * (partial aggregation merges them map-side, which is exactly the
  * 100 TB story), but SQL ships no function to query one. This native
  * expression closes the loop: `cms_estimate(sketch, key)` returns the
  * sketch's frequency estimate for a long key, with the CMS guarantee
  * estimate ≥ true count and estimate ≤ true count + ε·N w.p. 1−δ.
  *
  * Deliberately `CodegenFallback`, not `doGenCode`: by contract the
  * sketch column arrives via a broadcast of a 1-row aggregate and the
  * key side is a bounded probe set (tens of rows), so deserialization
  * cost is irrelevant — unlike `CosineSimilarity`, which sits in the
  * kNN hot loop and earns its fused codegen. A reference-identity memo
  * still avoids re-parsing the (identical) sketch bytes row-over-row.
  *
  * Null on either side yields null (BinaryExpression default).
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cms_estimate expects (binary sketch, bigint key), " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")

  // Memo is (bytes, sketch) swapped as ONE immutable pair through a
  // single volatile slot: one expression instance can be evaluated from
  // several task threads, and two separately-mutated fields could pair a
  // sketch with another row's bytes. Worst case under contention is a
  // redundant re-parse, never a wrong pairing; reference identity is the
  // intended memo key (the broadcast 1-row sketch is the same object
  // row-over-row).
  @transient @volatile private var memo: (Array[Byte], CountMinSketch) = _

  override protected def nullSafeEval(sk: Any, key: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    var m = memo
    if (m == null || (m._1 ne bytes)) {
      m = (bytes, CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes)))
      memo = m
    }
    m._2.estimateCount(key.asInstanceOf[Long])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
