package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe into a serialized Bloom filter (Bloom 1970) — the
  * read half of the filter family, sibling of [[CmsEstimate]]: Catalyst
  * injects `might_contain` only through its own runtime-filter rewrite
  * (InjectRuntimeFilter); nothing lets a PIPELINE hold a filter as data
  * and probe it where the author chooses. `bloom_contains(filter, key)`
  * does exactly that for string keys: true ⇒ key maybe present (fpp
  * bounds the lie), false ⇒ key DEFINITELY absent — which is why a
  * false-heavy probe stream (decontamination, blocklists) can discard
  * rows with certainty and send only the "maybe" trickle to exact
  * verification.
  *
  * Probe via the key's UTF-8 bytes — bit-identical to the
  * `putString`/`mightContainString` pair the builder used, without
  * materializing a java.lang.String per row.
  *
  * `CodegenFallback` + reference-identity memo, per the CmsEstimate
  * rationale: the filter arrives as ONE broadcast literal, so parse
  * cost amortizes to zero and fused codegen would buy nothing
  * measurable. Null on either side yields null (BinaryExpression
  * default).
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_contains expects (binary filter, string key), " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")

  // Single volatile (bytes, filter) pair — same contention contract as
  // CmsEstimate: worst case is a redundant re-parse, never a torn pair.
  @transient @volatile private var memo: (Array[Byte], BloomFilter) = _

  override protected def nullSafeEval(bf: Any, key: Any): Any = {
    val bytes = bf.asInstanceOf[Array[Byte]]
    var m = memo
    if (m == null || (m._1 ne bytes)) {
      m = (bytes, BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes)))
      memo = m
    }
    m._2.mightContainBinary(key.asInstanceOf[UTF8String].getBytes)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
