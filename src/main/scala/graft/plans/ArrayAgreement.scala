package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Slot-agreement count of two BIGINT arrays: the number of positions i
  * where a[i] == b[i] — the MinHash estimated-similarity statistic
  * (agreeing signature slots / nHashes estimates Jaccard; MMDS ch.3).
  *
  * Exists so the LSH calibration join ([[graft.queries.LlmQueries13]]'s
  * q_lsh_precision) can ship ONE packed signature array per side instead
  * of nHashes separate BIGINT columns: per candidate pair the old form
  * shipped 16 columns per side through the join and evaluated a 16-term
  * chained CASE WHEN; this is a single array compare loop inside
  * whole-stage codegen over one 16-element array per side (the
  * [[JaccardSimilarity]] pattern). Positions beyond the shorter array and
  * positions where either element is null never agree; a null array on
  * either side yields null.
  */
case class ArrayAgreement(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"array_agreement expects array<bigint> inputs, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val n = math.min(xa.numElements(), xb.numElements())
    var agree = 0
    var i = 0
    while (i < n) {
      if (!xa.isNullAt(i) && !xb.isNullAt(i) && xa.getLong(i) == xb.getLong(i))
        agree += 1
      i += 1
    }
    agree
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val agree = ctx.freshName("agree")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $agree = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) && $a.getLong($i) == $b.getLong($i)) $agree++;
         |}
         |${ev.value} = $agree;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
