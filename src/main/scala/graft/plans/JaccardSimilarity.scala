package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Set Jaccard similarity |A∩B| / |A∪B| over two string-array columns —
  * a codegen'd Catalyst expression replacing the
  * `size(filter(a, x => array_contains(b, x)))` form, which is both
  * interpreted (higher-order lambda dispatch per element) and O(|a|·|b|)
  * per pair. This is the hot inner loop of MinHash candidate
  * verification: every surviving candidate pair pays it once over two
  * ~200-element shingle sets.
  *
  * One hash-set build over the smaller side + one membership probe pass
  * over the other — O(|a|+|b|), inside whole-stage codegen. Inputs are
  * treated as SETS (duplicates ignored via the same hash set), which is
  * identical to the old form on the `array_distinct`-ed shingle arrays
  * it replaces, and matches the DuckDB `list_distinct` oracle exactly:
  * the result is a single IEEE division of two exact integer counts.
  * Null elements are skipped; a null array on either side yields null.
  */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaccard_sim expects array<string> inputs, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val sa = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < xa.numElements()) {
      if (!xa.isNullAt(i)) sa.add(xa.getUTF8String(i))
      i += 1
    }
    val sb = new java.util.HashSet[UTF8String]()
    var inter = 0L
    i = 0
    while (i < xb.numElements()) {
      if (!xb.isNullAt(i)) {
        val v = xb.getUTF8String(i)
        if (sb.add(v) && sa.contains(v)) inter += 1
      }
      i += 1
    }
    val union = sa.size.toLong + sb.size.toLong - inter
    if (union == 0L) 0.0 else inter.toDouble / union.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val sa = ctx.freshName("sa")
      val sb = ctx.freshName("sb")
      val v = ctx.freshName("v")
      val inter = ctx.freshName("inter")
      val union = ctx.freshName("union")
      s"""
         |java.util.HashSet<org.apache.spark.unsafe.types.UTF8String> $sa = new java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>();
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i)) $sa.add($a.getUTF8String($i));
         |}
         |java.util.HashSet<org.apache.spark.unsafe.types.UTF8String> $sb = new java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>();
         |long $inter = 0L;
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  if (!$b.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $v = $b.getUTF8String($i);
         |    if ($sb.add($v) && $sa.contains($v)) $inter++;
         |  }
         |}
         |long $union = (long) $sa.size() + (long) $sb.size() - $inter;
         |${ev.value} = ($union == 0L) ? 0.0 : (double) $inter / (double) $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
