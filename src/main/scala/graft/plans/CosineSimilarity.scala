package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused cosine similarity over two numeric array columns — a custom
  * Catalyst expression with `doGenCode`, used where the built-in
  * higher-order functions can't deliver: `aggregate(zip_with(...))` is
  * semantically equivalent but interpreted (per-element lambda dispatch,
  * three array passes, boxed accumulators), which dominates brute-force
  * kNN cost. This expression is one fused loop inside whole-stage
  * codegen: dot product and both norms accumulate in a single pass over
  * the unsafe array data, no allocation.
  *
  * Accumulation is left-to-right in double — bitwise-identical to the
  * `VectorFns.dot`/`norm` fold chain and to the DuckDB oracle, so results
  * stay hash-comparable.
  *
  * Zero-norm inputs yield 0.0 (matching `VectorFns.cosine`); a null array
  * on either side yields null (BinaryExpression's default null handling).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<double>/array<float> inputs, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val n = math.min(xa.numElements(), xb.numElements())
    val aF = elemIsFloat(left)
    val bF = elemIsFloat(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val va = if (aF) xa.getFloat(i).toDouble else xa.getDouble(i)
      val vb = if (bF) xb.getFloat(i).toDouble else xb.getDouble(i)
      dot += va * vb; na += va * va; nb += vb * vb
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val va = ctx.freshName("va")
      val vb = ctx.freshName("vb")
      val denom = ctx.freshName("denom")
      val getA = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $va = $getA;
         |  double $vb = $getB;
         |  $dot += $va * $vb; $na += $va * $va; $nb += $vb * $vb;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
