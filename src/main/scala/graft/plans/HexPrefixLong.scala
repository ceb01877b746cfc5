package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The value of the first `hexChars` hex digits of an ALREADY-HEX string
  * as a LONG — `conv(substring(x, 1, n), 16, 10)` without the generic
  * radix parse. Companion to [[Md5PrefixLong]] for the sites that keep
  * the full md5 hex COLUMN alive (epoch permutation keys: the hex k is
  * the total-order tiebreak AND its 13-digit prefix is the numeric
  * bucket key) — decoding the existing column beats re-digesting the
  * pre-image, which paid the md5 twice per row (ADVICE r13).
  * `hexChars` ≤ 15 keeps the value positive in a signed long. Returns
  * null if the window contains a non-hex character or the string is
  * shorter than `hexChars` (never the case on md5 output; the guard
  * keeps malformed input loud-null instead of silently wrong). */
case class HexPrefixLong(child: Expression, hexChars: Int) extends UnaryExpression {
  require(hexChars >= 1 && hexChars <= 15, s"hexChars out of range: $hexChars")

  override def dataType: DataType = LongType
  override def prettyName: String = "hex_prefix_long"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hex_prefix_long expects a string, got ${child.dataType.catalogString}")

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    HexPrefixLong.eval(input.asInstanceOf[UTF8String], hexChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // boxed-null path: eval returns java.lang.Long (null on malformed)
    val v = ctx.freshName("hexVal")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long $v = graft.plans.HexPrefixLong$$.MODULE$$.eval($c, $hexChars);
      if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v.longValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HexPrefixLong {

  def eval(s: UTF8String, hexChars: Int): java.lang.Long = {
    val bytes = s.getBytes
    if (bytes.length < hexChars) return null
    var v = 0L
    var i = 0
    while (i < hexChars) {
      val c = bytes(i)
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else return null
      v = (v << 4) | d
      i += 1
    }
    java.lang.Long.valueOf(v)
  }
}
