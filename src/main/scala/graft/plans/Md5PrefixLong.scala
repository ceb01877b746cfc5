package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The value of the first `hexChars` hex digits of md5(input) as a
  * LONG — the native form of
  * `conv(substring(md5(x), 1, n), 16, 10).cast("long")`, the hash
  * basis the MinHash signature phase evaluates once per SHINGLE row
  * (~200 per document, the densest expression in the dedup family).
  * The composed spelling materializes a 32-char hex UTF8String, a
  * substring copy, and a generic radix parse per row; this reads the
  * digest bytes directly (thread-local MessageDigest, high nibble
  * first — exactly the hex rendering's digit order). `hexChars` ≤ 15
  * keeps the value positive in a signed long, matching conv's range
  * on these widths. The md5 basis itself stays, NOT a cheaper hash:
  * it is what the DuckDB oracle twins reproduce bit-exactly. */
case class Md5PrefixLong(child: Expression, hexChars: Int, startHex: Int = 1)
  extends UnaryExpression {
  // widths 1..15 match conv(substring(...),16,10) exactly (positive);
  // width 16 is the SIGNED two's-complement of the 64-bit window (bit
  // 63 = the first hex digit's high bit) — for bit-extraction callers
  // (the 64-bit SimHash basis reads both 32-bit words from one digest);
  // it has no conv twin (DuckDB overflows CASTing '0x'+16 hex chars).
  require(hexChars >= 1 && hexChars <= 16, s"hexChars out of range: $hexChars")
  require(startHex >= 1 && startHex + hexChars - 1 <= 32,
    s"hex window [$startHex, ${startHex + hexChars - 1}] outside md5's 32 digits")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix_long"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_prefix_long expects a string, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    Md5PrefixLong.eval(input.asInstanceOf[UTF8String], hexChars, startHex)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.Md5PrefixLong$$.MODULE$$.eval($c, $hexChars, $startHex)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5PrefixLong {

  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def eval(s: UTF8String, hexChars: Int): Long = eval(s, hexChars, 1)

  /** Value of hex digits [startHex, startHex + hexChars) (1-based) of
    * md5(s) — `conv(substring(md5(s), startHex, hexChars), 16, 10)`. */
  def eval(s: UTF8String, hexChars: Int, startHex: Int): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var v = 0L
    var i = startHex - 1
    val end = startHex - 1 + hexChars
    while (i < end) {
      val b = digest(i >> 1) & 0xFF
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xF)
      i += 1
    }
    v
  }
}
