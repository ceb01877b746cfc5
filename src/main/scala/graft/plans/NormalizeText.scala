package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text canonicalizer — the native form of
  * `trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))`, the
  * normalization every fingerprint / shingle / MinHash signature /
  * suffix-array tokenization evaluates per document. The pipeline's
  * OUTPUT alphabet is [a-z0-9 ] only, which makes the composition a
  * byte-level scan: ASCII lowercase/digits pass through, ASCII
  * uppercase folds by +32, every other code point is a separator, and
  * separator runs collapse to one interior space (leading/trailing
  * runs vanish — the trim).
  *
  * The one trap is that Unicode LOWERCASING can land inside ASCII
  * before the character class runs: U+212A (KELVIN SIGN) lowercases to
  * 'k', and U+0130 (LATIN CAPITAL I WITH DOT ABOVE) lowercases to
  * 'i' + U+0307 (the combining dot then becomes a separator). Both are
  * handled by exact byte-sequence match; [[graft.NormalizeTextSpec]]
  * sweeps EVERY Unicode code point against the regex spelling to prove
  * there is no third case in this JVM's casing tables.
  *
  * LOCALE ASSUMPTION (non-tr/az default locale): it is the COMPOSED
  * spelling that is locale-sensitive, not this scan — Spark's `lower()`
  * routes any string containing a non-ASCII char through
  * default-locale `String.toLowerCase`, and under a Turkish/Azeri
  * default locale ASCII 'I' in such a string lowercases to dotless
  * U+0131 (a separator under the character class) while this scan
  * always folds 'I' → 'i' (the behavior every other locale gets, and
  * the one the DuckDB oracle reproduces). The equivalence the spec
  * sweep proves therefore holds for the test JVM's locale; sessions
  * must not run under tr/az default locales (Spark itself documents
  * the same caveat on its locale-sensitive functions). */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"normalize_text expects a string, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NormalizeText$$.MODULE$$.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {

  /** trim(regexp_replace(lower(s), "[^a-z0-9]+", " ")) in one byte
    * pass. Output is never longer than the input (each input byte
    * yields at most one output byte, amortized: a separator RUN yields
    * one space, and the İ/KELVIN special cases shrink). */
  def normalize(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    val out = new Array[Byte](n)
    var o = 0
    var i = 0
    var pending = false // a separator run is open; emit one space before the next token byte
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 0) { // ASCII
        if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
          if (pending && o > 0) { out(o) = ' '; o += 1 }
          pending = false
          out(o) = b; o += 1; i += 1
        } else if (b >= 'A' && b <= 'Z') {
          if (pending && o > 0) { out(o) = ' '; o += 1 }
          pending = false
          out(o) = (b + 32).toByte; o += 1; i += 1
        } else {
          pending = true; i += 1
        }
      } else {
        val lead = b & 0xFF
        val len = if (lead >= 0xF0) 4 else if (lead >= 0xE0) 3 else 2
        if (lead == 0xC4 && i + 1 < n && (s.getByte(i + 1) & 0xFF) == 0xB0) {
          // U+0130 İ → lower = 'i' + U+0307; the combining dot is a
          // separator, so: emit i, reopen the separator run.
          if (pending && o > 0) { out(o) = ' '; o += 1 }
          out(o) = 'i'.toByte; o += 1
          pending = true
        } else if (lead == 0xE2 && i + 2 < n &&
            (s.getByte(i + 1) & 0xFF) == 0x84 && (s.getByte(i + 2) & 0xFF) == 0xAA) {
          // U+212A KELVIN SIGN → lower = ASCII 'k'.
          if (pending && o > 0) { out(o) = ' '; o += 1 }
          pending = false
          out(o) = 'k'.toByte; o += 1
        } else {
          pending = true // any other non-ASCII code point is a separator
        }
        i += len
      }
    }
    UTF8String.fromBytes(out, 0, o)
  }
}
