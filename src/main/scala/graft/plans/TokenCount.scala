package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass token counter — the native form of
  * `regexp_count(text, "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")`, the
  * BPE-ish pre-tokenizer count the packing/export/token-stats family
  * evaluates once per document on its hot path. The alternation's
  * structure is three fixed byte classes, so a hand scan over the
  * UTF8String's bytes replaces the regex automaton: a letter run is
  * one token, a digit run is one token, any other non-whitespace CODE
  * POINT is one token (multi-byte UTF-8 lead ⇒ one code point ⇒ one
  * match — exactly the single-char branch of the regex), and
  * whitespace is Java's ASCII `\s` set. No java.lang.String
  * materializes, no per-row Matcher, and `doGenCode` keeps the call
  * inside whole-stage codegen.
  *
  * Equivalence with the regex spelling is pinned two ways: the DuckDB
  * oracle twins of every consuming query (unchanged — they still spell
  * the regex), and [[graft.TokenCountSpec]] asserting scanner ==
  * regexp_count over the corpus plus adversarial Unicode. */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_token_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count expects a string, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    TokenCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokenCount$$.MODULE$$.count($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCount {

  /** Count of `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` matches, scanning the
    * UTF-8 bytes once. ASCII fast path byte-compares; a non-ASCII lead
    * byte is one code point (2/3/4 bytes), i.e. one single-char match —
    * the same thing the regex alternation's last branch yields. */
  def count(s: UTF8String): Int = {
    val n = s.numBytes()
    var i = 0
    var cnt = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 0) { // ASCII
        if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) {
          cnt += 1; i += 1
          var run = true
          while (run && i < n) {
            val d = s.getByte(i)
            if ((d >= 'A' && d <= 'Z') || (d >= 'a' && d <= 'z')) i += 1 else run = false
          }
        } else if (b >= '0' && b <= '9') {
          cnt += 1; i += 1
          var run = true
          while (run && i < n) {
            val d = s.getByte(i)
            if (d >= '0' && d <= '9') i += 1 else run = false
          }
        } else if (b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r') {
          i += 1 // Java regex \s is exactly this ASCII set
        } else {
          cnt += 1; i += 1 // ASCII punctuation: single-char match
        }
      } else {
        // Multi-byte UTF-8 lead: one code point, one single-char match
        // (non-ASCII is never in [A-Za-z0-9] nor in Java's ASCII \s).
        cnt += 1
        val lead = b & 0xFF
        i += (if (lead >= 0xF0) 4 else if (lead >= 0xE0) 3 else 2)
      }
    }
    cnt
  }
}
