package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The full nHashes-long MinHash signature of a string's k-shingle set
  * as `array<bigint>` — one codegen'd pass per DOCUMENT, the native
  * form of the explode→md5-basis→16-min-aggregate pipeline
  * (`MinHashDedup.signatures`, the dominant cost of the near-dup
  * family's 100× tier after r13 moved verification off the critical
  * path). Value-identical by construction:
  *
  *   sig[j] = min over distinct shingles sh of
  *              (a_j · (md5_prefix_long(sh, 8) mod P) + b_j) mod P
  *
  * with P = 2^31−1 and (a_j, b_j) = `MinHashDedup.hashParams` — the
  * same constants the DuckDB oracle twins inline as literals. Shingles
  * are SQL `substr(s, i, k)` for i in 1..max(len−k+1, 1), positions in
  * CODE POINTS (all-ASCII inputs take the zero-copy byte-slice fast
  * path, exactly [[DistinctShingles]]'s split); min over the shingle
  * MULTISET equals min over its set, and duplicates are skipped here
  * (one HashSet probe is ~10× cheaper than the md5 it saves).
  *
  * What this removes vs the relational spelling: the exploded
  * (doc, shingle) row materialization (~192 rows/doc), the
  * nHashes-buffer hash aggregate, and the map-side combine pass — the
  * signature phase becomes a pure per-row projection with NO exchange.
  * At 100 TB that matters twice: no shuffle files for the densest
  * intermediate in the pipeline, and the expression pipelines into the
  * banding projection inside one whole-stage-codegen span.
  */
case class MinHashSignature(child: Expression, k: Int, nHashes: Int)
  extends UnaryExpression {
  require(k >= 1, s"shingle width must be >= 1, got $k")
  require(nHashes >= 1 && nHashes <= 1024, s"nHashes out of range: $nHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects a string, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignature.eval(input.asInstanceOf[UTF8String], k, nHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.MinHashSignature$$.MODULE$$.eval($c, $k, $nHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {

  /** Carter–Wegman modulus, shared with `MinHashDedup.P`. */
  val P: Long = 2147483647L

  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** (a_j, b_j) flattened to primitive arrays, cached per nHashes.
    * Sourced from `MinHashDedup.hashParams` — the single definition the
    * oracle literals are generated from. */
  private val paramCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def params(n: Int): (Array[Long], Array[Long]) =
    paramCache.computeIfAbsent(n, { m =>
      val ps = graft.operators.MinHashDedup.hashParams(m)
      (ps.map(_._1).toArray, ps.map(_._2).toArray)
    })

  def eval(s: UTF8String, k: Int, nHashes: Int): ArrayData = {
    val (as, bs) = params(nHashes)
    val md = digest.get()
    val mins = new Array[Long](nHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val seen = new java.util.HashSet[UTF8String]()

    def accept(slice: UTF8String, base: Array[Byte], off: Int, len: Int): Unit = {
      if (seen.add(slice)) {
        md.reset()
        md.update(base, off, len)
        val dg = md.digest()
        val x = (((dg(0) & 0xFFL) << 24) | ((dg(1) & 0xFFL) << 16) |
          ((dg(2) & 0xFFL) << 8) | (dg(3) & 0xFFL)) % P
        var j = 0
        while (j < nHashes) {
          val v = (x * as(j) + bs(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
    }

    val bytes = s.getBytes
    val n = bytes.length
    var ascii = true
    var i = 0
    while (ascii && i < n) { if (bytes(i) < 0) ascii = false; i += 1 }
    if (ascii) {
      // byte positions == code points: shingles are shared-buffer slices
      val count = math.max(n - k + 1, 1)
      var p = 0
      while (p < count) {
        val len = math.min(k, n - p)
        accept(UTF8String.fromBytes(bytes, p, len), bytes, p, len)
        p += 1
      }
    } else {
      val len = s.numChars()
      val count = math.max(len - k + 1, 1)
      var p = 1
      while (p <= count) {
        val sh = s.substringSQL(p, k)
        val shBytes = sh.getBytes
        accept(sh, shBytes, 0, shBytes.length)
        p += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}
