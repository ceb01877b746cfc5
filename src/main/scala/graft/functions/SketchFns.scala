package graft.functions

import org.apache.spark.sql.Column

/** Column-API surface for the engine's sketch expressions. */
object SketchFns {

  /** Frequency point-estimate from a serialized Count–Min sketch (the
    * read half of Spark's `count_min_sketch` aggregate) — see
    * [[graft.plans.CmsEstimate]] for the contract and the CMS
    * overestimate guarantee. */
  def cmsEstimate(sketch: Column, key: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.CmsEstimate(
      ColumnBridge.expression(sketch), ColumnBridge.expression(key)))
  }

  /** Bloom-filter membership probe for a string key — the read half of
    * a builder-held Bloom filter; false ⇒ DEFINITELY absent, which is
    * what lets a probe stream discard with certainty. See
    * [[graft.plans.BloomContains]]. */
  def bloomContains(filter: Column, key: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.BloomContains(
      ColumnBridge.expression(filter), ColumnBridge.expression(key)))
  }

  /** Misra–Gries heavy-hitter summary over a long key column: at most
    * `k` counters per aggregation buffer regardless of input size —
    * see [[graft.plans.MisraGriesAgg]] for the merge-order-independent
    * error guarantee. Returns map<key → lower-bound count>; probe with
    * `element_at` (absent ⇒ 0). */
  def mgSummary(key: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.MisraGriesAgg(
      ColumnBridge.expression(key), k).toAggregateExpression())
  }

  /** SQL-builder argument validation: `mg_summary`'s k must be a
    * literal — a column reference there would otherwise surface as an
    * opaque NPE/ClassCastException from `eval()` at analysis time.
    * Raises a proper AnalysisException naming the function instead. */
  private[graft] def literalIntArg(fn: String, arg: String,
      e: org.apache.spark.sql.catalyst.expressions.Expression): Int = {
    val v = if (e.foldable) e.eval() else null
    v match {
      case n: Number => n.intValue()
      case _ => throw new org.apache.spark.sql.AnalysisException(
        errorClass = "NON_FOLDABLE_ARGUMENT",
        messageParameters = Map("funcName" -> s"`$fn`",
          "paramName" -> s"`$arg`", "paramType" -> "\"INT\""))
    }
  }

  /** SQL-builder arity validation: an injected function builder that
    * indexes `exprs(i)` unconditionally throws
    * IndexOutOfBoundsException (an internal error) when called with too
    * few arguments. Raises the standard WRONG_NUM_ARGS analysis error
    * naming the function and expected count instead. `expected` is a
    * display string so variadic signatures can say "2 or 3". */
  private[graft] def requireArity(fn: String, exprs: Seq[
      org.apache.spark.sql.catalyst.expressions.Expression],
      ok: Int => Boolean, expected: String): Unit = {
    if (!ok(exprs.length))
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$fn`",
          "expectedNum" -> expected,
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
  }

  /** Register the SQL surface (`cms_estimate(sketch, key)`) on an
    * already-built session; session-build-time users get it from
    * `GraftExtensions` instead. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cms_estimate",
      exprs => graft.plans.CmsEstimate(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_contains",
      exprs => graft.plans.BloomContains(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mg_summary",
      exprs => graft.plans.MisraGriesAgg(exprs(0),
        literalIntArg("mg_summary", "k", exprs(1))).toAggregateExpression(),
      "built-in")
  }
}
