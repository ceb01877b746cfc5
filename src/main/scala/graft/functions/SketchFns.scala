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

  /** Register the SQL surface (`cms_estimate(sketch, key)`) on an
    * already-built session; session-build-time users get it from
    * `GraftExtensions` instead. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cms_estimate",
      exprs => graft.plans.CmsEstimate(exprs(0), exprs(1)),
      "built-in")
}
