package graft

import org.apache.spark.sql.catalyst.expressions.ScalaUDF

/** Registry-wide plan governance: the engine's codegen discipline
  * (ARCHITECTURE.md — "zero Scala/Python UDFs in hot paths") asserted
  * mechanically over every registered query, not just claimed. Each
  * query's plan is built at the smallest scale factor and its whole
  * expression tree (subqueries included) swept for UDF nodes.
  */
class PlanGovernanceSpec extends GraftSuite {

  test("no ScalaUDF anywhere in any registered query's optimized plan") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.optimizedPlan
      val udfs = plan.collectWithSubqueries {
        case p => p.expressions.flatMap(_.collect { case u: ScalaUDF => u })
      }.flatten
      if (udfs.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty, s"queries with UDFs in their plans: $offenders")
  }
}
