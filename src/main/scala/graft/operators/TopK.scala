package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group top-k via ranking window.
  *
  * Absent from the reference (SURVEY §2.3 — no sorts/limits/top-k), but
  * part of the demanded query surface over the landed tables. Spark's
  * physical window exec only needs a per-key sort after one shuffle;
  * `row_number`+filter prunes to k rows per group before anything
  * downstream, so no global sort materializes. For the global-top-k case
  * use `orderBy(...).limit(k)` — Spark plans TakeOrderedAndProject
  * (per-partition heap + driver merge), which is the right 100 TB shape.
  */
object TopK {

  def perGroup(df: DataFrame, partitionBy: Seq[String], order: Seq[Column], k: Int,
               rankCol: String = "__rank"): DataFrame = {
    val w = Window.partitionBy(partitionBy.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
      .drop(rankCol)
  }
}
