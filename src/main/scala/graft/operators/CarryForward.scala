package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** R4 — stateful last-value carry-forward.
  *
  * The reference latches account-summary fields when a summary entry
  * appears in the feed and stamps them onto every subsequent trade row in
  * feed order (`RSS PARSER/gcp_rss.py:84-92,163`). That sequential loop is
  * exactly `last(col, ignoreNulls=true)` over a running row frame — one
  * shuffle on the partition key, then a per-key sort; every account is
  * independent so this scales embarrassingly across executors.
  */
object CarryForward {

  /** For each column in `cols`, adds `<name><suffix>` holding the most
    * recent non-null value within the (partitionBy, orderBy) order. */
  def lastNonNull(df: DataFrame, partitionBy: Seq[String], orderBy: Seq[Column],
                  cols: Seq[String], suffix: String = "_ff"): DataFrame = {
    val w = Window.partitionBy(partitionBy.map(col): _*).orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c + suffix, last(col(c), ignoreNulls = true).over(w))
    }
  }
}
