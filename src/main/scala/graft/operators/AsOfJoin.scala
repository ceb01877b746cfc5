package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join — for each left row, attach the payload of the
  * latest right row with `rightTime <= leftTime` for the same key.
  *
  * Not present in the reference (SURVEY §2.3 — no joins beyond the one
  * broadcast dim join), but a required capability for time-series query
  * surfaces over the landed trade tables.
  *
  * Implementation is the distributed merge-scan formulation, not a per-row
  * subquery: union both sides tagged, then one `last(..., ignoreNulls)`
  * running window per key. Cost = one shuffle on the key + a per-key sort;
  * no N×M blowup, no broadcast requirement, linear at 100 TB. (A custom
  * SparkPlan could fuse the tag/untag, but the window exec already gives
  * the optimal single-sort shape.)
  */
object AsOfJoin {

  /** @param rightTieBreak  orders right rows sharing (key, time); the row
    *                       sorting LAST under this order wins, making the
    *                       result deterministic. */
  def backward(left: DataFrame, leftKey: String, leftTime: String,
               right: DataFrame, rightKey: String, rightTime: String,
               rightPayload: Seq[String],
               rightTieBreak: Seq[String] = Nil): DataFrame = {
    val leftStruct = struct(left.columns.toIndexedSeq.map(col): _*)
    val leftType = StructType(left.schema.fields)
    val payloadStruct = struct(rightPayload.map(col): _*)
    val payloadType = StructType(rightPayload.map(c => right.schema(c)))

    val tbCols = rightTieBreak.map(col)
    val l2 = left.select(
      col(leftKey).as("__k") +: col(leftTime).as("__t") +: lit(1).as("__side") +:
        leftStruct.as("__l") +: lit(null).cast(payloadType).as("__p") +:
        rightTieBreak.map(c => lit(null).cast(right.schema(c).dataType).as(s"__tb_$c")): _*)
    val r2 = right.select(
      col(rightKey).as("__k") +: col(rightTime).as("__t") +: lit(0).as("__side") +:
        lit(null).cast(leftType).as("__l") +: payloadStruct.as("__p") +:
        rightTieBreak.map(c => col(c).as(s"__tb_$c")): _*)

    // Right rows sort before left rows at equal time (__side 0 < 1) so an
    // exactly-simultaneous right row is visible to the left row (<= match).
    val order: Seq[Column] =
      col("__t") +: col("__side") +: rightTieBreak.map(c => col(s"__tb_$c"))
    val w = Window.partitionBy(col("__k")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l2.unionByName(r2)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +: rightPayload.map(c => col(s"__asof.$c").as(c)): _*)
  }
}
