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

  /** Forward as-of join — earliest right row with `rightTime >= leftTime`
    * per key. Mirror of `backward`: same union + single-shuffle window
    * shape, with the frame flipped to [current, ∞) and left rows sorting
    * before simultaneous right rows so an exactly-equal time still
    * matches. Among right rows sharing (key, time) the row sorting FIRST
    * under `rightTieBreak` wins. */
  def forward(left: DataFrame, leftKey: String, leftTime: String,
              right: DataFrame, rightKey: String, rightTime: String,
              rightPayload: Seq[String],
              rightTieBreak: Seq[String] = Nil): DataFrame = {
    val leftStruct = struct(left.columns.toIndexedSeq.map(col): _*)
    val leftType = StructType(left.schema.fields)
    val payloadStruct = struct(rightPayload.map(col): _*)
    val payloadType = StructType(rightPayload.map(c => right.schema(c)))

    val l2 = left.select(
      col(leftKey).as("__k") +: col(leftTime).as("__t") +: lit(1).as("__side") +:
        leftStruct.as("__l") +: lit(null).cast(payloadType).as("__p") +:
        rightTieBreak.map(c => lit(null).cast(right.schema(c).dataType).as(s"__tb_$c")): _*)
    val r2 = right.select(
      col(rightKey).as("__k") +: col(rightTime).as("__t") +: lit(0).as("__side") +:
        lit(null).cast(leftType).as("__l") +: payloadStruct.as("__p") +:
        rightTieBreak.map(c => col(c).as(s"__tb_$c")): _*)

    // Left rows sort before right rows at equal time (__side desc: 1 then
    // 0) so a simultaneous right row falls inside the following frame.
    val order: Seq[Column] =
      col("__t") +: col("__side").desc +: rightTieBreak.map(c => col(s"__tb_$c"))
    val w = Window.partitionBy(col("__k")).orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    l2.unionByName(r2)
      .withColumn("__asof", first(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +: rightPayload.map(c => col(s"__asof.$c").as(c)): _*)
  }

  /** Broadcast backward as-of — the small-right-side variant. The union
    * + window form (`backward`) shuffles BOTH sides on the join key; when
    * the right side is dim-sized (rate tables, daily rollups) that wastes
    * a fact-table shuffle on a skew-prone key. Here the right side
    * broadcasts, the fact side equi-joins with the `rightTime <=
    * leftTime` residual, and one aggregation keyed by the left row id
    * (uniform by construction — no key skew) picks the latest match via
    * `max_by`, which combines map-side. Left rows with no match keep
    * null payloads (max_by ignores null-ordered rows).
    *
    * @param leftId unique left row id (the aggregation key) */
  def backwardBroadcast(left: DataFrame, leftId: String, leftKey: String,
                        leftTime: String, right: DataFrame, rightKey: String,
                        rightTime: String, rightPayload: Seq[String],
                        rightTieBreak: Seq[String] = Nil): DataFrame = {
    val leftStruct = struct(left.columns.toIndexedSeq.map(col): _*)
    val pCols = (rightPayload ++ rightTieBreak).distinct
    val r2 = right.select(
      col(rightKey).as("__rk"), col(rightTime).as("__rt"),
      struct(pCols.map(col) :+ col(rightTime).as("__ort"): _*).as("__p"))
    val ord = struct(
      col("__p.__ort") +: rightTieBreak.map(c => col(s"__p.$c")): _*)
    left.select(col(leftId).as("__lid"), col(leftKey).as("__lk"),
        col(leftTime).as("__lt"), leftStruct.as("__l"))
      .join(broadcast(r2),
        col("__lk") === col("__rk") && col("__rt") <= col("__lt"), "left_outer")
      .groupBy("__lid")
      .agg(first(col("__l")).as("__l"), max_by(col("__p"), ord).as("__asof"))
      .select(col("__l.*") +: rightPayload.map(c => col(s"__asof.$c").as(c)): _*)
  }

  /** Nearest as-of join — whichever of the backward and forward matches
    * is closer in time wins; exact ties prefer backward. `tolerance`
    * (same units as seconds-as-double, i.e. timestamps cast to double)
    * drops matches farther than the bound, leaving nulls.
    *
    * One union, one shuffle, two window sorts (the backward and forward
    * orderings differ only in the side tiebreak): both candidate
    * payloads materialize per left row and a scalar CASE picks the
    * winner. Right rows should be unique per (key, time) — pre-dedup if
    * not (ties within a side are otherwise plan-order dependent). */
  /** Time as epoch-seconds double (timestamps via exact integer micros —
    * µs counts sit well inside double's 2^53 exact range; a direct
    * ts→double cast is unsupported for NTZ). */
  private def epochSeconds(c: Column, dt: org.apache.spark.sql.types.DataType): Column = dt match {
    case org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType =>
      unix_micros(c.cast("timestamp")).cast("double") / 1e6
    case _ => c.cast("double")
  }

  def nearest(left: DataFrame, leftKey: String, leftTime: String,
              right: DataFrame, rightKey: String, rightTime: String,
              rightPayload: Seq[String],
              tolerance: Option[Column] = None): DataFrame = {
    val leftStruct = struct(left.columns.toIndexedSeq.map(col): _*)
    val leftType = StructType(left.schema.fields)
    val payloadStruct = struct(
      rightPayload.map(col) :+
        epochSeconds(col(rightTime), right.schema(rightTime).dataType).as("__rt"): _*)
    val payloadType = StructType(
      rightPayload.map(c => right.schema(c)) :+
        org.apache.spark.sql.types.StructField("__rt", org.apache.spark.sql.types.DoubleType))

    val l2 = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      leftStruct.as("__l"), lit(null).cast(payloadType).as("__p"))
    val r2 = right.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
      lit(null).cast(leftType).as("__l"), payloadStruct.as("__p"))

    val wb = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__side").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val lt = epochSeconds(col("__t"), left.schema(leftTime).dataType)
    val db = lt - col("__b.__rt")
    val df_ = col("__f.__rt") - lt
    val bOk = col("__b").isNotNull && tolerance.map(db <= _).getOrElse(lit(true))
    val fOk = col("__f").isNotNull && tolerance.map(df_ <= _).getOrElse(lit(true))
    val chosen = when(bOk && (!fOk || db <= df_), col("__b"))
      .when(fOk, col("__f"))
      .otherwise(lit(null).cast(payloadType))

    l2.unionByName(r2)
      .withColumn("__b", last(col("__p"), ignoreNulls = true).over(wb))
      .withColumn("__f", first(col("__p"), ignoreNulls = true).over(wf))
      .filter(col("__side") === 1)
      .withColumn("__n", chosen)
      .select(col("__l.*") +: rightPayload.map(c => col(s"__n.$c").as(c)): _*)
  }
}
