package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot diff — the CDC primitive: classify every key across
  * two table versions as inserted / deleted / updated / unchanged.
  *
  * One full outer join on the key (single shuffle, both sides keyed the
  * same way) and a null-pattern CASE; update-vs-unchanged compares an
  * explicit column list via null-safe equality (`<=>`, so NULL→value and
  * value→NULL transitions count as updates). The output feeds either a
  * MERGE (apply the delta) or an audit aggregation (what changed between
  * loads) — both downstreams keyed identically, so the join's partition
  * reuse carries through.
  */
object SnapshotDiff {

  /** Like `diff`, but carries BOTH sides of every compare column
    * (`old_<c>` / `new_<c>`) — the shape incremental view maintenance
    * needs, since an update's delta is new minus old. */
  def diffWide(old: DataFrame, cur: DataFrame,
               keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    val o = old.select((keys ++ compareCols).map(c => col(c).as(s"__o_$c")): _*)
    val c = cur.select((keys ++ compareCols).map(cn => col(cn).as(s"__c_$cn")): _*)
    val cond = keys.map(k => col(s"__o_$k") === col(s"__c_$k")).reduce(_ && _)
    val changed = compareCols.map(cc => !(col(s"__o_$cc") <=> col(s"__c_$cc")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val oldKey = col(s"__o_${keys.head}")
    val curKey = col(s"__c_${keys.head}")
    o.join(c, cond, "full_outer")
      .withColumn("change_type",
        when(oldKey.isNull, lit("inserted"))
          .when(curKey.isNull, lit("deleted"))
          .when(changed, lit("updated"))
          .otherwise(lit("unchanged")))
      .select(
        keys.map(k => coalesce(col(s"__c_$k"), col(s"__o_$k")).as(k)) ++
          Seq(col("change_type")) ++
          compareCols.map(cc => col(s"__o_$cc").as(s"old_$cc")) ++
          compareCols.map(cc => col(s"__c_$cc").as(s"new_$cc")): _*)
  }

  /** One row per key present in either snapshot:
    * keys…, change_type ∈ {inserted, deleted, updated, unchanged},
    * plus `compareCols` from the NEW side (null for deletes). */
  def diff(old: DataFrame, cur: DataFrame,
           keys: Seq[String], compareCols: Seq[String]): DataFrame =
    diffWide(old, cur, keys, compareCols).select(
      keys.map(col) ++ Seq(col("change_type")) ++
        compareCols.map(cc => col(s"new_$cc").as(cc)): _*)
}
