package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed MERGE/upsert as a relational plan — the engine-native answer to
  * the reference's `INSERT … ON CONFLICT … DO UPDATE` sinks:
  *
  *  - C10 `historical_trades` (`CSV PARSER/gcp_csv.py:38-67`): 15 trade
  *    columns updated on conflict, 6 GPT enrichment columns INSERT-ONLY
  *    (preserved on update).
  *  - R9  `account_metadata` (`RSS PARSER/gcp_rss.py:66-80`): same
  *    preserve pattern on `strategy_inferred`/`gpt_comments`.
  *  - R10 `rss_trades` (`RSS PARSER/gcp_rss.py:114-170`): ALL non-key
  *    columns updated, including the GPT columns (overwritten to NULL).
  *
  * The C10-vs-R10 delta is expressed purely via the `updateCols` /
  * `insertOnlyCols` lists. Update semantics are presence-based, not
  * `coalesce`: a matched source row overwrites an update-column even with
  * NULL (exactly what R10 does), while insert-only columns keep the
  * target's value whenever the target row exists.
  *
  * Physical shape: one full-outer shuffle join on the key. When the batch
  * (source) is small relative to the target — the common incremental-load
  * case at 100 TB — Catalyst/AQE picks the join strategy; with a bucketed
  * or pre-partitioned target the shuffle is one-sided.
  */
object Merge {

  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String],
             updateCols: Seq[String], insertOnlyCols: Seq[String]): DataFrame = {
    val t = target.alias("__t")
    val s = source.alias("__s")
    val cond = keys.map(k => col(s"__t.$k") <=> col(s"__s.$k")).reduce(_ && _)
    val joined = t.join(s, cond, "full_outer")
    // Keys are non-null in all reference tables (they are PKs), so key
    // presence identifies which side exists.
    val sPresent: Column = keys.map(k => col(s"__s.$k").isNotNull).reduce(_ && _)
    val tPresent: Column = keys.map(k => col(s"__t.$k").isNotNull).reduce(_ && _)
    val outCols =
      keys.map(k => coalesce(col(s"__t.$k"), col(s"__s.$k")).as(k)) ++
        updateCols.map(c => when(sPresent, col(s"__s.$c")).otherwise(col(s"__t.$c")).as(c)) ++
        insertOnlyCols.map(c => when(tPresent, col(s"__t.$c")).otherwise(col(s"__s.$c")).as(c))
    joined.select(outCols: _*)
  }
}
