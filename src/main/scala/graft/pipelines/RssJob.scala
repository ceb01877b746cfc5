package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.CarryForward

/** The RSS ingest dataflow (SURVEY §3.2) as one declarative plan:
  * R4 summary carry-forward → R5 position filter → R8 broadcast dim join.
  *
  * The reference walks each account's feed sequentially and mutates latch
  * variables (`RSS PARSER/gcp_rss.py:49,84-92`); here every account is an
  * independent window partition, so the whole fleet of feeds processes in
  * parallel and the per-feed sequential semantics are preserved by the
  * window order.
  */
object RssJob {

  /** @param entries     flattened feed entries; must contain `accountKey`,
    *                    the `orderBy` columns (feed order), `summaryCols`
    *                    (null except on summary entries) and
    *                    `positionFlag` (null on non-position entries, R5)
    * @param accounts    small dim table keyed by `accountKey` (R8) —
    *                    broadcast, never shuffled
    */
  def process(entries: DataFrame, accounts: DataFrame, accountKey: String,
              orderBy: Seq[Column], summaryCols: Seq[String],
              positionFlag: String): DataFrame = {
    val latched = CarryForward.lastNonNull(
      entries, Seq(accountKey), orderBy, summaryCols)
    val positions = latched.filter(col(positionFlag).isNotNull)
    positions.join(broadcast(accounts), Seq(accountKey), "left")
  }
}
