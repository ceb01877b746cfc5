package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** R3 — RSS/XML feed entries as a relational source.
  *
  * The reference fetches each account's feed over HTTP and walks
  * `feedparser` entries in document order, dispatching on attribute
  * presence (`RSS PARSER/gcp_rss.py:83-95`). The network fetch is an
  * ingest-boundary adapter outside the engine; what the engine owns is
  * turning landed XML documents into ordered, typed entry rows:
  *
  *  - `from_xml` parses the document against an explicit item schema
  *    (missing tags → null fields ≡ feedparser's `hasattr` dispatch)
  *  - `posexplode` preserves document order as `entry_idx` — ORDER IS
  *    SEMANTIC in feeds (the carry-forward operator R4 depends on it)
  *
  * One XML document per row parallelizes across however many feeds exist;
  * parsing is per-row and shuffle-free.
  */
object RssXml {

  /** Flatten `(keyCols…, xmlCol)` into one row per feed item with
    * `entry_idx` in document order and the item fields from `itemSchema`
    * (an ARRAY<STRUCT<…>> element type for the repeated `<item>` tag). */
  def entries(feeds: DataFrame, xmlCol: String, itemsField: String,
              itemSchema: StructType, keyCols: Seq[String]): DataFrame = {
    val parsed = feeds.withColumn("__doc", from_xml(col(xmlCol), itemSchema))
    parsed.select(
      keyCols.map(col) :+ posexplode(col(s"__doc.$itemsField")): _*)
      .withColumnRenamed("pos", "entry_idx")
      .select(keyCols.map(col) :+ col("entry_idx") :+ col("col.*"): _*)
  }
}
