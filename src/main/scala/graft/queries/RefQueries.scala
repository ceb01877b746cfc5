package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Cleansing._
import graft.operators.{CarryForward, Dedup, Merge}
import graft.pipelines.CsvJob

/** Reference-parity operators (SURVEY §2.1/§2.2) exercised over the landed
  * testdata tables, each with a DuckDB oracle twin.
  *
  * The FXBlue-shaped inputs are synthesized deterministically FROM the
  * testdata inside the query (stringified columns, synthetic paths,
  * sentinel injection) so the oracle can reproduce the exact same staging
  * in ANSI SQL — no external CSV/RSS fixtures needed at verify time.
  */
object RefQueries {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** Scale-independent ceiling on the CSV fixture size (q_csv_source):
    * well above the l_orderkey<2000 selection at any SF (orderkey space
    * scales with SF, so that predicate selects a near-constant row
    * count), and a hard driver-memory guard if it didn't. */
  val FixtureRowCap: Int = 100000

  /** Flagship: the full CSV-job pipeline C3→C9 on lineitem. */
  def csvPipeline(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    // Stage an FXBlue-export-shaped frame: string-typed columns, a source
    // object path, one malformed numeric per 7 lines, intra-"file" order.
    val raw = li.select(
      concat(lit("gs://ingest/testcsvs/acct_"),
        (col("l_suppkey") % 10).cast("string"), lit(".csv")).as("__path"),
      col("l_orderkey").cast("string").as("Ticket"),
      concat(lit("SYM"), (col("l_partkey") % 7).cast("string")).as("Symbol"),
      col("l_quantity").cast("string").as("Lots"),
      when(col("l_linenumber") === 7, lit("N/A"))
        .otherwise(col("l_extendedprice").cast("string")).as("Open price"),
      date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("Close time"),
      col("l_linenumber").as("__ord"))
    val required = Seq("Ticket", "Symbol", "Lots", "Open price", "Close time")
    require(CsvJob.passesGate(raw, required), "required-column gate (C6)")
    // The testdata plants exact-duplicate (orderkey, linenumber) rows, so
    // the keep-first order must extend to payload columns for determinism.
    CsvJob.clean(raw, pathCol = "__path",
      orderCols = Seq(col("__ord"), col("symbol"), col("lots"), col("open_price")),
      renames = Map("Ticket" -> "ticket", "Symbol" -> "symbol",
        "Lots" -> "lots", "Open price" -> "open_price",
        "Close time" -> "timestamp"),
      numericCols = Seq("lots", "open_price"),
      gptCols = Seq("gpt_summary", "gpt_sentiment"))
      .select("account_id", "ticket", "symbol", "lots", "open_price",
        "timestamp", "gpt_summary", "gpt_sentiment", "row_hash")
      .orderBy("account_id", "ticket", "timestamp")
  }

  val csvPipelineSql: String = """
WITH raw AS (
  SELECT concat('gs://ingest/testcsvs/acct_', CAST(l_suppkey % 10 AS VARCHAR), '.csv') AS path,
         CAST(l_orderkey AS VARCHAR) AS ticket_s,
         concat('SYM', CAST(l_partkey % 7 AS VARCHAR)) AS symbol,
         CAST(l_quantity AS VARCHAR) AS lots_s,
         CASE WHEN l_linenumber = 7 THEN 'N/A' ELSE CAST(l_extendedprice AS VARCHAR) END AS open_price_s,
         strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS close_time_s,
         l_linenumber AS ord
  FROM lineitem
), cleaned AS (
  SELECT regexp_extract(path, '([^/]+)\.csv$', 1) AS account_id,
         TRY_CAST(ticket_s AS BIGINT) AS ticket,
         symbol,
         TRY_CAST(lots_s AS DOUBLE) AS lots,
         TRY_CAST(open_price_s AS DOUBLE) AS open_price,
         strftime(TRY_CAST(close_time_s AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S') AS "timestamp",
         CAST(NULL AS VARCHAR) AS gpt_summary,
         CAST(NULL AS VARCHAR) AS gpt_sentiment,
         ord
  FROM raw
), hashed AS (
  SELECT *,
         md5(concat_ws('|', account_id, CAST(ticket AS VARCHAR), "timestamp")) AS row_hash,
         row_number() OVER (PARTITION BY account_id, ticket, "timestamp"
                            ORDER BY ord, symbol, lots NULLS FIRST, open_price NULLS FIRST) AS rn
  FROM cleaned
)
SELECT account_id, ticket, symbol, lots, open_price, "timestamp", gpt_summary, gpt_sentiment, row_hash
FROM hashed WHERE rn = 1
ORDER BY account_id, ticket, "timestamp"
"""

  /** C2 end-to-end: materialize real preamble'd CSV files, read them back
    * through the offset-based SkipRowsCsv source, and run the C3→C9 clean.
    * The driver-side fixture write is harness plumbing (deterministic:
    * fully sorted before writing); the read+clean path is the engine. */
  def csvSource(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val staged = t(s, dir, "lineitem").filter(col("l_orderkey") < 2000).select(
      (col("l_suppkey") % 3).cast("string").as("fno"),
      col("l_orderkey").cast("string").as("ticket_s"),
      concat(lit("SYM"), (col("l_partkey") % 7).cast("string")).as("symbol"),
      col("l_quantity").cast("string").as("lots_s"),
      when(col("l_linenumber") === 7, lit("N/A"))
        .otherwise(col("l_extendedprice").cast("string")).as("price_s"),
      date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("ct_s"))
    // Fixture write without a driver collect(): the sort+limit is a
    // distributed TakeOrdered, and toLocalIterator streams rows in order
    // — driver memory is bounded by FixtureRowCap regardless of SF (the
    // l_orderkey predicate pins the logical row count; the cap is the
    // hard guard if the predicate were ever widened). Rows arrive sorted
    // by file number first, so files are written sequentially, one open
    // writer at a time.
    val fixDir = java.nio.file.Paths.get("target",
      "csv_fixture_" + dir.replaceAll("[^A-Za-z0-9]", "_"))
    java.nio.file.Files.createDirectories(fixDir)
    import scala.jdk.CollectionConverters._
    val it = staged
      .orderBy("fno", "ticket_s", "symbol", "lots_s", "price_s", "ct_s")
      .limit(FixtureRowCap)
      .toLocalIterator().asScala
    var curFno: String = null
    var w: java.io.BufferedWriter = null
    for (r <- it) {
      val fno = r.getString(0)
      if (fno != curFno) {
        if (w != null) w.close()
        w = java.nio.file.Files.newBufferedWriter(fixDir.resolve(s"acct_$fno.csv"))
        w.write("FXBlue personal export v1\n")
        w.write("Ticket,Symbol,Lots,Open price,Close time\n")
        curFno = fno
      }
      w.write(s"${r.getString(1)},${r.getString(2)},${r.getString(3)},${r.getString(4)},${r.getString(5)}\n")
    }
    if (w != null) w.close()
    val schema = StructType(Seq("Ticket", "Symbol", "Lots", "Open price", "Close time")
      .map(StructField(_, StringType)))
    val raw = graft.sources.SkipRowsCsv.read(s,
      fixDir.toAbsolutePath.toString + "/*.csv", schema)
    CsvJob.clean(raw, pathCol = "_src_file", orderCols = Seq(col("_src_offset")),
      renames = Map("Ticket" -> "ticket", "Symbol" -> "symbol", "Lots" -> "lots",
        "Open price" -> "open_price", "Close time" -> "timestamp"),
      numericCols = Seq("lots", "open_price"),
      gptCols = Seq("gpt_summary", "gpt_sentiment"))
      .select("account_id", "ticket", "symbol", "lots", "open_price",
        "timestamp", "gpt_summary", "gpt_sentiment", "row_hash")
      .orderBy("account_id", "ticket", "timestamp")
  }

  /** In-file byte-offset order restricted to a dedup group reduces to the
    * (symbol, lots, price) string order the fixture was sorted by. */
  val csvSourceSql: String = """
WITH raw AS (
  SELECT CAST(l_suppkey % 3 AS VARCHAR) AS fno,
         CAST(l_orderkey AS VARCHAR) AS ticket_s,
         concat('SYM', CAST(l_partkey % 7 AS VARCHAR)) AS symbol,
         CAST(l_quantity AS VARCHAR) AS lots_s,
         CASE WHEN l_linenumber = 7 THEN 'N/A' ELSE CAST(l_extendedprice AS VARCHAR) END AS price_s,
         strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS ct_s
  FROM lineitem WHERE l_orderkey < 2000),
cleaned AS (
  SELECT concat('acct_', fno) AS account_id,
         TRY_CAST(ticket_s AS BIGINT) AS ticket,
         symbol,
         TRY_CAST(lots_s AS DOUBLE) AS lots,
         TRY_CAST(price_s AS DOUBLE) AS open_price,
         strftime(TRY_CAST(ct_s AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S') AS "timestamp",
         CAST(NULL AS VARCHAR) AS gpt_summary,
         CAST(NULL AS VARCHAR) AS gpt_sentiment,
         lots_s, price_s
  FROM raw),
hashed AS (
  SELECT *, md5(concat_ws('|', account_id, CAST(ticket AS VARCHAR), "timestamp")) AS row_hash,
         row_number() OVER (PARTITION BY account_id, ticket, "timestamp"
                            ORDER BY symbol, lots_s, price_s) AS rn
  FROM cleaned)
SELECT account_id, ticket, symbol, lots, open_price, "timestamp", gpt_summary, gpt_sentiment, row_hash
FROM hashed WHERE rn = 1
ORDER BY account_id, ticket, "timestamp"
"""

  /** R2 + R6 + R7 scalar cleansing over orders-derived dirty strings. */
  def scalarCleansing(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val k = col("o_orderkey")
    val staged = o.select(
      k.as("o_orderkey"),
      when(k % 7 === 0, lit("-"))
        .when(k % 7 === 1, lit(""))
        .when(k % 7 === 2, concat((k % 200).cast("string"), lit("%")))
        .when(k % 7 === 3, lit("junk"))
        .otherwise((k % 150).cast("string")).as("pct_str"),
      when(k % 5 === 0, lit(EpochSentinel))
        .otherwise(date_format(col("o_orderdate"), FeedTsFmt)).as("feed_ts"),
      (k % 3).cast("string").as("tp_str"))
    staged.select(
      col("o_orderkey"),
      toPct(col("pct_str")).as("pct"),
      isoFormat(parseFeedTs(nullIfEpoch(col("feed_ts")))).as("close_time"),
      tryDouble(zeroToNull(col("tp_str"))).as("tp"))
      .orderBy("o_orderkey")
  }

  val scalarCleansingSql: String = """
WITH staged AS (
  SELECT o_orderkey,
    CASE WHEN o_orderkey % 7 = 0 THEN '-'
         WHEN o_orderkey % 7 = 1 THEN ''
         WHEN o_orderkey % 7 = 2 THEN concat(CAST(o_orderkey % 200 AS VARCHAR), '%')
         WHEN o_orderkey % 7 = 3 THEN 'junk'
         ELSE CAST(o_orderkey % 150 AS VARCHAR) END AS pct_str,
    CASE WHEN o_orderkey % 5 = 0 THEN 'Thu 1 Jan 1970 00:00:00'
         ELSE strftime(o_orderdate, '%a %-d %b %Y %H:%M:%S') END AS feed_ts,
    CAST(o_orderkey % 3 AS VARCHAR) AS tp_str
  FROM orders)
SELECT o_orderkey,
  CASE WHEN trim(pct_str) = '-' OR trim(pct_str) = '' THEN NULL
       WHEN contains(trim(pct_str), '%') THEN TRY_CAST(replace(trim(pct_str), '%', '') AS DOUBLE) / 100.0
       ELSE TRY_CAST(trim(pct_str) AS DOUBLE) END AS pct,
  strftime(strptime(CASE WHEN feed_ts = 'Thu 1 Jan 1970 00:00:00' THEN NULL ELSE feed_ts END,
                    '%a %-d %b %Y %H:%M:%S'), '%Y-%m-%dT%H:%M:%S') AS close_time,
  TRY_CAST(CASE WHEN trim(tp_str) = '0' THEN NULL ELSE tp_str END AS DOUBLE) AS tp
FROM staged ORDER BY o_orderkey
"""

  /** C9 keep-first dedup, deterministic (pandas `keep="first"` parity). */
  def dedupKeepFirst(s: SparkSession, dir: String): DataFrame =
    Dedup.keepFirst(t(s, dir, "orders"), Seq("o_custkey"),
      Seq(col("o_orderdate"), col("o_orderkey")))
      .orderBy("o_custkey")

  val dedupKeepFirstSql: String = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders) x
WHERE rn = 1 ORDER BY o_custkey
"""

  private def mergeFrames(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val o = t(s, dir, "orders")
    val target = o.filter(col("o_orderkey") % 3 =!= 0)
    val source = o.filter(col("o_orderkey") % 2 === 0).select(
      col("o_orderkey"),
      lit("U").as("o_orderstatus"),
      // Exact double op (no round(_, 2): decimal rounding of doubles is
      // engine-dependent at .xx5 shortest-repr boundaries).
      (col("o_totalprice") * 2).as("o_totalprice"),
      col("o_custkey"), col("o_orderdate"),
      lit(null).cast("string").as("o_orderpriority"))
    (target, source)
  }

  private val mergeStagingSql = """
WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
source AS (SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 2 AS o_totalprice,
                  o_custkey, o_orderdate, CAST(NULL AS VARCHAR) AS o_orderpriority
           FROM orders WHERE o_orderkey % 2 = 0)
"""

  /** C10/R9 MERGE: enrichment column (`o_orderpriority` stands in for the
    * GPT columns) is insert-only — preserved on conflict. */
  def mergePreserve(s: SparkSession, dir: String): DataFrame = {
    val (target, source) = mergeFrames(s, dir)
    Merge.upsert(target, source, keys = Seq("o_orderkey"),
      updateCols = Seq("o_orderstatus", "o_totalprice"),
      insertOnlyCols = Seq("o_custkey", "o_orderdate", "o_orderpriority"))
      .orderBy("o_orderkey")
  }

  val mergePreserveSql: String = mergeStagingSql + """
SELECT coalesce(t.o_orderkey, s.o_orderkey) AS o_orderkey,
  CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
  CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
  CASE WHEN t.o_orderkey IS NOT NULL THEN t.o_custkey ELSE s.o_custkey END AS o_custkey,
  CASE WHEN t.o_orderkey IS NOT NULL THEN t.o_orderdate ELSE s.o_orderdate END AS o_orderdate,
  CASE WHEN t.o_orderkey IS NOT NULL THEN t.o_orderpriority ELSE s.o_orderpriority END AS o_orderpriority
FROM target t FULL OUTER JOIN source s ON t.o_orderkey = s.o_orderkey
ORDER BY o_orderkey
"""

  /** R10 MERGE: every non-key column updated on conflict — the source's
    * NULL enrichment values overwrite the target's. */
  def mergeOverwrite(s: SparkSession, dir: String): DataFrame = {
    val (target, source) = mergeFrames(s, dir)
    Merge.upsert(target, source, keys = Seq("o_orderkey"),
      updateCols = Seq("o_orderstatus", "o_totalprice", "o_custkey",
        "o_orderdate", "o_orderpriority"),
      insertOnlyCols = Nil)
      .orderBy("o_orderkey")
  }

  val mergeOverwriteSql: String = mergeStagingSql + """
SELECT coalesce(t.o_orderkey, s.o_orderkey) AS o_orderkey,
  CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
  CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
  CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey ELSE t.o_custkey END AS o_custkey,
  CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderdate ELSE t.o_orderdate END AS o_orderdate,
  CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderpriority ELSE t.o_orderpriority END AS o_orderpriority
FROM target t FULL OUTER JOIN source s ON t.o_orderkey = s.o_orderkey
ORDER BY o_orderkey
"""

  /** R4 carry-forward: last purchase value latched onto later events. */
  def carryForward(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .withColumn("purchase_value",
        when(col("event_type") === "purchase", col("value")))
    CarryForward.lastNonNull(e, Seq("user_id"),
      Seq(col("ts"), col("event_id")), Seq("purchase_value"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("purchase_value_ff").as("last_purchase_value"))
      .orderBy("event_id")
  }

  val carryForwardSql: String = """
SELECT event_id, user_id, event_type, value,
  last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
    OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
FROM events ORDER BY event_id
"""

  /** Flagship 2: the RSS-job dataflow R4→R5→R8 — events as feed entries
    * ('signup' = account summary, 'purchase' = position), customer as the
    * broadcast account dim. */
  def rssPipeline(s: SparkSession, dir: String): DataFrame = {
    val entries = t(s, dir, "events")
      .withColumn("balance", when(col("event_type") === "signup", col("value")))
      .withColumn("position_ticket",
        when(col("event_type") === "purchase", col("event_id")))
    val accounts = t(s, dir, "customer").select(
      col("c_custkey").as("user_id"),
      col("c_mktsegment").as("segment"),
      col("c_acctbal").as("acct_score"))
    graft.pipelines.RssJob.process(entries, accounts, "user_id",
      orderBy = Seq(col("ts"), col("event_id")),
      summaryCols = Seq("balance"), positionFlag = "position_ticket")
      .select(col("user_id").as("account_id"),
        col("position_ticket"),
        isoFormat(col("ts")).as("trade_time"),
        col("value").as("position_profit"),
        col("balance_ff").as("account_balance"),
        col("segment"), col("acct_score"))
      .orderBy("position_ticket")
  }

  val rssPipelineSql: String = """
WITH ff AS (
  SELECT event_id, user_id, ts, event_type, value,
    last_value(CASE WHEN event_type = 'signup' THEN value END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS balance
  FROM events)
SELECT f.user_id AS account_id, f.event_id AS position_ticket,
  strftime(f.ts, '%Y-%m-%dT%H:%M:%S') AS trade_time,
  f.value AS position_profit, f.balance AS account_balance,
  c.c_mktsegment AS segment, c.c_acctbal AS acct_score
FROM ff f LEFT JOIN customer c ON f.user_id = c.c_custkey
WHERE f.event_type = 'purchase'
ORDER BY position_ticket
"""

  /** Cap on synthesized feed entries per account: RSS feeds are bounded
    * documents by nature, and the per-key string aggregate below must
    * never build an unbounded row (2 GB string ceiling, one-task parse).
    * 4096 items ≈ 500 KB of XML — ample for a feed, safe for a task. */
  val FeedEntryCap: Int = 4096

  /** R3 end-to-end: synthesize one XML feed document per account (items
    * in time order, lexicographically sortable ord key, first
    * `FeedEntryCap` entries per account), parse through `from_xml`,
    * flatten with document order preserved as `entry_idx`. */
  def rssSource(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.expressions.Window
    val wUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val e = t(s, dir, "events")
      .withColumn("__rn", row_number().over(wUser))
      .filter(col("__rn") <= FeedEntryCap)
    val item = concat(
      lit("<item><ord>"), format_string("%020d", unix_micros(col("ts"))),
      format_string("%020d", col("event_id")),
      lit("</ord><ticket>"), col("event_id"),
      lit("</ticket><etype>"), col("event_type"),
      lit("</etype><val>"), col("value").cast("string"),
      lit("</val></item>"))
    val feeds = e.select(col("user_id"), item.as("itemx"))
      .groupBy("user_id")
      .agg(concat_ws("", sort_array(collect_list(col("itemx")))).as("body"))
      .select(col("user_id"),
        concat(lit("<rss>"), col("body"), lit("</rss>")).as("xml"))
    val itemSchema = StructType(Seq(StructField("item", ArrayType(StructType(Seq(
      StructField("ord", StringType), StructField("ticket", LongType),
      StructField("etype", StringType), StructField("val", DoubleType)))))))
    graft.sources.RssXml.entries(feeds, "xml", "item", itemSchema, Seq("user_id"))
      .select("user_id", "entry_idx", "ticket", "etype", "val")
      .orderBy("user_id", "entry_idx")
  }

  val rssSourceSql: String = """
SELECT user_id, CAST(rn - 1 AS INTEGER) AS entry_idx,
       event_id AS ticket, event_type AS etype, value AS val
FROM (SELECT user_id, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events)
WHERE rn <= 4096
ORDER BY user_id, entry_idx
"""

  /** R1 end-to-end: land the customer dim as a real ECMA-376 workbook
    * (bounded: the key predicate pins it to dim size, like q_csv_source's
    * cap), read it back through the JDK-only Xlsx source (executor-side
    * parse, schema-on-read strings), cast, and broadcast-join order
    * counts onto it — the reference's `pd.read_excel` → join flow
    * (`RSS PARSER/gcp_rss.py:24-28,49-63`). Doubles round-trip exactly:
    * shortest-repr toString parses back to the identical bits. */
  def xlsxDim(s: SparkSession, dir: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val cust = t(s, dir, "customer").filter(col("c_custkey") < 200)
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    val fixture = new java.io.File("target",
      "xlsx_fixture_" + dir.replaceAll("[^A-Za-z0-9]", "_") + "/customers.xlsx")
    val rows = cust.orderBy("c_custkey").limit(FixtureRowCap)
      .toLocalIterator().asScala
      .map(r => Seq[Any](r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
      .toSeq
    graft.sources.Xlsx.write(
      Seq("c_custkey", "c_name", "c_acctbal", "c_mktsegment"), rows, fixture)
    val dim = graft.sources.Xlsx.read(s, fixture.getAbsolutePath)
      .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
        col("c_acctbal").cast("double").as("c_acctbal"), col("c_mktsegment"))
    // Dim-preserving join at fact scale: a left-outer can only broadcast
    // its non-preserved side, so prune the fact scan with a broadcast
    // semi-join on the dim keys FIRST — the aggregation then runs over
    // only matching orders and its result is small enough to broadcast
    // back onto the preserved dim.
    val dimKeys = dim.select(col("c_custkey").as("k"))
    val counts = t(s, dir, "orders")
      .join(broadcast(dimKeys), col("o_custkey") === col("k"), "left_semi")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    dim.join(broadcast(counts), dim("c_custkey") === counts("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy("c_custkey")
  }

  val xlsxDimSql: String = """
SELECT c.c_custkey, c.c_name, c.c_acctbal, c.c_mktsegment,
       COALESCE(o.n, 0) AS n_orders
FROM customer c
LEFT JOIN (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey) o
  ON o.o_custkey = c.c_custkey
WHERE c.c_custkey < 200
ORDER BY c_custkey
"""

  /** The same R1 workbook dim through the engine's DataSource V2
    * (`spark.read.format("graft-xlsx")` — TableProvider resolved by
    * short name via the DataSourceRegister service loader): schema
    * inferred from one driver-side header read, one InputPartition per
    * workbook, and COLUMN PRUNING pushed into the scan — the query
    * touches 2 of the 4 workbook columns and the reader materializes
    * only those cells (BatchScan ReadSchema plan-asserted in XlsxSpec).
    * Same fixture-write + exact-cents aggregation contract as
    * q_xlsx_dim, so the oracle reads the customer table directly. */
  def xlsxV2(s: SparkSession, dir: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val cust = t(s, dir, "customer").filter(col("c_custkey") < 200)
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    val fixtureDir = new java.io.File("target",
      "xlsx_v2_" + dir.replaceAll("[^A-Za-z0-9]", "_"))
    val rows = cust.orderBy("c_custkey").limit(FixtureRowCap)
      .toLocalIterator().asScala
      .map(r => Seq[Any](r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
      .toSeq
    graft.sources.Xlsx.write(
      Seq("c_custkey", "c_name", "c_acctbal", "c_mktsegment"),
      rows, new java.io.File(fixtureDir, "customers.xlsx"))
    s.read.format("graft-xlsx").load(fixtureDir.getAbsolutePath)
      .select(col("c_mktsegment"),
        round(col("c_acctbal").cast("double") * 100).cast("long").as("bal_cents"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        (sum(col("bal_cents")).cast("double") / 100.0).as("total_bal"))
      .orderBy("c_mktsegment")
  }

  val xlsxV2Sql: String = """
SELECT c_mktsegment, COUNT(*) AS n,
       CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_bal
FROM customer WHERE c_custkey < 200
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_csv_pipeline" -> (csvPipeline _),
    "q_csv_source" -> (csvSource _),
    "q_xlsx_dim" -> (xlsxDim _),
    "q_xlsx_v2" -> (xlsxV2 _),
    "q_rss_source" -> (rssSource _),
    "q_scalar_cleansing" -> (scalarCleansing _),
    "q_dedup_keepfirst" -> (dedupKeepFirst _),
    "q_merge_preserve" -> (mergePreserve _),
    "q_merge_overwrite" -> (mergeOverwrite _),
    "q_carryforward" -> (carryForward _),
    "q_rss_pipeline" -> (rssPipeline _))

  val oracles: Map[String, String] = Map(
    "q_csv_pipeline" -> csvPipelineSql,
    "q_csv_source" -> csvSourceSql,
    "q_xlsx_dim" -> xlsxDimSql,
    "q_xlsx_v2" -> xlsxV2Sql,
    "q_rss_source" -> rssSourceSql,
    "q_scalar_cleansing" -> scalarCleansingSql,
    "q_dedup_keepfirst" -> dedupKeepFirstSql,
    "q_merge_preserve" -> mergePreserveSql,
    "q_merge_overwrite" -> mergeOverwriteSql,
    "q_carryforward" -> carryForwardSql,
    "q_rss_pipeline" -> rssPipelineSql)
}
