package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Fourth relational batch: generators (stack/posexplode), MapType
  * operations, deterministic sampling, histograms, SCD2 dimension builds,
  * and moment-based statistics (z-score outliers, grouped correlation)
  * computed from exact integer sums so the DuckDB twin matches
  * bit-for-bit (see SKILL.md float discipline: double sums are
  * order-dependent; integer sums are not, and every scalar double op on
  * equal inputs is IEEE-deterministic in both engines).
  */
object RelQueries4 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** round(c·10^scale) as an exact long (cents trick). */
  private def cents(c: Column, scale: Int): Column =
    round(c * math.pow(10, scale).toLong).cast("long")

  // ---------------------------------------------------------------- unpivot

  /** Wide→long unpivot of lineitem's four measures via `stack` (the
    * Spark generator form of UNPIVOT), then per-(flag, metric) stats.
    * stack is a codegen'd generator — rows fan out 4× map-side with no
    * shuffle until the aggregation, which combines partially. */
  def unpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), expr(
        "stack(4, 'quantity', l_quantity, 'extendedprice', l_extendedprice," +
          " 'discount', l_discount, 'tax', l_tax) as (metric, value)"))
      .groupBy("l_returnflag", "metric")
      .agg(count(lit(1)).as("n"),
        (sum(cents(col("value"), 2)).cast("double") / 100.0).as("sum_value"))
      .orderBy("l_returnflag", "metric")

  val unpivotSql: String = """
WITH u AS (
  SELECT l_returnflag, 'quantity' AS metric, l_quantity AS value FROM lineitem
  UNION ALL SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT l_returnflag, 'discount', l_discount FROM lineitem
  UNION ALL SELECT l_returnflag, 'tax', l_tax FROM lineitem)
SELECT l_returnflag, metric, COUNT(*) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
FROM u GROUP BY l_returnflag, metric
ORDER BY l_returnflag, metric
"""

  // ------------------------------------------------------------- posexplode

  /** Ordinal-preserving explode: `posexplode(split(...))` — one row per
    * (row, position, token). The generator runs inside the scan stage;
    * the bound (`p_partkey < 200`) is pushed into the parquet scan. */
  def posexplodeSplit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_partkey") < 200)
      .select(col("p_partkey"), posexplode(split(col("p_type"), " ")).as(Seq("pos", "word")))
      .orderBy("p_partkey", "pos")

  val posexplodeSplitSql: String = """
SELECT p_partkey, u.pos AS pos, u.word AS word
FROM (
  SELECT p_partkey,
         unnest(list_transform(range(1, len(words) + 1),
                               i -> struct_pack(pos := CAST(i - 1 AS INTEGER), word := words[i]))) AS u
  FROM (SELECT p_partkey, string_split(p_type, ' ') AS words FROM part WHERE p_partkey < 200)) s
ORDER BY p_partkey, pos
"""

  // ---------------------------------------------------------------- map ops

  /** MapType pipeline: build → concat → transform_values → filter →
    * explode back to rows. Note the scale caveat: map higher-order
    * functions (`transform_values`, `map_filter`) are interpreted, not
    * codegen'd — fine for dimension-sized data like this bounded part
    * slice; on a 100 TB fact path, explode to rows first and use
    * relational ops (the shape `q_posexplode_split` demonstrates). */
  def mapOps(s: SparkSession, dir: String): DataFrame = {
    val base = map_from_arrays(
      array(lit("brand"), lit("type")),
      array(col("p_brand"), col("p_type")))
    val merged = map_concat(base, map(lit("size"), col("p_size").cast("string")))
    val tagged = transform_values(merged, (k, v) => concat(k, lit(":"), v))
    val pruned = map_filter(tagged, (k, _) => k =!= "type")
    t(s, dir, "part")
      .filter(col("p_partkey") < 100)
      .select(col("p_partkey"), explode(pruned).as(Seq("key", "value")))
      .orderBy("p_partkey", "key")
  }

  val mapOpsSql: String = """
WITH p AS (SELECT p_partkey, p_brand, p_size FROM part WHERE p_partkey < 100)
SELECT p_partkey, key, value FROM (
  SELECT p_partkey, 'brand' AS key, concat('brand:', p_brand) AS value FROM p
  UNION ALL
  SELECT p_partkey, 'size', concat('size:', CAST(p_size AS VARCHAR)) FROM p)
ORDER BY p_partkey, key
"""

  // ------------------------------------------------------------ hash sample

  /** Deterministic ~10% sample: keep rows whose keyed md5 bucket falls
    * under the threshold — the reproducible TABLESAMPLE. Unlike
    * `sample()` (partition-count dependent) the membership is a pure
    * function of the key: stable across re-runs, engines, partitionings,
    * and appends, so a sampled metric is re-computable bit-for-bit. */
  def sampleHash(s: SparkSession, dir: String): DataFrame = {
    val h = substring(md5(concat(
      lit("smp|"), col("l_orderkey").cast("string"),
      lit("|"), col("l_linenumber").cast("string"))), 1, 4)
    t(s, dir, "lineitem")
      .filter(h < "199a")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        (sum(cents(col("l_quantity"), 0))).as("sum_qty"),
        (sum(cents(col("l_extendedprice"), 2)).cast("double") / 100.0).as("sum_price"))
      .orderBy("l_returnflag")
  }

  val sampleHashSql: String = """
SELECT l_returnflag, COUNT(*) AS n,
       CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
FROM lineitem
WHERE substr(md5(concat('smp|', CAST(l_orderkey AS VARCHAR), '|', CAST(l_linenumber AS VARCHAR))), 1, 4) < '199a'
GROUP BY l_returnflag ORDER BY l_returnflag
"""

  // -------------------------------------------------------------- histogram

  /** Fixed-width histogram of order totals: 20 × 25k buckets, top-clamped.
    * Bucketing is integral arithmetic on cents (no float binning drift);
    * one map-side-combined aggregation — the 100 TB histogram shape. */
  def histogram(s: SparkSession, dir: String): DataFrame = {
    val c = cents(col("o_totalprice"), 2)
    val bucket = least((c / lit(2500000L)).cast("long"), lit(19L)).as("bucket")
    t(s, dir, "orders")
      .select(bucket, col("o_totalprice"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy("bucket")
  }

  val histogramSql: String = """
SELECT least(CAST(round(o_totalprice * 100) AS BIGINT) // 2500000, 19) AS bucket,
       COUNT(*) AS n, min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
FROM orders GROUP BY bucket ORDER BY bucket
"""

  // ------------------------------------------------------------------- scd2

  /** SCD type-2 dimension build from an ordered change stream: each order
    * opens a validity interval that the customer's next order closes
    * (lead over a total order; the orderkey tiebreak makes same-day rows
    * deterministic). The partition key is the natural distribution key —
    * one shuffle, then per-customer windows run partition-local. */
  def scd2(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .filter(col("o_custkey") < 50)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("o_orderdate").as("valid_from"),
        lead(col("o_orderdate"), 1).over(w).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy("o_custkey", "valid_from", "o_orderkey")
  }

  val scd2Sql: String = """
SELECT o_custkey, o_orderkey, o_totalprice,
       o_orderdate AS valid_from,
       lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS valid_to,
       lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
FROM orders WHERE o_custkey < 50
ORDER BY o_custkey, valid_from, o_orderkey
"""

  // ---------------------------------------------------------------- z-score

  /** Per-group z-score outliers (|z| > 3) over event values. Moments come
    * from exact integer sums (cents; squares summed as decimal — bigint
    * squares overflow at real scale), so mean/σ are identical doubles in
    * both engines; everything after is scalar IEEE arithmetic. Two
    * passes: tiny per-group stats frame broadcast back onto the stream —
    * no window over the whole fact table. */
  def zscoreOutliers(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"),
        cents(col("value"), 2).as("xc"))
    val stats = ev.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("xc")).as("s"),
      sum(col("xc").cast("decimal(19,0)") * col("xc").cast("decimal(19,0)")).as("ss"))
    val m = col("s").cast("double") / col("n").cast("double")
    val z = ((col("xc").cast("double") - m) /
      sqrt(col("ss").cast("double") / col("n").cast("double") - m * m)).as("zraw")
    ev.join(broadcast(stats), "event_type")
      .withColumn("zraw", z)
      .filter(abs(col("zraw")) > 3)
      .select(col("event_id"), col("event_type"), col("value"),
        (floor(col("zraw") * 1e6) / 1e6).as("zscore"))
      .orderBy("event_id")
  }

  val zscoreOutliersSql: String = """
WITH x AS (
  SELECT event_id, event_type, value, CAST(round(value * 100) AS BIGINT) AS xc FROM events),
st AS (
  SELECT event_type, COUNT(*) AS n, SUM(xc) AS s, SUM(CAST(xc AS HUGEINT) * xc) AS ss
  FROM x GROUP BY event_type),
z AS (
  SELECT x.event_id, x.event_type, x.value,
         (CAST(xc AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
           / sqrt(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
                  - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) AS zraw
  FROM x JOIN st USING (event_type))
SELECT event_id, event_type, value, floor(zraw * 1e6) / 1e6 AS zscore
FROM z WHERE abs(zraw) > 3 ORDER BY event_id
"""

  // ------------------------------------------------------------ correlation

  /** Grouped Pearson correlation from the five exact integer power sums —
    * the numerically-honest `corr()`: no per-partition running-mean
    * drift, map-side combinable, and reproducible cross-engine (built-in
    * `corr` is a double accumulation, order-dependent). */
  def corrGrouped(s: SparkSession, dir: String): DataFrame = {
    val q = cents(col("l_quantity"), 0).cast("decimal(19,0)")
    val p = cents(col("l_extendedprice"), 2).cast("decimal(19,0)")
    val st = t(s, dir, "lineitem").groupBy("l_returnflag").agg(
      count(lit(1)).as("n"),
      sum(q).as("sq"), sum(p).as("sp"),
      sum(q * p).as("sqp"), sum(q * q).as("sqq"), sum(p * p).as("spp"))
    val n = col("n").cast("double")
    val D = (c: Column) => c.cast("double")
    val num = n * D(col("sqp")) - D(col("sq")) * D(col("sp"))
    val den = sqrt(n * D(col("sqq")) - D(col("sq")) * D(col("sq"))) *
      sqrt(n * D(col("spp")) - D(col("sp")) * D(col("sp")))
    st.select(col("l_returnflag"), col("n"),
        (floor(num / den * 1e6) / 1e6).as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  val corrGroupedSql: String = """
WITH x AS (
  SELECT l_returnflag,
         CAST(round(l_quantity) AS HUGEINT) AS q,
         CAST(round(l_extendedprice * 100) AS HUGEINT) AS p
  FROM lineitem),
st AS (
  SELECT l_returnflag, COUNT(*) AS n, SUM(q) AS sq, SUM(p) AS sp,
         SUM(q * p) AS sqp, SUM(q * q) AS sqq, SUM(p * p) AS spp
  FROM x GROUP BY l_returnflag)
SELECT l_returnflag, n,
       floor((CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)))
             * 1e6) / 1e6 AS corr_qty_price
FROM st ORDER BY l_returnflag
"""

  // ------------------------------------------------------------- array ops

  /** Collection-function surface over key-derived int arrays (pure
    * functions of the row key — engine-portable): intersect, union,
    * except, slice, containment. Outputs are sorted before comparison
    * because set-operation element order is engine-specific. */
  def arrayOps(s: SparkSession, dir: String): DataFrame = {
    val a = sequence(col("o_orderkey") % 5, col("o_orderkey") % 5 + 4)
    val b = sequence(col("o_orderkey") % 3, col("o_orderkey") % 3 + 5)
    // Array results are serialized to comma-joined strings at the output
    // edge: the driver's oracle compare hashes cell values, and raw array
    // cells aren't hashable there. The array ops themselves still run on
    // native ArrayType columns.
    def joined(c: Column) = array_join(c.cast("array<string>"), ",")
    t(s, dir, "orders")
      .filter(col("o_orderkey") < 500)
      .select(col("o_orderkey"),
        joined(sort_array(array_intersect(a, b))).as("inter"),
        joined(sort_array(array_union(a, b))).as("uni"),
        joined(sort_array(array_except(a, b))).as("diff"),
        joined(slice(a, 2, 3)).as("sl"),
        array_contains(b, lit(4L)).as("has4"),
        size(array_distinct(concat(a, b))).as("n_distinct"))
      .orderBy("o_orderkey")
  }

  val arrayOpsSql: String = """
WITH x AS (
  SELECT o_orderkey,
         range(o_orderkey % 5, o_orderkey % 5 + 5) AS a,
         range(o_orderkey % 3, o_orderkey % 3 + 6) AS b
  FROM orders WHERE o_orderkey < 500)
SELECT o_orderkey,
       COALESCE(array_to_string(list_transform(list_sort(list_filter(a, v -> list_contains(b, v))), v -> CAST(v AS VARCHAR)), ','), '') AS inter,
       COALESCE(array_to_string(list_transform(list_sort(list_distinct(list_concat(a, b))), v -> CAST(v AS VARCHAR)), ','), '') AS uni,
       COALESCE(array_to_string(list_transform(list_sort(list_filter(a, v -> NOT list_contains(b, v))), v -> CAST(v AS VARCHAR)), ','), '') AS diff,
       COALESCE(array_to_string(list_transform(a[2:4], v -> CAST(v AS VARCHAR)), ','), '') AS sl,
       list_contains(b, 4) AS has4,
       len(list_distinct(list_concat(a, b))) AS n_distinct
FROM x ORDER BY o_orderkey
"""

  // -------------------------------------------------------- date arithmetic

  /** Calendar arithmetic with engine-portable semantics: day adds, day
    * diffs, month truncation, end-of-month, and integer date parts.
    * (Fractional `months_between` and day-of-week numbering are
    * deliberately avoided — both differ across engines.) */
  def dateArith(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") < 1000)
      .select(col("o_orderkey"),
        to_date(col("o_orderdate")).as("d"),
        date_add(to_date(col("o_orderdate")), 30).as("d_plus30"),
        datediff(to_date(lit("1998-12-31")), to_date(col("o_orderdate"))).as("days_to_end"),
        trunc(to_date(col("o_orderdate")), "month").as("month_start"),
        last_day(to_date(col("o_orderdate"))).as("month_end"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"))
      .orderBy("o_orderkey")

  val dateArithSql: String = """
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS d,
       CAST(o_orderdate AS DATE) + 30 AS d_plus30,
       datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_end,
       date_trunc('month', CAST(o_orderdate AS DATE)) AS month_start,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(year(o_orderdate) AS INTEGER) AS y,
       CAST(month(o_orderdate) AS INTEGER) AS m,
       CAST(day(o_orderdate) AS INTEGER) AS dom
FROM orders WHERE o_orderkey < 1000
ORDER BY o_orderkey
"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_array_ops" -> (arrayOps _),
    "q_date_arith" -> (dateArith _),
    "q_unpivot" -> (unpivot _),
    "q_posexplode_split" -> (posexplodeSplit _),
    "q_map_ops" -> (mapOps _),
    "q_sample_hash" -> (sampleHash _),
    "q_histogram" -> (histogram _),
    "q_scd2" -> (scd2 _),
    "q_zscore_outliers" -> (zscoreOutliers _),
    "q_corr_grouped" -> (corrGrouped _))

  val oracles: Map[String, String] = Map(
    "q_array_ops" -> arrayOpsSql,
    "q_date_arith" -> dateArithSql,
    "q_unpivot" -> unpivotSql,
    "q_posexplode_split" -> posexplodeSplitSql,
    "q_map_ops" -> mapOpsSql,
    "q_sample_hash" -> sampleHashSql,
    "q_histogram" -> histogramSql,
    "q_scd2" -> scd2Sql,
    "q_zscore_outliers" -> zscoreOutliersSql,
    "q_corr_grouped" -> corrGroupedSql)
}
