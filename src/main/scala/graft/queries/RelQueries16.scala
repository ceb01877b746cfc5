package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Sixteenth analytics batch — ML feature-prep and table-maintenance
  * operations: leave-one-out target encoding (the leakage-safe mean
  * encoder), information gain of a categorical feature against a label
  * (micro-nat floored entropy terms, the q_column_entropy discipline),
  * RFM quintile segmentation via exact-rank prefix sums over DISTINCT
  * values (the q_mannwhitney cost contract — never a global ntile sort
  * of the fact table), and a greedy small-file compaction plan (the
  * 100 TB table-maintenance primitive: cumulative-size bin packing).
  */
object RelQueries16 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  // ------------------------------------------------ target encoding

  /** Leave-one-out target encoding of customer nation by lifetime
    * order cents: encode(c) = (Σ_nation − own) / (n_nation − 1), the
    * leakage-safe variant a feature pipeline ships (own row excluded
    * so the encoding never memorizes its own label). Exact integer
    * cents end-to-end; the division is integral. Scale shape: one
    * fact aggregation, then two window functions over the nation
    * partition — no self-join, no global sort; output bounded at 25
    * rows for the gate. */
  def targetEncode(s: SparkSession, dir: String): DataFrame = {
    val co = t(s, dir, "customer").as("c")
      .join(t(s, dir, "orders").as("o"), col("o.o_custkey") === col("c.c_custkey"))
      .groupBy(col("c.c_custkey").as("c_custkey"), col("c.c_nationkey").as("nation"))
      .agg(sum(round(col("o.o_totalprice") * 100).cast("long")).as("cents"))
    val w = Window.partitionBy("nation")
    co.withColumn("tot", sum("cents").over(w))
      .withColumn("n", count(lit(1)).over(w))
      .select(col("c_custkey"), col("nation").cast("long").as("nation"),
        when(col("n") > 1, expr("(tot - cents) DIV (n - 1)"))
          .otherwise(0L).as("loo_cents"))
      .orderBy("c_custkey").limit(25)
  }

  val targetEncodeSql: String = """
WITH co AS (
  SELECT c.c_custkey, c.c_nationkey,
         CAST(SUM(CAST(round(o.o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2),
w AS (
  SELECT c_custkey, c_nationkey, cents,
         SUM(cents) OVER (PARTITION BY c_nationkey) AS tot,
         COUNT(*)  OVER (PARTITION BY c_nationkey) AS n
  FROM co)
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       CAST(c_nationkey AS BIGINT) AS nation,
       CAST(CASE WHEN n > 1 THEN (tot - cents) // (n - 1) ELSE 0 END AS BIGINT) AS loo_cents
FROM w ORDER BY c_custkey LIMIT 25
"""

  // ------------------------------------------------ information gain

  /** Information gain of p_brand predicting l_returnflag — the
    * feature-selection score IG = H(y) − H(y|f), both entropies in
    * integral micro-nats with each −p·ln(p) term floored BEFORE its
    * sum (the q_column_entropy / q_benford float discipline: scalar
    * double ops are bitwise cross-engine, sums happen on longs).
    * Scale shape: ONE (feature,label) cell aggregation — |brands|×|flags|
    * rows — then three bounded aggregates over it; the fact table is
    * touched once. The singleton total row is broadcast. */
  def infoGain(s: SparkSession, dir: String): DataFrame = {
    val cell = t(s, dir, "lineitem").as("l")
      .join(t(s, dir, "part").as("p"), col("p.p_partkey") === col("l.l_partkey"))
      .groupBy(col("p.p_brand").as("f"), col("l.l_returnflag").as("y"))
      .agg(count(lit(1)).as("c"))
    val tot = cell.agg(sum("c").as("n"))
    val hy = cell.groupBy("y").agg(sum("c").as("cy"))
      .crossJoin(broadcast(tot))
      .select(floor(-(col("cy").cast("double") / col("n"))
        * log(col("cy").cast("double") / col("n")) * 1e6).cast("long").as("t"))
      .agg(sum("t").as("h_y"))
    val hyf = cell
      .withColumn("cf", sum("c").over(Window.partitionBy("f")))
      .crossJoin(broadcast(tot))
      .select(floor(-(col("c").cast("double") / col("n"))
        * log(col("c").cast("double") / col("cf")) * 1e6).cast("long").as("t"))
      .agg(sum("t").as("h_y_f"))
    hy.crossJoin(broadcast(hyf))
      .select(col("h_y"), col("h_y_f"), (col("h_y") - col("h_y_f")).as("info_gain_micro"))
  }

  val infoGainSql: String = """
WITH j AS (
  SELECT p.p_brand AS f, l.l_returnflag AS y
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
cell AS (SELECT f, y, COUNT(*) AS c FROM j GROUP BY 1, 2),
tot AS (SELECT SUM(c) AS n FROM cell),
hy AS (
  SELECT CAST(SUM(CAST(floor(-(CAST(cy AS DOUBLE)/n) * ln(CAST(cy AS DOUBLE)/n) * 1000000.0) AS BIGINT)) AS BIGINT) AS h_y
  FROM (SELECT y, SUM(c) AS cy FROM cell GROUP BY 1), tot),
hyf AS (
  SELECT CAST(SUM(CAST(floor(-(CAST(c AS DOUBLE)/n) * ln(CAST(c AS DOUBLE)/cf) * 1000000.0) AS BIGINT)) AS BIGINT) AS h_y_f
  FROM (SELECT f, y, c, SUM(c) OVER (PARTITION BY f) AS cf FROM cell), tot)
SELECT h_y, h_y_f, CAST(h_y - h_y_f AS BIGINT) AS info_gain_micro FROM hy, hyf
"""

  // ------------------------------------------------ RFM segmentation

  /** RFM quintile segmentation: per-customer recency / frequency /
    * monetary, each mapped to a 1–5 quintile by the EXACT ceiling rank
    * `⌈5·cum/n⌉` computed from a prefix sum over one row per DISTINCT
    * metric value — the q_mannwhitney exact-rank contract (single-
    * partition pass over value cardinality, never a global ntile sort
    * of the customer table; ties share a band deterministically).
    * Recency is inverted (6−sc) so 5 = most recent, the marketing
    * convention. Output: the (r,f,m) segment rollup — ≤125 rows. */
  def rfm(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val mx = o.agg(max(to_date(col("o_orderdate"))).as("mx"))
    val cust = o.crossJoin(broadcast(mx))
      .groupBy("o_custkey")
      .agg(datediff(max(col("mx")), max(to_date(col("o_orderdate")))).cast("long").as("rec"),
        count(lit(1)).as("freq"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("mon"))
      .localCheckpoint(true) // three quintile maps + the final join reuse it
    // Cumulative counts through the range-bucketed PrefixSum: `mon`
    // (per-customer cents) has value cardinality ≈ the customer count,
    // so a global `Window.orderBy(v)` would funnel millions of distinct
    // values through one sorting task at scale (r8 fix; the last
    // data-growing unpartitioned window in the registry). The PrefixSum
    // stats are BATCHED: one job collects all three metrics' cut
    // arrays, one job histograms customer rows into all three bucket
    // spaces at once (a bucket's row count IS Σc over its distinct
    // values, so it doubles as the exclusive-offset total), and the
    // three runningSum calls then build fully lazily.
    import graft.operators.PrefixSum
    val nB = s.sessionState.conf.numShufflePartitions
    val probs = (1 until nB).map(_.toDouble / nB).toArray
    // accuracy 1000: cuts only balance load, they never touch values
    def pa(c: String) =
      percentile_approx(col(c).cast("double"), typedLit(probs), lit(1000))
    val cutsRow = cust.agg(pa("rec"), pa("freq"), pa("mon")).head()
    val metrics = Seq("rec", "freq", "mon")
    val cutsOf: Map[String, Seq[Double]] = metrics.zipWithIndex.map {
      case (m, i) => m -> Option(cutsRow.getSeq[Double](i))
        .map(_.distinct.sorted.toSeq).getOrElse(Seq.empty[Double])
    }.toMap
    val hist = cust.select(explode(array(metrics.map(m =>
        struct(lit(m).as("m"),
          PrefixSum.bucketExpr(col(m), cutsOf(m)).as("b"))): _*)).as("e"))
      .groupBy(col("e.m").as("m"), col("e.b").as("b"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val offsetsOf: Map[String, Map[Int, Long]] = metrics.map { m =>
      val tot = hist.collect { case ((`m`, b), c) => b -> c }.toSeq.sortBy(_._1)
      var acc = 0L
      m -> tot.map { case (b, c) => val o = b -> acc; acc += c; o }.toMap
    }.toMap
    // n (customer count) = Σ of any metric's histogram — a driver
    // literal, no scalar plan branch needed
    val n = hist.collect { case (("rec", _), c) => c }.sum
    def quintiles(metric: String): DataFrame =
      PrefixSum.runningSum(
        cust.groupBy(col(metric).as("v")).agg(count(lit(1)).as("c")),
        col("v"), Seq(col("v")), col("c"), "cum",
        inclusive = true, preStaged = true,
        cutsOverride = Some(cutsOf(metric)),
        offsetsOverride = Some(offsetsOf(metric)))
        .select(col("v"), expr(s"(5 * cum + $n - 1) DIV $n").as("sc"))
    val rs = quintiles("rec"); val fs = quintiles("freq"); val ms = quintiles("mon")
    cust.join(rs.withColumnRenamed("v", "rec").withColumnRenamed("sc", "rsc"), "rec")
      .join(fs.withColumnRenamed("v", "freq").withColumnRenamed("sc", "fsc"), "freq")
      .join(ms.withColumnRenamed("v", "mon").withColumnRenamed("sc", "msc"), "mon")
      .groupBy((lit(6L) - col("rsc")).as("r_seg"), col("fsc").as("f_seg"),
        col("msc").as("m_seg"))
      .agg(count(lit(1)).as("n_cust"), sum(col("mon")).as("seg_cents"))
      .orderBy("r_seg", "f_seg", "m_seg")
  }

  val rfmSql: String = """
WITH cust AS (
  SELECT o_custkey,
         CAST(date_diff('day', max(CAST(o_orderdate AS DATE)),
              (SELECT max(CAST(o_orderdate AS DATE)) FROM orders)) AS BIGINT) AS rec,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS mon
  FROM orders GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cust),
rs AS (SELECT v, (5*cum + n - 1) // n AS sc FROM
  (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM (SELECT rec AS v, COUNT(*) AS c FROM cust GROUP BY 1)), n),
fs AS (SELECT v, (5*cum + n - 1) // n AS sc FROM
  (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM (SELECT freq AS v, COUNT(*) AS c FROM cust GROUP BY 1)), n),
ms AS (SELECT v, (5*cum + n - 1) // n AS sc FROM
  (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM (SELECT mon AS v, COUNT(*) AS c FROM cust GROUP BY 1)), n)
SELECT CAST(6 - rs.sc AS BIGINT) AS r_seg, CAST(fs.sc AS BIGINT) AS f_seg, CAST(ms.sc AS BIGINT) AS m_seg,
       CAST(COUNT(*) AS BIGINT) AS n_cust, CAST(SUM(c.mon) AS BIGINT) AS seg_cents
FROM cust c JOIN rs ON c.rec = rs.v JOIN fs ON c.freq = fs.v JOIN ms ON c.mon = ms.v
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""

  // ------------------------------------------------ compaction plan

  /** Greedy small-file compaction plan — the table-maintenance pass
    * every large parquet table needs: within each source partition,
    * files (docs standing in for data files, length(text) for bytes)
    * are packed in stable id order into ~4 KiB output groups by
    * EXCLUSIVE-prefix-sum DIV target (a file starts a new group once
    * the bytes before it fill the current one). One window + one
    * aggregation; partition-parallel by source, never global. */
  def compactionPlan(s: SparkSession, dir: String): DataFrame = {
    val f = t(s, dir, "documents")
      .select(col("source"), col("doc_id"), length(col("text")).cast("long").as("sz"))
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    f.withColumn("pre", coalesce(sum("sz").over(w), lit(0L)))
      .withColumn("grp", expr("pre DIV 4096"))
      .groupBy("source", "grp")
      .agg(count(lit(1)).as("n_files"), sum("sz").as("grp_bytes"))
      .orderBy("source", "grp")
  }

  val compactionPlanSql: String = """
WITH f AS (
  SELECT source, doc_id, CAST(length(text) AS BIGINT) AS sz FROM documents),
c AS (
  SELECT source, doc_id, sz,
         SUM(sz) OVER (PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pre
  FROM f),
g AS (SELECT source, COALESCE(pre, 0) // 4096 AS grp, sz FROM c)
SELECT source, CAST(grp AS BIGINT) AS grp, CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(sz) AS BIGINT) AS grp_bytes
FROM g GROUP BY 1, 2 ORDER BY 1, 2
"""

  // ------------------------------------------------------- registry

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_target_encode" -> (targetEncode _),
    "q_info_gain" -> (infoGain _),
    "q_rfm" -> (rfm _),
    "q_compaction_plan" -> (compactionPlan _))

  def oracles: Map[String, String] = Map(
    "q_target_encode" -> targetEncodeSql,
    "q_info_gain" -> infoGainSql,
    "q_rfm" -> rfmSql,
    "q_compaction_plan" -> compactionPlanSql)
}
