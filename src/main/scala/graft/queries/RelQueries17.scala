package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Seventeenth analytics batch — graph/recommendation trio over the
  * house lineitem-derived part–supplier graph: Adamic–Adar link
  * prediction (wedge join through common neighbors, LibenNowell–
  * Kleinberg 2003), item–item collaborative-filtering cosine over
  * order baskets (the Amazon-style item-to-item recommender,
  * Linden 2003), and degree assortativity (Newman 2002) from exact
  * BIGINT edge-endpoint moments.
  */
object RelQueries17 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** Undirected symmetrized edge list of the house graph: part nodes
    * 0..199, supplier nodes 200..399 — id ranges disjoint, so the
    * symmetrized union is duplicate-free by construction. */
  private def und(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "lineitem").select(
        (col("l_partkey") % 200).as("a"), (lit(200) + col("l_suppkey") % 200).as("b"))
      .distinct()
    e.select(col("a").as("u"), col("b").as("v"))
      .union(e.select(col("b").as("u"), col("a").as("v")))
  }

  // ------------------------------------------------ link prediction

  /** Adamic–Adar link prediction: for each non-adjacent pair (u,v),
    * Σ_{z ∈ N(u)∩N(v)} 1/ln(deg z), each z-term floored to integral
    * micros BEFORE the sum (shuffle-order-proof). The pair inventory
    * comes from a wedge equi-join through the shared neighbor z —
    * partition width = deg(z), never an all-pairs product — then an
    * anti-join strikes existing edges. Top 20 predicted links. */
  def linkPrediction(s: SparkSession, dir: String): DataFrame = {
    val g = und(s, dir).localCheckpoint(true) // reused 4× (deg, 2 wedge sides, anti)
    val deg = g.groupBy("u").agg(count(lit(1)).as("d"))
    val invd = deg.filter(col("d") > 1)
      .select(col("u").as("z"),
        floor(lit(1e6) / log(col("d").cast("double"))).cast("long").as("w"))
    val wedges = g.as("x")
      .join(g.as("y"), col("x.v") === col("y.v") && col("x.u") < col("y.u"))
      .join(invd, col("z") === col("x.v"))
      .groupBy(col("x.u").as("u"), col("y.u").as("v"))
      .agg(sum(col("w")).as("aa_micro"), count(lit(1)).as("common"))
    wedges.join(g.withColumnRenamed("u", "eu").withColumnRenamed("v", "ev"),
        col("u") === col("eu") && col("v") === col("ev"), "left_anti")
      .select(col("u"), col("v"), col("common"), col("aa_micro"))
      .orderBy(col("aa_micro").desc, col("u"), col("v"))
      .limit(20)
  }

  val linkPredictionSql: String = """
WITH e AS (SELECT DISTINCT l_partkey % 200 AS a, 200 + l_suppkey % 200 AS b FROM lineitem),
und AS (SELECT a AS u, b AS v FROM e UNION SELECT b, a FROM e),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY 1),
invd AS (SELECT u AS z, CAST(floor(1000000.0 / ln(CAST(d AS DOUBLE))) AS BIGINT) AS w FROM deg WHERE d > 1),
cand AS (
  SELECT x.u AS u, y.u AS v, CAST(SUM(i.w) AS BIGINT) AS aa_micro, CAST(COUNT(*) AS BIGINT) AS common
  FROM und x JOIN und y ON x.v = y.v AND x.u < y.u JOIN invd i ON i.z = x.v
  GROUP BY 1, 2),
nonedge AS (
  SELECT c.* FROM cand c LEFT JOIN und ON und.u = c.u AND und.v = c.v WHERE und.u IS NULL)
SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v, common, aa_micro
FROM nonedge ORDER BY aa_micro DESC, u, v LIMIT 20
"""

  // ------------------------------------------------ item-item CF

  /** Item–item collaborative filtering: binary basket membership
    * (order contains item), co-occurrence via the orderkey-partitioned
    * basket self-join (partition width = basket size, the q_assoc_rules
    * cost contract), cosine = c/√(n_i·n_j) as ONE scalar double per
    * surviving pair floored to micros. Top 20 most-similar pairs. */
  def itemCf(s: SparkSession, dir: String): DataFrame = {
    val bi = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), (col("l_partkey") % 100).as("i"))
      .distinct().localCheckpoint(true) // basket self-join + two norm joins
    val ni = bi.groupBy("i").agg(count(lit(1)).as("n"))
    val co = bi.as("a")
      .join(bi.as("b"), col("a.o") === col("b.o") && col("a.i") < col("b.i"))
      .groupBy(col("a.i").as("i1"), col("b.i").as("i2"))
      .agg(count(lit(1)).as("c"))
    co.join(ni.withColumnRenamed("i", "i1").withColumnRenamed("n", "n1"), "i1")
      .join(ni.withColumnRenamed("i", "i2").withColumnRenamed("n", "n2"), "i2")
      .select(col("i1"), col("i2"), col("c").as("cooc"),
        floor(col("c") * lit(1e6) / sqrt(col("n1").cast("double") * col("n2")))
          .cast("long").as("cos_micro"))
      .orderBy(col("cos_micro").desc, col("i1"), col("i2"))
      .limit(20)
  }

  val itemCfSql: String = """
WITH bi AS (SELECT DISTINCT l_orderkey AS o, l_partkey % 100 AS i FROM lineitem),
ni AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n FROM bi GROUP BY 1),
co AS (SELECT a.i AS i1, b.i AS i2, CAST(COUNT(*) AS BIGINT) AS c
       FROM bi a JOIN bi b ON a.o = b.o AND a.i < b.i GROUP BY 1, 2)
SELECT CAST(i1 AS BIGINT) AS i1, CAST(i2 AS BIGINT) AS i2, c AS cooc,
       CAST(floor(c * 1000000.0 / sqrt(CAST(n1.n AS DOUBLE) * n2.n)) AS BIGINT) AS cos_micro
FROM co JOIN ni n1 ON n1.i = co.i1 JOIN ni n2 ON n2.i = co.i2
ORDER BY cos_micro DESC, i1, i2 LIMIT 20
"""

  // ------------------------------------------- degree assortativity

  /** Newman degree assortativity: Pearson correlation of endpoint
    * degrees over the directed-edge inventory of the symmetrized
    * graph. Exact BIGINT moments (n, Σx, Σy, Σxy, Σx², Σy²) reduce to
    * ONE closed-form double floored to micros — the q_welch_t float
    * contract. The strongly negative value is structural: bipartite
    * hub-and-spoke graphs are disassortative. */
  def degreeAssortativity(s: SparkSession, dir: String): DataFrame = {
    val g = und(s, dir).localCheckpoint(true) // deg + both endpoint joins
    val deg = g.groupBy("u").agg(count(lit(1)).as("d"))
    val ed = g.join(deg.withColumnRenamed("u", "uu").withColumnRenamed("d", "x"),
        col("u") === col("uu"))
      .join(deg.withColumnRenamed("u", "vv").withColumnRenamed("d", "y"),
        col("v") === col("vv"))
      .select("x", "y")
    // Zero degree variance (every node the same degree — the saturated
    // regime this synthetic bipartite graph reaches once the fact table
    // covers all 200×200 key pairs, first seen at sf0.1) makes
    // assortativity 0/0: mathematically undefined, so emit NULL. The
    // guard mirrors DuckDB exactly — its float division yields NULL on
    // a zero divisor, while Spark's ANSI mode throws without it.
    val num = col("n").cast("double") * col("sxy") -
      col("sx").cast("double") * col("sy")
    val den = sqrt((col("n").cast("double") * col("sxx") -
        col("sx").cast("double") * col("sx")) *
      (col("n").cast("double") * col("syy") -
        col("sy").cast("double") * col("sy")))
    ed.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("n"),
        floor(when(den === 0d, lit(null)).otherwise(num / den) * lit(1e6))
          .cast("long").as("assort_micro"))
  }

  val degreeAssortativitySql: String = """
WITH e AS (SELECT DISTINCT l_partkey % 200 AS a, 200 + l_suppkey % 200 AS b FROM lineitem),
und AS (SELECT a AS u, b AS v FROM e UNION SELECT b, a FROM e),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY 1),
ed AS (SELECT du.d AS x, dv.d AS y FROM und JOIN deg du ON du.u = und.u JOIN deg dv ON dv.u = und.v),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy FROM ed)
SELECT n, CAST(floor(CASE
       WHEN sqrt((CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx) * (CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy)) = 0
       THEN NULL
       ELSE (CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)
            / sqrt((CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx) * (CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy))
       END * 1000000.0) AS BIGINT) AS assort_micro
FROM m
"""

  // ------------------------------------------------------- registry

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_link_prediction" -> (linkPrediction _),
    "q_item_cf" -> (itemCf _),
    "q_degree_assortativity" -> (degreeAssortativity _))

  def oracles: Map[String, String] = Map(
    "q_link_prediction" -> linkPredictionSql,
    "q_item_cf" -> itemCfSql,
    "q_degree_assortativity" -> degreeAssortativitySql)
}
