package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns._

/** Similarity search over embedding columns.
  *
  * Two strategies with identical output shape:
  *  - `bruteForceTopK`: broadcast the (small) query set against every
  *    candidate — exact, scan-bounded, the right baseline when queries ≪
  *    corpus (the common batch-scoring case; the corpus is never
  *    shuffled, just scanned once per batch of queries).
  *  - `lshBucketTopK`: sign-bit bucketing turns the cross join into an
  *    equi join on bucket id — approximate, and the 100 TB path: both
  *    sides hash-partition on the bucket, candidate sets shrink by
  *    ~2^nBits, recall tunable by probing neighbor buckets.
  *
  * Similarities are truncated to 1e-6 (`floor`, not `round` — floor on
  * doubles is bitwise engine-portable) and ranked on the truncated value
  * with an id tiebreak, so top-k membership is deterministic.
  */
object Knn {

  /** floor-truncate to 6 decimals; IEEE-exact and portable. */
  def truncSim(c: Column): Column = (floor(c * 1e6).cast("double") / 1e6)

  private def rank(sims: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    sims.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** @param queries  (qid, qe: array<double>) — small, broadcast
    * @param corpus   (vec_id, e: array<double>) */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val sims = corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), truncSim(cosineFast(col("qe"), col("e"))).as("sim"))
    rank(sims, k)
  }

  /** Element-wise cluster centroids with exact scaled-integer sums
    * (order-independent accumulation → engine-reproducible doubles).
    * Input: (clusterCol, e: array<double>); output: (clusterCol,
    * cv: array<double>). Centroid count = cluster count (small →
    * broadcast downstream). */
  def centroids(corpus: DataFrame, clusterCol: String): DataFrame =
    corpus.select(col(clusterCol), posexplode(col("e")))
      .groupBy(col(clusterCol), col("pos"))
      .agg(sum(round(col("col") * 1e6).cast("long")).as("s"), count(lit(1)).as("n"))
      .groupBy(col(clusterCol))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"),
          (col("s").cast("double") / 1e6 / col("n")).as("v")))),
        x => x.getField("v")).as("cv"))

  /** IVF-style ANN: assign each query to its `nprobe` nearest centroids,
    * then search only those clusters — the inverted-file pattern: at
    * scale the corpus is partitioned (or bucketed) by cluster id, so a
    * probe touches nprobe/nlist of the data instead of all of it.
    * Cluster assignments come from `clusterCol` (here a precomputed
    * clustering; k-means would produce the same shape). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, clusterCol: String,
              k: Int, nprobe: Int = 2): DataFrame =
    ivfTopK(queries, corpus, clusterCol, k, nprobe,
      centroids(corpus, clusterCol))

  /** Query→cluster assignment: each query's `nprobe` nearest centroids.
    * Exposed (r16) so a sweep over nprobe operating points can stage
    * the centroid frame ONCE and reuse this exact production step per
    * point — re-deriving the assignment chain in a query would risk
    * auditing a different search than the one that runs. Output:
    * (qid, qe, clusterCol). */
  def ivfAssign(queries: DataFrame, cents: DataFrame, clusterCol: String,
                nprobe: Int): DataFrame = {
    val wA = Window.partitionBy("qid")
      .orderBy(col("csim").desc, col(clusterCol))
    queries.crossJoin(broadcast(cents))
      .select(col("qid"), col("qe"), col(clusterCol),
        cosineFast(col("qe"), col("cv")).as("csim"))
      .withColumn("crank", row_number().over(wA))
      .filter(col("crank") <= nprobe)
      .select("qid", "qe", clusterCol)
  }

  /** [[ivfTopK]] with a precomputed centroid frame: callers probing the
    * same corpus at several operating points (q_ann_sweep) pass one
    * staged `cents` instead of re-running the corpus-wide centroid
    * aggregate per point — at 100 TB that aggregate is a full corpus
    * scan, the loop-invariant-staging lesson applied to sweeps. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, clusterCol: String,
              k: Int, nprobe: Int, cents: DataFrame): DataFrame = {
    val assign = ivfAssign(queries, cents, clusterCol, nprobe)
    val sims = corpus.join(broadcast(assign), Seq(clusterCol))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col(clusterCol),
        truncSim(cosineFast(col("qe"), col("e"))).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    sims.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Approximate top-k: candidates restricted to the query's sign bucket. */
  def lshBucketTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                    nBits: Int = 8): DataFrame = {
    val qb = queries.withColumn("bucket", signBucket(col("qe"), nBits))
    val cb = corpus.withColumn("bucket", signBucket(col("e"), nBits))
    val sims = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("bucket"),
        truncSim(cosineFast(col("qe"), col("e"))).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    sims.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
