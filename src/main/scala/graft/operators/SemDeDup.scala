package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFns._

/** SemDeDup-style semantic deduplication (Abbas et al.,
  * arXiv:2303.09540): k-means-partition the embedding space, then prune
  * near-duplicates WITHIN clusters only. The quadratic pair term is
  * bounded by cluster width, never corpus-wide — the contrast with the
  * all-pairs form the same way MinHash banding contrasts with all-pairs
  * Jaccard. Reference behavior: fxblue-etl has no embedding surface;
  * this extends the dedup family (SURVEY §2.4) to semantic space.
  *
  * At 100 TB: `KMeans.fit` is one corpus scan per iteration (centroids
  * broadcast as literals), the self-join shuffles on cid once, and k
  * scales with corpus size (k ≈ n/target_width) so per-cluster pair
  * counts stay constant as the corpus grows. The paper's survivor rule
  * (keep the member farthest from the centroid) is replaced by keep-
  * min-id: deterministic, total, and engine-portable — the choice of
  * survivor is policy, the pruning shape is the operator.
  */
object SemDeDup {

  /** Marks every vector with its cluster and whether a lower-id
    * cluster-mate sits within cosine ≥ `threshold` of it (is_dup —
    * drop these and the min-id representative of every semantic
    * neighborhood survives). `clustered` must carry (idCol, vecCol,
    * cid) — the shape `KMeans.assign` emits.
    *
    * The cosine is floor-truncated to 1e-6 BEFORE the threshold compare
    * on both engines (`Knn.truncSim`), so a last-ulp disagreement can
    * never flip a pair across the boundary. The cluster frame feeds a
    * self-join; Catalyst does not share subplans across self-joins, so
    * it is materialized once (tiny: id, cid, vector). */
  def markDuplicates(clustered: DataFrame, idCol: String, vecCol: String,
                     threshold: Double): DataFrame = {
    val m = clustered.select(col("cid"), col(idCol), col(vecCol)).localCheckpoint(true)
    val dups = m.as("x").join(m.as("y"),
        col("x.cid") === col("y.cid") && col(s"x.$idCol") < col(s"y.$idCol"))
      .filter(Knn.truncSim(cosineFast(col(s"x.$vecCol"), col(s"y.$vecCol"))) >= threshold)
      .select(col(s"y.$idCol").as(idCol))
      .distinct()
    m.select(col(idCol), col("cid"))
      .join(dups.withColumn("__d", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cid"),
        coalesce(col("__d"), lit(false)).as("is_dup"))
  }
}
