package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked edit-distance join — entity resolution without the cross
  * product: candidates come from an equi-join on a blocking key (the
  * one shuffle), and only candidates pay the O(len²) levenshtein. The
  * blocking key is the scale contract: block sizes bound the quadratic
  * term (MinHashDedup's mega-bucket cap is the same idea applied to
  * band buckets).
  *
  * `bestMatch` resolves each probe row to its single closest candidate
  * (min distance, then smallest candidate id) via a ranking window over
  * the candidate pairs — deterministic and oracle-reproducible since
  * levenshtein is exact unit-cost edit distance in any engine.
  */
object FuzzyJoin {

  /** All candidate pairs within `maxDist`, with their distance.
    * Frames must not share column names (alias before calling).
    * Registers `LevenshteinLengthGuard` so the distance filter gets the
    * O(1) length-difference prefilter ahead of the O(len²) DP. */
  def candidates(probe: DataFrame, target: DataFrame,
                 probeBlock: Column, targetBlock: Column,
                 probeStr: Column, targetStr: Column,
                 maxDist: Int): DataFrame = {
    val spark = probe.sparkSession
    if (!spark.experimental.extraOptimizations.contains(graft.plans.LevenshteinLengthGuard))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.LevenshteinLengthGuard
    probe.join(target, probeBlock === targetBlock)
      .withColumn("edit_dist", levenshtein(probeStr, targetStr))
      .filter(col("edit_dist") <= maxDist)
  }

  /** One row per probe row that matched: its closest target under
    * (distance, `targetOrder`) — rank-1 of a window per probe id. */
  def bestMatch(probe: DataFrame, target: DataFrame,
                probeBlock: Column, targetBlock: Column,
                probeStr: Column, targetStr: Column,
                probeId: Column, targetOrder: Column,
                maxDist: Int): DataFrame = {
    val cand = candidates(probe, target, probeBlock, targetBlock,
      probeStr, targetStr, maxDist)
    val w = Window.partitionBy(probeId).orderBy(col("edit_dist"), targetOrder)
    cand.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
