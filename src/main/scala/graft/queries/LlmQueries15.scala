package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.PrefixSum

/** Fifteenth LLM-pipeline batch: the training-loop EPOCH SHUFFLE — a
  * seeded, reproducible global random permutation of the corpus. Every
  * pre-training run reshuffles its dataset once per epoch; at 100 TB
  * the permutation must be (a) deterministic given (seed, epoch) so a
  * crashed run resumes at the same order, and (b) computed without a
  * global sort funnel. Keying each row by `md5(seed || id)` gives (a);
  * the global position is then exact rank under that key — here a
  * [[PrefixSum]] distributed SELECTION of the head of the permutation,
  * which window-scans only the buckets containing the requested
  * positions (the full-epoch form is the same machinery with
  * `PrefixSum.rank`, still bucket-partitioned windows only; writers
  * would range-partition on the very same md5 key, the terasort
  * layout).
  */
object LlmQueries15 {

  /** First 30 positions of the (seed=epoch7) permutation of
    * `documents`. The md5 hex string is the sort key (collision-free
    * in practice; doc_id tiebreak makes the order total regardless);
    * the numeric bucket key is its leading 13 hex digits — < 2^53, so
    * the double cast inside PrefixSum is exact, and hex-prefix order is
    * (weakly) monotone in full-string order as the bucketing contract
    * requires. `stable = true`: the input is a pure projection of the
    * per-session staged table, so the selection's three passes re-scan
    * cached blocks instead of paying a checkpoint. */
  def epochShuffle(s: SparkSession, dir: String): DataFrame = {
    val keyed = Tables.staged(s, dir, "documents", Seq("doc_id"))
      .select(col("doc_id"),
        md5(concat(lit("epoch7:"), col("doc_id").cast("string"))).as("k"))
    PrefixSum.selectRanks(keyed,
        conv(substring(col("k"), 1, 13), 16, 10).cast("long"),
        Seq(col("k"), col("doc_id")),
        n => (1L to math.min(30L, n)).map(i => (i.toString, i)),
        "lbl", stable = true)
      .select(col("lbl").cast("long").as("pos"), col("doc_id"), col("k"))
      .orderBy("pos")
  }

  val epochShuffleSql: String = """
WITH keyed AS (
  SELECT doc_id, md5(concat('epoch7:', CAST(doc_id AS VARCHAR))) AS k
  FROM documents),
r AS (SELECT row_number() OVER (ORDER BY k, doc_id) AS pos, doc_id, k
      FROM keyed)
SELECT pos, doc_id, k FROM r WHERE pos <= 30 ORDER BY pos
"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_epoch_shuffle" -> (epochShuffle _))

  val oracles: Map[String, String] = Map(
    "q_epoch_shuffle" -> epochShuffleSql)
}
