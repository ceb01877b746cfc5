package graft

/** Round-7 tripwire (VERDICT r6 item 2): every registered query must
  * ANALYZE cleanly against every testdata scale's physical schema.
  *
  * Motivation: in round 6 the sf* generators changed `events.ts` from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS, isAdjustedToUTC=false) — which
  * Spark 4 infers as TIMESTAMP_NTZ — and 12 queries silently died at
  * analysis time (`unix_micros` rejects NTZ), poisoning the three
  * whole-registry governance sweeps along with them. One test per query
  * makes any analysis-time break fail loudly under its own name instead
  * of taking down an unrelated sweep.
  *
  * Lazily-planned queries cost only analysis here (no execution), so
  * they run against all three dirs. Queries with EAGER driver-side
  * actions inside the query function — streaming harness runs, staged
  * index builds (StagedOnce/DedupStage), collected PrefixSum cut
  * arrays, k-means iterations, bloom builds, file-format roundtrip
  * staging — execute real Spark jobs per invocation, so they are pinned
  * to sf0.001: running them at sf0.1 would re-do first-build side
  * effects inside an "analysis" test. The list is empirical, generated
  * by `graft.tools.EagerScan` (counts jobs triggered per query-function
  * call); regenerate it when the registry changes. Schema-sensitivity
  * is identical across dirs (same generator), so sf0.001 analysis
  * covers the tripwire's purpose for these.
  */
class RegistryAnalysisSpec extends GraftSuite {

  private val allDirs = Seq(
    "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  /** Queries whose fn call runs Spark jobs (EagerScan output, r8;
    * q_weighted_quantiles added by hand — selectWeighted's stats passes
    * are eager by the same construction as q_exact_quantiles). */
  private val eager = Set(
    "q11_value_share", "q15_top_supplier", "q20_stock_surplus", "q21_waiting",
    "q2_min_cost_supplier", "q3_top_revenue", "q_ab_ztest", "q_acf",
    "q_ann_ivf", "q_ann_ivf_kmeans", "q_ann_ivf_persisted", "q_assoc_rules",
    "q_audio_fingerprint", "q_bfs_hops", "q_bloom_decontaminate",
    "q_bpe_merges", "q_bucketed_join", "q_clustering_coeff", "q_csv_source",
    "q_curriculum", "q_dedup_canonical", "q_degree_assortativity",
    "q_dynamic_overwrite", "q_exact_quantiles", "q_lsh_precision",
    "q_geo_radius", "q_image_neardup", "q_inverted_index", "q_item_cf",
    "q_json_corrupt", "q_json_source", "q_kaplan_meier", "q_kcore",
    "q_label_prop", "q_link_prediction", "q_lsh_index", "q_mad_outliers",
    "q_mannwhitney", "q_minhash_neardup", "q_mixture_sample",
    "q_mixture_temperature", "q_mmr_rerank", "q_naive_bayes",
    "q_orc_roundtrip", "q_pagerank", "q_pmi_pairs", "q_ppr_seed",
    "q_quantized_knn", "q_rfm", "q_rouge_pairs", "q_schema_evolution",
    "q_semdedup", "q_setsim_join", "q_simhash_clusters", "q_simhash_hamming",
    "q_skew_join", "q_sssp_bounded", "q_text_index", "q_tfidf_topterms",
    "q_theil_sen", "q_triangle_knn", "q_weighted_quantiles", "q_xlsx_dim",
    "q_xlsx_v2")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    val dirs =
      if (name.startsWith("q_stream") || eager(name)) allDirs.take(1) else allDirs
    test(s"analyzes on all schemas: $name") {
      dirs.foreach { dir =>
        try fn(spark, dir).queryExecution.analyzed
        catch {
          case e: Throwable =>
            fail(s"$name fails analysis on $dir: ${e.getMessage}", e)
        }
      }
    }
  }
}
