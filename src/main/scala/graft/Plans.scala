package graft

import org.apache.spark.sql.SparkSession

import java.io.{File, PrintWriter}

/** Dump formatted physical plans for the headline queries → PLANS.md, the
  * reviewable evidence that pushdown/broadcast/partial-agg/WindowGroupLimit
  * shapes hold (SCALE.md "Verified plan shapes").
  */
object Plans {
  val headline: Seq[String] = Seq(
    "s1_scan_pushdown", "q1_agg", "j1_patient_join", "j4_first_match",
    "lim_topk", "o22_block_diag_offsets", "d_exact_dedup", "d_minhash_lsh",
    "e_knn_brute", "e_knn_ivf", "curate_corpus", "t_oov_rate",
    "j7_asof_join", "o30_stratified_sample", "agg_cube", "e_knn_sql",
    "j8_range_join", "w_rolling_window", "o31_full_outer", "t_chunk_text",
    "agg_grouping_sets", "w_rank_suite", "t_tfidf_top", "o33_unpivot",
    "o32_date_spine", "j9_fuzzy_join", "agg_argmax", "t_scrub_redact",
    "o38_scd2_intervals", "j10_bloom_join", "j11_salted_join",
    "o40_delta_detect", "o41_merge_upsert", "agg_bitmap_distinct",
    "w_seq_pattern", "w_gap_fill_interp", "o39_zorder_cluster",
    "g_triangle_count", "o44_dq_audit", "agg_equidepth_hist",
    "g_pagerank", "d_substring_spans", "o47_lateral_topn",
    "agg_weighted_median", "p_pack_sequences", "curate_pack_pipeline",
    "codex_product_e2e", "curate_domain_cap", "curate_split_assign",
    "j_bucketed_colocated", "d_incremental_dedup",
    "o54_compact_small_files", "j12_dpp_join",
    "j_bloom_prune_native", "e_knn_ivf_probe",
    "d_incremental_index_append", "e_knn_sq8_rerank",
    "e_knn_ivf_at_rest", "e_kmeans_lloyd", "curate_canonical_select",
    "j9b_fuzzy_blocked", "e_knn_ivf_kmeans", "d_index_compact",
    "e_knn_pq", "e_knn_ivfpq", "d_semdedup", "p_stratified_sample",
    "e_knn_pq_rerank", "d_semdedup_auto", "curate_span_scrub",
    "p_shard_export", "e_knn_ivf_append", "agg_sketch_merge",
    "m_image_decode", "e_knn_ivf_recenter", "stream_ivf_append",
    "m_image_resize", "m_audio_decode", "m_video_frames",
    "stream_image_ingest",
    "m_phash_neardup", "m_audio_resample", "curate_url_canon",
    "d_containment", "m_video_scene_cut", "t_token_surprisal",
    "d_phash_clusters", "m_audio_vad", "stream_audio_ingest",
    "p_curriculum_order", "m_video_frames_mjpeg",
    "curate_leakproof_split", "t_unicode_normalize",
    "d_lsh_bucket_cap", "d_exact_nfc", "d_lsh_bucket_stats",
    "d_simhash_adaptive", "d_minhash_nfc", "d_semdedup_2level",
    "g_kcore", "g_link_predict", "j_interval_bucketized",
    "curate_line_dedup", "t_winnow_fingerprint", "e_knn_mips",
    "e_knn_mips_ivf", "t_winnow_overlap",
    "j_interval_autowidth",
    "agg_kmv_distinct", "e_hybrid_rrf", "t_bm25_topk",
    "g_labelprop", "curate_overlap_scrub",
    "g_modularity", "agg_kmv_setops", "stream_kmv_sketch",
    "j_interval_overlap",
    "e_knn_filtered_ivf", "j_spatial_grid", "agg_cms_topk",
    "curate_gopher_rules", "t_collocations",
    // r15: the tiered interval joins' plan shape (tier-set broadcast +
    // equi join, no BNLJ), the at-rest winnow serve (bucketed scan, no
    // exchange before the rollup), dbscan's grid-join composition
    "t_winnow_at_rest", "t_bm25_decimal", "j_spatial_dbscan",
    "p_bottomk_sample", "w_cusum_changepoint", "e_ann_recall_eval",
    // r15 third wave: the bounded-buffer samplers (partial TopKAgg on
    // the map side), the skyline's two-level window + broadcast shape,
    // MMR's checkpoint-bounded greedy phase
    "p_priority_sample", "agg_kmv_joinsize", "o_skyline_pareto",
    "e_mmr_diversify",
    // r15 fourth wave: the count-collapsed order-statistics shape
    // (partial-agg groupBy before the exchange) and PPR's seed-
    // conditional teleport over the pagerank loop
    "w_mad_outliers", "curate_winsorize", "g_ppr_seeds",
    // r15 fifth wave: the IVF candidate seam under the shared MMR
    // rerank; BFS min-propagation rounds
    "e_mmr_ivf", "g_bfs_hops",
    // r16: the classifier's explode -> broadcast-weight-join -> one
    // doc-keyed partial agg; the repetition rules' single tagged
    // explode; PII scrub's shuffle-free per-row map; the mix pipeline's
    // budget-bounded sample + per-source pack windows; HITS'
    // per-half-step shuffle
    "curate_classifier_score", "curate_classifier_terciles",
    "curate_repetition_rules", "curate_pii_scrub", "p_domain_mix",
    "p_quality_weighted_sample", "p_mix_sample_pack", "g_hits",
    // stream_classifier_score's registered claim ("NO stateful
    // operator in the streaming plan") is carried here like the other
    // plan-audited stream_* queries: the dump shows the post-stream
    // result plan plus scoreDocsInline's shuffle-free map shape
    "stream_classifier_score",
    // r17: the full-chain curation composite — audit that the fused
    // rule pass is ONE gram exchange + broadcast weight join, the
    // eval-shingle join broadcasts, and packing tokenizes finalists —
    // plus embedding inference (pivoted broadcast weight join, one
    // per-doc agg) and its end-to-end retrieval composition
    "curate_e2e_pipeline", "m_embed_infer", "e_knn_embed_infer",
    // r18: the IVF serving tier over inferred embeddings (pure-map
    // cell assignment, broadcast probe explode, probed-cell-only
    // scoring), the on-disk-model serving paths, and the BPE
    // tokenizer's shuffle-free replace-chain projection.
    // curate_e2e_uncapped is deliberately ABSENT: its Q runs the
    // stage counts eagerly and returns a local 9-row frame, so a
    // dump would execute the whole uncapped chain to print a
    // LocalTableScan — the chain's plan evidence lives with
    // curate_e2e_pipeline above
    "e_knn_embed_ivf", "m_classifier_from_disk", "m_embed_from_disk",
    "t_bpe_real")

  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = new PrintWriter(new File("PLANS.md"), "UTF-8")
    out.println("# PLANS — formatted physical plans of headline queries")
    out.println()
    out.println(s"Generated by `graft.Plans` on `$sfDir`. Shapes to check:")
    out.println("parquet `PushedFilters`/`ReadSchema`, `BroadcastHashJoin`,")
    out.println("partial+final `HashAggregate`, `WindowGroupLimit`,")
    out.println("`TakeOrderedAndProject`, `MapPartitions` below `Exchange`.")
    headline.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      out.println(s"\n## $name\n")
      out.println("```")
      out.println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      out.println("```")
    }
    out.close()
    println(s"[plans] wrote PLANS.md for ${headline.size} queries")
    spark.stop()
  }
}
