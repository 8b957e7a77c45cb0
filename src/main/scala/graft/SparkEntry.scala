package graft

import graft.queries.{ExtendedQueries, PipelineQueries, Q, Round4Queries, Round5Queries, Round6Queries, Round7Queries, Round8Queries, Round9Queries, Round10Queries, Round10bQueries, Round11Queries, Round12Queries, Round13Queries, Round14Queries, Round14bQueries, Round15Queries, Round15bQueries, Round15cQueries, Round15dQueries, Round15eQueries, Round16Queries, Round17Queries, Round18Queries, Round18bQueries, StarQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one named entry per implemented operator from
  * SURVEY.md §2 plus the training-data-pipeline suite (dedup / similarity /
  * multimodal / text analysis / streaming); `oracleSql` holds the DuckDB
  * equivalent for every SQL-expressible entry. Column names and types are
  * aligned on both sides.
  */
object SparkEntry {

  def registry: Seq[Q] = {
    val all = StarQueries.all ++ PipelineQueries.all ++
      ExtendedQueries.all ++ Round4Queries.all ++ Round5Queries.all ++
      Round6Queries.all ++ Round7Queries.all ++ Round8Queries.all ++
      Round9Queries.all ++ Round10Queries.all ++ Round10bQueries.all ++
      Round11Queries.all ++ Round12Queries.all ++ Round13Queries.all ++
      Round14Queries.all ++ Round14bQueries.all ++ Round15Queries.all ++
      Round15bQueries.all ++ Round15cQueries.all ++ Round15dQueries.all ++
      Round15eQueries.all ++ Round16Queries.all ++ Round17Queries.all ++
      Round18Queries.all ++ Round18bQueries.all
    val dupes = all.groupBy(_.name).filter(_._2.size > 1).keys
    require(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(",")}")
    all
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** The 39 queries whose r8 driver oracle rows died to HOST memory
    * exhaustion inside the DuckDB oracle process ("failed to allocate 64
    * bytes" — CORRECTNESS_r08.json; 36/39 were hash-green in an earlier
    * round). DuckDB's per-process defaults on this host are ~100 GB
    * memory_limit and 32 threads; a sweep that runs many per-query oracle
    * processes concurrently multiplies that into genuine host-RAM
    * exhaustion, and the heavy families (window suites, stream replays,
    * the unrolled PQ/IVF CTE chains) are both the biggest allocators and
    * the first victims. Their oracle SQL is therefore shipped with a
    * self-cap prologue — `SET memory_limit`/`SET threads` — which the
    * DuckDB Python API executes as a multi-statement batch returning the
    * final SELECT's relation (columns/types/rows are unaffected; verified
    * against duckdb 1.x `con.sql(...)`). Deliberately NOT applied to the
    * 149 queries that were green under the same sweep: their plain SQL is
    * proven against the driver's harness, and keeping the prologue to the
    * red set bounds the blast radius if a future harness stops accepting
    * multi-statement strings.
    */
  private val oracleSelfCap: Set[String] = Set(
    "e_knn_ivf", "e_knn_ivf_at_rest", "e_knn_ivfpq", "e_knn_pq",
    "e_knn_pq_rerank", "e_knn_sq8_rerank", "e_knn_sql",
    "f12_json_construct", "f17_date_arith", "f18_map_ops",
    "o25_collect_list", "o38_scd2_intervals", "o47_lateral_topn",
    "o52_column_profile", "o54_compact_small_files", "o6_membership_semi",
    "p_pack_sequences",
    "stream_cdc_apply", "stream_codex_ingest", "stream_dedup",
    "stream_enrich", "stream_incremental_dedup",
    "stream_incremental_dedup_shuffled", "stream_knn_enrich",
    "stream_rocksdb_state", "stream_session_window", "stream_sessionize",
    "stream_sliding_window",
    "w_event_transitions", "w_funnel_stages", "w_gap_fill_interp",
    "w_range_frame", "w_rank_suite", "w_rolling_window", "w_running_sum",
    "w_seq_pattern", "w_sessionize", "w_share_of_total", "w_zscore",
    // r9-new, never swept: capped from birth — the k-means replay
    // family's members were first-sweep victims in r8, and a cap on the
    // light oracles costs nothing while the wrap-risk already rides on
    // the 39 above
    "d_semdedup_auto", "curate_span_scrub", "p_shard_export",
    "e_knn_ivf_append", "agg_sketch_merge",
    // r10-new: same capped-from-birth policy
    "m_image_decode", "e_knn_ivf_recenter", "stream_ivf_append",
    "m_image_resize", "m_audio_decode", "stream_image_ingest",
    "m_video_frames",
    // r10 second wave: same capped-from-birth policy
    "m_phash_neardup", "m_audio_resample", "curate_url_canon",
    "d_containment", "m_video_scene_cut", "t_token_surprisal",
    "d_phash_clusters", "m_audio_vad", "stream_audio_ingest",
    "p_curriculum_order",
    // r11-new: same capped-from-birth policy
    "m_video_frames_mjpeg", "curate_leakproof_split",
    "t_unicode_normalize",
    // r12-new: same capped-from-birth policy
    "d_lsh_bucket_cap", "d_exact_nfc", "d_lsh_bucket_stats",
    "d_simhash_adaptive",
    // r13-new: same capped-from-birth policy
    "d_minhash_nfc", "d_semdedup_2level", "g_kcore", "g_link_predict",
    "j_interval_bucketized", "curate_line_dedup",
    "t_winnow_fingerprint", "e_knn_mips",
    // r14-new: same capped-from-birth policy
    "e_knn_mips_ivf", "t_winnow_overlap", "j_interval_autowidth",
    // r14 second wave: same capped-from-birth policy
    "agg_kmv_distinct", "e_hybrid_rrf", "t_bm25_topk",
    "g_labelprop", "curate_overlap_scrub", "g_modularity",
    "agg_kmv_setops", "stream_kmv_sketch", "j_interval_overlap",
    "e_knn_filtered_ivf", "j_spatial_grid", "agg_cms_topk",
    "curate_gopher_rules", "t_collocations",
    // r15: same capped-from-birth policy
    "t_winnow_at_rest", "t_bm25_decimal", "j_spatial_dbscan",
    "p_bottomk_sample", "w_cusum_changepoint", "e_ann_recall_eval",
    // r15 third wave: same capped-from-birth policy
    "p_priority_sample", "agg_kmv_joinsize", "o_skyline_pareto",
    "e_mmr_diversify",
    // r15 fourth wave: same capped-from-birth policy
    "w_mad_outliers", "curate_winsorize", "g_ppr_seeds",
    // r15 fifth wave: same capped-from-birth policy
    "e_mmr_ivf", "g_bfs_hops",
    // r16: same capped-from-birth policy
    "curate_classifier_score", "curate_classifier_terciles",
    "curate_repetition_rules", "p_domain_mix",
    "curate_pii_scrub", "p_quality_weighted_sample",
    "stream_classifier_score", "g_hits", "p_mix_sample_pack",
    // r17: same capped-from-birth policy
    "curate_e2e_pipeline", "m_embed_infer", "e_knn_embed_infer",
    "curate_pii_scrub_v2", "j_kmv_adaptive_join",
    // r18: same capped-from-birth policy
    "e_knn_embed_ivf", "e_embed_ivf_recall",
    "m_classifier_from_disk", "m_embed_from_disk",
    "stream_curate_pipeline", "t_bpe_real", "curate_e2e_uncapped")

  private val selfCapPrologue =
    "SET memory_limit='2GB'; SET threads=2; "

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (engine
    * hash functions, streaming internals) → driver rows-only check.
    */
  def oracleSql: Map[String, String] = {
    val names = registry.map(_.name).toSet
    val unknown = oracleSelfCap -- names
    require(unknown.isEmpty,
      s"oracleSelfCap names not in the registry: ${unknown.mkString(",")}")
    registry.flatMap(q => q.oracle.map { sql =>
      q.name -> (if (oracleSelfCap(q.name)) selfCapPrologue + sql else sql)
    }).toMap
  }
}
