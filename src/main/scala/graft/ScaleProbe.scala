package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev evidence tool: measure how the heavy operators SCALE, not just
  * how fast they are at one size. Builds a K×-scaled copy of the
  * documents/embeddings tables (doc ids offset per copy; text/embedding
  * perturbed deterministically per copy so the K× corpus is K× real
  * work, not K× exact duplicates), symlinks the remaining tables, and
  * times selected queries at 1× and K× in the same JVM (steady state:
  * min-of-3 on the 1× denominator, min-of-2 on the K× numerator, and
  * the ratio denominator clamped to ≥0.5 s — see [[ratio]]).
  * Near-linear ratios are the 100 TB evidence SCALE.md
  * quotes; a super-linear ratio is a scale bug to fix.
  *
  * Usage: sbt "runMain graft.ScaleProbe [K] [sfDir]"
  *        sbt "runMain graft.ScaleProbe guard [sfDir]"
  *
  * Every run writes `scale_probe_<K>x.json` (per-query 1×/K× seconds +
  * ratio). GUARD mode re-measures at 8× and FAILS (throws, red log
  * line) if any probe's ratio exceeds 2× its committed baseline in
  * `SCALE_RATIOS.json` — the regression tripwire that makes the 100 TB
  * scaling evidence self-enforcing instead of a one-round snapshot
  * (a reintroduced quadratic like the r5 t_ngram_novelty shingle
  * re-evaluation would trip it).
  */
object ScaleProbe {
  val probes: Seq[String] = Seq(
    "curate_split_assign", "d_exact_dedup", "d_minhash_lsh",
    "d_simhash", "t_tfidf_top", "t_ngram_novelty",
    "d_incremental_dedup", "agg_heavy_hitters", "e_knn_brute",
    "e_knn_sq8", "curate_pack_pipeline", "p_epoch_shuffle",
    "p_negative_sample", "d_incremental_index_append",
    "e_knn_sq8_rerank", "e_kmeans_lloyd",
    "e_knn_pq", "e_knn_ivfpq", "d_semdedup", "p_stratified_sample",
    "e_knn_pq_rerank", "curate_span_scrub",
    "p_shard_export", "e_knn_ivf_append", "agg_sketch_merge",
    "m_image_decode", "e_knn_ivf_recenter", "m_image_resize",
    "m_audio_decode", "m_video_frames",
    "m_phash_neardup", "m_audio_resample", "curate_url_canon",
    "d_containment", "m_video_scene_cut", "t_token_surprisal",
    "d_phash_clusters", "m_audio_vad", "p_curriculum_order",
    "t_unicode_normalize",
    "d_lsh_bucket_cap", "d_exact_nfc", "d_minhash_nfc",
    "probe_bucket_stats_heavy", "probe_semdedup_heavy",
    "probe_semdedup_2level_heavy",
    "probe_lsh_spam", "probe_leakproof_uncapped",
    // r13 second wave: the K×-scaled dir now also inflates events
    // (disjoint per-copy user/time offsets → K disjoint graph copies)
    // and lineitem (K× points against the SYMLINKED orders' fixed
    // interval set), so the graph + interval + line-dedup ops carry
    // measured ratios like everything else
    "g_kcore", "g_link_predict", "j_interval_bucketized",
    "probe_line_dedup_heavy", "probe_winnow_heavy",
    "probe_coactivity_spam",
    // r14: the MIPS serving path (linear: one assignment scan + fixed
    // probe fan-out) and the winnowing pair detector. NOTE the
    // overlap probe is OUTPUT-bound by design: the K×-scaled corpus
    // contains K-sized near-dup cliques by construction (each doc's
    // K copies share ~every fingerprint), so the TRUE pair count —
    // any detector's output — grows ~K²; the honest flatness measure
    // is seconds per output row, not the raw ratio (see SCALE.md).
    "e_knn_mips_ivf", "t_winnow_overlap", "j_interval_autowidth",
    // r14 second wave: the KMV sketch rides the inflated events table
    // (per-copy user offsets → K× distinct users per group); RRF's
    // cost is its two brute rankers over the K× embeddings corpus;
    // BM25/LPA/overlap-scrub ride the inflated documents/events.
    // NOTE overlap-scrub on the K×-scaled corpus is OUTPUT-bound like
    // the winnow probes: each doc's K copies share every shingle, so
    // the K× corpus is ~100% duplicated runs — covered-set and
    // rebuild work legitimately grow with the duplication the corpus
    // actually contains
    "agg_kmv_distinct", "e_hybrid_rrf", "t_bm25_topk",
    "g_labelprop", "curate_overlap_scrub",
    // r14 third wave: modularity rides the same inflated events as
    // the other g_* probes; the sketch set-ops query is sketch-side
    // work (k-row summaries per group) over the K× distinct users
    "g_modularity", "agg_kmv_setops",
    // r14 fourth wave: interval×interval overlap. The registry query
    // joins orders against orders and the scaled dir SYMLINKS orders,
    // so the K× measurement lives in probe_interval_overlap_heavy
    // (in-plan K× interval copies with disjoint time offsets — true
    // pairs grow ~K×, so the probe measures the bucketized join).
    // stream_kmv_sketch is deliberately NOT probed: the streaming
    // family's fixed micro-batch floors dominate its small compute
    // (the documented convention for all stream_* queries)
    "probe_interval_overlap_heavy",
    // r14 fifth wave: filtered IVF (one assignment scan over the
    // filtered subset + fixed probe fan-out), the 2-D grid radius
    // self-join (9x|points| shuffle; the K x-scaled embeddings keep
    // natural coordinates so neighbor density — and true pair count —
    // grows with K: output-bound like the winnow probes), and the
    // count-min sketch (two scans + a 1024-cell rollup)
    "e_knn_filtered_ivf", "j_spatial_grid", "agg_cms_topk",
    // r14 sixth wave: both are one-explode/one-agg text passes over
    // the K× documents
    "curate_gopher_rules", "t_collocations",
    // r15: the at-rest winnow serve path (build + serve both scale
    // with the K× corpus; output-bound like the other winnow probes —
    // cross-copy near-dup cliques make TRUE pair count grow ~K²) and
    // the decimal-lifted BM25 (same plan as t_bm25_topk);
    // j_spatial_dbscan is deliberately probed via probe_dbscan_heavy
    // (disjoint spatial planes) instead of the scaled dir, whose
    // near-coincident embedding copies densify cells ×K and make the
    // output itself quadratic (the j_spatial_grid caveat)
    "t_winnow_at_rest", "t_bm25_decimal",
    // r15 heavy tier for the near-clamp-floor queries (the r14
    // verdict item: their natural t1 ≈ 0.1-0.6 s sits on the 0.5 s
    // ratio clamp floor where ratios are noise) + the planted
    // span-outlier interval probe the natural fixed-width windows
    // can never exercise
    "probe_bm25_heavy", "probe_collocations_heavy",
    "probe_spatial_heavy", "probe_dbscan_heavy",
    "probe_interval_outlier",
    // r15 second wave: bottom-k sampling rides the K× documents (the
    // bounded TopKAgg buffer is the point — k rows per partition per
    // stratum regardless of stratum size); CUSUM rides the K× events
    // (per-user windows; the scaled dir's disjoint user copies give
    // K× independent series); recall-eval rides the K× embeddings
    // (brute ranker is the linear-cost term, 10 fixed queries)
    "p_bottomk_sample", "w_cusum_changepoint", "e_ann_recall_eval",
    // r15 third wave: priority sampling rides the K× documents (the
    // bounded buffer argument — 17 rows per partition per stratum);
    // KMV join-size rides the K× events (K× distinct users, sketch
    // stays 64 rows); the skyline rides the K× lineitem (per-bucket
    // windows + a |buckets|-row broadcast); MMR rides the K×
    // embeddings (the brute candidate stage is the linear-cost term;
    // the greedy phase is corpus-size-independent by construction)
    "p_priority_sample", "agg_kmv_joinsize", "o_skyline_pareto",
    "e_mmr_diversify",
    // r15 fourth wave: MAD/winsorize ride the K× events (count-
    // collapsed order statistics — the exchange carries distinct
    // values per group, and the K× copies widen the value domain only
    // sub-linearly); PPR rides the K disjoint co-activity subgraphs
    // like the other g_* probes
    "w_mad_outliers", "curate_winsorize", "g_ppr_seeds",
    // r15 fifth wave: MMR-over-IVF rides the K× embeddings (the IVF
    // assignment scan is the linear term; the greedy phase is
    // candidate-bounded); BFS rides the K disjoint subgraphs
    "e_mmr_ivf", "g_bfs_hops",
    // r16: all six ride the K× documents. The classifier pair's
    // linear term is the tagged-feature explode + broadcast weight
    // join (dim-row build side at any K); terciles adds the global
    // count-collapsed quantile over quantized bins (the exchange
    // carries bins, not docs — the domain widens sub-linearly);
    // repetition rules are the one-tagged-explode/two-partial-agg
    // pass; PII scrub is pure per-row regex map work; the weighted
    // sample's bounded TopKAgg buffer shuffles 9 rows per partition
    // per stratum regardless of K; domain mix is one partial-agg
    // reduce to the |sources|-row frame (its t1 sits under the ratio
    // clamp floor — recorded for completeness, the reduce shape is
    // shared with every groupBy probe above)
    "curate_classifier_score", "curate_classifier_terciles",
    "curate_repetition_rules", "curate_pii_scrub",
    "p_quality_weighted_sample", "p_domain_mix",
    // r16 second wave: HITS rides the K disjoint co-activity
    // subgraphs like the other g_* probes (one src-/dst-keyed
    // shuffle per half-step; the normalization scalar is one row)
    "g_hits",
    // r16 third wave: the mix->sample->pack pipeline rides the K×
    // documents — the hash scan is the linear term; the sample is
    // BUDGET-bounded (200 docs total at any K), so the pack stage's
    // cost is constant and the ratio should approach pure scan cost
    "p_mix_sample_pack",
    // r17: the full-chain curation composite, uncapped (the capped
    // registry query would measure a fixed 1500-doc corpus at any K),
    // and embedding inference over the K× documents (linear term =
    // the feature explode + broadcast pivoted-weight join; the weight
    // table is dim-row at any K)
    "probe_e2e_uncapped", "m_embed_infer",
    // r18: the true BPE tokenizer is a pure per-row replace chain
    // over the K× documents (no shuffle — the ratio should approach
    // raw scan cost); the incremental curation stream replays its 4
    // mtime-ordered shards rebuilt from the K× corpus (per-batch
    // zero-state gate + band-index probe/append — each stage linear
    // in the batch); the IVF serving probe holds the query set FIXED
    // (the registered query's % 101 queries grow ×K with the corpus,
    // making pair volume ×K² by construction — the winnow caveat),
    // so the measured terms are inference + assignment + probed-cell
    // scan over the K× corpus. curate_e2e_uncapped is deliberately
    // NOT probed: probe_e2e_uncapped already measures the identical
    // uncapped chain (the audit adds only count actions on top).
    "t_bpe_real", "stream_curate_pipeline", "probe_embed_ivf_serve")

  /** Documents inflated COPIES× in-plan (ids stay unique under any
    * further per-dir offset; text carries a per-copy tag so copies are
    * near- not exact-dups and bucket structure stays realistic). Heavy
    * probes run over this so their 1× denominator is real work
    * (≥ ~1.5 s), not scheduler overhead — a sub-0.5 s t1 sits on the
    * [[ratio]] clamp floor and its K× ratio is noise, not signal (the
    * r12 32× sweep reported 13-14× for exactly those probes).
    */
  private def inflateDocs(s: SparkSession, d: String,
      copies: Int): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    docs.crossJoin(broadcast(
        s.range(0, copies.toLong).toDF("copy")))
      .select((col("doc_id") * copies + col("copy")).as("doc_id"),
        concat(col("text"), lit(" heavytag"), col("copy")).as("text"))
  }

  /** Embeddings inflated 8× (one component perturbed per copy — the
    * scaled-dir builder's pattern) for the two semdedup probes, so the
    * flat-vs-two-level assignment comparison runs on one corpus.
    */
  private def inflateEmb(s: SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Tables.embeddings(s, d).crossJoin(broadcast(
        s.range(0, 8L).toDF("copy")))
      .select((col("vec_id") * 8 + col("copy")).as("vec_id"),
        expr("transform(embedding, (x, i) -> " +
          "CAST(x + CAST(copy AS FLOAT) * CAST(0.001 AS FLOAT) * " +
          "CAST(CASE WHEN i = 0 THEN 1 ELSE 0 END AS FLOAT) AS FLOAT))")
          .as("embedding"))

  /** Probe-ONLY workloads (timing evidence, no oracle — they exist
    * because their registry counterparts are capped or sized for
    * oracle tractability, so the at-scale shape would otherwise never
    * be measured under its real load):
    *
    *  - `probe_lsh_spam`: 6×-inflated corpus with every 8th doc's text
    *    replaced by one constant spam string — a planted hot bucket of
    *    n/8 docs in EVERY band. Uncapped this is O((n/8)²) candidate
    *    pairs per band (64× pair volume at 8× data); with the
    *    corpus-derived hot-bucket cap the spam bucket star-reduces to
    *    O(n/8) edges, so the 8× ratio stays near-linear. The probe
    *    that would have caught the pre-r12 "AQE handles spam"
    *    delegation.
    *  - `probe_bucket_stats_heavy`: the `d_lsh_bucket_stats` rollup
    *    (banding + per-band bucket health + derived cap) over the
    *    6×-inflated spammed corpus — the monitoring pass at a
    *    denominator that clears the clamp floor.
    *  - `probe_semdedup_heavy`: `Dedup.semDedupAuto` over 8×-inflated
    *    embeddings — auto cluster derivation + FLAT assignment +
    *    within-cell pairwise at a real denominator. Expected
    *    super-linear while k ∝ n (the O(n·k) assignment term — kept
    *    as the measured motivation for the two-level path below).
    *  - `probe_semdedup_2level_heavy`: `Dedup.semDedupHierarchical`
    *    over the SAME inflated corpus — the O(n·√k) two-level
    *    assignment; its ratio staying near-linear while the flat probe
    *    goes super-linear is the measured payoff.
    *  - `probe_leakproof_uncapped`: the full banded-join + connected-
    *    components + split composition of `curate_leakproof_split`
    *    WITHOUT the doc_id < 1500 oracle cap.
    */
  val extraProbes: Map[String,
      (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    "probe_embed_ivf_serve" -> ((s: SparkSession, d: String) =>
      graft.queries.Round18Queries.ivfServeFixedQueries(s, d,
        maxQ = 5000L)),
    "probe_lsh_spam" -> ((s: SparkSession, d: String) => {
      val spamText = (0 until 30).map(i => s"probespam$i").mkString(" ")
      val docs = inflateDocs(s, d, 6).select(col("doc_id"),
        when(pmod(col("doc_id"), lit(8L)) === 0L, lit(spamText))
          .otherwise(col("text")).as("text"))
      // murmur variant (the 100 TB default path), corpus-derived cap
      graft.dedup.Dedup.minhashCandidates(docs, "doc_id", "text",
        shingleN = 3, bands = 8, rowsPerBand = 2)
    }),
    "probe_bucket_stats_heavy" -> ((s: SparkSession, d: String) => {
      val spamText = (0 until 30).map(i => s"probespam$i").mkString(" ")
      val docs = inflateDocs(s, d, 6).select(col("doc_id"),
        when(pmod(col("doc_id"), lit(8L)) === 0L, lit(spamText))
          .otherwise(col("text")).as("text"))
      val buckets = graft.dedup.Dedup.minhashBucketsPortable(
        docs, "doc_id", "text", shingleN = 3, bands = 8, rowsPerBand = 2)
      graft.dedup.Dedup
        .lshBucketStats(buckets, capFrom = docs.select(col("doc_id")))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_buckets"),
          max(col("bkt_n")).as("max_bucket"),
          sum(when(col("capped"), 1L).otherwise(0L)).as("n_capped"))
    }),
    "probe_semdedup_heavy" -> ((s: SparkSession, d: String) =>
      graft.dedup.Dedup.semDedupAuto(inflateEmb(s, d), "vec_id",
        "embedding", threshold = 0.5)),
    "probe_semdedup_2level_heavy" -> ((s: SparkSession, d: String) =>
      graft.dedup.Dedup.semDedupHierarchical(inflateEmb(s, d), "vec_id",
        "embedding", threshold = 0.5)),
    "probe_leakproof_uncapped" -> ((s: SparkSession, d: String) =>
      graft.queries.Round11Queries.leakproofSplit(s, d, None)),
    // the full curation chain (rules -> repetition -> classifier ->
    // line dedup -> minhash canonical -> decontaminate -> split ->
    // pack) WITHOUT the doc_id < 1500 oracle cap, over the K×-scaled
    // documents — the chain's linear terms are the fused rule pass
    // and the survivor-side dedup; the eval side stays %97-sized
    "probe_e2e_uncapped" -> ((s: SparkSession, d: String) =>
      graft.queries.Round17Queries.e2ePipeline(s,
        Tables.documents(s, d), None)),
    // the curate_line_dedup body over 6×-inflated docs: the natural
    // corpus runs it in ~0.35 s — under the 0.5 s ratio clamp floor,
    // where ratios are noise (the r12 lesson) — so the probe carries
    // its own real denominator like probe_bucket_stats_heavy
    "probe_line_dedup_heavy" -> ((s: SparkSession, d: String) =>
      graft.queries.Round13Queries.lineDedup(inflateDocs(s, d, 6))),
    // winnowing over 6×-inflated docs (same rationale: the natural
    // corpus runs ~0.6 s, too close to the 0.5 s clamp floor to trust
    // under load); the probe materializes the full fingerprint set —
    // the gram explode + windowed min + distinct, rows ∝ total chars
    "probe_winnow_heavy" -> ((s: SparkSession, d: String) =>
      graft.queries.Round13Queries.winnowFingerprints(
        inflateDocs(s, d, 6))),
    // flash-crowd minute against the co-activity graph derivation:
    // every 8th event is remapped to ONE (event_type, minute) bucket —
    // and because the K×-scaled events keep event_id ≡ 0 (mod 8) rows
    // in every copy, the spam bucket grows ×K while the organic
    // subgraphs stay disjoint. Uncapped, that bucket alone emits
    // O((Kn/8)²) edges (K² blowup); with the occupancy guard it is
    // dropped pre-join and the ratio stays ~linear. The probe the
    // disjoint-subgraph data model could never produce (SCALE.md:
    // g_* probes deliberately avoid cross-copy buckets).
    // interval×interval overlap at K×: the A side derives its
    // intervals from LINEITEM (which the scaled dir inflates K× with
    // natural shipdates), the B side from the symlinked orders' fixed
    // window set — so true pairs grow ~K× (one side fixed) and the
    // probe measures the bucketized join + the exactly-once
    // later-start dedup, not quadratic output densification. The
    // registry query itself (orders × orders) can't be K×-probed:
    // the scaled dir symlinks orders.
    "probe_interval_overlap_heavy" -> ((s: SparkSession, d: String) => {
      val a = Tables.table(s, d, "lineitem")
        .filter(pmod(col("l_orderkey") * 7 + col("l_linenumber"),
          lit(17L)) === 0)
        .select(
          (col("l_orderkey") * 8 + col("l_linenumber")).as("a_id"),
          col("l_shipdate").as("a_start"),
          (col("l_shipdate") + expr("INTERVAL 3 DAYS")).as("a_end"))
      val b = Tables.table(s, d, "orders")
        .filter(pmod(col("o_orderkey"), lit(89L)) === 0)
        .select(col("o_orderkey").as("b_id"),
          col("o_orderdate").as("b_start"),
          (col("o_orderdate") + expr("INTERVAL 11 DAYS")).as("b_end"))
      graft.ops.Relational.intervalOverlapJoin(a, b,
          "a_start", "a_end", "b_start", "b_end")
        .groupBy(col("b_id"))
        .agg(count(lit(1)).as("n_overlap"))
    }),
    "probe_coactivity_spam" -> ((s: SparkSession, d: String) => {
      val ev = Tables.events(s, d)
      val spam = pmod(col("event_id"), lit(8L)) === 0L
      val spammed = ev.select(col("user_id"),
        when(spam, lit("flashcrowd")).otherwise(col("event_type"))
          .as("event_type"),
        when(spam, to_timestamp(lit("2024-01-01 00:00:00")))
          .otherwise(col("ts")).as("ts"))
      graft.queries.Coactivity.undFromEvents(s, spammed)
    }),
    // r15 heavy tier: the registered bodies over 6×-inflated docs so
    // the 1× denominator clears the 0.5 s clamp floor with real work
    "probe_bm25_heavy" -> ((s: SparkSession, d: String) =>
      graft.queries.Round14bQueries.bm25TopK(s, inflateDocs(s, d, 6),
        graft.queries.Round14bQueries.Bm25Terms, k = 10)),
    "probe_collocations_heavy" -> ((s: SparkSession, d: String) =>
      graft.queries.Round14bQueries.collocationsTop(s,
        inflateDocs(s, d, 6), minSupport = 5L, k = 15)),
    // spatial probes over DISJOINT planes (x offset ≫ any eps per
    // copy): true pair count and grid work both grow ×copies — the
    // honest linear data model (the g_* disjoint-subgraph pattern);
    // the scaled dir's near-coincident copies would instead densify
    // every cell ×K and make output itself quadratic
    "probe_spatial_heavy" -> ((s: SparkSession, d: String) =>
      graft.ops.Relational.gridNeighborJoin(
        inflateEmbPlanes(s, d, 6), "vec_id", "x", "y", eps = 0.05)),
    "probe_dbscan_heavy" -> ((s: SparkSession, d: String) =>
      graft.queries.Round15Queries.dbscan(
        inflateEmbPlanes(s, d, 6), "vec_id", eps = 0.02, minPts = 4L)),
    // planted span outlier (the r14 verdict's skew shape — natural
    // spans are fixed 7/11-day windows): one decade-wide interval
    // rides with the 11-day windows; it contains EVERY lineitem point
    // (output grows by +|points|, linear), and under the replaced
    // max-span width derivation it widened every bucket to 10 years —
    // per-bucket candidates ≈ |points|·|intervals| (cartesian
    // collapse). The tiered layout isolates it in its own coarse tier,
    // so this probe's ratio staying ~linear IS the r15 fix's evidence.
    "probe_interval_outlier" -> ((s: SparkSession, d: String) => {
      val iv = Tables.table(s, d, "orders")
        .filter(pmod(col("o_orderkey"), lit(89L)) === 0)
        .select(col("o_orderkey").as("order_id"),
          col("o_orderdate").cast("timestamp").as("win_start"),
          (col("o_orderdate") + expr("INTERVAL 11 DAYS"))
            .cast("timestamp").as("win_end"))
        .unionByName(s.sql(
          "SELECT CAST(-1 AS BIGINT) AS order_id, " +
            "TIMESTAMP'1990-01-01 00:00:00' AS win_start, " +
            "TIMESTAMP'2000-01-01 00:00:00' AS win_end"))
      val pts = Tables.table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate"))
      graft.ops.Relational.intervalJoin(pts, iv, "l_shipdate",
          "win_start", "win_end")
        .groupBy(col("order_id"))
        .agg(count(lit(1)).as("n_ship"))
    }))

  /** Embeddings inflated `copies`× and spread into DISJOINT 2-D planes
    * of ~2000 points each (the natural corpus density): plane =
    * md5-hash(vec_id) mod P with P = total/2000 derived in-plan, x
    * offset 1000·plane (far beyond any probe eps). Hash-spreading is
    * load-bearing: the SCALED probe dir's own K× copies are
    * NEAR-COINCIDENT (component-0 perturbed by 0.001·copy, inside any
    * probe eps), so any deterministic-by-copy planing leaves them in
    * one cell and densifies it ×K — pair volume ×K², which is how the
    * r15 32× sweep OOM'd probe_dbscan_heavy's pair checkpoint (~500 M
    * materialized rows). Hash planes split coincident copies across
    * planes, so per-plane density stays ~natural and pair count/work
    * scale ~linearly with total points — the honest data model.
    */
  private def inflateEmbPlanes(s: SparkSession, d: String,
      copies: Int): org.apache.spark.sql.DataFrame = {
    val emb = Tables.embeddings(s, d)
    val inflated = emb
      .crossJoin(broadcast(s.range(0, copies.toLong).toDF("copy")))
      .select((col("vec_id") * copies + col("copy")).as("vec_id"),
        element_at(col("embedding"), 1).cast("double").as("x0"),
        element_at(col("embedding"), 2).cast("double").as("y"))
    val planes = broadcast(inflated.agg(
      greatest(lit(1L), (count(lit(1)) / lit(2000L)).cast("long"))
        .as("__planes")))
    inflated.crossJoin(planes)
      .select(col("vec_id"),
        (col("x0") + pmod(graft.functions.text.md5_prefix64(
            col("vec_id").cast("string"), 15), col("__planes"))
          .cast("double") * 1000.0).as("x"),
        col("y"))
  }

  private def probeFn(name: String)
      : (SparkSession, String) => org.apache.spark.sql.DataFrame =
    extraProbes.getOrElse(name, SparkEntry.queries(name))

  /** SPARK_GRAFT_PROBES=a,b restricts the probe set (iteration aid;
    * guard runs ignore it so the tripwire always covers everything). */
  private def selectedProbes(guard: Boolean): Seq[String] =
    if (guard) probes
    else sys.env.get("SPARK_GRAFT_PROBES")
      .map(_.split(",").map(_.trim).toSet)
      .fold(probes)(only => probes.filter(only))

  def main(args: Array[String]): Unit = {
    val guard = args.headOption.contains("guard")
    val k = if (guard || args.isEmpty) 8 else args(0).toInt
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val scaled = java.nio.file.Files
      .createTempDirectory(s"graft-scale${k}x-").toFile
    sys.addShutdownHook(graft.queries.Scratch.rmTree(scaled))
    val docs = Tables.documents(spark, sfDir)
    val maxDoc = docs.agg(max($"doc_id")).head().getLong(0) + 1
    val copies = spark.range(0, k.toLong).toDF("copy")
    // per-copy id offset; text perturbed with a copy tag so cross-copy
    // rows are near-dups of each other only at the shingle tail, and
    // exact-dup/bucket structure stays realistic instead of K² blowup
    docs.crossJoin(broadcast(copies))
      .select(($"doc_id" + $"copy" * maxDoc).as("doc_id"),
        concat($"text", lit(" copytag"), $"copy").as("text"),
        $"lang", $"source", $"n_chars")
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$scaled/documents.parquet")
    val emb = Tables.embeddings(spark, sfDir)
    val maxVec = emb.agg(max($"vec_id")).head().getLong(0) + 1
    emb.crossJoin(broadcast(copies))
      .select(($"vec_id" + $"copy" * maxVec).as("vec_id"),
        // rotate one component deterministically per copy
        expr("transform(embedding, (x, i) -> " +
          "CAST(x + CAST(copy AS FLOAT) * CAST(0.001 AS FLOAT) * " +
          "CAST(CASE WHEN i = 0 THEN 1 ELSE 0 END AS FLOAT) AS FLOAT))")
          .as("embedding"),
        // FULL natural schema (the lineitem ADVICE lesson): a probe
        // touching a column the copy dropped fails with a
        // missing-column error that looks like a query bug
        $"label")
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$scaled/embeddings.parquet")
    // events: K disjoint copies — user ids AND timestamps offset per
    // copy (either alone is wrong: shared minutes across copies would
    // grow per-bucket cliques ×K → K² edge blowup; shared users would
    // collapse cross-copy pairs under the edge DISTINCT). The result is
    // K disjoint co-activity subgraphs: edges, components, and peel
    // work all scale ×K — the honest data model for the g_* probes.
    // Built from the NORMALIZED frame (ts TIMESTAMP, micros) so the
    // copy shift is plain integer arithmetic; Tables.events passes the
    // written TimestampType column straight through on read.
    val ev = Tables.events(spark, sfDir)
    val (minTs, maxTs, maxUser, maxEvent) = {
      val r = ev.agg(min(unix_micros($"ts")), max(unix_micros($"ts")),
        max($"user_id"), max($"event_id")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val spanUs = maxTs - minTs + 86400L * 1000000L
    ev.crossJoin(broadcast(copies))
      .select(($"user_id" + $"copy" * (maxUser + 1)).as("user_id"),
        ($"event_id" + $"copy" * (maxEvent + 1)).as("event_id"),
        $"event_type",
        timestamp_micros(unix_micros($"ts") + $"copy" * spanUs).as("ts"),
        $"value", $"props")
      .write.mode(SaveMode.Overwrite).parquet(s"$scaled/events.parquet")
    // lineitem: K× points (keys re-offset; ship dates UNCHANGED so
    // density grows ×K inside the same span) against the symlinked
    // orders' FIXED interval set — the j_interval probe then measures
    // the bucketized join under pure point growth, output ×K.
    val li = Tables.table(spark, sfDir, "lineitem")
    val maxOk = li.agg(max($"l_orderkey")).head().getLong(0) + 1
    // FULL schema carried through (column list derived from it): any
    // future lineitem-touching probe sees the same columns as the
    // natural dir — only the key is re-offset
    li.crossJoin(broadcast(copies))
      .select(($"l_orderkey" + $"copy" * maxOk).as("l_orderkey") +:
        li.columns.filter(_ != "l_orderkey").map(col).toSeq: _*)
      .write.mode(SaveMode.Overwrite).parquet(s"$scaled/lineitem.parquet")
    Seq("region", "nation", "customer", "supplier", "part",
      "orders").foreach { t =>
      java.nio.file.Files.createSymbolicLink(
        new java.io.File(scaled, s"$t.parquet").toPath,
        java.nio.file.Paths.get(s"$sfDir/$t.parquet"))
    }

    def time(name: String, dir: String, runs: Int): (Double, Long) = {
      var rows = 0L
      def once: Double = {
        val t0 = System.nanoTime()
        rows = probeFn(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val rs = Seq.fill(runs)(once)
      // raw runs on stderr: run1−run2 separates one-time cost (training,
      // fixture build — absorbed by the artifact caches) from steady
      // state, the first question when a ratio looks super-linear
      System.err.println(f"[probe] $name $dir runs " +
        rs.map(r => f"$r%.2f").mkString("/"))
      (rs.min, rows)
    }
    println(f"${"query"}%-24s ${"1x"}%8s ${s"${k}x"}%8s ratio")
    val attempts = selectedProbes(guard).map { q =>
      try {
        // the 1× side is the ratio DENOMINATOR: one noisy 0.33 s sample
        // there prints a phantom 21× (the r10 d_semdedup_auto artifact),
        // so it gets min-of-3 while the K× side keeps min-of-2 (it is
        // K× the cost and sits in the numerator, where noise only
        // OVERSTATES a ratio the clamp below already bounds)
        val (t1, rows1) = time(q, sfDir, runs = 3)
        val (tk, rowsk) = time(q, scaled.getAbsolutePath, runs = 2)
        println(f"$q%-24s $t1%8.2f $tk%8.2f ${ratio(t1, tk)}%5.1fx")
        Right((q, t1, tk, rows1, rowsk))
      } catch {
        case e: Exception =>
          println(s"$q FAILED: ${e.getMessage.take(120)}")
          Left(q)
      }
    }
    val measured = attempts.collect {
      case Right((q, t1, tk, _, _)) => (q, t1, tk) }
    val failedProbes = attempts.collect { case Left(q) => q }
    // rows1/rowsk + ratio_per_outrow carry the OUTPUT-growth
    // normalization in the committed evidence itself (r14 verdict: the
    // output-bound probes — winnow/overlap-scrub/lsh_spam — re-argue
    // "true pairs grow ~K², seconds per output row is the flatness
    // measure" every round; now the per-row ratio is a recorded
    // column). The guard reads baselines through [[baselineRatios]],
    // which accepts both this shape and the legacy t1-first rows —
    // and the Round7OpsSpec guard test parses the COMMITTED file
    // through that same function (the r15 lesson: a format change
    // here silently emptied the old t1-anchored regex's parse and
    // killed the tripwire while an independent test regex stayed
    // green).
    val json = attempts.collect {
      case Right((q, t1, tk, rows1, rowsk)) =>
        val perRow =
          if (rows1 > 0 && rowsk > 0) (tk / rowsk) / (t1.max(0.5) / rows1)
          else ratio(t1, tk)
        f""""$q":{"rows1":$rows1,"rowsk":$rowsk,"ratio_per_outrow":$perRow%.3f,"t1":$t1%.3f,"tk":$tk%.3f,"ratio":${ratio(t1, tk)}%.3f}"""
    }.mkString("{\"k\":" + k + ",\"sf\":\"" + sfDir + "\",\"queries\":{",
      ",\n", "}}")
    // a GUARD run's measurements go to a scratch name: its job is to
    // COMPARE against the committed baseline, and writing over the
    // committed scale_probe_8x.json leaves the repo with an
    // inconsistent 8x-vs-SCALE_RATIOS pair to restore by hand (it
    // happened: the r16 final-build guard clobbered the merged file
    // minutes after it was assembled)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(
      if (guard) "guard_probe_latest.json"
      else s"scale_probe_${k}x.json"), json + "\n")
    spark.stop()
    if (guard) {
      val basePath = java.nio.file.Paths.get("SCALE_RATIOS.json")
      require(java.nio.file.Files.exists(basePath),
        "SCALE_RATIOS.json baseline missing — run ScaleProbe 8 and " +
          "commit scale_probe_8x.json as SCALE_RATIOS.json")
      // a probe that CRASHES must trip the guard, not silently vanish
      // from the comparison — a regression manifesting as an exception
      // or timeout is worse than a slow ratio
      if (failedProbes.nonEmpty)
        sys.error("SCALE GUARD FAILED — probes did not complete: " +
          failedProbes.mkString(", "))
      val regressions =
        checkGuard(java.nio.file.Files.readString(basePath), measured)
      if (regressions.nonEmpty)
        sys.error("SCALE GUARD FAILED\n" + regressions.mkString("\n"))
      println(s"SCALE GUARD OK (${measured.size} probes vs baseline)")
    }
  }

  /** Ratio with the denominator clamped to ≥ 0.5 s: a sub-half-second
    * 1× time is fixed-overhead (scheduler + codegen), not work, and
    * noise there fabricates ratios no real scaling produced (0.33 s →
    * 21× on d_semdedup_auto, r10). The clamp makes every printed /
    * recorded / guarded ratio ≥3 carry a ≥0.5 s denominator by
    * construction.
    */
  def ratio(t1: Double, tk: Double): Double = tk / math.max(t1, 0.5)

  /** Pure guard comparison (unit-tested): measured (query, t1, tK)
    * triples vs the committed baseline JSON. A probe regresses when its
    * ratio exceeds 2× its baseline ratio (floored at 1.0 so a
    * sub-linear baseline is not an impossible bar); probes absent from
    * the baseline are skipped (they enter it on the next refresh).
    * Tolerance rationale: host-load noise swings overhead-bound probe
    * ratios well under 2×; a reintroduced quadratic blows straight
    * past it at 8×.
    */
  /** Parse a probe-baseline JSON (either the legacy t1-first row shape
    * or the r15 shape with leading rows1/rowsk/ratio_per_outrow
    * fields) into name → committed ratio. Public and spec-asserted
    * against the COMMITTED SCALE_RATIOS.json: the r15 field addition
    * silently zeroed the old t1-anchored regex's matches — an empty
    * parse means the guard compares nothing and the tripwire is dead,
    * which only a parse-the-real-file assertion catches.
    */
  def baselineRatios(baselineJson: String): Map[String, Double] = {
    val ratioRe =
      """"([^"]+)":\{[^{}]*?"t1":[^,]+,"tk":[^,]+,"ratio":([0-9.]+)\}"""
        .r
    ratioRe.findAllMatchIn(baselineJson)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  def checkGuard(baselineJson: String,
                 measured: Seq[(String, Double, Double)]): Seq[String] = {
    val baseRatios = baselineRatios(baselineJson)
    measured.flatMap { case (q, t1, tk) =>
      // Absolute floor: a probe whose 8× run finishes under 2 s is
      // overhead/noise-dominated on this host (sub-second probes swing
      // 2–3× on untouched code — m_image_resize measured 0.6 ↔ 1.4 s
      // across back-to-back sweeps), so its RATIO carries no signal.
      // Every real pathology this guard exists for cleared the floor
      // comfortably: the r5 t_ngram quadratic (20 s+), the r8 SemDeDup
      // 68× blowup, the PQ codegen-deferral (2.6 s at 8×).
      baseRatios.get(q).collect {
        case b if tk > 2.0 && ratio(t1, tk) > 2.0 * math.max(b, 1.0) =>
          f"$q: ratio ${ratio(t1, tk)}%.2f vs baseline $b%.2f (>2x)"
      }
    }
  }
}
