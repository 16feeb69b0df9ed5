package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (and the training-data extensions)
  * is exposed as a named query in [[queries]]; SQL-expressible ones have
  * a DuckDB oracle in [[oracleSql]] (column names aligned — the driver
  * sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * ListMap: Verify and Bench iterate in REGISTRATION order, which is
    * part of the contract — `graph_fixpoint_delta` reads the fixpoint
    * certificates its parents (`graph_pagerank`, `graph_hits`,
    * registered earlier) memoize as a byproduct of their own
    * trajectories; a hash-ordered Map would make the suite cost
    * order-dependent (every query is still individually correct in
    * ANY order — a cold memo just recomputes).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(
    // -- parity: scans / pagination (S1–S3, W1–W2, P2–P3)
    "s1_changelog_count" -> Queries.s1ChangelogCount,
    "s2_changelog_page" -> Queries.s2ChangelogPage,
    "s3_changelog_scan" -> Queries.s3ChangelogScan,
    // -- parity: keyed extraction (S4–S6, J1–J2, P4)
    "s4_keyed_extract" -> Queries.s4KeyedExtract,
    "s5_bridge_extract" -> Queries.s5BridgeExtract,
    "s6_two_hop" -> Queries.s6TwoHop,
    "s7_cascade_extract" -> Queries.s7CascadeExtract,
    "s8_point_lookup" -> Queries.s8PointLookup,
    // -- parity: exists-split + merges (J3–J4, K2–K3, A4)
    "j3_exists_updates" -> Queries.j3ExistsUpdates,
    "j3_exists_inserts" -> Queries.j3ExistsInserts,
    "upsert_merge" -> Queries.upsertMerge,
    "refresh_merge" -> Queries.refreshMerge,
    // -- parity: normalization + scalar functions (F1–F3, P8)
    "f1_normalize_upper" -> Queries.f1NormalizeUpper,
    "f2_composite_key" -> Queries.f2CompositeKey,
    "f3_key_split" -> Queries.f3KeySplit,
    // -- parity: aggregation / windows / sets (A1–A7, W3, W5, T1–T2)
    "a2_work_units" -> Queries.a2WorkUnits,
    "a3_distinct_keys" -> Queries.a3DistinctKeys,
    "a6_latest_wins" -> Queries.a6LatestWins,
    "a7_error_rate" -> Queries.a7ErrorRate,
    "w3_top100" -> Queries.w3Top100,
    "t1_except_keys" -> Queries.t1ExceptKeys,
    "t2_intersect_keys" -> Queries.t2IntersectKeys,
    // -- analytics flagships
    "q1_pricing_summary" -> Queries.q1PricingSummary,
    "join_revenue_by_nation" -> Queries.joinRevenueByNation,
    "q9_profit_by_nation" -> Queries.q9ProfitByNation,
    "q17_small_qty_revenue" -> Queries.q17SmallQtyRevenue,
    "q3_top_orders" -> Queries.q3TopOrders,
    "j7_bloom_semi" -> Queries.j7BloomSemi,
    "agg_percentiles" -> Queries.aggPercentiles,
    "agg_approx_percentiles" -> Queries.aggApproxPercentiles,
    "skew_salted_agg" -> Queries.skewSaltedAgg,
    "skew_salted_join" -> Queries.skewSaltedJoin,
    "w6_lag_delta" -> Queries.w6LagDelta,
    "w8_ntile_deciles" -> Queries.w8NtileDeciles,
    "w7_daily_share" -> Queries.w7DailyShare,
    "user_event_sequence" -> Queries.userEventSequence,
    "seq_transitions" -> Queries.seqTransitions,
    "seq_trajectory_sim" -> Queries.seqTrajectorySim,
    "graph_copurchase" -> Queries.graphCopurchase,
    "inc_agg_merge" -> Queries.incAggMerge,
    "graph_pagerank" -> Queries.graphPagerank,
    "graph_ppr_seeds" -> Queries.graphPprSeeds,
    "graph_hits" -> Queries.graphHits,
    "stat_corr" -> Queries.statCorr,
    "stat_ttest" -> Queries.statTtest,
    "agg_mode" -> Queries.aggMode,
    "stat_chisq" -> Queries.statChisq,
    "stat_mannwhitney" -> Queries.statMannWhitney,
    "stat_ks" -> Queries.statKs,
    "stat_ols" -> Queries.statOls,
    "stat_spearman" -> Queries.statSpearman,
    "stat_anova" -> Queries.statAnova,
    "stat_kruskal" -> Queries.statKruskal,
    "stat_benford" -> Queries.statBenford,
    "sample_reservoir" -> Queries.sampleReservoir,
    "stat_histogram" -> Queries.statHistogram,
    "graph_triangles" -> Queries.graphTriangles,
    "graph_khop" -> Queries.graphKhop,
    "graph_labelprop" -> Queries.graphLabelprop,
    "graph_kcore" -> Queries.graphKcore,
    "graph_scc" -> Queries.graphScc,
    "graph_convergence" -> Queries.graphConvergence,
    "graph_fixpoint_delta" -> Queries.graphFixpointDelta,
    "graph_modularity" -> Queries.graphModularity,
    "er_fuzzy_pairs" -> Queries.erFuzzyPairs,
    "er_sorted_neighbors" -> Queries.erSortedNeighbors,
    "er_golden_record" -> Queries.erGoldenRecord,
    "er_entities" -> Queries.erEntities,
    "rfm_segments" -> Queries.rfmSegments,
    "ts_ewma" -> Queries.tsEwma,
    "ts_cusum" -> Queries.tsCusum,
    "ts_theil_sen" -> Queries.tsTheilSen,
    "ts_changepoint" -> Queries.tsChangepoint,
    "ts_seasonal" -> Queries.tsSeasonal,
    "media_phash" -> Queries.mediaPhash,
    "media_audio_fp" -> Queries.mediaAudioFp,
    // -- extensions: dedup family
    "dedup_exact" -> Queries.dedupExact,
    "dedup_bag" -> Queries.dedupBag,
    "dedup_exact_survivors" -> Queries.dedupExactSurvivors,
    "dedup_ngram_jaccard" -> Queries.dedupNgramJaccard,
    "dedup_apss_cosine" -> Queries.dedupApssCosine,
    "dedup_containment" -> Queries.dedupContainment,
    "dedup_containment_survivors" -> Queries.dedupContainmentSurvivors,
    "dedup_cluster_sizes" -> Queries.dedupClusterSizes,
    "dedup_minhash_lsh" -> Queries.dedupMinhashLsh,
    "dedup_simhash" -> Queries.dedupSimhash,
    "dedup_components" -> Queries.dedupComponents,
    "dedup_survivors_cc" -> Queries.dedupSurvivorsCc,
    "decontaminate" -> Queries.decontaminate,
    "decon_substring" -> Queries.deconSubstring,
    "dedup_cosine_pairs" -> Queries.dedupCosinePairs,
    "dedup_cosine_lsh" -> Queries.dedupCosineLsh,
    "dedup_cosine_components" -> Queries.dedupCosineComponents,
    "emb_kmeans_assign" -> Queries.embKmeansAssign,
    "sim_knn_graph" -> Queries.simKnnGraph,
    "dedup_semantic" -> Queries.dedupSemantic,
    "dedup_hot_spans" -> Queries.dedupHotSpans,
    "dedup_char_spans" -> Queries.dedupCharSpans,
    "dedup_char_removal" -> Queries.dedupCharRemoval,
    "dedup_incremental" -> Queries.dedupIncremental,
    "dedup_incremental_neardup" -> Queries.dedupIncrementalNeardup,
    "dedup_cdc_chunks" -> Queries.dedupCdcChunks,
    "dedup_cdc_ratio" -> Queries.dedupCdcRatio,
    "dedup_keep_first" -> Queries.dedupKeepFirst,
    "dedup_minhash_est" -> Queries.dedupMinhashEst,
    "dedup_span_removal" -> Queries.dedupSpanRemoval,
    "corpus_cap_source" -> Queries.corpusCapSource,
    "text_lm_score" -> Queries.textLmScore,
    "text_collocations" -> Queries.textCollocations,
    "text_novelty" -> Queries.textNovelty,
    "text_tfidf" -> Queries.textTfIdf,
    "corpus_quality_buckets" -> Queries.corpusQualityBuckets,
    "corpus_curriculum" -> Queries.corpusCurriculum,
    "text_code_detect" -> Queries.textCodeDetect,
    "text_url_canonical" -> Queries.textUrlCanonical,
    "dedup_by_url" -> Queries.dedupByUrl,
    "dedup_url_hosts" -> Queries.dedupUrlHosts,
    "corpus_host_cap" -> Queries.corpusHostCap,
    "sample_stratified" -> Queries.sampleStratified,
    "sample_kcenter" -> Queries.sampleKcenter,
    "sample_token_budget" -> Queries.sampleTokenBudget,
    "sim_rerank_topk" -> Queries.simRerankTopk,
    "sim_mmr_rerank" -> Queries.simMmrRerank,
    "prepare_pretraining_full" -> Queries.preparePretrainingFull,
    "curate_corpus" -> Queries.curateCorpus,
    "prepare_pretraining" -> Queries.preparePretraining,
    // -- extensions: similarity search
    "sim_cosine_topk" -> Queries.simCosineTopk,
    "sim_hard_negatives" -> Queries.simHardNegatives,
    "sim_contrastive_set" -> Queries.simContrastiveSet,
    "sim_lsh_topk" -> Queries.simLshTopk,
    "sim_ivf_topk" -> Queries.simIvfTopk,
    "sim_pq_topk" -> Queries.simPqTopk,
    "sim_ivfpq_topk" -> Queries.simIvfPqTopk,
    "sim_ivfpq_trained" -> Queries.simIvfPqTrained,
    "sim_sq_topk" -> Queries.simSqTopk,
    "sim_ivf_partial" -> Queries.simIvfPartial,
    "sim_mips_topk" -> Queries.simMipsTopk,
    "sim_mips_recall" -> Queries.simMipsRecall,
    "sim_mips_ivf" -> Queries.simMipsIvf,
    "sim_lsh_partial" -> Queries.simLshPartial,
    "sim_recall_report" -> Queries.simRecallReport,
    "sim_recall_report_ivf" -> Queries.simRecallReportIvf,
    "sim_ivf_manifest" -> Queries.simIvfManifest,
    "sim_sq_error" -> Queries.simSqError,
    "sim_pq_error" -> Queries.simPqError,
    "emb_drift" -> Queries.embDrift,
    "corpus_datasheet" -> Queries.corpusDatasheet,
    // -- extensions: text analysis
    "text_token_count" -> Queries.textTokenCount,
    "tok_bpe_pairs" -> Queries.tokBpePairs,
    "tok_bpe_encode" -> Queries.tokBpeEncode,
    "tok_bpe_dropout" -> Queries.tokBpeDropout,
    "tok_bpe_bytes" -> Queries.tokBpeBytes,
    "tok_bpe_bytes_merges" -> Queries.tokBpeBytesMerges,
    "tok_fertility" -> Queries.tokFertility,
    "tok_bpe_roundtrip" -> Queries.tokBpeRoundtrip,
    "tok_bpe_merges" -> Queries.tokBpeMerges,
    "tok_bpe_vocab" -> Queries.tokBpeVocab,
    "tok_bpe_trained" -> Queries.tokBpeTrained,
    "tok_wordpiece" -> Queries.tokWordpiece,
    "tok_coverage" -> Queries.tokCoverage,
    "pack_efficiency" -> Queries.packEfficiency,
    "tok_wordpiece_ids" -> Queries.tokWordpieceIds,
    "tok_wordpiece_train" -> Queries.tokWordpieceTrain,
    "tok_wordpiece_trained" -> Queries.tokWordpieceTrained,
    "tok_unigram" -> Queries.tokUnigram,
    "tok_unigram_sampled" -> Queries.tokUnigramSampled,
    "tok_unigram_train" -> Queries.tokUnigramTrain,
    "tok_unigram_trained" -> Queries.tokUnigramTrained,
    "layout_zorder" -> Queries.layoutZorder,
    "layout_hilbert" -> Queries.layoutHilbert,
    "layout_skipping" -> Queries.layoutSkipping,
    "dq_expectations" -> Queries.dqExpectations,
    "agg_grouping_sets" -> Queries.aggGroupingSets,
    "agg_heavy_hitters" -> Queries.aggHeavyHitters,
    "agg_heavy_hitters_sketch" -> Queries.aggHeavyHittersSketch,
    "tokenize_publish" -> Queries.tokenizePublish,
    "publish_unigram" -> Queries.publishUnigram,
    "text_quality" -> Queries.textQuality,
    "text_fingerprint" -> Queries.textFingerprint,
    "text_winnow" -> Queries.textWinnow,
    "split_train_val" -> Queries.splitTrainVal,
    "split_leakage_safe" -> Queries.splitLeakageSafe,
    "split_host_disjoint" -> Queries.splitHostDisjoint,
    "pack_chunks" -> Queries.packChunks,
    "pack_no_split" -> Queries.packNoSplit,
    "pack_bfd" -> Queries.packBfd,
    "chunk_overlap" -> Queries.chunkOverlap,
    "pack_length_buckets" -> Queries.packLengthBuckets,
    "text_lang_id" -> Queries.textLangId,
    "text_rake" -> Queries.textRake,
    "text_pii_redact" -> Queries.textPiiRedact,
    "text_pii_audit" -> Queries.textPiiAudit,
    "text_normalize" -> Queries.textNormalize,
    "text_boilerplate" -> Queries.textBoilerplate,
    "text_blocklist" -> Queries.textBlocklist,
    "text_mojibake" -> Queries.textMojibake,
    "text_classifier_pr" -> Queries.textClassifierPr,
    "curation_funnel" -> Queries.curationFunnel,
    "text_kn_score" -> Queries.textKnScore,
    "text_kn3_score" -> Queries.textKn3Score,
    "text_kn5_score" -> Queries.textKn5Score,
    "text_gopher_filter" -> Queries.textGopherFilter,
    "text_repetition" -> Queries.textRepetition,
    "corpus_reweight" -> Queries.corpusReweight,
    "corpus_mix_target" -> Queries.corpusMixTarget,
    "corpus_temperature_mix" -> Queries.corpusTemperatureMix,
    "corpus_interleave" -> Queries.corpusInterleave,
    "corpus_drift" -> Queries.corpusDrift,
    "shard_manifest" -> Queries.shardManifest,
    "decon_semantic" -> Queries.deconSemantic,
    "publish_shards" -> Queries.publishShards,
    "corpus_dsir_weights" -> Queries.corpusDsirWeights,
    "corpus_dsir_sample" -> Queries.corpusDsirSample,
    "text_vocab" -> Queries.textVocab,
    "text_bm25" -> Queries.textBm25,
    "text_postings" -> Queries.textPostings,
    "corpus_stats" -> Queries.corpusStats,
    "corpus_zipf" -> Queries.corpusZipf,
    // -- parity wave 2: log analytics, scalar fns, skip metrics
    "s9_log_parse" -> Queries.s9LogParse,
    "f5_manila_iso" -> Queries.f5ManilaIso,
    "f6_uptime" -> Queries.f6Uptime,
    "f7_zero_pad" -> Queries.f7ZeroPad,
    "f8_json_extract" -> Queries.f8JsonExtract,
    "p6_skip_counting" -> Queries.p6SkipCounting,
    "w4_sample_errors" -> Queries.w4SampleErrors,
    "w5_running_sum" -> Queries.w5RunningSum,
    "a1_distinct_count" -> Queries.a1DistinctCount,
    "a1_approx_distinct" -> Queries.a1ApproxDistinct,
    "agg_grouped_distinct" -> Queries.aggGroupedDistinct,
    "t3_union_totals" -> Queries.t3UnionTotals,
    // -- extensions: windows, grouping sets, embeddings, multimodal
    "window_tumbling" -> Queries.windowTumbling,
    "session_windows" -> Queries.sessionWindows,
    "concurrent_sessions" -> Queries.concurrentSessions,
    "ts_acf" -> Queries.tsAcf,
    "ts_decompose" -> Queries.tsDecompose,
    "ts_mad_outliers" -> Queries.tsMadOutliers,
    "ts_holt" -> Queries.tsHolt,
    "ts_gapfill" -> Queries.tsGapfill,
    "text_quality_score" -> Queries.textQualityScore,
    "text_quality_classifier" -> Queries.textQualityClassifier,
    "asof_join" -> Queries.asofJoin,
    "scd2_lookup" -> Queries.scd2Lookup,
    "j6_click_attribution" -> Queries.j6ClickAttribution,
    "j6_unconverted_views" -> Queries.j6UnconvertedViews,
    "funnel_conversion" -> Queries.funnelConversion,
    "scd2_history" -> Queries.scd2History,
    "window_sliding" -> Queries.windowSliding,
    "daily_ops_report" -> Queries.dailyOpsReport,
    "reconcile_sources" -> Queries.reconcileSources,
    "dq_profile" -> Queries.dqProfile,
    "cohort_retention" -> Queries.cohortRetention,
    "pivot_counts" -> Queries.pivotCounts,
    "unpivot_counts" -> Queries.unpivotCounts,
    "f_string_funcs" -> Queries.fStringFuncs,
    "rollup_revenue" -> Queries.rollupRevenue,
    "cube_revenue" -> Queries.cubeRevenue,
    "ts_zscore" -> Queries.tsZscore,
    "ts_ohlc" -> Queries.tsOhlc,
    "emb_norm_stats" -> Queries.embNormStats,
    "emb_abtt" -> Queries.embAbtt,
    "emb_pca1" -> Queries.embPca1,
    "emb_rp_project" -> Queries.embRpProject,
    "media_profile" -> Queries.mediaProfile,
    "mm_align_gate" -> Queries.mmAlignGate,
    "media_features" -> Queries.mediaFeatures,
    "media_frames" -> Queries.mediaFrames,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (MinHash/SimHash/LSH — xxhash64-based; rows-only check).
    */
  def oracleSql: Map[String, String] = Oracles.sql

  /** Registered queries that are CORRECTNESS BASELINES, not 100-TB
    * paths — deliberately O(N²)/full-scan implementations kept so the
    * approximate scale operators have an exact, oracle-backed
    * reference to be verified against. Machine-readable so a reader
    * (or the driver) can tell baselines from production paths; each
    * maps to its registered SCALE TWIN — the query that computes the
    * same relationship with a bounded candidate set
    * (`DriverContractSpec` asserts both sides stay registered and no
    * twin is itself a baseline).
    */
  val baselineOnly: Map[String, String] = Map(
    // exact all-pairs cosine (a.join(b, a_id < b_id)) — the soundness
    // reference the banded-LSH arm is spec-proven a subset of
    "dedup_cosine_pairs" -> "dedup_cosine_lsh",
    // brute-force full-corpus top-k scan per query — the recall
    // ground truth for the bucketed ANN family
    "sim_cosine_topk" -> "sim_lsh_topk",
    // brute full-corpus inner-product scan — ground truth for the
    // augmented-IVF MIPS path
    "sim_mips_topk" -> "sim_mips_ivf",
    // 3 token-stream scans (exact top-20 verification face + count +
    // sketch-bound probe); the twin is the one-pass CMS + sampled
    // candidates form with no exact arm at all
    "agg_heavy_hitters" -> "agg_heavy_hitters_sketch",
  )
}
