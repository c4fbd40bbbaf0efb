package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.ScreenMetrics
import graft.queries.{Advanced, Attribution, AnalyticsQueries, BasketProgram, Breadth, CalendarNav, Cleanse, Colocate, ConfigScore, Core, Curation, CoverageProgram, ExactSubstr, FactorVectorProgram, LandingProgram, MultimodalDedup, Partitioned, PerBands, Scd2Replay, Screen, SuffixArray, TextQueries, Unigram}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an operator from SURVEY.md §2 demonstrated
  * over the driver testdata; [[oracleSql]] carries the DuckDB-equivalent SQL
  * for the correctness gate. Column names and numeric conventions are kept
  * bit-identical between the two (see [[graft.queries.Core]] scaladoc).
  */
object SparkEntry {

  /** Flagship: the refresh_stock_metrics-shaped screening program
    * (SURVEY §3.2) on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ScreenMetrics.run(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_agg" -> (Core.q01PricingAgg _),
    "q02_latest_order" -> (Core.q02LatestOrder _),
    "q03_sector_percentile" -> (Core.q03SectorPercentile _),
    "q04_sector_zscore" -> (Core.q04SectorZscore _),
    "q05_momentum_pivot" -> (Core.q05MomentumPivot _),
    "q06_asof_join" -> (Core.q06AsofJoin _),
    "q07_cum_tax_product" -> (Core.q07CumTaxProduct _),
    "q08_scd2_intervals" -> (Core.q08Scd2Intervals _),
    "q09_dedup_exact" -> (Core.q09DedupExact _),
    "q10_screen_metrics" -> ((s: SparkSession, d: String) => ScreenMetrics.run(s, d)),
    "q11_token_stats" -> (TextQueries.q11TokenStats _),
    "q12_lang_id" -> (TextQueries.q12LangId _),
    "q13_quality_score" -> (TextQueries.q13QualityScore _),
    "q14_minhash_candidates" -> (TextQueries.q14MinhashCandidates _),
    "q15_neardup_pairs" -> (TextQueries.q15NearDupPairs _),
    "q16_simhash" -> (TextQueries.q16Simhash _),
    "q17_cosine_topk" -> (TextQueries.q17CosineTopK _),
    "q18_embedding_neardup" -> (TextQueries.q18EmbeddingNearDup _),
    "q19_breadth" -> (AnalyticsQueries.q19Breadth _),
    "q20_rolling_spine" -> (AnalyticsQueries.q20RollingSpine _),
    "q21_median_bands" -> (AnalyticsQueries.q21MedianBands _),
    "q22_unpivot" -> (AnalyticsQueries.q22Unpivot _),
    "q23_missing_dates" -> (AnalyticsQueries.q23MissingDates _),
    "q24_freshness" -> (AnalyticsQueries.q24Freshness _),
    "q25_factor_vectors" -> (AnalyticsQueries.q25FactorVectors _),
    "q26_corr_stats" -> (AnalyticsQueries.q26CorrStats _),
    "q27_chained_index" -> (AnalyticsQueries.q27ChainedIndex _),
    "q28_session_expand" -> (AnalyticsQueries.q28SessionExpand _),
    "q29_rebase_factors" -> (AnalyticsQueries.q29RebaseFactors _),
    "q30_harmonic_agg" -> (AnalyticsQueries.q30HarmonicAgg _),
    "q31_technical_snapshot" ->
      ((s: SparkSession, d: String) => graft.analytics.TechnicalJob.fromEvents(s, d)),
    "q32_window_indicators" -> (AnalyticsQueries.q32WindowIndicators _),
    "q33_interval_asof" -> (Advanced.q33IntervalAsof _),
    "q34_era_dates" -> (Advanced.q34EraDates _),
    "q35_multimodal_meta" -> (Advanced.q35MultimodalMeta _),
    "q36_product_agg" -> (Advanced.q36ProductAgg _),
    "q37_json_payload" -> (Advanced.q37JsonPayload _),
    "q38_columngroup_merge" -> (AnalyticsQueries.q38ColumnGroupMerge _),
    "q39_multikey_semi" -> (Advanced.q39MultiKeySemi _),
    "q40_topk_per_group" -> (Advanced.q40TopKPerGroup _),
    "q41_distinct_on" -> (Advanced.q41DistinctOnPreferNonNull _),
    "q42_market_breadth" -> (Breadth.q42MarketBreadth _),
    "q43_per_bands" -> (PerBands.q43PerBands _),
    "q44_tracking_error" -> (AnalyticsQueries.q44TrackingError _),
    "q45_screen_published" -> (Screen.q45ScreenPublished _),
    "q46_fins_cleanse" -> (Cleanse.q46FinsCleanse _),
    "q47_ann_multiprobe" -> (TextQueries.q47AnnMultiprobe _),
    "q48_neardup_capped" -> (TextQueries.q48NearDupCapped _),
    "q49_constituents_diff" -> (Advanced.q49ConstituentsDiff _),
    "q50_html_scrape" -> (Advanced.q50HtmlScrape _),
    "q51_frame_sample" -> (Advanced.q51FrameSample _),
    "q52_salted_agg" -> (AnalyticsQueries.q52SaltedAgg _),
    "q53_bucketed_join" -> (Colocate.q53BucketedJoin _),
    "q54_winnow_fingerprint" -> (TextQueries.q54WinnowFingerprint _),
    "q55_basket_valuation" -> (BasketProgram.q55BasketValuation _),
    "q56_factor_vector_search" -> (FactorVectorProgram.q56FactorVectorSearch _),
    "q57_ivf_search" -> (TextQueries.q57IvfSearch _),
    "q58_scd2_replay" -> (Scd2Replay.q58Scd2Replay _),
    "q59_waterfill_weights" -> (BasketProgram.q59WaterfillWeights _),
    "q60_business_day_nav" -> (CalendarNav.q60BusinessDayNav _),
    "q61_neardup_clusters" -> (TextQueries.q61NearDupClusters _),
    "q62_containment_pairs" -> (TextQueries.q62ContainmentPairs _),
    "q63_stratified_sample" -> (Curation.q63StratifiedSample _),
    "q64_sequence_packing" -> (Curation.q64SequencePacking _),
    "q65_vocab_coverage" -> (Curation.q65VocabCoverage _),
    "q66_simhash_pairs" -> (TextQueries.q66SimhashPairs _),
    "q67_repetition_stats" -> (Curation.q67RepetitionStats _),
    "q68_decontamination" -> (Curation.q68Decontamination _),
    "q69_dedup_corpus" -> (TextQueries.q69DedupCorpus _),
    "q70_corpus_clean" -> (Curation.q70CorpusClean _),
    "q71_bm25" -> (TextQueries.q71Bm25 _),
    "q72_lm_score" -> (Curation.q72LmScore _),
    "q73_shard_assign" -> (Curation.q73ShardAssign _),
    "q74_ivf_kmeans" -> (TextQueries.q74IvfKmeans _),
    "q75_chunking" -> (Curation.q75Chunking _),
    "q76_training_manifest" -> (Curation.q76TrainingManifest _),
    "q77_incremental_dedup" -> (TextQueries.q77IncrementalDedup _),
    "q78_media_decode" -> (Advanced.q78MediaDecode _),
    "q79_neardup_clusters_stars" -> (TextQueries.q79NearDupClustersStars _),
    "q80_blocklist_scrub" -> (Curation.q80BlocklistScrub _),
    "q81_dsir_importance" -> (Curation.q81DsirImportance _),
    "q82_hll_distinct" -> (Advanced.q82HllDistinct _),
    "q83_boilerplate_ngrams" -> (Curation.q83BoilerplateNgrams _),
    "q84_source_drift" -> (Curation.q84SourceDrift _),
    "q85_weighted_sample" -> (Curation.q85WeightedSample _),
    "q86_semdedup" -> (TextQueries.q86SemDedup _),
    "q87_hard_negatives" -> (TextQueries.q87HardNegatives _),
    "q88_dup_spans" -> (Curation.q88DupSpans _),
    "q89_knn_graph" -> (TextQueries.q89KnnGraph _),
    "q90_quantile_sketch" -> (Curation.q90QuantileSketch _),
    "q91_png_decode" -> (Advanced.q91PngDecode _),
    "q92_stream_screen" -> (TextQueries.q92StreamScreen _),
    "q93_stream_windowed_agg" -> (Advanced.q93StreamWindowedAgg _),
    "q94_stream_dedup" -> (TextQueries.q94StreamDedup _),
    "q95_stream_cardinality" -> (Advanced.q95StreamCardinality _),
    "q96_stream_breadth" -> (Advanced.q96StreamBreadth _),
    "q97_bloom_screen" -> (Curation.q97BloomScreen _),
    "q98_sq8_recall" -> (TextQueries.q98Sq8Recall _),
    "q99_pq_adc_recall" -> (TextQueries.q99PqAdcRecall _),
    "q100_bigram_lm" -> (Curation.q100BigramLm _),
    "q101_token_budget" -> (Curation.q101TokenBudget _),
    "q102_sessionize" -> (AnalyticsQueries.q102Sessionize _),
    "q103_funnel" -> (AnalyticsQueries.q103Funnel _),
    "q104_retention" -> (AnalyticsQueries.q104RetentionCohorts _),
    "q105_stream_stream_join" -> (Advanced.q105StreamStreamJoin _),
    "q106_grouped_ols" -> (AnalyticsQueries.q106GroupedOls _),
    "q107_cube_rollup" -> (Advanced.q107CubeRollup _),
    "q108_embed_stats" -> (TextQueries.q108EmbedStats _),
    "q109_zorder_layout" -> (Advanced.q109ZorderLayout _),
    "q110_incremental_agg" -> (Advanced.q110IncrementalAgg _),
    "q111_heavy_hitters" -> (Curation.q111HeavyHitters _),
    "q112_lev_pairs" -> (TextQueries.q112LevPairs _),
    "q113_pagerank" -> (Advanced.q113PageRank _),
    "q114_welch_ttest" -> (AnalyticsQueries.q114WelchTTest _),
    "q115_source_overlap" -> (TextQueries.q115SourceOverlap _),
    "q116_stream_maintain" -> (Advanced.q116StreamMaintain _),
    "q117_linear_interp" -> (AnalyticsQueries.q117LinearInterp _),
    "q118_asof_tolerance" -> (Core.q118AsofTolerance _),
    "q119_wav_frames" -> (Advanced.q119WavFrames _),
    "q120_quality_report" -> (Advanced.q120QualityReport _),
    "q121_growth_metrics" -> (AnalyticsQueries.q121GrowthMetrics _),
    "q122_robust_z" -> (AnalyticsQueries.q122RobustZ _),
    "q123_allpairs_join" -> (TextQueries.q123AllPairsJoin _),
    "q124_span_dedup" -> (Curation.q124SpanDedup _),
    "q125_bpe_merges" -> (Curation.q125BpeMerges _),
    "q126_cms_estimate" -> (Curation.q126CmsEstimate _),
    "q127_bpe_encode" -> (Curation.q127BpeEncode _),
    "q128_mmr_rerank" -> (TextQueries.q128MmrRerank _),
    "q129_inverted_index" -> (TextQueries.q129InvertedIndex _),
    "q130_quality_classifier" -> (Curation.q130QualityClassifier _),
    "q131_jl_projection" -> (TextQueries.q131JlProjection _),
    "q132_compaction_plan" -> (Curation.q132CompactionPlan _),
    "q133_rebalance" -> (Curation.q133Rebalance _),
    "q134_rrf_fusion" -> (TextQueries.q134RrfFusion _),
    "q135_dataset_card" -> (Curation.q135DatasetCard _),
    "q136_quality_keeper" -> (TextQueries.q136QualityKeeper _),
    "q137_semantic_decontam" -> (TextQueries.q137SemanticDecontam _),
    "q138_top_p" -> (Curation.q138TopP _),
    "q139_pmi_pairs" -> (Curation.q139PmiPairs _),
    "q140_gif_decode" -> (Advanced.q140GifDecode _),
    "q141_skip_grams" -> (Curation.q141SkipGrams _),
    "q142_zipf_fit" -> (Curation.q142ZipfFit _),
    "q143_stream_cms" -> (Curation.q143StreamCms _),
    "q144_split_assign" -> (Curation.q144SplitAssign _),
    "q145_novelty_curve" -> (TextQueries.q145NoveltyCurve _),
    "q146_triangles" -> (Advanced.q146Triangles _),
    "q147_auc" -> (Curation.q147Auc _),
    "q148_nfc" -> (Curation.q148Nfc _),
    "q149_mixture_plan" -> (Curation.q149MixturePlan _),
    "q150_dbscan" -> (TextQueries.q150Dbscan _),
    "q151_cluster_labels" -> (TextQueries.q151ClusterLabels _),
    "q152_lsh_calibration" -> (TextQueries.q152LshCalibration _),
    "q153_kcore" -> (Advanced.q153KCore _),
    "q154_char_entropy" -> (Curation.q154CharEntropy _),
    "q155_ivf_sweep" -> (TextQueries.q155IvfSweep _),
    "q156_cdc_chunks" -> (Curation.q156CdcChunks _),
    "q157_stream_sessions" -> (AnalyticsQueries.q157StreamSessions _),
    "q158_vit_patches" -> (Advanced.q158VitPatches _),
    "q159_pii_redact" -> (Curation.q159PiiRedact _),
    "q160_leadlag" -> (AnalyticsQueries.q160LeadLag _),
    "q161_kmv_sketch" -> (Curation.q161KmvSketch _),
    "q162_kmv_overlap" -> (Curation.q162KmvOverlap _),
    "q163_calibration" -> (Curation.q163Calibration _),
    "q164_kmeans_elbow" -> (TextQueries.q164KmeansElbow _),
    "q165_gzip_roundtrip" -> (Advanced.q165GzipRoundtrip _),
    "q166_snapshot_diff" -> (Curation.q166SnapshotDiff _),
    "q167_shuffle_manifest" -> (Curation.q167ShuffleManifest _),
    "q168_personalized_pr" -> (Advanced.q168PersonalizedPr _),
    "q169_burst_detect" -> (AnalyticsQueries.q169BurstDetect _),
    "q170_decayed_activity" -> (AnalyticsQueries.q170DecayedActivity _),
    "q171_good_turing" -> (Curation.q171GoodTuring _),
    "q172_richness" -> (Curation.q172Richness _),
    "q173_heaps_fit" -> (Curation.q173HeapsFit _),
    "q174_quantile_norm" -> (Curation.q174QuantileNorm _),
    "q175_ks_test" -> (Curation.q175KsTest _),
    "q176_packing_audit" -> (Curation.q176PackingAudit _),
    "q177_benford" -> (AnalyticsQueries.q177Benford _),
    "q178_mann_kendall" -> (AnalyticsQueries.q178MannKendall _),
    "q179_theil_sen" -> (AnalyticsQueries.q179TheilSen _),
    "q180_changepoint" -> (AnalyticsQueries.q180Changepoint _),
    "q181_dow_profile" -> (AnalyticsQueries.q181DowProfile _),
    "q182_jpeg_decode" -> (Advanced.q182JpegDecode _),
    "q183_pca_power" -> (Advanced.q183PcaPower _),
    "q184_record_linkage" -> (Advanced.q184RecordLinkage _),
    "q185_leak_safe_split" -> (Advanced.q185LeakSafeSplit _),
    "q186_bootstrap_ci" -> (Advanced.q186BootstrapCi _),
    "q187_stream_outer_join" -> (Advanced.q187StreamOuterJoin _),
    "q188_conformal_ci" -> (Advanced.q188ConformalCi _),
    "q189_target_encode" -> (Advanced.q189TargetEncode _),
    "q190_isotonic_fit" -> (Advanced.q190IsotonicFit _),
    "q191_textrank" -> (Advanced.q191TextRank _),
    "q192_kneser_ney" -> (Advanced.q192KneserNey _),
    "q193_assoc_rules" -> (Advanced.q193AssociationRules _),
    "q194_dpp_prune" -> (Partitioned.q194DppPrune _),
    "q195_beam_search" -> (TextQueries.q195BeamSearch _),
    "q196_stream_scd2" -> (Scd2Replay.q196StreamScd2 _),
    "q197_wav_mfcc" -> (Advanced.q197WavMfcc _),
    "q198_incr_partitioned" -> (Partitioned.q198IncrementalPartitioned _),
    "q199_phash_pairs" -> (Advanced.q199PhashPairs _),
    "q200_config_score" -> (ConfigScore.q200ConfigScore _),
    "q201_audio_match" -> (Advanced.q201AudioMatch _),
    "q202_video_match" -> (Advanced.q202VideoMatch _),
    "q203_maxsim" -> (Advanced.q203Maxsim _),
    "q204_label_prop" -> (TextQueries.q204LabelProp _),
    "q205_kcenter" -> (Advanced.q205Kcenter _),
    "q206_suffix_array" -> (SuffixArray.q206SuffixArray _),
    "q207_longest_repeat" -> (SuffixArray.q207LongestRepeat _),
    "q208_unigram_segment" -> (Unigram.q208UnigramSegment _),
    "q209_corpus_suffix_rank" -> (SuffixArray.q209CorpusSuffixRank _),
    "q210_markov_attribution" -> (Attribution.q210MarkovAttribution _),
    "q211_exact_substr" -> (ExactSubstr.q211ExactSubstrDedup _),
    "q212_multimodal_dedup" -> (MultimodalDedup.q212MultimodalDedup _),
    "q213_incr_exact_substr" -> (ExactSubstr.q213IncrementalExactSubstr _),
    "q214_stream_exact_substr" -> (ExactSubstr.q214StreamExactSubstr _),
    "q215_token_exact_substr" -> (ExactSubstr.q215TokenExactSubstr _),
    "q216_restart_exact_substr" -> (ExactSubstr.q216RestartExactSubstr _),
    "q217_incr_token_exact_substr" -> (ExactSubstr.q217IncrTokenExactSubstr _),
    "q218_coverage_catchup" -> (CoverageProgram.q218CoverageCatchup _),
    "q219_landing_pipeline" -> (LandingProgram.q219LandingPipeline _),
    "q220_generic_landing" -> (LandingProgram.q220GenericLanding _),
    "q221_scheduled_refresh" -> (LandingProgram.q221ScheduledRefresh _),
    "q222_corrections_window" -> (LandingProgram.q222CorrectionsWindow _),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
        |        * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
        |        * (1 - CAST(l_discount AS DECIMAL(12,2)))
        |        * (1 + CAST(l_tax AS DECIMAL(12,2))) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
        |  COUNT(*) AS count_order,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_latest_order" ->
      """SELECT o_custkey, o_orderkey AS latest_orderkey,
        |  CAST(o_orderdate AS DATE) AS latest_orderdate,
        |  o_totalprice AS latest_totalprice
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders) t
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q03_sector_percentile" ->
      """SELECT c_custkey, c_nationkey, c_acctbal,
        |  CASE WHEN c_acctbal IS NOT NULL THEN
        |    (1 - percent_rank() OVER (PARTITION BY c_nationkey, c_acctbal IS NULL
        |                              ORDER BY c_acctbal DESC)) * 100 END AS bal_pctile
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q04_sector_zscore" ->
      """SELECT c_custkey, c_nationkey, c_acctbal,
        |  CASE WHEN msq - mu*mu > 0
        |       THEN (c_acctbal - mu) / sqrt(msq - mu*mu) END AS bal_z
        |FROM (
        |  SELECT c_custkey, c_nationkey, c_acctbal,
        |    CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) OVER w AS DOUBLE)
        |      / COUNT(*) OVER w AS mu,
        |    CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(12,2))
        |          * CAST(c_acctbal AS DECIMAL(12,2)) AS DECIMAL(30,4))) OVER w
        |         AS DOUBLE) / COUNT(*) OVER w AS msq
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey)
        |) t ORDER BY c_custkey""".stripMargin,

    "q05_momentum_pivot" ->
      """SELECT o_custkey,
        |  MAX(CASE WHEN rn = 1 THEN o_totalprice END) AS price_rn1,
        |  MAX(CASE WHEN rn = 3 THEN o_totalprice END) AS price_rn3,
        |  MAX(CASE WHEN rn = 5 THEN o_totalprice END) AS price_rn5
        |FROM (SELECT o_custkey, o_totalprice,
        |        ROW_NUMBER() OVER (PARTITION BY o_custkey
        |          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders) t
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q06_asof_join" ->
      """WITH tagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS side,
        |    CASE WHEN event_type = 'purchase' THEN event_id END AS p_eid,
        |    CASE WHEN event_type = 'purchase' THEN value END AS p_val
        |  FROM events WHERE event_type IN ('click', 'purchase'))
        |SELECT event_id, user_id, asof_event_id, asof_value FROM (
        |  SELECT event_id, user_id, side,
        |    last_value(p_eid IGNORE NULLS) OVER w AS asof_event_id,
        |    last_value(p_val IGNORE NULLS) OVER w AS asof_value
        |  FROM tagged
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |) t WHERE side = 1 ORDER BY event_id""".stripMargin,

    "q07_cum_tax_product" ->
      """WITH factors AS (
        |  SELECT l_orderkey, l_linenumber, MIN(l_tax) AS tax
        |  FROM lineitem GROUP BY l_orderkey, l_linenumber
        |)
        |SELECT l_orderkey, l_linenumber,
        |  product(floor(tax * 100 + 0.5) + 100.0) OVER (
        |    PARTITION BY l_orderkey ORDER BY l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |  / power(100.0, CAST(ROW_NUMBER() OVER (
        |      PARTITION BY l_orderkey ORDER BY l_linenumber) AS DOUBLE))
        |  AS cum_tax_factor
        |FROM factors ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q08_scd2_intervals" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), runs AS (
        |  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
        |  FROM flagged
        |), iv AS (
        |  SELECT user_id, run_id, MIN(event_type) AS state, MIN(ts) AS valid_from
        |  FROM runs GROUP BY user_id, run_id
        |)
        |SELECT user_id, state, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id) AS valid_to,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id) IS NULL AS is_current
        |FROM iv ORDER BY user_id, valid_from""".stripMargin,

    "q09_dedup_exact" ->
      """SELECT doc_id, fp FROM (
        |  SELECT doc_id, fp, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        |  FROM (SELECT doc_id,
        |          md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |        FROM documents) t
        |) WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q10_screen_metrics" -> ScreenMetrics.oracle,
    "q11_token_stats" -> TextQueries.oracleQ11,
    "q12_lang_id" -> TextQueries.oracleQ12,
    "q13_quality_score" -> TextQueries.oracleQ13,
    "q14_minhash_candidates" -> TextQueries.oracleQ14,
    "q15_neardup_pairs" -> TextQueries.oracleQ15,
    "q16_simhash" -> TextQueries.oracleQ16,
    "q17_cosine_topk" -> TextQueries.oracleQ17,
    "q18_embedding_neardup" -> TextQueries.oracleQ18,
    "q19_breadth" -> AnalyticsQueries.oracleQ19,
    "q20_rolling_spine" -> AnalyticsQueries.oracleQ20,
    "q21_median_bands" -> AnalyticsQueries.oracleQ21,
    "q22_unpivot" -> AnalyticsQueries.oracleQ22,
    "q23_missing_dates" -> AnalyticsQueries.oracleQ23,
    "q24_freshness" -> AnalyticsQueries.oracleQ24,
    "q25_factor_vectors" -> AnalyticsQueries.oracleQ25,
    "q26_corr_stats" -> AnalyticsQueries.oracleQ26,
    "q27_chained_index" -> AnalyticsQueries.oracleQ27,
    "q28_session_expand" -> AnalyticsQueries.oracleQ28,
    "q29_rebase_factors" -> AnalyticsQueries.oracleQ29,
    "q30_harmonic_agg" -> AnalyticsQueries.oracleQ30,
    // q31: the recursive kernels are replayed in DuckDB as a recursive CTE
    // doing the identical IEEE-754 op sequence (see TechnicalJob.oracleQ31).
    "q31_technical_snapshot" -> graft.analytics.TechnicalJob.oracleQ31,
    "q32_window_indicators" -> AnalyticsQueries.oracleQ32,
    // q33 must agree with q06 exactly — the two as-of formulations share
    // one oracle
    "q33_interval_asof" -> asofOracle,
    "q34_era_dates" -> Advanced.oracleQ34,
    "q35_multimodal_meta" -> Advanced.oracleQ35,
    "q36_product_agg" -> Advanced.oracleQ36,
    "q37_json_payload" -> Advanced.oracleQ37,
    "q38_columngroup_merge" -> AnalyticsQueries.oracleQ38,
    "q39_multikey_semi" -> Advanced.oracleQ39,
    "q40_topk_per_group" -> Advanced.oracleQ40,
    "q41_distinct_on" -> Advanced.oracleQ41,
    "q42_market_breadth" -> Breadth.oracleQ42,
    "q43_per_bands" -> PerBands.oracleQ43,
    "q44_tracking_error" -> AnalyticsQueries.oracleQ44,
    "q45_screen_published" -> Screen.oracleQ45,
    "q46_fins_cleanse" -> Cleanse.oracleQ46,
    "q47_ann_multiprobe" -> TextQueries.oracleQ47,
    "q48_neardup_capped" -> TextQueries.oracleQ48,
    "q49_constituents_diff" -> Advanced.oracleQ49,
    "q50_html_scrape" -> Advanced.oracleQ50,
    "q51_frame_sample" -> Advanced.oracleQ51,
    "q52_salted_agg" -> AnalyticsQueries.oracleQ52,
    "q53_bucketed_join" -> Colocate.oracleQ53,
    "q54_winnow_fingerprint" -> TextQueries.oracleQ54,
    "q55_basket_valuation" -> BasketProgram.oracleQ55,
    "q56_factor_vector_search" -> FactorVectorProgram.oracleQ56,
    "q57_ivf_search" -> TextQueries.oracleQ57,
    "q58_scd2_replay" -> Scd2Replay.oracleQ58,
    "q59_waterfill_weights" -> BasketProgram.oracleQ59,
    "q60_business_day_nav" -> CalendarNav.oracleQ60,
    "q61_neardup_clusters" -> TextQueries.oracleQ61,
    "q62_containment_pairs" -> TextQueries.oracleQ62,
    "q63_stratified_sample" -> Curation.oracleQ63,
    "q64_sequence_packing" -> Curation.oracleQ64,
    "q65_vocab_coverage" -> Curation.oracleQ65,
    "q66_simhash_pairs" -> TextQueries.oracleQ66,
    "q67_repetition_stats" -> Curation.oracleQ67,
    "q68_decontamination" -> Curation.oracleQ68,
    "q69_dedup_corpus" -> TextQueries.oracleQ69,
    "q70_corpus_clean" -> Curation.oracleQ70,
    "q71_bm25" -> TextQueries.oracleQ71,
    "q72_lm_score" -> Curation.oracleQ72,
    "q73_shard_assign" -> Curation.oracleQ73,
    "q74_ivf_kmeans" -> TextQueries.oracleQ74,
    "q75_chunking" -> Curation.oracleQ75,
    "q76_training_manifest" -> Curation.oracleQ76,
    "q77_incremental_dedup" -> TextQueries.oracleQ77,
    "q78_media_decode" -> Advanced.oracleQ78,
    "q79_neardup_clusters_stars" -> TextQueries.oracleQ79,
    "q80_blocklist_scrub" -> Curation.oracleQ80,
    "q81_dsir_importance" -> Curation.oracleQ81,
    "q82_hll_distinct" -> Advanced.oracleQ82,
    "q83_boilerplate_ngrams" -> Curation.oracleQ83,
    "q84_source_drift" -> Curation.oracleQ84,
    "q85_weighted_sample" -> Curation.oracleQ85,
    "q86_semdedup" -> TextQueries.oracleQ86,
    "q87_hard_negatives" -> TextQueries.oracleQ87,
    "q88_dup_spans" -> Curation.oracleQ88,
    "q89_knn_graph" -> TextQueries.oracleQ89,
    "q90_quantile_sketch" -> Curation.oracleQ90,
    "q91_png_decode" -> Advanced.oracleQ91,
    "q92_stream_screen" -> TextQueries.oracleQ92,
    "q93_stream_windowed_agg" -> Advanced.oracleQ93,
    "q94_stream_dedup" -> TextQueries.oracleQ94,
    "q95_stream_cardinality" -> Advanced.oracleQ95,
    "q96_stream_breadth" -> Advanced.oracleQ96,
    "q97_bloom_screen" -> Curation.oracleQ97,
    "q98_sq8_recall" -> TextQueries.oracleQ98,
    "q99_pq_adc_recall" -> TextQueries.oracleQ99,
    "q100_bigram_lm" -> Curation.oracleQ100,
    "q101_token_budget" -> Curation.oracleQ101,
    "q102_sessionize" -> AnalyticsQueries.oracleQ102,
    "q103_funnel" -> AnalyticsQueries.oracleQ103,
    "q104_retention" -> AnalyticsQueries.oracleQ104,
    "q105_stream_stream_join" -> Advanced.oracleQ105,
    "q106_grouped_ols" -> AnalyticsQueries.oracleQ106,
    "q107_cube_rollup" -> Advanced.oracleQ107,
    "q108_embed_stats" -> TextQueries.oracleQ108,
    "q109_zorder_layout" -> Advanced.oracleQ109,
    "q110_incremental_agg" -> Advanced.oracleQ110,
    "q111_heavy_hitters" -> Curation.oracleQ111,
    "q112_lev_pairs" -> TextQueries.oracleQ112,
    "q113_pagerank" -> Advanced.oracleQ113,
    "q114_welch_ttest" -> AnalyticsQueries.oracleQ114,
    "q115_source_overlap" -> TextQueries.oracleQ115,
    "q116_stream_maintain" -> Advanced.oracleQ116,
    "q117_linear_interp" -> AnalyticsQueries.oracleQ117,
    "q118_asof_tolerance" -> Core.oracleQ118,
    "q119_wav_frames" -> Advanced.oracleQ119,
    "q120_quality_report" -> Advanced.oracleQ120,
    "q121_growth_metrics" -> AnalyticsQueries.oracleQ121,
    "q122_robust_z" -> AnalyticsQueries.oracleQ122,
    "q123_allpairs_join" -> TextQueries.oracleQ123,
    "q124_span_dedup" -> Curation.oracleQ124,
    "q125_bpe_merges" -> Curation.oracleQ125,
    "q126_cms_estimate" -> Curation.oracleQ126,
    "q127_bpe_encode" -> Curation.oracleQ127,
    "q128_mmr_rerank" -> TextQueries.oracleQ128,
    "q129_inverted_index" -> TextQueries.oracleQ129,
    "q130_quality_classifier" -> Curation.oracleQ130,
    "q131_jl_projection" -> TextQueries.oracleQ131,
    "q132_compaction_plan" -> Curation.oracleQ132,
    "q133_rebalance" -> Curation.oracleQ133,
    "q134_rrf_fusion" -> TextQueries.oracleQ134,
    "q135_dataset_card" -> Curation.oracleQ135,
    "q136_quality_keeper" -> TextQueries.oracleQ136,
    "q137_semantic_decontam" -> TextQueries.oracleQ137,
    "q138_top_p" -> Curation.oracleQ138,
    "q139_pmi_pairs" -> Curation.oracleQ139,
    "q140_gif_decode" -> Advanced.oracleQ140,
    "q141_skip_grams" -> Curation.oracleQ141,
    "q142_zipf_fit" -> Curation.oracleQ142,
    "q143_stream_cms" -> Curation.oracleQ143,
    "q144_split_assign" -> Curation.oracleQ144,
    "q145_novelty_curve" -> TextQueries.oracleQ145,
    "q146_triangles" -> Advanced.oracleQ146,
    "q147_auc" -> Curation.oracleQ147,
    "q148_nfc" -> Curation.oracleQ148,
    "q149_mixture_plan" -> Curation.oracleQ149,
    "q150_dbscan" -> TextQueries.oracleQ150,
    "q151_cluster_labels" -> TextQueries.oracleQ151,
    "q152_lsh_calibration" -> TextQueries.oracleQ152,
    "q153_kcore" -> Advanced.oracleQ153,
    "q154_char_entropy" -> Curation.oracleQ154,
    "q155_ivf_sweep" -> TextQueries.oracleQ155,
    "q156_cdc_chunks" -> Curation.oracleQ156,
    "q157_stream_sessions" -> AnalyticsQueries.oracleQ157,
    "q158_vit_patches" -> Advanced.oracleQ158,
    "q159_pii_redact" -> Curation.oracleQ159,
    "q160_leadlag" -> AnalyticsQueries.oracleQ160,
    "q161_kmv_sketch" -> Curation.oracleQ161,
    "q162_kmv_overlap" -> Curation.oracleQ162,
    "q163_calibration" -> Curation.oracleQ163,
    "q164_kmeans_elbow" -> TextQueries.oracleQ164,
    "q165_gzip_roundtrip" -> Advanced.oracleQ165,
    "q166_snapshot_diff" -> Curation.oracleQ166,
    "q167_shuffle_manifest" -> Curation.oracleQ167,
    "q168_personalized_pr" -> Advanced.oracleQ168,
    "q169_burst_detect" -> AnalyticsQueries.oracleQ169,
    "q170_decayed_activity" -> AnalyticsQueries.oracleQ170,
    "q171_good_turing" -> Curation.oracleQ171,
    "q172_richness" -> Curation.oracleQ172,
    "q173_heaps_fit" -> Curation.oracleQ173,
    "q174_quantile_norm" -> Curation.oracleQ174,
    "q175_ks_test" -> Curation.oracleQ175,
    "q176_packing_audit" -> Curation.oracleQ176,
    "q177_benford" -> AnalyticsQueries.oracleQ177,
    "q178_mann_kendall" -> AnalyticsQueries.oracleQ178,
    "q179_theil_sen" -> AnalyticsQueries.oracleQ179,
    "q180_changepoint" -> AnalyticsQueries.oracleQ180,
    "q181_dow_profile" -> AnalyticsQueries.oracleQ181,
    "q182_jpeg_decode" -> Advanced.oracleQ182,
    "q183_pca_power" -> Advanced.oracleQ183,
    "q184_record_linkage" -> Advanced.oracleQ184,
    "q185_leak_safe_split" -> Advanced.oracleQ185,
    "q186_bootstrap_ci" -> Advanced.oracleQ186,
    "q187_stream_outer_join" -> Advanced.oracleQ187,
    "q188_conformal_ci" -> Advanced.oracleQ188,
    "q189_target_encode" -> Advanced.oracleQ189,
    "q190_isotonic_fit" -> Advanced.oracleQ190,
    "q191_textrank" -> Advanced.oracleQ191,
    "q192_kneser_ney" -> Advanced.oracleQ192,
    "q193_assoc_rules" -> Advanced.oracleQ193,
    "q194_dpp_prune" -> Partitioned.oracleQ194,
    "q195_beam_search" -> TextQueries.oracleQ195,
    // stream ≡ batch: the CDC-maintained history must hash-equal q58's
    // batch replay, so the two gates share one oracle
    "q196_stream_scd2" -> Scd2Replay.oracleQ58,
    "q197_wav_mfcc" -> Advanced.oracleQ197,
    "q198_incr_partitioned" -> Partitioned.oracleQ198,
    "q199_phash_pairs" -> Advanced.oracleQ199,
    "q200_config_score" -> ConfigScore.oracleQ200,
    "q201_audio_match" -> Advanced.oracleQ201,
    "q202_video_match" -> Advanced.oracleQ202,
    "q203_maxsim" -> Advanced.oracleQ203,
    "q204_label_prop" -> TextQueries.oracleQ204,
    "q205_kcenter" -> Advanced.oracleQ205,
    "q206_suffix_array" -> SuffixArray.oracleQ206,
    "q207_longest_repeat" -> SuffixArray.oracleQ207,
    "q208_unigram_segment" -> Unigram.oracleQ208,
    "q209_corpus_suffix_rank" -> SuffixArray.oracleQ209,
    "q210_markov_attribution" -> Attribution.oracleQ210,
    "q211_exact_substr" -> ExactSubstr.oracleQ211,
    "q212_multimodal_dedup" -> MultimodalDedup.oracleQ212,
    "q213_incr_exact_substr" -> ExactSubstr.oracleQ213,
    "q214_stream_exact_substr" -> ExactSubstr.oracleQ211,
    "q215_token_exact_substr" -> ExactSubstr.oracleQ215,
    "q216_restart_exact_substr" -> ExactSubstr.oracleQ211,
    "q217_incr_token_exact_substr" -> ExactSubstr.oracleQ217,
    "q218_coverage_catchup" -> CoverageProgram.oracleQ218,
    "q219_landing_pipeline" -> LandingProgram.oracleQ219,
    "q220_generic_landing" -> LandingProgram.oracleQ220,
    "q221_scheduled_refresh" -> LandingProgram.oracleQ221,
    "q222_corrections_window" -> LandingProgram.oracleQ222,
  )

  private val asofOracle: String =
    """WITH tagged AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS side,
      |    CASE WHEN event_type = 'purchase' THEN event_id END AS p_eid,
      |    CASE WHEN event_type = 'purchase' THEN value END AS p_val
      |  FROM events WHERE event_type IN ('click', 'purchase'))
      |SELECT event_id, user_id, asof_event_id, asof_value FROM (
      |  SELECT event_id, user_id, side,
      |    last_value(p_eid IGNORE NULLS) OVER w AS asof_event_id,
      |    last_value(p_val IGNORE NULLS) OVER w AS asof_value
      |  FROM tagged
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |) t WHERE side = 1 ORDER BY event_id""".stripMargin
}
