package graft

import graft.core.{PrefixScan, Profiler, Quantiles, Stats}
import graft.eval.Metrics
import graft.features.{FrequencyIndexer, Imputers}
import graft.score.ZScoreAnomaly
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Driver contract — each entry in `queries` is one operator from
  * SURVEY.md §2 exercised on the harness tables (TESTDATA.md); each entry
  * in `oracleSql` is the DuckDB-equivalent SQL the driver hash-compares
  * against at sf0.01.
  *
  * Determinism rules applied throughout (both sides):
  *  - additive aggregates accumulate in DECIMAL(38,10) (exact,
  *    associative — partition-order-independent), cast to DOUBLE last;
  *  - every output is ORDER BY'd on a unique key;
  *  - free-floating doubles are round()ed to a fixed scale.
  */
object SparkEntry extends EntryQueries1 with EntryQueries2 with EntryQueries3 with OracleSqlA with OracleSqlB with OracleSqlC {

  private[graft] val lineitemNumerics =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private[graft] val anomalyFeatures = lineitemNumerics

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Z-score anomaly detection over lineitem numeric features — the
    * reference's score→quantile-threshold→flag flow (SURVEY.md §3.2)
    * with a model-free scorer.
    */
  def entry(spark: SparkSession): DataFrame =
    qZscoreAnomaly(spark, "/root/testdata/sf0.001")

  // ----------------------------------------------------------------- //
  // ----------------------------------------------------------------- //

  /** Queries deliberately registered without an oracle — the driver
    * records a rows-only check. EMPTY since round 10: q34, the last
    * rows-only row, now ships a distributional self-verifying audit
    * (exact lineitem anchors + binomial-band / chi-square / no-dup /
    * permutation-length booleans the oracle pins TRUE — the q190/q191
    * pattern), so every registered query sits inside the hard gate.
    */
  def rowsOnlyQueries: Set[String] = Set.empty

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (qPricingSummary _),
    "q02_profile" -> (qProfile _),
    "q03_quantiles" -> (qQuantiles _),
    "q04_filter_topk" -> (qFilterTopk _),
    "q05_union_align" -> (qUnionAlign _),
    "q06_impute_mean" -> (qImputeMean _),
    "q07_zscore_anomaly" -> (qZscoreAnomaly _),
    "q08_string_index" -> (qStringIndex _),
    "q09_confusion" -> (qConfusion _),
    "q10_roc_auc" -> (qRocAuc _),
    "q11_sliding_seq" -> (qSlidingSeq _),
    "q12_seq_expand" -> (qSeqExpand _),
    "q13_pad_align" -> (qPadAlign _),
    "q14_impute_median" -> (qImputeMedian _),
    "q15_standardize" -> (qStandardize _),
    "q16_clip" -> (qClip _),
    "q17_sparse_fractions" -> (qSparseFractions _),
    "q18_youden" -> (qYouden _),
    "q19_variance" -> (qVariance _),
    "q20_text_stats" -> (qTextStats _),
    "q21_lang_id" -> (qLangId _),
    "q22_text_quality" -> (qTextQuality _),
    "q23_exact_dedup" -> (qExactDedup _),
    "q24_jaccard_pairs" -> (qJaccardPairs _),
    "q25_minhash_lsh" -> (qMinHashLsh _),
    "q26_simhash" -> (qSimHash _),
    "q27_simhash_pairs" -> (qSimHashPairs _),
    "q28_cosine_dups" -> (qCosineDups _),
    "q29_cosine_topk" -> (qCosineTopK _),
    "q30_lsh_ann" -> (qLshAnn _),
    "q31_join_revenue" -> (qJoinRevenue _),
    "q32_hash_sample" -> (qHashSample _),
    "q33_smote" -> (qSmote _),
    "q34_sample_shuffle" -> (qSampleShuffle _),
    "q35_iforest" -> (qIsolationForest _),
    "q36_linear_ae" -> (qLinearAE _),
    "q37_binary_meta" -> (qBinaryMeta _),
    "q38_grid_threshold" -> (qGridThreshold _),
    "q39_recon_mae" -> (qReconMae _),
    "q40_seq_recon_mae" -> (qSeqReconMae _),
    "q41_feature_pipeline" -> (qFeaturePipeline _),
    "q42_salted_agg" -> (qSaltedAgg _),
    "q43_sql_surface" -> (qSqlSurface _),
    "q44_seq_ae_score" -> (qSeqAeScore _),
    "q45_ivf_ann" -> (qIvfAnn _),
    "q46_tfidf" -> (qTfIdf _),
    "q47_dedup_clusters" -> (qDedupClusters _),
    "q48_quality_checks" -> (qQualityChecks _),
    "q49_binned_roc" -> (qBinnedRoc _),
    "q50_ranking" -> (qRanking _),
    "q51_cardinality" -> (qCardinality _),
    "q52_lsh_cosine_dups" -> (qLshCosineDups _),
    "q53_mlp_ae" -> (qMlpAe _),
    "q54_if_grid" -> (qIfGrid _),
    "q55_schema_align" -> (qSchemaAlign _),
    "q56_cv_grid" -> (qCvGrid _),
    "q57_vae_loss" -> (qVaeLoss _),
    "q58_sessionize" -> (qSessionize _),
    "q59_repetition" -> (qRepetition _),
    "q60_pii_redact" -> (qPiiRedact _),
    "q61_decontam" -> (qDecontam _),
    "q62_asof_join" -> (qAsofJoin _),
    "q63_psi_drift" -> (qPsiDrift _),
    "q64_ks_drift" -> (qKsDrift _),
    "q65_chi2_drift" -> (qChi2Drift _),
    "q66_rolling_feats" -> (qRollingFeats _),
    "q67_corr_matrix" -> (qCorrMatrix _),
    "q68_robust_scale" -> (qRobustScale _),
    "q69_grouped_quantiles" -> (qGroupedQuantiles _),
    "q70_roc_curve" -> (qRocCurve _),
    "q71_binned_roc_curve" -> (qBinnedRocCurve _),
    "q72_strat_sample" -> (qStratSample _),
    "q73_dim_pad" -> (qDimPad _),
    "q74_image_meta" -> (qImageMeta _),
    "q75_audio_meta" -> (qAudioMeta _),
    "q76_embed_quant" -> (qEmbedQuant _),
    "q77_seq_pack" -> (qSeqPack _),
    "q78_delta_dedup" -> (qDeltaDedup _),
    "q79_dup_spans" -> (qDupSpans _),
    "q80_zorder" -> (qZorder _),
    "q81_vocab" -> (qVocab _),
    "q82_quality_filter" -> (qQualityFilter _),
    "q83_neg_sample" -> (qNegSample _),
    "q84_label_centroids" -> (qLabelCentroids _),
    "q85_snapshot_diff" -> (qSnapshotDiff _),
    "q86_length_buckets" -> (qLengthBuckets _),
    "q87_grouped_pack" -> (qGroupedPack _),
    "q88_postings" -> (qPostings _),
    "q89_pr_curve" -> (qPrCurve _),
    "q90_calibration" -> (qCalibration _),
    "q91_salted_join" -> (qSaltedJoin _),
    "q92_temperature_mix" -> (qTemperatureMix _),
    "q93_pack_texts" -> (qPackTexts _),
    "q94_span_mask" -> (qSpanMask _),
    "q95_split_assign" -> (qSplitAssign _),
    "q96_bigram_lm" -> (qBigramLm _),
    "q97_quality_prune" -> (qQualityPrune _),
    "q98_split_leakage" -> (qSplitLeakage _),
    "q99_pivot" -> (qPivot _),
    "q100_unpivot" -> (qUnpivot _),
    "q101_resample" -> (qResample _),
    "q102_curation_pipeline" -> (qCurationPipeline _),
    "q103_deep_ae" -> (qDeepAe _),
    "q104_source_cap" -> (qSourceCap _),
    "q105_normalize" -> (qNormalize _),
    "q106_token_entropy" -> (qTokenEntropy _),
    "q107_cdc_merge" -> (qCdcMerge _),
    "q108_discretize" -> (qDiscretize _),
    "q109_target_encode" -> (qTargetEncode _),
    "q110_interval_join" -> (qIntervalJoin _),
    "q111_ewma" -> (qEwma _),
    "q112_mutual_info" -> (qMutualInfo _),
    "q113_weighted_sample" -> (qWeightedSample _),
    "q114_feature_hash" -> (qFeatureHash _),
    "q115_vocab_encode" -> (qVocabEncode _),
    "q116_chunk" -> (qChunk _),
    "q117_pca" -> (qPca _),
    "q118_trend" -> (qTrend _),
    "q119_lift_gains" -> (qLiftGains _),
    "q120_mad_score" -> (qMadScore _),
    "q121_spearman" -> (qSpearman _),
    "q122_cramers_v" -> (qCramersV _),
    "q123_benford" -> (qBenford _),
    "q124_gini" -> (qGini _),
    "q125_cusum" -> (qCusum _),
    "q126_weighted_quantiles" -> (qWeightedQuantiles _),
    "q127_rollup" -> (qRollup _),
    "q128_skyline" -> (qSkyline _),
    "q129_fuzzy_pairs" -> (qFuzzyPairs _),
    "q130_bootstrap_ci" -> (qBootstrapCi _),
    "q131_isotonic" -> (qIsotonic _),
    "q132_mahalanobis" -> (qMahalanobis _),
    "q133_theilsen" -> (qTheilSen _),
    "q134_funnel" -> (qFunnel _),
    "q135_retention" -> (qRetention _),
    "q136_hbos" -> (qHbos _),
    "q137_seasonal_resid" -> (qSeasonalResid _),
    "q138_transitions" -> (qTransitions _),
    "q139_sliding_dau" -> (qSlidingDau _),
    "q140_scd2" -> (qScd2 _),
    "q141_welch_ttest" -> (qWelch _),
    "q142_rfm" -> (qRfm _),
    "q143_pareto" -> (qPareto _),
    "q144_basket_pairs" -> (qBasket _),
    "q145_acf" -> (qAcf _),
    "q146_js_div" -> (qJsDiv _),
    "q147_heavy_hitters" -> (qHeavyHitters _),
    "q148_pagerank" -> (qPageRank _),
    "q149_kaplan_meier" -> (qKaplanMeier _),
    "q150_event_paths" -> (qEventPaths _),
    "q151_trimmed_mean" -> (qTrimmedMean _),
    "q152_mannwhitney" -> (qMannWhitney _),
    "q153_prop_ztest" -> (qPropZtest _),
    "q154_seasonal_decompose" -> (qSeasonalDecompose _),
    "q155_quantile_normalize" -> (qQuantileNormalize _),
    "q156_triangles" -> (qTriangles _),
    "q157_logrank" -> (qLogRank _),
    "q158_pettitt" -> (qPettitt _),
    "q159_pmi" -> (qPmi _),
    "q160_cube" -> (qCube _),
    "q161_kruskal" -> (qKruskal _),
    "q162_jarque_bera" -> (qJarqueBera _),
    "q163_anova" -> (qAnova _),
    "q164_bm25" -> (qBm25 _),
    "q165_ref_integrity" -> (qRefIntegrity _),
    "q166_kendall" -> (qKendall _),
    "q167_holt" -> (qHolt _),
    "q168_item_sim" -> (qItemSim _),
    "q169_fd_audit" -> (qFdAudit _),
    "q170_ndcg" -> (qNdcg _),
    "q171_stump" -> (qStump _),
    "q172_brown_forsythe" -> (qBrownForsythe _),
    "q173_ols" -> (qOls _),
    "q174_kappa" -> (qKappa _),
    "q175_vocab_overlap" -> (qVocabOverlap _),
    "q176_sample_shuffle_audit" -> (qSampleShuffleAudit _),
    "q177_ccf" -> (qCcf _),
    "q178_cohens_d" -> (qCohensD _),
    "q179_hhi" -> (qHhi _),
    "q180_lorenz" -> (qLorenz _),
    "q181_degree_hist" -> (qDegreeHist _),
    "q182_stickiness" -> (qStickiness _),
    "q183_lang_mix" -> (qLangMix _),
    "q184_cluster_size_hist" -> (qClusterSizeHist _),
    "q185_ohlc" -> (qOhlc _),
    "q186_fertility" -> (qFertility _),
    "q187_cross_source_dups" -> (qCrossSourceDups _),
    "q188_class_weights" -> (qClassWeights _),
    "q189_odds_ratio" -> (qOddsRatio _),
    "q190_quantile_sketch" -> (qQuantileSketch _),
    "q191_hll_audit" -> (qHllAudit _),
    "q192_window_suite" -> (qWindowSuite _),
    "q193_grouping_sets" -> (qGroupingSets _),
    "q194_semi_anti" -> (qSemiAnti _),
    "q195_levene" -> (qLevene _),
    "q196_rate_ratio" -> (qRateRatio _),
    "q197_gap_stats" -> (qGapStats _),
    "q198_semdedup" -> (qSemDedup _),
    "q199_perplexity_buckets" -> (qPerplexityBuckets _),
    "q200_bpe_pairs" -> (qBpePairs _),
    "q201_range_window" -> (qRangeWindow _),
    "q202_minhash_est_audit" -> (qMinhashEstAudit _),
    "q203_cmh" -> (qCmh _),
    "q204_dedup_sweep" -> (qDedupSweep _),
    "q205_purge_audit" -> (qPurgeAudit _),
    "q206_bh_fdr" -> (qBhFdr _),
    "q207_set_ops" -> (qSetOps _),
    "q208_tokenizer_coverage" -> (qTokenizerCoverage _),
    "q209_hard_negatives" -> (qHardNegatives _),
    "q210_data_card" -> (qDataCard _),
    "q211_pq_quantize" -> (qPqQuantize _),
    "q212_hybrid_rrf" -> (qHybridRrf _),
    "q213_video_meta" -> (qVideoMeta _),
    "q214_count_min" -> (qCountMinSketch _),
    "q215_ivfpq_ann" -> (qIvfPq _),
    "q216_incremental_agg" -> (qIncrementalAgg _),
    "q217_attribution" -> (qAttribution _),
    "q218_holt_winters" -> (qHoltWinters _),
    "q219_conformal" -> (qConformal _),
    "q220_forecast_backtest" -> (qForecastBacktest _),
    "q221_png_decode" -> (qPngDecode _),
    "q222_cluster_safe_split" -> (qClusterSafeSplit _),
    "q223_token_budget" -> (qTokenBudget _),
    "q224_knn_join" -> (qKnnJoin _),
    "q225_domain_weights" -> (qDomainWeights _),
    "q226_matryoshka" -> (qMatryoshka _),
    "q227_bpe_train" -> (qBpeTrain _),
    "q228_zipf_fit" -> (qZipfFit _),
    "q229_bpe_encode" -> (qBpeEncode _),
    "q230_skew_report" -> (qSkewReport _),
    "q231_ngram_novelty" -> (qNgramNovelty _),
    "q232_wav_decode" -> (qWavDecode _),
    "q233_gif_decode" -> (qGifDecode _),
    "q234_jpeg_decode" -> (qJpegDecode _),
    "q235_json_roundtrip" -> (qJsonRoundtrip _),
    "q236_winnowing" -> (qWinnowing _),
    "q237_blocking_quality" -> (qBlockingQuality _),
    "q238_compression_signal" -> (qCompressionSignal _),
    "q239_lof" -> (qLof _),
    "q240_dbscan" -> (qDbscan _),
    "q241_lsh_quality" -> (qLshQuality _),
    "q242_dp_release" -> (qDpRelease _),
    "q243_survivorship" -> (qSurvivorship _),
    "q244_kmv_sets" -> (qKmvSets _),
    "q245_woe" -> (qWoe _),
    "q246_kcore" -> (qKCore _),
    "q247_assoc_rules" -> (qAssocRules _),
    "q248_outlier_ensemble" -> (qOutlierEnsemble _),
    "q249_curation_v2" -> (qCurationV2 _),
    "q250_filtered_ann" -> (qFilteredAnn _),
    "q251_intrinsic_dim" -> (qIntrinsicDim _),
    "q252_kcenter" -> (qKCenter _),
    "q253_dedup_funnel" -> (qDedupFunnel _),
    "q254_epoch_plan" -> (qEpochPlan _),
    "q255_manifest" -> (qManifest _),
    "q256_snm_quality" -> (qSnmQuality _),
    "q257_cuped" -> (qCuped _),
    "q258_qte" -> (qQte _),
    "q259_srm" -> (qSrm _),
    "q260_ratio_delta" -> (qRatioDelta _),
    "q261_paragraph_dedup" -> (qParagraphDedup _),
    "q262_dsir" -> (qDsir _),
    "q263_silhouette" -> (qSilhouette _),
    "q264_jl_projection" -> (qJlProjection _),
    "q265_power_mde" -> (qPowerMde _),
    "q266_msprt" -> (qMsprt _),
    "q267_temp_scaling" -> (qTempScaling _),
    "q268_energy_distance" -> (qEnergyDistance _),
    "q269_neyman" -> (qNeyman _),
    "q270_label_prop" -> (qLabelProp _),
    "q271_fellegi_sunter" -> (qFellegiSunter _),
    "q272_shapley_attribution" -> (qShapleyAttribution _),
    "q273_stratified_ate" -> (qStratifiedAte _),
    "q274_ams_f2" -> (qAmsF2 _),
    "q275_iv_late" -> (qIvLate _),
    "q276_did" -> (qDid _),
    "q277_rdd" -> (qRdd _),
    "q278_raking" -> (qRaking _),
    "q279_w1_drift" -> (qW1Drift _),
    "q280_coverage_select" -> (qCoverageSelect _),
    "q281_brier" -> (qBrier _),
    "q282_collocations" -> (qCollocations _),
    "q283_pinball" -> (qPinball _),
    "q284_ht_total" -> (qHtTotal _),
    "q285_uplift" -> (qUplift _),
    "q286_retrieval_eval" -> (qRetrievalEval _),
    "q287_centroid_classifier" -> (qCentroidClassifier _),
    "q288_kneser_ney" -> (qKneserNey _),
    "q289_good_turing" -> (qGoodTuring _),
    "q290_link_prediction" -> (qLinkPrediction _),
    "q291_hill_tail" -> (qHillTail _),
    "q292_mcnemar" -> (qMcnemar _),
    "q293_hits" -> (qHits _),
    "q294_bloom_fpr" -> (qBloomFpr _),
    "q295_heaps" -> (qHeaps _),
    "q296_textrank" -> (qTextRank _),
    "q297_durbin_watson" -> (qDurbinWatson _),
    "q298_source_js" -> (qSourceJs _),
    "q299_mmr" -> (qMmr _),
    "q300_ljung_box" -> (qLjungBox _),
    "q301_gmm_em" -> (qGmmEm _),
    "q302_friedman" -> (qFriedman _),
    "q303_binseg" -> (qBinseg _),
    "q304_chow" -> (qChow _),
    "q305_containment" -> (qContainment _),
    "q306_capture_recapture" -> (qCaptureRecapture _),
    "q307_cochran_q" -> (qCochranQ _),
    "q308_page_trend" -> (qPageTrend _),
    "q309_entropy_rate" -> (qEntropyRate _),
    "q310_seq_patterns" -> (qSeqPatterns _),
    "q311_overdispersion" -> (qOverdispersion _),
    "q312_ess_weights" -> (qEssWeights _),
    "q313_graph_stats" -> (qGraphStats _),
    "q314_runs_test" -> (qRunsTest _),
    "q315_theil" -> (qTheil _),
    "q316_bradley_terry" -> (qBradleyTerry _),
    "q317_join_size_ams" -> (qJoinSizeAms _),
    "q318_k_anonymity" -> (qKAnonymity _),
    "q319_mann_kendall" -> (qMannKendall _),
    "q320_hurst" -> (qHurst _),
    "q321_color_jpeg" -> (qColorJpeg _),
    "q322_stream_pipeline" -> (qStreamPipelineTwin _),
    "q323_jpeg_progressive" -> (qJpegProgressive _),
    "q324_jpeg_restart" -> (qJpegRestart _),
    "q325_flac_decode" -> (qFlacDecode _),
    "q326_warc_ingest" -> (qWarcIngest _),
    "q327_crawl_capstone" -> (qCrawlCapstone _),
    "q328_mp3_meta" -> (qMp3Meta _),
    "q329_warc_responses" -> (qWarcResponses _),
    "q330_webp_meta" -> (qWebpMeta _),
    "q331_opus_meta" -> (qOpusMeta _),
    "q332_stream_neardup_twin" -> (qStreamNearDupTwin _),
    "q333_vp8l_decode" -> (qVp8lDecode _),
    "q334_url_canonical" -> (qUrlCanonical _),
    "q335_domain_stats" -> (qDomainStats _),
    "q336_html_extract" -> (qHtmlExtract _),
    "q337_robots" -> (qRobots _),
    "q338_frontier_capstone" -> (qFrontierCapstone _),
    "q339_link_extract" -> (qLinkExtract _),
    "q340_sitemap" -> (qSitemap _),
    "q341_feed_parse" -> (qFeedParse _),
    "q342_pdf_text" -> (qPdfText _),
    "q343_avif_meta" -> (qAvifMeta _),
    "q344_code_corpus" -> (qCodeCorpus _),
    "q345_markdown_text" -> (qMarkdownText _),
    "q346_zip_ingest" -> (qZipIngest _),
    "q347_tar_ingest" -> (qTarIngest _),
    "q348_code_capstone" -> (qCodeCapstone _),
    "q349_docx_text" -> (qDocxText _),
    "q350_epub_text" -> (qEpubText _),
    "q351_legacy_image_meta" -> (qLegacyImageMeta _),
    "q352_ipynb_cells" -> (qIpynbCells _),
    "q353_deps_rollup" -> (qDepsRollup _),
    "q354_diff_stats" -> (qDiffStats _),
    "q355_exif_meta" -> (qExifMeta _),
    "q356_subtitles" -> (qSubtitles _),
    "q357_page_meta" -> (qPageMeta _),
    "q358_svg_meta" -> (qSvgMeta _),
    "q359_id3_meta" -> (qId3Meta _),
    "q360_vision_capstone" -> (qVisionCapstone _),
    "q361_html_tables" -> (qHtmlTables _),
    "q362_pdf_cid" -> (qPdfCid _),
    "q363_mp4_tracks" -> (qMp4Tracks _),
    "q364_pdf_objstm" -> (qPdfObjStm _),
    "q365_zip64" -> (qZip64 _),
    "q366_tar_special" -> (qTarSpecial _),
    "q367_flac_tags" -> (qFlacTags _),
    "q368_opus_tags" -> (qOpusTags _),
    "q369_ass_subs" -> (qAssSubs _),
    "q370_epub_meta" -> (qEpubMeta _),
    "q371_xlsx_cells" -> (qXlsxCells _),
    "q372_pptx_text" -> (qPptxText _),
    "q373_jsonld" -> (qJsonLd _),
    "q374_vorbis_id" -> (qVorbisId _),
    "q375_mkv_meta" -> (qMkvMeta _),
    "q376_pdf_encrypt" -> (qPdfEncrypt _),
    "q377_eml_parse" -> (qEmlParse _),
    "q378_odt_text" -> (qOdtText _),
    "q379_rtf_text" -> (qRtfText _),
    "q380_font_meta" -> (qFontMeta _),
    "q381_avro_ingest" -> (qAvroIngest _),
    "q382_ics_events" -> (qIcsEvents _),
    "q383_proto_census" -> (qProtoCensus _),
    "q384_sqlite_master" -> (qSqliteMaster _),
    "q385_frame_meta" -> (qFrameMeta _),
    "q386_mbox_parse" -> (qMboxParse _),
    "q387_woff_meta" -> (qWoffMeta _),
    "q388_vcards" -> (qVcards _),
    "q389_git_objects" -> (qGitObjects _),
    "q390_pcap_census" -> (qPcapCensus _),
    "q391_po_stats" -> (qPoStats _),
    "q392_parquet_footer" -> (qParquetFooter _),
    "q393_pcapng_census" -> (qPcapngCensus _),
    "q394_cbor_census" -> (qCborCensus _),
    "q395_msgpack_census" -> (qMsgpackCensus _),
    "q396_git_pack_idx" -> (qGitPackIdx _),
    "q397_orc_footer" -> (qOrcFooter _),
    "q398_thrift_census" -> (qThriftCensus _),
    "q399_delta_log" -> (qDeltaLog _)
  )

  // --- DuckDB oracle SQL ------------------------------------------- //

  private[graft] def dsumSql(x: String) = Stats.Sql.dsum(x)

  private[graft] val profileSql: String = lineitemNumerics.map { c =>
    val d = s"CAST($c AS DOUBLE)"
    val valid = s"($c IS NOT NULL AND NOT isnan($d))"
    val vd = s"(CASE WHEN $valid THEN $d END)"
    s"""SELECT '$c' AS column_name,
       | count(*) FILTER (WHERE $valid) AS n_valid,
       | count(*) - count(*) FILTER (WHERE $valid) AS n_invalid,
       | count(*) FILTER (WHERE $valid AND $d = 0.0) AS n_zero,
       | min($vd) AS min_value, max($vd) AS max_value,
       | round(${dsumSql(vd)} / count($vd), 6) AS mean_value,
       | round(${Stats.Sql.dstddevSamp(vd)}, 6) AS std_value
       | FROM lineitem""".stripMargin.replaceAll("\n", " ")
  }.mkString(" UNION ALL ") + " ORDER BY column_name"

  private[graft] val quantilesSql: String = {
    val ps = Seq(0.25, 0.5, 0.75, 0.9, 0.95, 0.99)
    // labels match qQuantiles (p0.25 style)
    val qRows = ps.map { p =>
      val label = f"p$p%.2f"
      s"SELECT '$label' AS quantile, round(quantile_cont(l_extendedprice, $p), 6) AS value FROM lineitem"
    }
    val fence =
      "SELECT 'iqr_fence' AS quantile, round(quantile_cont(l_extendedprice, 0.75) + 1.5*(quantile_cont(l_extendedprice, 0.75) - quantile_cont(l_extendedprice, 0.25)), 6) AS value FROM lineitem"
    (qRows :+ fence).mkString(" UNION ALL ") + " ORDER BY quantile"
  }

  private[graft] val zscoreAnomalySql: String = {
    val mus = anomalyFeatures.map(c =>
      s"${dsumSql(c)} / count($c) AS mu_$c, ${Stats.Sql.dstddevSamp(c)} AS sd_$c").mkString(", ")
    val terms = anomalyFeatures.map(c =>
      s"coalesce(abs((CAST($c AS DOUBLE) - mu_$c) / sd_$c), 0.0)").mkString(" + ")
    s"""WITH s AS (SELECT $mus FROM lineitem),
       | scored AS (SELECT l_orderkey, l_linenumber,
       |   ($terms) / ${anomalyFeatures.size}.0 AS score FROM lineitem, s),
       | thr AS (SELECT quantile_cont(score, 0.95) AS t FROM scored)
       | SELECT l_orderkey, l_linenumber, round(score, 6) AS anomaly_score
       | FROM scored, thr WHERE score > t
       | ORDER BY anomaly_score DESC, l_orderkey, l_linenumber""".stripMargin
      .replaceAll("\n", " ")
  }

  // tie-corrected rank-sum AUC: 2U = Σ pos_s·(2·cum_neg_below + neg_s),
  // AUC = 2U/(2PN) — integer-exact numerator, one double division
  // (mathematically equal to the trapezoid over the tie-collapsed ROC)
  private[graft] val rocAucSql: String =
    """WITH d AS (SELECT CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END AS y, CAST(l_extendedprice AS DOUBLE) AS score FROM lineitem),
      | per AS (SELECT score, count(*) FILTER (WHERE y=1) AS pos, count(*) FILTER (WHERE y=0) AS neg FROM d GROUP BY score),
      | c AS (SELECT pos, neg, coalesce(sum(neg) OVER (ORDER BY score ASC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_neg_below FROM per),
      | tot AS (SELECT count(*) FILTER (WHERE y=1) AS p, count(*) FILTER (WHERE y=0) AS n FROM d)
      | SELECT round(CAST(sum(CAST(pos AS DECIMAL(38,0)) * (2*cum_neg_below + neg)) AS DOUBLE)
      |   / (2.0 * p * n), 6) AS auc
      | FROM c, tot GROUP BY p, n""".stripMargin
      .replaceAll("\n", " ")

  /** DuckDB-equivalent SQL per query key, assembled from the three
    * [[OracleSqlA]]/[[OracleSqlB]]/[[OracleSqlC]] parts (one map was a
    * 6,000-line literal; the driver only ever looks entries up by key).
    */
  def oracleSql: Map[String, String] = oracleSqlA ++ oracleSqlB ++ oracleSqlC

  /** Input-byte probes for the corpus-proportional ingest rows (r16):
    * total bytes each named query's parse stage consumes at a given
    * sf dir. [[Bench]] emits `parse_mb_s` = bytes / 1e6 / min-time for
    * each — the measured ingest-layer throughput the fixed-battery
    * rows could never provide.
    */
  def parseBytes: Map[String, (SparkSession, String) => Long] = Map(
    "q329_warc_responses" -> (warcParseBytes _),
    "q342_pdf_text" -> (pdfParseBytes _),
    "q346_zip_ingest" -> (zipParseBytes _),
    "q371_xlsx_cells" -> (xlsxParseBytes _),
    "q381_avro_ingest" -> (avroParseBytes _))
}
