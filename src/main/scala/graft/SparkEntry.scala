package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{OperatorQueries => OQ, RelationalQueries => RQ, ScalarQueries => SQ, AnalyticsQueries => AQ, AdvancedAnalytics => AA, TpchQueries => TQ, OperatorOracles, TpchOracles}
import graft.ext.{ExtQueries => EQ}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * One `queries` entry per implemented SURVEY §2 operator row; oracle
  * SQL lives in graft.queries.OperatorOracles.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    OQ.q1Agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.4 aggregations
    "q1_agg" -> (OQ.q1Agg _),
    "q_tpch_q3" -> (OQ.qTpchQ3 _),
    "q_tpch_q5" -> (OQ.qTpchQ5 _),
    "q_tpch_q18" -> (OQ.qTpchQ18 _),
    "q_tpch_q17" -> (OQ.qTpchQ17 _),
    "q_tpch_q21" -> (OQ.qTpchQ21 _),
    // the adapted TPC-H remainder (graft.queries.TpchQueries)
    "q_tpch_q2" -> (TQ.qTpchQ2 _),
    "q_tpch_q4" -> (TQ.qTpchQ4 _),
    "q_tpch_q6" -> (TQ.qTpchQ6 _),
    "q_tpch_q7" -> (TQ.qTpchQ7 _),
    "q_tpch_q8" -> (TQ.qTpchQ8 _),
    "q_tpch_q9" -> (TQ.qTpchQ9 _),
    "q_tpch_q10" -> (TQ.qTpchQ10 _),
    "q_tpch_q11" -> (TQ.qTpchQ11 _),
    "q_tpch_q12" -> (TQ.qTpchQ12 _),
    "q_tpch_q13" -> (TQ.qTpchQ13 _),
    "q_tpch_q14" -> (TQ.qTpchQ14 _),
    "q_tpch_q15" -> (TQ.qTpchQ15 _),
    "q_tpch_q16" -> (TQ.qTpchQ16 _),
    "q_tpch_q19" -> (TQ.qTpchQ19 _),
    "q_tpch_q20" -> (TQ.qTpchQ20 _),
    "q_tpch_q22" -> (TQ.qTpchQ22 _),
    "q_salted_agg" -> (OQ.qSaltedAgg _),
    "q_agg_having_countdistinct" -> (OQ.qAggHavingCountDistinct _),
    "q_dedup_groupby" -> (OQ.qDedupGroupBy _),
    "q_scalar_score" -> (OQ.qScalarScore _),
    "q_agg_stats" -> (SQ.qAggStats _),
    // §2.2 projections / filters
    "q_proj_alias" -> (RQ.qProjAlias _),
    "q_star_except" -> (RQ.qStarExcept _),
    "q_filter_in" -> (RQ.qFilterIn _),
    "q_filter_cmp_null" -> (RQ.qFilterCmpNull _),
    "q_like" -> (RQ.qLike _),
    // §2.3 joins
    "q_join_inner" -> (RQ.qJoinInner _),
    "q_join_multi" -> (RQ.qJoinMulti _),
    "q_join_residual" -> (RQ.qJoinResidual _),
    "q_join_left_chain" -> (RQ.qJoinLeftChain _),
    "q_join_expr" -> (RQ.qJoinExpr _),
    "q_join_exists_flag" -> (RQ.qJoinExistsFlag _),
    "q_join_semi" -> (RQ.qJoinSemi _),
    "q_join_anti" -> (RQ.qJoinAnti _),
    // §2.5 windows, §2.6 sort, §2.7 set ops
    "q_window_top1" -> (RQ.qWindowTop1 _),
    "q_window_agg_rank" -> (RQ.qWindowAggRank _),
    "q_sort_global_limit" -> (RQ.qSortGlobalLimit _),
    "q_union_all_typed_nulls" -> (RQ.qUnionAllTypedNulls _),
    // §2.8 strings / cascades
    "q_string_funcs" -> (SQ.qStringFuncs _),
    "q_case_buckets" -> (SQ.qCaseBuckets _),
    // §2.9 dates / geo
    "q_date_funcs" -> (SQ.qDateFuncs _),
    "q_age_composite" -> (SQ.qAgeComposite _),
    "q_haversine" -> (SQ.qHaversine _),
    "q_geo_radius" -> (SQ.qGeoRadius _),
    "q_events_hourly" -> (SQ.qEventsHourly _),
    // analytics breadth (rollup/cube/sets, set ops, pivot, percentiles…)
    "q_rollup" -> (AQ.qRollup _),
    "q_cube" -> (AQ.qCube _),
    "q_grouping_sets" -> (AQ.qGroupingSets _),
    "q_intersect" -> (AQ.qIntersect _),
    "q_except" -> (AQ.qExcept _),
    "q_pivot" -> (AQ.qPivot _),
    "q_percentiles" -> (AQ.qPercentiles _),
    "q_array_agg" -> (AQ.qArrayAgg _),
    "q_scalar_subquery" -> (AQ.qScalarSubquery _),
    "q_posexplode" -> (AQ.qPosexplode _),
    "q_events_props" -> (AQ.qEventsProps _),
    "q_asof_join" -> (AQ.qAsofJoin _),
    "q_asof_native" -> (AQ.qAsofNative _),
    "q_range_join" -> (AQ.qRangeJoin _),
    "q_window_funcs" -> (AQ.qWindowFuncs _),
    "q_histogram" -> (AQ.qHistogram _),
    "q_text_levenshtein" -> (AQ.qTextLevenshtein _),
    "q_exists_in_subquery" -> (AQ.qExistsInSubquery _),
    "q_union_distinct" -> (AQ.qUnionDistinct _),
    "q_grouping_flags" -> (AQ.qGroupingFlags _),
    "q_lateral" -> (AQ.qLateral _),
    "q_bit_aggs" -> (AQ.qBitAggs _),
    "q_misc_funcs" -> (AQ.qMiscFuncs _),
    "q_gapfill" -> (AQ.qGapfill _),
    "q_cohort_retention" -> (AQ.qCohortRetention _),
    "q_tfidf_topk" -> (AA.qTfidfTopK _),
    "q_pagerank" -> (AA.qPagerank _),
    "q_zscore" -> (AA.qZscore _),
    "q_funnel" -> (AA.qFunnel _),
    "q_mode" -> (AA.qMode _),
    "q_monthly_growth" -> (AA.qMonthlyGrowth _),
    "q_stats_moments" -> (AQ.qStatsMoments _),
    // LLM-pipeline extensions (graft.ext)
    "q_text_stats" -> (EQ.qTextStats _),
    "q_text_redact" -> (EQ.qTextRedact _),
    "q_text_langid" -> (EQ.qTextLangId _),
    "q_repetition" -> (EQ.qRepetition _),
    "q_hash_split" -> (EQ.qHashSplit _),
    "q_stratified_sample" -> (EQ.qStratifiedSample _),
    "q_contamination" -> (EQ.qContamination _),
    "q_gopher_filters" -> (EQ.qGopherFilters _),
    "q_data_mixture" -> (EQ.qDataMixture _),
    "q_bm25_topk" -> (EQ.qBm25Topk _),
    "q_semantic_dedup" -> (EQ.qSemanticDedup _),
    "q_vocab_topk" -> (EQ.qVocabTopk _),
    "q_source_quality" -> (EQ.qSourceQuality _),
    "q_unigram_logprob" -> (EQ.qUnigramLogprob _),
    "q_pack_chunks" -> (EQ.qPackChunks _),
    "q_zorder_key" -> (EQ.qZorderKey _),
    "q_dedup_exact" -> (EQ.qDedupExact _),
    "q_dedup_ngram_jaccard" -> (EQ.qDedupNgramJaccard _),
    "q_dedup_minhash_sig" -> (EQ.qDedupMinhashSig _),
    "q_dedup_lsh_candidates" -> (EQ.qDedupLshCandidates _),
    "q_dedup_lsh_verified" -> (EQ.qDedupLshVerified _),
    "q_dedup_clusters" -> (EQ.qDedupClusters _),
    "q_curation_pipeline" -> (EQ.qCurationPipeline _),
    "q_sessionize" -> (SQ.qSessionize _),
    "q_rolling" -> (SQ.qRolling _),
    "q_range_join_bucketed" -> (AQ.qRangeJoinBucketed _),
    "q_dedup_simhash" -> (EQ.qDedupSimhash _),
    "q_dedup_cdc" -> (EQ.qDedupCdc _),
    "q_dedup_passage" -> (EQ.qDedupPassage _),
    "q_dedup_spans" -> (EQ.qDedupSpans _),
    "q_winnow_fingerprints" -> (EQ.qWinnowFingerprints _),
    "q_textrank" -> (AA.qTextrank _),
    "q_epoch_shuffle" -> (EQ.qEpochShuffle _),
    "q_triangles" -> (AA.qTriangles _),
    "q_prefix_jaccard" -> (EQ.qPrefixJaccard _),
    "q_bpe_train" -> (EQ.qBpeTrain _),
    "q_sim_ivfpq_topk" -> (EQ.qSimIvfPq _),
    "q_label_prop" -> (AA.qLabelProp _),
    "q_dedup_incremental" -> (EQ.qDedupIncremental _),
    "q_centroid_classify" -> (EQ.qCentroidClassify _),
    "q_embed_outliers" -> (EQ.qEmbedOutliers _),
    "q_domain_cap" -> (EQ.qDomainCap _),
    "q_weighted_sample" -> (EQ.qWeightedSample _),
    "q_corpus_diff" -> (EQ.qCorpusDiff _),
    "q_bpe_apply" -> (EQ.qBpeApply _),
    "q_score_calibrate" -> (EQ.qScoreCalibrate _),
    "q_oov_rate" -> (EQ.qOovRate _),
    "q_bigram_logprob" -> (EQ.qBigramLogprob _),
    "q_sim_filtered_topk" -> (EQ.qSimFilteredTopk _),
    "q_sim_cosine_topk" -> (EQ.qSimCosineTopK _),
    "q_sim_ivf_topk" -> (EQ.qSimIvfTopK _),
    "q_sim_ivf_flat" -> (EQ.qSimIvfFlat _),
    "q_embed_pq_codes" -> (EQ.qEmbedPqCodes _),
    "q_sim_pq_topk" -> (EQ.qSimPqTopK _),
    "q_sim_near_dup" -> (EQ.qSimNearDup _),
    "q_sim_clusters" -> (EQ.qSimClusters _),
    "q_profile_orders" -> (EQ.qProfileOrders _),
    "q_embed_quantize" -> (EQ.qEmbedQuantize _),
    "q_approx_aggs" -> (EQ.qApproxAggs _),
    "q_multimodal_meta" -> (EQ.qMultimodalMeta _),
    "q_multimodal_frames" -> (EQ.qMultimodalFrames _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (simhash/LSH use Spark-native xxhash64 or are binary pipelines) →
    * driver records a weaker rows-only check; those are covered by
    * ScalaTest specs instead. */
  def oracleSql: Map[String, String] =
    OperatorOracles.all ++ TpchOracles.all ++ graft.ext.ExtOracles.all
}
