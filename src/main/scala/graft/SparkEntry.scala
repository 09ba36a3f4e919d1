package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY §2 (plus the
  * training-data extension operators) to a runnable DataFrame; `oracleSql`
  * holds the DuckDB-equivalent SQL for hash-compared correctness. Queries
  * without an oracle entry (the healthcare end-to-end pipeline over
  * generated data, and ops not expressible in portable SQL) get the
  * driver's rows-only check and are covered by ScalaTest golden tests
  * instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the full healthcare
    * pipeline — generate messages → ETL → staging → fact_patient_encounters
    * (driver smoke-checks rows > 0).
    */
  def entry(spark: SparkSession): DataFrame = HealthcareQueries.factEncounters(spark, 4000)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Queries.q01PricingSummary _),
    "q02_asof_band_join" -> (Queries.q02AsofBandJoin _),
    "q03_regional_revenue" -> (Queries.q03RegionalRevenue _),
    "q04_top_orders_per_customer" -> (Queries.q04TopOrdersPerCustomer _),
    "q05_daily_event_report" -> (Queries.q05DailyEventReport _),
    "q06_order_daily_report" -> (Queries.q06OrderDailyReport _),
    "q07_quality_score" -> (Queries.q07QualityScore _),
    "q08_range_validate" -> (Queries.q08RangeValidate _),
    "q09_quality_filter" -> (Queries.q09QualityFilter _),
    "q10_value_categorize" -> (Queries.q10ValueCategorize _),
    "q11_freshness" -> (Queries.q11Freshness _),
    "q12_top_events" -> (Queries.q12TopEvents _),
    "q13_buyer_error_users" -> (Queries.q13BuyerErrorUsers _),
    "q14_doc_tokens" -> (Queries.q14DocTokens _),
    "q15_exact_dedup" -> (Queries.q15ExactDedup _),
    "q16_text_quality" -> (Queries.q16TextQuality _),
    "q17_ann_cosine_topk" -> (Queries.q17AnnCosineTopK _),
    "q18_minhash_dedup" -> (ExtQueries.q18MinHashDedup _),
    "q29_window_lag" -> (Queries.q29WindowLag _),
    "q30_rollup" -> (Queries.q30Rollup _),
    "q31_semi_anti" -> (Queries.q31SemiAnti _),
    "q19_simhash_dedup" -> (ExtQueries.q19SimHashDedup _),
    "q20_ngram_jaccard" -> (ExtQueries.q20NgramJaccard _),
    "q21_embedding_neardup" -> (ExtQueries.q21EmbeddingNearDup _),
    "q22_lang_id" -> (ExtQueries.q22LangId _),
    "q23_fingerprint" -> (ExtQueries.q23Fingerprint _),
    "q24_token_counts" -> (ExtQueries.q24TokenCounts _),
    "q25_ann_lsh" -> (ExtQueries.q25AnnLsh _),
    "q26_media_features" -> (ExtQueries.q26MediaFeatures _),
    "q27_text_quality_features" -> (ExtQueries.q27TextQualityFeatures _),
    "q28_ann_ivf" -> (ExtQueries.q28AnnIvf _),
    "q32_pii_redact" -> (ExtQueries.q32PiiRedact _),
    "q33_sessionize" -> (Queries.q33Sessionize _),
    "q34_percentiles" -> (Queries.q34Percentiles _),
    "q35_neardup_exact" -> (ExtQueries.q35NearDupExact _),
    "q36_cube" -> (Queries.q36Cube _),
    "q37_pivot" -> (Queries.q37Pivot _),
    "q38_above_avg" -> (Queries.q38AboveAvg _),
    "q39_word_topk" -> (Queries.q39WordTopK _),
    "q40_deciles" -> (Queries.q40Deciles _),
    "q41_weekly_cumulative" -> (Queries.q41WeeklyCumulative _),
    "q42_strings" -> (Queries.q42Strings _),
    "q43_asof_join" -> (Queries.q43AsofJoin _),
    "q44_json" -> (Queries.q44Json _),
    "q45_distinct_users" -> (Queries.q45DistinctUsers _),
    "q46_rank_family" -> (Queries.q46RankFamily _),
    "q47_datetime_suite" -> (Queries.q47DatetimeSuite _),
    "q48_sliding_window" -> (Queries.q48SlidingWindow _),
    "q49_setops_regexp" -> (Queries.q49SetOpsRegexp _),
    "q50_contamination" -> (ExtQueries.q50Contamination _),
    "q51_episodes" -> (Queries.q51Episodes _),
    "q52_value_windows" -> (Queries.q52ValueWindows _),
    "q53_repetition" -> (ExtQueries.q53Repetition _),
    "q54_null_funcs" -> (Queries.q54NullFuncs _),
    "q55_stats" -> (Queries.q55Stats _),
    "q56_corr_regr" -> (Queries.q56CorrRegr _),
    "q57_gapfill" -> (Queries.q57GapFill _),
    "q58_dedup_clusters" -> (ExtQueries.q58DedupClusters _),
    "q59_pack_sequences" -> (ExtQueries.q59PackSequences _),
    "q60_bloom_semi_join" -> (ExtQueries.q60BloomSemiJoin _),
    "q61_bag_setops" -> (Queries.q61BagSetOps _),
    "q62_array_suite" -> (Queries.q62ArraySuite _),
    "q63_tumbling_window" -> (Queries.q63TumblingWindow _),
    "q64_ann_ivf_rq" -> (ExtQueries.q64AnnIvfRq _),
    "hc_dim_patients" -> ((s: SparkSession, _: String) => HealthcareQueries.dimPatients(s, 4000)),
    "hc_dim_providers" -> ((s: SparkSession, _: String) => HealthcareQueries.dimProviders(s, 4000)),
    // Healthcare end-to-end (reference parity; rows-only check, golden
    // ScalaTest coverage in src/test)
    "hc_fact_encounters" -> ((s: SparkSession, _: String) => HealthcareQueries.factEncounters(s, 4000)),
    "hc_stg_vitals" -> ((s: SparkSession, _: String) => HealthcareQueries.stgVitals(s, 4000)),
    "hc_stg_claims" -> ((s: SparkSession, _: String) => HealthcareQueries.stgClaims(s, 4000)),
    "hc_stg_ehr" -> ((s: SparkSession, _: String) => HealthcareQueries.stgEhr(s, 4000)),
    "hc_daily_monitoring" -> ((s: SparkSession, _: String) => HealthcareQueries.dailyMonitoring(s, 4000)),
    "hc_claims_report" -> ((s: SparkSession, _: String) => HealthcareQueries.claimsReport(s, 4000)),
    "hc_stream_etl" -> ((s: SparkSession, _: String) => HealthcareQueries.streamEtl(s, 4000))
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> Queries.q01Sql,
    "q02_asof_band_join" -> Queries.q02Sql,
    "q03_regional_revenue" -> Queries.q03Sql,
    "q04_top_orders_per_customer" -> Queries.q04Sql,
    "q05_daily_event_report" -> Queries.q05Sql,
    "q06_order_daily_report" -> Queries.q06Sql,
    "q07_quality_score" -> Queries.q07Sql,
    "q08_range_validate" -> Queries.q08Sql,
    "q09_quality_filter" -> Queries.q09Sql,
    "q10_value_categorize" -> Queries.q10Sql,
    "q11_freshness" -> Queries.q11Sql,
    "q12_top_events" -> Queries.q12Sql,
    "q13_buyer_error_users" -> Queries.q13Sql,
    "q14_doc_tokens" -> Queries.q14Sql,
    "q15_exact_dedup" -> Queries.q15Sql,
    "q16_text_quality" -> Queries.q16Sql,
    "q17_ann_cosine_topk" -> Queries.q17Sql,
    "q20_ngram_jaccard" -> ExtQueries.q20Sql,
    "q29_window_lag" -> Queries.q29Sql,
    "q30_rollup" -> Queries.q30Sql,
    "q31_semi_anti" -> Queries.q31Sql,
    "q24_token_counts" -> ExtQueries.q24Sql,
    "q32_pii_redact" -> ExtQueries.q32Sql,
    "q33_sessionize" -> Queries.q33Sql,
    "q34_percentiles" -> Queries.q34Sql,
    "q35_neardup_exact" -> ExtQueries.q35Sql,
    "q22_lang_id" -> ExtQueries.q22Sql,
    "q27_text_quality_features" -> ExtQueries.q27Sql,
    "q36_cube" -> Queries.q36Sql,
    "q37_pivot" -> Queries.q37Sql,
    "q38_above_avg" -> Queries.q38Sql,
    "q39_word_topk" -> Queries.q39Sql,
    "q40_deciles" -> Queries.q40Sql,
    "q41_weekly_cumulative" -> Queries.q41Sql,
    "q42_strings" -> Queries.q42Sql,
    "q43_asof_join" -> Queries.q43Sql,
    "q44_json" -> Queries.q44Sql,
    "q45_distinct_users" -> Queries.q45Sql,
    "q46_rank_family" -> Queries.q46Sql,
    "q47_datetime_suite" -> Queries.q47Sql,
    "q48_sliding_window" -> Queries.q48Sql,
    "q49_setops_regexp" -> Queries.q49Sql,
    "q50_contamination" -> ExtQueries.q50Sql,
    "q51_episodes" -> Queries.q51Sql,
    "q52_value_windows" -> Queries.q52Sql,
    "q53_repetition" -> ExtQueries.q53Sql,
    "q54_null_funcs" -> Queries.q54Sql,
    "q55_stats" -> Queries.q55Sql,
    "q56_corr_regr" -> Queries.q56Sql,
    "q57_gapfill" -> Queries.q57Sql,
    "q58_dedup_clusters" -> ExtQueries.q58Sql,
    "q59_pack_sequences" -> ExtQueries.q59Sql,
    "q60_bloom_semi_join" -> ExtQueries.q60Sql,
    "q61_bag_setops" -> Queries.q61Sql,
    "q62_array_suite" -> Queries.q62Sql,
    "q63_tumbling_window" -> Queries.q63Sql
  )
}
