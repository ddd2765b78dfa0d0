package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CoreQueries, ExtraQueries, PipelineQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an operator from the SURVEY §2 inventory
  * (or a beyond-reference LLM-pipeline operator) expressed over the
  * driver's parquet tables; [[oracleSql]] carries the DuckDB-equivalent
  * ANSI SQL with IDENTICAL output column names and row ordering.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.flagshipMultiJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (CoreQueries.pricingSummary _),
    "q02_revenue_filter" -> (CoreQueries.revenueFilter _),
    "q03_revenue_by_nation" -> (CoreQueries.revenueByNation _),
    "q04_flagship_multijoin" -> (CoreQueries.flagshipMultiJoin _),
    "q05_cust_order_stats" -> (CoreQueries.custOrderStats _),
    "q06_full_outer" -> (CoreQueries.fullOuterNationProfile _),
    "q07_semi_join" -> (CoreQueries.semiJoinUrgent _),
    "q12_derived_weights" -> (CoreQueries.derivedWeights _),
    "q08_anti_join" -> (CoreQueries.antiJoinNoOrders _),
    "q10_child_ids" -> (CoreQueries.childIdGeneration _),
    "q11_surrogate_keys" -> (CoreQueries.surrogateKeys _),
    "q13_value_counts" -> (CoreQueries.valueCounts _),
    "q14_numeric_outliers" -> (CoreQueries.numericOutliers _),
    "q15_duplicate_detection" -> (CoreQueries.duplicateDetection _),
    "q16_symmetric_diff" -> (CoreQueries.symmetricDiff _),
    "q17_union_by_name" -> (CoreQueries.unionByNameConcat _),
    "q09_null_safe_join" -> (ExtraQueries.nullSafeJoin _),
    "q18_icd_parse" -> (ExtraQueries.icdParse _),
    "q19_levenshtein" -> (ExtraQueries.levenshteinNames _),
    "q20_date_range_check" -> (ExtraQueries.dateRangeCheck _),
    "q21_rls_filter" -> (ExtraQueries.rlsFilter _),
    "q22_distinct_agg" -> (ExtraQueries.distinctAgg _),
    "q23_topk_per_group" -> (ExtraQueries.topKPerGroup _),
    "q24_column_profile" -> (ExtraQueries.columnProfile _),
    "q25_rollup_revenue" -> (ExtraQueries.rollupRevenue _),
    "q26_pivot_wide" -> (ExtraQueries.pivotWide _),
    "qd01_text_stats" -> (PipelineQueries.textStats _),
    "qd02_lang_quality" -> (PipelineQueries.langQuality _),
    "qd03_dedup_exact" -> (PipelineQueries.dedupExact _),
    "qd04_ngram_jaccard" -> (PipelineQueries.ngramJaccard _),
    "qd05_minhash_neardup" -> (PipelineQueries.minhashNearDup _),
    "qd06_simhash_neardup" -> (PipelineQueries.simhashNearDup _),
    "qd07_token_topk" -> (PipelineQueries.tokenTopK _),
    "qd08_bpe_tokens" -> (PipelineQueries.bpeTokenCounts _),
    "qd09_winnow_fp" -> (PipelineQueries.winnowFingerprints _),
    "qd10_repetition" -> (PipelineQueries.repetitionStats _),
    "qd11_tfidf_topk" -> (PipelineQueries.tfidfTopTerms _),
    "qd12_pii_flags" -> (PipelineQueries.piiFlags _),
    "qd13_dup_clusters" -> (PipelineQueries.dupClusters _),
    "qd42_dup_clusters_star" -> (PipelineQueries.dupClustersStar _),
    "qd90_cluster_map_merge" -> (PipelineQueries.clusterMapMerge _),
    "qd91_text_fp_topk" -> (PipelineQueries.textFpTopK _),
    "qd92_maintenance_sweep" -> (PipelineQueries.maintenanceSweep _),
    "qd14_curated_corpus" -> (PipelineQueries.curatedCorpus _),
    "qd15_decontaminate" -> (PipelineQueries.decontaminate _),
    "qd43_bloom_decontaminate" -> (PipelineQueries.decontaminateBloom _),
    "qd16_det_sample" -> (PipelineQueries.stratifiedSample _),
    "qd17_seq_pack" -> (PipelineQueries.seqPacking _),
    "qd18_unigram_nll" -> (PipelineQueries.unigramNll _),
    "qd19_mix_rebalance" -> (PipelineQueries.mixRebalance _),
    "qd20_chunk" -> (PipelineQueries.chunkDocs _),
    "qd21_cube_profile" -> (PipelineQueries.cubeProfile _),
    "qd22_char_pairs" -> (PipelineQueries.charPairs _),
    "qd23_shared_passages" -> (PipelineQueries.sharedPassages _),
    "qd24_minhash_portable" -> (PipelineQueries.minhashPortable _),
    "qe06_label_centroids" -> (PipelineQueries.labelCentroids _),
    "qe07_quantize_int8" -> (PipelineQueries.quantizeEmbeddings _),
    "qe08_neardup_lsh" -> (PipelineQueries.embeddingNearDupLshQ _),
    "qe09_quantized_topk" -> (PipelineQueries.quantizedTopKQ _),
    "qe10_quantized_index" -> (PipelineQueries.quantizedIndexTopK _),
    "qe01_cosine_topk" -> (PipelineQueries.cosineTopK _),
    "qe02_embedding_neardup" -> (PipelineQueries.embeddingNearDup _),
    "qe03_ann_lsh" -> (PipelineQueries.annTopK _),
    "qe04_ann_ivf" -> (PipelineQueries.ivfTopK _),
    "qe05_ann_index" -> (PipelineQueries.annIndexTopK _),
    "qv01_event_hourly" -> (PipelineQueries.eventHourly _),
    "qv02_sessionize" -> (PipelineQueries.sessionize _),
    "qv03_session_stats" -> (PipelineQueries.sessionStats _),
    "qv04_salted_totals" -> (PipelineQueries.saltedUserTotals _),
    "qv05_rolling" -> (PipelineQueries.rollingStats _),
    "qv06_asof_join" -> (PipelineQueries.asofPurchaseClick _),
    "qv07_group_median" -> (PipelineQueries.medianByType _),
    "qv08_json_props" -> (PipelineQueries.jsonPropsStats _),
    "qv09_funnel" -> (PipelineQueries.funnelStages _),
    "qv10_retention" -> (PipelineQueries.retention _),
    "qv11_dense_hourly" -> (PipelineQueries.denseHourly _),
    "qd25_prune_passages" -> (PipelineQueries.prunedPassages _),
    "qd26_linear_score" -> (PipelineQueries.linearScoreQ _),
    "qd27_bigram_nll" -> (PipelineQueries.bigramNllQ _),
    "qd28_vocab_profile" -> (PipelineQueries.vocabProfileQ _),
    "qe11_random_projection" -> (PipelineQueries.randomProjectionQ _),
    "qv12_top_paths" -> (PipelineQueries.topPathsQ _),
    "qv17_interval_join" -> (PipelineQueries.intervalJoinQ _),
    "qd44_pii_redact" -> (PipelineQueries.piiRedactQ _),
    "qd29_incremental_new" -> (PipelineQueries.incrementalNew _),
    "qe12_knn_join" -> (PipelineQueries.knnJoinQ _),
    "qd31_temperature_mix" -> (PipelineQueries.temperatureMix _),
    "qv13_value_histogram" -> (PipelineQueries.valueHistogram _),
    "qd30_index_neardup" -> (PipelineQueries.indexNearDup _),
    "qd32_split_assign" -> (PipelineQueries.splitAssign _),
    "qd33_budget_select" -> (PipelineQueries.budgetSelect _),
    "q27_salted_join" -> (ExtraQueries.saltedJoin _),
    "qv14_group_quantiles" -> (PipelineQueries.groupQuantiles _),
    "qd34_shard_balance" -> (PipelineQueries.shardBalance _),
    "qd35_interleave" -> (PipelineQueries.interleave _),
    "qd36_clean_profile" -> (PipelineQueries.cleanProfile _),
    "qd37_score_deciles" -> (PipelineQueries.scoreDeciles _),
    "qv15_spend_outliers" -> (PipelineQueries.spendOutliers _),
    "qd38_corpus_diff" -> (PipelineQueries.corpusDiff _),
    "qe13_centroid_drift" -> (PipelineQueries.centroidDrift _),
    "qd39_curated_splits" -> (PipelineQueries.curatedSplits _),
    "qd40_heavy_hitters" -> (PipelineQueries.heavyHitters _),
    "qv16_asof_native" -> (PipelineQueries.asofNative _),
    "qd41_group_hh" -> (PipelineQueries.groupHeavyHitters _),
    "qe14_kmeans_clusters" -> (PipelineQueries.kmeansClusters _),
    "qe15_semantic_dedup" -> (PipelineQueries.semanticDedupQ _),
    "qe16_cluster_sample" -> (PipelineQueries.clusterBalancedSample _),
    "qd45_leakfree_split" -> (PipelineQueries.leakFreeSplit _),
    "qd46_epoch_shuffle" -> (PipelineQueries.epochShuffleQ _),
    "qd47_line_dedup" -> (PipelineQueries.lineDedupQ _),
    "qe17_filtered_ann" -> (PipelineQueries.filteredAnnQ _),
    "qd48_weighted_sample" -> (PipelineQueries.weightedSampleQ _),
    "qd49_source_overlap" -> (PipelineQueries.sourceOverlapQ _),
    "qd50_quality_gate" -> (PipelineQueries.qualityGateQ _),
    "qe18_centroid_outliers" -> (PipelineQueries.centroidOutliersQ _),
    "qd51_simhash_portable" -> (PipelineQueries.simhashPortableQ _),
    "qd52_epoch_upsample" -> (PipelineQueries.epochUpsampleQ _),
    "qd53_priority_dedup" -> (PipelineQueries.priorityDedupQ _),
    "qd54_group_weighted" -> (PipelineQueries.groupWeightedSampleQ _),
    "qd55_budget_mix" -> (PipelineQueries.budgetMixQ _),
    "qe19_mmr_topk" -> (PipelineQueries.mmrTopKQ _),
    "qd56_bpe_merges" -> (PipelineQueries.bpeMergesQ _),
    "qd57_bpe_vocab" -> (PipelineQueries.bpeVocabQ _),
    "qe20_pq_adc" -> (PipelineQueries.pqTopKQ _),
    "qe21_pq_index" -> (PipelineQueries.pqIndexTopKQ _),
    "qv18_interval_overlap" -> (PipelineQueries.intervalOverlapQ _),
    "qd58_bpe_tokenize" -> (PipelineQueries.bpeTokenizeQ _),
    "qd59_consistent_shard" -> (PipelineQueries.consistentShardQ _),
    "qe22_pq_rerank" -> (PipelineQueries.pqRerankQ _),
    "qv19_hourly_anomalies" -> (PipelineQueries.hourlyAnomaliesQ _),
    "qd60_oov_rate" -> (PipelineQueries.oovRateQ _),
    "qv20_next_click" -> (PipelineQueries.nextClickQ _),
    "qd61_winnow_portable" -> (PipelineQueries.winnowPortableQ _),
    "qe23_binary_topk" -> (PipelineQueries.binaryTopKQ _),
    "qe24_matryoshka_topk" -> (PipelineQueries.matryoshkaTopKQ _),
    "qe25_binary_index" -> (PipelineQueries.binaryIndexTopKQ _),
    "qe26_hamming_knn" -> (PipelineQueries.hammingKnnJoinQ _),
    "qd62_cluster_canonical" -> (PipelineQueries.clusterCanonicalQ _),
    "qd63_bpe_fertility" -> (PipelineQueries.bpeFertilityQ _),
    "qd64_cluster_map" -> (PipelineQueries.clusterSizes _),
    "qd65_hll_distinct" -> (PipelineQueries.hllDistinctTokens _),
    "qd66_cms_freq" -> (PipelineQueries.cmsTokenFreq _),
    "qd67_bm25_topk" -> (PipelineQueries.bm25TopDocs _),
    "qd68_hll_merge" -> (PipelineQueries.hllMergeParity _),
    "qd69_cms_merge" -> (PipelineQueries.cmsMergeFreq _),
    "qd70_hll_overlap" -> (PipelineQueries.hllOverlapHalves _),
    "qe27_hybrid_rrf" -> (PipelineQueries.hybridRrf _),
    "qv21_zorder_codes" -> (PipelineQueries.zorderCodes _),
    "qd71_exact_index_build" -> (PipelineQueries.exactIndexBuild _),
    "qd72_minhash_index_build" -> (PipelineQueries.minhashIndexBuild _),
    "qd73_hll_store" -> (PipelineQueries.hllStoreProfile _),
    "qd74_cms_store" -> (PipelineQueries.cmsStoreFreq _),
    "qd75_bm25_index_build" -> (PipelineQueries.bm25IndexBuild _),
    "qd76_bm25_index_topk" -> (PipelineQueries.bm25IndexTopDocs _),
    "qd87_bm25_filtered_topk" -> (PipelineQueries.bm25FilteredTopDocs _),
    "qd88_bm25_backfilled_topk" ->
      (PipelineQueries.bm25UpgradedFilteredTopDocs _),
    "qd77_hist_quantiles" -> (PipelineQueries.histQuantileProfile _),
    "qd78_hist_merge" -> (PipelineQueries.histMergeQuantiles _),
    "qd79_hist_store" -> (PipelineQueries.histStoreQuantiles _),
    "qd80_minhash_recall" -> (PipelineQueries.minhashRecall _),
    "qe28_ann_recall" -> (PipelineQueries.annRecall _),
    "qe29_ann_ivf_trained" -> (PipelineQueries.ivfTrainedTopK _),
    "qe30_ann_recall_trained" -> (PipelineQueries.annRecallTrained _),
    "qe31_ann_probe_sweep" -> (PipelineQueries.annProbeSweep _),
    "qe32_ann_rerank_recall" -> (PipelineQueries.annRerankRecall _),
    "qe33_ivf_index_trained_build" ->
      (PipelineQueries.ivfTrainedIndexBuild _),
    "qe34_ivf_index_trained_recall" ->
      (PipelineQueries.ivfTrainedIndexRecall _),
    "qd81_bm25_index_append" -> (PipelineQueries.bm25IndexAppendTopDocs _),
    "qd82_bm25_index_delete" -> (PipelineQueries.bm25IndexDeleteTopDocs _),
    "qd83_exact_index_delete" ->
      (PipelineQueries.incrementalNewAfterDelete _),
    "qe35_ivfpq_adc" -> (PipelineQueries.ivfPqAdc _),
    "qe36_ivfpq_index" -> (PipelineQueries.ivfPqIndexTopK _),
    "qe37_ivfpq_recall" -> (PipelineQueries.ivfPqRecall _),
    "qd84_phrase_search" -> (PipelineQueries.phraseSearch _),
    "qd85_bm25_batch_topk" -> (PipelineQueries.bm25BatchTopDocs _),
    "qe38_hybrid_rrf_batch" ->
      ((s: org.apache.spark.sql.SparkSession, d: String) =>
        PipelineQueries.hybridRrfJoin(s, d)),
    "qe39_ivfpq_grid" -> (PipelineQueries.ivfPqOperatingGrid _),
    "qd86_phrase_batch" -> (PipelineQueries.phraseBatchSearch _),
    "qe40_hybrid_rrf_pq" -> (PipelineQueries.hybridRrfPqJoin _),
    "qe45_ivfpq_filtered_recall" -> (PipelineQueries.ivfPqFilteredRecall _),
    "qe46_lsh_operating_grid" -> (PipelineQueries.lshOperatingGrid _),
    "qe47_ivfpq_selective_recall" -> (PipelineQueries.ivfPqSelectiveRecall _),
    "qe48_int8_filtered_recall" -> (PipelineQueries.quantizedFilteredRecall _),
    "qe49_binary_filtered_recall" -> (PipelineQueries.binaryFilteredRecall _),
    "qe50_lsh_filtered_recall" -> (PipelineQueries.lshFilteredRecall _),
    "qe51_hybrid_rrf_filtered" -> (PipelineQueries.hybridRrfPqFiltered _),
    "qe52_lsh_multitable_grid" -> (PipelineQueries.lshMultiTableGrid _),
    "qe53_lsh_multitable_filtered" ->
      (PipelineQueries.lshMultiFilteredRecall _),
    "qe54_ivf_retrain_recall" -> (PipelineQueries.ivfRetrainRecall _),
    "qe55_ivfpq_retrain_recall" ->
      (PipelineQueries.ivfPqRetrainRecall _),
    "qe56_ivf_drift_monitor" -> (PipelineQueries.ivfDriftMonitor _),
    "qe57_vector_arrival_loop" ->
      (PipelineQueries.vectorArrivalLoop _),
    "qe58_pq_retrain_recall" -> (PipelineQueries.pqRetrainRecall _),
    "qm01_media_decode" -> (PipelineQueries.mediaDecodeProfile _),
    "qm02_media_resize_plan" -> (PipelineQueries.mediaResizePlan _),
    "qm03_media_frame_sample" -> (PipelineQueries.mediaFrameSample _),
    "qm04_image_ahash" -> (PipelineQueries.imageAHash _),
    "qm05_image_neardup" -> (PipelineQueries.imageNearDup _),
    "qm06_audio_fingerprint" -> (PipelineQueries.audioFingerprint _),
    "qm07_audio_neardup" -> (PipelineQueries.audioNearDup _),
    "qm08_image_fp_index" -> (PipelineQueries.imageFpAgainstIndex _),
    "qm12_image_fp_topk" -> (PipelineQueries.imageFpTopK _),
    "qm13_video_frame_hash" -> (PipelineQueries.videoFrameHash _),
    "qm14_video_fp_index" -> (PipelineQueries.videoFpAgainstIndex _),
    "qm15_media_arrival_loop" -> (PipelineQueries.mediaArrivalLoop _),
    "qm09_image_fp_filtered" ->
      (PipelineQueries.imageFpFilteredAgainstIndex _),
    "qm10_crossmodal_neardup" -> (PipelineQueries.crossModalNearDup _),
    "qm11_crossmodal_clusters" -> (PipelineQueries.crossModalClusters _),
    "qd89_text_fp_index" -> (PipelineQueries.textFpAgainstIndex _),
    "qe41_lsh_index_recall" -> (PipelineQueries.lshIndexRecall _),
    "qe42_quantized_batch_recall" -> (PipelineQueries.quantizedBatchRecall _),
    "qe43_binary_batch_recall" -> (PipelineQueries.binaryBatchRecall _),
    "qe44_pq_batch_adc" -> (PipelineQueries.pqBatchAdc _),
  )

  /** DuckDB-equivalent SQL per query key. Output column names and ORDER BY
    * match the Spark side exactly (driver hash-compares by sorted column
    * name). */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 4) AS avg_qty,
         round(avg(l_discount), 4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "q02_revenue_filter" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-01-01'
           AND l_shipdate < TIMESTAMP '1996-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",
    "q03_revenue_by_nation" ->
      """SELECT r_name, n_name,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q04_flagship_multijoin" ->
      """SELECT DISTINCT r_name, nation.n_name AS n_name, n2.n_name AS supp_nation,
         c_mktsegment, o_orderpriority, p_brand, l_returnflag
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation n2 ON s_nationkey = n2.n_nationkey
         ORDER BY 1, 2, 3, 4, 5, 6, 7""",
    "q05_cust_order_stats" ->
      """SELECT c_custkey, count(o_orderkey) AS order_count,
         round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spent
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY 1 ORDER BY 1""",
    "q06_full_outer" ->
      """WITH c AS (SELECT c_nationkey AS ck, count(*) AS n_customers
             FROM customer WHERE c_mktsegment = 'AUTOMOBILE' GROUP BY 1),
         s AS (SELECT s_nationkey AS sk, count(*) AS n_suppliers
             FROM supplier WHERE s_acctbal > 5000 GROUP BY 1)
         SELECT CAST(coalesce(ck, sk) AS INTEGER) AS nationkey,
           coalesce(n_customers, 0) AS n_customers,
           coalesce(n_suppliers, 0) AS n_suppliers
         FROM c FULL OUTER JOIN s ON ck = sk
         ORDER BY 1""",
    "q12_derived_weights" ->
      """WITH li AS (SELECT l_orderkey,
           CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0)
             AS BIGINT)) AS BIGINT) AS consumed_cents
           FROM lineitem GROUP BY 1)
         SELECT o_orderkey,
           CAST(floor(o_totalprice * 100.0) AS BIGINT) AS initial_cents,
           coalesce(consumed_cents, 0) AS consumed_cents,
           CAST(floor(o_totalprice * 100.0) AS BIGINT)
             - coalesce(consumed_cents, 0) AS remaining_cents
         FROM orders LEFT JOIN li ON o_orderkey = l_orderkey
         ORDER BY 1""",
    "q07_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY 1""",
    "q08_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_totalprice > 300000)
         ORDER BY 1""",
    "q10_child_ids" ->
      """SELECT o_orderkey, o_custkey,
         'C' || CAST(o_custkey AS VARCHAR) || '-O' || CAST(seq AS VARCHAR)
           AS sample_id
         FROM (SELECT o_orderkey, o_custkey,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey) AS seq FROM orders)
         ORDER BY 1""",
    "q11_surrogate_keys" ->
      """SELECT p_brand, p_type,
         DENSE_RANK() OVER (ORDER BY p_brand, p_type) AS surrogate_key
         FROM (SELECT DISTINCT p_brand, p_type FROM part)
         ORDER BY 3""",
    "q13_value_counts" ->
      """SELECT o_orderpriority, count(*) AS cnt
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q14_numeric_outliers" ->
      """SELECT c_custkey, round(c_acctbal, 2) AS acctbal
         FROM customer,
           (SELECT avg(c_acctbal) AS mu, stddev_pop(c_acctbal) AS sigma
            FROM customer)
         WHERE abs(c_acctbal - mu) > 1.6 * sigma
         ORDER BY 1""",
    "q15_duplicate_detection" ->
      """SELECT o_custkey, o_orderdate, count(*) AS n,
         min(o_orderkey) AS first_key
         FROM orders GROUP BY 1, 2 HAVING count(*) > 1 ORDER BY 1, 2""",
    "q16_symmetric_diff" ->
      """WITH urgent AS (SELECT DISTINCT o_custkey AS id FROM orders
             WHERE o_orderpriority = '1-URGENT'),
         low AS (SELECT DISTINCT o_custkey AS id FROM orders
             WHERE o_orderpriority = '5-LOW')
         SELECT id, 'urgent_only' AS side FROM urgent
         WHERE id NOT IN (SELECT id FROM low)
         UNION ALL
         SELECT id, 'low_only' AS side FROM low
         WHERE id NOT IN (SELECT id FROM urgent)
         ORDER BY side, id""",
    "q17_union_by_name" ->
      """SELECT c_name AS name, round(c_acctbal, 2) AS acctbal,
         CAST(c_nationkey AS INTEGER) AS nationkey, 'customer' AS kind
         FROM customer
         UNION ALL
         SELECT s_name AS name, round(s_acctbal, 2) AS acctbal,
         CAST(s_nationkey AS INTEGER) AS nationkey, 'supplier' AS kind
         FROM supplier
         ORDER BY kind, name""",
    "q09_null_safe_join" ->
      """WITH proj AS (SELECT DISTINCT o_orderpriority AS prio,
           nullif(o_orderstatus, 'O') AS st FROM orders)
         SELECT l.prio AS l_prio, r.prio AS r_prio, l.st AS st
         FROM proj l JOIN proj r ON l.st IS NOT DISTINCT FROM r.st
         ORDER BY l_prio, r_prio, l.st""",
    "q18_icd_parse" ->
      """WITH coded AS (SELECT p_partkey,
           substring(upper(p_brand), 1, 1)
           || lpad(CAST(p_size % 100 AS VARCHAR), 2, '0') || '.'
           || lpad(CAST(p_partkey % 1000 AS VARCHAR), 3, '0')
           || upper(substring(p_type, 1, 1)) AS code FROM part)
         SELECT p_partkey, code,
           substring(split_part(code, '.', 1), 1, 1) AS first_char,
           CAST(substring(split_part(code, '.', 1), 2) AS BIGINT)
             AS category,
           substring(split_part(code, '.', 2), 1,
             length(split_part(code, '.', 2)) - 1) AS details,
           substring(split_part(code, '.', 2),
             length(split_part(code, '.', 2)), 1) AS extension
         FROM coded ORDER BY p_partkey""",
    "q19_levenshtein" ->
      """SELECT n_name, r_name,
         CAST(levenshtein(n_name, r_name) AS BIGINT) AS dist,
         CAST(levenshtein(n_name, 'GERMANY') AS BIGINT) AS dist_de
         FROM nation CROSS JOIN region ORDER BY n_name, r_name""",
    "q20_date_range_check" ->
      """SELECT o_orderpriority, count(*) AS n_items,
         count(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
           CAST(l_shipdate AS DATE)) <= 30 THEN 1 END) AS shipped_fast,
         count(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
           CAST(l_shipdate AS DATE)) < 0 THEN 1 END) AS invalid_range
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1 ORDER BY 1""",
    "q21_rls_filter" ->
      """SELECT user_id, event_type, count(*) AS n,
         round(sum(value), 2) AS total
         FROM events WHERE user_id IN (7, 1)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q22_distinct_agg" ->
      """SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations,
         count(*) AS n_customers
         FROM customer GROUP BY 1 ORDER BY 1""",
    "q23_topk_per_group" ->
      """SELECT o_custkey, o_orderkey,
         CAST(row_number() OVER (PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank,
         round(o_totalprice, 2) AS totalprice
         FROM orders QUALIFY rank <= 3 ORDER BY o_custkey, rank""",
    "q24_column_profile" ->
      """WITH p AS (
           SELECT 'o_orderpriority' AS "column",
             count(DISTINCT o_orderpriority) AS n_distinct,
             count(o_orderpriority) AS n_present, count(*) AS n_rows,
             false AS continuous FROM orders
           UNION ALL SELECT 'o_orderstatus',
             count(DISTINCT o_orderstatus), count(o_orderstatus),
             count(*), false FROM orders
           UNION ALL SELECT 'o_custkey', count(DISTINCT o_custkey),
             count(o_custkey), count(*), true FROM orders
           UNION ALL SELECT 'o_totalprice', count(DISTINCT o_totalprice),
             count(o_totalprice), count(*), true FROM orders)
         SELECT "column", n_distinct, n_present, n_rows,
           n_present = 0 AS all_null, n_distinct = 1 AS single_valued,
           (NOT continuous AND n_distinct = n_present AND n_present > 0)
             AS all_unique,
           continuous,
           (n_present > 0 AND n_distinct <> 1 AND (continuous OR NOT
             (n_distinct = n_present AND n_present > 0))) AS valid
         FROM p ORDER BY "column"""",
    "q25_rollup_revenue" ->
      """SELECT coalesce(r_name, 'ALL') AS region,
         coalesce(n_name, 'ALL') AS nation,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP(r_name, n_name)
         ORDER BY region, nation""",
    "q26_pivot_wide" ->
      """SELECT o_custkey,
         round(sum(CASE WHEN o_orderpriority = '1-URGENT'
           THEN o_totalprice END), 2) AS "1-URGENT",
         round(sum(CASE WHEN o_orderpriority = '2-HIGH'
           THEN o_totalprice END), 2) AS "2-HIGH",
         round(sum(CASE WHEN o_orderpriority = '3-MEDIUM'
           THEN o_totalprice END), 2) AS "3-MEDIUM",
         round(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
           THEN o_totalprice END), 2) AS "4-NOT SPECIFIED",
         round(sum(CASE WHEN o_orderpriority = '5-LOW'
           THEN o_totalprice END), 2) AS "5-LOW"
         FROM orders GROUP BY 1 ORDER BY 1""",
    "qd01_text_stats" ->
      """SELECT doc_id, length(text) AS chars,
         len(regexp_extract_all(lower(text), '\S+')) AS n_tokens,
         floor((CASE WHEN length(text) = 0 THEN 0.0 ELSE
           CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
           / CAST(length(text) AS DOUBLE) END) * 10000.0) / 10000.0
           AS punct_ratio,
         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
         FROM documents ORDER BY doc_id""",
    "qd02_lang_quality" ->
      """WITH tk AS (SELECT doc_id, text,
           regexp_extract_all(lower(text), '\S+') AS toks FROM documents),
         sc AS (SELECT doc_id, text, toks,
           len(list_filter(toks, t -> list_contains(
             ['the','of','and','to','in','is','that','it','was','for'], t))) AS en_hits,
           len(list_filter(toks, t -> list_contains(
             ['el','la','de','que','y','los','en','un','por','con'], t))) AS es_hits,
           len(list_filter(toks, t -> list_contains(
             ['le','la','les','des','et','est','que','pour','dans','une'], t))) AS fr_hits,
           len(list_filter(toks, t -> list_contains(
             ['der','die','das','und','ist','nicht','ein','mit','auf','zu'], t))) AS de_hits
           FROM tk)
         SELECT doc_id,
           CASE WHEN greatest(en_hits, es_hits, fr_hits, de_hits) <= 0 THEN 'und'
                WHEN en_hits = greatest(en_hits, es_hits, fr_hits, de_hits) THEN 'en'
                WHEN es_hits = greatest(en_hits, es_hits, fr_hits, de_hits) THEN 'es'
                WHEN fr_hits = greatest(en_hits, es_hits, fr_hits, de_hits) THEN 'fr'
                ELSE 'de' END AS lang_pred,
           floor((0.4 * (CASE WHEN len(toks) = 0 THEN 0.0 ELSE
               CAST(en_hits AS DOUBLE) / CAST(len(toks) AS DOUBLE) END)
             + 0.3 * (1.0 - CASE WHEN length(text) = 0 THEN 0.0 ELSE
               CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
               / CAST(length(text) AS DOUBLE) END)
             + 0.3 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0))
             * 10000.0) / 10000.0 AS quality
         FROM sc ORDER BY doc_id""",
    "qd03_dedup_exact" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
         min(doc_id) AS keep_id, count(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY 1""",
    "qd04_ngram_jaccard" -> ngramJaccardOracleSql,
    "qd07_token_topk" ->
      """WITH words AS (SELECT source,
           unnest(regexp_extract_all(lower(text), '\S+')) AS w
           FROM documents),
         c AS (SELECT source, w, count(*) AS n FROM words GROUP BY 1, 2)
         SELECT source, w, n, rank FROM (
           SELECT source, w, n,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY n DESC, w) AS BIGINT) AS rank FROM c)
         WHERE rank <= 5 ORDER BY source, rank""",
    "qd08_bpe_tokens" ->
      """SELECT doc_id,
         len(regexp_extract_all(lower(text), '\S+')) AS n_ws_tokens,
         len(regexp_extract_all(text,
           '''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+'))
           AS n_bpe_tokens
         FROM documents ORDER BY doc_id""",
    "qd10_repetition" ->
      """WITH t AS (SELECT doc_id, text,
           regexp_extract_all(lower(text), '\S+') AS toks FROM documents),
         w AS (SELECT doc_id, unnest(toks) AS w FROM t),
         c AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2),
         m AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(max(c) AS BIGINT) AS max_c FROM c GROUP BY 1)
         SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
           coalesce(m.n_distinct, 0) AS n_distinct,
           CASE WHEN len(t.toks) > 0 THEN
             floor((1.0 - CAST(coalesce(m.n_distinct, 0) AS DOUBLE)
               / CAST(len(t.toks) AS DOUBLE)) * 10000.0) / 10000.0
             ELSE 0.0 END AS dup_ratio,
           CASE WHEN len(t.toks) > 0 THEN
             floor(CAST(coalesce(m.max_c, 0) AS DOUBLE)
               / CAST(len(t.toks) AS DOUBLE) * 10000.0) / 10000.0
             ELSE 0.0 END AS top_share,
           CASE WHEN length(t.text) > 0 THEN
             floor(CAST(length(regexp_replace(t.text, '[^#@~^|]', '', 'g'))
               AS DOUBLE) / CAST(length(t.text) AS DOUBLE) * 10000.0) / 10000.0
             ELSE 0.0 END AS symbol_ratio
         FROM t LEFT JOIN m ON t.doc_id = m.doc_id
         ORDER BY t.doc_id""",
    "qd11_tfidf_topk" ->
      """WITH w AS (SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '\S+')) AS w
           FROM documents),
         tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
           FROM w GROUP BY 1, 2),
         df AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
         s AS (SELECT tf.doc_id, tf.w, tf.tf, df.df,
           floor(CAST(tf.tf AS DOUBLE) * ln(n.n / CAST(df.df AS DOUBLE))
             * 10000.0) / 10000.0 AS score
           FROM tf JOIN df ON tf.w = df.w CROSS JOIN n)
         SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id
             ORDER BY score DESC, w) AS BIGINT) AS rank,
           w, tf, df, score
         FROM s QUALIFY rank <= 3 ORDER BY doc_id, rank""",
    // Transitive closure via recursive CTE reproduces the iterative
    // min-label propagation exactly (both assign each component its
    // minimum doc id). Shared by qd42: large-star/small-star reaches
    // the identical fixpoint labels.
    "qd13_dup_clusters" -> dupClustersOracleSql,
    "qd42_dup_clusters_star" -> dupClustersOracleSql,
    // qd90: base map on even-only pairs + arrival merge of every pair
    // touching an odd doc must land on the SAME fixpoint as a full
    // rebuild — qd13's oracle verbatim is the whole point.
    "qd90_cluster_map_merge" -> dupClustersOracleSql,
    "qd45_leakfree_split" -> leakFreeSplitOracleSql,
    // qd46: the permutation is the lex order of md5('ep7:'||id) — the
    // sharded two-phase ranking must agree with the naive global window.
    "qd46_epoch_shuffle" ->
      """SELECT doc_id, CAST(row_number() OVER (
           ORDER BY md5('ep7:' || CAST(doc_id AS VARCHAR)), doc_id) - 1
           AS BIGINT) AS pos
         FROM documents ORDER BY doc_id""",
    // qd47: first-occurrence line dedup — min-position grouping
    // reproduces Spark's order-stable array_distinct.
    "qd47_line_dedup" ->
      """WITH s AS (SELECT doc_id, string_split(text, chr(10)) AS ls
           FROM documents),
         l AS (SELECT doc_id, unnest(ls) AS line,
           unnest(generate_series(1, len(ls))) AS pos, len(ls) AS nl
           FROM s),
         f AS (SELECT doc_id, line, min(pos) AS fp, max(nl) AS nl
           FROM l GROUP BY 1, 2)
         SELECT doc_id,
           string_agg(line, chr(10) ORDER BY fp) AS clean,
           CAST(max(nl) AS BIGINT) AS n_lines,
           CAST(max(nl) - count(*) AS BIGINT) AS n_dup_lines
         FROM f GROUP BY doc_id ORDER BY doc_id""",
    // qe19: the 5-step greedy MMR trajectory unrolled (generated SQL).
    "qe19_mmr_topk" -> mmrOracleSql,
    // qd56/qd57: 2 unrolled BPE merge rounds (generated SQL) — the
    // learned merges and the rewritten symbol state both hash-checked.
    "qd56_bpe_merges" -> bpeMergesOracleSql,
    "qd57_bpe_vocab" -> bpeVocabOracleSql,
    // qd58: per-word symbol counts from the same merged state, joined
    // back to the corpus token stream.
    "qd58_bpe_tokenize" -> (bpeBaseCtes + """,
         wl AS (SELECT word, count(*) AS n_syms FROM s2 GROUP BY 1),
         dw AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),
           '\S+')) AS word FROM documents)
         SELECT dw.doc_id, CAST(sum(wl.n_syms) AS BIGINT)
           AS n_bpe2_tokens
         FROM dw JOIN wl USING (word) GROUP BY 1 ORDER BY 1"""),
    // qd59: the whole ring re-derived in SQL (positions are plain md5),
    // first point at-or-after the key's position, wraparound to the
    // ring minimum; the 12-shard ring is the 16-ring minus shards
    // 12-15, so `moved` is exactly the removed shards' arc.
    "qd59_consistent_shard" ->
      """WITH ring16 AS (SELECT s.s AS shard,
           CAST('0x' || substring(md5('ring:' || CAST(s.s AS VARCHAR)
             || ':' || CAST(v.v AS VARCHAR)), 1, 8) AS BIGINT) AS pos
           FROM generate_series(0, 15) s(s), generate_series(0, 7) v(v)),
         h AS (SELECT doc_id, CAST('0x' || substring(
             md5('ch:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
             AS hp
           FROM documents)
         SELECT h.doc_id,
           coalesce(
             (SELECT r.shard FROM ring16 r WHERE r.pos >= h.hp
                ORDER BY r.pos, r.shard LIMIT 1),
             (SELECT r.shard FROM ring16 r
                ORDER BY r.pos, r.shard LIMIT 1)) AS shard_before,
           coalesce(
             (SELECT r.shard FROM ring16 r
                WHERE r.shard < 12 AND r.pos >= h.hp
                ORDER BY r.pos, r.shard LIMIT 1),
             (SELECT r.shard FROM ring16 r WHERE r.shard < 12
                ORDER BY r.pos, r.shard LIMIT 1)) AS shard_after,
           coalesce(
             (SELECT r.shard FROM ring16 r WHERE r.pos >= h.hp
                ORDER BY r.pos, r.shard LIMIT 1),
             (SELECT r.shard FROM ring16 r
                ORDER BY r.pos, r.shard LIMIT 1)) <>
           coalesce(
             (SELECT r.shard FROM ring16 r
                WHERE r.shard < 12 AND r.pos >= h.hp
                ORDER BY r.pos, r.shard LIMIT 1),
             (SELECT r.shard FROM ring16 r WHERE r.shard < 12
                ORDER BY r.pos, r.shard LIMIT 1)) AS moved
         FROM h ORDER BY doc_id""",
    // qe20/qe21: the whole PQ pipeline in exact integer math — the
    // persisted-index variant (qe21) must reproduce the in-memory
    // result bit-for-bit, so both share one oracle.
    "qe20_pq_adc" -> pqAdcOracleSql,
    "qe21_pq_index" -> pqAdcOracleSql,
    // qe08 (round-3 upgrade): literal-plane buckets + exact pairwise
    // verify, so the LSH-blocked near-dup is now strictly hash-checked.
    "qe08_neardup_lsh" -> embeddingLshOracleSql,
    "qe22_pq_rerank" -> pqRerankOracleSql,
    // qd61/qd09: the whole portable winnowing pipeline — k-token
    // shingles, md5-slice hashes, w-shingle window argmin via the
    // h·2^20+pos integer key, distinct selections (SQL generated) — at
    // (k=4, w=5) for qd61 and the MOSS-style (k=5, w=4) for qd09.
    "qd61_winnow_portable" -> winnowPortableOracle(k = 4, w = 5),
    "qd09_winnow_fp" -> winnowPortableOracle(k = 5, w = 4),
    // qd60: deterministic top-1000 vocabulary, OOV counted via the
    // left join's null lane.
    "qd60_oov_rate" ->
      """WITH tk AS (SELECT doc_id, unnest(regexp_extract_all(
           lower(text), '\S+')) AS w FROM documents),
         c AS (SELECT w, count(*) AS n FROM tk GROUP BY 1),
         v AS (SELECT w FROM c ORDER BY n DESC, w LIMIT 1000)
         SELECT tk.doc_id, count(*) AS n_tokens,
           CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           floor(CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*) * 10000.0) / 10000.0 AS oov_rate
         FROM tk LEFT JOIN v USING (w) GROUP BY 1 ORDER BY 1""",
    // qv20: first click at-or-after each purchase, click_id tiebreak.
    "qv20_next_click" ->
      """WITH p AS (SELECT event_id, user_id, epoch_ns(ts) AS t
           FROM events WHERE event_type = 'purchase'),
         c AS (SELECT event_id AS click_id, user_id, epoch_ns(ts) AS t
           FROM events WHERE event_type = 'click'),
         j AS (SELECT p.event_id AS purchase_id, p.user_id, c.click_id,
           row_number() OVER (PARTITION BY p.event_id
             ORDER BY c.t, c.click_id) AS rn
           FROM p JOIN c ON p.user_id = c.user_id AND c.t >= p.t)
         SELECT purchase_id, user_id, click_id AS next_click_id
         FROM j WHERE rn = 1 ORDER BY purchase_id""",
    // qv19: the spendOutliers integer z-test on hourly type counts,
    // spike side only.
    "qv19_hourly_anomalies" ->
      """WITH r AS (SELECT (epoch_ns(ts) // 1000000000 // 3600) * 3600
             AS hour_secs, event_type, count(*) AS n
           FROM events GROUP BY 1, 2),
         w AS (SELECT *, count(*) OVER (PARTITION BY event_type) AS h,
           sum(n) OVER (PARTITION BY event_type) AS s,
           sum(n * n) OVER (PARTITION BY event_type) AS q FROM r)
         SELECT event_type, hour_secs, n, CAST(h AS BIGINT) AS h,
           CAST(s AS BIGINT) AS s
         FROM w
         WHERE CAST(h * n - s AS DOUBLE) * CAST(h * n - s AS DOUBLE)
             > 9.0 * CAST(h * q - s * s AS DOUBLE)
           AND h > 1 AND h * n > s
         ORDER BY event_type, hour_secs""",
    // qv18: plain overlap predicate — the binned first-shared-bucket
    // join must produce exactly these pairs.
    "qv18_interval_overlap" ->
      """WITH e AS (SELECT event_id, epoch_ns(ts) AS t FROM events
           WHERE event_type = 'error'),
         p AS (SELECT epoch_ns(ts) AS t FROM events
           WHERE event_type = 'purchase')
         SELECT e.event_id AS err_event_id,
           count(*) AS n_purchase_windows
         FROM e JOIN p ON e.t <= p.t + 180000000000
           AND p.t <= e.t + 300000000000
         GROUP BY 1 ORDER BY 1""",
    // qd51/qd06: the whole portable-SimHash sketch re-derived — md5-slice
    // token hashes, per-bit ±1 sums, ≥0 packing, 16-bit pigeonhole
    // blocks, exact hamming verify (SQL generated) — at radius 3 (qd51,
    // the standard dedup point) and radius 2 (qd06, the strict point).
    "qd51_simhash_portable" -> simhashPortableOracle(maxHamming = 3),
    "qd06_simhash_neardup" -> simhashPortableOracle(maxHamming = 2),
    // qd89: the persisted fingerprint store serving TEXT — odd-doc
    // simhash arrivals vs the stored even-doc corpus. The store's
    // pigeonhole banding and qd06's fixed 4-block split are both
    // EXACT at the radius, so the truth is plain brute force over the
    // re-derived two-half signatures (banding geometry provably
    // doesn't leak into results). doc_id < 4000 bounds the corpus
    // (the qm-family discipline) so the unbanded cross join stays
    // fixed-cost across scale factors.
    "qd89_text_fp_index" -> (simhashSigCtes + """
       SELECT batch_doc, index_doc, hamming FROM (
         SELECT a.doc_id AS batch_doc, b.doc_id AS index_doc,
           CAST(bit_count(xor(a.hi, b.hi))
             + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
         FROM sig a JOIN sig b
           ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
           AND a.doc_id < 4000 AND b.doc_id < 4000) z
       WHERE hamming <= 2 ORDER BY batch_doc, index_doc"""),
    // qd91: ranked top-3 per arrival off the TEXT fingerprint store —
    // the qm12 serving shape on the second modality; brute-force
    // Hamming cut at the radius, ranked (hamming asc, doc asc).
    "qd91_text_fp_topk" -> (simhashSigCtes + """
       SELECT batch_doc, index_doc, hamming,
         CAST(row_number() OVER (PARTITION BY batch_doc
           ORDER BY hamming, index_doc) AS BIGINT) AS rank
       FROM (
         SELECT a.doc_id AS batch_doc, b.doc_id AS index_doc,
           CAST(bit_count(xor(a.hi, b.hi))
             + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
         FROM sig a JOIN sig b
           ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
           AND a.doc_id < 4000 AND b.doc_id < 4000) z
       WHERE hamming <= 2
       QUALIFY rank <= 3 ORDER BY batch_doc, rank"""),
    // qd92: the maintenance sweep — after Maintenance.applyPlan clears
    // the registry's signals (tombstones pending drop, relabel patches
    // pending materialization) the served data must sit on closed-form
    // truth: the probe sees the post-delete corpus (every tenth stored
    // even doc gone), the cluster map sits on the full-rebuild
    // fixpoint over ALL brute radius-2 pairs (deletion touches only
    // the fingerprint store, never the labels), the sweep row carries
    // (stores compacted, residual actions, pre-sweep tombstone count —
    // the one registry signal that is SQL-derivable).
    "qd92_maintenance_sweep" -> (simhashSigCtes
      .replaceFirst("WITH ", "WITH RECURSIVE ") + """,
       sg AS (SELECT doc_id, hi, lo FROM sig WHERE doc_id < 4000),
       pr AS (SELECT doc_a, doc_b FROM (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
               AS h
           FROM sg a JOIN sg b ON a.doc_id < b.doc_id) z
         WHERE h <= 2),
       e AS (SELECT doc_a AS a, doc_b AS b FROM pr
         UNION SELECT doc_b, doc_a FROM pr),
       cc(a, b) AS (SELECT a, b FROM e
         UNION SELECT cc.a, e.b FROM cc JOIN e ON cc.b = e.a),
       cl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster
         FROM cc GROUP BY a),
       fp AS (SELECT batch_doc, index_doc, hamming FROM (
           SELECT a.doc_id AS batch_doc, b.doc_id AS index_doc,
             CAST(bit_count(xor(a.hi, b.hi))
               + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
           FROM sg a JOIN sg b
             ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
             AND b.doc_id % 10 <> 0) z
         WHERE hamming <= 2),
       del AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sg
         WHERE doc_id % 2 = 0 AND doc_id % 10 = 0)
       SELECT phase, id_a, id_b, val FROM (
         SELECT 'cluster' AS phase, doc_id AS id_a, cluster AS id_b,
           CAST(NULL AS BIGINT) AS val FROM cl
         UNION ALL
         SELECT 'fp_pairs', batch_doc, index_doc, hamming FROM fp
         UNION ALL
         SELECT 'sweep', CAST(2 AS BIGINT), CAST(0 AS BIGINT), n
           FROM del) u
       ORDER BY phase, id_a, id_b"""),
    // qd52: repeat factors as a CASE chain; fractional copy decided by
    // the same md5-threshold compare as the sampling family.
    "qd52_epoch_upsample" ->
      """WITH r AS (SELECT doc_id, source,
           CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 2.0
             WHEN 'src2' THEN 0.5 ELSE 1.0 END AS f FROM documents),
         c AS (SELECT doc_id, source, CAST(floor(f) AS BIGINT) +
           CASE WHEN substring(md5('eu:' || CAST(doc_id AS VARCHAR)), 1, 8)
             < printf('%08x', CAST(least(floor((f - floor(f))
               * 4294967296.0), 4294967295.0) AS BIGINT))
             THEN 1 ELSE 0 END AS n
           FROM r)
         SELECT doc_id, source,
           unnest(generate_series(0, n - 1)) AS copy
         FROM c WHERE n > 0 ORDER BY doc_id, copy""",
    // qd53: per-fingerprint winner by (source priority, doc_id).
    "qd53_priority_dedup" ->
      """WITH f AS (SELECT doc_id, source,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
           CASE source WHEN 'src0' THEN 0 WHEN 'src1' THEN 1 ELSE 2 END
             AS rnk FROM documents),
         r AS (SELECT doc_id, source, fp, row_number() OVER (
           PARTITION BY fp ORDER BY rnk, doc_id) AS rn FROM f)
         SELECT fp, doc_id, source FROM r WHERE rn = 1 ORDER BY fp""",
    // qd54: the E-S priority formula inside a per-group rank.
    "qd54_group_weighted" ->
      """WITH p AS (SELECT doc_id, source,
           floor(1e12 * -ln((CAST('0x' || substring(
             md5('gws:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
             + 1.0) / 4294967296.0) / CAST(n_chars AS DOUBLE)) AS pri
           FROM documents),
         r AS (SELECT doc_id, source, row_number() OVER (
           PARTITION BY source ORDER BY pri, doc_id) AS rn FROM p)
         SELECT doc_id, source FROM r WHERE rn <= 10
         ORDER BY doc_id""",
    // qd55: rate_g = min(1, budget·share/tokens_g); md5-threshold keep.
    "qd55_budget_mix" ->
      """WITH n AS (SELECT source, sum(CAST(n_chars AS DOUBLE)) AS n
           FROM documents GROUP BY 1),
         s AS (SELECT * FROM (VALUES ('src0', 0.5), ('src1', 0.3),
           ('src2', 0.2)) AS t(source, share)),
         r AS (SELECT n.source,
           least(1.0, 30000.0 * s.share / n.n) AS rate0
           FROM n JOIN s USING (source))
         SELECT d.doc_id, d.source,
           floor(r.rate0 * 10000.0) / 10000.0 AS rate
         FROM documents d JOIN r USING (source)
         WHERE substring(md5('bm:' || CAST(d.doc_id AS VARCHAR)), 1, 8)
           < printf('%08x', CAST(least(floor(r.rate0 * 4294967296.0),
             4294967295.0) AS BIGINT))
         ORDER BY d.doc_id""",
    // qd48: Efraimidis–Spirakis priorities re-derived verbatim —
    // u from the md5 prefix (+1 so u∈(0,1]), priority −ln(u)/w floored
    // at 1e-12 resolution; the k smallest (ties by id) are the sample.
    "qd48_weighted_sample" ->
      """SELECT doc_id, n_chars FROM (
           SELECT doc_id, n_chars,
             CAST(floor(1e12 * -ln((CAST('0x' || substring(
               md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
               + 1.0) / 4294967296.0) / CAST(n_chars AS DOUBLE))
               AS BIGINT) AS pri
           FROM documents ORDER BY pri, doc_id LIMIT 100)
         ORDER BY doc_id""",
    // qd49: distinct (source, 5-gram) pairs, then the bounded
    // source-pair self-join — same gram builder as qd23.
    "qd49_source_overlap" ->
      """WITH tk AS (SELECT source, regexp_extract_all(lower(text),
           '\S+') AS toks FROM documents),
         g AS (SELECT DISTINCT source AS src,
             unnest(list_distinct([array_to_string(toks[i:i+4], ' ')
               FOR i IN range(1, len(toks) - 3)])) AS gram
           FROM tk WHERE len(toks) >= 5)
         SELECT a.src AS source_a, b.src AS source_b,
           count(*) AS n_shared
         FROM g a JOIN g b ON a.gram = b.gram AND a.src < b.src
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // qd50: qd02's quality expression, then keep rank ≤ ceil(0.6·n)
    // per source (score desc, doc_id tiebreak).
    "qd50_quality_gate" ->
      """WITH tk AS (SELECT doc_id, source, text,
           regexp_extract_all(lower(text), '\S+') AS toks FROM documents),
         sc AS (SELECT doc_id, source,
           len(list_filter(toks, t -> list_contains(
             ['the','of','and','to','in','is','that','it','was','for'],
             t))) AS en_hits, toks, text FROM tk),
         q AS (SELECT doc_id, source,
           floor((0.4 * (CASE WHEN len(toks) = 0 THEN 0.0 ELSE
               CAST(en_hits AS DOUBLE) / CAST(len(toks) AS DOUBLE) END)
             + 0.3 * (1.0 - CASE WHEN length(text) = 0 THEN 0.0 ELSE
               CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g'))
                 AS DOUBLE) / CAST(length(text) AS DOUBLE) END)
             + 0.3 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0))
             * 10000.0) / 10000.0 AS quality
           FROM sc),
         r AS (SELECT doc_id, source,
           row_number() OVER (PARTITION BY source
             ORDER BY quality DESC, doc_id) AS rn,
           count(*) OVER (PARTITION BY source) AS n FROM q)
         SELECT doc_id, source FROM r
         WHERE CAST(rn AS DOUBLE) <= ceil(0.6 * CAST(n AS DOUBLE))
         ORDER BY doc_id""",
    // qe18: centroids from exact integer sums (qe06's discipline), then
    // cosine(v, own-label centroid) rounded to 4 — float-sum reorder is
    // absorbed by the rounding exactly as in qe01.
    "qe18_centroid_outliers" ->
      """WITH s AS (SELECT label, dim, count(*) AS n,
           sum(CAST(floor(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS se4
           FROM (SELECT label, unnest(embedding) AS x,
             generate_subscripts(embedding, 1) AS dim FROM embeddings)
           GROUP BY 1, 2),
         c AS (SELECT label, dim,
           CAST(se4 AS DOUBLE) / (10000.0 * n) AS c FROM s),
         z AS (SELECT e.vec_id, e.label,
           CAST(unnest(e.embedding) AS DOUBLE) AS x,
           generate_subscripts(e.embedding, 1) AS dim FROM embeddings e),
         t AS (SELECT z.vec_id, z.label, sum(z.x * c.c) AS xc,
           sum(z.x * z.x) AS xx, sum(c.c * c.c) AS cc
           FROM z JOIN c ON z.label = c.label AND z.dim = c.dim
           GROUP BY 1, 2)
         SELECT vec_id, label,
           round(xc / (sqrt(xx) * sqrt(cc)), 4) AS cos_centroid,
           round(xc / (sqrt(xx) * sqrt(cc)), 4) < 0.0 AS is_outlier
         FROM t ORDER BY vec_id""",
    // qe17: all-bucket-probed filtered index search is exact, so the
    // brute-force oracle with the same label predicate applies.
    "qe17_filtered_ann" ->
      """WITH z AS (SELECT e.vec_id,
           CAST(unnest(e.embedding) AS DOUBLE) AS a,
           CAST(unnest((SELECT embedding FROM embeddings WHERE vec_id = 0))
             AS DOUBLE) AS b
           FROM embeddings e WHERE e.label = 3),
         s AS (SELECT vec_id, sum(a*b) AS ab, sum(a*a) AS aa, sum(b*b) AS bb
           FROM z GROUP BY 1)
         SELECT vec_id, round(ab / (sqrt(aa) * sqrt(bb)), 4) AS cos,
           row_number() OVER (ORDER BY round(ab / (sqrt(aa) * sqrt(bb)), 4)
             DESC, vec_id) AS rank
         FROM s QUALIFY rank <= 10 ORDER BY rank""",
    // The composed curation pipeline: quality/PII gate -> exact dedup
    // (min doc per fingerprint) -> near-dup cluster representative.
    // qd14: the curation chain — quality/PII gate, exact dedup, then a
    // probe of the FULL-CORPUS cluster map (dupClustersCte) keeping the
    // smallest surviving member per near-dup family.
    "qd14_curated_corpus" -> (dupClustersCte + """,
         tk AS (SELECT doc_id, source, text,
           regexp_extract_all(lower(text), '\S+') AS toks FROM documents),
         q AS (SELECT doc_id, source, text, toks,
           floor((0.4 * (CASE WHEN len(toks) = 0 THEN 0.0 ELSE
               CAST(len(list_filter(toks, t -> list_contains(
                 ['the','of','and','to','in','is','that','it','was','for'],
                 t))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) END)
             + 0.3 * (1.0 - CASE WHEN length(text) = 0 THEN 0.0 ELSE
               CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g'))
                 AS DOUBLE) / CAST(length(text) AS DOUBLE) END)
             + 0.3 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0))
             * 10000.0) / 10000.0 AS quality
           FROM tk),
         passed AS (SELECT doc_id, source, text, quality FROM q
           WHERE quality >= 0.5
             AND (len(regexp_extract_all(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
               + len(regexp_extract_all(text, '\d{3}[-.]\d{3}[-.]\d{4}'))
               + len(regexp_extract_all(text, '\d{3}-\d{2}-\d{4}'))) = 0),
         ex AS (SELECT *, min(doc_id) OVER (PARTITION BY
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))))
             AS keep_id FROM passed),
         kept AS (SELECT doc_id, source, quality FROM ex
           WHERE doc_id = keep_id),
         sel AS (SELECT k.doc_id, k.source, k.quality,
             coalesce(cl.cluster, k.doc_id) AS cluster
           FROM kept k LEFT JOIN cl ON k.doc_id = cl.doc_id),
         mm AS (SELECT *, min(doc_id) OVER (PARTITION BY cluster) AS mn
           FROM sel)
         SELECT doc_id, source, quality FROM mm WHERE doc_id = mn
         ORDER BY doc_id"""),
    // Training docs sharing any 4-token n-gram with the eval subset
    // (doc_id % 97 == 0). Gram strings reproduce Spark's concat_ws(" ").
    // Shared by qd43: the Bloom prefilter is exact end-to-end (no false
    // negatives; the verify join drops false positives).
    "qd15_decontaminate" -> decontaminateOracleSql,
    "qd43_bloom_decontaminate" -> decontaminateOracleSql,
    // Deterministic stratified sample: md5(doc_id) hex-prefix threshold,
    // 0.75 for quality >= 0.5 ('c0000000'), 0.25 below ('40000000').
    "qd16_det_sample" ->
      """WITH tk AS (SELECT doc_id, text,
           regexp_extract_all(lower(text), '\S+') AS toks FROM documents),
         q AS (SELECT doc_id,
           floor((0.4 * (CASE WHEN len(toks) = 0 THEN 0.0 ELSE
               CAST(len(list_filter(toks, t -> list_contains(
                 ['the','of','and','to','in','is','that','it','was','for'],
                 t))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) END)
             + 0.3 * (1.0 - CASE WHEN length(text) = 0 THEN 0.0 ELSE
               CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g'))
                 AS DOUBLE) / CAST(length(text) AS DOUBLE) END)
             + 0.3 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0))
             * 10000.0) / 10000.0 AS quality
           FROM tk),
         s AS (SELECT doc_id, quality,
           CASE WHEN quality >= 0.5 THEN 'high' ELSE 'low' END AS stratum
           FROM q)
         SELECT doc_id, stratum, quality FROM s
         WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
           CASE WHEN stratum = 'high' THEN 'c0000000' ELSE '40000000' END
         ORDER BY doc_id""",
    // Greedy 512-token sequence packing per source stream: a document
    // starts in sequence floor(tokens_before/512) at offset
    // tokens_before % 512.
    "qd17_seq_pack" ->
      """WITH n AS (SELECT doc_id, source AS stream,
           CAST(len(regexp_extract_all(lower(text), '\S+')) AS BIGINT)
             AS n_tokens
           FROM documents),
         c AS (SELECT *, coalesce(sum(n_tokens) OVER (PARTITION BY stream
             ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS tokens_before FROM n)
         SELECT doc_id, stream, n_tokens,
           CAST(floor(CAST(tokens_before AS DOUBLE) / 512.0) AS BIGINT)
             AS seq_id,
           CAST(tokens_before % 512 AS BIGINT) AS seq_offset
         FROM c ORDER BY stream, doc_id""",
    // (lang x source) CUBE corpus dashboard; NULL grouping labels -> ALL.
    "qd21_cube_profile" ->
      """SELECT coalesce(lang, 'ALL') AS lang,
         coalesce(source, 'ALL') AS source,
         count(*) AS n_docs,
         CAST(sum(len(regexp_extract_all(lower(text), '\S+'))) AS BIGINT)
           AS sum_tokens
         FROM documents GROUP BY CUBE (lang, source) ORDER BY 1, 2""",
    // Corpus-wide adjacent char-pair counts (BPE merge candidates).
    "qd22_char_pairs" ->
      """WITH toks AS (SELECT unnest(regexp_extract_all(lower(text),
           '\S+')) AS w FROM documents),
         pairs AS (SELECT unnest([w[i:i+1] FOR i IN range(1, length(w))])
           AS pair FROM toks WHERE length(w) >= 2),
         c AS (SELECT pair, count(*) AS n FROM pairs GROUP BY 1)
         SELECT pair, n, CAST(row_number() OVER (ORDER BY n DESC, pair)
           AS BIGINT) AS rank
         FROM c ORDER BY rank LIMIT 50""",
    // Shared 6-token passages; the df<=50 cap is part of the contract
    // and mirrored here, so the compare is exact.
    "qd23_shared_passages" ->
      """WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text),
           '\S+') AS toks FROM documents),
         g AS (SELECT doc_id,
             unnest(list_distinct([array_to_string(toks[i:i+5], ' ')
               FOR i IN range(1, len(toks) - 4)])) AS gram
           FROM tk WHERE len(toks) >= 6),
         df_ AS (SELECT gram, count(*) AS df FROM g GROUP BY 1),
         kept AS (SELECT g.doc_id, g.gram FROM g JOIN df_ USING (gram)
           WHERE df <= 50),
         p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(*) AS n_shared
           FROM kept a JOIN kept b
             ON a.gram = b.gram AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT doc_a, doc_b, n_shared FROM p WHERE n_shared >= 2
         ORDER BY doc_a, doc_b""",
    // Portable MinHash+LSH: md5-prefix lanes, md5 band buckets, exact
    // word-set verification — the whole sketch pipeline reproduced, at
    // both declared LSH operating points (qd24 recall-oriented 8×2,
    // qd05 precision-oriented 16×4).
    "qd24_minhash_portable" ->
      minhashPortableOracle(numLanes = 8, rowsPerBand = 2),
    "qd05_minhash_neardup" ->
      minhashPortableOracle(numLanes = 16, rowsPerBand = 4),
    // Unigram NLL quality signal: corpus token frequencies, per-token
    // -ln(c/N) floored to 1e-4 longs BEFORE the per-doc sum (exact ints).
    "qd18_unigram_nll" ->
      """WITH toks AS (SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '\S+')) AS w
           FROM documents),
         c AS (SELECT w, count(*) AS c FROM toks GROUP BY 1),
         n AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM c)
         SELECT doc_id, count(*) AS n_tokens,
           CAST(sum(CAST(floor(-ln(CAST(c.c AS DOUBLE)
             / CAST(n.n_total AS DOUBLE)) * 10000.0) AS BIGINT)) AS BIGINT)
             AS nll_sum_e4
         FROM toks JOIN c USING (w) CROSS JOIN n
         GROUP BY 1 ORDER BY 1""",
    // Language-mix rebalance: keep-rate min(1, uniform-share/n_lang),
    // deterministic md5 threshold with the rate's hex computed in-plan.
    "qd19_mix_rebalance" ->
      """WITH n AS (SELECT lang, count(*) AS n_docs FROM documents
           GROUP BY 1),
         tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
           count(*) AS n_groups FROM n),
         r AS (SELECT lang, least(1.0, (CAST(n_total AS DOUBLE)
             / CAST(n_groups AS DOUBLE)) / CAST(n_docs AS DOUBLE)) AS rate0
           FROM n CROSS JOIN tot)
         SELECT d.doc_id, d.lang,
           floor(r.rate0 * 10000.0) / 10000.0 AS rate
         FROM documents d JOIN r USING (lang)
         WHERE substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) <
           printf('%08x', CAST(least(floor(r.rate0 * 4294967296.0),
             4294967295.0) AS BIGINT))
         ORDER BY d.doc_id""",
    // Overlapping 64-token chunks with 48-token stride; final partial
    // window kept. Slicing clamps at the array end in both engines.
    "qd20_chunk" ->
      """WITH tk AS (SELECT doc_id,
           regexp_extract_all(lower(text), '\S+') AS toks FROM documents),
         c AS (SELECT doc_id, unnest(range(0, len(toks), 48)) AS st, toks
           FROM tk WHERE len(toks) > 0)
         SELECT doc_id, CAST(st / 48 AS BIGINT) AS chunk_id,
           CAST(len(toks[st+1:st+64]) AS BIGINT) AS n_chunk_tokens,
           array_to_string(toks[st+1:st+64], ' ') AS chunk_text
         FROM c ORDER BY doc_id, chunk_id""",
    // Int8 scalar quantization: per-dim [min,max] -> 0..255 on 1e-4
    // integer element values — exact integer math on both engines.
    "qe07_quantize_int8" ->
      """WITH e AS (SELECT vec_id, unnest(embedding) AS x,
             CAST(unnest(range(len(embedding))) AS BIGINT) AS dim
           FROM embeddings),
         i AS (SELECT vec_id, dim,
             CAST(floor(CAST(x AS DOUBLE) * 10000.0) AS BIGINT) AS x_e4
           FROM e),
         s AS (SELECT dim, min(x_e4) AS mn, max(x_e4) AS mx FROM i
           GROUP BY 1)
         SELECT vec_id, dim,
           CAST(CASE WHEN mx = mn THEN 0 ELSE
             least(floor(CAST((x_e4 - mn) * 255 AS DOUBLE)
               / CAST(mx - mn AS DOUBLE)), 255.0) END AS BIGINT) AS q
         FROM i JOIN s USING (dim) ORDER BY vec_id, dim""",
    // Per-label centroid element sums at 1e-4 integer resolution —
    // exact integer math on both engines (sum cast per the HUGEINT rule).
    "qe06_label_centroids" ->
      """SELECT label, dim, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 10000.0) AS BIGINT))
           AS BIGINT) AS sum_e4
         FROM (SELECT label, unnest(embedding) AS x,
             CAST(unnest(range(len(embedding))) AS BIGINT) AS dim
           FROM embeddings)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "qd12_pii_flags" ->
      """SELECT doc_id,
         CAST(len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
           AS n_emails,
         CAST(len(regexp_extract_all(text,
           '\d{3}[-.]\d{3}[-.]\d{4}')) AS BIGINT) AS n_phones,
         CAST(len(regexp_extract_all(text,
           '\d{3}-\d{2}-\d{4}')) AS BIGINT) AS n_ssns,
         (len(regexp_extract_all(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
          + len(regexp_extract_all(text, '\d{3}[-.]\d{3}[-.]\d{4}'))
          + len(regexp_extract_all(text, '\d{3}-\d{2}-\d{4}'))) > 0
           AS has_pii
         FROM documents ORDER BY doc_id""",
    "qe01_cosine_topk" -> bruteTopKOracleSql,
    // Persisted-LSH-index top-k with every bucket probed is EXACT, so the
    // brute-force oracle applies — a strict correctness check on the
    // index write + partition-pruned read path, not just a rows count.
    "qe05_ann_index" -> bruteTopKOracleSql,
    "qe02_embedding_neardup" ->
      """WITH p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(unnest(a.embedding) AS DOUBLE) AS x,
           CAST(unnest(b.embedding) AS DOUBLE) AS y
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id < b.vec_id),
         s AS (SELECT vec_a, vec_b, sum(x*y) AS xy, sum(x*x) AS xx,
           sum(y*y) AS yy FROM p GROUP BY 1, 2)
         SELECT vec_a, vec_b, round(xy / (sqrt(xx) * sqrt(yy)), 4) AS cos
         FROM s WHERE round(xy / (sqrt(xx) * sqrt(yy)), 4) >= 0.3
         ORDER BY 1, 2""",
    "qv01_event_hourly" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) // 1000 AS hour_secs,
         event_type, count(*) AS n_events,
         round(sum(value), 2) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "qv02_sessionize" ->
      """WITH e AS (SELECT event_id, user_id, ts,
           epoch_ms(ts) // 1000 AS secs FROM events),
         f AS (SELECT event_id, user_id, ts, secs,
           lag(secs) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM e),
         g AS (SELECT event_id, user_id, ts, secs,
           CASE WHEN prev IS NULL OR secs - prev > 1800 THEN 1 ELSE 0 END AS ns
           FROM f)
         SELECT event_id, user_id,
           CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         FROM g ORDER BY event_id""",
    "qv03_session_stats" ->
      """WITH e AS (SELECT event_id, user_id, ts, value,
           epoch_ms(ts) // 1000 AS secs FROM events),
         f AS (SELECT *, lag(secs) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e),
         g AS (SELECT *, CASE WHEN prev IS NULL OR secs - prev > 1800
           THEN 1 ELSE 0 END AS ns FROM f),
         h AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id
           ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id FROM g)
         SELECT user_id, session_id, count(*) AS n_events,
           min(secs) AS start_secs, max(secs) AS end_secs,
           round(sum(value), 2) AS session_value
         FROM h GROUP BY 1, 2 ORDER BY 1, 2""",
    "qv04_salted_totals" ->
      """SELECT user_id, count(*) AS n,
         CAST(sum(CAST(floor(value * 100.0) AS BIGINT)) AS BIGINT) AS total_cents
         FROM events GROUP BY 1 ORDER BY 1""",
    // Per-user lag / gap / 3-event moving sum — integer cents + micros.
    "qv05_rolling" ->
      """WITH e AS (SELECT event_id, user_id, ts, epoch_us(ts) AS ts_us,
           CAST(floor(value * 100.0) AS BIGINT) AS cents FROM events)
         SELECT event_id, user_id, ts_us, cents,
           lag(cents) OVER w AS prev_cents,
           ts_us - lag(ts_us) OVER w AS gap_us,
           CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS roll3_cents
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY event_id""",
    // Exact lower median per type: the ((n+1) div 2)-th order statistic,
    // selected inside the group partition — no global sort.
    "qv07_group_median" ->
      """WITH e AS (SELECT event_type,
           CAST(floor(value * 100.0) AS BIGINT) AS cents, event_id
           FROM events),
         r AS (SELECT event_type, cents,
           row_number() OVER (PARTITION BY event_type
             ORDER BY cents, event_id) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
           FROM e)
         SELECT event_type, n AS n_events, cents AS median_cents
         FROM r WHERE rn = (n + 1) // 2
         ORDER BY event_type""",
    // Semi-structured JSON extraction over the props column.
    "qv08_json_props" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
           AS BIGINT) AS sum_k,
         CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
           AS BIGINT) AS min_k,
         CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
           AS BIGINT) AS max_k
         FROM events GROUP BY 1 ORDER BY 1""",
    // Ordered conversion funnel: first signup, first click at-or-after,
    // first purchase at-or-after that click; stage = depth reached.
    "qv09_funnel" ->
      """WITH s AS (SELECT user_id, epoch_us(min(ts)) AS s_us FROM events
           WHERE event_type = 'signup' GROUP BY 1),
         c AS (SELECT e.user_id, epoch_us(min(e.ts)) AS c_us
           FROM events e JOIN s ON e.user_id = s.user_id
           WHERE e.event_type = 'click' AND epoch_us(e.ts) >= s.s_us
           GROUP BY 1),
         p AS (SELECT e.user_id, epoch_us(min(e.ts)) AS p_us
           FROM events e JOIN c ON e.user_id = c.user_id
           WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.c_us
           GROUP BY 1)
         SELECT s.user_id, s.s_us, c.c_us, p.p_us,
           CASE WHEN p.p_us IS NOT NULL THEN 3
                WHEN c.c_us IS NOT NULL THEN 2 ELSE 1 END AS stage
         FROM s LEFT JOIN c ON s.user_id = c.user_id
                LEFT JOIN p ON s.user_id = p.user_id
         ORDER BY s.user_id""",
    // Weekly retention cohorts: first-active week x week offset.
    "qv10_retention" ->
      """WITH d AS (SELECT user_id,
           epoch_us(ts) // (86400000000 * 7) AS week_ FROM events),
         f AS (SELECT user_id, min(week_) AS cohort_week FROM d GROUP BY 1)
         SELECT f.cohort_week, d.week_ - f.cohort_week AS week_offset,
           count(DISTINCT d.user_id) AS n_users
         FROM d JOIN f ON d.user_id = f.user_id
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // Dense (gap-filled) hourly counts: hour spine x distinct types,
    // zero-filled left join against the rollup.
    "qv11_dense_hourly" ->
      """WITH r AS (SELECT epoch_us(ts) // 3600000000 * 3600 AS hour_secs,
           event_type, count(*) AS n FROM events GROUP BY 1, 2),
         b AS (SELECT min(hour_secs) AS h0, max(hour_secs) AS h1 FROM r),
         hours AS (SELECT unnest(generate_series(h0, h1, 3600))
           AS hour_secs FROM b),
         types AS (SELECT DISTINCT event_type FROM events)
         SELECT h.hour_secs, t.event_type, coalesce(r.n, 0) AS n_events
         FROM hours h CROSS JOIN types t
         LEFT JOIN r ON r.hour_secs = h.hour_secs
           AND r.event_type = t.event_type
         ORDER BY 1, 2""",
    // As-of join: DuckDB's native ASOF LEFT JOIN is the oracle for the
    // composed union+window merge implementation (ops/AsOf).
    "qv06_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts, epoch_us(ts) AS ts_us
           FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts, epoch_us(ts) AS click_ts_us,
           CAST(floor(value * 100.0) AS BIGINT) AS click_cents
           FROM events WHERE event_type = 'click')
         SELECT p.event_id, p.user_id, p.ts_us, c.click_ts_us,
           c.click_cents
         FROM p ASOF LEFT JOIN c
           ON p.user_id = c.user_id AND p.ts >= c.ts
         ORDER BY p.event_id""",
    // Binned range join is exact: a plain range-predicate join
    // reproduces it (5-minute window, inclusive ends, epoch nanos).
    "qv17_interval_join" ->
      """WITH e AS (SELECT event_id, epoch_ns(ts) AS t FROM events
           WHERE event_type = 'error'),
         v AS (SELECT epoch_ns(ts) AS t FROM events
           WHERE event_type = 'view')
         SELECT e.event_id AS err_event_id, count(*) AS n_views
         FROM e JOIN v ON v.t >= e.t AND v.t <= e.t + 300000000000
         GROUP BY 1 ORDER BY 1""",
    // Same regexes as qd12, applied as global replacements; counts are
    // occurrences on the original text.
    "qd44_pii_redact" ->
      """SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             '<EMAIL>', 'g'),
             '\d{3}[-.]\d{3}[-.]\d{4}', '<PHONE>', 'g'),
             '\d{3}-\d{2}-\d{4}', '<SSN>', 'g') AS text_redacted,
           len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             AS n_emails,
           len(regexp_extract_all(text, '\d{3}[-.]\d{3}[-.]\d{4}'))
             AS n_phones,
           len(regexp_extract_all(text, '\d{3}-\d{2}-\d{4}')) AS n_ssns
         FROM documents ORDER BY doc_id""",
    // C4-style boilerplate pruning: tokens covered by any 3-shingle with
    // document frequency > 5 are removed; surviving order preserved via
    // the 1-based token index (Spark uses 0-based — internal only).
    "qd25_prune_passages" ->
      """WITH d AS (SELECT doc_id,
           regexp_extract_all(lower(text), '\S+') AS ws FROM documents),
         tok AS (SELECT doc_id, unnest(ws) AS w,
           unnest(range(1, len(ws) + 1)) AS i FROM d),
         sh AS (SELECT doc_id,
           unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
             for i in range(1, len(ws) - 1)]) AS s,
           unnest(range(1, len(ws) - 1)) AS p FROM d),
         hot AS (SELECT s FROM sh GROUP BY s
           HAVING count(DISTINCT doc_id) > 5),
         cov AS (SELECT DISTINCT doc_id, i FROM (
           SELECT sh.doc_id, unnest([sh.p, sh.p + 1, sh.p + 2]) AS i
           FROM sh JOIN hot USING (s))),
         kept AS (SELECT t.doc_id, count(*) AS n_kept,
             string_agg(t.w, ' ' ORDER BY t.i) AS text_pruned
           FROM tok t ANTI JOIN cov
             ON t.doc_id = cov.doc_id AND t.i = cov.i
           GROUP BY t.doc_id)
         SELECT d.doc_id, coalesce(k.text_pruned, '') AS text_pruned,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(len(d.ws) - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed
         FROM d LEFT JOIN kept k USING (doc_id) ORDER BY doc_id""",
    // Linear BoW classifier with md5-derived integer weights in [-8, 7]
    // (first md5 hex digit's position in the hex alphabet, minus 9).
    "qd26_linear_score" ->
      """WITH toks AS (SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '\S+')) AS w
           FROM documents),
         wts AS (SELECT w,
             CAST(strpos('0123456789abcdef', substring(md5(w), 1, 1)) - 9
               AS BIGINT) AS weight
           FROM (SELECT DISTINCT w FROM toks))
         SELECT doc_id, count(*) AS n_tokens,
           CAST(sum(coalesce(weight, 0)) AS BIGINT) AS score_sum,
           CAST(floor(CAST(sum(coalesce(weight, 0)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) * 10000.0) AS BIGINT) AS score_e4
         FROM toks LEFT JOIN wts USING (w) GROUP BY 1 ORDER BY 1""",
    // Bigram-LM NLL: MLE P(b|a) = c(a,b)/c(a,.), per-bigram NLL floored
    // to 1e-4 longs BEFORE the per-doc sum (exact ints, like qd18).
    "qd27_bigram_nll" ->
      """WITH d AS (SELECT doc_id,
           regexp_extract_all(lower(text), '\S+') AS ws FROM documents),
         b2 AS (SELECT doc_id,
           unnest([ws[i] for i in range(1, len(ws))]) AS a,
           unnest([ws[i+1] for i in range(1, len(ws))]) AS b FROM d),
         cab AS (SELECT a, b, count(*) AS cab FROM b2 GROUP BY 1, 2),
         ca AS (SELECT a, CAST(sum(cab) AS BIGINT) AS ca
           FROM cab GROUP BY 1),
         s AS (SELECT doc_id, CAST(floor(-ln(CAST(cab AS DOUBLE)
             / CAST(ca AS DOUBLE)) * 10000.0) AS BIGINT) AS t_e4
           FROM b2 JOIN cab USING (a, b) JOIN ca USING (a)),
         agg AS (SELECT doc_id, count(*) AS n_bigrams,
             CAST(sum(t_e4) AS BIGINT) AS nll_sum_e4 FROM s GROUP BY 1)
         SELECT d.doc_id,
           CAST(coalesce(agg.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(coalesce(agg.nll_sum_e4, 0) AS BIGINT) AS nll_sum_e4
         FROM d LEFT JOIN agg USING (doc_id) ORDER BY 1""",
    // Per-source lexical diversity: vocab, hapax, type-token ratio.
    "qd28_vocab_profile" ->
      """WITH toks AS (SELECT source,
           unnest(regexp_extract_all(lower(text), '\S+')) AS w
           FROM documents),
         c AS (SELECT source, w, count(*) AS c FROM toks GROUP BY 1, 2),
         g AS (SELECT source, count(*) AS vocab,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS hapax
           FROM c GROUP BY 1),
         nd AS (SELECT source, count(*) AS n_docs FROM documents
           GROUP BY 1)
         SELECT nd.source, n_docs, n_tokens, vocab, hapax,
           CAST(floor(CAST(vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE)
             * 10000.0) AS BIGINT) AS ttr_e4,
           CAST(floor(CAST(hapax AS DOUBLE) / CAST(vocab AS DOUBLE)
             * 10000.0) AS BIGINT) AS hapax_ratio_e4
         FROM nd JOIN g USING (source) ORDER BY 1""",
    // JL random projection with the md5-sign matrix: sign(j,i) = +1 iff
    // first hex digit of md5('j:i') < '8'; elements quantized to 1e-4
    // longs BEFORE the sum, so out_e4 is engine-exact.
    "qe11_random_projection" ->
      """WITH e AS (SELECT vec_id, unnest(embedding) AS x,
           unnest(range(1, 65)) AS i FROM embeddings),
         q AS (SELECT vec_id, i,
           CAST(floor(CAST(x AS DOUBLE) * 10000.0) AS BIGINT) AS x_e4
           FROM e),
         j AS (SELECT unnest(range(1, 17)) AS dim),
         s AS (SELECT q.vec_id, j.dim, q.x_e4 *
             (CASE WHEN substring(md5(j.dim || ':' || q.i), 1, 1) < '8'
               THEN 1 ELSE -1 END) AS t
           FROM q CROSS JOIN j)
         SELECT vec_id, CAST(dim AS BIGINT) AS dim,
           CAST(sum(t) AS BIGINT) AS out_e4
         FROM s GROUP BY 1, 2 ORDER BY 1, 2""",
    // Top-20 session event-type paths over the qv02 session definition.
    "qv12_top_paths" ->
      """WITH e AS (SELECT event_id, user_id, ts, event_type,
           epoch_ms(ts) // 1000 AS secs FROM events),
         f AS (SELECT *, lag(secs) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e),
         g AS (SELECT *, CASE WHEN prev IS NULL OR secs - prev > 1800
           THEN 1 ELSE 0 END AS ns FROM f),
         h AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id
           ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id FROM g),
         p AS (SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
           FROM h GROUP BY 1, 2),
         c AS (SELECT path, count(*) AS n FROM p GROUP BY 1
           ORDER BY n DESC, path LIMIT 20)
         SELECT path, n, CAST(row_number() OVER (ORDER BY n DESC, path)
           AS BIGINT) AS rank FROM c ORDER BY rank""",
    // Equi-width cents histogram per event type; bins via floor division
    // in double (Spark div truncates, DuckDB // floors — doubles agree).
    "qv13_value_histogram" ->
      """WITH c AS (SELECT event_type,
           CAST(floor(value * 100.0) AS BIGINT) AS cents FROM events),
         b AS (SELECT event_type,
           CAST(floor(CAST(cents AS DOUBLE) / 1000.0) AS BIGINT) AS bin,
           cents FROM c)
         SELECT event_type, bin, bin * 1000 AS bin_lo_cents,
           count(*) AS n, min(cents) AS min_cents, max(cents) AS max_cents
         FROM b GROUP BY 1, 2 ORDER BY 1, 2""",
    // sqrt-temperature mix sampling: rate_g = sqrt(min_n / n_g); sqrt is
    // correctly rounded per IEEE 754, so the in-plan hex threshold is
    // bit-identical across engines (same keep mechanics as qd19).
    "qd31_temperature_mix" ->
      """WITH n AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
         m AS (SELECT min(n) AS mn FROM n),
         r AS (SELECT lang, sqrt(CAST(mn AS DOUBLE) / CAST(n AS DOUBLE))
             AS rate0
           FROM n CROSS JOIN m)
         SELECT d.doc_id, d.lang,
           floor(r.rate0 * 10000.0) / 10000.0 AS rate
         FROM documents d JOIN r USING (lang)
         WHERE substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) <
           printf('%08x', CAST(least(floor(r.rate0 * 4294967296.0),
             4294967295.0) AS BIGINT))
         ORDER BY d.doc_id""",
    // Deterministic 80/10/10 split: md5-hex regions [0,cccccccc),
    // [cccccccc,e6666666), [e6666666,∞) — thresholds are
    // floor(cum_weight * 2^32) in hex, exactly what
    // Sampling.splitAssign computes for (0.8, 0.1, 0.1).
    "qd32_split_assign" ->
      """SELECT doc_id,
           CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                  < 'cccccccc' THEN 'train'
                WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                  < 'e6666666' THEN 'val'
                ELSE 'test' END AS split
         FROM documents ORDER BY 1""",
    // Best-first under budget: per source take docs by (n_chars DESC,
    // doc_id) while running token cost stays <= 20000. Window sum is
    // CAST to BIGINT (DuckDB widens sum(BIGINT) to HUGEINT).
    "qd33_budget_select" ->
      """WITH s AS (SELECT source AS src, doc_id,
           CAST(n_chars AS BIGINT) AS score,
           CAST(len(regexp_extract_all(lower(text), '\S+')) AS BIGINT)
             AS cost
           FROM documents),
         c AS (SELECT *, CAST(sum(cost) OVER (PARTITION BY src
             ORDER BY score DESC, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_cost FROM s)
         SELECT src, doc_id, score, cost, cum_cost
         FROM c WHERE cum_cost <= 20000 ORDER BY 1, 5""",
    // Salted join is output-identical to the plain join — the oracle IS
    // the unsalted SQL.
    "q27_salted_join" ->
      """SELECT l_orderkey, l_linenumber, p_partkey, p_brand
         FROM lineitem JOIN part ON l_partkey = p_partkey
         ORDER BY 1, 2""",
    // Exact discrete quantiles: rank = max(1, ceil(p*n)) selection,
    // written out explicitly (row_number + count windows) so both
    // engines evaluate the identical IEEE ceil(p*n) — no reliance on
    // quantile_disc internals.
    "qv14_group_quantiles" ->
      """WITH e AS (SELECT event_type AS grp,
           CAST(floor(value * 100.0) AS BIGINT) AS v, event_id AS t
           FROM events),
         r AS (SELECT grp, v,
           row_number() OVER (PARTITION BY grp ORDER BY v, t) AS rn,
           count(*) OVER (PARTITION BY grp) AS n FROM e)
         SELECT grp, CAST(max(n) AS BIGINT) AS n,
           max(CASE WHEN rn = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))
             THEN v END) AS p50,
           max(CASE WHEN rn = greatest(1, CAST(ceil(0.9 * n) AS BIGINT))
             THEN v END) AS p90,
           max(CASE WHEN rn = greatest(1, CAST(ceil(0.99 * n) AS BIGINT))
             THEN v END) AS p99
         FROM r GROUP BY 1 ORDER BY 1""",
    // Portable shard id: md5-hex prefix as integer mod n — hex→int via
    // conv() in Spark, CAST('0x'||…) in DuckDB; 8 hex chars < 2^32 fit
    // BIGINT on both.
    "qd34_shard_balance" ->
      """SELECT CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
             AS BIGINT) % 16 AS shard,
           count(*) AS n_rows,
           CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_cost
         FROM documents GROUP BY 1 ORDER BY 1""",
    // Curriculum interleave: key = 0-based row-in-group * G + 0-based
    // group index; both engines derive the windows identically.
    "qd35_interleave" ->
      """WITH g AS (SELECT lang, row_number() OVER (ORDER BY lang) - 1
             AS gidx FROM (SELECT DISTINCT lang FROM documents)),
         n AS (SELECT count(*) AS ng FROM g),
         r AS (SELECT lang AS "group", doc_id,
           row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1
             AS rn FROM documents)
         SELECT r."group", r.doc_id,
           CAST(r.rn * n.ng + g.gidx AS BIGINT) AS interleave_key
         FROM r JOIN g ON r."group" = g.lang CROSS JOIN n
         ORDER BY 3""",
    // Markup strip mirrored as the same regex chain ('g' = replace-all,
    // Spark's default); entity decode order and ASCII classes match.
    "qd36_clean_profile" ->
      """WITH c AS (SELECT doc_id, trim(regexp_replace(
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             text, '<!--.*?-->', ' ', 'g'),
             '(?i)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
             '<[^>]+>', ' ', 'g'),
             '&amp;', '&', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'),
             '&quot;', '"', 'g'), '&apos;', '''', 'g'),
           '\s+', ' ', 'g')) AS clean
           FROM documents)
         SELECT d.doc_id, CAST(length(c.clean) AS BIGINT) AS clean_len,
           CAST(len(regexp_extract_all(d.text, '�')) AS BIGINT)
             AS n_replacement,
           CAST(len(regexp_extract_all(d.text,
             '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]')) AS BIGINT) AS n_control
         FROM documents d JOIN c ON d.doc_id = c.doc_id
         ORDER BY 1""",
    // NTILE is standard SQL: both engines give the first buckets the
    // remainder; ties broken by doc_id.
    "qd37_score_deciles" ->
      """SELECT lang AS grp, doc_id, CAST(n_chars AS BIGINT) AS v,
           ntile(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
             AS bucket
         FROM documents ORDER BY 1, 2""",
    // Exact z-score outlier test on integer window sums; squares are
    // explicit self-multiplies (see Events.spendOutliers).
    "qv15_spend_outliers" ->
      """WITH e AS (SELECT event_id, user_id,
           CAST(floor(value * 100.0) AS BIGINT) AS cents FROM events),
         w AS (SELECT *,
           CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
           CAST(sum(cents) OVER (PARTITION BY user_id) AS BIGINT) AS s,
           CAST(sum(cents * cents) OVER (PARTITION BY user_id) AS BIGINT)
             AS q FROM e)
         SELECT event_id, user_id, cents, n, s FROM w
         WHERE n > 1
           AND CAST(n * cents - s AS DOUBLE) * CAST(n * cents - s AS DOUBLE)
             > 9.0 * CAST(n * q - s * s AS DOUBLE)
         ORDER BY 1""",
    // Snapshot diff by content fingerprint: full-outer on id, status
    // from null-side / fingerprint comparison.
    "qd38_corpus_diff" ->
      """WITH o AS (SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
           FROM documents WHERE doc_id % 3 <> 0),
         n AS (SELECT doc_id, md5(trim(regexp_replace(lower(
             CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END),
             '\s+', ' ', 'g'))) AS fp
           FROM documents WHERE doc_id % 2 = 0)
         SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.fp = n.fp THEN 'same'
                ELSE 'changed' END AS status
         FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
         ORDER BY 1""",
    // Centroid drift on exact cross-scaled integer sums:
    // Σ_dim |sumA·nB − sumB·nA| per label, halves by vec_id parity.
    "qe13_centroid_drift" ->
      """WITH x AS (SELECT vec_id, label, unnest(embedding) AS x,
           CAST(unnest(range(len(embedding))) AS BIGINT) AS dim
           FROM embeddings),
         a AS (SELECT label, dim, CAST(count(*) AS BIGINT) AS n_a,
           CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 10000.0) AS BIGINT))
             AS BIGINT) AS sum_a
           FROM x WHERE vec_id % 2 = 0 GROUP BY 1, 2),
         b AS (SELECT label, dim, CAST(count(*) AS BIGINT) AS n_b,
           CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 10000.0) AS BIGINT))
             AS BIGINT) AS sum_b
           FROM x WHERE vec_id % 2 = 1 GROUP BY 1, 2)
         SELECT a.label, CAST(max(n_a) AS BIGINT) AS n_a,
           CAST(max(n_b) AS BIGINT) AS n_b,
           CAST(sum(abs(sum_a * n_b - sum_b * n_a)) AS BIGINT)
             AS drift_num
         FROM a JOIN b ON a.label = b.label AND a.dim = b.dim
         GROUP BY 1 ORDER BY 1""",
    // Composed curation v2 in one SQL: the qd36 clean chain, encoding +
    // length gate, exact dedup on the CLEANED text (min doc_id wins),
    // the qd32 split regions, per-split totals.
    "qd39_curated_splits" ->
      """WITH c AS (SELECT doc_id, trim(regexp_replace(
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             text, '<!--.*?-->', ' ', 'g'),
             '(?i)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
             '<[^>]+>', ' ', 'g'),
             '&amp;', '&', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'),
             '&quot;', '"', 'g'), '&apos;', '''', 'g'),
           '\s+', ' ', 'g')) AS clean
           FROM documents),
         g AS (SELECT c.doc_id, c.clean FROM c JOIN documents d
           ON c.doc_id = d.doc_id
           WHERE len(regexp_extract_all(d.text, '�')) = 0
             AND len(regexp_extract_all(d.text,
               '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]')) = 0
             AND length(c.clean) >= 50),
         k AS (SELECT min(doc_id) AS doc_id FROM g
           GROUP BY md5(trim(regexp_replace(lower(clean), '\s+', ' ', 'g')))),
         s AS (SELECT g.doc_id,
           CASE WHEN substring(md5(CAST(g.doc_id AS VARCHAR)), 1, 8)
                  < 'cccccccc' THEN 'train'
                WHEN substring(md5(CAST(g.doc_id AS VARCHAR)), 1, 8)
                  < 'e6666666' THEN 'val'
                ELSE 'test' END AS split,
           CAST(len(regexp_extract_all(lower(g.clean), '\S+')) AS BIGINT)
             AS toks
           FROM g JOIN k ON g.doc_id = k.doc_id)
         SELECT split, count(*) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS total_tokens
         FROM s GROUP BY 1 ORDER BY 1""",
    // The native AsOfJoinExec answers the SAME question as qv06 — the
    // oracle is the identical DuckDB ASOF JOIN.
    "qv16_asof_native" ->
      """WITH p AS (SELECT event_id, user_id, ts, epoch_us(ts) AS ts_us
           FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts, epoch_us(ts) AS click_ts_us,
           CAST(floor(value * 100.0) AS BIGINT) AS click_cents
           FROM events WHERE event_type = 'click')
         SELECT p.event_id, p.user_id, p.ts_us, c.click_ts_us,
           c.click_cents
         FROM p ASOF LEFT JOIN c
           ON p.user_id = c.user_id AND p.ts >= c.ts
         ORDER BY p.event_id""",
    // Grouped heavy hitters: per-language thresholds, same
    // sketch-candidates + exact-recount contract as qd40.
    "qd41_group_hh" ->
      """WITH t AS (SELECT lang,
           regexp_extract_all(lower(text), '\S+') AS ws FROM documents),
         g AS (SELECT lang, ws[CAST(i AS BIGINT)] || ' '
             || ws[CAST(i + 1 AS BIGINT)] || ' '
             || ws[CAST(i + 2 AS BIGINT)] AS g
           FROM t, unnest(range(1, len(ws) - 1)) AS r(i)),
         n AS (SELECT lang, CAST(count(*) AS BIGINT) AS total
           FROM g GROUP BY 1),
         c AS (SELECT lang, g, CAST(count(*) AS BIGINT) AS n
           FROM g GROUP BY 1, 2)
         SELECT c.lang, c.g, c.n FROM c JOIN n USING (lang)
         WHERE c.n * 2048 > n.total
         ORDER BY 1, 3 DESC, 2""",
    // Heavy hitters: the MG sketch only produces CANDIDATES; the final
    // set {g : freq·(m+1) > n} is exact, so plain SQL reproduces it.
    "qd40_heavy_hitters" ->
      """WITH t AS (SELECT regexp_extract_all(lower(text), '\S+') AS ws
           FROM documents),
         g AS (SELECT ws[CAST(i AS BIGINT)] || ' '
             || ws[CAST(i + 1 AS BIGINT)] || ' '
             || ws[CAST(i + 2 AS BIGINT)] AS g
           FROM t, unnest(range(1, len(ws) - 1)) AS r(i)),
         n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM g),
         c AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY 1)
         SELECT c.g, c.n FROM c CROSS JOIN n
         WHERE c.n * 4096 > n.total
         ORDER BY c.n DESC, c.g""",
    // Multi-query kNN join: brute-force cosine per (query, corpus) pair,
    // rank partitioned by query with the (cos DESC, vec_id) tiebreak.
    "qe12_knn_join" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
           FROM embeddings WHERE vec_id < 5),
         z AS (SELECT q.query_id, e.vec_id,
           CAST(unnest(e.embedding) AS DOUBLE) AS a,
           CAST(unnest(q.qe) AS DOUBLE) AS b
           FROM embeddings e CROSS JOIN q),
         s AS (SELECT query_id, vec_id,
           round(sum(a*b) / (sqrt(sum(a*a)) * sqrt(sum(b*b))), 4) AS cos
           FROM z GROUP BY 1, 2),
         r AS (SELECT query_id, vec_id, cos,
           CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY cos DESC, vec_id) AS BIGINT) AS rank FROM s)
         SELECT query_id, vec_id, cos, rank FROM r WHERE rank <= 5
         ORDER BY query_id, rank""",
    // Incremental exact dedup: odd-doc batch anti-joined against the
    // even-doc fingerprint index (same content md5 as qd03).
    "qd29_incremental_new" ->
      """WITH f AS (SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
           FROM documents),
         idx AS (SELECT fp FROM f WHERE doc_id % 2 = 0),
         b AS (SELECT doc_id, fp FROM f WHERE doc_id % 2 = 1)
         SELECT doc_id, fp FROM b ANTI JOIN idx USING (fp)
         ORDER BY doc_id""",
    // qd83: qd29's probe after tombstone-deleting the index's high
    // md5-nibble half — the live index is the surviving even docs
    // alone, so the batch anti-joins only their fingerprints.
    "qd83_exact_index_delete" ->
      """WITH f AS (SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
           FROM documents),
         idx AS (SELECT fp FROM f WHERE doc_id % 2 = 0
           AND substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'),
         b AS (SELECT doc_id, fp FROM f WHERE doc_id % 2 = 1)
         SELECT doc_id, fp FROM b ANTI JOIN idx USING (fp)
         ORDER BY doc_id""",
    // Incremental near-dup against the persisted MinHash index: md5
    // lanes (qd24 form), banded candidates batch-vs-index, similarity
    // estimated from lane agreement, est >= 0.5.
    "qd30_index_neardup" ->
      """WITH w AS (SELECT DISTINCT doc_id,
           unnest(list_distinct(regexp_extract_all(lower(text), '\S+')))
             AS w
           FROM documents),
         h AS (SELECT doc_id,
           md5('0:' || w) AS h0, md5('1:' || w) AS h1 FROM w),
         sig AS (SELECT doc_id,
           min(substring(h0, 1, 8)) AS l0,
           min(substring(h0, 9, 8)) AS l1,
           min(substring(h0, 17, 8)) AS l2,
           min(substring(h0, 25, 8)) AS l3,
           min(substring(h1, 1, 8)) AS l4,
           min(substring(h1, 9, 8)) AS l5,
           min(substring(h1, 17, 8)) AS l6,
           min(substring(h1, 25, 8)) AS l7
           FROM h GROUP BY 1),
         banded AS (
           SELECT doc_id, 0 AS band, md5(l0 || l1) AS bucket FROM sig
           UNION ALL SELECT doc_id, 1, md5(l2 || l3) FROM sig
           UNION ALL SELECT doc_id, 2, md5(l4 || l5) FROM sig
           UNION ALL SELECT doc_id, 3, md5(l6 || l7) FROM sig),
         cand AS (SELECT DISTINCT a.doc_id AS batch_doc,
             b.doc_id AS index_doc
           FROM banded a JOIN banded b
             ON a.band = b.band AND a.bucket = b.bucket
           WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0),
         est AS (SELECT batch_doc, index_doc,
             CAST(floor((
               (CASE WHEN sa.l0 = sb.l0 THEN 1 ELSE 0 END) +
               (CASE WHEN sa.l1 = sb.l1 THEN 1 ELSE 0 END) +
               (CASE WHEN sa.l2 = sb.l2 THEN 1 ELSE 0 END) +
               (CASE WHEN sa.l3 = sb.l3 THEN 1 ELSE 0 END) +
               (CASE WHEN sa.l4 = sb.l4 THEN 1 ELSE 0 END) +
               (CASE WHEN sa.l5 = sb.l5 THEN 1 ELSE 0 END) +
               (CASE WHEN sa.l6 = sb.l6 THEN 1 ELSE 0 END) +
               (CASE WHEN sa.l7 = sb.l7 THEN 1 ELSE 0 END))
               / 8.0 * 10000.0) AS BIGINT) AS est_e4
           FROM cand
           JOIN sig sa ON cand.batch_doc = sa.doc_id
           JOIN sig sb ON cand.index_doc = sb.doc_id)
         SELECT batch_doc, index_doc, est_e4 FROM est
         WHERE est_e4 >= 5000 ORDER BY batch_doc, index_doc""",
    "qe03_ann_lsh" -> annLshOracleSql,
    "qe04_ann_ivf" -> ivfOracleSql,
    // qe09 (in-memory ADC) and qe10 (persisted codes index) share one
    // oracle: the index path's stage-1 score differs from the in-memory
    // one only by a per-query CONSTANT (the Σ mn·qv offset folded out of
    // the literal weights), so the candidate ranking — and therefore the
    // final exact-reranked top-k — is identical in exact arithmetic.
    "qe09_quantized_topk" -> adcOracleSql,
    "qe10_quantized_index" -> adcOracleSql,
    "qe14_kmeans_clusters" -> kmeansOracleSql,
    "qe15_semantic_dedup" -> semanticDedupOracleSql,
    "qe16_cluster_sample" -> clusterSampleOracleSql,
    // qe23/qe25 share one oracle: the persisted-index path runs the
    // same two deterministic stages (sign-bit Hamming shortlist, exact
    // cosine rerank) off stored bits instead of an in-memory scan.
    "qe23_binary_topk" -> binaryTopKOracleSql,
    "qe25_binary_index" -> binaryTopKOracleSql,
    // qe26: per-query exact Hamming top-k over the packed sign bits
    // (ties to the lower id — topk_agg's contract), exact-cosine
    // rerank per query.
    "qe26_hamming_knn" ->
      """WITH el AS (SELECT vec_id,
           generate_subscripts(embedding, 1) AS d,
           CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
         bits AS (SELECT vec_id,
             CAST(sum(CASE WHEN d <= 32 AND x >= 0
               THEN CAST(1 AS BIGINT) << (d - 1) ELSE 0 END)
               AS BIGINT) AS lo,
             CAST(sum(CASE WHEN d > 32 AND d <= 64 AND x >= 0
               THEN CAST(1 AS BIGINT) << (d - 33) ELSE 0 END)
               AS BIGINT) AS hi
           FROM el GROUP BY 1),
         cand AS (SELECT q.vec_id AS query_id, c.vec_id,
             bit_count(xor(q.lo, c.lo)) + bit_count(xor(q.hi, c.hi))
               AS ham
           FROM bits q JOIN bits c ON q.vec_id < 5),
         short AS (SELECT query_id, vec_id FROM cand
           QUALIFY row_number() OVER (PARTITION BY query_id
             ORDER BY ham, vec_id) <= 5),
         z AS (SELECT s.query_id, s.vec_id,
             CAST(unnest(e1.embedding) AS DOUBLE) AS a,
             CAST(unnest(e2.embedding) AS DOUBLE) AS b
           FROM short s JOIN embeddings e1 ON s.vec_id = e1.vec_id
             JOIN embeddings e2 ON s.query_id = e2.vec_id),
         sc AS (SELECT query_id, vec_id, sum(a*b) AS ab,
             sum(a*a) AS aa, sum(b*b) AS bb FROM z GROUP BY 1, 2)
         SELECT query_id, vec_id,
           round(ab / (sqrt(aa) * sqrt(bb)), 4) AS cos,
           CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY round(ab / (sqrt(aa) * sqrt(bb)), 4) DESC, vec_id)
             AS BIGINT) AS rank
         FROM sc ORDER BY query_id, rank""",
    // qe24: the 16-dim-prefix cosine is the same ab/(|a||b|) fold over
    // d <= 16, shortlist of 50 by (prefix cos desc, id), then the
    // full-dimension exact rerank.
    "qe24_matryoshka_topk" ->
      """WITH el AS (SELECT vec_id,
           generate_subscripts(embedding, 1) AS d,
           CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
         pq AS (SELECT d, x FROM el WHERE vec_id = 0 AND d <= 16),
         ps AS (SELECT el.vec_id, sum(el.x * pq.x) AS ab,
             sum(el.x * el.x) AS aa, sum(pq.x * pq.x) AS bb
           FROM el JOIN pq ON el.d = pq.d
           WHERE el.d <= 16 GROUP BY 1),
         short AS (SELECT vec_id FROM ps
           QUALIFY row_number() OVER (ORDER BY
             round(ab / (sqrt(aa) * sqrt(bb)), 4) DESC, vec_id) <= 50),
         z AS (SELECT s.vec_id, CAST(unnest(e.embedding) AS DOUBLE) AS a,
             CAST(unnest((SELECT embedding FROM embeddings
               WHERE vec_id = 0)) AS DOUBLE) AS b
           FROM short s JOIN embeddings e ON s.vec_id = e.vec_id),
         sc AS (SELECT vec_id, sum(a*b) AS ab, sum(a*a) AS aa,
             sum(b*b) AS bb FROM z GROUP BY 1)
         SELECT vec_id, round(ab / (sqrt(aa) * sqrt(bb)), 4) AS cos,
           CAST(row_number() OVER (ORDER BY
             round(ab / (sqrt(aa) * sqrt(bb)), 4) DESC, vec_id)
             AS BIGINT) AS rank
         FROM sc QUALIFY rank <= 10 ORDER BY rank""",
    // qd62: the shared capped-pair cluster fixpoint plus the qd14
    // quality formula; canonical member = (quality desc, doc_id) row 1
    // per cluster.
    "qd62_cluster_canonical" -> (dupClustersCte + """,
       tk2 AS (SELECT doc_id, text,
           regexp_extract_all(lower(text), '\S+') AS toks FROM documents),
       q2 AS (SELECT doc_id,
           floor((0.4 * (CASE WHEN len(toks) = 0 THEN 0.0 ELSE
               CAST(len(list_filter(toks, t -> list_contains(
                 ['the','of','and','to','in','is','that','it','was','for'],
                 t))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) END)
             + 0.3 * (1.0 - CASE WHEN length(text) = 0 THEN 0.0 ELSE
               CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g'))
                 AS DOUBLE) / CAST(length(text) AS DOUBLE) END)
             + 0.3 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0))
             * 10000.0) / 10000.0 AS quality
           FROM tk2),
       mem AS (SELECT cl.doc_id, cl.cluster, q2.quality
         FROM cl JOIN q2 USING (doc_id)),
       canon AS (SELECT cluster, doc_id AS canonical_id,
           quality AS canonical_score FROM
         (SELECT *, row_number() OVER (PARTITION BY cluster
             ORDER BY quality DESC, doc_id) AS rn FROM mem)
         WHERE rn = 1)
       SELECT m.doc_id, m.cluster, c.canonical_id, c.canonical_score
       FROM mem m JOIN canon c USING (cluster) ORDER BY m.doc_id"""),
    // qd64: per-family size/span profile over the same cluster fixpoint
    // — the probe-side check of the persisted cluster map.
    "qd64_cluster_map" -> (dupClustersCte + """
       SELECT cluster, count(*) AS n_docs,
         CAST(max(doc_id) AS BIGINT) AS max_id
       FROM cl GROUP BY 1 ORDER BY 1"""),
    // qd63: per-source chars per BPE(2-merge) token off the shared BPE
    // state — zero-token docs join away on both sides.
    "qd63_bpe_fertility" -> (bpeBaseCtes + """,
         wl AS (SELECT word, count(*) AS n_syms FROM s2 GROUP BY 1),
         dw AS (SELECT doc_id, source, n_chars,
           unnest(regexp_extract_all(lower(text), '\S+')) AS word
           FROM documents),
         pd AS (SELECT doc_id, source, n_chars, sum(wl.n_syms) AS n_bpe
           FROM dw JOIN wl USING (word) GROUP BY 1, 2, 3)
         SELECT source, CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(n_bpe) AS BIGINT) AS total_bpe_tokens,
           floor(CAST(sum(n_chars) AS DOUBLE)
             / CAST(sum(n_bpe) AS DOUBLE) * 10000.0) / 10000.0
             AS chars_per_token
         FROM pd GROUP BY 1 ORDER BY 1"""),
    "qd65_hll_distinct" -> hllOracleSql,
    // qd68: register max-merge is associative, so the merged-partials
    // result is byte-identical to the direct derivation — one oracle.
    "qd68_hll_merge" -> hllOracleSql,
    "qd66_cms_freq" -> cmsOracleSql,
    // qd69: CMS counters SUM-merge associatively, so the merged-partials
    // result equals the direct sketch — one oracle.
    "qd69_cms_merge" -> cmsOracleSql,
    // qd73/qd74: the PERSISTED sketch store (write + append + merged
    // read) produces exactly the union sketch — register max / counter
    // sum merges are associative — so the direct-derivation oracles
    // apply verbatim to the store round-trip.
    "qd73_hll_store" -> hllOracleSql,
    "qd74_cms_store" -> cmsOracleSql,
    // qd77/qd78/qd79: the log-bucket histogram quantile sketch — the
    // direct sketch, the per-half sum-merge, and the persisted store
    // round-trip are counter-identical (sums are associative), so ONE
    // oracle covers all three.
    "qd77_hist_quantiles" -> histOracleSql,
    "qd78_hist_merge" -> histOracleSql,
    "qd79_hist_store" -> histOracleSql,
    // qd80/qe28: quality-evaluation queries — recall of the sketch /
    // ANN paths against their exact truths, every side its own pinned
    // derivation composed as a subquery.
    "qd80_minhash_recall" -> minhashRecallOracleSql,
    "qe28_ann_recall" -> annRecallOracleSql,
    // qe29/qe30: the improve + re-measure half of the evaluation loop —
    // Lloyd-trained IVF cells, then its recall against the same truth.
    "qe29_ann_ivf_trained" -> ivfTrainedOracleSql,
    "qe30_ann_recall_trained" -> annRecallTrainedOracleSql,
    // qe31/qe32: the loop's conclusion — the measured recall-vs-scan
    // curve for cell probing, and the two-stage int8 rerank operating
    // point that actually reaches >= 0.9 on isotropic embeddings.
    "qe31_ann_probe_sweep" -> annProbeSweepOracleSql,
    "qe32_ann_rerank_recall" -> annRerankRecallOracleSql,
    // qe33/qe34: the trained centroids reach the PERSISTED index — the
    // stored assignment pinned per cell, and the stored-artifact probe
    // recall identical to qe30's in-memory derivation (same oracle).
    "qe33_ivf_index_trained_build" -> ivfTrainedIndexBuildOracleSql,
    "qe34_ivf_index_trained_recall" -> annRecallTrainedOracleSql,
    // qd71: the stored exact-fingerprint index IS the even-doc content
    // fingerprints (qd29's `f`/`idx` CTEs, read back from parquet).
    "qd71_exact_index_build" ->
      """SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
         FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    // qd72: the stored MinHash lane table IS the even-doc portable
    // 8-lane signatures (qd30's `sig` CTE with the hex slices cast to
    // their unsigned-32 values — fixed-width lowercase hex, so the
    // string min and the numeric min agree).
    "qd72_minhash_index_build" ->
      """WITH w AS (SELECT DISTINCT doc_id,
           unnest(list_distinct(regexp_extract_all(lower(text), '\S+')))
             AS w
           FROM documents WHERE doc_id % 2 = 0),
         h AS (SELECT doc_id,
           md5('0:' || w) AS h0, md5('1:' || w) AS h1 FROM w)
         SELECT doc_id,
           CAST('0x' || min(substring(h0, 1, 8)) AS BIGINT) AS l0,
           CAST('0x' || min(substring(h0, 9, 8)) AS BIGINT) AS l1,
           CAST('0x' || min(substring(h0, 17, 8)) AS BIGINT) AS l2,
           CAST('0x' || min(substring(h0, 25, 8)) AS BIGINT) AS l3,
           CAST('0x' || min(substring(h1, 1, 8)) AS BIGINT) AS l4,
           CAST('0x' || min(substring(h1, 9, 8)) AS BIGINT) AS l5,
           CAST('0x' || min(substring(h1, 17, 8)) AS BIGINT) AS l6,
           CAST('0x' || min(substring(h1, 25, 8)) AS BIGINT) AS l7
         FROM h GROUP BY 1 ORDER BY doc_id""",
    // qd75: the stored postings/stats profile — doc count, 4-decimal
    // avgdl, (term, doc) posting cardinality, distinct-term count.
    "qd75_bm25_index_build" ->
      """WITH t AS (SELECT doc_id,
           regexp_extract_all(lower(text), '\S+') AS ws FROM documents),
         p AS (SELECT doc_id, unnest(ws) AS term FROM t),
         pc AS (SELECT term, doc_id FROM p GROUP BY 1, 2)
         SELECT (SELECT CAST(count(*) AS BIGINT) FROM t) AS n_docs,
           (SELECT round(avg(CAST(len(ws) AS DOUBLE)), 4) FROM t)
             AS avgdl_r4,
           CAST(count(*) AS BIGINT) AS n_postings,
           CAST(count(DISTINCT term) AS BIGINT) AS n_terms
         FROM pc""",
    "qd76_bm25_index_topk" -> (bm25IndexedCtes + """
         SELECT doc_id, score_e4 FROM isc
         ORDER BY score_e4 DESC, doc_id LIMIT 10"""),
    // qd87: attribute-filtered BM25 — candidates restricted to the
    // stored flag's arithmetic (doc_id % 2 = 0), idf GLOBAL: the
    // unfiltered per-doc score set re-cut over allowed docs.
    "qd87_bm25_filtered_topk" -> (bm25IndexedCtes + """
         SELECT doc_id, score_e4 FROM isc WHERE doc_id % 2 = 0
         ORDER BY score_e4 DESC, doc_id LIMIT 10"""),
    // qd88: the SAME truth as qd87, served from a store that was
    // built WITHOUT attributes and upgraded by the backfill-at-compact
    // path — an upgraded store must be indistinguishable from a
    // born-with-attrs one at the probe surface.
    "qd88_bm25_backfilled_topk" -> (bm25IndexedCtes + """
         SELECT doc_id, score_e4 FROM isc WHERE doc_id % 2 = 0
         ORDER BY score_e4 DESC, doc_id LIMIT 10"""),
    // qd81: the appended index probes byte-identically to a fresh
    // whole-corpus build (same posting rows, associative stats sums),
    // so qd76's whole-corpus oracle applies verbatim.
    "qd81_bm25_index_append" -> (bm25IndexedCtes + """
         SELECT doc_id, score_e4 FROM isc
         ORDER BY score_e4 DESC, doc_id LIMIT 10"""),
    // qd82: the tombstone-deleted index probes exactly like an index
    // built from the surviving md5-nibble half alone — same CTEs over
    // the filtered corpus (stats subtract via the negative partial, df
    // derives from the anti-joined posting rows).
    "qd82_bm25_index_delete" -> (bm25IndexedCtes(
      "WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'") + """
         SELECT doc_id, score_e4 FROM isc
         ORDER BY score_e4 DESC, doc_id LIMIT 10"""),
    // qe35/qe36: IVF-PQ — trained cells (qe29's Lloyd CTEs) + residual
    // product quantization on the 1e-6 integer grid, exact-integer ADC
    // over the probed cells. qe36 serves the same result from the
    // PERSISTED index, so the oracle applies verbatim.
    "qe35_ivfpq_adc" -> ivfPqAdcOracleSql,
    "qe36_ivfpq_index" -> ivfPqAdcOracleSql,
    // qe37: the persisted IVF-PQ two-stage probe's recall@10 over the
    // 100-query batch (nProbe 8, 100-candidate exact rerank).
    "qe37_ivfpq_recall" -> ivfPqRecallOracleSql,
    // qd84: exact-phrase search over the positional index — the oracle
    // re-derives token positions from the text and intersects the
    // shifted position sets exactly as the stored probe does.
    "qd84_phrase_search" -> phraseSearchOracleSql,
    // qd85: the MULTI-query BM25 probe (20 queries, one partition-
    // pruned probe, per-query top-5) re-derived over the corpus.
    "qd85_bm25_batch_topk" -> bm25BatchOracleSql,
    // qe38: per-query RRF of the batch BM25 top-50 and the trained-IVF
    // top-50 over the same 20 query ids — both halves served from
    // persisted indexes on the Spark side.
    "qe38_hybrid_rrf_batch" -> hybridRrfBatchOracleSql,
    // qe39: the IVF-PQ operating-point grid — recall@10 at
    // {8x16, 16x64 codes} x {rerank 25, 50, 100}, nProbe 8; pins the
    // measurement that justifies qe37's 16x64@100 operating point.
    "qe39_ivfpq_grid" -> ivfPqGridOracleSql,
    // qd86: the MULTI-query phrase probe (10 trigram phrases, one
    // pruned positions scan, per-query top-5) re-derived by shifting
    // every phrase's token positions over the corpus.
    "qd86_phrase_batch" -> phraseBatchOracleSql,
    // qe40: per-query RRF of the batch BM25 top-50 and the IVF-PQ
    // TWO-STAGE top-50 (16x64 codes, nProbe 8, rerank 100 — the best
    // persisted probe per qe39's grid) over the same 20 query ids.
    "qe40_hybrid_rrf_pq" -> hybridRrfPqOracleSql,
    // qe45: attribute-filtered serving on the best probe — the qe37
    // IVF-PQ two-stage restricted to lang = 1 (a STORED index
    // attribute pruned in the stage-1 codes scan), recall vs the
    // filtered brute-force truth.
    "qe45_ivfpq_filtered_recall" -> ivfPqFilteredRecallOracleSql(4),
    // qe47: the same filtered probe at 1/16 selectivity — the
    // shortlist-starvation point of filter-during-scan ANN, measured.
    "qe47_ivfpq_selective_recall" -> ivfPqFilteredRecallOracleSql(16),
    // qe46: the LSH recall-vs-partitions-touched grid at probeFlips
    // {0, 1, 2} from the persisted 6-plane index — the ladder's LSH
    // point gets its curve (the qe39 discipline for the bucketed
    // family).
    "qe46_lsh_operating_grid" -> lshOperatingGridOracleSql,
    // qe48/qe49/qe50: the filtered ladder across the remaining index
    // families at 1/4 selectivity — int8 (global stats, filtered
    // candidates), binary (signatures by id, filtered Hamming scan),
    // LSH (unchanged bucket geometry, filtered candidate pool).
    "qe48_int8_filtered_recall" -> quantizedFilteredRecallOracleSql,
    "qe49_binary_filtered_recall" -> binaryFilteredRecallOracleSql,
    "qe50_lsh_filtered_recall" -> lshFilteredRecallOracleSql,
    // qe51: the filtered hybrid fusion — the qe40 re-derivation with
    // each half's candidate set cut to EVEN ids before its rank (the
    // lexical `flag = 0` / vector `lang IN (0, 2)` attributes both
    // mean id % 2 = 0), fusing filtered lists — never filtering the
    // fused list.
    "qe51_hybrid_rrf_filtered" -> hybridRrfPqOracleSqlWith(
      lexWhere = "WHERE doc_id % 2 = 0",
      vecWhere = "WHERE c.vec_id % 2 = 0"),
    // qe52: the multi-table LSH grid — 24 literal planes re-derive
    // every (vector, table) bucket and every query's per-table probe
    // set; candidates are DISTINCT (level, query, vec) over the union
    // of probed tables, per-(level, query) top-10 by exact cosine,
    // then the standard recall row per level.
    "qe52_lsh_multitable_grid" -> lshMultiTableGridOracleSql,
    // qe53: the multi-table probe at L=4 with candidates (and truth)
    // restricted to vec_id % 4 = 1 — qe50's filtered measurement on
    // the L axis: geometry unchanged, candidate pool filtered inside
    // the probed (table, bucket) union, a vector reachable through
    // several tables counted once.
    "qe53_lsh_multitable_filtered" -> lshMultiFilteredRecallOracleSql,
    // qe54: retrain-at-compact — BOTH phases' models re-derived
    // end-to-end: the build chain trains (md5 'ivf:' sample + 2
    // 1e-6-rounded Lloyd rounds) on the natural half only, the
    // retrain chain on the full drifted union (exactly what the
    // stored vectors are), each phase assigns the union under its own
    // centroids, probes 4 cells per drifted query, and reports the
    // recall row + the average probed-candidate count.
    "qe54_ivf_retrain_recall" -> ivfRetrainRecallOracleSql,
    // qe55: the drift fixture through the IVF-PQ serving path — both
    // phases' centroids, residual codebooks, codes, per-query ADC
    // shortlists and exact reranks re-derived end-to-end; decay and
    // recovery at the 16×64 / rerank-100 operating point.
    "qe55_ivfpq_retrain_recall" -> ivfPqRetrainRecallOracleSql,
    // qe56: the label-free drift monitor — trained centroids
    // re-derived (b-chain on the natural half), per-vector spherical
    // quantization error 1 - max dot as 1e-6-floored exact integers,
    // control vs drifted batch against the stored corpus's own error.
    "qe56_ivf_drift_monitor" -> ivfDriftMonitorOracleSql,
    // qe57: the composed arrival loop — sign-block gate, live-corpus
    // monitor sums (re-checking the folded sidecar), the same > 1.1
    // retrain conditional, and the post-retrain ADC + rerank recall,
    // all one closed-form derivation.
    "qe57_vector_arrival_loop" -> vectorArrivalLoopOracleSql,
    // qe58: the keepVectors plain-PQ lifecycle — both md5-sampled
    // codebooks, both full-union exact-integer encodes + ADC
    // rankings, brute cosine truth, and both monitor ratios
    // (arrival-time trigger, post-retrain quiesce) re-derived in
    // closed form
    "qe58_pq_retrain_recall" -> pqRetrainRecallOracleSql,
    // qm01: multimodal decode — Spark synthesizes REAL container bytes
    // per doc id and decodes them with the real parsers; the oracle
    // re-derives every field from the same integer arithmetic, so the
    // byte walks are cross-checked end-to-end.
    "qm01_media_decode" -> mediaDecodeOracleSql,
    // qm02: aspect-preserving resize targets computed from the DECODED
    // dimensions; the oracle applies the same double arithmetic to the
    // media truth, cross-checking decode + plan together.
    "qm02_media_resize_plan" -> mediaResizeOracleSql,
    // qm03: frame-sampling plan (every 250th index below the decoded
    // frame count) as a generator over the decode output.
    "qm03_media_frame_sample" -> mediaFrameSampleOracleSql,
    // qm04/qm05: pixel-level image content — the oracle re-derives
    // every 8×8 BMP pixel, the integer mean-threshold aHash (split
    // into two unsigned 32-bit halves so no engine's BIGINT
    // arithmetic touches bit 63), and qm05's pairs by BRUTE Hamming
    // over those hashes — the Spark side decodes REAL bytes through
    // ImageIO and bands; wrong pixels, bits, or banding all surface
    // as hash mismatches.
    "qm04_image_ahash" -> (imageAHashCtes +
      " SELECT media_id, ahash_lo, ahash_hi FROM hb ORDER BY media_id"),
    "qm05_image_neardup" -> (imageAHashCtes + """
       SELECT media_a, media_b, hamming FROM (
         SELECT a.media_id AS media_a, b.media_id AS media_b,
           CAST(bit_count(xor(a.ahash_lo, b.ahash_lo))
             + bit_count(xor(a.ahash_hi, b.ahash_hi)) AS BIGINT)
             AS hamming
         FROM hb a JOIN hb b ON a.media_id < b.media_id) z
       WHERE hamming <= 10 ORDER BY media_a, media_b"""),
    // qm06/qm07: sample-level audio content — the oracle re-derives
    // every 16-bit PCM frame, the 64 window energies, and the
    // circular difference-hash (split into two unsigned 32-bit
    // halves); the Spark side writes REAL WAVs and decodes them back
    // through javax.sound, so a wrong byte order, sign convention,
    // header offset, or window split in either direction breaks the
    // hash match. qm07's pairs by BRUTE Hamming over those hashes
    // cross-check the banded near-dup join.
    "qm06_audio_fingerprint" -> (audioFpCtes +
      " SELECT media_id, fp_lo, fp_hi FROM fb ORDER BY media_id"),
    "qm07_audio_neardup" -> (audioFpCtes + """
       SELECT media_a, media_b, hamming FROM (
         SELECT a.media_id AS media_a, b.media_id AS media_b,
           CAST(bit_count(xor(a.fp_lo, b.fp_lo))
             + bit_count(xor(a.fp_hi, b.fp_hi)) AS BIGINT)
             AS hamming
         FROM fb a JOIN fb b ON a.media_id < b.media_id) z
       WHERE hamming <= 10 ORDER BY media_a, media_b"""),
    // qm08: the incremental image near-dup against the PERSISTED
    // fingerprint store — the oracle is brute-force odd-vs-even
    // Hamming over the same arithmetic-derived hashes (the banded
    // store probe is exact at the radius, so the sets must match
    // row-for-row).
    "qm08_image_fp_index" -> (imageAHashCtes + """
       SELECT batch_media, index_media, hamming FROM (
         SELECT a.media_id AS batch_media, b.media_id AS index_media,
           CAST(bit_count(xor(a.ahash_lo, b.ahash_lo))
             + bit_count(xor(a.ahash_hi, b.ahash_hi)) AS BIGINT)
             AS hamming
         FROM hb a JOIN hb b
           ON a.media_id % 2 = 1 AND b.media_id % 2 = 0) z
       WHERE hamming <= 10 ORDER BY batch_media, index_media"""),
    // qm12: ranked top-3 per arrival off the SAME store — brute-force
    // Hamming cut at the radius, ranked (hamming asc, media asc);
    // pages under-fill naturally where < 3 partners sit inside the
    // radius.
    "qm12_image_fp_topk" -> (imageAHashCtes + """
       SELECT batch_media, index_media, hamming,
         CAST(row_number() OVER (PARTITION BY batch_media
           ORDER BY hamming, index_media) AS BIGINT) AS rank
       FROM (
         SELECT a.media_id AS batch_media, b.media_id AS index_media,
           CAST(bit_count(xor(a.ahash_lo, b.ahash_lo))
             + bit_count(xor(a.ahash_hi, b.ahash_hi)) AS BIGINT)
             AS hamming
         FROM hb a JOIN hb b
           ON a.media_id % 2 = 1 AND b.media_id % 2 = 0) z
       WHERE hamming <= 10
       QUALIFY rank <= 3 ORDER BY batch_media, rank"""),
    // qm13: every frame's aHash re-derived pixel-by-pixel from the
    // vidGrayAt arithmetic — the qm04 discipline along the time axis;
    // a wrong chunk offset, row direction, or frame order in the AVI
    // writer OR the RIFF walk breaks the hash match.
    "qm13_video_frame_hash" -> (videoFpCtes + """
       SELECT media_id, CAST(f AS BIGINT) AS frame_idx,
         fh_lo, fh_hi
       FROM vhb ORDER BY media_id, frame_idx"""),
    // qm14: the persisted fingerprint store serving VIDEO — odd-media
    // temporal fingerprints vs the stored even-media corpus; brute
    // force over the re-derived byte-sampled signatures (banding
    // geometry provably doesn't leak into results).
    "qm14_video_fp_index" -> (videoFpCtes + """
       SELECT batch_media, index_media, hamming FROM (
         SELECT a.media_id AS batch_media, b.media_id AS index_media,
           CAST(bit_count(xor(a.tfp_lo, b.tfp_lo))
             + bit_count(xor(a.tfp_hi, b.tfp_hi)) AS BIGINT)
             AS hamming
         FROM vfp a JOIN vfp b
           ON a.media_id % 2 = 1 AND b.media_id % 2 = 0) z
       WHERE hamming <= 10 ORDER BY batch_media, index_media"""),
    // qm15: the composed arrival loop must land on the full-rebuild
    // fixpoint — base map on even-even pairs, arrival probed against
    // the store + paired internally + merged; the truth is the
    // recursive closure over ALL brute radius-10 pairs of the corpus.
    "qm15_media_arrival_loop" -> (imageAHashCtes
      .replaceFirst("WITH ", "WITH RECURSIVE ") + """,
       mp AS (SELECT a.media_id AS doc_a, b.media_id AS doc_b
         FROM hb a JOIN hb b ON a.media_id < b.media_id
         WHERE bit_count(xor(a.ahash_lo, b.ahash_lo))
             + bit_count(xor(a.ahash_hi, b.ahash_hi)) <= 10),
       e AS (SELECT doc_a AS a, doc_b AS b FROM mp
         UNION SELECT doc_b, doc_a FROM mp),
       cc(a, b) AS (SELECT a, b FROM e
         UNION SELECT cc.a, e.b FROM cc JOIN e ON cc.b = e.a),
       cl AS (SELECT a AS media_id, least(a, min(b)) AS cluster
         FROM cc GROUP BY a)
       SELECT media_id, cluster FROM cl ORDER BY media_id"""),
    // qm09: the filtered twin — the stored side cut to flag = 0
    // (media_id % 4 = 0) BEFORE verification, exactly what the pushed
    // attr predicate does inside the pruned band scan.
    "qm09_image_fp_filtered" -> (imageAHashCtes + """
       SELECT batch_media, index_media, hamming FROM (
         SELECT a.media_id AS batch_media, b.media_id AS index_media,
           CAST(bit_count(xor(a.ahash_lo, b.ahash_lo))
             + bit_count(xor(a.ahash_hi, b.ahash_hi)) AS BIGINT)
             AS hamming
         FROM hb a JOIN hb b
           ON a.media_id % 2 = 1 AND b.media_id % 4 = 0) z
       WHERE hamming <= 10 ORDER BY batch_media, index_media"""),
    // qm10: cross-modal consensus — both fingerprint chains re-derived
    // (pixels → aHash, samples → window dHash) and the pair sets
    // intersected by brute force: a pair survives iff BOTH modalities
    // put it within radius 10.
    "qm10_crossmodal_neardup" -> (imageAHashCtes + ",\n       " +
      audioFpCtesBody + ",\n       " + videoFpCtesBody + """
       SELECT media_a, media_b, image_hamming, audio_hamming,
         video_hamming FROM (
         SELECT a.media_id AS media_a, b.media_id AS media_b,
           CAST(bit_count(xor(a.ahash_lo, b.ahash_lo))
             + bit_count(xor(a.ahash_hi, b.ahash_hi)) AS BIGINT)
             AS image_hamming,
           CAST(bit_count(xor(fa.fp_lo, f2.fp_lo))
             + bit_count(xor(fa.fp_hi, f2.fp_hi)) AS BIGINT)
             AS audio_hamming,
           CAST(bit_count(xor(va.tfp_lo, v2.tfp_lo))
             + bit_count(xor(va.tfp_hi, v2.tfp_hi)) AS BIGINT)
             AS video_hamming
         FROM hb a JOIN hb b ON a.media_id < b.media_id
         JOIN fb fa ON fa.media_id = a.media_id
         JOIN fb f2 ON f2.media_id = b.media_id
         JOIN vfp va ON va.media_id = a.media_id
         JOIN vfp v2 ON v2.media_id = b.media_id) z
       WHERE image_hamming <= 10 AND audio_hamming <= 10
         AND video_hamming <= 10
       ORDER BY media_a, media_b"""),
    // qm11: transitive closure over the consensus pairs (the qd13
    // recursive-CTE discipline) — cluster = least member id of the
    // connected component, docs in at least one pair.
    "qm11_crossmodal_clusters" -> (imageAHashCtes
      .replaceFirst("WITH ", "WITH RECURSIVE ") + ",\n       " +
      audioFpCtesBody + ",\n       " + videoFpCtesBody + """,
       mp AS (SELECT a.media_id AS doc_a, b.media_id AS doc_b
         FROM hb a JOIN hb b ON a.media_id < b.media_id
         JOIN fb fa ON fa.media_id = a.media_id
         JOIN fb f2 ON f2.media_id = b.media_id
         JOIN vfp va ON va.media_id = a.media_id
         JOIN vfp v2 ON v2.media_id = b.media_id
         WHERE bit_count(xor(a.ahash_lo, b.ahash_lo))
             + bit_count(xor(a.ahash_hi, b.ahash_hi)) <= 10
           AND bit_count(xor(fa.fp_lo, f2.fp_lo))
             + bit_count(xor(fa.fp_hi, f2.fp_hi)) <= 10
           AND bit_count(xor(va.tfp_lo, v2.tfp_lo))
             + bit_count(xor(va.tfp_hi, v2.tfp_hi)) <= 10),
       e AS (SELECT doc_a AS a, doc_b AS b FROM mp
         UNION SELECT doc_b, doc_a FROM mp),
       cc(a, b) AS (SELECT a, b FROM e
         UNION SELECT cc.a, e.b FROM cc JOIN e ON cc.b = e.a),
       cl AS (SELECT a AS media_id, least(a, min(b)) AS cluster
         FROM cc GROUP BY a)
       SELECT media_id, cluster FROM cl ORDER BY media_id"""),
    // qe41: recall@10 of the multi-query persisted-LSH probe (7 of 64
    // buckets per query) — the batch-serving shape for the bucketed
    // family, quality-measured like qe34/qe37.
    "qe41_lsh_index_recall" -> lshIndexRecallOracleSql,
    // qe42: recall@10 of the multi-query int8 two-stage probe (exact-
    // integer stage-1 scores, 50-candidate exact rerank) — the batch
    // shape for the compressed-scan family.
    "qe42_quantized_batch_recall" -> quantizedBatchRecallOracleSql,
    // qe43: recall@10 of the multi-query binary two-stage probe
    // (Hamming stage-1 over packed sign bits, exact rerank).
    "qe43_binary_batch_recall" -> binaryBatchRecallOracleSql,
    // qe44: multi-query PQ ADC top-10 — one codes scan serves the
    // 20-query batch; exact-integer distance tables make the per-query
    // rankings hash-exact.
    "qe44_pq_batch_adc" -> pqBatchAdcOracleSql,
    // qd70: three HLL estimate derivations (even docs, odd docs, all
    // docs — element-wise register max of the halves IS the union's
    // sketch) + inclusion–exclusion on the rounded estimates, generated
    // from one parameterized CTE chain.
    "qd70_hll_overlap" -> {
      val nib = "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), " +
        "1, 1) AS INT)"
      val ctes = Seq(
        hllEstCtes("a", s"WHERE $nib < 8"),
        hllEstCtes("b", s"WHERE $nib >= 8"),
        hllEstCtes("u", "")).mkString(",\n         ")
      s"""WITH $ctes
         SELECT a.source, a.est AS est_a, b.est AS est_b,
           u.est AS est_union,
           round(a.est + b.est - u.est, 4) AS est_inter
         FROM a JOIN b USING (source) JOIN u USING (source)
         ORDER BY source"""
    },
    "qd67_bm25_topk" -> (bm25Ctes + """
         SELECT doc_id, score,
           CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
             AS rank
         FROM sc QUALIFY rank <= 10 ORDER BY rank"""),
    // qe27: reciprocal-rank fusion of the INDEXED BM25 top-50 (shared
    // CTEs with qd76 — the lexical list is served from the persisted
    // postings index, so only term-matched docs rank) and the qe01-style
    // brute-force cosine top-50, k=60, on doc_id = vec_id.
    // qe27: both fusion halves serve from PERSISTED indexes — the
    // lexical list from the postings index, the vector list from the
    // stored int8 codes via qe09/qe10's two-stage decode chain
    // (stage-1 affine-decoded ranking, 50-candidate exact rerank).
    "qe27_hybrid_rrf" -> (bm25IndexedCtes + """,
         lex AS (SELECT doc_id AS id,
           CAST(row_number() OVER (ORDER BY score_e4 DESC, doc_id)
             AS BIGINT) AS rank_lex
           FROM isc QUALIFY rank_lex <= 50),
         vraw AS (SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS rv
           FROM embeddings),
         ve AS (SELECT vec_id,
           list_transform(rv, x -> x / sqrt(list_dot_product(rv, rv))) AS v
           FROM vraw),
         vex AS (SELECT vec_id, unnest(range(64)) AS dim,
             floor(unnest(v) * 10000.0) AS x_e4 FROM ve),
         vstats AS (SELECT dim, min(x_e4) AS mn, max(x_e4) AS mx
           FROM vex GROUP BY 1),
         vqv AS (SELECT unnest(range(64)) AS dim, unnest(v) AS qx
           FROM ve WHERE vec_id = 0),
         vdec AS (SELECT vex.vec_id, vex.dim,
             (s.mn + (CASE WHEN s.mx = s.mn THEN 0.0
               ELSE least(floor((vex.x_e4 - s.mn) * 255
                 / CAST(s.mx - s.mn AS DOUBLE)), 255.0) END)
               * (s.mx - s.mn) / 255.0) / 10000.0 AS c
           FROM vex JOIN vstats s USING (dim)),
         vasc AS (SELECT d.vec_id, sum(d.c * q.qx) AS ascore
           FROM vdec d JOIN vqv q USING (dim) GROUP BY 1),
         vcand AS (SELECT vec_id FROM vasc ORDER BY ascore DESC, vec_id
           LIMIT 50),
         vz AS (SELECT ve.vec_id, unnest(ve.v) AS a,
             unnest((SELECT v FROM ve WHERE vec_id = 0)) AS b2
           FROM ve JOIN vcand USING (vec_id)),
         vs2 AS (SELECT vec_id, sum(a*b2) AS ab FROM vz GROUP BY 1),
         vec AS (SELECT vec_id AS id,
           CAST(row_number() OVER (ORDER BY round(ab, 4) DESC, vec_id)
             AS BIGINT) AS rank_vec
           FROM vs2 QUALIFY rank_vec <= 50),
         f AS (SELECT coalesce(lex.id, vec.id) AS id, rank_lex, rank_vec,
           round(coalesce(1.0 / (60.0 + rank_lex), 0.0)
             + coalesce(1.0 / (60.0 + rank_vec), 0.0), 6) AS rrf
           FROM lex FULL OUTER JOIN vec ON lex.id = vec.id)
         SELECT id, rank_lex, rank_vec, rrf,
           CAST(row_number() OVER (ORDER BY rrf DESC, id) AS BIGINT) AS rank
         FROM f QUALIFY rank <= 10 ORDER BY rank"""),
    // qv21: the 12-bit Morton interleave re-derived term by term — pure
    // integer shifts/masks, generated from the same `bits` the Spark
    // side uses.
    "qv21_zorder_codes" -> {
      val bits = 12
      val terms = (0 until bits).flatMap { i =>
        Seq(s"((((user_id % 4096) >> $i) & 1) << ${2 * i})",
          s"((((event_id % 4096) >> $i) & 1) << ${2 * i + 1})")
      }.mkString("\n           | ")
      s"""SELECT event_id, user_id,
           CAST($terms AS BIGINT) AS zval
         FROM events
         ORDER BY zval DESC, event_id LIMIT 20"""
    },
  )

  /** Shared oracle for qd04 (exact capped n-gram Jaccard pairs) — also
    * the TRUTH side of the qd80 recall evaluation. */
  private lazy val ngramJaccardOracleSql: String =
    """WITH words AS (SELECT DISTINCT doc_id, source,
         unnest(regexp_extract_all(lower(text), '\S+')) AS w FROM documents),
       sizes AS (SELECT doc_id, count(*) AS n FROM words GROUP BY 1),
       hot AS (SELECT source, w FROM words GROUP BY 1, 2
         HAVING count(*) > 256),
       posting AS (SELECT words.* FROM words
         LEFT JOIN hot ON words.source = hot.source AND words.w = hot.w
         WHERE hot.w IS NULL),
       c AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS nab
         FROM posting a JOIN posting b
           ON a.w = b.w AND a.source = b.source AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
       SELECT doc_a, doc_b,
         floor(CAST(nab AS DOUBLE)
           / CAST(sa.n + sb.n - nab AS DOUBLE) * 10000.0) / 10000.0
           AS jaccard
       FROM c JOIN sizes sa ON c.doc_a = sa.doc_id
              JOIN sizes sb ON c.doc_b = sb.doc_id
       WHERE floor(CAST(nab AS DOUBLE)
           / CAST(sa.n + sb.n - nab AS DOUBLE) * 10000.0) / 10000.0 >= 0.8
       ORDER BY 1, 2"""

  /** Shared oracle for qe01/qe05 (exact brute-force cosine top-10) —
    * also the TRUTH side of the qe28 recall evaluation. */
  private lazy val bruteTopKOracleSql: String =
    """WITH z AS (SELECT e.vec_id,
         CAST(unnest(e.embedding) AS DOUBLE) AS a,
         CAST(unnest((SELECT embedding FROM embeddings WHERE vec_id = 0))
           AS DOUBLE) AS b
         FROM embeddings e),
       s AS (SELECT vec_id, sum(a*b) AS ab, sum(a*a) AS aa, sum(b*b) AS bb
         FROM z GROUP BY 1)
       SELECT vec_id, round(ab / (sqrt(aa) * sqrt(bb)), 4) AS cos,
         row_number() OVER (ORDER BY round(ab / (sqrt(aa) * sqrt(bb)), 4)
           DESC, vec_id) AS rank
       FROM s QUALIFY rank <= 10 ORDER BY rank"""

  /** qd80: sketch-quality EVALUATION — recall of the portable banded
    * MinHash near-dup (qd24's recall-oriented 8×2 operating point)
    * against the exact capped-Jaccard truth (qd04). Both sides are the
    * very derivations their own queries pin, composed as subqueries, so
    * the evaluation is itself oracle-exact — the QA loop a production
    * dedup pipeline runs when tuning band/row parameters. */
  private lazy val minhashRecallOracleSql: String =
    s"""WITH t AS ($ngramJaccardOracleSql),
         f AS (${minhashPortableOracle(numLanes = 8, rowsPerBand = 2)})
       SELECT CAST((SELECT count(*) FROM t) AS BIGINT) AS n_true,
         CAST((SELECT count(*) FROM f) AS BIGINT) AS n_found,
         CAST((SELECT count(*) FROM t JOIN f USING (doc_a, doc_b))
           AS BIGINT) AS n_hit,
         round((SELECT count(*) FROM t JOIN f USING (doc_a, doc_b)) * 1.0
           / (SELECT count(*) FROM t), 4) AS recall"""

  /** Shared CTE suffix for the multi-query recall oracles: the 100-
    * vector evaluation batch `q` and its brute-force per-query top-10
    * `truth` (the [[PipelineQueries.evalTruth]] kNN join re-derived
    * symbolically — same normalized-dot + 4-decimal rounding + (cos
    * desc, vec_id asc) tiebreak). Expects `e` (normalized vectors) in
    * scope. */
  private val evalTruthCtes: String =
    """q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 100),
       tscore AS (SELECT q.query_id, e.vec_id,
           round(list_dot_product(e.v, q.qv), 4) AS cos
         FROM e, q),
       truth AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cos DESC, vec_id) AS rk FROM tscore) tr
         WHERE rk <= 10)"""

  /** The single recall row over `truth`/`approx` (query_id, vec_id)
    * member sets: (k, n_queries, n_hit, recall). */
  private val recallRowSelect: String =
    """SELECT CAST(10 AS BIGINT) AS k,
         CAST((SELECT count(DISTINCT query_id) FROM truth) AS BIGINT)
           AS n_queries,
         CAST((SELECT count(*) FROM truth JOIN approx
           USING (query_id, vec_id)) AS BIGINT) AS n_hit,
         round((SELECT count(*) FROM truth JOIN approx
             USING (query_id, vec_id)) * 1.0 /
           ((SELECT count(DISTINCT query_id) FROM truth) * 10), 4)
           AS recall"""

  /** qe28: retrieval-quality EVALUATION — recall@10 of the IVF probe
    * (qe04's operating point, nProbe 4 of 16 md5-seeded cells) against
    * brute-force truth, averaged over the 100-query batch; every stage
    * (centroid sample, assignment, per-query probe ranks, per-query
    * top-10) re-derived symbolically. */
  private lazy val annRecallOracleSql: String =
    s"""WITH raw AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS rv
         FROM embeddings),
       e AS (SELECT vec_id,
         list_transform(rv, x -> x / sqrt(list_dot_product(rv, rv))) AS v
         FROM raw),
       $evalTruthCtes,
       cents AS (SELECT CAST(row_number() OVER (ORDER BY
             md5('ivf:' || CAST(vec_id AS VARCHAR)), vec_id) AS INTEGER) - 1
             AS cell, v AS cv
         FROM e ORDER BY md5('ivf:' || CAST(vec_id AS VARCHAR)), vec_id
         LIMIT 16),
       assign AS (SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell DESC) AS rn
         FROM e, cents c),
       cellof AS (SELECT vec_id, cell FROM assign WHERE rn = 1),
       crks AS (SELECT q.query_id, c.cell,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_dot_product(c.cv, q.qv) DESC, c.cell) AS crk
         FROM cents c, q),
       probe AS (SELECT query_id, cell FROM crks WHERE crk <= 4),
       cand AS (SELECT p.query_id, e.vec_id,
           round(list_dot_product(e.v, q2.qv), 4) AS cos
         FROM e JOIN cellof cf USING (vec_id)
           JOIN probe p ON cf.cell = p.cell
           JOIN q q2 ON q2.query_id = p.query_id),
       approx AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cos DESC, vec_id) AS rk FROM cand) ar
         WHERE rk <= 10)
       $recallRowSelect"""

  /** qe29: IVF with TRAINED cells — the same md5 'ivf:' seeds as qe04
    * refined by 2 spherical Lloyd rounds (the [[kmeansCtes]] machinery
    * with the IVF seed prefix, k = 16), then the standard
    * assign → probe-4 → top-10 tail. Means round to 1e-6 before
    * re-normalization on BOTH engines, so the trained centroids (and
    * therefore cells, probes and ranks) are hash-exact. */
  private lazy val ivfTrainedOracleSql: String =
    s"""${kmeansCtes(16, seedPrefix = "ivf:")},
         cellof AS (SELECT vec_id, cell FROM afin WHERE rn = 1),
         qv AS (SELECT v FROM e WHERE vec_id = 0),
         probe AS (SELECT c.cell FROM c2 c, qv
           ORDER BY list_dot_product(c.cv, qv.v) DESC, c.cell LIMIT 4),
         s AS (SELECT e.vec_id, list_dot_product(e.v, qv.v) AS ab
           FROM e JOIN cellof USING (vec_id) JOIN probe USING (cell), qv)
       SELECT vec_id, round(ab, 4) AS cos,
         CAST(row_number() OVER (ORDER BY round(ab, 4) DESC, vec_id)
           AS BIGINT) AS rank
       FROM s QUALIFY rank <= 10 ORDER BY rank"""

  /** Shared CTE suffix probing the TRAINED (2-Lloyd-round) cells per
    * query: expects kmeansCtes' `e`/`c2`/`afin` plus `q` in scope;
    * yields `approx` = per-query trained-IVF top-10 at nProbe 4. */
  private val trainedApproxCtes: String =
    """cellof AS (SELECT vec_id, cell FROM afin WHERE rn = 1),
       crks AS (SELECT q.query_id, c.cell,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_dot_product(c.cv, q.qv) DESC, c.cell) AS crk
         FROM c2 c, q),
       probe AS (SELECT query_id, cell FROM crks WHERE crk <= 4),
       cand AS (SELECT p.query_id, e.vec_id,
           round(list_dot_product(e.v, q2.qv), 4) AS cos
         FROM e JOIN cellof cf USING (vec_id)
           JOIN probe p ON cf.cell = p.cell
           JOIN q q2 ON q2.query_id = p.query_id),
       approx AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cos DESC, vec_id) AS rk FROM cand) ar
         WHERE rk <= 10)"""

  /** qe30 (and qe34, which probes the same trained cells from the
    * PERSISTED index — identical result by construction): recall@10 of
    * the TRAINED IVF probe over the 100-query batch — the re-measure
    * half of the qe28 evaluation loop (measure → train → re-measure). */
  private lazy val annRecallTrainedOracleSql: String =
    s"""${kmeansCtes(16, seedPrefix = "ivf:")},
       $evalTruthCtes,
       $trainedApproxCtes
       $recallRowSelect"""

  /** qe31: the trained-IVF recall-vs-scan-fraction curve — recall@10
    * and average per-query candidate count at nProbe 1/2/4/8 of 16
    * cells, all levels derived from ONE probe-rank table. */
  private lazy val annProbeSweepOracleSql: String =
    s"""${kmeansCtes(16, seedPrefix = "ivf:")},
       $evalTruthCtes,
       cellof AS (SELECT vec_id, cell FROM afin WHERE rn = 1),
       crks AS (SELECT q.query_id, c.cell,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_dot_product(c.cv, q.qv) DESC, c.cell) AS crk
         FROM c2 c, q),
       levels AS (SELECT CAST(unnest([1, 2, 4, 8]) AS BIGINT) AS n_probe),
       probe AS (SELECT l.n_probe, k.query_id, k.cell
         FROM crks k JOIN levels l ON k.crk <= l.n_probe),
       cand AS (SELECT p.n_probe, p.query_id, e.vec_id,
           round(list_dot_product(e.v, q2.qv), 4) AS cos
         FROM e JOIN cellof cf USING (vec_id)
           JOIN probe p ON cf.cell = p.cell
           JOIN q q2 ON q2.query_id = p.query_id),
       approx AS (SELECT n_probe, query_id, vec_id
         FROM (SELECT n_probe, query_id, vec_id,
           row_number() OVER (PARTITION BY n_probe, query_id
             ORDER BY cos DESC, vec_id) AS rk FROM cand) ar
         WHERE rk <= 10),
       hits AS (SELECT n_probe, CAST(count(*) AS BIGINT) AS n_hit
         FROM approx JOIN truth USING (query_id, vec_id) GROUP BY 1),
       sizes AS (SELECT cell, count(*) AS n_in_cell FROM cellof
         GROUP BY 1),
       scanned AS (SELECT p.n_probe,
           sum(s.n_in_cell) * 1.0 / count(DISTINCT p.query_id) AS avg_c
         FROM probe p JOIN sizes s USING (cell) GROUP BY 1)
       SELECT h.n_probe, h.n_hit,
         round(h.n_hit * 1.0 / 1000, 4) AS recall,
         round(sc.avg_c, 4) AS avg_cand
       FROM hits h JOIN scanned sc USING (n_probe) ORDER BY n_probe"""

  /** qe32: recall@10 of the int8 two-stage shape (qe10's decode
    * arithmetic batched over the 100-query batch: compressed full scan
    * → 50-candidate exact rerank) — the ≥ 0.9 operating point the
    * qe31 curve shows cell-probing cannot reach on isotropic
    * embeddings. */
  private lazy val annRerankRecallOracleSql: String =
    s"""WITH raw AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS rv
         FROM embeddings),
       e AS (SELECT vec_id,
         list_transform(rv, x -> x / sqrt(list_dot_product(rv, rv))) AS v
         FROM raw),
       $evalTruthCtes,
       ex AS (SELECT vec_id, unnest(range(64)) AS dim,
           floor(unnest(v) * 10000.0) AS x_e4 FROM e),
       stats AS (SELECT dim, min(x_e4) AS mn, max(x_e4) AS mx
         FROM ex GROUP BY 1),
       dec AS (SELECT ex.vec_id, ex.dim,
           (s.mn + (CASE WHEN s.mx = s.mn THEN 0.0
             ELSE least(floor((ex.x_e4 - s.mn) * 255
               / CAST(s.mx - s.mn AS DOUBLE)), 255.0) END)
             * (s.mx - s.mn) / 255.0) / 10000.0 AS c
         FROM ex JOIN stats s USING (dim)),
       qx AS (SELECT query_id, unnest(range(64)) AS dim,
           unnest(qv) AS qxv FROM q),
       ascs AS (SELECT x.query_id, d.vec_id, sum(d.c * x.qxv) AS ascore
         FROM dec d JOIN qx x USING (dim) GROUP BY 1, 2),
       short AS (SELECT query_id, vec_id
         FROM (SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY ascore DESC, vec_id) AS rk FROM ascs) sr
         WHERE rk <= 50),
       rr AS (SELECT s.query_id, s.vec_id,
           round(list_dot_product(e.v, q.qv), 4) AS cos
         FROM short s JOIN e USING (vec_id) JOIN q USING (query_id)),
       approx AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cos DESC, vec_id) AS rk FROM rr) rr2
         WHERE rk <= 10)
       $recallRowSelect"""

  /** The shared drift-fixture preamble of the qe54/qe55/qe56 oracles:
    * natural/normalized halves, the +0.15 drifted half, union `e` and
    * the 100 drifted queries `q` — ONE definition, so the fixture can
    * never diverge between the three truths. */
  private val driftHalvesSql: String =
    """WITH raw AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS rv
         FROM embeddings),
       enat AS (SELECT vec_id,
         list_transform(rv, x -> x / sqrt(list_dot_product(rv, rv))) AS v
         FROM raw WHERE vec_id % 2 = 0),
       shf AS (SELECT vec_id,
         list_transform(rv, x -> x + CAST(0.15 AS DOUBLE)) AS sv
         FROM raw WHERE vec_id % 2 = 1),
       eshift AS (SELECT vec_id,
         list_transform(sv, x -> x / sqrt(list_dot_product(sv, sv))) AS v
         FROM shf),"""

  private val driftPreambleSql: String =
    s"""$driftHalvesSql
       e AS (SELECT * FROM enat UNION ALL SELECT * FROM eshift),
       q AS (SELECT vec_id AS query_id, v AS qv FROM eshift
         WHERE vec_id < 200),"""

  /** Brute top-10 truth over the drift fixture's union, per query. */
  private val driftTruthSql: String =
    """tscore AS (SELECT q.query_id, e.vec_id,
           round(list_dot_product(e.v, q.qv), 4) AS cos
         FROM e, q),
       truth AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cos DESC, vec_id) AS rk FROM tscore) tr
         WHERE rk <= 10),"""

  /** A prefixed trained-IVF Lloyd chain over an arbitrary TRAINING
    * base CTE — [[kmeansCtes]]' machinery generalized for qe54, where
    * the SAME arithmetic must run twice (build trained on the natural
    * half, retrain trained on the drifted union). Emits CTEs
    * `<pfx>c0` (md5 'ivf:' seeded sample of `base`) through `<pfx>c2`
    * (2 spherical Lloyd rounds, means rounded to 1e-6 before
    * re-normalization — the graft.ops.Clustering contract), then
    * `<pfx>cellof` assigning the SERVING corpus `e` under the final
    * centroids (ties to the higher cell — `nearestCell`'s greatest()
    * convention), `<pfx>probe` as each query's 4 best cells by
    * centroid dot (ties to the LOWER cell — the probe convention) and
    * `<pfx>approx` as the per-query top-10 over the probed
    * candidates. Expects `e` and `q` in scope. */
  private def ivfDriftChainCtes(pfx: String, base: String,
      k: Int): String = {
    def lloyd(i: Int): String =
      s"""${pfx}a$i AS (SELECT b.vec_id, c.cell,
           row_number() OVER (PARTITION BY b.vec_id
             ORDER BY list_dot_product(b.v, c.cv) DESC, c.cell DESC) AS rn
         FROM $base b, ${pfx}c$i c),
       ${pfx}x$i AS (SELECT vec_id, cell FROM ${pfx}a$i WHERE rn = 1),
       ${pfx}m${i + 1} AS (SELECT x.cell, u.dim,
           round(sum(u.x) / count(*), 6) AS m
         FROM ${pfx}x$i x JOIN (SELECT vec_id,
             unnest(range(64)) AS dim, unnest(v) AS x FROM $base) u
           USING (vec_id)
         GROUP BY 1, 2),
       ${pfx}mc${i + 1} AS (SELECT cell, list(m ORDER BY dim) AS mv
         FROM ${pfx}m${i + 1} GROUP BY 1),
       ${pfx}c${i + 1} AS (SELECT p.cell,
           CASE WHEN q.cell IS NULL
                  OR sqrt(list_dot_product(q.mv, q.mv)) = 0 THEN p.cv
                ELSE list_transform(q.mv,
                  x -> x / sqrt(list_dot_product(q.mv, q.mv))) END AS cv
         FROM ${pfx}c$i p LEFT JOIN ${pfx}mc${i + 1} q USING (cell))"""
    s"""${pfx}c0 AS (SELECT CAST(row_number() OVER (ORDER BY
           md5('ivf:' || CAST(vec_id AS VARCHAR)), vec_id)
           AS INTEGER) - 1 AS cell, v AS cv
         FROM $base ORDER BY md5('ivf:' || CAST(vec_id AS VARCHAR)),
           vec_id
         LIMIT $k),
       ${lloyd(0)},
       ${lloyd(1)},
       ${pfx}fin AS (SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell DESC) AS rn
         FROM e, ${pfx}c2 c),
       ${pfx}cellof AS (SELECT vec_id, cell FROM ${pfx}fin WHERE rn = 1),
       ${pfx}crks AS (SELECT q.query_id, c.cell,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_dot_product(c.cv, q.qv) DESC, c.cell) AS crk
         FROM ${pfx}c2 c, q),
       ${pfx}probe AS (SELECT query_id, cell FROM ${pfx}crks
         WHERE crk <= 4),
       ${pfx}cand AS (SELECT p.query_id, e.vec_id,
           round(list_dot_product(e.v, q2.qv), 4) AS cos
         FROM e JOIN ${pfx}cellof cf USING (vec_id)
           JOIN ${pfx}probe p ON cf.cell = p.cell
           JOIN q q2 ON q2.query_id = p.query_id),
       ${pfx}approx AS (SELECT query_id, vec_id
         FROM (SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cos DESC, vec_id) AS rk FROM ${pfx}cand) ar
         WHERE rk <= 10),
       ${pfx}sizes AS (SELECT cell, count(*) AS n_in_cell
         FROM ${pfx}cellof GROUP BY 1),
       ${pfx}scan AS (SELECT sum(s.n_in_cell) * 1.0
           / count(DISTINCT p.query_id) AS avg_c
         FROM ${pfx}probe p JOIN ${pfx}sizes s USING (cell))"""
  }

  private def ivfDriftPhaseRow(phase: String, pfx: String,
      approxCte: String = ""): String = {
    val approx = if (approxCte.nonEmpty) approxCte else s"${pfx}approx"
    s"""SELECT '$phase' AS phase, CAST(10 AS BIGINT) AS k,
         CAST((SELECT count(DISTINCT query_id) FROM truth) AS BIGINT)
           AS n_queries,
         CAST((SELECT count(*) FROM truth JOIN $approx
           USING (query_id, vec_id)) AS BIGINT) AS n_hit,
         round((SELECT count(*) FROM truth JOIN $approx
             USING (query_id, vec_id)) * 1.0 /
           ((SELECT count(DISTINCT query_id) FROM truth) * 10), 4)
           AS recall,
         round((SELECT avg_c FROM ${pfx}scan), 4) AS avg_cand"""
  }

  /** qe54: the drift fixture end-to-end — natural even half, odd half
    * shifted +0.15/dim pre-normalization, truth brute over the union
    * for 100 drifted queries; the BUILD chain trains on the natural
    * half only (the frozen model the appends landed under), the
    * RETRAIN chain on the union (exactly the stored vectors the
    * retain-at-compact pass trains from), and each phase's recall +
    * scan row comes off its own chain. */
  private lazy val ivfRetrainRecallOracleSql: String =
    s"""$driftPreambleSql
       $driftTruthSql
       ${ivfDriftChainCtes("b", "enat", 16)},
       ${ivfDriftChainCtes("r", "e", 16)}
       SELECT * FROM (
         ${ivfDriftPhaseRow("before_retrain", "b")}
         UNION ALL
         ${ivfDriftPhaseRow("after_retrain", "r")}
       ) z ORDER BY phase"""

  /** The qe55 per-phase IVF-PQ ADC chain over the drift fixture —
    * [[ivfDriftChainCtes]]' probe sets extended with the residual-PQ
    * serving path: exploded phase centroids (`<pfx>cvx`), the
    * 1e-6-floored residual grid of the FULL union under the phase's
    * assignment (`<pfx>r6`), the md5 'pqr:' codebook sample over the
    * phase's TRAINING base only (`<pfx>cbsel`/`<pfx>cb` — the build
    * phase samples natural-half residuals, the retrain phase union
    * residuals, exactly what `pqCodebookFrom` sees from the stored
    * vectors), exact-integer argmin codes for every doc, per-query
    * per-probed-cell distance tables, the ADC shortlist (adc asc, vec
    * asc, ≤ `rerank`), and the exact-cosine rerank to the top-10
    * (`<pfx>pqapprox`). All intermediates integer-valued doubles —
    * engine-exact. */
  private def ivfPqDriftChainCtes(pfx: String, base: String,
      numSub: Int, cbSize: Int, rerank: Int): String = {
    val dps = 64 / numSub
    s"""${pfx}cvx AS (SELECT cell, generate_subscripts(cv, 1) AS dim,
           unnest(cv) AS c FROM ${pfx}c2),
       ${pfx}r6 AS (SELECT u.vec_id, cf.cell, u.dim,
           floor((u.x - x.c) * 1000000.0) AS r
         FROM (SELECT vec_id, generate_subscripts(v, 1) AS dim,
             unnest(v) AS x FROM e) u
         JOIN ${pfx}cellof cf USING (vec_id)
         JOIN ${pfx}cvx x ON x.cell = cf.cell AND x.dim = u.dim),
       ${pfx}cbsel AS (SELECT vec_id, row_number() OVER (ORDER BY
           md5('pqr:' || CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cidx
         FROM $base QUALIFY cidx < $cbSize),
       ${pfx}cb AS (SELECT s.cidx, r6.dim, r6.r AS cx,
           (r6.dim - 1) // $dps AS m
         FROM ${pfx}cbsel s JOIN ${pfx}r6 r6 USING (vec_id)),
       ${pfx}d_ AS (SELECT r6.vec_id, (r6.dim - 1) // $dps AS m,
           cb.cidx, sum((r6.r - cb.cx) * (r6.r - cb.cx)) AS dist
         FROM ${pfx}r6 r6 JOIN ${pfx}cb cb
           ON cb.m = ((r6.dim - 1) // $dps) AND cb.dim = r6.dim
         GROUP BY 1, 2, 3),
       ${pfx}code AS (SELECT vec_id, m, cidx FROM (SELECT *,
           row_number() OVER (PARTITION BY vec_id, m
             ORDER BY dist, cidx) AS crn FROM ${pfx}d_) cd
         WHERE crn = 1),
       ${pfx}qr AS (SELECT pb.query_id, pb.cell, qx.dim,
           floor((qx.x - x.c) * 1000000.0) AS r
         FROM ${pfx}probe pb JOIN ${pfx}cvx x ON x.cell = pb.cell
         JOIN qx ON qx.query_id = pb.query_id AND qx.dim = x.dim),
       ${pfx}qd AS (SELECT qr.query_id, qr.cell,
           (qr.dim - 1) // $dps AS m, cb.cidx,
           sum((qr.r - cb.cx) * (qr.r - cb.cx)) AS qdist
         FROM ${pfx}qr qr JOIN ${pfx}cb cb
           ON cb.m = ((qr.dim - 1) // $dps) AND cb.dim = qr.dim
         GROUP BY 1, 2, 3, 4),
       ${pfx}adcs AS (SELECT qd.query_id, c.vec_id,
           sum(qd.qdist) AS adc
         FROM ${pfx}code c JOIN ${pfx}cellof cf USING (vec_id)
         JOIN ${pfx}qd qd ON qd.cell = cf.cell AND qd.m = c.m
           AND qd.cidx = c.cidx
         GROUP BY 1, 2),
       ${pfx}short AS (SELECT query_id, vec_id FROM (SELECT query_id,
           vec_id, row_number() OVER (PARTITION BY query_id
             ORDER BY adc, vec_id) AS rk FROM ${pfx}adcs) sr
         WHERE rk <= $rerank),
       ${pfx}rr AS (SELECT s2.query_id, s2.vec_id,
           round(list_dot_product(e.v, q2.qv), 4) AS cos
         FROM ${pfx}short s2 JOIN e ON e.vec_id = s2.vec_id
         JOIN q q2 ON q2.query_id = s2.query_id),
       ${pfx}pqapprox AS (SELECT query_id, vec_id
         FROM (SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cos DESC, vec_id) AS rk FROM ${pfx}rr) ar
         WHERE rk <= 10)"""
  }

  /** qe55: the qe54 drift fixture through the IVF-PQ serving path —
    * both phases' FULL models re-derived in SQL (Lloyd chains via
    * [[ivfDriftChainCtes]], residual grids + codebooks + codes + ADC
    * + rerank via [[ivfPqDriftChainCtes]]), each phase reporting the
    * recall row over its reranked top-10 and the probed-candidate
    * count. */
  private lazy val ivfPqRetrainRecallOracleSql: String =
    s"""$driftPreambleSql
       qx AS (SELECT query_id, generate_subscripts(qv, 1) AS dim,
         unnest(qv) AS x FROM q),
       $driftTruthSql
       ${ivfDriftChainCtes("b", "enat", 16)},
       ${ivfDriftChainCtes("r", "e", 16)},
       ${ivfPqDriftChainCtes("b", "enat", 16, 64, 100)},
       ${ivfPqDriftChainCtes("r", "e", 16, 64, 100)}
       SELECT * FROM (
         ${ivfDriftPhaseRow("before_retrain", "b", "bpqapprox")}
         UNION ALL
         ${ivfDriftPhaseRow("after_retrain", "r", "rpqapprox")}
       ) z ORDER BY phase"""

  /** qe56: the drift monitor's truth — the natural-half Lloyd chain
    * (only its `bc2` centroids are consumed; the chain's probe CTEs
    * go unreferenced and unexecuted), per-vector best centroid dot,
    * the 1e-6-floored error integers summed exactly, control and
    * drifted batches each ratioed against the stored corpus's own
    * error. */
  private lazy val ivfDriftMonitorOracleSql: String =
    s"""$driftPreambleSql
       ${ivfDriftChainCtes("b", "enat", 16)},
       serr AS (SELECT u.vec_id,
           CAST(floor((1 - max(list_dot_product(u.v, c.cv)))
             * 1000000.0) AS BIGINT) AS e6
         FROM enat u, bc2 c GROUP BY u.vec_id, u.v),
       ssum AS (SELECT CAST(count(*) AS BIGINT) AS n_stored,
           CAST(sum(e6) AS BIGINT) AS stored_sum_e6 FROM serr),
       cerr AS (SELECT u.vec_id,
           CAST(floor((1 - max(list_dot_product(u.v, c.cv)))
             * 1000000.0) AS BIGINT) AS e6
         FROM enat u, bc2 c WHERE u.vec_id < 400
         GROUP BY u.vec_id, u.v),
       csum AS (SELECT CAST(count(*) AS BIGINT) AS n_batch,
           CAST(sum(e6) AS BIGINT) AS batch_sum_e6 FROM cerr),
       derr AS (SELECT u.vec_id,
           CAST(floor((1 - max(list_dot_product(u.v, c.cv)))
             * 1000000.0) AS BIGINT) AS e6
         FROM eshift u, bc2 c WHERE u.vec_id < 400
         GROUP BY u.vec_id, u.v),
       dsum AS (SELECT CAST(count(*) AS BIGINT) AS n_batch,
           CAST(sum(e6) AS BIGINT) AS batch_sum_e6 FROM derr)
       SELECT * FROM (
         SELECT 'control' AS batch, s.n_stored, s.stored_sum_e6,
           c.n_batch, c.batch_sum_e6,
           round((c.batch_sum_e6 * 1.0 / c.n_batch) /
             (s.stored_sum_e6 * 1.0 / s.n_stored), 4) AS drift_ratio
         FROM ssum s, csum c
         UNION ALL
         SELECT 'drifted', s.n_stored, s.stored_sum_e6,
           d.n_batch, d.batch_sum_e6,
           round((d.batch_sum_e6 * 1.0 / d.n_batch) /
             (s.stored_sum_e6 * 1.0 / s.n_stored), 4)
         FROM ssum s, dsum d
       ) z ORDER BY batch"""

  /** One phase of the qe58 plain-PQ drift chain: the md5('pq:')
    * codebook sample drawn from `baseWhere`'s rows (the natural half
    * for the build phase — exactly what `writePqIndex` saw; the whole
    * union for the retrain phase — exactly the live stored q4 vectors
    * `pqCodebookFrom` re-draws from), exact-integer argmin codes for
    * EVERY union row under that codebook, each row's residual error
    * `<pfx>verr` (the min the argmin leaves behind — the drift
    * monitor's PQ grid), the 100 drifted queries' per-subspace
    * distance tables and their ADC top-10. Expects `pv`/`v4`/`sub`
    * (the UNNORMALIZED q4 space — plain PQ never normalizes) in
    * scope. */
  private def pqDriftChainCtes(pfx: String, baseWhere: String): String =
    s"""${pfx}cbsel AS (SELECT vec_id, row_number() OVER (
           ORDER BY md5('pq:' || CAST(vec_id AS VARCHAR)), vec_id) - 1
           AS cidx
         FROM (SELECT vec_id FROM pv $baseWhere) zb QUALIFY cidx < 16),
       ${pfx}cb AS (SELECT c.cidx, v.dim, v.x AS cx,
           (v.dim - 1) // 8 AS m
         FROM ${pfx}cbsel c JOIN v4 v USING (vec_id)),
       ${pfx}d AS (SELECT s.vec_id, s.m, cb.cidx,
           sum((s.x - cb.cx) * (s.x - cb.cx)) AS dist
         FROM sub s JOIN ${pfx}cb cb ON s.m = cb.m AND s.dim = cb.dim
         GROUP BY 1, 2, 3),
       ${pfx}code AS (SELECT vec_id, m, cidx FROM (SELECT *,
           row_number() OVER (PARTITION BY vec_id, m
             ORDER BY dist, cidx) AS rn
           FROM ${pfx}d) zc WHERE rn = 1),
       ${pfx}verr AS (SELECT vec_id, CAST(sum(md) AS BIGINT) AS e
         FROM (SELECT vec_id, m, min(dist) AS md FROM ${pfx}d
           GROUP BY 1, 2) zm GROUP BY 1),
       ${pfx}qd AS (SELECT s.vec_id AS query_id, cb.m, cb.cidx,
           sum((s.x - cb.cx) * (s.x - cb.cx)) AS qdist
         FROM sub s JOIN ${pfx}cb cb ON s.m = cb.m AND s.dim = cb.dim
         WHERE s.vec_id % 2 = 1 AND s.vec_id < 200
         GROUP BY 1, 2, 3),
       ${pfx}sc AS (SELECT b.query_id, c.vec_id,
           CAST(sum(b.qdist) AS BIGINT) AS adc
         FROM ${pfx}code c
           JOIN ${pfx}qd b ON c.m = b.m AND c.cidx = b.cidx
         GROUP BY 1, 2),
       ${pfx}approx AS (SELECT query_id, vec_id FROM (SELECT query_id,
           vec_id, row_number() OVER (PARTITION BY query_id
             ORDER BY adc, vec_id) AS rk FROM ${pfx}sc) za
         WHERE rk <= 10)"""

  private def pqDriftPhaseRow(phase: String, pfx: String,
      ratioCte: String): String =
    s"""SELECT '$phase' AS phase, CAST(10 AS BIGINT) AS k,
         CAST((SELECT count(DISTINCT query_id) FROM truth) AS BIGINT)
           AS n_queries,
         CAST((SELECT count(*) FROM truth JOIN ${pfx}approx
           USING (query_id, vec_id)) AS BIGINT) AS n_hit,
         round((SELECT count(*) FROM truth JOIN ${pfx}approx
             USING (query_id, vec_id)) * 1.0 /
           ((SELECT count(DISTINCT query_id) FROM truth) * 10), 4)
           AS recall,
         (SELECT r FROM $ratioCte) AS drift_ratio"""

  /** qe58: the keepVectors plain-PQ lifecycle end-to-end — both
    * md5-sampled codebooks (natural-half build, union retrain), both
    * full-union exact-integer encodes, the 100 drifted queries' ADC
    * rankings under each, brute cosine truth over the union, and both
    * monitor ratios: the before ratio ARRIVAL-time (drifted batch vs
    * the natural-only store — the trigger signal), the after ratio
    * against the retrained union store (the quiesce signal). Every
    * number exact-integer or round-4 deterministic. */
  private lazy val pqRetrainRecallOracleSql: String =
    s"""$driftPreambleSql
       $driftTruthSql
       pv AS (SELECT vec_id, rv AS pvec FROM raw WHERE vec_id % 2 = 0
         UNION ALL SELECT vec_id, sv FROM shf),
       v4 AS (SELECT vec_id, generate_subscripts(pvec, 1) AS dim,
           CAST(floor(CAST(unnest(pvec) AS DOUBLE) * 10000.0)
             AS BIGINT) AS x
         FROM pv),
       sub AS (SELECT vec_id, (dim - 1) // 8 AS m, dim, x FROM v4),
       ${pqDriftChainCtes("b", "WHERE vec_id % 2 = 0")},
       ${pqDriftChainCtes("r", "")},
       bratio AS (SELECT round(
           ((SELECT sum(e) FROM bverr WHERE vec_id % 2 = 1) * 1.0 /
            (SELECT count(*) FROM bverr WHERE vec_id % 2 = 1)) /
           ((SELECT sum(e) FROM bverr WHERE vec_id % 2 = 0) * 1.0 /
            (SELECT count(*) FROM bverr WHERE vec_id % 2 = 0)), 4)
           AS r),
       rratio AS (SELECT round(
           ((SELECT sum(e) FROM rverr WHERE vec_id % 2 = 1) * 1.0 /
            (SELECT count(*) FROM rverr WHERE vec_id % 2 = 1)) /
           ((SELECT sum(e) FROM rverr) * 1.0 /
            (SELECT count(*) FROM rverr)), 4) AS r)
       SELECT * FROM (
         ${pqDriftPhaseRow("before_retrain", "b", "bratio")}
         UNION ALL
         ${pqDriftPhaseRow("after_retrain", "r", "rratio")}
       ) z ORDER BY phase"""

  /** qe57: the composed vector arrival loop — the gate re-derived from
    * sign arithmetic (per-16-dim block values as exact powers of two;
    * candidate = any shared block, verified at round(dot, 4) ≥ 0.99 —
    * in-batch keep-lowest-id first, then the screen against the stored
    * natural half), the LIVE corpus `e` as natural ∪ survivors, the
    * monitor row's error sums over exactly that corpus (independently
    * re-checking the engine's additively-folded sidecar), the retrain
    * decision as the same > 1.1 conditional, and the post-retrain
    * IVF-PQ serving path (Lloyd chain + residual codebook + codes +
    * ADC + rerank, all trained on the live corpus) cut against brute
    * truth. */
  private lazy val vectorArrivalLoopOracleSql: String =
    s"""$driftHalvesSql
       av AS (SELECT vec_id, v FROM enat WHERE vec_id < 40
         UNION ALL SELECT vec_id, v FROM eshift),
       ab AS (SELECT vec_id, (dim - 1) // 16 AS m,
           sum(CASE WHEN x >= 0
             THEN CAST(power(2, (dim - 1) % 16) AS BIGINT)
             ELSE 0 END) AS bv
         FROM (SELECT vec_id, generate_subscripts(v, 1) AS dim,
             unnest(v) AS x FROM av) u
         GROUP BY 1, 2),
       ib AS (SELECT vec_id, (dim - 1) // 16 AS m,
           sum(CASE WHEN x >= 0
             THEN CAST(power(2, (dim - 1) % 16) AS BIGINT)
             ELSE 0 END) AS bv
         FROM (SELECT vec_id, generate_subscripts(v, 1) AS dim,
             unnest(v) AS x FROM enat) u
         GROUP BY 1, 2),
       inb AS (SELECT DISTINCT c.ib2 AS vec_id
         FROM (SELECT DISTINCT a.vec_id AS ia, b.vec_id AS ib2
             FROM ab a JOIN ab b
               ON a.m = b.m AND a.bv = b.bv AND a.vec_id < b.vec_id) c
         JOIN av va ON va.vec_id = c.ia
         JOIN av vb ON vb.vec_id = c.ib2
         WHERE round(list_dot_product(va.v, vb.v), 4) >= 0.99),
       solo AS (SELECT * FROM av
         WHERE vec_id NOT IN (SELECT vec_id FROM inb)),
       hit AS (SELECT DISTINCT s.vec_id
         FROM solo s JOIN ab sb ON sb.vec_id = s.vec_id
         JOIN ib ON ib.m = sb.m AND ib.bv = sb.bv
         JOIN enat iv ON iv.vec_id = ib.vec_id
         WHERE round(list_dot_product(s.v, iv.v), 4) >= 0.99),
       surv AS (SELECT vec_id, v FROM solo
         WHERE vec_id NOT IN (SELECT vec_id FROM hit)),
       e AS (SELECT vec_id, v FROM enat
         UNION ALL SELECT vec_id, v FROM surv),
       q AS (SELECT vec_id AS query_id, v AS qv FROM eshift
         WHERE vec_id < 200),
       qx AS (SELECT query_id, generate_subscripts(qv, 1) AS dim,
         unnest(qv) AS x FROM q),
       $driftTruthSql
       ${ivfDriftChainCtes("b", "enat", 16)},
       ${ivfDriftChainCtes("r", "e", 16)},
       ${ivfPqDriftChainCtes("r", "e", 16, 64, 100)},
       mserr AS (SELECT u.vec_id,
           CAST(floor((1 - max(list_dot_product(u.v, c.cv)))
             * 1000000.0) AS BIGINT) AS e6
         FROM e u, bc2 c GROUP BY u.vec_id, u.v),
       mssum AS (SELECT CAST(count(*) AS BIGINT) AS n_stored,
           CAST(sum(e6) AS BIGINT) AS stored_sum_e6 FROM mserr),
       mberr AS (SELECT u.vec_id,
           CAST(floor((1 - max(list_dot_product(u.v, c.cv)))
             * 1000000.0) AS BIGINT) AS e6
         FROM surv u, bc2 c GROUP BY u.vec_id, u.v),
       mbsum AS (SELECT CAST(count(*) AS BIGINT) AS n_batch,
           CAST(sum(e6) AS BIGINT) AS batch_sum_e6 FROM mberr),
       mratio AS (SELECT s.n_stored, s.stored_sum_e6, b.n_batch,
           b.batch_sum_e6,
           round((b.batch_sum_e6 * 1.0 / b.n_batch) /
             (s.stored_sum_e6 * 1.0 / s.n_stored), 4) AS ratio
         FROM mssum s, mbsum b)
       SELECT * FROM (
         SELECT 'a_gate' AS step,
           CAST((SELECT count(*) FROM av) AS BIGINT) AS m1,
           CAST((SELECT count(*) FROM av)
             - (SELECT count(*) FROM surv) AS BIGINT) AS m2,
           CAST((SELECT count(*) FROM surv) AS BIGINT) AS m3,
           CAST(NULL AS DOUBLE) AS v
         UNION ALL
         SELECT 'b_monitor', m.n_stored, m.stored_sum_e6,
           m.batch_sum_e6, m.ratio FROM mratio m
         UNION ALL
         SELECT 'c_retrain',
           CAST(CASE WHEN m.ratio > 1.1 THEN 1 ELSE 0 END AS BIGINT),
           CAST(CASE WHEN m.ratio > 1.1 THEN 1 ELSE 0 END AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE) FROM mratio m
         UNION ALL
         SELECT 'd_probe',
           CAST((SELECT count(DISTINCT query_id) FROM truth) AS BIGINT),
           CAST((SELECT count(*) FROM truth JOIN rpqapprox
             USING (query_id, vec_id)) AS BIGINT),
           CAST(NULL AS BIGINT),
           round((SELECT count(*) FROM truth JOIN rpqapprox
               USING (query_id, vec_id)) * 1.0 /
             ((SELECT count(DISTINCT query_id) FROM truth) * 10), 4)
       ) z ORDER BY step"""

  /** qe33: the stored trained-IVF index's per-cell populations — the
    * persisted assignment re-derived from the same 1e-6-rounded Lloyd
    * arithmetic. */
  private lazy val ivfTrainedIndexBuildOracleSql: String =
    s"""${kmeansCtes(16, seedPrefix = "ivf:")},
       cellof AS (SELECT vec_id, cell FROM afin WHERE rn = 1)
       SELECT CAST(cell AS BIGINT) AS cell,
         CAST(count(*) AS BIGINT) AS n_vecs
       FROM cellof GROUP BY 1 ORDER BY cell"""

  /** qd84: exact-phrase occurrence counts — token positions re-derived
    * from the text (`\S+` over lower, 0-based), each phrase word's
    * positions shifted to the start they witness, a start covered by
    * all distinct offsets is a match. Mirrors the stored positional
    * probe exactly. */
  private lazy val phraseSearchOracleSql: String = {
    val words = PipelineQueries.phraseQuery
    val wl = words.map(w => s"'$w'").mkString(", ")
    val ol = words.indices.map(i => s"CAST($i AS BIGINT)").mkString(", ")
    s"""WITH toks AS (SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '\\S+')) AS term,
           CAST(generate_subscripts(
             regexp_extract_all(lower(text), '\\S+'), 1) - 1 AS BIGINT)
             AS pos
         FROM documents),
       ph AS (SELECT unnest([$wl]) AS term, unnest([$ol]) AS off),
       cand AS (SELECT t.doc_id, t.pos - p.off AS start, p.off
         FROM toks t JOIN ph p USING (term)),
       hits AS (SELECT doc_id, start FROM cand
         GROUP BY 1, 2 HAVING count(DISTINCT off) = ${words.length})
       SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches
       FROM hits GROUP BY 1
       ORDER BY n_matches DESC, doc_id LIMIT 10"""
  }

  /** Shared multi-query indexed-BM25 CTE generator (qd85/qe38): the
    * 20-query batch probe re-derived — queries are the first 20 docs'
    * first-3-token sets; tf/dl over the docs containing any batch term
    * and df per term are computed ONCE over DISTINCT terms (exactly
    * the one-read-per-posting-row shape of the batch probe, BEFORE
    * the per-query fan-out); each (doc, term) contribution floors to
    * 1e-4 units before the per-(query, doc) sum. Ends in
    * `bqsc(query_id, doc_id, score_e4)`. Same k1/b constants as
    * [[graft.ops.LexIndex.bm25KnnJoinIndexed]], arithmetic
    * order-matched with the Spark expression tree. */
  private lazy val bm25BatchCtes: String = {
    val k1 = 1.2; val b = 0.75
    s"""bit AS (SELECT doc_id,
           regexp_extract_all(lower(text), '\\S+') AS ws FROM documents),
         bist AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
           avg(CAST(len(ws) AS DOUBLE)) AS avgdl FROM bit),
         bitok AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl,
           unnest(ws) AS w FROM bit),
         bqt AS (SELECT DISTINCT query_id, term FROM (SELECT doc_id AS
             query_id, unnest(ws[1:3]) AS term FROM bit
             WHERE doc_id < 20) z),
         biq AS (SELECT DISTINCT term FROM bqt),
         bip AS (SELECT doc_id, dl, w AS term,
             CAST(count(*) AS DOUBLE) AS tf
           FROM bitok JOIN biq ON bitok.w = biq.term GROUP BY 1, 2, 3),
         bidf AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
           FROM bip GROUP BY 1),
         bic AS (SELECT doc_id, term,
             CAST(floor(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * tf * ${k1 + 1.0}
               / (tf + $k1 * (${1.0 - b} + $b * dl / avgdl))
               * 10000.0) AS BIGINT) AS c_e4
           FROM bip JOIN bidf USING (term) CROSS JOIN bist),
         bqsc AS (SELECT q.query_id, bic.doc_id,
             CAST(sum(bic.c_e4) AS BIGINT) AS score_e4
           FROM bic JOIN bqt q USING (term) GROUP BY 1, 2)"""
  }

  /** qd85: the multi-query BM25 probe's per-query top-5. */
  private lazy val bm25BatchOracleSql: String =
    s"""WITH $bm25BatchCtes
       SELECT query_id, doc_id, score_e4,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY score_e4 DESC, doc_id) AS BIGINT) AS rank
       FROM bqsc QUALIFY rank <= 5 ORDER BY query_id, rank"""

  /** qe38: multi-query hybrid RRF — per-query fusion of the batch
    * BM25 top-50 ([[bm25BatchCtes]]) and the trained-IVF top-50 over
    * the same 20 query ids (the qe30/qe34 trained-cell machinery at
    * nProbe 4, rank kept to 50), k = 60, fused on doc_id = vec_id. */
  private lazy val hybridRrfBatchOracleSql: String =
    s"""${kmeansCtes(16, seedPrefix = "ivf:")},
       $bm25BatchCtes,
       blex AS (SELECT query_id, doc_id AS id,
           CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY score_e4 DESC, doc_id) AS BIGINT) AS rank_lex
         FROM bqsc QUALIFY rank_lex <= 50),
       vcellof AS (SELECT vec_id, cell FROM afin WHERE rn = 1),
       vq AS (SELECT vec_id AS query_id, v AS qv FROM e
         WHERE vec_id < 20),
       vcrk AS (SELECT q.query_id, c.cell,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_dot_product(c.cv, q.qv) DESC, c.cell) AS crk
         FROM c2 c, vq q),
       vprobe AS (SELECT query_id, cell FROM vcrk WHERE crk <= 4),
       vcand AS (SELECT p.query_id, e.vec_id,
           round(list_dot_product(e.v, q2.qv), 4) AS cos
         FROM e JOIN vcellof cf USING (vec_id)
           JOIN vprobe p ON cf.cell = p.cell
           JOIN vq q2 ON q2.query_id = p.query_id),
       vrank AS (SELECT query_id, vec_id AS id,
           CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY cos DESC, vec_id) AS BIGINT) AS rank_vec
         FROM vcand QUALIFY rank_vec <= 50),
       f AS (SELECT coalesce(l.query_id, v.query_id) AS query_id,
           coalesce(l.id, v.id) AS id, l.rank_lex, v.rank_vec,
           round(coalesce(1.0 / (60.0 + l.rank_lex), 0.0)
             + coalesce(1.0 / (60.0 + v.rank_vec), 0.0), 6) AS rrf
         FROM blex l FULL OUTER JOIN vrank v
           ON l.query_id = v.query_id AND l.id = v.id)
       SELECT query_id, id, rank_lex, rank_vec, rrf,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY rrf DESC, id) AS BIGINT) AS rank
       FROM f QUALIFY rank <= 10 ORDER BY query_id, rank"""

  /** qd86: the multi-query phrase probe — [[phraseSearchOracleSql]]
    * generalized to a phrase TABLE: queries are the first 10 docs'
    * leading token trigrams; every phrase's words shift their corpus
    * positions to the start they witness, a start covered by all of a
    * query's DISTINCT offsets is a match, per-query top-5 by
    * occurrence count (ties to the lower doc_id). */
  private lazy val phraseBatchOracleSql: String =
    s"""WITH bit AS (SELECT doc_id,
           regexp_extract_all(lower(text), '\\S+') AS ws FROM documents),
       ptoks AS (SELECT doc_id, unnest(ws) AS term,
           CAST(generate_subscripts(ws, 1) - 1 AS BIGINT) AS pos
         FROM bit),
       pq AS (SELECT DISTINCT query_id, term, off FROM (
           SELECT doc_id AS query_id, unnest(ws[1:3]) AS term,
             CAST(generate_subscripts(ws[1:3], 1) - 1 AS BIGINT) AS off
           FROM bit WHERE doc_id < 10) z),
       plen AS (SELECT query_id, count(DISTINCT off) AS phlen
         FROM pq GROUP BY 1),
       pcand AS (SELECT p.query_id, t.doc_id, t.pos - p.off AS start,
           p.off
         FROM ptoks t JOIN pq p USING (term)),
       phits AS (SELECT c.query_id, c.doc_id, c.start
         FROM pcand c JOIN plen l USING (query_id)
         GROUP BY c.query_id, c.doc_id, c.start, l.phlen
         HAVING count(DISTINCT c.off) = l.phlen),
       pnm AS (SELECT query_id, doc_id,
           CAST(count(*) AS BIGINT) AS n_matches
         FROM phits GROUP BY 1, 2)
       SELECT query_id, doc_id, n_matches,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY n_matches DESC, doc_id) AS BIGINT) AS rank
       FROM pnm QUALIFY rank <= 5 ORDER BY query_id, rank"""

  /** qe40: hybrid RRF over the IVF-PQ two-stage — the
    * [[hybridRrfBatchOracleSql]] fusion with its vector half replaced
    * by the [[ivfPqEncodeCtes]] machinery probed for the 20 hybrid
    * query ids at nProbe 8 / shortlist 100 (the qe37/qe39 operating
    * point), exact-cosine reranked to rank ≤ 50. */
  private lazy val hybridRrfPqOracleSql: String =
    hybridRrfPqOracleSqlWith(lexWhere = "", vecWhere = "")

  /** qe51: the same fusion with each half's CANDIDATE set cut before
    * its rank — `lexWhere` filters the scored lexical docs (bqsc),
    * `vecWhere` the ADC candidates (alias `c` = code rows) BEFORE the
    * shortlist — exactly where the Spark probes' attrFilters push into
    * their pruned scans. Empty strings give the unfiltered qe40. */
  private def hybridRrfPqOracleSqlWith(lexWhere: String,
      vecWhere: String): String =
    s"""$ivfPqEncodeCtes,
       $bm25BatchCtes,
       blex AS (SELECT query_id, doc_id AS id,
           CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY score_e4 DESC, doc_id) AS BIGINT) AS rank_lex
         FROM bqsc $lexWhere QUALIFY rank_lex <= 50),
       hq AS (SELECT vec_id AS query_id, v AS qv FROM e
         WHERE vec_id < 20),
       hcrk AS (SELECT q.query_id, c.cell,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_dot_product(c.cv, q.qv) DESC, c.cell) AS crk
         FROM c2 c, hq q),
       hprobe AS (SELECT query_id, cell FROM hcrk WHERE crk <= 8),
       hqx AS (SELECT query_id, generate_subscripts(qv, 1) AS dim,
           unnest(qv) AS x FROM hq),
       hqr AS (SELECT p.query_id, p.cell, hqx.dim,
           floor((hqx.x - cvx.c) * 1000000.0) AS r
         FROM hprobe p JOIN cvx ON cvx.cell = p.cell
         JOIN hqx ON hqx.query_id = p.query_id AND hqx.dim = cvx.dim),
       hqd AS (SELECT qr.query_id, qr.cell, (qr.dim - 1) // 4 AS m,
           cb.cidx, sum((qr.r - cb.cx) * (qr.r - cb.cx)) AS qdist
         FROM hqr qr JOIN cb ON cb.m = ((qr.dim - 1) // 4)
           AND cb.dim = qr.dim
         GROUP BY 1, 2, 3, 4),
       hadcs AS (SELECT hqd.query_id, c.vec_id,
           sum(hqd.qdist) AS adc_score
         FROM code c JOIN cellof cf USING (vec_id)
         JOIN hqd ON hqd.cell = cf.cell AND hqd.m = c.m
           AND hqd.cidx = c.cidx
         $vecWhere
         GROUP BY 1, 2),
       hshort AS (SELECT query_id, vec_id FROM (SELECT query_id,
           vec_id, row_number() OVER (PARTITION BY query_id
             ORDER BY adc_score, vec_id) AS srk FROM hadcs) sh
         WHERE srk <= 100),
       hrr AS (SELECT s.query_id, s.vec_id,
           round(list_dot_product(e.v, q2.qv), 4) AS cos
         FROM hshort s JOIN e ON e.vec_id = s.vec_id
         JOIN hq q2 ON q2.query_id = s.query_id),
       vrank AS (SELECT query_id, vec_id AS id,
           CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY cos DESC, vec_id) AS BIGINT) AS rank_vec
         FROM hrr QUALIFY rank_vec <= 50),
       f AS (SELECT coalesce(l.query_id, v.query_id) AS query_id,
           coalesce(l.id, v.id) AS id, l.rank_lex, v.rank_vec,
           round(coalesce(1.0 / (60.0 + l.rank_lex), 0.0)
             + coalesce(1.0 / (60.0 + v.rank_vec), 0.0), 6) AS rrf
         FROM blex l FULL OUTER JOIN vrank v
           ON l.query_id = v.query_id AND l.id = v.id)
       SELECT query_id, id, rank_lex, rank_vec, rrf,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY rrf DESC, id) AS BIGINT) AS rank
       FROM f QUALIFY rank <= 10 ORDER BY query_id, rank"""

  /** qe41: recall@10 of the multi-query persisted-LSH probe — the
    * qe03 splitmix64 plane geometry (6 planes, literal VALUES rows)
    * re-derives every vector's bucket AND every eval query's bucket;
    * each query probes its bucket plus the 6 one-bit flips, candidates
    * are the vectors whose bucket lands in THAT query's probe set,
    * per-query top-10 by exact cosine, then the standard recall row. */
  private lazy val lshIndexRecallOracleSql: String = {
    val planes = graft.ops.Similarity.planeVectors(6, 64)
    val rows = planes.zipWithIndex.map { case (row, p) =>
      s"($p, [${row.mkString(",")}])"
    }.mkString(",")
    val flips = (0 to 6).map(i => s"(${if (i == 0) 0L else 1L << (i - 1)})")
      .mkString(",")
    s"""WITH raw AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS rv
         FROM embeddings),
       e AS (SELECT vec_id,
         list_transform(rv, x -> x / sqrt(list_dot_product(rv, rv))) AS v
         FROM raw),
       $evalTruthCtes,
       pl(p, pv) AS (VALUES $rows),
       d AS (SELECT e.vec_id, pl.p, list_dot_product(e.v, pl.pv) AS dp
         FROM e, pl),
       b AS (SELECT vec_id,
           CAST(sum(CASE WHEN dp >= 0 THEN 1<<p ELSE 0 END) AS BIGINT)
           AS bucket FROM d GROUP BY 1),
       qprobe AS (SELECT q.query_id, xor(bq.bucket, m.m) AS pb
         FROM q JOIN b bq ON bq.vec_id = q.query_id,
           (VALUES $flips) m(m)),
       cand AS (SELECT p.query_id, e.vec_id,
           round(list_dot_product(e.v, q2.qv), 4) AS cos
         FROM e JOIN b USING (vec_id)
           JOIN qprobe p ON b.bucket = p.pb
           JOIN q q2 ON q2.query_id = p.query_id),
       approx AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cos DESC, vec_id) AS rk FROM cand) ar
         WHERE rk <= 10)
       $recallRowSelect"""
  }

  /** qe46: the LSH operating grid — the qe41 plane/bucket machinery
    * swept over the three flip levels in one statement: `fm(f, m)`
    * enumerates each level's full mask set (≤ f bits over 6 planes:
    * 1 / 7 / 22 masks), per-level probe unions give both the touched
    * stored-bucket count and the per-(level, query) candidate sets,
    * and each level re-cuts the SAME brute-force truth. */
  private lazy val lshOperatingGridOracleSql: String = {
    val planes = graft.ops.Similarity.planeVectors(6, 64)
    val rows = planes.zipWithIndex.map { case (row, p) =>
      s"($p, [${row.mkString(",")}])"
    }.mkString(",")
    val fm = (0 to 2).flatMap { f =>
      (0 to f).flatMap(r => (0 until 6).combinations(r)
        .map(_.foldLeft(0L)((acc, p) => acc | (1L << p))))
        .distinct.map(m => s"($f, $m)")
    }.mkString(",")
    s"""WITH raw AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS rv
         FROM embeddings),
       e AS (SELECT vec_id,
         list_transform(rv, x -> x / sqrt(list_dot_product(rv, rv))) AS v
         FROM raw),
       $evalTruthCtes,
       pl(p, pv) AS (VALUES $rows),
       d AS (SELECT e.vec_id, pl.p, list_dot_product(e.v, pl.pv) AS dp
         FROM e, pl),
       b AS (SELECT vec_id,
           CAST(sum(CASE WHEN dp >= 0 THEN 1<<p ELSE 0 END) AS BIGINT)
           AS bucket FROM d GROUP BY 1),
       fm(f, m) AS (VALUES $fm),
       qprobe AS (SELECT DISTINCT fm.f, q.query_id,
           xor(bq.bucket, fm.m) AS pb
         FROM q JOIN b bq ON bq.vec_id = q.query_id, fm),
       nb AS (SELECT u.f, count(DISTINCT sb.bucket) AS n_buckets
         FROM (SELECT DISTINCT f, pb FROM qprobe) u
         JOIN (SELECT DISTINCT bucket FROM b) sb ON sb.bucket = u.pb
         GROUP BY 1),
       cand AS (SELECT p.f, p.query_id, e.vec_id,
           round(list_dot_product(e.v, q2.qv), 4) AS cos
         FROM e JOIN b USING (vec_id)
           JOIN qprobe p ON b.bucket = p.pb
           JOIN q q2 ON q2.query_id = p.query_id),
       approx AS (SELECT f, query_id, vec_id FROM (SELECT f, query_id,
           vec_id, row_number() OVER (PARTITION BY f, query_id
             ORDER BY cos DESC, vec_id) AS rk FROM cand) ar
         WHERE rk <= 10),
       hits AS (SELECT a.f, count(*) AS n_hit
         FROM approx a JOIN truth USING (query_id, vec_id) GROUP BY 1)
       SELECT CAST(nb.f AS BIGINT) AS probe_flips,
         CAST(nb.n_buckets AS BIGINT) AS n_buckets,
         CAST(10 AS BIGINT) AS k,
         CAST((SELECT count(DISTINCT query_id) FROM truth) AS BIGINT)
           AS n_queries,
         CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
         round(coalesce(h.n_hit, 0) * 1.0 /
           ((SELECT count(DISTINCT query_id) FROM truth) * 10), 4)
           AS recall
       FROM nb LEFT JOIN hits h ON h.f = nb.f
       ORDER BY probe_flips"""
  }

  /** qe52: the multi-table LSH grid — [[lshOperatingGridOracleSql]]
    * generalized over 4 independent 6-plane tables (24 literal plane
    * rows keyed (t, p)): per-(vector, table) buckets, per-(query,
    * table) probe sets at flips ≤ 1, levels L ∈ {1, 2, 4} probing
    * tables t < L, candidates DISTINCT over the table union (a vector
    * reachable through several tables scores once — the probe's
    * distinct), per-(level, query) top-10 by exact cosine, the
    * standard recall row per level; `n_buckets` counts the stored
    * (t, bucket) partitions the level's probe union touches. */
  private lazy val lshMultiTableGridOracleSql: String = {
    val all = graft.ops.Similarity.planeVectors(24, 64)
    val rows = all.zipWithIndex.map { case (row, i) =>
      s"(${i / 6}, ${i % 6}, [${row.mkString(",")}])"
    }.mkString(",")
    val flips = (0 to 6).map(i => s"(${if (i == 0) 0L else 1L << (i - 1)})")
      .mkString(",")
    s"""WITH raw AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS rv
         FROM embeddings),
       e AS (SELECT vec_id,
         list_transform(rv, x -> x / sqrt(list_dot_product(rv, rv))) AS v
         FROM raw),
       $evalTruthCtes,
       pl(t, p, pv) AS (VALUES $rows),
       d AS (SELECT e.vec_id, pl.t, pl.p,
           list_dot_product(e.v, pl.pv) AS dp
         FROM e, pl),
       b AS (SELECT vec_id, t,
           CAST(sum(CASE WHEN dp >= 0 THEN 1<<p ELSE 0 END) AS BIGINT)
           AS bucket FROM d GROUP BY 1, 2),
       fm(m) AS (VALUES $flips),
       lv(l) AS (VALUES (1), (2), (4)),
       qprobe AS (SELECT DISTINCT lv.l, q.query_id, bq.t,
           xor(bq.bucket, fm.m) AS pb
         FROM q JOIN b bq ON bq.vec_id = q.query_id, fm, lv
         WHERE bq.t < lv.l),
       nb AS (SELECT u.l, count(*) AS n_buckets
         FROM (SELECT DISTINCT l, t, pb FROM qprobe) u
         JOIN (SELECT DISTINCT t, bucket FROM b) sb
           ON sb.t = u.t AND sb.bucket = u.pb
         GROUP BY 1),
       cand AS (SELECT DISTINCT p.l, p.query_id, bv.vec_id
         FROM b bv JOIN qprobe p ON bv.t = p.t AND bv.bucket = p.pb),
       sc AS (SELECT c.l, c.query_id, c.vec_id,
           round(list_dot_product(e.v, q2.qv), 4) AS cos
         FROM cand c JOIN e ON e.vec_id = c.vec_id
         JOIN q q2 ON q2.query_id = c.query_id),
       approx AS (SELECT l, query_id, vec_id FROM (SELECT l, query_id,
           vec_id, row_number() OVER (PARTITION BY l, query_id
             ORDER BY cos DESC, vec_id) AS rk FROM sc) ar
         WHERE rk <= 10),
       hits AS (SELECT a.l, count(*) AS n_hit
         FROM approx a JOIN truth USING (query_id, vec_id) GROUP BY 1)
       SELECT CAST(nb.l AS BIGINT) AS n_tables,
         CAST(nb.n_buckets AS BIGINT) AS n_buckets,
         CAST(10 AS BIGINT) AS k,
         CAST((SELECT count(DISTINCT query_id) FROM truth) AS BIGINT)
           AS n_queries,
         CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
         round(coalesce(h.n_hit, 0) * 1.0 /
           ((SELECT count(DISTINCT query_id) FROM truth) * 10), 4)
           AS recall
       FROM nb LEFT JOIN hits h ON h.l = nb.l
       ORDER BY n_tables"""
  }

  /** The [[evalTruthCtes]] `q`/`truth` pair with the truth restricted
    * to `vec_id % mod = 1` — the filtered-recall oracles' shared
    * prefix (qe48/qe49/qe50; expects `e` in scope). */
  private def filteredEvalTruthCtes(mod: Int): String =
    s"""q AS (SELECT vec_id AS query_id, v AS qv FROM e
         WHERE vec_id < 100),
       tscore AS (SELECT q.query_id, e.vec_id,
           round(list_dot_product(e.v, q.qv), 4) AS cos
         FROM e, q WHERE e.vec_id % $mod = 1),
       truth AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cos DESC, vec_id) AS rk FROM tscore) tr
         WHERE rk <= 10)"""

  /** qe48: the qe42 int8 two-stage machinery with candidates (and the
    * truth) restricted to `vec_id % 4 = 1` — stats stay GLOBAL (the
    * index quantized the full corpus), only the stage-1 candidate set
    * filters, exactly where the Spark probe's attrFilter prunes the
    * codes scan. */
  private lazy val quantizedFilteredRecallOracleSql: String =
    s"""WITH raw AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS rv
         FROM embeddings),
       e AS (SELECT vec_id,
         list_transform(rv, x -> x / sqrt(list_dot_product(rv, rv))) AS v
         FROM raw),
       ${filteredEvalTruthCtes(4)},
       ex AS (SELECT vec_id, unnest(range(64)) AS dim,
           floor(unnest(v) * 10000.0) AS x_e4 FROM e),
       stats AS (SELECT dim, min(x_e4) AS mn, max(x_e4) AS mx
         FROM ex GROUP BY 1),
       qdec AS (SELECT ex.vec_id, ex.dim,
           s.mn * 255.0 + (CASE WHEN s.mx = s.mn THEN 0.0
             ELSE least(floor((ex.x_e4 - s.mn) * 255
               / CAST(s.mx - s.mn AS DOUBLE)), 255.0) END)
             * (s.mx - s.mn) AS dv
         FROM ex JOIN stats s USING (dim)),
       iq AS (SELECT query_id, unnest(range(64)) AS dim,
           floor(unnest(qv) * 10000.0) AS qe4 FROM q),
       isc AS (SELECT iq.query_id, d.vec_id, sum(d.dv * iq.qe4) AS iscore
         FROM qdec d JOIN iq USING (dim)
         WHERE d.vec_id % 4 = 1 GROUP BY 1, 2),
       shortq AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY iscore DESC, vec_id) AS srk FROM isc) sh
         WHERE srk <= 50),
       rrq AS (SELECT s.query_id, s.vec_id,
           round(list_dot_product(e.v, q2.qv), 4) AS cos
         FROM shortq s JOIN e ON e.vec_id = s.vec_id
         JOIN q q2 ON q2.query_id = s.query_id),
       approx AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cos DESC, vec_id) AS rk FROM rrq) ar
         WHERE rk <= 10)
       $recallRowSelect"""

  /** qe49: the qe43 binary two-stage machinery with candidates (and
    * the truth) restricted to `vec_id % 4 = 1` — query signatures
    * still come from the unfiltered bits by id; only the Hamming
    * candidate scan filters. */
  private lazy val binaryFilteredRecallOracleSql: String =
    s"""WITH raw AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS rv
         FROM embeddings),
       e AS (SELECT vec_id,
         list_transform(rv, x -> x / sqrt(list_dot_product(rv, rv))) AS v
         FROM raw),
       ${filteredEvalTruthCtes(4)},
       el AS (SELECT vec_id, generate_subscripts(embedding, 1) AS d,
           CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
       bbits AS (SELECT vec_id,
           CAST(sum(CASE WHEN d <= 32 AND x >= 0
             THEN CAST(1 AS BIGINT) << (d - 1) ELSE 0 END)
             AS BIGINT) AS lo,
           CAST(sum(CASE WHEN d > 32 AND d <= 64 AND x >= 0
             THEN CAST(1 AS BIGINT) << (d - 33) ELSE 0 END)
             AS BIGINT) AS hi
         FROM el GROUP BY 1),
       qsig AS (SELECT q.query_id, b.lo AS qlo, b.hi AS qhi
         FROM q JOIN bbits b ON b.vec_id = q.query_id),
       shortq AS (SELECT query_id, vec_id FROM (SELECT s.query_id,
           b.vec_id, row_number() OVER (PARTITION BY s.query_id
             ORDER BY bit_count(xor(b.lo, s.qlo))
               + bit_count(xor(b.hi, s.qhi)), b.vec_id) AS srk
           FROM bbits b, qsig s WHERE b.vec_id % 4 = 1) sh
         WHERE srk <= 50),
       rrq AS (SELECT s.query_id, s.vec_id,
           round(list_dot_product(e.v, q2.qv), 4) AS cos
         FROM shortq s JOIN e ON e.vec_id = s.vec_id
         JOIN q q2 ON q2.query_id = s.query_id),
       approx AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cos DESC, vec_id) AS rk FROM rrq) ar
         WHERE rk <= 10)
       $recallRowSelect"""

  /** qe50: the qe41 LSH plane/bucket machinery with candidates (and
    * the truth) restricted to `vec_id % 4 = 1` — bucket geometry and
    * probe sets are unchanged (buckets hash the vector, not the
    * attribute); only the candidate pool inside the probed buckets
    * shrinks. */
  private lazy val lshFilteredRecallOracleSql: String = {
    val planes = graft.ops.Similarity.planeVectors(6, 64)
    val rows = planes.zipWithIndex.map { case (row, p) =>
      s"($p, [${row.mkString(",")}])"
    }.mkString(",")
    val flips = (0 to 6).map(i => s"(${if (i == 0) 0L else 1L << (i - 1)})")
      .mkString(",")
    s"""WITH raw AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS rv
         FROM embeddings),
       e AS (SELECT vec_id,
         list_transform(rv, x -> x / sqrt(list_dot_product(rv, rv))) AS v
         FROM raw),
       ${filteredEvalTruthCtes(4)},
       pl(p, pv) AS (VALUES $rows),
       d AS (SELECT e.vec_id, pl.p, list_dot_product(e.v, pl.pv) AS dp
         FROM e, pl),
       b AS (SELECT vec_id,
           CAST(sum(CASE WHEN dp >= 0 THEN 1<<p ELSE 0 END) AS BIGINT)
           AS bucket FROM d GROUP BY 1),
       qprobe AS (SELECT q.query_id, xor(bq.bucket, m.m) AS pb
         FROM q JOIN b bq ON bq.vec_id = q.query_id,
           (VALUES $flips) m(m)),
       cand AS (SELECT p.query_id, e.vec_id,
           round(list_dot_product(e.v, q2.qv), 4) AS cos
         FROM e JOIN b USING (vec_id)
           JOIN qprobe p ON b.bucket = p.pb
           JOIN q q2 ON q2.query_id = p.query_id
         WHERE e.vec_id % 4 = 1),
       approx AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cos DESC, vec_id) AS rk FROM cand) ar
         WHERE rk <= 10)
       $recallRowSelect"""
  }

  /** qe53: [[lshFilteredRecallOracleSql]] on the MULTI-TABLE geometry
    * — 24 literal planes keyed (t, p), per-(vector, table) buckets,
    * each query probing its bucket + the 6 one-bit flips in all 4
    * tables, candidates DISTINCT over the table union and restricted
    * to `vec_id % 4 = 1`, top-10 by exact cosine, recall vs the
    * filtered truth. */
  private lazy val lshMultiFilteredRecallOracleSql: String = {
    val all = graft.ops.Similarity.planeVectors(24, 64)
    val rows = all.zipWithIndex.map { case (row, i) =>
      s"(${i / 6}, ${i % 6}, [${row.mkString(",")}])"
    }.mkString(",")
    val flips = (0 to 6).map(i => s"(${if (i == 0) 0L else 1L << (i - 1)})")
      .mkString(",")
    s"""WITH raw AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS rv
         FROM embeddings),
       e AS (SELECT vec_id,
         list_transform(rv, x -> x / sqrt(list_dot_product(rv, rv))) AS v
         FROM raw),
       ${filteredEvalTruthCtes(4)},
       pl(t, p, pv) AS (VALUES $rows),
       d AS (SELECT e.vec_id, pl.t, pl.p,
           list_dot_product(e.v, pl.pv) AS dp
         FROM e, pl),
       b AS (SELECT vec_id, t,
           CAST(sum(CASE WHEN dp >= 0 THEN 1<<p ELSE 0 END) AS BIGINT)
           AS bucket FROM d GROUP BY 1, 2),
       qprobe AS (SELECT DISTINCT q.query_id, bq.t,
           xor(bq.bucket, m.m) AS pb
         FROM q JOIN b bq ON bq.vec_id = q.query_id,
           (VALUES $flips) m(m)),
       cand AS (SELECT DISTINCT p.query_id, bv.vec_id
         FROM b bv JOIN qprobe p ON bv.t = p.t AND bv.bucket = p.pb
         WHERE bv.vec_id % 4 = 1),
       sc AS (SELECT c.query_id, c.vec_id,
           round(list_dot_product(e.v, q2.qv), 4) AS cos
         FROM cand c JOIN e ON e.vec_id = c.vec_id
         JOIN q q2 ON q2.query_id = c.query_id),
       approx AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cos DESC, vec_id) AS rk FROM sc) ar
         WHERE rk <= 10)
       $recallRowSelect"""
  }

  /** qe42: recall@10 of the multi-query int8 two-stage probe — the
    * qe10 affine-code machinery generalized to the 100-query batch
    * with an EXACT-INTEGER stage-1: the stored code decodes to the
    * integer grid mn·255 + code·(mx−mn), the query to its
    * 1e-4-floored integer vector, and the shortlist ranks by their
    * exact integer dot (bit-identical across engines and aggregation
    * orders), then the 50-candidate exact-cosine rerank and the
    * standard recall row. */
  private lazy val quantizedBatchRecallOracleSql: String =
    s"""WITH raw AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS rv
         FROM embeddings),
       e AS (SELECT vec_id,
         list_transform(rv, x -> x / sqrt(list_dot_product(rv, rv))) AS v
         FROM raw),
       $evalTruthCtes,
       ex AS (SELECT vec_id, unnest(range(64)) AS dim,
           floor(unnest(v) * 10000.0) AS x_e4 FROM e),
       stats AS (SELECT dim, min(x_e4) AS mn, max(x_e4) AS mx
         FROM ex GROUP BY 1),
       qdec AS (SELECT ex.vec_id, ex.dim,
           s.mn * 255.0 + (CASE WHEN s.mx = s.mn THEN 0.0
             ELSE least(floor((ex.x_e4 - s.mn) * 255
               / CAST(s.mx - s.mn AS DOUBLE)), 255.0) END)
             * (s.mx - s.mn) AS dv
         FROM ex JOIN stats s USING (dim)),
       iq AS (SELECT query_id, unnest(range(64)) AS dim,
           floor(unnest(qv) * 10000.0) AS qe4 FROM q),
       isc AS (SELECT iq.query_id, d.vec_id, sum(d.dv * iq.qe4) AS iscore
         FROM qdec d JOIN iq USING (dim) GROUP BY 1, 2),
       shortq AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY iscore DESC, vec_id) AS srk FROM isc) sh
         WHERE srk <= 50),
       rrq AS (SELECT s.query_id, s.vec_id,
           round(list_dot_product(e.v, q2.qv), 4) AS cos
         FROM shortq s JOIN e ON e.vec_id = s.vec_id
         JOIN q q2 ON q2.query_id = s.query_id),
       approx AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cos DESC, vec_id) AS rk FROM rrq) ar
         WHERE rk <= 10)
       $recallRowSelect"""

  /** qe43: recall@10 of the multi-query binary two-stage probe — the
    * qe23/qe25 sign-bit machinery generalized to the 100-query batch:
    * per-vector packed sign bits, each query's signature looked up by
    * id, per-query 50-deep Hamming shortlists (exact integer
    * distance), exact-cosine rerank, the standard recall row. */
  private lazy val binaryBatchRecallOracleSql: String =
    s"""WITH raw AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS rv
         FROM embeddings),
       e AS (SELECT vec_id,
         list_transform(rv, x -> x / sqrt(list_dot_product(rv, rv))) AS v
         FROM raw),
       $evalTruthCtes,
       el AS (SELECT vec_id, generate_subscripts(embedding, 1) AS d,
           CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
       bbits AS (SELECT vec_id,
           CAST(sum(CASE WHEN d <= 32 AND x >= 0
             THEN CAST(1 AS BIGINT) << (d - 1) ELSE 0 END)
             AS BIGINT) AS lo,
           CAST(sum(CASE WHEN d > 32 AND d <= 64 AND x >= 0
             THEN CAST(1 AS BIGINT) << (d - 33) ELSE 0 END)
             AS BIGINT) AS hi
         FROM el GROUP BY 1),
       qsig AS (SELECT q.query_id, b.lo AS qlo, b.hi AS qhi
         FROM q JOIN bbits b ON b.vec_id = q.query_id),
       shortq AS (SELECT query_id, vec_id FROM (SELECT s.query_id,
           b.vec_id, row_number() OVER (PARTITION BY s.query_id
             ORDER BY bit_count(xor(b.lo, s.qlo))
               + bit_count(xor(b.hi, s.qhi)), b.vec_id) AS srk
           FROM bbits b, qsig s) sh
         WHERE srk <= 50),
       rrq AS (SELECT s.query_id, s.vec_id,
           round(list_dot_product(e.v, q2.qv), 4) AS cos
         FROM shortq s JOIN e ON e.vec_id = s.vec_id
         JOIN q q2 ON q2.query_id = s.query_id),
       approx AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cos DESC, vec_id) AS rk FROM rrq) ar
         WHERE rk <= 10)
       $recallRowSelect"""

  /** The multimodal decode truth as a shared CTE (qm01/qm02/qm03) —
    * every field re-derived from the SAME integer arithmetic that
    * parameterized the synthesized container bytes
    * (graft.ops.Multimodal.synthParams): kind = id % 11 →
    * bmp / wav / mp4 / avi / mkv / png / gif / jpeg / aiff / au /
    * corrupt. The corrupt kind's truth is the STUB profile: `h`
    * re-derives java.util.Arrays.hashCode of the 4 malformed bytes in
    * closed form (31-polynomial over bytes that are plain arithmetic
    * in the id — all intermediates small positive ints), so the
    * fall-through contract is oracle-pinned, not just spec'd. */
  private lazy val mediaTruthCtes: String =
    """mth AS (SELECT CAST(doc_id AS BIGINT) AS media_id, doc_id,
         923521 + 29791 * (1 + doc_id % 113)
           + 961 * (1 + (doc_id // 7) % 109)
           + 31 * (1 + (doc_id // 11) % 107)
           + (1 + (doc_id // 13) % 103) AS h
       FROM documents),
       mt AS (SELECT media_id,
       CASE doc_id % 11
         WHEN 0 THEN 'bmp' WHEN 1 THEN 'wav' WHEN 2 THEN 'mp4:avc1'
         WHEN 3 THEN 'avi:mjpg' WHEN 4 THEN 'mkv:V_VP9'
         WHEN 5 THEN 'png' WHEN 6 THEN 'gif' WHEN 7 THEN 'jpeg'
         WHEN 8 THEN 'aif' WHEN 9 THEN 'au'
         ELSE (CASE h % 4 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
           WHEN 2 THEN 'wav' ELSE 'mp4' END) END AS format,
       CAST(CASE doc_id % 11
         WHEN 0 THEN 16 + doc_id % 317
         WHEN 1 THEN 1 + doc_id % 2
         WHEN 2 THEN 160 + doc_id % 160
         WHEN 3 THEN 320 + doc_id % 320
         WHEN 4 THEN 640 + doc_id % 128
         WHEN 5 THEN 16 + doc_id % 509
         WHEN 6 THEN 8 + doc_id % 251
         WHEN 7 THEN 32 + doc_id % 441
         WHEN 8 THEN 1 + doc_id % 2
         WHEN 9 THEN 1 + doc_id % 2
         ELSE 64 + h % 1024 END AS INTEGER) AS width,
       CAST(CASE doc_id % 11
         WHEN 0 THEN 16 + (doc_id // 5) % 211
         WHEN 1 THEN 16
         WHEN 2 THEN 120 + doc_id % 120
         WHEN 3 THEN 240 + doc_id % 240
         WHEN 4 THEN 360 + doc_id % 72
         WHEN 5 THEN 16 + (doc_id // 11) % 383
         WHEN 6 THEN 8 + (doc_id // 3) % 199
         WHEN 7 THEN 32 + (doc_id // 7) % 333
         WHEN 8 THEN 16
         WHEN 9 THEN 16
         ELSE 64 + (h // 7) % 1024 END AS INTEGER) AS height,
       CAST(CASE doc_id % 11
         WHEN 0 THEN 1
         WHEN 1 THEN 8000 * (1 + doc_id % 9)
         WHEN 2 THEN 24 + doc_id % 240
         WHEN 3 THEN 25 + doc_id % 250
         WHEN 4 THEN 1
         WHEN 5 THEN 1 WHEN 6 THEN 1 WHEN 7 THEN 1
         WHEN 8 THEN 8000 * (1 + doc_id % 7)
         WHEN 9 THEN 8000 * (1 + doc_id % 6)
         ELSE 1 + h % 240 END AS INTEGER) AS n_frames,
       CAST(CASE doc_id % 11
         WHEN 0 THEN 0
         WHEN 1 THEN 1000 * (1 + doc_id % 9)
         WHEN 2 THEN 1000 + doc_id % 5000
         WHEN 3 THEN (25 + doc_id % 250) * 40
         WHEN 4 THEN 2000 + doc_id % 3000
         WHEN 5 THEN 0 WHEN 6 THEN 0 WHEN 7 THEN 0
         WHEN 8 THEN 1000 * (1 + doc_id % 7)
         WHEN 9 THEN 1000 * (1 + doc_id % 6)
         ELSE 4 END AS BIGINT) AS duration_ms
       FROM mth)"""

  private lazy val mediaDecodeOracleSql: String =
    s"""WITH $mediaTruthCtes
       SELECT media_id, format, width, height, n_frames, duration_ms
       FROM mt ORDER BY media_id"""

  /** qm02: the aspect-preserving resize targets over the media truth
    * — identical double arithmetic to graft.ops.Multimodal.resizePlan
    * (least of the two bounding-box ratios and 1.0, floor, min 1). */
  private lazy val mediaResizeOracleSql: String =
    s"""WITH $mediaTruthCtes
       SELECT media_id, width, height,
         CAST(greatest(floor(width *
           least(256.0 / width, 256.0 / height, 1.0)), 1) AS INTEGER)
           AS target_width,
         CAST(greatest(floor(height *
           least(256.0 / width, 256.0 / height, 1.0)), 1) AS INTEGER)
           AS target_height
       FROM mt ORDER BY media_id"""

  /** qm03: the frame-sampling plan over the media truth — every 250th
    * frame index below the decoded frame count (Spark's inclusive
    * sequence(0, n-1, 250) ≡ DuckDB's exclusive range(0, n, 250)). */
  private lazy val mediaFrameSampleOracleSql: String =
    s"""WITH $mediaTruthCtes
       SELECT media_id,
         CAST(unnest(range(0, n_frames, 250)) AS INTEGER) AS frame_idx
       FROM mt WHERE n_frames > 0 ORDER BY media_id, frame_idx"""

  /** qm04/qm05: the pixel-aHash truth — every 8×8 BMP pixel re-derived
    * by the [[graft.ops.Multimodal.grayAt]] arithmetic (base pattern
    * from id/4, the id%4 residue inverting exactly 2k pixels via the
    * bijective 7p mod 64 window), the 64-bit average hash as an exact
    * integer threshold (v·64 > Σv, strict), packed into two unsigned
    * 32-bit halves `hb(media_id, ahash_lo, ahash_hi)`. All
    * intermediates are small non-negative integers — no float, no
    * sign-bit, engine-exact. */
  private lazy val imageAHashCtes: String =
    """WITH ids AS (SELECT doc_id AS media_id FROM documents
         WHERE doc_id < 2000),
       px AS (SELECT media_id, r.p AS p,
           (11 + (media_id // 4) * 31 + 13 * r.p * r.p
             + (media_id // 4) * r.p) % 256 AS raw
         FROM ids CROSS JOIN range(0, 64) r(p)),
       gv AS (SELECT media_id, p,
           CASE WHEN media_id % 4 > 0
               AND (7 * p + media_id // 4 + media_id % 4) % 64
                 < 2 * (media_id % 4)
             THEN 255 - raw ELSE raw END AS v
         FROM px),
       gt AS (SELECT media_id, p, v,
           sum(v) OVER (PARTITION BY media_id) AS tot FROM gv),
       hb AS (SELECT media_id,
           CAST(sum(CASE WHEN p < 32 AND v * 64 > tot
             THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT)
             AS ahash_lo,
           CAST(sum(CASE WHEN p >= 32 AND v * 64 > tot
             THEN (CAST(1 AS BIGINT) << (p - 32)) ELSE 0 END) AS BIGINT)
             AS ahash_hi
         FROM gt GROUP BY 1)"""

  /** qm06/qm07: the sample-dHash truth — every 16-bit PCM frame
    * re-derived by the [[graft.ops.Multimodal.sampleAt]] arithmetic
    * (base waveform from id/4, the id%4 residue tripling exactly k of
    * the 64 windows via the bijective 5w mod 64 test), folded into 64
    * per-window |sample| sums, and fingerprinted by the circular
    * difference-hash (bit w set iff window (w+1) mod 64 is strictly
    * louder), packed into two unsigned 32-bit halves
    * `fb(media_id, fp_lo, fp_hi)`. All intermediates are small exact
    * integers (|sample| ≤ 4500, energies < 2^22) — engine-exact. */
  /** The audio chain WITHOUT the leading `ids` CTE, so qm10 can graft
    * it onto [[imageAHashCtes]] (both chains share the identical
    * `ids` definition). */
  private lazy val audioFpCtesBody: String =
    """sm AS (SELECT media_id, r.t AS t,
           (7 + (media_id // 4) * 37 + 11 * r.t * r.t
             + (media_id // 4) * r.t) % 3001 - 1500 AS raw
         FROM ids CROSS JOIN range(0, 512) r(t)),
       sv AS (SELECT media_id, t,
           CASE WHEN media_id % 4 > 0
               AND (5 * (t // 8) + media_id // 4 + media_id % 4) % 64
                 < media_id % 4
             THEN raw * 3 ELSE raw END AS s
         FROM sm),
       we AS (SELECT media_id, t // 8 AS w, sum(abs(s)) AS e
         FROM sv GROUP BY 1, 2),
       wn AS (SELECT a.media_id, a.w, a.e AS e0, b.e AS e1
         FROM we a JOIN we b ON b.media_id = a.media_id
           AND b.w = (a.w + 1) % 64),
       fb AS (SELECT media_id,
           CAST(sum(CASE WHEN w < 32 AND e1 > e0
             THEN (CAST(1 AS BIGINT) << w) ELSE 0 END) AS BIGINT)
             AS fp_lo,
           CAST(sum(CASE WHEN w >= 32 AND e1 > e0
             THEN (CAST(1 AS BIGINT) << (w - 32)) ELSE 0 END) AS BIGINT)
             AS fp_hi
         FROM wn GROUP BY 1)"""

  private lazy val audioFpCtes: String =
    """WITH ids AS (SELECT doc_id AS media_id FROM documents
         WHERE doc_id < 2000),
       """ + audioFpCtesBody

  /** qm13/qm14 (and the qm10/qm11 grafts): the video truth — every
    * pixel of every frame re-derived by the
    * [[graft.ops.Multimodal.vidGrayAt]] arithmetic, each frame's
    * aHash as two unsigned 32-bit halves (`vhb(media_id, f, fh_lo,
    * fh_hi)` — the per-frame mean threshold `v·64 > tot` partitioned
    * by (media, frame)), then the temporal fingerprint `vfp` by
    * byte-sampling frame f's hash at byte f (disjoint masks, so the
    * halves sum exactly). No leading `ids` CTE, so the body grafts
    * onto [[imageAHashCtes]] like the audio chain. */
  private lazy val videoFpCtesBody: String =
    """vpx AS (SELECT media_id, f.f AS f, r.p AS p,
           (17 + (media_id // 4) * 29 + 7 * f.f * f.f
             + 13 * r.p * r.p + (media_id // 4) * r.p
             + f.f * r.p) % 256 AS raw
         FROM ids CROSS JOIN range(0, 8) f(f)
           CROSS JOIN range(0, 64) r(p)),
       vgv AS (SELECT media_id, f, p,
           CASE WHEN media_id % 4 > 0
               AND (7 * p + media_id // 4 + media_id % 4 + f) % 64
                 < 2 * (media_id % 4)
             THEN 255 - raw ELSE raw END AS v
         FROM vpx),
       vgt AS (SELECT media_id, f, p, v,
           sum(v) OVER (PARTITION BY media_id, f) AS tot FROM vgv),
       vhb AS (SELECT media_id, f,
           CAST(sum(CASE WHEN p < 32 AND v * 64 > tot
             THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT)
             AS fh_lo,
           CAST(sum(CASE WHEN p >= 32 AND v * 64 > tot
             THEN (CAST(1 AS BIGINT) << (p - 32)) ELSE 0 END) AS BIGINT)
             AS fh_hi
         FROM vgt GROUP BY 1, 2),
       vfp AS (SELECT media_id,
           CAST(sum(CASE WHEN f < 4
             THEN fh_lo & (CAST(255 AS BIGINT) << (8 * f))
             ELSE 0 END) AS BIGINT) AS tfp_lo,
           CAST(sum(CASE WHEN f >= 4
             THEN fh_hi & (CAST(255 AS BIGINT) << (8 * (f - 4)))
             ELSE 0 END) AS BIGINT) AS tfp_hi
         FROM vhb GROUP BY 1)"""

  private lazy val videoFpCtes: String =
    """WITH ids AS (SELECT doc_id AS media_id FROM documents
         WHERE doc_id < 2000),
       """ + videoFpCtesBody

  /** qe39: the IVF-PQ operating-point grid — recall@10 at
    * {8×16, 16×64 codes} × {rerank 25, 50, 100}, nProbe 8. Two
    * resolutions of [[pqResolutionCtes]] share one residual grid and
    * one query-residual table; each resolution's 100-deep ADC
    * shortlist (with its rank) serves all three rerank levels. */
  private lazy val ivfPqGridOracleSql: String = {
    def tail(p: String, dps: Int): String =
      s"""${p}qd AS (SELECT qr.query_id, qr.cell,
           (qr.dim - 1) // $dps AS m, ${p}cb.cidx,
           sum((qr.r - ${p}cb.cx) * (qr.r - ${p}cb.cx)) AS qdist
         FROM qr JOIN ${p}cb ON ${p}cb.m = ((qr.dim - 1) // $dps)
           AND ${p}cb.dim = qr.dim
         GROUP BY 1, 2, 3, 4),
       ${p}adcs AS (SELECT ${p}qd.query_id, c.vec_id,
           sum(${p}qd.qdist) AS adc_score
         FROM ${p}code c JOIN cellof cf USING (vec_id)
         JOIN ${p}qd ON ${p}qd.cell = cf.cell AND ${p}qd.m = c.m
           AND ${p}qd.cidx = c.cidx
         GROUP BY 1, 2),
       ${p}short AS (SELECT query_id, vec_id, srk FROM (SELECT query_id,
           vec_id, row_number() OVER (PARTITION BY query_id
             ORDER BY adc_score, vec_id) AS srk FROM ${p}adcs) sh
         WHERE srk <= 100),
       ${p}rr AS (SELECT s.query_id, s.vec_id, s.srk,
           round(list_dot_product(e.v, q2.qv), 4) AS cos
         FROM ${p}short s JOIN e ON e.vec_id = s.vec_id
         JOIN q q2 ON q2.query_id = s.query_id),
       ${p}apx AS (SELECT rerank, query_id, vec_id FROM (
           SELECT l.rerank, r.query_id, r.vec_id,
             row_number() OVER (PARTITION BY l.rerank, r.query_id
               ORDER BY r.cos DESC, r.vec_id) AS rk
           FROM ${p}rr r JOIN lv l ON r.srk <= l.rerank) a
         WHERE rk <= 10),
       ${p}hits AS (SELECT rerank, CAST(count(*) AS BIGINT) AS n_hit
         FROM ${p}apx JOIN truth USING (query_id, vec_id) GROUP BY 1)"""
    def half(p: String, numSub: Int, cbSize: Int): String =
      s"""SELECT CAST($numSub AS BIGINT) AS num_sub,
           CAST($cbSize AS BIGINT) AS cb_size, l.rerank,
           CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
           round(coalesce(h.n_hit, 0) * 1.0 /
             ((SELECT count(DISTINCT query_id) FROM truth) * 10), 4)
             AS recall
         FROM lv l LEFT JOIN ${p}hits h USING (rerank)"""
    s"""$ivfPqSharedCtes,
       ${pqResolutionCtes(8, 16, "s")},
       ${pqResolutionCtes(16, 64, "")},
       $evalTruthCtes,
       crks AS (SELECT q.query_id, c.cell,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_dot_product(c.cv, q.qv) DESC, c.cell) AS crk
         FROM c2 c, q),
       probe AS (SELECT query_id, cell FROM crks WHERE crk <= 8),
       qx AS (SELECT query_id, generate_subscripts(qv, 1) AS dim,
           unnest(qv) AS x FROM q),
       qr AS (SELECT p.query_id, p.cell, qx.dim,
           floor((qx.x - cvx.c) * 1000000.0) AS r
         FROM probe p JOIN cvx ON cvx.cell = p.cell
         JOIN qx ON qx.query_id = p.query_id AND qx.dim = cvx.dim),
       lv AS (SELECT CAST(unnest([25, 50, 100]) AS BIGINT) AS rerank),
       ${tail("s", 8)},
       ${tail("", 4)}
       ${half("s", 8, 16)}
       UNION ALL
       ${half("", 16, 64)}
       ORDER BY num_sub, rerank"""
  }

  /** Shared IVF-PQ corpus-ENCODE CTEs (qe35/qe36/qe37): trained cells
    * (the [[kmeansCtes]] Lloyd machinery with the IVF seed), per-vector
    * residuals floored to the 1e-6 integer grid, the md5("pqr:")-
    * ordered residual codebook sample (64 entries), per-subspace
    * argmin codes over 16 subspaces of 4 dims (ties to the lower code
    * index) — 96-bit codes, the resolution the qe37 rerank sweep
    * showed recovers the cell ceiling. Yields `cellof`, `cvx`, `r6`,
    * `cb`, `code` for the probe tails. All distances are exact
    * integers carried in doubles — the [[pqAdcCtes]] discipline over
    * residuals. */
  private lazy val ivfPqSharedCtes: String =
    s"""${kmeansCtes(16, seedPrefix = "ivf:")},
       cellof AS (SELECT vec_id, cell FROM afin WHERE rn = 1),
       ev AS (SELECT vec_id, generate_subscripts(v, 1) AS dim,
           unnest(v) AS x FROM e),
       cvx AS (SELECT cell, generate_subscripts(cv, 1) AS dim,
           unnest(cv) AS c FROM c2),
       r6 AS (SELECT ev.vec_id, cf.cell, ev.dim,
           floor((ev.x - cvx.c) * 1000000.0) AS r
         FROM ev JOIN cellof cf USING (vec_id)
         JOIN cvx ON cvx.cell = cf.cell AND cvx.dim = ev.dim)"""

  /** One code RESOLUTION's encode CTEs over [[ivfPqSharedCtes]]'
    * residual grid: the md5("pqr:")-ordered `cbSize`-entry residual
    * codebook sample and per-subspace argmin codes over `numSub`
    * subspaces of 64/numSub dims. `p` prefixes the CTE names so two
    * resolutions coexist in one oracle (qe39's grid); the empty prefix
    * reproduces the qe35/36/37 names verbatim. */
  private def pqResolutionCtes(numSub: Int, cbSize: Int,
      p: String): String = {
    val dps = 64 / numSub
    s"""${p}cbsel AS (SELECT vec_id, row_number() OVER (ORDER BY
           md5('pqr:' || CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cidx
         FROM e QUALIFY cidx < $cbSize),
       ${p}cb AS (SELECT s.cidx, r6.dim, r6.r AS cx,
           (r6.dim - 1) // $dps AS m
         FROM ${p}cbsel s JOIN r6 USING (vec_id)),
       ${p}d_ AS (SELECT r6.vec_id, (r6.dim - 1) // $dps AS m,
           ${p}cb.cidx,
           sum((r6.r - ${p}cb.cx) * (r6.r - ${p}cb.cx)) AS dist
         FROM r6 JOIN ${p}cb ON ${p}cb.m = ((r6.dim - 1) // $dps)
           AND ${p}cb.dim = r6.dim
         GROUP BY 1, 2, 3),
       ${p}code AS (SELECT vec_id, m, cidx FROM (SELECT *, row_number()
           OVER (PARTITION BY vec_id, m ORDER BY dist, cidx) AS crn
           FROM ${p}d_) cd WHERE crn = 1)"""
  }

  private lazy val ivfPqEncodeCtes: String =
    s"""$ivfPqSharedCtes,
       ${pqResolutionCtes(16, 64, "")}"""

  /** Shared oracle for qe35/qe36 (the persisted index serves identical
    * bytes): probe the 4 best trained cells for vec 0, score the probed
    * cells' codes against the per-cell exact-integer residual tables. */
  private lazy val ivfPqAdcOracleSql: String =
    s"""$ivfPqEncodeCtes,
       qv_ AS (SELECT v FROM e WHERE vec_id = 0),
       probe AS (SELECT c.cell FROM c2 c, qv_
         ORDER BY list_dot_product(c.cv, qv_.v) DESC, c.cell LIMIT 4),
       qx AS (SELECT generate_subscripts(v, 1) AS dim, unnest(v) AS x
         FROM qv_),
       qr AS (SELECT p.cell, qx.dim,
           floor((qx.x - cvx.c) * 1000000.0) AS r
         FROM probe p JOIN cvx ON cvx.cell = p.cell
         JOIN qx ON qx.dim = cvx.dim),
       qd_ AS (SELECT qr.cell, (qr.dim - 1) // 4 AS m, cb.cidx,
           sum((qr.r - cb.cx) * (qr.r - cb.cx)) AS qdist
         FROM qr JOIN cb ON cb.m = ((qr.dim - 1) // 4)
           AND cb.dim = qr.dim
         GROUP BY 1, 2, 3),
       sc AS (SELECT c.vec_id, CAST(sum(q.qdist) AS BIGINT) AS adc_score
         FROM code c JOIN cellof cf USING (vec_id)
         JOIN qd_ q ON q.cell = cf.cell AND q.m = c.m AND q.cidx = c.cidx
         GROUP BY 1)
       SELECT vec_id, adc_score, CAST(row_number() OVER (
           ORDER BY adc_score, vec_id) AS BIGINT) AS rank
       FROM sc QUALIFY rank <= 10 ORDER BY rank"""

  /** qe45/qe47: the qe37 probe tail with BOTH sides attribute-filtered
    * to `vec_id % mod = 1` (the stored `lang`/`lang16` attributes'
    * arithmetic — mod 4 for qe45, 16 for qe47's selectivity point):
    * truth is brute force over the filtered corpus, the approximate
    * side filters candidates in the ADC stage (exactly where the Spark
    * probe's attrFilter prunes the codes scan), shortlist 100, rerank,
    * recall row. */
  private def ivfPqFilteredRecallOracleSql(mod: Int): String =
    s"""$ivfPqEncodeCtes,
       q AS (SELECT vec_id AS query_id, v AS qv FROM e
         WHERE vec_id < 100),
       tscore AS (SELECT q.query_id, e.vec_id,
           round(list_dot_product(e.v, q.qv), 4) AS cos
         FROM e, q WHERE e.vec_id % $mod = 1),
       truth AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cos DESC, vec_id) AS rk FROM tscore) tr
         WHERE rk <= 10),
       crks AS (SELECT q.query_id, c.cell,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_dot_product(c.cv, q.qv) DESC, c.cell) AS crk
         FROM c2 c, q),
       probe AS (SELECT query_id, cell FROM crks WHERE crk <= 8),
       qx AS (SELECT query_id, generate_subscripts(qv, 1) AS dim,
           unnest(qv) AS x FROM q),
       qr AS (SELECT p.query_id, p.cell, qx.dim,
           floor((qx.x - cvx.c) * 1000000.0) AS r
         FROM probe p JOIN cvx ON cvx.cell = p.cell
         JOIN qx ON qx.query_id = p.query_id AND qx.dim = cvx.dim),
       qd_ AS (SELECT qr.query_id, qr.cell, (qr.dim - 1) // 4 AS m,
           cb.cidx, sum((qr.r - cb.cx) * (qr.r - cb.cx)) AS qdist
         FROM qr JOIN cb ON cb.m = ((qr.dim - 1) // 4)
           AND cb.dim = qr.dim
         GROUP BY 1, 2, 3, 4),
       adcs AS (SELECT qd_.query_id, c.vec_id,
           sum(qd_.qdist) AS adc_score
         FROM code c JOIN cellof cf USING (vec_id)
         JOIN qd_ ON qd_.cell = cf.cell AND qd_.m = c.m
           AND qd_.cidx = c.cidx
         WHERE c.vec_id % $mod = 1
         GROUP BY 1, 2),
       short AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY adc_score, vec_id) AS srk FROM adcs) sh
         WHERE srk <= 100),
       rr AS (SELECT s.query_id, s.vec_id,
           round(list_dot_product(e.v, q2.qv), 4) AS cos
         FROM short s JOIN e ON e.vec_id = s.vec_id
         JOIN q q2 ON q2.query_id = s.query_id),
       approx AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cos DESC, vec_id) AS rk FROM rr) ar
         WHERE rk <= 10)
       $recallRowSelect"""

  /** qe37: recall@10 of the persisted IVF-PQ two-stage probe over the
    * 100-query batch — per query, ADC over the 8 best trained cells'
    * codes, a 50-candidate shortlist, exact-cosine rerank, then the
    * standard recall row. */
  private lazy val ivfPqRecallOracleSql: String =
    s"""$ivfPqEncodeCtes,
       $evalTruthCtes,
       crks AS (SELECT q.query_id, c.cell,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_dot_product(c.cv, q.qv) DESC, c.cell) AS crk
         FROM c2 c, q),
       probe AS (SELECT query_id, cell FROM crks WHERE crk <= 8),
       qx AS (SELECT query_id, generate_subscripts(qv, 1) AS dim,
           unnest(qv) AS x FROM q),
       qr AS (SELECT p.query_id, p.cell, qx.dim,
           floor((qx.x - cvx.c) * 1000000.0) AS r
         FROM probe p JOIN cvx ON cvx.cell = p.cell
         JOIN qx ON qx.query_id = p.query_id AND qx.dim = cvx.dim),
       qd_ AS (SELECT qr.query_id, qr.cell, (qr.dim - 1) // 4 AS m,
           cb.cidx, sum((qr.r - cb.cx) * (qr.r - cb.cx)) AS qdist
         FROM qr JOIN cb ON cb.m = ((qr.dim - 1) // 4)
           AND cb.dim = qr.dim
         GROUP BY 1, 2, 3, 4),
       adcs AS (SELECT qd_.query_id, c.vec_id,
           sum(qd_.qdist) AS adc_score
         FROM code c JOIN cellof cf USING (vec_id)
         JOIN qd_ ON qd_.cell = cf.cell AND qd_.m = c.m
           AND qd_.cidx = c.cidx
         GROUP BY 1, 2),
       short AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY adc_score, vec_id) AS srk FROM adcs) sh
         WHERE srk <= 100),
       rr AS (SELECT s.query_id, s.vec_id,
           round(list_dot_product(e.v, q2.qv), 4) AS cos
         FROM short s JOIN e ON e.vec_id = s.vec_id
         JOIN q q2 ON q2.query_id = s.query_id),
       approx AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cos DESC, vec_id) AS rk FROM rr) ar
         WHERE rk <= 10)
       $recallRowSelect"""

  /** Shared oracle for qd65 (direct HLL) and qd68 (merged partial
    * sketches — register max-merge is associative, so both queries
    * produce byte-identical output): the whole sketch re-derived in
    * SQL — md5 first byte = register, leftmost-1-bit rank of the next
    * 32 bits via bin() (both engines strip leading zeros), EXACT bigint
    * register sum Σ 2^(40-rank), single final division + the Flajolet
    * small-range ln correction. Constants order-matched with the Spark
    * expression tree. */
  private val hllOracleSql: String =
    """WITH words AS (SELECT source,
         unnest(regexp_extract_all(lower(text), '\S+')) AS w
         FROM documents),
       h AS (SELECT source, md5(w) AS hx FROM words),
       rr AS (SELECT source,
         CAST('0x' || substring(hx, 1, 2) AS INT) AS reg,
         CAST('0x' || substring(hx, 3, 8) AS BIGINT) AS v FROM h),
       r2 AS (SELECT source, reg,
         CASE WHEN v = 0 THEN 33 ELSE 33 - length(bin(v)) END AS rank
         FROM rr),
       regs AS (SELECT source, reg, max(rank) AS mrank
         FROM r2 GROUP BY 1, 2),
       g AS (SELECT source, CAST(count(*) AS BIGINT) AS present_registers,
         sum((1::BIGINT) << (40 - mrank)) AS sum_present
         FROM regs GROUP BY 1),
       g2 AS (SELECT source, present_registers,
         256 - present_registers AS zero_registers,
         sum_present + (256 - present_registers) * 1099511627776
           AS sum_int FROM g)
       SELECT source, present_registers, zero_registers,
         round(CASE WHEN zero_registers > 0 AND
             0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0
               * 1099511627776.0 / sum_int <= 640.0
           THEN 256.0 * ln(256.0 / zero_registers)
           ELSE 0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0
               * 1099511627776.0 / sum_int END, 4) AS est_distinct
       FROM g2 ORDER BY source"""

  /** Shared oracle for qd66 (direct count-min) and qd69 (sum-merged
    * partial sketches — counters add associatively, identical result):
    * 4 hash rows from the u32 lanes of md5('0:' || w) (the Md5Lanes
    * chunk-0 layout, same as qd24), width 1024, min over rows with
    * empty buckets as 0; exact counts ride along to show the
    * exact-or-over guarantee. */
  private lazy val cmsOracleSql: String = {
    val probeList = PipelineQueries.cmsProbeTerms
      .map(t => s"'$t'").mkString(", ")
    s"""WITH words AS (SELECT
           unnest(regexp_extract_all(lower(text), '\\S+')) AS w
           FROM documents),
         lanes AS (SELECT w, r,
           CAST('0x' || substring(md5('0:' || w), 8*r + 1, 8) AS BIGINT)
             % 1024 AS bucket
           FROM words, (SELECT unnest([0, 1, 2, 3]) AS r) rs),
         sk AS (SELECT r, bucket, CAST(count(*) AS BIGINT) AS cnt
           FROM lanes GROUP BY 1, 2),
         probes AS (SELECT unnest([$probeList]) AS term),
         pl AS (SELECT term, r,
           CAST('0x' || substring(md5('0:' || term), 8*r + 1, 8) AS BIGINT)
             % 1024 AS bucket
           FROM probes, (SELECT unnest([0, 1, 2, 3]) AS r) rs),
         est AS (SELECT term, min(coalesce(cnt, 0::BIGINT)) AS cms_est
           FROM pl LEFT JOIN sk USING (r, bucket) GROUP BY 1),
         ex AS (SELECT w AS term, CAST(count(*) AS BIGINT) AS exact_n
           FROM words GROUP BY 1)
         SELECT term, coalesce(exact_n, 0::BIGINT) AS exact_n, cms_est
         FROM est LEFT JOIN ex USING (term) ORDER BY term"""
  }

  /** Shared oracle for qd77 (direct histogram sketch), qd78 (sum-merged
    * per-half sketches) and qd79 (persisted store round-trip) — all
    * three are counter-identical: the per-source token-count
    * distribution re-derived in SQL. Bucket = bit length of the
    * measure via `bin()` (the HLL-rank portability trick), quantile =
    * upper bound `2^bucket − 1` of the first bucket whose cumulative
    * count reaches q·n, rank test in pure bigint (`cum·10⁴ ≥ n·q·10⁴`).
    * The cumulative window's ORDER BY key is unique per partition, so
    * the default RANGE frame equals the Spark side's ROWS frame. */
  private val histOracleSql: String =
    """WITH d AS (SELECT source,
         CAST(len(regexp_extract_all(lower(text), '\S+')) AS BIGINT) AS m
         FROM documents),
       b AS (SELECT source,
         CASE WHEN m <= 0 THEN 0 ELSE length(bin(m)) END AS bucket
         FROM d),
       sk AS (SELECT source, bucket, CAST(count(*) AS BIGINT) AS cnt
         FROM b GROUP BY 1, 2),
       c AS (SELECT source, cnt,
         CAST(sum(cnt) OVER (PARTITION BY source ORDER BY bucket)
           AS BIGINT) AS cum,
         CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS n,
         ((1::BIGINT) << bucket) - 1 AS ub
         FROM sk)
       SELECT source, max(n) AS n_rows,
         min(CASE WHEN cum * 10000 >= n * 5000 THEN ub END) AS p50,
         min(CASE WHEN cum * 10000 >= n * 9000 THEN ub END) AS p90,
         min(CASE WHEN cum * 10000 >= n * 9900 THEN ub END) AS p99
       FROM c GROUP BY source ORDER BY source"""

  /** Parameterized HLL estimate CTE chain for qd70: derives
    * `<tag>(source, est)` over the documents matching `where` — the
    * same register/rank/sum arithmetic as [[hllOracleSql]], estimate
    * only. */
  private def hllEstCtes(tag: String, where: String): String =
    s"""${tag}w AS (SELECT source,
           unnest(regexp_extract_all(lower(text), '\\S+')) AS w
           FROM documents $where),
         ${tag}h AS (SELECT source, md5(w) AS hx FROM ${tag}w),
         ${tag}r AS (SELECT source,
           CAST('0x' || substring(hx, 1, 2) AS INT) AS reg,
           CASE WHEN CAST('0x' || substring(hx, 3, 8) AS BIGINT) = 0
             THEN 33
             ELSE 33 - length(bin(CAST('0x' || substring(hx, 3, 8)
               AS BIGINT))) END AS rank
           FROM ${tag}h),
         ${tag}m AS (SELECT source, reg, max(rank) AS mrank
           FROM ${tag}r GROUP BY 1, 2),
         ${tag}g AS (SELECT source,
           CAST(count(*) AS BIGINT) AS pres,
           sum((1::BIGINT) << (40 - mrank)) AS sp
           FROM ${tag}m GROUP BY 1),
         ${tag}g2 AS (SELECT source, 256 - pres AS zr,
           sp + (256 - pres) * 1099511627776 AS si FROM ${tag}g),
         $tag AS (SELECT source,
           round(CASE WHEN zr > 0 AND
               0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0
                 * 1099511627776.0 / si <= 640.0
             THEN 256.0 * ln(256.0 / zr)
             ELSE 0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0
                 * 1099511627776.0 / si END, 4) AS est FROM ${tag}g2)"""

  /** Shared BM25 CTE generator for qd67/qe27 — SAME constants (k1=1.2,
    * b=0.75) and literal term list as [[graft.ops.TextAnalysis.bm25TopK]];
    * the interpolated Scala doubles round-trip to identical DuckDB
    * doubles, and every arithmetic step is order-matched with the Spark
    * expression tree so round(…, 4) hash-checks. */
  private def bm25Ctes: String = {
    val terms = PipelineQueries.bm25QueryTerms
    val k1 = 1.2; val b = 0.75
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) AS tf$i"
    }.mkString(",\n           ")
    val dfAggs = terms.indices.map(i =>
      s"sum(CASE WHEN tf$i > 0 THEN 1.0 ELSE 0.0 END) AS df$i")
      .mkString(",\n           ")
    val scoreExpr = terms.indices.map { i =>
      s"ln(1.0 + (n - df$i + 0.5) / (df$i + 0.5)) * tf$i * ${k1 + 1.0}" +
        s" / (tf$i + $k1 * (${1.0 - b} + $b * dl / avgdl))"
    }.mkString("\n           + ")
    s"""WITH d AS (SELECT doc_id,
           regexp_extract_all(lower(text), '\\S+') AS toks FROM documents),
         base AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           $tfCols
           FROM d),
         st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
           $dfAggs
           FROM base),
         sc AS (SELECT doc_id, round($scoreExpr, 4) AS score
           FROM base, st)"""
  }

  /** Shared indexed-BM25 CTE generator for qd76/qe27: the persisted
    * postings probe re-derived — tf/dl over only the docs containing a
    * query term (the pruned posting lists), df from those lists, the
    * one-row stats sidecar, and each (doc, term) contribution FLOORED
    * to 1e-4 units BEFORE the per-doc sum (exact integer math,
    * independent of aggregation order), ending in
    * `isc(doc_id, score_e4)`. Constants are the same k1=1.2 / b=0.75 as
    * [[graft.ops.LexIndex.bm25TopKIndexed]]; interpolated Scala doubles
    * round-trip to identical DuckDB doubles and every arithmetic step
    * is order-matched with the Spark expression tree. */
  private def bm25IndexedCtes: String = bm25IndexedCtes("")

  /** The same CTE chain over a FILTERED corpus — the qd82 oracle: a
    * tombstone-deleted index must probe exactly like an index built
    * from the surviving docs alone. */
  private def bm25IndexedCtes(docFilter: String): String = {
    val termList = PipelineQueries.bm25QueryTerms
      .map(t => s"'$t'").mkString(", ")
    val k1 = 1.2; val b = 0.75
    s"""WITH it AS (SELECT doc_id,
           regexp_extract_all(lower(text), '\\S+') AS ws
           FROM documents $docFilter),
         ist AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
           avg(CAST(len(ws) AS DOUBLE)) AS avgdl FROM it),
         itok AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl,
           unnest(ws) AS w FROM it),
         iq AS (SELECT unnest([$termList]) AS term),
         ip AS (SELECT doc_id, dl, w AS term,
             CAST(count(*) AS DOUBLE) AS tf
           FROM itok JOIN iq ON itok.w = iq.term GROUP BY 1, 2, 3),
         idf_ AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
           FROM ip GROUP BY 1),
         ic AS (SELECT doc_id,
             CAST(floor(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * tf * ${k1 + 1.0}
               / (tf + $k1 * (${1.0 - b} + $b * dl / avgdl))
               * 10000.0) AS BIGINT) AS c_e4
           FROM ip JOIN idf_ USING (term) CROSS JOIN ist),
         isc AS (SELECT doc_id, CAST(sum(c_e4) AS BIGINT) AS score_e4
           FROM ic GROUP BY 1)"""
  }

  /** Shared oracle for qd15/qd43: the Bloom-prefiltered path returns the
    * exact overlap report, so one SQL covers both. */
  private lazy val decontaminateOracleSql: String =
    """WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+')
         AS toks FROM documents),
       g AS (SELECT doc_id,
           unnest(list_distinct([array_to_string(toks[i:i+3], ' ')
             FOR i IN range(1, len(toks) - 2)])) AS gram
         FROM tk WHERE len(toks) >= 4)
       SELECT t.doc_id, count(*) AS n_shared
       FROM (SELECT doc_id, gram FROM g WHERE doc_id % 97 <> 0) t
       JOIN (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0) e
         USING (gram)
       GROUP BY 1 ORDER BY 1"""

  /** Shared oracle for qd13/qd42: DuckDB's recursive transitive closure
    * assigns each component its minimum doc id — the fixpoint both the
    * min-label loop and the star contraction converge to. */
  private lazy val dupClustersCte: String =
    """WITH RECURSIVE words AS (SELECT DISTINCT doc_id, source,
         unnest(regexp_extract_all(lower(text), '\S+')) AS w FROM documents),
       sizes AS (SELECT doc_id, count(*) AS n FROM words GROUP BY 1),
       hot AS (SELECT source, w FROM words GROUP BY 1, 2
         HAVING count(*) > 256),
       posting AS (SELECT words.* FROM words
         LEFT JOIN hot ON words.source = hot.source AND words.w = hot.w
         WHERE hot.w IS NULL),
       c AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS nab
         FROM posting a JOIN posting b
           ON a.w = b.w AND a.source = b.source AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
       pairs AS (SELECT doc_a, doc_b
         FROM c JOIN sizes sa ON c.doc_a = sa.doc_id
                JOIN sizes sb ON c.doc_b = sb.doc_id
         WHERE floor(CAST(nab AS DOUBLE)
             / CAST(sa.n + sb.n - nab AS DOUBLE) * 10000.0) / 10000.0 >= 0.8),
       e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         UNION SELECT doc_b, doc_a FROM pairs),
       cc(a, b) AS (SELECT a, b FROM e
         UNION SELECT cc.a, e.b FROM cc JOIN e ON cc.b = e.a),
       cl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster
         FROM cc GROUP BY a)"""

  private lazy val dupClustersOracleSql: String =
    dupClustersCte + "\n       SELECT doc_id, cluster FROM cl ORDER BY doc_id"

  /** Shared oracle for qe23 (in-memory) and qe25 (persisted index):
    * sign bits re-derived as conditional bit sums (two 32-bit halves
    * keep 1<<j off the sign bit), Hamming shortlist via bit_count(xor),
    * exact-cosine rerank — both stages deterministic, so the whole
    * two-stage binary retrieval is hash-checked. */
  private lazy val binaryTopKOracleSql: String =
    """WITH el AS (SELECT vec_id,
           generate_subscripts(embedding, 1) AS d,
           CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
         bits AS (SELECT vec_id,
             CAST(sum(CASE WHEN d <= 32 AND x >= 0
               THEN CAST(1 AS BIGINT) << (d - 1) ELSE 0 END)
               AS BIGINT) AS lo,
             CAST(sum(CASE WHEN d > 32 AND d <= 64 AND x >= 0
               THEN CAST(1 AS BIGINT) << (d - 33) ELSE 0 END)
               AS BIGINT) AS hi
           FROM el GROUP BY 1),
         qb AS (SELECT lo AS qlo, hi AS qhi FROM bits WHERE vec_id = 0),
         short AS (SELECT b.vec_id FROM bits b, qb
           QUALIFY row_number() OVER (ORDER BY
             bit_count(xor(b.lo, qb.qlo)) + bit_count(xor(b.hi, qb.qhi)),
             b.vec_id) <= 50),
         z AS (SELECT s.vec_id, CAST(unnest(e.embedding) AS DOUBLE) AS a,
             CAST(unnest((SELECT embedding FROM embeddings
               WHERE vec_id = 0)) AS DOUBLE) AS b
           FROM short s JOIN embeddings e ON s.vec_id = e.vec_id),
         sc AS (SELECT vec_id, sum(a*b) AS ab, sum(a*a) AS aa,
             sum(b*b) AS bb FROM z GROUP BY 1)
         SELECT vec_id, round(ab / (sqrt(aa) * sqrt(bb)), 4) AS cos,
           CAST(row_number() OVER (ORDER BY
             round(ab / (sqrt(aa) * sqrt(bb)), 4) DESC, vec_id)
             AS BIGINT) AS rank
         FROM sc QUALIFY rank <= 10 ORDER BY rank"""

  /** Oracle for qe19, generated because the 5 greedy MMR steps unroll
    * into one CTE each (the qe14 unrolled-Lloyd move): top-30 relevance
    * pool, pairwise pool sims, then each step picks
    * argmax round(0.7·rel − 0.3·max sim-to-selected, 4) among the
    * not-yet-selected (vec_id tiebreak) — exactly the rounded greedy
    * trajectory [[graft.ops.Similarity.mmrTopK]] walks. */
  private lazy val mmrOracleSql: String = {
    val base =
      """WITH z AS (SELECT e.vec_id,
           CAST(unnest(e.embedding) AS DOUBLE) AS a,
           CAST(unnest((SELECT embedding FROM embeddings WHERE vec_id = 0))
             AS DOUBLE) AS b
           FROM embeddings e),
         sc AS (SELECT vec_id, sum(a*b) AS ab, sum(a*a) AS aa,
           sum(b*b) AS bb FROM z GROUP BY 1),
         pool AS (SELECT vec_id, round(ab / (sqrt(aa) * sqrt(bb)), 4)
             AS rel
           FROM sc ORDER BY rel DESC, vec_id LIMIT 30),
         pv AS (SELECT p.vec_id, CAST(unnest(e.embedding) AS DOUBLE) AS x,
           generate_subscripts(e.embedding, 1) AS d
           FROM pool p JOIN embeddings e USING (vec_id)),
         ps AS (SELECT a.vec_id AS va, b.vec_id AS vb,
           round(sum(a.x * b.x) / (sqrt(sum(a.x * a.x))
             * sqrt(sum(b.x * b.x))), 4) AS sim
           FROM pv a JOIN pv b ON a.d = b.d GROUP BY 1, 2)"""
    val steps = (1 to 5).map { t =>
      if (t == 1)
        """s1 AS (SELECT vec_id, round(0.7 * rel, 4) AS m FROM pool
           ORDER BY m DESC, vec_id LIMIT 1)"""
      else {
        val joins = (1 until t).map(i =>
          s"JOIN ps x$i ON x$i.va = p.vec_id AND x$i.vb = " +
            s"(SELECT vec_id FROM s$i)").mkString("\n           ")
        val notIn = (1 until t).map(i => s"SELECT vec_id FROM s$i")
          .mkString(" UNION ALL ")
        val maxSim =
          if (t == 2) "x1.sim"
          else s"greatest(${(1 until t).map(i => s"x$i.sim").mkString(", ")})"
        s"""s$t AS (SELECT p.vec_id,
           round(0.7 * p.rel - 0.3 * $maxSim, 4) AS m
           FROM pool p
           $joins
           WHERE p.vec_id NOT IN ($notIn)
           ORDER BY m DESC, p.vec_id LIMIT 1)"""
      }
    }.mkString(",\n         ")
    val sel = (1 to 5).map(t =>
      s"SELECT vec_id, CAST($t AS BIGINT) AS mmr_rank, m AS mmr_score " +
        s"FROM s$t").mkString("\n         UNION ALL ")
    s"$base,\n         $steps\n         $sel\n         ORDER BY mmr_rank"
  }

  /** Shared CTE chain for qd56/qd57: 2 unrolled BPE merge rounds. Each
    * round r re-derives [[graft.ops.Bpe]]'s exact algebra — weighted
    * adjacent-pair counts, top pair by (n desc, x, y), then the greedy
    * non-overlap merge via the run-parity windows (run start, even
    * offsets merge, right neighbor eaten, dense re-rank). */
  private def bpeRoundCtes(r: Int): String = {
    val prev = s"s${r - 1}"
    s"""p$r AS (SELECT a.sym AS x, b.sym AS y, sum(a.freq) AS n
           FROM $prev a JOIN $prev b
             ON a.word = b.word AND b.pos = a.pos + 1
           GROUP BY 1, 2),
         t$r AS (SELECT x, y, n FROM p$r ORDER BY n DESC, x, y LIMIT 1),
         m$r AS (SELECT word, freq, pos, sym,
             lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
           FROM $prev),
         mm$r AS (SELECT *, coalesce(sym = (SELECT x FROM t$r)
             AND nxt = (SELECT y FROM t$r), FALSE) AS m FROM m$r),
         rr$r AS (SELECT *, CASE WHEN m AND NOT coalesce(
             lag(m) OVER (PARTITION BY word ORDER BY pos), FALSE)
             THEN pos END AS rs FROM mm$r),
         rn$r AS (SELECT *, last_value(rs IGNORE NULLS) OVER (
             PARTITION BY word ORDER BY pos ROWS UNBOUNDED PRECEDING)
             AS run FROM rr$r),
         mg$r AS (SELECT *, m AND (pos - run) % 2 = 0 AS mg FROM rn$r),
         ke$r AS (SELECT * FROM (SELECT *, coalesce(lag(mg) OVER (
             PARTITION BY word ORDER BY pos), FALSE) AS eaten FROM mg$r)
           WHERE NOT eaten),
         s$r AS (SELECT word, freq, row_number() OVER (
             PARTITION BY word ORDER BY pos) - 1 AS pos,
             CASE WHEN mg THEN sym || nxt ELSE sym END AS sym
           FROM ke$r)"""
  }

  private lazy val bpeBaseCtes: String =
    """WITH w0 AS (SELECT w AS word, count(*) AS freq FROM
           (SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS w
            FROM documents) GROUP BY 1),
         s0 AS (SELECT word, freq, i - 1 AS pos,
             substring(word, i, 1) AS sym
           FROM w0, unnest(generate_series(1, length(word))) AS u(i)),
         """ + bpeRoundCtes(1) + ",\n         " + bpeRoundCtes(2)

  private lazy val bpeMergesOracleSql: String =
    bpeBaseCtes + """
         SELECT CAST(1 AS BIGINT) AS round, x AS left_sym,
           y AS right_sym, CAST(n AS BIGINT) AS pair_freq FROM t1
         UNION ALL SELECT CAST(2 AS BIGINT), x, y, CAST(n AS BIGINT)
           FROM t2
         ORDER BY round"""

  private lazy val bpeVocabOracleSql: String =
    bpeBaseCtes + """
         SELECT sym, CAST(sum(freq) AS BIGINT) AS total_freq
         FROM s2 GROUP BY 1
         ORDER BY total_freq DESC, sym LIMIT 30"""

  /** Shared oracle for qe20/qe21: the whole PQ pipeline in exact
    * integer math — md5-ordered codebook sample, per-subspace argmin
    * codes (ties to the lower code), ADC score = Σ_m qdist[m, code] —
    * no float rounding anywhere, so the in-memory operator and the
    * persisted-index read-back must both match it bit-for-bit. */
  /** The PQ ENCODE CTEs shared by qe20/21/22 (single-query tail) and
    * qe44 (multi-query tail): 1e-4 integer grid, md5('pq:')-selected
    * 16-entry codebook, per-subspace argmin codes over 8 subspaces —
    * everything through `code`. */
  private lazy val pqCodeCtes: String =
    """WITH v4 AS (SELECT vec_id,
           generate_subscripts(embedding, 1) AS dim,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000.0)
             AS BIGINT) AS x
           FROM embeddings),
         cbsel AS (SELECT vec_id, row_number() OVER (
             ORDER BY md5('pq:' || CAST(vec_id AS VARCHAR)), vec_id) - 1
             AS cidx
           FROM embeddings QUALIFY cidx < 16),
         cb AS (SELECT c.cidx, v.dim, v.x AS cx, (v.dim - 1) // 8 AS m
           FROM cbsel c JOIN v4 v USING (vec_id)),
         sub AS (SELECT vec_id, (dim - 1) // 8 AS m, dim, x FROM v4),
         d AS (SELECT s.vec_id, s.m, cb.cidx,
             sum((s.x - cb.cx) * (s.x - cb.cx)) AS dist
           FROM sub s JOIN cb ON s.m = cb.m AND s.dim = cb.dim
           GROUP BY 1, 2, 3),
         code AS (SELECT vec_id, m, cidx FROM (SELECT *, row_number()
             OVER (PARTITION BY vec_id, m ORDER BY dist, cidx) AS rn
             FROM d) WHERE rn = 1)"""

  private lazy val pqAdcCtes: String = pqCodeCtes + """,
         qd_ AS (SELECT cb.m, cb.cidx,
             sum((q.x - cb.cx) * (q.x - cb.cx)) AS qdist
           FROM (SELECT (dim - 1) // 8 AS m, dim, x FROM v4
             WHERE vec_id = 0) q
           JOIN cb ON q.m = cb.m AND q.dim = cb.dim GROUP BY 1, 2),
         sc AS (SELECT c.vec_id, CAST(sum(qd_.qdist) AS BIGINT)
             AS adc_score
           FROM code c JOIN qd_ ON c.m = qd_.m AND c.cidx = qd_.cidx
           GROUP BY 1)"""

  /** qe44: the multi-query PQ ADC probe — [[pqCodeCtes]] with a
    * per-query distance-table tail over the 20-query batch; every
    * distance is exact integer math, so the per-query ADC rankings
    * are hash-exact. */
  private lazy val pqBatchAdcOracleSql: String = pqCodeCtes + """,
         bq AS (SELECT vec_id AS query_id, (dim - 1) // 8 AS m, dim, x
           FROM v4 WHERE vec_id < 20),
         bqd AS (SELECT q.query_id, cb.m, cb.cidx,
             sum((q.x - cb.cx) * (q.x - cb.cx)) AS qdist
           FROM bq q JOIN cb ON q.m = cb.m AND q.dim = cb.dim
           GROUP BY 1, 2, 3),
         bsc AS (SELECT b.query_id, c.vec_id,
             CAST(sum(b.qdist) AS BIGINT) AS adc_score
           FROM code c JOIN bqd b ON c.m = b.m AND c.cidx = b.cidx
           GROUP BY 1, 2)
         SELECT query_id, vec_id, adc_score,
           CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY adc_score, vec_id) AS BIGINT) AS rank
         FROM bsc QUALIFY rank <= 10 ORDER BY query_id, rank"""

  private lazy val pqAdcOracleSql: String = pqAdcCtes + """
         SELECT vec_id, adc_score, row_number() OVER (
           ORDER BY adc_score, vec_id) AS rank
         FROM sc QUALIFY rank <= 10 ORDER BY rank"""

  /** Oracle for qe22: the ADC shortlist (same CTEs), then the exact
    * qe01-style cosine rerank restricted to the 50 shortlisted ids. */
  private lazy val pqRerankOracleSql: String = pqAdcCtes + """,
         short AS (SELECT vec_id FROM sc
           ORDER BY adc_score, vec_id LIMIT 50),
         z2 AS (SELECT e.vec_id, CAST(unnest(e.embedding) AS DOUBLE) AS a,
           CAST(unnest((SELECT embedding FROM embeddings WHERE vec_id = 0))
             AS DOUBLE) AS b
           FROM embeddings e JOIN short USING (vec_id)),
         s2 AS (SELECT vec_id, sum(a*b) AS ab, sum(a*a) AS aa,
           sum(b*b) AS bb FROM z2 GROUP BY 1)
         SELECT vec_id, round(ab / (sqrt(aa) * sqrt(bb)), 4) AS cos,
           row_number() OVER (ORDER BY round(ab / (sqrt(aa) * sqrt(bb)), 4)
             DESC, vec_id) AS rank
         FROM s2 QUALIFY rank <= 10 ORDER BY rank"""

  /** Oracle for the portable MinHash+LSH near-dup family (qd24, qd05),
    * generated because the lane/band unrolling is parameter-shaped:
    * lane s = min over distinct tokens of the 8-hex slice
    * [8·(s mod 4), 8·(s mod 4)+8) of md5((s div 4) || ':' || token)
    * (the [[graft.functions.Md5Lanes]] contract), band b's bucket =
    * md5 over the concat of its `rowsPerBand` lane hex strings,
    * candidates join on (band, bucket) within the source block, and the
    * exact word-set Jaccard verify keeps pairs ≥ 0.8 — every stage
    * engine-portable, so the whole sketch is hash-checked, candidates
    * included. */
  private def minhashPortableOracle(numLanes: Int,
      rowsPerBand: Int): String = {
    val hCols = (0 until (numLanes + 3) / 4)
      .map(c => s"md5('$c:' || w) AS h$c").mkString(", ")
    val laneMins = (0 until numLanes).map { s =>
      s"min(substring(h${s / 4}, ${(s % 4) * 8 + 1}, 8)) AS l$s"
    }.mkString(",\n           ")
    val bands = (0 until numLanes / rowsPerBand).map { b =>
      val cat = (0 until rowsPerBand).map(r => s"l${b * rowsPerBand + r}")
        .mkString(" || ")
      if (b == 0)
        s"SELECT doc_id, source, 0 AS band, md5($cat) AS bucket\n             FROM sig"
      else s"UNION ALL SELECT doc_id, source, $b, md5($cat) FROM sig"
    }.mkString("\n           ")
    s"""WITH w AS (SELECT DISTINCT doc_id, source,
           unnest(list_distinct(regexp_extract_all(lower(text), '\\S+')))
             AS w
           FROM documents),
         h AS (SELECT doc_id, source, $hCols FROM w),
         sig AS (SELECT doc_id, source,
           $laneMins
           FROM h GROUP BY 1, 2),
         banded AS (
           $bands),
         cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM banded a JOIN banded b
             ON a.band = b.band AND a.bucket = b.bucket
               AND a.source = b.source AND a.doc_id < b.doc_id),
         toks AS (SELECT doc_id,
           list_distinct(regexp_extract_all(lower(text), '\\S+')) AS t
           FROM documents),
         v AS (SELECT doc_a, doc_b,
           floor(CAST(len(list_intersect(ta.t, tb.t)) AS DOUBLE)
             / CAST(len(ta.t) + len(tb.t) - len(list_intersect(ta.t, tb.t))
               AS DOUBLE) * 10000.0) / 10000.0 AS jaccard
           FROM cand JOIN toks ta ON cand.doc_a = ta.doc_id
                     JOIN toks tb ON cand.doc_b = tb.doc_id)
         SELECT doc_a, doc_b, jaccard FROM v WHERE jaccard >= 0.8
         ORDER BY doc_a, doc_b"""
  }

  /** Oracle for the portable winnowing family (qd61, qd09), generated
    * because the shingle leads and window width are parameter-shaped:
    * k-token shingles hashed via the md5 'wf:' slice, per-document
    * w-shingle sliding-window argmin through the h·2^20+pos integer
    * key (ties to the leftmost position), distinct selections. */
  private def winnowPortableOracle(k: Int, w: Int): String = {
    val leads = (1 until k)
      .map(j => s"lead(tok, $j) OVER w AS t$j").mkString(", ")
    val cat = ("tok" +: (1 until k).map(j => s"t$j")).mkString(" || ' ' || ")
    s"""WITH tk AS (SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '\\S+')) AS tok,
           generate_subscripts(regexp_extract_all(lower(text), '\\S+'), 1)
             - 1 AS pos
           FROM documents),
         sh0 AS (SELECT doc_id, pos, tok, $leads
           FROM tk WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
         sh AS (SELECT doc_id, pos,
           CAST('0x' || substring(md5('wf:' || $cat), 1, 8) AS BIGINT) AS h
           FROM sh0 WHERE t${k - 1} IS NOT NULL),
         m AS (SELECT doc_id,
           min(h * 1048576 + pos) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS mk,
           lead(pos, ${w - 1}) OVER (PARTITION BY doc_id ORDER BY pos)
             AS pw
           FROM sh)
         SELECT DISTINCT doc_id, mk // 1048576 AS fp,
           CAST(mk % 1048576 AS BIGINT) AS pos
         FROM m WHERE pw IS NOT NULL ORDER BY doc_id, pos"""
  }

  /** Oracle for the portable-SimHash family (qd51 radius 3, qd06
    * radius 2), generated because it carries 64 per-bit sum terms:
    * token hash = two unsigned-32 slices of md5('0:'||token) (the
    * [[graft.functions.Md5Lanes]] contract), exact ±1 integer sums per
    * bit, signature bit set when sum ≥ 0, 4 × 16-bit pigeonhole blocks,
    * exact hamming ≤ maxHamming verify — every stage is
    * engine-portable, so the whole sketch is hash-checked, candidates
    * included. */
  /** The portable-simhash signature chain `sig(doc_id, hi, lo)` —
    * shared by qd06/qd51 (banded pair oracles) and qd89 (the persisted
    * fingerprint store serving the same signatures). */
  private lazy val simhashSigCtes: String = {
    def sums(src: String, p: String) = (0 until 32).map(j =>
      s"sum(CASE WHEN ($src >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS $p$j")
      .mkString(",\n           ")
    def pack(p: String) = (0 until 32).map(j =>
      s"CASE WHEN $p$j >= 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    s"""WITH w AS (SELECT DISTINCT doc_id,
         unnest(list_distinct(regexp_extract_all(lower(text), '\\S+')))
           AS w FROM documents),
       h AS (SELECT doc_id,
         CAST('0x' || substring(md5('0:' || w), 1, 8) AS BIGINT) AS c0,
         CAST('0x' || substring(md5('0:' || w), 9, 8) AS BIGINT) AS c1
         FROM w),
       s AS (SELECT doc_id,
           ${sums("c0", "h")},
           ${sums("c1", "l")}
         FROM h GROUP BY 1),
       sig AS (SELECT doc_id, ${pack("h")} AS hi, ${pack("l")} AS lo
         FROM s)"""
  }

  private def simhashPortableOracle(maxHamming: Int): String =
    simhashSigCtes + s""",
       blk AS (SELECT doc_id, hi, lo, 0 AS bidx, hi // 65536 AS bval
           FROM sig
         UNION ALL SELECT doc_id, hi, lo, 1, hi % 65536 FROM sig
         UNION ALL SELECT doc_id, hi, lo, 2, lo // 65536 FROM sig
         UNION ALL SELECT doc_id, hi, lo, 3, lo % 65536 FROM sig),
       p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.hi AS ha, a.lo AS la, b.hi AS hb, b.lo AS lb
         FROM blk a JOIN blk b ON a.bidx = b.bidx AND a.bval = b.bval
           AND a.doc_id < b.doc_id)
       SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb))
           + bit_count(xor(la, lb)) AS BIGINT) AS hamming
       FROM p
       WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb))
         <= $maxHamming
       ORDER BY doc_a, doc_b"""

  /** Oracle for qd45: the same cluster fixpoint, then the qd32 split
    * thresholds applied to the cluster rep (own id for singletons). */
  private lazy val leakFreeSplitOracleSql: String =
    dupClustersCte + """
       SELECT d.doc_id,
         CASE WHEN substring(md5(CAST(coalesce(cl.cluster, d.doc_id)
                AS VARCHAR)), 1, 8) < 'cccccccc' THEN 'train'
              WHEN substring(md5(CAST(coalesce(cl.cluster, d.doc_id)
                AS VARCHAR)), 1, 8) < 'e6666666' THEN 'val'
              ELSE 'test' END AS split
       FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
       ORDER BY d.doc_id"""

  /** Oracle for qe03: the splitmix64 hyperplanes are deterministic
    * literals ([[graft.ops.Similarity.planeVectors]]), so the SQL embeds
    * the same 6×64 doubles and re-derives every bucket, the 1-flip probe
    * set, and the candidate top-10 exactly. Dim 64 is the testdata
    * embedding width (TESTDATA.md). */
  private lazy val annLshOracleSql: String = {
    val planes = graft.ops.Similarity.planeVectors(6, 64)
    val rows = planes.zipWithIndex.map { case (row, p) =>
      s"($p, [${row.mkString(",")}])"
    }.mkString(",")
    val flips = (0 to 6).map(i => s"(${if (i == 0) 0L else 1L << (i - 1)})")
      .mkString(",")
    s"""WITH pl(p, pv) AS (VALUES $rows),
       e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
         AS v FROM embeddings),
       d AS (SELECT e.vec_id, pl.p, list_dot_product(e.v, pl.pv) AS dp
         FROM e, pl),
       b AS (SELECT vec_id,
           CAST(sum(CASE WHEN dp >= 0 THEN 1<<p ELSE 0 END) AS BIGINT)
           AS bucket FROM d GROUP BY 1),
       probes AS (SELECT xor(b.bucket, m.m) AS pb
         FROM b, (VALUES $flips) m(m) WHERE b.vec_id = 0),
       z AS (SELECT e.vec_id, CAST(unnest(e2.embedding) AS DOUBLE) AS a,
           CAST(unnest((SELECT embedding FROM embeddings WHERE vec_id = 0))
             AS DOUBLE) AS bq
         FROM e JOIN b USING (vec_id) JOIN probes ON b.bucket = probes.pb
           JOIN embeddings e2 ON e.vec_id = e2.vec_id),
       s AS (SELECT vec_id, sum(a*bq) AS ab, sum(a*a) AS aa, sum(bq*bq) AS bb
         FROM z GROUP BY 1)
       SELECT vec_id, round(ab / (sqrt(aa) * sqrt(bb)), 4) AS cos,
         CAST(row_number() OVER (ORDER BY round(ab / (sqrt(aa) * sqrt(bb)), 4)
           DESC, vec_id) AS BIGINT) AS rank
       FROM s QUALIFY rank <= 10 ORDER BY rank"""
  }

  /** Oracle for qe08 (upgraded from rows-only in round 3): the same
    * literal splitmix64 planes as qe03 re-derive every vector's bucket,
    * then the exact pairwise cosine within buckets — the whole
    * LSH-blocked near-dup is hash-checked, candidates included. */
  private lazy val embeddingLshOracleSql: String = {
    val planes = graft.ops.Similarity.planeVectors(6, 64)
    val rows = planes.zipWithIndex.map { case (row, p) =>
      s"($p, [${row.mkString(",")}])"
    }.mkString(",")
    s"""WITH pl(p, pv) AS (VALUES $rows),
       e AS (SELECT vec_id, list_transform(embedding, x ->
         CAST(x AS DOUBLE)) AS v FROM embeddings),
       d AS (SELECT e.vec_id, pl.p, list_dot_product(e.v, pl.pv) AS dp
         FROM e, pl),
       b AS (SELECT vec_id,
           CAST(sum(CASE WHEN dp >= 0 THEN 1<<p ELSE 0 END) AS BIGINT)
           AS bucket FROM d GROUP BY 1),
       z AS (SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
           CAST(unnest(ea.embedding) AS DOUBLE) AS x,
           CAST(unnest(eb.embedding) AS DOUBLE) AS y
         FROM b a JOIN b b2
           ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
         JOIN embeddings ea ON ea.vec_id = a.vec_id
         JOIN embeddings eb ON eb.vec_id = b2.vec_id),
       s AS (SELECT vec_a, vec_b, sum(x*y) AS ab, sum(x*x) AS aa,
           sum(y*y) AS bb FROM z GROUP BY 1, 2)
       SELECT vec_a, vec_b, round(ab / (sqrt(aa) * sqrt(bb)), 4) AS cos
       FROM s WHERE round(ab / (sqrt(aa) * sqrt(bb)), 4) >= 0.3
       ORDER BY vec_a, vec_b"""
  }

  /** Oracle for qe04: the centroid sample orders by md5("ivf:" + id)
    * (engine-portable), assignment is argmax (dot, cell) with the
    * higher-cell tiebreak, probing keeps the 4 best (dot desc, cell asc)
    * cells — each step mirrored here symbolically on the same data. */
  private val ivfOracleSql: String =
    """WITH raw AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS rv
         FROM embeddings),
       e AS (SELECT vec_id,
         list_transform(rv, x -> x / sqrt(list_dot_product(rv, rv))) AS v
         FROM raw),
       cents AS (SELECT CAST(row_number() OVER (ORDER BY
             md5('ivf:' || CAST(vec_id AS VARCHAR)), vec_id) AS INTEGER) - 1
             AS cell, v AS cv
         FROM e ORDER BY md5('ivf:' || CAST(vec_id AS VARCHAR)), vec_id
         LIMIT 16),
       assign AS (SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell DESC) AS rn
         FROM e, cents c),
       cellof AS (SELECT vec_id, cell FROM assign WHERE rn = 1),
       qv AS (SELECT v FROM e WHERE vec_id = 0),
       probe AS (SELECT c.cell FROM cents c, qv
         ORDER BY list_dot_product(c.cv, qv.v) DESC, c.cell LIMIT 4),
       s AS (SELECT e.vec_id, list_dot_product(e.v, qv.v) AS ab
         FROM e JOIN cellof USING (vec_id) JOIN probe USING (cell), qv)
       SELECT vec_id, round(ab, 4) AS cos,
         CAST(row_number() OVER (ORDER BY round(ab, 4) DESC, vec_id)
           AS BIGINT) AS rank
       FROM s QUALIFY rank <= 10 ORDER BY rank"""

  /** Shared CTE prefix for qe14/qe15: deterministic spherical k-means
    * unrolled to 2 Lloyd rounds. Mirrors graft.ops.Clustering exactly —
    * md5("km:"||id) seeds, argmax-dot assignment with the higher-cell
    * tiebreak, per-cell means rounded to 1e-6 then re-normalized
    * (empty/zero-norm cells keep the previous centroid). */
  private def kmeansCtes(k: Int, seedPrefix: String = "km:"): String = {
    def lloyd(i: Int): String = {
      val (prev, a, x, m, mc, next) =
        (s"c$i", s"a$i", s"x$i", s"m${i + 1}", s"mc${i + 1}", s"c${i + 1}")
      s"""$a AS (SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell DESC) AS rn
         FROM e, $prev c),
       $x AS (SELECT vec_id, cell FROM $a WHERE rn = 1),
       $m AS (SELECT $x.cell, u.dim, round(sum(u.x) / count(*), 6) AS m
         FROM $x JOIN (SELECT vec_id, unnest(range(64)) AS dim,
             unnest(v) AS x FROM e) u USING (vec_id)
         GROUP BY 1, 2),
       $mc AS (SELECT cell, list(m ORDER BY dim) AS mv FROM $m GROUP BY 1),
       $next AS (SELECT p.cell,
           CASE WHEN q.cell IS NULL
                  OR sqrt(list_dot_product(q.mv, q.mv)) = 0 THEN p.cv
                ELSE list_transform(q.mv,
                  x -> x / sqrt(list_dot_product(q.mv, q.mv))) END AS cv
         FROM $prev p LEFT JOIN $mc q USING (cell))"""
    }
    s"""WITH raw AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS rv
         FROM embeddings),
       e AS (SELECT vec_id,
         list_transform(rv, x -> x / sqrt(list_dot_product(rv, rv))) AS v
         FROM raw),
       c0 AS (SELECT CAST(row_number() OVER (ORDER BY
             md5('$seedPrefix' || CAST(vec_id AS VARCHAR)), vec_id)
             AS INTEGER) - 1 AS cell, v AS cv
         FROM e ORDER BY md5('$seedPrefix' || CAST(vec_id AS VARCHAR)),
           vec_id
         LIMIT $k),
       ${lloyd(0)},
       ${lloyd(1)},
       afin AS (SELECT e.vec_id, c.cell,
           list_dot_product(e.v, c.cv) AS score,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell DESC) AS rn
         FROM e, c2 c)"""
  }

  private lazy val kmeansOracleSql: String =
    s"""${kmeansCtes(8)}
       SELECT vec_id, cell, round(score, 4) AS cos
       FROM afin WHERE rn = 1 ORDER BY vec_id"""

  private lazy val semanticDedupOracleSql: String =
    s"""${kmeansCtes(8)},
       xfin AS (SELECT vec_id, cell FROM afin WHERE rn = 1),
       dropped AS (SELECT DISTINCT b.vec_id
         FROM (SELECT x.vec_id, x.cell, e.v FROM xfin x
             JOIN e USING (vec_id)) a
           JOIN (SELECT x.vec_id, x.cell, e.v FROM xfin x
             JOIN e USING (vec_id)) b
           ON a.cell = b.cell AND a.vec_id < b.vec_id
             AND round(list_dot_product(a.v, b.v), 4) >= 0.3)
       SELECT x.vec_id, x.cell, (d.vec_id IS NULL) AS kept
       FROM xfin x LEFT JOIN dropped d USING (vec_id) ORDER BY x.vec_id"""

  private lazy val clusterSampleOracleSql: String =
    s"""${kmeansCtes(8)},
       xfin AS (SELECT vec_id, cell FROM afin WHERE rn = 1),
       n AS (SELECT cell, count(*) AS n_v FROM xfin GROUP BY 1),
       tot AS (SELECT CAST(sum(n_v) AS BIGINT) AS n_total,
         count(*) AS n_groups FROM n),
       r AS (SELECT cell, least(1.0, (CAST(n_total AS DOUBLE)
           / CAST(n_groups AS DOUBLE)) / CAST(n_v AS DOUBLE)) AS rate0
         FROM n CROSS JOIN tot)
       SELECT x.vec_id, x.cell,
         floor(r.rate0 * 10000.0) / 10000.0 AS rate
       FROM xfin x JOIN r USING (cell)
       WHERE substring(md5(CAST(x.vec_id AS VARCHAR)), 1, 8) <
         printf('%08x', CAST(least(floor(r.rate0 * 4294967296.0),
           4294967295.0) AS BIGINT))
       ORDER BY x.vec_id"""

  /** Shared oracle for qe09/qe10: int8 quantization is exact integer
    * math (floor to 1e-4 longs, per-dim min/max, affine code), so the
    * decode, the stage-1 approximate ranking (top-50 candidates) and
    * the exact rerank are all reproducible symbolically. */
  private val adcOracleSql: String =
    """WITH raw AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS rv
         FROM embeddings),
       e AS (SELECT vec_id,
         list_transform(rv, x -> x / sqrt(list_dot_product(rv, rv))) AS v
         FROM raw),
       ex AS (SELECT vec_id, unnest(range(64)) AS dim,
           floor(unnest(v) * 10000.0) AS x_e4 FROM e),
       stats AS (SELECT dim, min(x_e4) AS mn, max(x_e4) AS mx
         FROM ex GROUP BY 1),
       qv AS (SELECT unnest(range(64)) AS dim, unnest(v) AS qx
         FROM e WHERE vec_id = 0),
       dec AS (SELECT ex.vec_id, ex.dim,
           (s.mn + (CASE WHEN s.mx = s.mn THEN 0.0
             ELSE least(floor((ex.x_e4 - s.mn) * 255
               / CAST(s.mx - s.mn AS DOUBLE)), 255.0) END)
             * (s.mx - s.mn) / 255.0) / 10000.0 AS c
         FROM ex JOIN stats s USING (dim)),
       asc_ AS (SELECT d.vec_id, sum(d.c * q.qx) AS ascore
         FROM dec d JOIN qv q USING (dim) GROUP BY 1),
       cand AS (SELECT vec_id FROM asc_ ORDER BY ascore DESC, vec_id
         LIMIT 50),
       z AS (SELECT e.vec_id, unnest(e.v) AS a,
           unnest((SELECT v FROM e WHERE vec_id = 0)) AS b
         FROM e JOIN cand USING (vec_id)),
       s2 AS (SELECT vec_id, sum(a*b) AS ab FROM z GROUP BY 1)
       SELECT vec_id, round(ab, 4) AS cos,
         CAST(row_number() OVER (ORDER BY round(ab, 4) DESC, vec_id)
           AS BIGINT) AS rank
       FROM s2 QUALIFY rank <= 10 ORDER BY rank"""
}
