package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator from SURVEY.md §2
  * (plus the north-star LLM-pipeline operators); `oracleSql` carries the
  * DuckDB-equivalent SQL the driver hash-compares against at sf0.01.
  * Column names and row order are aligned on both sides; double
  * aggregates are routed through exact decimal arithmetic
  * ([[SqlCompat]]) so the hash compare is engine-stable.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the reference's entire analytic content end-to-end: the
    * bronze→silver→gold medallion pipeline (incremental watermark
    * extract, exact dedup, grouped identity count) through real
    * versioned lake tables.
    */
  def entry(spark: SparkSession): DataFrame =
    LakeQueries.pipelineGold(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_gold_group_count" -> (RelationalQueries.goldGroupCount _),
    "q_silver_dedup"     -> (RelationalQueries.silverDedup _),
    "q_incremental_scan" -> (RelationalQueries.incrementalScan _),
    "q_jdbc_extract"     -> (RelationalQueries.jdbcExtract _),
    "q_jdbc_load"        -> (RelationalQueries.jdbcLoad _),
    "q_topk_latest"      -> (RelationalQueries.topkLatest _),
    "q1_pricing_summary" -> (RelationalQueries.pricingSummary _),
    "q3_revenue_topk"    -> (RelationalQueries.revenueTopk _),
    "q5_nation_revenue"  -> (RelationalQueries.nationRevenue _),
    "q10_returned_topk"  -> (RelationalQueries.returnedTopk _),
    "q18_big_orders"     -> (RelationalQueries.bigOrders _),
    "q_orders_per_cust"  -> (RelationalQueries.ordersPerCustomer _),
    "q_skew_salted_join" -> (RelationalQueries.skewSaltedJoin _),
    "q_window_running"   -> (RelationalQueries.windowRunning _),
    "q_rollup"           -> (RelationalQueries.rollupSummary _),
    "q_semi_anti"        -> (RelationalQueries.semiAntiCustomers _),
    "q_setops"           -> (RelationalQueries.setOpsNations _),
    "q_scalar_datetime"  -> (RelationalQueries.scalarDatetime _),
    "q_distinct_agg"     -> (RelationalQueries.distinctAgg _),
    "q_json_extract"     -> (RelationalQueries.jsonExtract _),
    "lake_snapshot_append"  -> (LakeQueries.snapshotAppend _),
    "lake_time_travel"      -> (LakeQueries.timeTravel _),
    "lake_rollback"         -> (LakeQueries.rollback _),
    "lake_merge_upsert"     -> (LakeQueries.mergeUpsert _),
    "lake_merge_mor"        -> (LakeQueries.mergeMorUpsert _),
    "lake_eq_upsert"        -> (LakeQueries.eqUpsert _),
    "lake_clone"            -> (LakeQueries.cloneTable _),
    "lake_join_view"        -> (LakeQueries.joinView _),
    "lake_mv_stack"         -> (LakeQueries.mvStack _),
    "lake_autocompact"      -> (LakeQueries.autoCompact _),
    "lake_cdc_read"         -> (LakeQueries.cdcRead _),
    "lake_wap_tag"          -> (LakeQueries.wapTag _),
    "lake_branch"           -> (LakeQueries.branchWap _),
    "lake_sorted_scan"      -> (LakeQueries.sortedBloomScan _),
    "lake_meta_agg"         -> (LakeQueries.metaAgg _),
    "lake_zorder_scan"      -> (LakeQueries.zorderScan _),
    "lake_add_files"        -> (LakeQueries.addFilesImport _),
    "lake_compact_where"    -> (LakeQueries.compactWhereScoped _),
    "lake_meta_delete"      -> (LakeQueries.metadataDelete _),
    "lake_txn"              -> (LakeQueries.txnPublish _),
    "lake_forget"           -> (LakeQueries.forgetUsers _),
    "lake_forget_cascade"   -> (LakeQueries.forgetCascade _),
    "lake_forget_segments"  -> (LakeQueries.forgetSegments _),
    "lake_forget_derived"   -> (LakeQueries.forgetDerived _),
    "lake_incr_view"        -> (LakeQueries.incrView _),
    "lake_view_rewrite"     -> (LakeQueries.viewRewrite _),
    "lake_iceberg_read"     -> (LakeQueries.icebergRoundtrip _),
    "lake_iceberg_cdf"      -> (LakeQueries.icebergChangeFeed _),
    "lake_delta_read"       -> (LakeQueries.deltaRoundtrip _),
    "lake_delta_cdf"        -> (LakeQueries.deltaChangeFeed _),
    "lake_hive_import"      -> (LakeQueries.hiveImport _),
    "lake_federation"       -> (LakeQueries.federation _),
    "lake_delta_dv"         -> (LakeQueries.deltaDvDelete _),
    "lake_binpack"          -> (LakeQueries.binPack _),
    "lake_update_delete"    -> (LakeQueries.updateDelete _),
    "lake_compact"          -> (LakeQueries.compactRoundtrip _),
    "lake_partition_prune"  -> (LakeQueries.partitionedPrune _),
    "lake_runtime_filter"   -> (LakeQueries.runtimeFilterJoin _),
    "lake_maintenance"      -> (LakeQueries.maintenance _),
    "lake_hidden_partition" -> (LakeQueries.hiddenPartition _),
    "lake_sql_merge"        -> (LakeQueries.sqlMerge _),
    "lake_metadata_tables"  -> (LakeQueries.metadataTables _),
    "lake_spec_evolution"   -> (LakeQueries.specEvolution _),
    "lake_incremental_read" -> (LakeQueries.incrementalRead _),
    "pipeline_gold"         -> (LakeQueries.pipelineGold _),
    "pipeline_traindata"    -> (TextQueries.trainingMix _),
    "t_lang_id"          -> (TextQueries.langIdConfusion _),
    "t_quality_score"    -> (TextQueries.qualityScore _),
    "t_token_stats"      -> (TextQueries.tokenStats _),
    "t_fingerprint"      -> (TextQueries.fingerprints _),
    "t_winnow_overlap"   -> (TextQueries.winnowOverlap _),
    "t_hash_sample"      -> ((s: SparkSession, d: String) => TextQueries.hashSample(s, d)),
    "t_stratified_sample" -> ((s: SparkSession, d: String) => TextQueries.stratifiedSample(s, d)),
    "t_token_budget"     -> ((s: SparkSession, d: String) => TextQueries.tokenBudget(s, d)),
    "t_weighted_sample"  -> ((s: SparkSession, d: String) => TextQueries.weightedSample(s, d)),
    "t_contamination"    -> (TextQueries.contamination _),
    "t_novelty"          -> (TextQueries.novelty _),
    "t_shingle_card"     -> (TextQueries.shingleCard _),
    "t_pii_redact"       -> (TextQueries.piiRedact _),
    "t_repetition"       -> (TextQueries.repetition _),
    "t_dup_span"         -> (TextQueries.dupSpan _),
    "t_seq_pack"         -> ((s, d) => TextQueries.seqPack(s, d)),
    "t_chunk_overlap"    -> ((s, d) => TextQueries.chunkOverlap(s, d)),
    "t_bm25_topk"        -> ((s, d) => TextQueries.bm25TopK(s, d)),
    "t_unigram_logprob"  -> (TextQueries.unigramLogProb _),
    "t_ccnet_tiers"      -> (TextQueries.ccnetTiers _),
    "t_bigram_logprob"   -> (TextQueries.bigramLogProb _),
    "t_idf_keywords"     -> ((s, d) => TextQueries.idfKeywords(s, d)),
    "t_heavy_hitters"    -> (TextQueries.heavyHitters _),
    "t_textrank"         -> (TextQueries.textRank _),
    "t_topk_by"          -> (TextQueries.topkBy _),
    "e_embed_quantize"   -> (SimQueries.embedQuantize _),
    "t_domain_mixture"   -> (TextQueries.domainMixture _),
    "d_dedup_exact"      -> (SimQueries.dedupExact _),
    "d_ngram_jaccard"    -> (SimQueries.ngramJaccard _),
    "d_ngram_containment" -> (SimQueries.ngramContainment _),
    "d_dedup_minhash"    -> (SimQueries.minhashLsh _),
    "d_simhash_pairs"    -> (SimQueries.simhashPairs _),
    "d_fuzzy_match"      -> (SimQueries.fuzzyMatch _),
    "e_cosine_dup_pairs" -> (SimQueries.cosineDupPairs _),
    "e_semantic_dedup"   -> (SimQueries.semanticDedup _),
    "e_semdedup_kmeans"  -> (SimQueries.semDedupKmeans _),
    "e_cosine_topk"      -> (SimQueries.cosineTopK _),
    "e_cosine_ann_topk"  -> (SimQueries.cosineAnnTopK _),
    "e_cosine_ivf_topk"  -> (SimQueries.cosineIvfTopK _),
    "e_cosine_pq_topk"   -> (SimQueries.cosinePqTopK _),
    "e_cosine_ivfpq_topk" -> (SimQueries.cosineIvfPqTopK _),
    "m_media_features"   -> (SimQueries.mediaFeatures _),
    "m_image_decode"     -> (SimQueries.imageDecode _),
    "m_audio_decode"     -> (SimQueries.audioDecode _),
    "m_video_frames"     -> (SimQueries.videoFrames _),
    "s_window_tumbling"  -> (StreamQueries.tumbling _),
    "s_window_sliding"   -> (StreamQueries.sliding _),
    "s_stream_tumbling"  -> (StreamQueries.tumblingStreaming _),
    "s_sessionize"       -> (StreamQueries.sessionize _),
    "s_stream_dedup"     -> (StreamQueries.streamingDedup _),
    "s_custom_state"     -> (StreamQueries.customState _),
    "s_incremental_dedup" -> (StreamQueries.incrementalDedup _),
    "s_incremental_contamination" -> (StreamQueries.incrementalContamination _),
    "s_incremental_semdedup" -> (StreamQueries.incrementalSemDedup _),
    "orc_roundtrip"      -> (StreamQueries.orcRoundtrip _),
    "s_stream_join"      -> (StreamQueries.streamStreamJoin _),
    "s_stream_outer_join" -> (StreamQueries.streamStreamOuterJoin _),
    "s_lake_commit_stream" -> (StreamQueries.lakeCommitStream _),
    "s_stream_enrich"      -> (StreamQueries.streamEnrich _),
    "s_delta_stream"     -> (StreamQueries.deltaStream _),
    "s_lake_cdc_stream"    -> (StreamQueries.lakeCdcStream _),
    "s_view_maintain"      -> (StreamQueries.viewMaintain _),
    "s_segment_maintain"   -> (StreamQueries.segmentMaintain _),
    "s_stream_topk"        -> (StreamQueries.streamTopk _),
    "s_join_view_stream"   -> (StreamQueries.joinViewStream _),
    "csv_roundtrip"      -> (StreamQueries.csvRoundtrip _),
    "a_window_functions" -> (AnalyticsQueries.windowFunctions _),
    "a_scalar_functions" -> (AnalyticsQueries.scalarFunctions _),
    "a_word_frequencies" -> (AnalyticsQueries.wordFrequencies _),
    "a_pivot_events"     -> (AnalyticsQueries.pivotEvents _),
    "a_unpivot_events"   -> (AnalyticsQueries.unpivotEvents _),
    "a_asof_join"        -> (AnalyticsQueries.asofJoin _),
    "a_range_join"       -> (AnalyticsQueries.rangeJoin _),
    "a_percentiles"      -> (AnalyticsQueries.percentiles _),
    "a_approx_distinct"  -> (AnalyticsQueries.approxDistinct _),
    "a_zscore_outliers"  -> (AnalyticsQueries.zscoreOutliers _),
    "a_approx_percentile" -> (AnalyticsQueries.approxPercentiles _),
    "a_funnel_steps"     -> (AnalyticsQueries.funnelSteps _),
    "a_assoc_lift"       -> (AnalyticsQueries.assocLift _),
    "a_event_transitions" -> (AnalyticsQueries.eventTransitions _),
    "a_time_range_window" -> (AnalyticsQueries.timeRangeWindow _),
    "a_drift_psi"         -> (AnalyticsQueries.driftPsi _),
    "a_cohort_retention" -> (AnalyticsQueries.cohortRetention _),
    "a_sql_surface"      -> (AnalyticsQueries.sqlSurface _),
    "a_cube"             -> (AnalyticsQueries.cubeSummary _),
    "a_grouping_sets"    -> (AnalyticsQueries.groupingSets _),
    "a_gap_fill"         -> (AnalyticsQueries.gapFill _),
    "a_interpolate"      -> (AnalyticsQueries.interpolate _),
    "a_ewma_anomaly"     -> (AnalyticsQueries.ewmaAnomaly _),
    "a_sessionize_batch" -> (AnalyticsQueries.sessionizeBatch _),
    "a_regr_trend"       -> (AnalyticsQueries.regrTrend _),
    "a_bitmap_distinct"  -> (AnalyticsQueries.bitmapDistinct _),
    "a_rolling_distinct" -> (AnalyticsQueries.rollingDistinct _),
    "a_step_latency"     -> (AnalyticsQueries.stepLatency _),
    "a_pattern_match"    -> (AnalyticsQueries.patternMatch _),
    "a_autocorr"         -> (AnalyticsQueries.autocorr _),
    "a_benford"          -> (AnalyticsQueries.benfordDigits _),
    "a_histogram"        -> (AnalyticsQueries.histogram _),
    "a_correlated_subq"  -> (AnalyticsQueries.correlatedSubquery _),
    "a_outer_cross"      -> (AnalyticsQueries.outerCrossJoins _),
    "a_date_arithmetic"  -> (AnalyticsQueries.dateArithmetic _),
    "a_null_semantics"   -> (AnalyticsQueries.nullSemantics _),
    "d_dedup_clusters"   -> (SimQueries.dedupClusters _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_gold_group_count" ->
      """SELECT c_mktsegment, c_nationkey, COUNT(*) AS total_count
        |FROM customer GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_silver_dedup" ->
      """SELECT DISTINCT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer ORDER BY 1, 2, 3, 4, 5""".stripMargin,

    // `ev` pins events.ts to µs TIMESTAMP on the oracle side: the fixture's
    // physical flavor has drifted twice (r5 ns→µs, r6 µs→ns) and DuckDB
    // answers in whatever the footer says, while Spark always normalizes to
    // µs (Tables.normalizeTs). CAST is a no-op on µs, a truncation on ns —
    // identical to the Spark side — so every events-derived timestamp
    // output must route through `ev`, never raw `events`.
    "q_incremental_scan" ->
      """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
        |SELECT event_id, ts, user_id, event_type FROM ev
        |WHERE ts > TIMESTAMP '2024-01-28 00:00:00' ORDER BY event_id""".stripMargin,

    "q_topk_latest" ->
      """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
        |SELECT event_id, ts, user_id, event_type FROM ev
        |ORDER BY ts DESC, event_id DESC LIMIT 10""".stripMargin,

    // the engine loads nation into embedded Derby and extracts rows
    // past the 2024-01-10 watermark over JDBC; last_updated is
    // 2024-01-01 + n_nationkey days, so the cut is n_nationkey > 9
    "q_jdbc_extract" ->
      """SELECT n_nationkey, n_name,
        |  TIMESTAMP '2024-01-01 00:00:00' + n_nationkey * INTERVAL 1 DAY AS last_updated
        |FROM nation WHERE n_nationkey > 9 ORDER BY n_nationkey""".stripMargin,

    // gold counts published into Derby via atomic staged swap (a stale
    // half first, then the full batch) and read back over JDBC: the
    // answer equaling the direct aggregation proves idempotent replace
    "q_jdbc_load" ->
      """SELECT event_type, COUNT(*) AS total_count
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q3_revenue_topk" ->
      """SELECT l_orderkey, o_orderdate, CAST(rev_d AS DOUBLE) AS revenue FROM (
        |  SELECT l_orderkey, o_orderdate,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS rev_d
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment = 'BUILDING'
        |  GROUP BY 1, 2 ORDER BY rev_d DESC, l_orderkey LIMIT 10)
        |ORDER BY revenue DESC, l_orderkey""".stripMargin,

    "q10_returned_topk" ->
      """SELECT c_custkey, c_name, n_name, c_acctbal, CAST(rev_d AS DOUBLE) AS revenue FROM (
        |  SELECT c_custkey, c_name, n_name, c_acctbal,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS rev_d
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1, 2, 3, 4 ORDER BY rev_d DESC, c_custkey LIMIT 20)
        |ORDER BY revenue DESC, c_custkey""".stripMargin,

    "q18_big_orders" ->
      """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(qty_d AS DOUBLE) AS sum_qty FROM (
        |  SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        |    SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty_d
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2, 3, 4, 5 HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 150
        |  ORDER BY qty_d DESC, o_orderkey LIMIT 100)
        |ORDER BY sum_qty DESC, o_orderkey""".stripMargin,

    "q5_nation_revenue" ->
      """SELECT n_name, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_orders_per_cust" ->
      """SELECT c_custkey, c_name, n_orders, total_spend FROM (
        |  SELECT o_custkey, COUNT(*) AS n_orders,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend
        |  FROM orders GROUP BY 1 HAVING COUNT(*) >= 12) o
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q_skew_salted_join" ->
      """SELECT s_nationkey, COUNT(*) AS n_items,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "q_window_running" ->
      """SELECT user_id, event_id, rn, running_value FROM (
        |  SELECT user_id, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |  FROM events)
        |WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin,

    "q_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
        |       COALESCE(l_linestatus, 'ALL') AS lstatus,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY 1, 2""".stripMargin,

    "q_semi_anti" ->
      """SELECT c_custkey, 'has_orders' AS flag FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |UNION ALL
        |SELECT c_custkey, 'no_orders' AS flag FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey, flag""".stripMargin,

    "q_setops" ->
      """SELECT nationkey, side FROM (
        |  SELECT nationkey, 'both' AS side FROM
        |    (SELECT c_nationkey AS nationkey FROM customer
        |     INTERSECT SELECT s_nationkey FROM supplier)
        |  UNION ALL
        |  SELECT nationkey, 'customer_only' AS side FROM
        |    (SELECT c_nationkey AS nationkey FROM customer
        |     EXCEPT SELECT s_nationkey FROM supplier))
        |ORDER BY nationkey, side""".stripMargin,

    "q_scalar_datetime" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |       CAST(month(o_orderdate) AS INT) AS mo,
        |       substring(upper(o_orderpriority), 1, 3) AS prio3,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q_distinct_agg" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS distinct_users,
        |       COUNT(*) AS n, MIN(value) AS min_value, MAX(value) AS max_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "lake_snapshot_append" ->
      """SELECT * FROM (SELECT * FROM customer UNION ALL SELECT * FROM customer)
        |ORDER BY c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment""".stripMargin,

    "lake_time_travel" ->
      "SELECT * FROM customer ORDER BY c_custkey",

    // v1 full + v2 bad append, rolled back, + v4 corrected append
    "lake_rollback" ->
      """SELECT * FROM (SELECT * FROM customer
        |  UNION ALL SELECT * FROM customer WHERE c_nationkey >= 20)
        |ORDER BY c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment""".stripMargin,

    "lake_merge_upsert" ->
      """SELECT c_custkey, c_name, c_nationkey,
        |  CASE WHEN c_nationkey < 5 THEN c_acctbal * 2 ELSE c_acctbal END AS c_acctbal,
        |  c_mktsegment
        |FROM customer
        |UNION ALL SELECT CAST(-1 AS BIGINT), 'NEW A', CAST(0 AS INT), 100.0, 'BUILDING'
        |UNION ALL SELECT CAST(-2 AS BIGINT), 'NEW B', CAST(1 AS INT), 200.0, 'MACHINERY'
        |ORDER BY c_custkey""".stripMargin,

    // identical semantics to lake_merge_upsert — merge-on-read is a
    // physical strategy, not a semantic one
    "lake_merge_mor" ->
      """SELECT c_custkey, c_name, c_nationkey,
        |  CASE WHEN c_nationkey < 5 THEN c_acctbal * 2 ELSE c_acctbal END AS c_acctbal,
        |  c_mktsegment
        |FROM customer
        |UNION ALL SELECT CAST(-1 AS BIGINT), 'NEW A', CAST(0 AS INT), 100.0, 'BUILDING'
        |UNION ALL SELECT CAST(-2 AS BIGINT), 'NEW B', CAST(1 AS INT), 200.0, 'MACHINERY'
        |ORDER BY c_custkey""".stripMargin,

    // two equality-delete upserts over the base customer table: the
    // second wins on the overlap (3..8 over <5), new keys insert as
    // their negated custkey — closed-form CASE over the raw parquet
    // the self-folded table answers exactly the union of its appends
    "lake_autocompact" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // final enriched state: appended negated keys (+1000 price),
    // SEGX dim upsert for nationkey<5 customers, MOR delete of
    // positive keys % 97 — all folded by one incremental refresh
    "lake_join_view" ->
      """WITH fact AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |  UNION ALL
        |  SELECT -o_orderkey, o_custkey, o_totalprice + 1000.0
        |  FROM orders WHERE o_orderkey % 100 = 0 AND o_orderkey <> 0),
        |f2 AS (SELECT * FROM fact WHERE NOT (o_orderkey % 97 = 0 AND o_orderkey > 0)),
        |dim AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_nationkey < 5 THEN 'SEGX' ELSE c_mktsegment END AS c_mktsegment
        |  FROM customer)
        |SELECT f.o_orderkey, f.o_custkey, f.o_totalprice, d.c_mktsegment
        |FROM f2 f LEFT JOIN dim d ON f.o_custkey = d.c_custkey
        |ORDER BY f.o_orderkey""".stripMargin,
    // clone final state: MOR delete (>=20) and UPSERT1 (<5) happened
    // before the fork; the clone-side UPSERT2 (3..6) overrides part of
    // UPSERT1; the source's post-fork SRCONLY append never appears
    "lake_clone" ->
      """SELECT c_custkey, c_name, c_nationkey,
        |  CASE WHEN c_nationkey BETWEEN 3 AND 6 THEN -c_acctbal
        |       WHEN c_nationkey < 3 THEN c_acctbal + 1000.0
        |       ELSE c_acctbal END AS c_acctbal,
        |  CASE WHEN c_nationkey BETWEEN 3 AND 6 THEN 'UPSERT2'
        |       WHEN c_nationkey < 3 THEN 'UPSERT1'
        |       ELSE c_mktsegment END AS c_mktsegment
        |FROM customer WHERE c_nationkey < 20
        |ORDER BY c_custkey""".stripMargin,
    "lake_eq_upsert" ->
      """SELECT c_custkey, c_name, c_nationkey,
        |  CASE WHEN c_nationkey BETWEEN 3 AND 8 THEN -c_acctbal
        |       WHEN c_nationkey < 5 THEN c_acctbal + 1000.0
        |       ELSE c_acctbal END AS c_acctbal,
        |  CASE WHEN c_nationkey BETWEEN 3 AND 8 THEN 'UPSERT2'
        |       WHEN c_nationkey < 5 THEN 'UPSERT1'
        |       ELSE c_mktsegment END AS c_mktsegment
        |FROM customer
        |UNION ALL SELECT -c_custkey, c_name, c_nationkey, 0.0, 'NEWKEY'
        |FROM customer WHERE c_nationkey = 20
        |ORDER BY c_custkey""".stripMargin,

    // base + three trickle batches (negated nation 0..2 keys), MOR
    // delete of nation>=20, then a partial rewrite that must not
    // change content
    "lake_binpack" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer WHERE c_nationkey < 20
        |UNION ALL
        |SELECT -c_custkey, c_name, c_nationkey, 0.0,
        |       'TRICKLE' || CAST(c_nationkey AS VARCHAR)
        |FROM customer WHERE c_nationkey <= 2
        |ORDER BY c_custkey""".stripMargin,

    // staged batch (negated nation-7 keys) published after audit —
    // final state is base plus the staged rows
    "lake_wap_tag" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer
        |UNION ALL
        |SELECT -c_custkey, c_name, c_nationkey, 0.0, 'STAGED'
        |FROM customer WHERE c_nationkey = 7
        |ORDER BY c_custkey""".stripMargin,

    // the sorted/bloomed table holds every orders row; the checked
    // range scan is a plain filter over it
    "lake_sorted_scan" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        |FROM orders WHERE o_orderkey BETWEEN 1000 AND 1400
        |ORDER BY o_orderkey""".stripMargin,

    // the z-ordered table holds every orders row; the checked probe is
    // a plain custkey range over it
    "lake_zorder_scan" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders WHERE o_custkey BETWEEN 100 AND 200
        |ORDER BY o_orderkey""".stripMargin,

    // the whole-dir delete is metadata-only (zero jobs, asserted
    // in-query); a partial delete then exercises the exact fallback
    "lake_meta_delete" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_orderkey < 10000
        |  AND o_orderkey NOT BETWEEN 7000 AND 7100
        |ORDER BY o_orderkey""".stripMargin,

    // the scoped compaction folds only the hot dirs (asserted
    // in-query); the table equals orders minus the MOR-deleted band
    "lake_compact_where" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders WHERE o_orderkey NOT BETWEEN 11000 AND 11200
        |ORDER BY o_orderkey""".stripMargin,

    // half of orders pre-exists as plain parquet and is imported
    // in place (metadata-only, asserted in-query); the combined table
    // must answer a probe exactly like the original full table
    "lake_add_files" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders WHERE o_custkey BETWEEN 500 AND 700
        |ORDER BY o_orderkey""".stripMargin,

    // the engine answers from manifests alone (asserted in-query);
    // the oracle recomputes by scanning the full table
    "lake_meta_agg" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
        |  MIN(o_totalprice) AS min_tp,
        |  MAX(o_totalprice) AS max_tp
        |FROM orders""".stripMargin,

    // the committed transaction refreshes gold over ALL orders; the
    // failed one rolls back and changes nothing
    "lake_txn" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    // erasure sweep: subjects 1..50 physically gone (residual pinned 0
    // by the engine's storage-level re-scan); counts of the remainder
    "lake_forget" ->
      """SELECT 'events' AS tbl, CAST(COUNT(*) AS BIGINT) AS rows_remaining,
        |       CAST(0 AS BIGINT) AS residual_rows
        |FROM events WHERE user_id NOT BETWEEN 1 AND 50
        |UNION ALL
        |SELECT 'profiles', CAST(COUNT(*) AS BIGINT), CAST(0 AS BIGINT)
        |FROM customer WHERE c_custkey NOT BETWEEN 1 AND 50
        |ORDER BY tbl""".stripMargin,

    // erasure cascaded into the at-ingest dedup index (residual pinned
    // 0 per index table by the engine's requires); tombstones for
    // non-subject docs survive by design, so the post-erasure kept
    // report over the remaining docs equals the exhaustive answer over
    // the FULL corpus slice, restricted to survivors
    "lake_forget_cascade" ->
      """WITH d AS (SELECT * FROM documents WHERE doc_id < 250),
        |w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w FROM d),
        |g AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(w) - 1, 1)),
        |        i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS s FROM w),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |        len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS a_sz, len(b.s) AS b_sz
        |      FROM g a JOIN g b ON a.doc_id < b.doc_id),
        |dropped AS (SELECT DISTINCT b_id FROM p
        |            WHERE CAST(inter AS DOUBLE) / (a_sz + b_sz - inter) >= 0.5)
        |SELECT doc_id, doc_id NOT IN (SELECT b_id FROM dropped) AS kept
        |FROM d WHERE doc_id >= 10 ORDER BY doc_id""".stripMargin,

    // catalog-wide erasure discovers the subject-keyed derived rollup;
    // after erasure the surviving view equals the relational aggregate
    // of the remaining customers (residual/discovery pinned by the
    // engine's requires)
    "lake_forget_derived" ->
      """SELECT o_custkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders WHERE o_custkey NOT BETWEEN 1 AND 50
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    // bitmap-segment erasure: after removing users 1..50 from every
    // segment by ANDNOT, segment cardinalities must equal the
    // relational DAU of the remaining users (residual bits pinned 0 by
    // the engine's storage-level bitmap audit)
    "lake_forget_segments" ->
      """SELECT event_type, CAST(ts AS DATE) AS day,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        |FROM events WHERE user_id NOT BETWEEN 1 AND 50
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the incrementally-maintained view equals the direct aggregate of
    // the source's final state (initial %4∈{1,2} + appended %4=3,
    // minus the MOR-deleted %8=2); sums ride exact integer cents
    // enrich → rollup stack after a fact append + dim re-assignment;
    // orders whose customer is missing group under the NULL segment
    // (the join view's LEFT semantics)
    "lake_mv_stack" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents FROM orders),
        |c AS (SELECT c_custkey,
        |    CASE WHEN c_custkey % 10 = 0 THEN 'MACHINERY' ELSE c_mktsegment END AS c_mktsegment
        |  FROM customer)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM o LEFT JOIN c ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "lake_incr_view" ->
      """SELECT o_custkey,
        |  CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  MIN(o_totalprice) AS min_price,
        |  MAX(o_totalprice) AS max_price,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS avg_cents
        |FROM orders
        |WHERE o_orderkey % 4 <> 0 AND o_orderkey % 8 <> 2
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,

    // the query runs against the BASE table (both user_id parities =
    // all events rows) — the optimizer answers it from the maintained
    // view, which must therefore hold exactly these aggregates
    "lake_view_rewrite" ->
      """SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        |       MIN(value) AS min_value, MAX(value) AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // real Iceberg v2 metadata roundtrip: two append snapshots
    // (keys ≡ 0, 1 mod 3) minus an equality-delete commit (keys ≡ 3
    // mod 6, a subset of the first append)
    "lake_iceberg_read" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 6 <> 3
        |ORDER BY o_orderkey""".stripMargin,

    // Iceberg changelog: s2 insert (keys ≡ 1 mod 3), s3 equality
    // deletes (≡ 3 mod 6), s4 position deletes (≡ 6 mod 12)
    "lake_iceberg_cdf" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |       'insert' AS _change_type, CAST(2 AS BIGINT) AS _commit_version
        |FROM orders WHERE o_orderkey % 3 = 1
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_totalprice, 'delete', CAST(3 AS BIGINT)
        |FROM orders WHERE o_orderkey % 6 = 3
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_totalprice, 'delete', CAST(4 AS BIGINT)
        |FROM orders WHERE o_orderkey % 12 = 6
        |ORDER BY _commit_version, _change_type, o_orderkey""".stripMargin,

    // Delta-log roundtrip: appends of keys ≡ 0, 1 (mod 3) minus a
    // partition delete of '1-URGENT' (tombstones those two commits'
    // files), plus a post-checkpoint append of keys ≡ 2 (all
    // priorities, landing after the delete)
    "lake_delta_read" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE (o_orderkey % 3 IN (0, 1) AND o_orderpriority <> '1-URGENT')
        |   OR o_orderkey % 3 = 2
        |ORDER BY o_orderkey""".stripMargin,

    // Delta change feed: v0 = even keys (partitioned append), v1 = odd
    // keys, v2 = partition delete of BUILDING (tombstoned files re-read
    // as delete rows)
    "lake_delta_cdf" ->
      """SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
        |       'insert' AS _change_type, CAST(0 AS BIGINT) AS _commit_version
        |FROM customer WHERE c_custkey % 2 = 0
        |UNION ALL
        |SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
        |       'insert', CAST(1 AS BIGINT)
        |FROM customer WHERE c_custkey % 2 = 1
        |UNION ALL
        |SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
        |       'delete', CAST(2 AS BIGINT)
        |FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION ALL
        |SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
        |       'delete', CAST(3 AS BIGINT)
        |FROM customer
        |WHERE c_mktsegment <> 'BUILDING' AND c_custkey % 100 = 7
        |ORDER BY _commit_version, _change_type, c_custkey""".stripMargin,

    // hive-layout import (even keys, partition values only in dir
    // names) + owned append (odd keys) = the whole table
    "lake_hive_import" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // one plan over four formats (graft lake, Delta log replay,
    // Iceberg metadata, JDBC) must equal the plain relational answer
    "lake_federation" ->
      """SELECT r.r_name, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // deletion vectors: two composed row-level deletes masked by
    // roaring bitmaps, no file rewritten
    "lake_delta_dv" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_orderkey % 10 <> 3 AND o_totalprice <= 500000.0
        |ORDER BY o_orderkey""".stripMargin,

    // two branch validation writes fast-forwarded onto main — final
    // state is base plus both audited batches
    "lake_branch" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer
        |UNION ALL
        |SELECT -c_custkey, c_name, c_nationkey, 0.0, 'AUDIT1'
        |FROM customer WHERE c_nationkey < 3
        |UNION ALL
        |SELECT c_custkey + 10000000, c_name, c_nationkey, -1.0, 'AUDIT2'
        |FROM customer WHERE c_nationkey BETWEEN 10 AND 12
        |ORDER BY c_custkey""".stripMargin,

    // 4-version history over disjoint key ranges → closed-form
    // changelog: appended rows insert at v2, MOR-deleted rows emit
    // their prior values at v3, the upsert deletes old images and
    // inserts new ones at v4
    "lake_cdc_read" ->
      """SELECT -c_custkey AS c_custkey, c_name, c_nationkey,
        |       0.0 AS c_acctbal, 'APPEND' AS c_mktsegment,
        |       'insert' AS _change_type, CAST(2 AS BIGINT) AS _commit_version
        |FROM customer WHERE c_nationkey = 5
        |UNION ALL
        |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |       'delete', CAST(3 AS BIGINT)
        |FROM customer WHERE c_nationkey >= 20
        |UNION ALL
        |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |       'delete', CAST(4 AS BIGINT)
        |FROM customer WHERE c_nationkey < 3
        |UNION ALL
        |SELECT c_custkey, c_name, c_nationkey, c_acctbal + 500.0, 'UPSERT',
        |       'insert', CAST(4 AS BIGINT)
        |FROM customer WHERE c_nationkey < 3
        |ORDER BY _commit_version, _change_type, c_custkey""".stripMargin,

    // MERGE (double acctbal under nation<5, insert 2) → UPDATE (negate
    // BUILDING balances) → DELETE (nation >= 20), all as SQL statements
    "lake_sql_merge" ->
      """WITH m AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |    CASE WHEN c_nationkey < 5 THEN c_acctbal * 2 ELSE c_acctbal END AS c_acctbal,
        |    c_mktsegment
        |  FROM customer
        |  UNION ALL SELECT CAST(-1 AS BIGINT), 'NEW A', CAST(0 AS INT), 100.0, 'BUILDING'
        |  UNION ALL SELECT CAST(-2 AS BIGINT), 'NEW B', CAST(1 AS INT), 200.0, 'MACHINERY'),
        |u AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |    CASE WHEN c_mktsegment = 'BUILDING' THEN -c_acctbal ELSE c_acctbal END AS c_acctbal,
        |    c_mktsegment
        |  FROM m)
        |SELECT * FROM u WHERE NOT (c_nationkey >= 20)
        |ORDER BY c_custkey""".stripMargin,

    // two single-task commits over an identity-partitioned table →
    // exactly 2 files and 2× the rows per partition value
    "lake_metadata_tables" ->
      """SELECT c_mktsegment, CAST(2 AS BIGINT) AS n_files,
        |       COUNT(*) * 2 AS n_rows
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "lake_update_delete" ->
      """SELECT c_custkey, c_name, c_nationkey,
        |  CASE WHEN c_mktsegment = 'BUILDING' THEN -c_acctbal ELSE c_acctbal END AS c_acctbal,
        |  c_mktsegment
        |FROM customer WHERE NOT (c_nationkey >= 20)
        |ORDER BY c_custkey""".stripMargin,

    "lake_compact" ->
      """SELECT * FROM (SELECT * FROM customer UNION ALL SELECT * FROM customer)
        |ORDER BY c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment""".stripMargin,

    "lake_partition_prune" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""".stripMargin,

    "lake_runtime_filter" ->
      """SELECT c_custkey, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'MACHINERY' AND c_custkey < 200
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "lake_maintenance" ->
      """SELECT * FROM (
        |  SELECT * FROM customer
        |  UNION ALL SELECT * FROM customer WHERE c_nationkey < 10)
        |ORDER BY c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment""".stripMargin,

    "lake_hidden_partition" ->
      """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
        |SELECT * FROM ev
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts <= TIMESTAMP '2024-01-20 00:00:00'
        |ORDER BY event_id""".stripMargin,

    // layout evolution (unpartitioned -> days(ts)) must never change
    // semantics: the scan over both generations equals a plain filter
    "lake_spec_evolution" ->
      """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
        |SELECT * FROM ev
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts <= TIMESTAMP '2024-01-20 00:00:00'
        |ORDER BY event_id""".stripMargin,

    // incremental append read over (v1, v4]: the two appended slices
    // (o_orderkey % 3 IN (1, 2)); the seed slice (% 3 = 0) and the
    // compaction rewrite in the range are not delivered
    "lake_incremental_read" ->
      """SELECT * FROM orders WHERE o_orderkey % 3 IN (1, 2)
        |ORDER BY o_orderkey""".stripMargin,

    "pipeline_gold" ->
      "SELECT event_type, COUNT(*) AS total_count FROM events GROUP BY 1 ORDER BY 1",

    // the full curation pipeline: quality filter → lang filter → exact
    // dedup (min doc per fingerprint) → near-dup dedup (jaccard ≥ 0.5
    // reachability, keep component min) → per-language token budget
    "pipeline_traindata" ->
      """WITH RECURSIVE
        |q AS (
        |  SELECT doc_id, lang, text, n_chars,
        |    len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_words,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_tokens,
        |    CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS INT) AS n_punct,
        |    CASE WHEN len(list_filter(string_split(text, ' '), t -> t <> '')) > 0
        |         THEN CAST(len(list_filter(string_split(text, ' '),
        |                t -> t IN ('the','a','of','and','is','to','in'))) AS DOUBLE)
        |              / len(list_filter(string_split(text, ' '), t -> t <> ''))
        |         ELSE 0.0 END AS stop_ratio,
        |    CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |         WHEN text LIKE '% der %' OR text LIKE '% und %' OR text LIKE '% nicht %' THEN 'de'
        |         WHEN text LIKE '% le %' OR text LIKE '% la %' OR text LIKE '% et %' THEN 'fr'
        |         WHEN text LIKE '% el %' OR text LIKE '% que %' OR text LIKE '% los %' THEN 'es'
        |         WHEN text LIKE '% the %' OR text LIKE '% and %' OR text LIKE '% of %' THEN 'en'
        |         ELSE 'und' END AS pred
        |  FROM documents),
        |f AS (
        |  SELECT * FROM q
        |  WHERE n_words >= 5 AND n_chars <= 20000 AND n_punct * 5 <= n_chars
        |    AND stop_ratio <= 0.6
        |    AND pred IN ('en','de','fr','es')),
        |x AS (
        |  SELECT * FROM f
        |  QUALIFY doc_id = MIN(doc_id) OVER (
        |    PARTITION BY md5(trim(lower(regexp_replace(text, '\s+', ' ', 'g')))))),
        |w AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ws FROM x),
        |g AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(ws) - 1, 1)),
        |        i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS s FROM w),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |        len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS a_sz, len(b.s) AS b_sz
        |      FROM g a JOIN g b ON a.doc_id < b.doc_id),
        |prs AS (SELECT a_id, b_id FROM p
        |        WHERE CAST(inter AS DOUBLE) / (a_sz + b_sz - inter) >= 0.5),
        |e AS (SELECT a_id AS u, b_id AS v FROM prs
        |      UNION SELECT b_id, a_id FROM prs),
        |r(u, cand) AS (
        |  SELECT u, u FROM (SELECT DISTINCT u FROM e)
        |  UNION
        |  SELECT e.u, r.cand FROM e JOIN r ON r.u = e.v),
        |dropd AS (
        |  SELECT u AS doc_id FROM r GROUP BY u HAVING u <> MIN(cand))
        |SELECT lang, pred, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        |FROM x WHERE doc_id NOT IN (SELECT doc_id FROM dropd)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "t_lang_id" ->
      """SELECT lang,
        |  CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |       WHEN text LIKE '% der %' OR text LIKE '% und %' OR text LIKE '% nicht %' THEN 'de'
        |       WHEN text LIKE '% le %' OR text LIKE '% la %' OR text LIKE '% et %' THEN 'fr'
        |       WHEN text LIKE '% el %' OR text LIKE '% que %' OR text LIKE '% los %' THEN 'es'
        |       WHEN text LIKE '% the %' OR text LIKE '% and %' OR text LIKE '% of %' THEN 'en'
        |       ELSE 'und' END AS pred,
        |  COUNT(*) AS n
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "t_quality_score" ->
      """WITH q AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_words,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_tokens,
        |    CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS INT) AS n_punct,
        |    CASE WHEN len(list_filter(string_split(text, ' '), x -> x <> '')) > 0
        |         THEN CAST(len(list_filter(string_split(text, ' '),
        |                x -> x IN ('the','a','of','and','is','to','in'))) AS DOUBLE)
        |              / len(list_filter(string_split(text, ' '), x -> x <> ''))
        |         ELSE 0.0 END AS stop_ratio,
        |    n_chars
        |  FROM documents)
        |SELECT doc_id, CAST(n_words AS INT) AS n_words, n_tokens, n_punct, stop_ratio,
        |  CASE WHEN n_words < 5 THEN 'too_short'
        |       WHEN n_chars > 20000 THEN 'too_long'
        |       WHEN n_punct * 5 > n_chars THEN 'too_punct'
        |       WHEN stop_ratio > 0.6 THEN 'boilerplate'
        |       ELSE 'good' END AS bucket
        |FROM q ORDER BY doc_id""".stripMargin,

    "t_token_stats" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT)) AS BIGINT) AS total_tokens,
        |  MAX(CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT)) AS max_tokens,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "t_fingerprint" ->
      """SELECT doc_id, md5(trim(lower(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    // portable md5 bucket: first 8 hex chars parsed big-endian, mod 100
    // exact per-(source, lang) quotas ranked by the portable md5
    // Efraimidis–Spirakis keys from 52 exact md5 bits: both engines
    // evaluate the same IEEE doubles, so the ranking is portable
    "t_weighted_sample" ->
      """WITH pr AS (
        |  SELECT source, doc_id,
        |    ln((CAST(list_sum(list_transform(range(1, 14),
        |          i -> CAST(strpos('0123456789abcdef',
        |                 substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)
        |               * CAST(power(16, 13 - i) AS BIGINT))) AS BIGINT) + 1)
        |       / 4503599627370496.0) / n_chars AS key
        |  FROM documents)
        |SELECT source, doc_id, rk FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY key DESC, doc_id) AS rk
        |  FROM pr)
        |WHERE rk <= 20 ORDER BY source, rk""".stripMargin,
    "t_stratified_sample" ->
      """SELECT doc_id, source, lang, rk FROM (
        |  SELECT doc_id, source, lang,
        |    row_number() OVER (PARTITION BY source, lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 40
        |ORDER BY source, lang, rk""".stripMargin,

    "t_hash_sample" ->
      """SELECT doc_id, source, lang FROM documents
        |WHERE (list_sum(list_transform(range(1, 9),
        |  i -> (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)
        |       * CAST(power(16, 8 - i) AS BIGINT))) % 100) < 37
        |ORDER BY doc_id""".stripMargin,

    "t_token_budget" ->
      """WITH q AS (
        |  SELECT source, doc_id,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT source, doc_id, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM q)
        |SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept,
        |       MAX(doc_id) AS last_doc_id
        |FROM c WHERE cum <= 20000 GROUP BY 1 ORDER BY 1""".stripMargin,

    // the gram key is the RAW 3-gram string (no digest — the r8 hash-
    // equivalence and r9 md5-prefix variants both failed the driver);
    // index generation via unnest(generate_series(...)) — the most
    // version-stable DuckDB spelling of "i = 1 .. n-2"
    "t_novelty" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents),
        |ix AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i FROM w WHERE len(w) >= 3),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g FROM ix),
        |fr AS (SELECT g, min(doc_id) AS first_id FROM sh GROUP BY g)
        |SELECT s.doc_id, count(*) AS n_shingles,
        |  CAST(sum(CASE WHEN f.first_id = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  CAST(sum(CASE WHEN f.first_id = s.doc_id THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS novelty
        |FROM sh s JOIN fr f USING (g)
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    // bisect leg for t_novelty: gram extraction only, no first-
    // occurrence join — integer counts
    "t_shingle_card" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents),
        |ix AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i FROM w WHERE len(w) >= 3),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g FROM ix)
        |SELECT doc_id, count(*) AS n_shingles
        |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t_contamination" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents),
        |g AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(w) - 2, 1)),
        |        i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3]))) AS s FROM w),
        |bench AS (SELECT * FROM g WHERE doc_id % 50 = 0),
        |train AS (SELECT * FROM g WHERE doc_id % 50 <> 0)
        |SELECT t.doc_id, count(DISTINCT b.doc_id) AS n_bench, min(b.doc_id) AS first_bench
        |FROM train t JOIN bench b ON len(list_intersect(t.s, b.s)) > 0
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    // both engines append the same synthetic contact line, then redact
    // it by pattern (regex subset Java and RE2 treat identically)
    "t_pii_redact" ->
      """WITH p AS (SELECT doc_id,
        |  text || ' Contact: user' || doc_id || '@mail.example or +1 555 0' || doc_id || '.' AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '\+\d[\d ]+\d')) AS BIGINT) AS n_phones,
        |  regexp_replace(regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |                 '\+\d[\d ]+\d', '<PHONE>', 'g') AS redacted
        |FROM p ORDER BY doc_id""".stripMargin,

    // duplicate-word and top-bigram fractions over the FILTERED word
    // sequence (integer-derived doubles: both engines divide the same
    // exact longs)
    "t_repetition" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents),
        |ws AS (SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS n_distinct,
        |       list_transform(range(1, greatest(len(w), 1)), i -> w[i] || ' ' || w[i+1]) AS bgs FROM w),
        |b AS (SELECT doc_id, bg, count(*) AS c
        |      FROM (SELECT doc_id, unnest(bgs) AS bg FROM ws) GROUP BY doc_id, bg),
        |bt AS (SELECT doc_id, max(c) AS top_bigram_n, sum(c) AS n_bigrams FROM b GROUP BY doc_id)
        |SELECT ws.doc_id, ws.n_words,
        |  1.0 - CAST(ws.n_distinct AS DOUBLE) / ws.n_words AS dup_word_frac,
        |  CAST(bt.top_bigram_n AS DOUBLE) / bt.n_bigrams AS top_bigram_frac
        |FROM ws JOIN bt ON ws.doc_id = bt.doc_id ORDER BY ws.doc_id""".stripMargin,

    // concat-and-chunk packing at L=512: prefix sums per source, bins
    // from floored division, tail pad modulo L
    "t_seq_pack" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT source, doc_id, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM d)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(floor(MAX(cum) / 512.0) AS BIGINT) AS n_full_seqs,
        |  CAST(SUM(CASE WHEN CAST(floor((cum - 1) / 512.0) AS BIGINT) >
        |                CAST(floor((cum - n_tokens) / 512.0) AS BIGINT)
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_spanning,
        |  CAST((512 - (MAX(cum) % 512)) % 512 AS BIGINT) AS tail_pad
        |FROM c GROUP BY source ORDER BY source""".stripMargin,

    // overlapping 64-token windows advancing by 48; last window
    // shrink-wraps to the tail. DuckDB replays the chunk arithmetic
    // over the same token list (1-based indexing on both sides).
    "t_chunk_overlap" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]') AS toks
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
        |    CASE WHEN len(toks) <= 64 THEN 1
        |         ELSE CAST(floor((len(toks) - 64 + 47) / 48.0) AS BIGINT) + 1
        |    END AS n_chunks
        |  FROM d WHERE len(toks) > 0),
        |c AS (
        |  SELECT doc_id, toks, n,
        |    CAST(unnest(range(0, n_chunks)) AS BIGINT) AS chunk_idx
        |  FROM n)
        |SELECT doc_id, chunk_idx,
        |  least(64, n - chunk_idx * 48) AS chunk_tokens,
        |  toks[CAST(chunk_idx * 48 + 1 AS INT)] AS head_token,
        |  toks[CAST(chunk_idx * 48 + least(64, n - chunk_idx * 48) AS INT)] AS tail_token
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    // global 5-gram frequency → per-doc duplicated-span coverage; the
    // oracle replays the gram build as list slices over the filtered
    // word sequence
    "t_dup_span" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 3),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS gram
        |      FROM w WHERE len(w) >= 5),
        |f AS (SELECT gram, count(*) AS gf FROM g GROUP BY gram),
        |d AS (SELECT g.doc_id, count(*) AS n_grams,
        |        sum(CASE WHEN f.gf >= 2 THEN 1 ELSE 0 END) AS n_dup
        |      FROM g JOIN f USING (gram) GROUP BY g.doc_id)
        |SELECT doc_id, n_grams,
        |  CAST(n_dup AS DOUBLE) / n_grams AS dup_frac,
        |  (CAST(n_dup AS DOUBLE) / n_grams) <= 0.5 AS keep
        |FROM d ORDER BY doc_id""".stripMargin,

    // BM25 (k1=1.2, b=0.75, idf = ln(1+(N-df+.5)/(df+.5))); scores are
    // positive so round-half-away and round-half-up agree; round(,6)
    // absorbs last-ulp ln/summation-order drift between engines
    "t_bm25_topk" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents),
        |d AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl FROM w),
        |g AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM d),
        |t AS (SELECT doc_id, unnest(w) AS term FROM w),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM t
        |       WHERE term IN ('spark', 'join', 'window') GROUP BY 1, 2),
        |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1)
        |SELECT tf.doc_id,
        |  round(sum(ln(1 + (g.n_docs - df.df + 0.5) / (df.df + 0.5)) * tf.tf * 2.2
        |        / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / g.avgdl))), 6) AS bm25
        |FROM tf JOIN df USING (term) JOIN d ON tf.doc_id = d.doc_id CROSS JOIN g
        |GROUP BY tf.doc_id ORDER BY bm25 DESC, tf.doc_id LIMIT 20""".stripMargin,

    // corpus-unigram-LM mean token log-prob (CCNet-style quality
    // score); avg over ≤~60 lns → summation-order drift ≪ round(,6)
    "t_unigram_logprob" ->
      """WITH t AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
        |           FROM documents),
        |lm AS (SELECT term, count(*) AS tc FROM t GROUP BY term),
        |tot AS (SELECT CAST(sum(tc) AS DOUBLE) AS corpus_tokens FROM lm)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  round(CAST(sum(CAST(ln(CAST(tc AS DOUBLE) / corpus_tokens) AS DECIMAL(27,13))) AS DOUBLE)
        |        / count(*), 6) AS mean_logprob
        |FROM t JOIN lm USING (term) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // CCNet bucketing: the ranking score is an order-free exact-decimal
    // mean (never a rounded double — a round() boundary is where 1-ulp
    // summation noise flips a tier), so both engines cut identical
    // terciles per lang from identical doubles
    "t_ccnet_tiers" ->
      """WITH t AS (SELECT doc_id, lang,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
        |  FROM documents),
        |lm AS (SELECT term, count(*) AS tc FROM t GROUP BY term),
        |tot AS (SELECT CAST(sum(tc) AS DOUBLE) AS corpus_tokens FROM lm),
        |s AS (SELECT doc_id, lang,
        |    CAST(sum(CAST(ln(CAST(tc AS DOUBLE) / corpus_tokens) AS DECIMAL(27,13))) AS DOUBLE)
        |      / count(*) AS mean_logprob
        |  FROM t JOIN lm USING (term) CROSS JOIN tot GROUP BY doc_id, lang),
        |r AS (SELECT lang, mean_logprob, doc_id,
        |    ntile(3) OVER (PARTITION BY lang ORDER BY mean_logprob DESC, doc_id) AS tier
        |  FROM s)
        |SELECT lang, tier,
        |  CASE tier WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
        |  count(*) AS n_docs,
        |  round(CAST(sum(CAST(mean_logprob AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_logprob
        |FROM r GROUP BY lang, tier ORDER BY lang, tier""".stripMargin,

    // tf-idf top-3 keywords per doc; row_number ties break on term so
    // both engines rank identically
    "t_idf_keywords" ->
      """WITH t AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
        |           FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM t) GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        |s AS (SELECT tf.doc_id, tf.term, tf.tf * ln(n.n_docs / df.df) AS score
        |      FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (SELECT doc_id, term, score,
        |        row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
        |      FROM s)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, round(score, 6) AS score
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // exact heavy hitters: the Spark side's Misra-Gries candidate pass
    // must be invisible in the result — plain GROUP BY/HAVING here
    "t_heavy_hitters" ->
      """WITH w AS (
        |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
        |  FROM documents),
        |t AS (SELECT GREATEST(CAST(FLOOR(COUNT(*) / 30.0) AS BIGINT), 1) AS thr FROM w)
        |SELECT word, COUNT(*) AS n FROM w GROUP BY word
        |HAVING COUNT(*) >= (SELECT thr FROM t)
        |ORDER BY n DESC, word""".stripMargin,

    // the custom bounded-heap top-k aggregate must be result-identical
    // to the full-sort window form — which is exactly this oracle
    "t_topk_by" ->
      """WITH s AS (SELECT lang, CAST(doc_id AS VARCHAR) AS doc_id,
        |             CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS DOUBLE) AS score
        |           FROM documents),
        |r AS (SELECT lang, doc_id, score,
        |        row_number() OVER (PARTITION BY lang ORDER BY score DESC, doc_id ASC) AS rank
        |      FROM s)
        |SELECT lang, CAST(rank AS BIGINT) AS rank, score, doc_id
        |FROM r WHERE rank <= 3 ORDER BY lang, rank""".stripMargin,

    // TextRank: the 5 weighted-PageRank iterations unroll as chained
    // CTEs over HUGEINTs — the Spark side's scaled-integer arithmetic
    // (ops/TextRank.scala) makes every rank value exactly restatable
    // here (integer sums are order-independent; a double formulation
    // would drift past any rounding tolerance by iteration 5)
    "t_textrank" ->
      """WITH w AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents),
        |p0 AS (SELECT unnest(list_transform(range(1, len(ws)),
        |         i -> ws[i] || chr(1) || ws[i+1])) AS pg
        |       FROM w WHERE len(ws) >= 2),
        |p1 AS (SELECT string_split(pg, chr(1))[1] AS a, string_split(pg, chr(1))[2] AS b
        |       FROM p0 WHERE string_split(pg, chr(1))[1] <> string_split(pg, chr(1))[2]),
        |ed AS (SELECT a, b FROM p1 UNION ALL SELECT b, a FROM p1),
        |eg AS (SELECT a, b, CAST(count(*) AS HUGEINT) AS w FROM ed GROUP BY a, b),
        |ej AS (SELECT eg.a, eg.b, eg.w, o.ow
        |       FROM eg JOIN (SELECT a, sum(w) AS ow FROM eg GROUP BY a) o ON o.a = eg.a),
        |r0 AS (SELECT DISTINCT a AS term, CAST(1000000000000 AS HUGEINT) AS r FROM eg),
        |r1 AS (SELECT e.b AS term, 150000000000 + sum((r.r * e.w * 85) // (e.ow * 100)) AS r
        |       FROM ej e JOIN r0 r ON r.term = e.a GROUP BY e.b),
        |r2 AS (SELECT e.b AS term, 150000000000 + sum((r.r * e.w * 85) // (e.ow * 100)) AS r
        |       FROM ej e JOIN r1 r ON r.term = e.a GROUP BY e.b),
        |r3 AS (SELECT e.b AS term, 150000000000 + sum((r.r * e.w * 85) // (e.ow * 100)) AS r
        |       FROM ej e JOIN r2 r ON r.term = e.a GROUP BY e.b),
        |r4 AS (SELECT e.b AS term, 150000000000 + sum((r.r * e.w * 85) // (e.ow * 100)) AS r
        |       FROM ej e JOIN r3 r ON r.term = e.a GROUP BY e.b),
        |r5 AS (SELECT e.b AS term, 150000000000 + sum((r.r * e.w * 85) // (e.ow * 100)) AS r
        |       FROM ej e JOIN r4 r ON r.term = e.a GROUP BY e.b)
        |SELECT term, round(CAST(r AS DOUBLE) / 1e12, 6) AS score
        |FROM r5 ORDER BY r DESC, term LIMIT 20""".stripMargin,

    // add-one-smoothed bigram LM score; occurrences re-join gram counts
    // and the oracle keys bigrams as "w1\x01w2" strings (the \x01
    // separator cannot appear in space-split words)
    "t_bigram_logprob" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |           FROM documents),
        |t AS (SELECT doc_id, unnest(ws) AS term FROM w),
        |uni AS (SELECT term, count(*) AS uc FROM t GROUP BY term),
        |v AS (SELECT CAST(count(*) AS DOUBLE) AS vs FROM uni),
        |bocc AS (SELECT doc_id,
        |           unnest(list_transform(range(1, len(ws)),
        |             i -> ws[i] || chr(1) || ws[i+1])) AS bg
        |         FROM w WHERE len(ws) >= 2),
        |big AS (SELECT bg, count(*) AS bc FROM bocc GROUP BY bg)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(CAST(sum(CAST(ln((bc + 1.0) / (uc + vs)) AS DECIMAL(27,13))) AS DOUBLE)
        |        / count(*), 6) AS mean_logprob
        |FROM bocc JOIN big USING (bg)
        |  JOIN uni ON uni.term = string_split(bg, chr(1))[1]
        |  CROSS JOIN v
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // p ∝ n^0.5 temperature mixture; the cross-source normalizer sums
    // exact integer milli-weights so the float ratios are bit-identical
    "t_domain_mixture" ->
      """WITH s AS (SELECT source, count(*) AS n_docs,
        |  CAST(floor(sqrt(count(*)) * 1e6) AS BIGINT) AS sw FROM documents GROUP BY source),
        |t AS (SELECT sum(sw) AS total FROM s)
        |SELECT source, n_docs,
        |  round(CAST(sw AS DOUBLE) / total, 6) AS weight,
        |  CAST(floor(CAST(1000.0 AS DOUBLE) * sw / total) AS BIGINT) AS target_docs
        |FROM s, t ORDER BY source""".stripMargin,

    "d_dedup_exact" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  COUNT(DISTINCT md5(trim(lower(regexp_replace(text, '\s+', ' ', 'g'))))) AS n_distinct
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "d_ngram_jaccard" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents),
        |g AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(w) - 1, 1)),
        |        i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS s FROM w),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |        len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS a_sz, len(b.s) AS b_sz
        |      FROM g a JOIN g b ON a.doc_id < b.doc_id)
        |SELECT a_id, b_id, CAST(inter AS DOUBLE) / (a_sz + b_sz - inter) AS jaccard
        |FROM p WHERE CAST(inter AS DOUBLE) / (a_sz + b_sz - inter) >= 0.5
        |ORDER BY a_id, b_id""".stripMargin,

    // corpus ∪ prefix-half copies: the asymmetric criterion's ground
    // truth restated over string trigrams (same no-collision argument
    // as d_ngram_jaccard); w[1:k] is end-inclusive like Spark's slice.
    // Stated as a POSTING-LIST join (pairs share a trigram), the same
    // index shape the engine uses — the all-pairs cross form is
    // equivalent (inter=0 pairs can't pass the floor) but quadratic
    // in corpus size, which at sf0.1's 10k docs the oracle can't pay
    "d_ngram_containment" ->
      """WITH w0 AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents),
        |u AS (SELECT doc_id, w FROM w0
        |      UNION ALL
        |      SELECT doc_id + 10000000, w[1 : CAST(greatest(len(w) // 2, 3) AS BIGINT)] FROM w0),
        |g AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(w) - 1, 1)),
        |        i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS s FROM u),
        |e AS (SELECT doc_id, len(s) AS sz, unnest(s) AS t FROM g),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter,
        |        min(a.sz) AS a_sz, min(b.sz) AS b_sz
        |      FROM e a JOIN e b ON a.t = b.t AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT a_id, b_id, a_sz, b_sz,
        |  CAST(inter AS DOUBLE) / least(a_sz, b_sz) AS containment
        |FROM p WHERE CAST(inter AS DOUBLE) / least(a_sz, b_sz) >= 0.8
        |ORDER BY a_id, b_id""".stripMargin,

    "d_dedup_minhash" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents),
        |g AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(w) - 1, 1)),
        |        i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS s FROM w),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |        len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS a_sz, len(b.s) AS b_sz
        |      FROM g a JOIN g b ON a.doc_id < b.doc_id)
        |SELECT a_id, b_id, CAST(inter AS DOUBLE) / (a_sz + b_sz - inter) AS jaccard
        |FROM p WHERE CAST(inter AS DOUBLE) / (a_sz + b_sz - inter) >= 0.5
        |ORDER BY a_id, b_id""".stripMargin,

    "e_cosine_dup_pairs" ->
      """SELECT vec_id AS a_id, vec_id + 10000000 AS b_id
        |FROM embeddings ORDER BY a_id, b_id""".stripMargin,

    // two planted copies per vector form 3-cliques; dedup keeps the
    // originals, each labeled with its merged cluster's size
    "e_semantic_dedup" ->
      """SELECT vec_id, CAST(3 AS BIGINT) AS cluster_size
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    // SemDeDup's k-means pruning finds the same planted 3-cliques the
    // LSH path does: identical vectors share a cell by construction,
    // background pairs sit far below the 0.99 cosine threshold
    "e_semdedup_kmeans" ->
      """SELECT vec_id, CAST(3 AS BIGINT) AS cluster_size
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    // portable md5-bit simhash restated in SQL: bit i of a token's
    // contribution = bit i%4 of hex nibble i/4 of md5(token); vote sum
    // > 0 sets fingerprint bit; output = ALL pairs at Hamming <= 3
    // (the Spark side's 4-chunk banding is complete by pigeonhole, so
    // an exhaustive oracle is the correct comparison)
    "d_simhash_pairs" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        |  FROM documents),
        |votes AS (
        |  SELECT doc_id, b.i AS bit,
        |    SUM(CASE WHEN (((strpos('0123456789abcdef', substr(md5(w), (b.i // 4) + 1, 1)) - 1)
        |                    >> (b.i % 4)) & 1) = 1 THEN 1 ELSE -1 END) AS v
        |  FROM toks, (SELECT unnest(range(0, 64)) AS i) b
        |  GROUP BY 1, 2),
        |fpv AS (
        |  SELECT doc_id, list(CASE WHEN v > 0 THEN 1 ELSE 0 END ORDER BY bit) AS bits
        |  FROM votes GROUP BY 1),
        |fp AS (
        |  SELECT d.doc_id, COALESCE(f.bits, list_transform(range(0, 64), x -> 0)) AS bits
        |  FROM documents d LEFT JOIN fpv f USING (doc_id)),
        |pr AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    CAST(list_sum(list_transform(range(1, 65),
        |      i -> CASE WHEN a.bits[i] <> b.bits[i] THEN 1 ELSE 0 END)) AS INT) AS hamming
        |  FROM fp a JOIN fp b ON a.doc_id < b.doc_id)
        |SELECT a_id, b_id, hamming FROM pr WHERE hamming <= 3
        |ORDER BY a_id, b_id""".stripMargin,

    // per-vector int8 quantization fidelity: double-precision ordered
    // left folds replay bit-for-bit (list_reduce = aggregate), rounding
    // absorbs any last-ulp divergence
    "e_embed_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS x FROM embeddings),
        |s AS (
        |  SELECT vec_id, x,
        |    greatest(list_max(list_transform(x, v -> abs(v))), 1e-12) / 127.0 AS scale
        |  FROM e),
        |d AS (
        |  SELECT vec_id, x, scale,
        |    list_transform(x, v -> floor(v / scale + 0.5) * scale) AS deq
        |  FROM s),
        |m AS (
        |  SELECT vec_id, scale,
        |    list_reduce(list_transform(range(1, len(x) + 1),
        |      i -> (x[i] - deq[i]) * (x[i] - deq[i])), (a, b) -> a + b) / len(x) AS mse,
        |    list_reduce(list_transform(range(1, len(x) + 1),
        |      i -> x[i] * deq[i]), (a, b) -> a + b) /
        |      (sqrt(list_reduce(list_transform(x, v -> v * v), (a, b) -> a + b)) *
        |       sqrt(list_reduce(list_transform(deq, v -> v * v), (a, b) -> a + b))) AS cosf
        |  FROM d)
        |SELECT vec_id, round(scale, 6) AS q_scale, round(mse, 9) AS mse,
        |       round(cosf, 6) AS cos_fidelity
        |FROM m ORDER BY vec_id""".stripMargin,

    // id-set compare only: sim values differ cross-engine in the last
    // ulps, but the rank-10/11 margin dwarfs float error (see
    // SimQueries.cosineTopK)
    "e_cosine_topk" ->
      """WITH p AS (SELECT vec_id AS probe_id, embedding AS pv FROM embeddings WHERE vec_id < 5),
        |s AS (SELECT p.probe_id, e.vec_id AS neighbor_id,
        |        list_cosine_similarity(p.pv, e.embedding) AS sim
        |      FROM p JOIN embeddings e ON e.vec_id <> p.probe_id),
        |r AS (SELECT probe_id, neighbor_id,
        |        row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rk
        |      FROM s)
        |SELECT probe_id, neighbor_id FROM r WHERE rk <= 10
        |ORDER BY probe_id, neighbor_id""".stripMargin,

    // planted-neighbor fixture (SimQueries.withPlantedNeighbors): the
    // oracle re-plants the 5 perturbed copies per probe (DuckDB lambda
    // index i is 1-based; Spark's transform index is 0-based) and runs
    // its own exact brute-force top-5 — the ANN answer must equal it,
    // so index recall is part of the hash assertion
    "e_cosine_ann_topk" ->
      """WITH pl AS (
        |  SELECT vec_id + 10000000 * j.j AS vec_id,
        |    list_transform(embedding, (x, i) -> CASE WHEN i = 1
        |      THEN CAST(CAST(x AS DOUBLE) + 0.001 * j.j AS FLOAT) ELSE x END) AS embedding
        |  FROM embeddings, (SELECT unnest(range(1, 6)) AS j) j
        |  WHERE vec_id < 5),
        |corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL SELECT vec_id, embedding FROM pl),
        |p AS (SELECT vec_id AS probe_id, embedding AS pv FROM embeddings WHERE vec_id < 5),
        |s AS (SELECT p.probe_id, c.vec_id AS neighbor_id,
        |        list_cosine_similarity(p.pv, c.embedding) AS sim
        |      FROM p JOIN corpus c ON c.vec_id <> p.probe_id),
        |r AS (SELECT probe_id, neighbor_id,
        |        row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rk
        |      FROM s)
        |SELECT probe_id, neighbor_id FROM r WHERE rk <= 5
        |ORDER BY probe_id, neighbor_id""".stripMargin,

    // same fixture and exact-top-k oracle as e_cosine_ann_topk: both
    // index families must recover the provable exact answer
    "e_cosine_ivf_topk" ->
      """WITH pl AS (
        |  SELECT vec_id + 10000000 * j.j AS vec_id,
        |    list_transform(embedding, (x, i) -> CASE WHEN i = 1
        |      THEN CAST(CAST(x AS DOUBLE) + 0.001 * j.j AS FLOAT) ELSE x END) AS embedding
        |  FROM embeddings, (SELECT unnest(range(1, 6)) AS j) j
        |  WHERE vec_id < 5),
        |corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL SELECT vec_id, embedding FROM pl),
        |p AS (SELECT vec_id AS probe_id, embedding AS pv FROM embeddings WHERE vec_id < 5),
        |s AS (SELECT p.probe_id, c.vec_id AS neighbor_id,
        |        list_cosine_similarity(p.pv, c.embedding) AS sim
        |      FROM p JOIN corpus c ON c.vec_id <> p.probe_id),
        |r AS (SELECT probe_id, neighbor_id,
        |        row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rk
        |      FROM s)
        |SELECT probe_id, neighbor_id FROM r WHERE rk <= 5
        |ORDER BY probe_id, neighbor_id""".stripMargin,

    // same fixture and exact-top-k oracle as the LSH/IVF variants: the
    // compression family must also recover the provable exact answer
    "e_cosine_pq_topk" ->
      """WITH pl AS (
        |  SELECT vec_id + 10000000 * j.j AS vec_id,
        |    list_transform(embedding, (x, i) -> CASE WHEN i = 1
        |      THEN CAST(CAST(x AS DOUBLE) + 0.001 * j.j AS FLOAT) ELSE x END) AS embedding
        |  FROM embeddings, (SELECT unnest(range(1, 6)) AS j) j
        |  WHERE vec_id < 5),
        |corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL SELECT vec_id, embedding FROM pl),
        |p AS (SELECT vec_id AS probe_id, embedding AS pv FROM embeddings WHERE vec_id < 5),
        |s AS (SELECT p.probe_id, c.vec_id AS neighbor_id,
        |        list_cosine_similarity(p.pv, c.embedding) AS sim
        |      FROM p JOIN corpus c ON c.vec_id <> p.probe_id),
        |r AS (SELECT probe_id, neighbor_id,
        |        row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rk
        |      FROM s)
        |SELECT probe_id, neighbor_id FROM r WHERE rk <= 5
        |ORDER BY probe_id, neighbor_id""".stripMargin,

    // IVFADC (prune × compress × re-rank composed) must still recover
    // the same provable exact top-5 as each family alone
    "e_cosine_ivfpq_topk" ->
      """WITH pl AS (
        |  SELECT vec_id + 10000000 * j.j AS vec_id,
        |    list_transform(embedding, (x, i) -> CASE WHEN i = 1
        |      THEN CAST(CAST(x AS DOUBLE) + 0.001 * j.j AS FLOAT) ELSE x END) AS embedding
        |  FROM embeddings, (SELECT unnest(range(1, 6)) AS j) j
        |  WHERE vec_id < 5),
        |corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL SELECT vec_id, embedding FROM pl),
        |p AS (SELECT vec_id AS probe_id, embedding AS pv FROM embeddings WHERE vec_id < 5),
        |s AS (SELECT p.probe_id, c.vec_id AS neighbor_id,
        |        list_cosine_similarity(p.pv, c.embedding) AS sim
        |      FROM p JOIN corpus c ON c.vec_id <> p.probe_id),
        |r AS (SELECT probe_id, neighbor_id,
        |        row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rk
        |      FROM s)
        |SELECT probe_id, neighbor_id FROM r WHERE rk <= 5
        |ORDER BY probe_id, neighbor_id""".stripMargin,

    // byte-level Rabin-Karp winnowing restated in SQL: k-gram hash at
    // 0-based start s = sum of byte(s+1+i) * 1000003^(7-i) mod 2^64
    // (HUGEINT arithmetic, then reinterpreted as signed BIGINT exactly
    // like the JVM's wrapping longs); window minima over w=4 k-gram
    // positions; tie-break is irrelevant because only VALUES are kept.
    // Bytes come from hex(encode(text)) so multi-byte UTF-8 matches
    // the JVM's getBytes exactly.
    "t_winnow_overlap" ->
      """WITH bs AS (
        |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n FROM documents),
        |pos AS (
        |  SELECT doc_id, n, unnest(range(1, n + 1)) AS p FROM bs),
        |byt AS (
        |  SELECT doc_id, n, p,
        |    (strpos('0123456789ABCDEF', substr(hx, 2*p - 1, 1)) - 1) * 16
        |    + (strpos('0123456789ABCDEF', substr(hx, 2*p, 1)) - 1) AS b
        |  FROM pos JOIN bs USING (doc_id, n)),
        |kg AS (
        |  SELECT doc_id, n, p - 1 - o.i AS s,
        |    SUM(CAST(b AS HUGEINT) * o.pw) % CAST(18446744073709551616 AS HUGEINT) AS hm
        |  FROM byt CROSS JOIN (VALUES
        |    (0, CAST(12924618581234127435 AS HUGEINT)),
        |    (1, CAST(10923514805226455897 AS HUGEINT)),
        |    (2, CAST(14453212906556403763 AS HUGEINT)),
        |    (3, CAST(14003818205314896721 AS HUGEINT)),
        |    (4, CAST(1000009000027000027 AS HUGEINT)),
        |    (5, CAST(1000006000009 AS HUGEINT)),
        |    (6, CAST(1000003 AS HUGEINT)),
        |    (7, CAST(1 AS HUGEINT))) AS o(i, pw)
        |  WHERE p - 1 - o.i >= 0 AND p - 1 - o.i <= n - 8
        |  GROUP BY 1, 2, 3),
        |kh AS (
        |  SELECT doc_id, n, s,
        |    CAST(CASE WHEN hm >= CAST(9223372036854775808 AS HUGEINT)
        |              THEN hm - CAST(18446744073709551616 AS HUGEINT) ELSE hm END AS BIGINT) AS h
        |  FROM kg),
        |win AS (
        |  SELECT doc_id, s - o.j AS st, MIN(h) AS fp
        |  FROM kh CROSS JOIN (VALUES (0), (1), (2), (3)) AS o(j)
        |  WHERE s - o.j >= 0 AND s - o.j <= greatest(n - 7 - 4, 0)
        |  GROUP BY 1, 2),
        |fps AS (SELECT DISTINCT doc_id, fp FROM win),
        |cm AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) > 20),
        |flt AS (SELECT * FROM fps WHERE fp NOT IN (SELECT fp FROM cm))
        |SELECT a_id, b_id, shared_fp FROM (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared_fp
        |  FROM flt a JOIN flt b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |ORDER BY shared_fp DESC, a_id, b_id LIMIT 100""".stripMargin,

    "m_media_features" ->
      """SELECT doc_id, 'image/fake' AS media_type,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  CAST(64 + octet_length(encode(text)) % 64 AS INT) AS width,
        |  CAST(64 + (octet_length(encode(text)) // 7) % 64 AS INT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the engine encodes a (id+y)%256 vertical-gradient PNG per doc in
    // the executors and decodes the actual pixels back through the
    // JDK codec; PNG is lossless so the oracle states the features in
    // closed form — mean luma over rows equals mean over pixels
    // because each row is constant
    // ±a square wave over n frames: RMS = mean|x| = a exactly (PCM16
    // is lossless; sqrt of the exact a² quotient is exact)
    "m_audio_decode" ->
      """SELECT doc_id,
        |  CAST(8000 AS INT) AS sample_rate,
        |  CAST(100 + doc_id % 50 AS BIGINT) AS n_frames,
        |  CAST(100 + (doc_id * 13) % 1000 AS DOUBLE) AS rms,
        |  CAST(100 + (doc_id * 13) % 1000 AS DOUBLE) AS mean_abs
        |FROM documents ORDER BY doc_id""".stripMargin,

    // an n-frame GIF (n = 3 + doc_id%4), every 2nd frame sampled;
    // frame f is constant gray (doc_id*5 + f*40) % 256, lossless end
    // to end — list-context range() because the table-function form
    // can't take column parameters in DuckDB
    "m_video_frames" ->
      """WITH k AS (SELECT doc_id, CAST(3 + doc_id % 4 AS INT) AS n FROM documents),
        |f AS (SELECT doc_id,
        |        CAST(unnest(list_filter(range(0, n), i -> i % 2 = 0)) AS INT) AS frame_idx
        |      FROM k)
        |SELECT doc_id, frame_idx,
        |  CAST(10 AS INT) AS width, CAST(8 AS INT) AS height,
        |  CAST((doc_id * 5 + frame_idx * 40) % 256 AS DOUBLE) AS mean_luma
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    // row y's gray value is (doc_id + y) % 256; with height <= 16 the
    // mod wraps at most once, so the row-sum is closed-form:
    // h*d + h(h-1)/2 - 256*max(0, d+h-256) with d = doc_id % 256.
    // Mean over pixels equals mean over rows (each row is constant),
    // and both engines divide the same exact integers.
    "m_image_decode" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(8 + doc_id % 9 AS INT) AS width,
        |    CAST(8 + (doc_id // 3) % 9 AS INT) AS height,
        |    CAST(doc_id % 256 AS BIGINT) AS d
        |  FROM documents)
        |SELECT doc_id, width, height,
        |  CAST(height * d + height * (height - 1) // 2
        |       - 256 * GREATEST(0, d + height - 256) AS DOUBLE) / height AS mean_luma
        |FROM base ORDER BY doc_id""".stripMargin,

    "s_window_tumbling" ->
      """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
        |SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM ev GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "s_stream_tumbling" ->
      """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
        |SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM ev GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // streaming top-k == the batch window ranking; item ties break on
    // the STRING form of event_id (the aggregate's comparator domain)
    "s_stream_topk" ->
      """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
        |r AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
        |        value, CAST(event_id AS VARCHAR) AS event_id,
        |        row_number() OVER (
        |          PARTITION BY time_bucket(INTERVAL '1 hour', ts), event_type
        |          ORDER BY value DESC, CAST(event_id AS VARCHAR) ASC) AS rank
        |      FROM ev)
        |SELECT ws, event_type, CAST(rank AS BIGINT) AS rank, value, event_id
        |FROM r WHERE rank <= 3 ORDER BY ws, event_type, rank""".stripMargin,

    // a 1h/30m hopping window assigns each event to exactly the two
    // 30m-aligned starts in (ts-1h, ts]
    "s_window_sliding" ->
      """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
        |SELECT ws, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS ws, event_type, value FROM ev
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS ws,
        |         event_type, value FROM ev)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "s_sessionize" ->
      """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
        |g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
        |              OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |       MIN(ts) AS t_start, MAX(ts) AS t_end
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin,

    "csv_roundtrip" ->
      "SELECT * FROM region ORDER BY r_regionkey",

    // events written as ORC and read back with a pushed filter must
    // equal the parquet-side aggregation bit-for-bit
    "orc_roundtrip" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events WHERE event_type <> 'error'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "s_stream_dedup" ->
      """SELECT event_type, COUNT(DISTINCT event_id) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // final mapGroupsWithState state per user == batch count(*)
    "s_custom_state" ->
      """SELECT user_id, COUNT(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // at-ingest incremental dedup must converge to the exhaustive
    // batch answer: kept = no 3-gram Jaccard ≥ 0.5 pair with a
    // smaller id (same shingle CTE as d_dedup_minhash; banding
    // recall on this fixture is exhaustive-verified there)
    "s_incremental_dedup" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents),
        |g AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(w) - 1, 1)),
        |        i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS s FROM w),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |        len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS a_sz, len(b.s) AS b_sz
        |      FROM g a JOIN g b ON a.doc_id < b.doc_id),
        |dropped AS (SELECT DISTINCT b_id FROM p
        |            WHERE CAST(inter AS DOUBLE) / (a_sz + b_sz - inter) >= 0.5)
        |SELECT d.doc_id, d.doc_id NOT IN (SELECT b_id FROM dropped) AS kept
        |FROM documents d ORDER BY d.doc_id""".stripMargin,

    // at-ingest contamination screening on RAW 4-gram strings (the
    // bucket hash is layout-only): flags equal the closed-form
    // arrivals×benchmark distinct-gram overlap
    "s_incremental_contamination" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents),
        |ix AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 3)) AS i FROM w WHERE len(w) >= 4),
        |g AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS g FROM ix),
        |bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 50 = 0),
        |arr AS (SELECT doc_id, g FROM g WHERE doc_id % 50 <> 0),
        |hits AS (SELECT a.doc_id, count(*) AS n FROM arr a JOIN bench b USING (g) GROUP BY a.doc_id)
        |SELECT d.doc_id, CAST(coalesce(h.n, 0) AS BIGINT) AS n_hit_grams,
        |       coalesce(h.n, 0) > 0 AS contaminated
        |FROM documents d LEFT JOIN hits h USING (doc_id)
        |WHERE d.doc_id % 50 <> 0 ORDER BY d.doc_id""".stripMargin,

    // planted exact copies (vec_id + 10000001) are the only cosine
    // >= 0.99 pairs, and identical vectors collide in every LSH table,
    // so the at-ingest kept set is: originals kept, copies dropped
    "s_incremental_semdedup" ->
      """WITH c AS (SELECT vec_id FROM embeddings
        |           UNION ALL SELECT vec_id + 10000001 FROM embeddings)
        |SELECT vec_id, vec_id < 10000001 AS kept
        |FROM c ORDER BY vec_id""".stripMargin,

    // the committed stream must deliver every event exactly once:
    // n = n_distinct = the batch per-type counts
    "s_lake_commit_stream" ->
      """SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT event_id) AS n_distinct
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // per-batch runtime-filtered enrichment must equal the plain
    // batch join of all events against the dim
    "s_stream_enrich" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // the Delta-log stream delivers both partitioned append commits
    // and passes over the checkpoint — per-type counts equal batch
    "s_delta_stream" ->
      """SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT event_id) AS n_distinct
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // the CDC stream must deliver exactly the closed-form changelog:
    // v1 base inserts, v2 appended rows, v3 MOR-deleted originals,
    // v4 upsert delete+insert pairs
    "s_lake_cdc_stream" ->
      """WITH ch AS (
        |  SELECT c_acctbal, 'insert' AS ct, 1 AS v FROM customer
        |  UNION ALL SELECT 0.0, 'insert', 2 FROM customer WHERE c_nationkey = 5
        |  UNION ALL SELECT c_acctbal, 'delete', 3 FROM customer WHERE c_nationkey >= 20
        |  UNION ALL SELECT c_acctbal, 'delete', 4 FROM customer WHERE c_nationkey < 3
        |  UNION ALL SELECT c_acctbal + 500.0, 'insert', 4 FROM customer WHERE c_nationkey < 3)
        |SELECT CAST(v AS BIGINT) AS _commit_version, ct AS _change_type,
        |  COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |FROM ch GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the continuously-maintained view equals the direct aggregate of
    // the source's final state (all events, minus the MOR-deleted
    // %5=0); sums ride exact integer milli-values
    // streamed join-view maintenance converges to the full enrichment
    "s_join_view_stream" ->
      """SELECT c.c_custkey, c.c_nationkey, c.c_acctbal,
        |  CASE WHEN n.n_nationkey < 10 THEN 'NX' ELSE n.n_name END AS n_name
        |FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |ORDER BY c.c_custkey""".stripMargin,
    "s_view_maintain" ->
      """SELECT user_id,
        |  CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(SUM(CAST(ROUND(value * 1000, 0) AS BIGINT)) AS BIGINT) AS sum_millis,
        |  MIN(CAST(ROUND(value * 1000, 0) AS BIGINT)) AS min_millis,
        |  MAX(CAST(ROUND(value * 1000, 0) AS BIGINT)) AS max_millis
        |FROM events
        |WHERE event_id % 5 <> 0
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "s_stream_join" ->
      """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
        |SELECT p.user_id, p.purchase_id, c.click_id, p.p_ts, c.c_ts FROM
        |  (SELECT user_id, event_id AS purchase_id, ts AS p_ts FROM ev
        |   WHERE event_type = 'purchase') p
        |JOIN
        |  (SELECT user_id, event_id AS click_id, ts AS c_ts FROM ev
        |   WHERE event_type = 'click') c
        |ON p.user_id = c.user_id
        |  AND c.c_ts >= p.p_ts - INTERVAL 1 HOUR AND c.c_ts <= p.p_ts
        |ORDER BY p.user_id, p.purchase_id, c.click_id""".stripMargin,

    // left-outer variant: both sides cut to max(ts) - 20 min (the
    // stream's deterministic-eviction cutoff; the stream watermark
    // still sees max(ts)), unmatched purchases carry null click cols
    "s_stream_outer_join" ->
      """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
        |co AS (SELECT max(ts) - INTERVAL 20 MINUTE AS c FROM ev)
        |SELECT p.user_id, p.purchase_id, p.p_ts, c.click_id, c.c_ts FROM
        |  (SELECT user_id, event_id AS purchase_id, ts AS p_ts FROM ev, co
        |   WHERE event_type = 'purchase' AND ts <= co.c) p
        |LEFT JOIN
        |  (SELECT user_id, event_id AS click_id, ts AS c_ts FROM ev, co
        |   WHERE event_type = 'click' AND ts <= co.c) c
        |ON p.user_id = c.user_id
        |  AND c.c_ts >= p.p_ts - INTERVAL 1 HOUR AND c.c_ts <= p.p_ts
        |ORDER BY p.user_id, p.purchase_id, c.click_id""".stripMargin,

    "a_window_functions" ->
      """SELECT l_suppkey, rn, rk, drk, tile, l_orderkey, l_linenumber,
        |       prev_qty, next_qty, rolling_qty
        |FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber,
        |    ROW_NUMBER()  OVER w AS rn,
        |    RANK()        OVER w AS rk,
        |    DENSE_RANK()  OVER w AS drk,
        |    NTILE(4)      OVER w AS tile,
        |    LAG(l_quantity, 1)  OVER w AS prev_qty,
        |    LEAD(l_quantity, 1) OVER w AS next_qty,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER (
        |      PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_qty
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber))
        |WHERE rn <= 5 ORDER BY l_suppkey, rn""".stripMargin,

    "a_scalar_functions" ->
      """SELECT p_partkey,
        |  round(sqrt(CAST(CAST(p_retailprice AS DECIMAL(18,4)) AS DOUBLE)), 6) AS sqrt_price,
        |  abs(p_size - 25) AS size_dev,
        |  CAST(pow(2, p_size % 10) AS BIGINT) AS pow2,
        |  lpad(upper(p_brand), 12, '#') AS brand_pad,
        |  translate(p_type, 'aeiou', 'AEIOU') AS type_tr,
        |  levenshtein(p_brand, p_type) AS lev,
        |  length(p_name) AS name_len,
        |  nullif(p_size, 25) AS size_nullif,
        |  coalesce(nullif(p_size, 25), -1) AS size_coal
        |FROM part ORDER BY p_partkey""".stripMargin,

    "a_word_frequencies" ->
      """SELECT word, COUNT(*) AS n FROM (
        |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
        |  FROM documents)
        |GROUP BY word ORDER BY n DESC, word""".stripMargin,

    "a_pivot_events" ->
      """SELECT user_id,
        |  COUNT(*) FILTER (event_type = 'click')    AS click,
        |  COUNT(*) FILTER (event_type = 'view')     AS view,
        |  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (event_type = 'signup')   AS signup,
        |  COUNT(*) FILTER (event_type = 'error')    AS error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "a_unpivot_events" ->
      """WITH wide AS (
        |  SELECT user_id,
        |    COUNT(*) FILTER (event_type = 'click')    AS click,
        |    COUNT(*) FILTER (event_type = 'view')     AS view,
        |    COUNT(*) FILTER (event_type = 'purchase') AS purchase
        |  FROM events GROUP BY user_id)
        |SELECT user_id, event_type, n FROM (
        |  SELECT user_id, 'click' AS event_type, click AS n FROM wide
        |  UNION ALL SELECT user_id, 'view', view FROM wide
        |  UNION ALL SELECT user_id, 'purchase', purchase FROM wide)
        |ORDER BY user_id, event_type""".stripMargin,

    "a_asof_join" ->
      """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
        |SELECT p.user_id, p.event_id, p.ts,
        |       s.state_ts AS asof_ts, s.state_event_id AS asof_event_id
        |FROM (SELECT user_id, event_id, ts FROM ev WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN
        |     (SELECT user_id, ts AS state_ts, event_id AS state_event_id
        |      FROM ev WHERE event_type = 'click') s
        |ON p.user_id = s.user_id AND p.ts >= s.state_ts
        |ORDER BY p.user_id, p.event_id""".stripMargin,

    // per error event: same-user clicks in the following 10 minutes
    // (engine: binned equi-join; oracle: the naive range join)
    "a_range_join" ->
      """SELECT e.event_id,
        |  CAST(COUNT(c.event_id) AS BIGINT) AS n_clicks
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
        |LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
        |  ON c.user_id = e.user_id
        | AND c.ts >= e.ts AND c.ts <= e.ts + INTERVAL 10 MINUTE
        |GROUP BY e.event_id
        |ORDER BY e.event_id""".stripMargin,

    "a_percentiles" ->
      """SELECT o_orderpriority,
        |  quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.9) AS p90,
        |  COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "a_sql_surface" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus <> 'X'
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "a_cube" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |       COALESCE(o_orderpriority, 'ALL') AS priority,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY 1, 2""".stripMargin,

    "a_grouping_sets" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |       COALESCE(o_orderpriority, 'ALL') AS priority,
        |       COUNT(*) AS n,
        |       GROUPING(o_orderstatus) AS g_status,
        |       GROUPING(o_orderpriority) AS g_priority
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority, g_status, g_priority""".stripMargin,

    // (type × hour) grid over 2024-01-02, silent hours as zeros
    "a_gap_fill" ->
      """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
        |types AS (SELECT DISTINCT event_type FROM ev),
        |hours AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-02 00:00:00',
        |            TIMESTAMP '2024-01-02 23:00:00', INTERVAL 1 HOUR)) AS hour),
        |c AS (SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n,
        |        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |      FROM ev
        |      WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
        |        AND ts < TIMESTAMP '2024-01-03 00:00:00'
        |      GROUP BY 1, 2)
        |SELECT t.event_type, h.hour,
        |       COALESCE(c.n, 0) AS n, COALESCE(c.sum_value, 0.0) AS sum_value
        |FROM types t CROSS JOIN hours h
        |LEFT JOIN c ON c.event_type = t.event_type AND c.hour = h.hour
        |ORDER BY t.event_type, h.hour""".stripMargin,

    // gap(>30min)-delimited sessions via lag + running sum; floor() on
    // both epoch sides mirrors Spark's truncating unix_timestamp so
    // sub-second gaps break sessions identically in both engines
    "a_sessionize_batch" ->
      """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
        |g AS (SELECT user_id, ts, event_id, value, lag(ts, 1) OVER w AS prev_ts
        |      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts, event_id, value,
        |        CASE WHEN prev_ts IS NULL
        |               OR floor(epoch(ts)) - floor(epoch(prev_ts)) > 1800
        |             THEN 1 ELSE 0 END AS new_s
        |      FROM g),
        |x AS (SELECT user_id, ts, value,
        |        CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        |      FROM s)
        |SELECT user_id, sid, min(ts) AS session_start, max(ts) AS session_end,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM x GROUP BY 1, 2 ORDER BY user_id, sid""".stripMargin,

    // dense 5-min grid over 2024-01-02; silent buckets take the line
    // between nearest observed neighbors (edges hold one neighbor)
    "a_interpolate" ->
      """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
        |obs AS (SELECT event_type,
        |          CAST(floor((epoch(ts) - epoch(TIMESTAMP '2024-01-02 00:00:00')) / 300) AS INT) AS idx,
        |          CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
        |        FROM ev
        |        WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
        |          AND ts < TIMESTAMP '2024-01-03 00:00:00'
        |        GROUP BY 1, 2),
        |types AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT t.event_type, CAST(r.range AS INT) AS idx
        |         FROM types t CROSS JOIN range(0, 288) r),
        |x AS (SELECT g.event_type, g.idx, o.v,
        |        last_value(o.v IGNORE NULLS) OVER
        |          (PARTITION BY g.event_type ORDER BY g.idx
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |        last_value(CASE WHEN o.v IS NOT NULL THEN g.idx END IGNORE NULLS) OVER
        |          (PARTITION BY g.event_type ORDER BY g.idx
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pi,
        |        first_value(o.v IGNORE NULLS) OVER
        |          (PARTITION BY g.event_type ORDER BY g.idx
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |        first_value(CASE WHEN o.v IS NOT NULL THEN g.idx END IGNORE NULLS) OVER
        |          (PARTITION BY g.event_type ORDER BY g.idx
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ni
        |      FROM grid g LEFT JOIN obs o
        |        ON o.event_type = g.event_type AND o.idx = g.idx)
        |SELECT event_type,
        |       TIMESTAMP '2024-01-02 00:00:00' + idx * 300 * INTERVAL 1 SECOND AS bucket,
        |       CASE WHEN v IS NOT NULL THEN v
        |            WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
        |              pv + (nv - pv) * (CAST(idx - pi AS DOUBLE) / CAST(ni - pi AS DOUBLE))
        |            ELSE COALESCE(pv, nv) END AS filled,
        |       CASE WHEN v IS NOT NULL THEN 'obs'
        |            WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
        |            ELSE 'edge' END AS src
        |FROM x ORDER BY event_type, bucket""".stripMargin,

    // trailing-6h halving-weight EWMA per type; hour flagged when its
    // count breaks 2x above or 0.5x below the smoothed trend
    "a_ewma_anomaly" ->
      """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
        |c0 AS (SELECT event_type,
        |         CAST(floor((epoch(ts) - epoch(TIMESTAMP '2024-01-01 00:00:00')) / 3600) AS INT) AS idx
        |       FROM ev),
        |c AS (SELECT event_type, idx, COUNT(*) AS n FROM c0
        |      WHERE idx >= 0 AND idx < 720 GROUP BY 1, 2),
        |types AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT t.event_type, CAST(r.range AS INT) AS idx
        |         FROM types t CROSS JOIN range(0, 720) r),
        |f AS (SELECT g.event_type, g.idx, COALESCE(c.n, 0) AS n
        |      FROM grid g LEFT JOIN c
        |        ON c.event_type = g.event_type AND c.idx = g.idx),
        |l AS (SELECT event_type, idx, n,
        |        lag(n, 1) OVER w AS l1, lag(n, 2) OVER w AS l2,
        |        lag(n, 3) OVER w AS l3, lag(n, 4) OVER w AS l4,
        |        lag(n, 5) OVER w AS l5, lag(n, 6) OVER w AS l6
        |      FROM f WINDOW w AS (PARTITION BY event_type ORDER BY idx)),
        |e AS (SELECT event_type, idx, n,
        |        (32.0*l1 + 16.0*l2 + 8.0*l3 + 4.0*l4 + 2.0*l5 + 1.0*l6) / 63.0 AS ewma
        |      FROM l WHERE idx >= 6)
        |SELECT event_type,
        |       TIMESTAMP '2024-01-01 00:00:00' + idx * INTERVAL 1 HOUR AS hour,
        |       n, ewma,
        |       (CAST(n AS DOUBLE) > 2.0 * ewma OR CAST(n AS DOUBLE) < 0.5 * ewma) AS anomaly
        |FROM e ORDER BY event_type, hour""".stripMargin,

    // blocked ER: equality join on the name-prefix block, edit
    // distance only within blocks
    "d_fuzzy_match" ->
      """WITH c AS (SELECT c_custkey, c_name,
        |             substring(c_name, 1, length(c_name)-2) AS blk FROM customer)
        |SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
        |       levenshtein(a.c_name, b.c_name) AS dist
        |FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY a_id, b_id""".stripMargin,

    "a_histogram" ->
      """SELECT CASE WHEN o_totalprice < 0.0 THEN 0
        |            WHEN o_totalprice >= 400000.0 THEN 21
        |            ELSE CAST(floor(o_totalprice / 20000.0) AS BIGINT) + 1 END AS bin,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "a_correlated_subq" ->
      """SELECT p_brand, p_partkey, p_retailprice
        |FROM part p
        |WHERE p_retailprice = (SELECT MIN(p2.p_retailprice)
        |                       FROM part p2 WHERE p2.p_brand = p.p_brand)
        |ORDER BY p_brand, p_partkey""".stripMargin,

    "a_outer_cross" ->
      """SELECT cov.*,
        |  (SELECT COUNT(*) FROM region
        |   CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders)) AS grid_size
        |FROM (
        |  SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
        |         COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |  FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
        |  FULL OUTER JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
        |  USING (nationkey)) cov
        |ORDER BY nationkey""".stripMargin,

    "a_date_arithmetic" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) AS days_to_y2k,
        |  CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE) AS quarter_start,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "a_null_semantics" ->
      """SELECT nullif(p_size, 25) AS sz, COUNT(*) AS n, COUNT(nullif(p_size, 25)) AS n_nonnull
        |FROM part GROUP BY 1 ORDER BY sz ASC NULLS FIRST""".stripMargin,

    // sketch internals are engine-specific; the oracle pins the exact
    // count and asserts the estimate landed within tolerance
    "a_approx_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_orders,
        |       true AS approx_ok
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // per-user first-seen cohorts × day offsets; ts flows only
    // through date() (flavor-insensitive), counts exact
    "a_cohort_retention" ->
      """WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT user_id, MIN(d) AS cohort_d FROM a GROUP BY 1)
        |SELECT f.cohort_d, a.d - f.cohort_d AS day_offset, COUNT(*) AS users
        |FROM a JOIN f ON a.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // each psi term folds to DECIMAL(27,13) BEFORE the sum (absorbs
    // libm-ln ulp noise; exact order-free sum), then round(6) and a
    // `+ 0.0` negative-zero normalization — the r8/r9 round-after-
    // double-sum variant failed the driver's hash twice
    "a_drift_psi" ->
      """WITH b AS (
        |  SELECT event_type, event_id % 2 AS slice,
        |    least(greatest(CAST(floor(value / 10) AS INT), 0), 9) AS bin
        |  FROM events),
        |c AS (
        |  SELECT event_type, bin,
        |    sum(CASE WHEN slice = 0 THEN 1 ELSE 0 END) AS na,
        |    sum(CASE WHEN slice = 1 THEN 1 ELSE 0 END) AS nb
        |  FROM b GROUP BY event_type, bin),
        |t AS (SELECT event_type, sum(na) AS ta, sum(nb) AS tb FROM c GROUP BY event_type),
        |g AS (
        |  SELECT t.event_type, t.ta, t.tb, gs.bin,
        |    coalesce(c.na, 0) AS na, coalesce(c.nb, 0) AS nb
        |  FROM t CROSS JOIN (SELECT unnest(range(0, 10)) AS bin) gs
        |  LEFT JOIN c ON c.event_type = t.event_type AND c.bin = gs.bin)
        |SELECT event_type, CAST(max(ta) AS BIGINT) AS n_a, CAST(max(tb) AS BIGINT) AS n_b,
        |  CAST(round(sum(CAST(
        |    (CAST(na + 1 AS DOUBLE) / (ta + 10) - CAST(nb + 1 AS DOUBLE) / (tb + 10))
        |    * ln((CAST(na + 1 AS DOUBLE) / (ta + 10)) / (CAST(nb + 1 AS DOUBLE) / (tb + 10)))
        |    AS DECIMAL(27,13))), 6) AS DOUBLE) + 0.0 AS psi
        |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin,
    // exact decimal/integer moments, then a fixed dag of double ops —
    // identical on both engines regardless of reduction order
    "a_regr_trend" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) // 1000000 AS sec,
        |    CAST(value AS DECIMAL(18,4)) AS y FROM events),
        |m AS (SELECT event_type, min(sec) AS m FROM e GROUP BY event_type),
        |mom AS (SELECT e.event_type, count(*) AS n,
        |    CAST(sum(sec - m) AS DOUBLE) AS sx,
        |    CAST(sum(CAST((sec - m) * (sec - m) AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
        |    CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(y * y) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(sec - m AS DECIMAL(14,0)) * y) AS DOUBLE) AS sxy
        |  FROM e JOIN m USING (event_type) GROUP BY e.event_type)
        |SELECT event_type, n,
        |  (n * sxy - sx * sy) / (n * sxx - sx * sx) * 86400.0 AS slope_per_day,
        |  (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept,
        |  (n * sxy - sx * sy) * (n * sxy - sx * sy)
        |    / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
        |FROM mom ORDER BY event_type""".stripMargin,

    // exact distinct + exact overlap restated relationally; the engine
    // side answers both from mergeable bitmap segments
    "a_bitmap_distinct" ->
      """WITH t AS (SELECT event_type, count(DISTINCT user_id) AS n_users
        |  FROM events GROUP BY event_type),
        |p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
        |i AS (SELECT e.event_type, count(DISTINCT e.user_id) AS n_also
        |  FROM events e JOIN p USING (user_id) GROUP BY e.event_type)
        |SELECT t.event_type, t.n_users, coalesce(i.n_also, 0) AS n_also_purchase
        |FROM t LEFT JOIN i ON t.event_type = i.event_type
        |ORDER BY t.event_type""".stripMargin,

    // consecutive error→error→purchase, stated with the same two-lead
    // window; span stays in exact integer µs
    "a_pattern_match" ->
      """WITH s AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |    lead(event_type, 1) OVER w AS t1, lead(event_type, 2) OVER w AS t2,
        |    lead(event_id, 1) OVER w AS id1, lead(event_id, 2) OVER w AS id2,
        |    lead(epoch_us(ts), 2) OVER w AS us2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_id AS first_error, id1 AS second_error,
        |  id2 AS purchase_id, us2 - us AS span_us
        |FROM s
        |WHERE event_type = 'error' AND t1 = 'error' AND t2 = 'purchase'
        |ORDER BY user_id, first_error""".stripMargin,

    // exact R-7 interpolated percentiles over integer µs gaps — both
    // engines' quantile conventions agree bit-for-bit
    "a_step_latency" ->
      """WITH g AS (SELECT event_type AS from_type,
        |    lead(event_type) OVER w AS to_type,
        |    lead(epoch_us(ts)) OVER w - epoch_us(ts) AS gap_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT from_type, to_type, count(*) AS n,
        |  quantile_cont(gap_us, 0.5) AS p50_us,
        |  quantile_cont(gap_us, 0.9) AS p90_us
        |FROM g WHERE to_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin,

    // streamed segment store's daily counts == the relational distinct
    "s_segment_maintain" ->
      """WITH d AS (SELECT DISTINCT event_type,
        |    CAST(date_trunc('day', ts) AS DATE) AS day, user_id FROM events)
        |SELECT event_type, day, count(*) AS dau
        |FROM d GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin,

    // DAU/WAU restated relationally (distinct + range self-join); the
    // engine answers the rolling window by OR-merging daily segments
    "a_rolling_distinct" ->
      """WITH d AS (SELECT DISTINCT event_type,
        |    CAST(date_trunc('day', ts) AS DATE) AS day, user_id FROM events),
        |dau AS (SELECT event_type, day, count(*) AS dau FROM d GROUP BY 1, 2),
        |w AS (SELECT a.event_type, a.day, count(DISTINCT b.user_id) AS wau
        |  FROM (SELECT DISTINCT event_type, day FROM d) a
        |  JOIN d b ON a.event_type = b.event_type
        |    AND b.day BETWEEN a.day - 6 AND a.day
        |  GROUP BY 1, 2)
        |SELECT event_type, day, dau, wau
        |FROM dau JOIN w USING (event_type, day)
        |ORDER BY event_type, day""".stripMargin,

    // lag-1 serial correlation; pair order (ts, event_id) is unique so
    // both engines build the identical pair set
    "a_autocorr" ->
      """WITH p AS (SELECT event_type, CAST(value AS DECIMAL(18,4)) AS y,
        |    lag(CAST(value AS DECIMAL(18,4))) OVER (
        |      PARTITION BY event_type ORDER BY ts, event_id) AS x
        |  FROM events),
        |mom AS (SELECT event_type, count(*) AS n_pairs,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(x * x) AS DOUBLE) AS sxx,
        |    CAST(sum(y) AS DOUBLE) AS sy, CAST(sum(y * y) AS DOUBLE) AS syy,
        |    CAST(sum(x * y) AS DOUBLE) AS sxy
        |  FROM p WHERE x IS NOT NULL GROUP BY event_type)
        |SELECT event_type, n_pairs,
        |  (n_pairs * sxy - sx * sy) /
        |    (sqrt(n_pairs * sxx - sx * sx) * sqrt(n_pairs * syy - sy * sy)) AS autocorr
        |FROM mom ORDER BY event_type""".stripMargin,

    // leading digit from the fixed-scale DECIMAL rendering — both
    // engines print scale-4 decimals identically, so no log10-at-a-
    // power-boundary or float-format hazards
    "a_benford" ->
      """WITH d AS (SELECT CAST(regexp_extract(
        |    CAST(CAST(value AS DECIMAL(18,4)) AS VARCHAR), '[1-9]') AS INT) AS digit
        |  FROM events WHERE value > 0),
        |c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit)
        |SELECT digit, n,
        |  CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE) AS observed,
        |  log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS expected
        |FROM c ORDER BY digit""".stripMargin,

    // time-range window as a self-join: every event pairs with its
    // user's events in the trailing hour (itself included), frame
    // bounds compared in absolute microseconds so the ts flavor is moot
    "a_time_range_window" ->
      """SELECT a.event_id, a.user_id, count(*) AS n_1h,
        |  CAST(sum(CAST(b.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_1h
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND epoch_us(b.ts) BETWEEN epoch_us(a.ts) - 3600000000 AND epoch_us(a.ts)
        |GROUP BY a.event_id, a.user_id
        |ORDER BY a.event_id""".stripMargin,
    // first-order Markov transitions; lead over (ts, event_id) keeps
    // sequences deterministic under tied timestamps; ts never emitted
    "a_event_transitions" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |tr AS (SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
        |       FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM tr GROUP BY 1)
        |SELECT tr.from_type, tr.to_type, tr.n,
        |  round(tr.n / CAST(tot.tot AS DOUBLE), 6) AS p
        |FROM tr JOIN tot USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,

    // market-basket pair rules: support / confidence / lift over
    // per-user distinct event-type baskets; expression structure
    // mirrors the Spark side exactly so the doubles divide identically
    "a_assoc_lift" ->
      """WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
        |n AS (SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n_users FROM b),
        |s AS (SELECT event_type, COUNT(*) AS sc FROM b GROUP BY 1),
        |p AS (SELECT x.event_type AS a, y.event_type AS b, COUNT(*) AS pc
        |      FROM b x JOIN b y ON x.user_id = y.user_id
        |        AND x.event_type < y.event_type
        |      GROUP BY 1, 2)
        |SELECT p.a, p.b, p.pc AS n_both,
        |  round(p.pc / n.n_users, 6) AS support,
        |  round(CAST(p.pc AS DOUBLE) / sa.sc, 6) AS confidence,
        |  round((p.pc * n.n_users) / (sa.sc * CAST(sb.sc AS DOUBLE)), 6) AS lift
        |FROM p
        |JOIN s sa ON sa.event_type = p.a
        |JOIN s sb ON sb.event_type = p.b
        |CROSS JOIN n
        |ORDER BY p.a, p.b""".stripMargin,

    // strictly-increasing-time funnel; ts compared, never emitted, so
    // no flavor pin; rates are single divisions of exact longs
    "a_funnel_steps" ->
      """WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
        |            WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        |       JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        |       JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1),
        |c AS (SELECT '1_view' AS step, COUNT(*) AS users FROM s1
        |      UNION ALL SELECT '2_click', COUNT(*) FROM s2
        |      UNION ALL SELECT '3_purchase', COUNT(*) FROM s3),
        |b AS (SELECT CAST(COUNT(*) AS DOUBLE) AS base FROM s1)
        |SELECT step, users, round(users / base, 6) AS conversion
        |FROM c CROSS JOIN b ORDER BY step""".stripMargin,

    // sketch internals are engine-specific; the oracle pins the exact
    // count and asserts every estimate landed within tolerance
    "a_approx_percentile" ->
      """SELECT event_type, count(*) AS n,
        |  true AS p50_ok, true AS p95_ok, true AS p99_ok
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // mean/std from EXACT decimal Σx, Σx² (summation-order-free), then
    // the identical double expression tree on both engines; ts column
    // never emitted so no flavor pin needed
    "a_zscore_outliers" ->
      """WITH st AS (
        |  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s2
        |  FROM events GROUP BY 1),
        |m0 AS (SELECT event_type, n, s / n AS mean,
        |        sqrt((s2 - s * s / n) / (n - 1.0)) AS std FROM st),
        |m AS (SELECT * FROM m0 WHERE n > 1.0 AND std > 0.0)
        |SELECT e.event_type, e.event_id, e.value,
        |  round((e.value - m.mean) / m.std, 6) AS z
        |FROM events e JOIN m USING (event_type)
        |WHERE abs((e.value - m.mean) / m.std) > 3.0
        |ORDER BY e.event_type, e.event_id""".stripMargin,

    "d_dedup_clusters" ->
      """WITH RECURSIVE
        |w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents),
        |g AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(w) - 1, 1)),
        |        i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS s FROM w),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |        len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS a_sz, len(b.s) AS b_sz
        |      FROM g a JOIN g b ON a.doc_id < b.doc_id),
        |pairs AS (SELECT a_id, b_id FROM p
        |          WHERE CAST(inter AS DOUBLE) / (a_sz + b_sz - inter) >= 0.5),
        |e AS (SELECT a_id AS u, b_id AS v FROM pairs
        |      UNION SELECT b_id, a_id FROM pairs),
        |r(u, cand) AS (
        |  SELECT u, u FROM (SELECT DISTINCT u FROM e)
        |  UNION
        |  SELECT e.u, r.cand FROM e JOIN r ON r.u = e.v)
        |SELECT u AS doc_id, MIN(cand) AS cluster_root
        |FROM r GROUP BY u ORDER BY doc_id""".stripMargin,
  )
}
