package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator family from SURVEY §2; the
  * matching `oracleSql` is the ANSI-SQL equivalent the driver runs in
  * DuckDB over the same parquet tables. Aggregated measures are cast to
  * DECIMAL before summing on BOTH sides so results are exact,
  * order-independent, and hash-identical (see Reports scaladoc).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Reports.q03SalesRegister(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"  -> (Reports.q01PricingSummary _),
    "q02_trial_balance"    -> (Reports.q02TrialBalance _),
    "q03_sales_register"   -> (Reports.q03SalesRegister _),
    "q04_cross_nation"     -> (Reports.q04CrossNation _),
    "q05_semi_join"        -> (Reports.q05SemiJoin _),
    "q06_anti_join"        -> (Reports.q06AntiJoin _),
    "q07_top1_per_group"   -> (Reports.q07TopOrderPerCustomer _),
    "q08_string_agg"       -> (Reports.q08StringAgg _),
    "q09_ledger_view"      -> (Reports.q09LedgerView _),
    "q10_daily_gapfill"    -> (Reports.q10DailyGapFill _),
    "q11_monthly"          -> (Reports.q11Monthly _),
    "q12_hierarchy_closure" -> (Reports.q12HierarchyClosure _),
    "q13_subtree_members"  -> (Reports.q13SubtreeMembers _),
    "q14_case_over_max"    -> (Reports.q14CaseOverMax _),
    "q15_first_wins_dedup" -> (Reports.q15FirstWins _),
    "q16_cdc_changelog"    -> (Reports.q16CdcChangeLog _),
    "q17_cdc_merge"        -> (Reports.q17CdcMerge _),
    "q18_events_hourly"    -> (Reports.q18EventsHourly _),
    "q19_events_json"      -> (Reports.q19EventsJson _),
    "q20_dedup_exact"      -> (Curation.q20DedupExact _),
    "q21_dedup_ngram_jaccard" -> (Curation.q21DedupNgram _),
    "q22_dedup_minhash_lsh" -> (Curation.q22DedupMinhash _),
    "q23_dedup_simhash"    -> (Curation.q23DedupSimhash _),
    "q24_embed_knn"        -> (Curation.q24EmbedKnn _),
    "q25_embed_ann_lsh"    -> (Curation.q25EmbedAnnLsh _),
    "q26_embed_near_dup"   -> (Curation.q26EmbedNearDup _),
    "q27_text_langid"      -> (Curation.q27TextLangId _),
    "q28_text_quality"     -> (Curation.q28TextQuality _),
    "q29_token_freq"       -> (Curation.q29TokenFreq _),
    "q30_fingerprint"      -> (Curation.q30Fingerprint _),
    "q31_media_features"   -> (Curation.q31MediaFeatures _),
    "q47_embed_ann_ivf"    -> (Curation.q47EmbedAnnIvf _),
    "q48_embed_near_dup_lsh" -> (Curation.q48EmbedNearDupLsh _),
    "q51_embed_near_dup_lsh_hi" -> (Curation.q51EmbedNearDupLshHi _),
    "q52_dedup_corpus"     -> (Curation.q52DedupCorpus _),
    "q53_embed_ann_ivf_clustered" -> (Curation.q53EmbedAnnIvfClustered _),
    "q54_salted_join"      -> (Reports.q54SaltedJoin _),
    "q55_asof_join"        -> (Reports.q55AsofJoin _),
    "q56_range_join"       -> (Reports.q56RangeJoin _),
    "q57_hash_split"       -> (Curation.q57HashSplit _),
    "q59_value_stats"      -> (Reports.q59ValueStats _),
    "q60_sessions_batch"   -> (Reports.q60SessionsBatch _),
    "q58_lang_quota"       -> (Curation.q58LangQuota _),
    // self-gating (q83's pattern): emits within-rank-error flags the
    // SQL oracle CAN check — the raw GK sketch values never could;
    // ReportsSpec additionally gates the raw q59ValueStatsApprox
    "q61_value_stats_approx" ->
      ((s: org.apache.spark.sql.SparkSession, d: String) =>
        Reports.q61ValueStatsChecked(s, d)),
    "q62_dedup_incremental" -> (Curation.q62DedupIncremental _),
    "q63_repetition"       -> (Curation.q63Repetition _),
    "q64_decontamination"  -> (Curation.q64Decontamination _),
    "q65_corpus_mix"       -> (Curation.q65CorpusMix _),
    "q66_token_entropy"    -> (Curation.q66TokenEntropy _),
    "q67_curation_pipeline" -> (Curation.q67CurationPipeline _),
    "q68_dup_clusters"     -> (Curation.q68DupClusters _),
    "q69_boilerplate"      -> (Curation.q69Boilerplate _),
    "q70_quality_sample"   -> (Curation.q70QualitySample _),
    "q71_source_overlap"   -> (Curation.q71SourceOverlap _),
    "q72_cluster_reps"     -> (Curation.q72ClusterReps _),
    "q73_gram_novelty"     -> (Curation.q73GramNovelty _),
    "q74_redaction"        -> (Curation.q74Redaction _),
    "q75_sequence_packing" -> (Curation.q75SequencePacking _),
    "q76_mixture_rebalance" -> (Curation.q76MixtureRebalance _),
    "q77_unigram_surprisal" -> (Curation.q77UnigramSurprisal _),
    "q78_split_leakage"    -> (Curation.q78SplitLeakage _),
    "q79_importance_weights" -> (Curation.q79ImportanceWeights _),
    "q80_semantic_dedup"   -> (Curation.q80SemanticDedup _),
    "q81_embed_outliers"   -> (Curation.q81EmbedOutliers _),
    "q82_vocab_stats"      -> (Curation.q82VocabStats _),
    // self-gating: emits a within-5·rsd flag the SQL oracle CAN check
    // (the raw HLL++ estimate is engine-specific and never could);
    // ReportsSpec additionally gates the raw estimates
    "q83_vocab_stats_approx" -> (Curation.q83VocabStatsApprox _),
    "q84_passage_dedup"    -> (Curation.q84PassageDedup _),
    "q85_containment"      -> (Curation.q85Containment _),
    "q86_shard_manifest"   -> (Curation.q86ShardManifest _),
    "q87_bigram_surprisal" -> (Curation.q87BigramSurprisal _),
    "q88_source_passage_matrix" -> (Curation.q88SourcePassageMatrix _),
    "q89_effective_tokens" -> (Curation.q89EffectiveTokens _),
    "q90_media_wav"        -> (Curation.q90MediaWav _),
    "q91_media_bmp"        -> (Curation.q91MediaBmp _),
    "q92_media_audio_gate" -> (Curation.q92MediaAudioGate _),
    "q93_media_image_dedup" -> (Curation.q93MediaImageDedup _),
    "q94_media_image_neardup" -> (Curation.q94MediaImageNearDup _),
    "q95_media_audio_neardup" -> (Curation.q95MediaAudioNearDup _),
    "q96_media_png"        -> (Curation.q96MediaPng _),
    "q97_stream_quality_monitor" -> (Curation.q97StreamQualityMonitor _),
    "q99_media_flac"       -> (Curation.q99MediaFlac _),
    "q100_gzip_ingest"     -> (Curation.q100GzipIngest _),
    "q101_stream_sessions" -> (Curation.q101StreamSessions _),
    "q102_stream_ingest_dedup" -> (Curation.q102StreamIngestDedup _),
    "q103_stream_passage_hits" -> (Curation.q103StreamPassageHits _),
    "q98_dedup_simhash_scaled" -> (Curation.q98DedupSimhashScaled _),
    "q104_media_jpeg"      -> (Curation.q104MediaJpeg _),
    "q105_media_video"     -> (Curation.q105MediaVideo _),
    "q106_media_gif"       -> (Curation.q106MediaGif _),
    "q107_compressed_ingest" -> (Curation.q107CompressedIngest _),
    "q108_media_resize"    -> (Curation.q108MediaResize _),
    "q109_frame_sample"    -> (Curation.q109FrameSample _),
    "q110_url_dedup"       -> (Curation.q110UrlDedup _),
    "q111_html_extract"    -> (Curation.q111HtmlExtract _),
    "q112_media_foreign"   -> ((s: SparkSession, dir: String) =>
      graft.operators.ForeignMedia.features(s, dir).toDF()
        .orderBy("doc_id")),
    "q113_stream_exact_dedup" -> (Curation.q113StreamExactDedup _),
    "q115_embed_ann_ivf_stored" -> (Curation.q115EmbedAnnIvfStored _),
    "q117_media_foreign_audio" -> ((s: SparkSession, dir: String) =>
      graft.operators.ForeignMedia.audioFeatures(s, dir).toDF()
        .orderBy("doc_id")),
    "q118_stream_hourly" -> (Curation.q118StreamHourlyCounts _),
    "q119_cdc_cascade_update" -> (Reports.q119CdcCascadeUpdate _),
    "q120_cdc_voucher_renumber" -> (Reports.q120CdcVoucherRenumber _),
    "q121_codec_corrupt_reject" -> ((s: SparkSession, dir: String) =>
      graft.operators.ForeignMedia.corruptRejections(s, dir).toDF()
        .orderBy("doc_id")),
    "q122_unicode_normalize" -> (Curation.q122UnicodeNormalize _),
    "q123_embed_quant_int8" -> (Curation.q123EmbedQuantInt8 _),
    "q124_embed_quant_knn" -> (Curation.q124EmbedQuantKnn _),
    "q125_embed_ann_ivf_sq8" -> (Curation.q125EmbedAnnIvfSq8 _),
    "q126_embed_ann_ivf_sq8_stored" ->
      (Curation.q126EmbedAnnIvfSq8Stored _),
    "q127_media_foreign_video" -> ((s: SparkSession, dir: String) =>
      graft.operators.ForeignMedia.videoFeatures(s, dir).toDF()
        .orderBy("doc_id")),
    "q128_media_foreign_progressive" -> ((s: SparkSession, dir: String) =>
      graft.operators.ForeignMedia.progFeatures(s, dir).toDF()
        .orderBy("doc_id")),
    "q129_dedup_bloom_incremental" ->
      (Curation.q129BloomIncrementalExact _),
    "q130_embed_ann_pq" -> (Curation.q130EmbedAnnPq _),
    "q131_embed_ann_pq_clustered" ->
      (Curation.q131EmbedAnnPqClustered _),
    "q132_embed_ann_pq_stored" -> (Curation.q132EmbedAnnPqStored _),
    "q133_ann_index_append" -> (Curation.q133CdcIvfAppend _),
    "q134_embed_ann_ivfpq_stored" ->
      (Curation.q134EmbedAnnIvfPqStored _),
    "q135_pq_index_append" -> (Curation.q135PqIndexAppend _),
    "q136_dedup_bloom_artifact" ->
      (Curation.q136BloomArtifactIncremental _),
    "q137_bm25_topk" -> (Curation.q137Bm25TopK _),
    "q138_bm25_stored" -> (Curation.q138Bm25Stored _),
    "q139_bm25_index_append" -> (Curation.q139Bm25IndexAppend _),
    "q140_link_pagerank" -> (Curation.q140LinkPageRank _),
    "q116_dedup_incremental_stored" ->
      (Curation.q116DedupIncrementalStored _),
    "q141_neardup_index_append" ->
      (Curation.q141NearDupIndexAppend _),
    "q142_dup_clusters_fixpoint" ->
      (Curation.q142DupClustersFixpoint _),
    "q143_bpe_merges" -> (Curation.q143BpeMerges _),
    "q144_bpe_token_counts" -> (Curation.q144BpeTokenCounts _),
    "q145_bpe_packing" -> (Curation.q145BpePacking _),
    "q146_link_pagerank_dangling" ->
      (Curation.q146LinkPageRankDangling _),
    "q147_substring_dedup" -> (Curation.q147SubstringDedup _),
    "q148_stream_index_append" -> (Curation.q148StreamIndexAppend _),
    "q149_link_hits" -> (Curation.q149LinkHits _),
    "q150_token_heavy_hitters" -> (Curation.q150TokenHeavyHitters _),
    "q151_substring_dedup_stored" ->
      (Curation.q151SubstringDedupStored _),
    "q152_substring_effective" ->
      (Curation.q152SubstringEffective _),
    "q153_link_quality_gate" -> (Curation.q153LinkQualityGate _),
    "q154_stream_bm25_serve" -> (Curation.q154StreamBm25Serve _),
    "q155_link_prior_stored" -> (Curation.q155LinkPriorStored _),
    "q156_hits_prior_stored" -> (Curation.q156HitsPriorStored _),
    "q157_cms_heavy_hitters_stored" ->
      (Curation.q157CmsHeavyHittersStored _),
    "q158_stream_substring_append" ->
      (Curation.q158StreamSubstringAppend _),
    "q159_link_ppr" -> (Curation.q159LinkPersonalizedPageRank _),
    "q160_substring_delete" -> (Curation.q160SubstringDelete _),
    "q161_bm25_delete" -> (Curation.q161Bm25Delete _),
    "q162_ann_ivf_sq8_delete" -> (Curation.q162EmbedAnnIvfSq8Delete _),
    "q163_ann_pq_delete" -> (Curation.q163EmbedAnnPqDelete _),
    "q164_ann_ivfpq_delete" -> (Curation.q164EmbedAnnIvfPqDelete _),
    "q165_neardup_index_delete" ->
      (Curation.q165NearDupIndexDelete _),
    "q166_semantic_decontam" -> (Curation.q166SemanticDecontam _),
    "q167_curation_pipeline_v2" ->
      (Curation.q167CurationPipelineV2 _),
  ) ++ graft.tally.TallyReportQueries.queries

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_qty,
        | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_base_price,
        | round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_disc_price,
        | round(CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE), 6) AS returned_value,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q02_trial_balance" ->
      """SELECT c.c_custkey,
        | round(CAST(CAST(c.c_acctbal AS DECIMAL(18,6)) AS DOUBLE), 6) AS opening,
        | round(CAST(coalesce(s.fulfilled, CAST(0 AS DECIMAL(18,6))) AS DOUBLE), 6) AS fulfilled,
        | round(CAST(coalesce(s.open_amt, CAST(0 AS DECIMAL(18,6))) AS DOUBLE), 6) AS open_amt,
        | coalesce(s.n_orders, 0) AS n_orders
        |FROM customer c LEFT JOIN (
        | SELECT o_custkey,
        |  sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS fulfilled,
        |  sum(CASE WHEN o_orderstatus <> 'F' THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS open_amt,
        |  count(*) AS n_orders
        | FROM orders GROUP BY 1) s ON s.o_custkey = c.c_custkey
        |ORDER BY 1""".stripMargin,
    "q03_sales_register" ->
      """SELECT l.l_orderkey, l.l_linenumber, CAST(o.o_orderdate AS DATE) AS order_date,
        | c.c_name, n.n_name, r.r_name,
        | round(CAST(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,6)) AS DOUBLE), 6) AS net_amount
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        | JOIN customer c ON o.o_custkey = c.c_custkey
        | JOIN nation n ON c.c_nationkey = n.n_nationkey
        | JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE o.o_orderdate >= TIMESTAMP '1998-01-01'
        |ORDER BY 1,2""".stripMargin,
    "q04_cross_nation" ->
      """SELECT n.n_name AS cust_nation,
        | round(CAST(sum(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS import_value,
        | count(*) AS n_lines
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        | JOIN customer c ON o.o_custkey = c.c_custkey
        | JOIN supplier s ON l.l_suppkey = s.s_suppkey
        | JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE s.s_nationkey <> c.c_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q05_semi_join" ->
      """SELECT o_orderkey, o_orderstatus,
        | round(CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS DOUBLE), 6) AS total
        |FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
        |ORDER BY 1""".stripMargin,
    "q06_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        | AND o.o_orderdate >= TIMESTAMP '1995-01-01' AND o.o_orderdate < TIMESTAMP '1995-07-01')
        |ORDER BY 1""".stripMargin,
    "q07_top1_per_group" ->
      """SELECT o_custkey, o_orderkey,
        | round(CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS DOUBLE), 6) AS top_total
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        | FROM orders) t
        |WHERE rn = 1 ORDER BY 1""".stripMargin,
    "q08_string_agg" ->
      """SELECT l.l_orderkey,
        | array_to_string(list_sort(list_distinct(list(p.p_brand))), ',') AS brands,
        | count(*) AS n_lines
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_orderkey < 1000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q09_ledger_view" ->
      """SELECT custkey, entry_date, entry_type, amount FROM (
        | SELECT c_custkey AS custkey, DATE '1994-12-31' AS entry_date, 'OPENING' AS entry_type,
        |  round(CAST(CAST(c_acctbal AS DECIMAL(18,6)) AS DOUBLE), 6) AS amount
        | FROM customer WHERE c_custkey <= 100
        | UNION ALL
        | SELECT o_custkey, CAST(o_orderdate AS DATE), 'ORDER',
        |  round(CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS DOUBLE), 6)
        | FROM orders WHERE o_custkey <= 100) u
        |ORDER BY 1,2,3,4""".stripMargin,
    "q10_daily_gapfill" ->
      """WITH cal AS (SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '1995-12-31', INTERVAL 1 DAY)) AS DATE) AS d),
        | daily AS (SELECT CAST(o_orderdate AS DATE) AS od,
        |   sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev, count(*) AS n
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        |  GROUP BY 1)
        |SELECT d, round(CAST(coalesce(rev, 0) AS DOUBLE), 6) AS revenue, coalesce(n, 0) AS n_orders
        |FROM cal LEFT JOIN daily ON cal.d = daily.od ORDER BY 1""".stripMargin,
    "q11_monthly" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mth,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue,
        | count(*) AS n_orders
        |FROM orders GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q12_hierarchy_closure" ->
      """WITH RECURSIVE edges AS (
        |  SELECT r.r_name AS parent, n.n_name AS child FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        |  UNION ALL
        |  SELECT n.n_name, c.c_name FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |), closure AS (
        |  SELECT parent AS ancestor, child AS descendant, 1 AS depth FROM edges
        |  UNION ALL
        |  SELECT cl.ancestor, e.child, cl.depth + 1 FROM closure cl JOIN edges e ON e.parent = cl.descendant
        |)
        |SELECT ancestor, descendant, CAST(depth AS INT) AS depth FROM closure ORDER BY 1,2,3""".stripMargin,
    "q13_subtree_members" ->
      """SELECT c.c_custkey, c.c_name,
        | round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue_1995,
        | count(*) AS n_orders
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        | JOIN region r ON n.n_regionkey = r.r_regionkey
        | JOIN orders o ON o.o_custkey = c.c_custkey
        |WHERE r.r_name = 'ASIA'
        | AND o.o_orderdate >= TIMESTAMP '1995-01-01' AND o.o_orderdate < TIMESTAMP '1996-01-01'
        |GROUP BY 1,2 ORDER BY 1""".stripMargin,
    "q14_case_over_max" ->
      """SELECT n.n_name,
        | CASE WHEN max(CAST(c.c_acctbal AS DECIMAL(18,6))) > 9000 THEN 'high' ELSE 'low' END AS tier,
        | round(CAST(max(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 6) AS max_bal,
        | count(*) AS n_customers
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q15_first_wins_dedup" ->
      """SELECT user_id, event_type, event_id FROM (
        | SELECT user_id, event_type, event_id,
        |  row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC) AS rn
        | FROM events) t
        |WHERE rn = 1 ORDER BY 1,2""".stripMargin,
    "q16_cdc_changelog" ->
      """WITH target AS (SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,6)) AS val FROM orders),
        | source AS (SELECT o_orderkey,
        |   CASE WHEN o_orderkey % 5 = 0 THEN CAST(o_totalprice + 10.0 AS DECIMAL(18,6))
        |        ELSE CAST(o_totalprice AS DECIMAL(18,6)) END AS val
        |  FROM orders WHERE o_orderkey % 7 <> 0)
        |SELECT 'D' AS op, t.o_orderkey FROM target t
        | WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.o_orderkey = t.o_orderkey)
        |UNION ALL
        |SELECT 'U' AS op, t.o_orderkey FROM target t JOIN source s ON s.o_orderkey = t.o_orderkey
        | WHERE t.val <> s.val
        |ORDER BY 1,2""".stripMargin,
    "q17_cdc_merge" ->
      """WITH target AS (SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DECIMAL(18,6)) AS val
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1999-07-01'),
        | source AS (SELECT o_orderkey, lower(o_orderstatus) AS o_orderstatus, CAST(o_totalprice AS DECIMAL(18,6)) AS val
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-07-01'),
        | merged AS (
        |  SELECT t.* FROM target t WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.o_orderkey = t.o_orderkey)
        |  UNION ALL SELECT * FROM source)
        |SELECT o_orderstatus, count(*) AS n, round(CAST(sum(val) AS DOUBLE), 6) AS total
        |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin,
    "q18_events_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr, event_type, count(*) AS n,
        | round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS total
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q19_events_json" ->
      """SELECT event_type,
        | round(CAST(sum(CAST(CAST(json_extract_string(props, '$.k') AS INT) AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_k,
        | count(CAST(json_extract_string(props, '$.k') AS INT)) AS n_with_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q20_dedup_exact" ->
      """SELECT md5(text) AS digest, count(*) AS n_docs, min(doc_id) AS keeper
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // q21 runs with the stop-shingle cap (bounded gram join), so its
    // oracle drops the same hot shingles; q22's LSH path keeps the
    // full shingle sets and verifies against the uncapped Jaccard.
    "q21_dedup_ngram_jaccard" ->
      ngramJaccardSql(Some(graft.operators.Curation.Q21MaxShingleDf)),
    "q22_dedup_minhash_lsh"   -> ngramJaccardSql(None),
    // q23/q98: scale-derived SimHash at the wide-radius / default
    // candidate budgets — same exact τ=0.8 pair set plus the per-pair
    // pigeonhole-contract flag the Spark side computes (found by the
    // derived banding OR beyond its guaranteed radius) — constant 1
    // when the contract holds, row-hash red otherwise
    "q23_dedup_simhash" ->
      ngramJaccardSql(None, ",\n | CAST(1 AS INT) AS ok"),
    "q98_dedup_simhash_scaled" ->
      ngramJaccardSql(None, ",\n | CAST(1 AS INT) AS ok"),
    "q97_stream_quality_monitor" -> streamQualityMonitorSql,
    // incremental ingest dedup: exact cross-side trigram Jaccard over
    // the md5 '>= c' incoming / '< c' existing split (the q22
    // recall-1 banding regime — every oracle pair must be found)
    "q62_dedup_incremental" -> incrementalDedupSql,
    // the SAME oracle gates the stored-index execution path: the
    // persisted (band-key, gram) warehouse artifact must reproduce
    // the one-job derivation row for row
    "q116_dedup_incremental_stored" -> incrementalDedupSql,
    // same result contract as q62/q116 — the append path must be
    // invisible to the served answer (append ≡ union build)
    "q141_neardup_index_append" -> incrementalDedupSql,
    "q143_bpe_merges" -> bpeMergesSql,
    "q144_bpe_token_counts" -> bpeTokenCountsSql,
    "q145_bpe_packing" -> bpePackingSql,
    // min reachable id over the chain edge law via a reach-set
    // recursive CTE (the q68 oracle shape over a closed-form edge
    // table): exact regardless of how many rounds the Spark side's
    // pointer-jumping loop needed — the oracle checks the FIXPOINT
    "q142_dup_clusters_fixpoint" ->
      s"""WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
        | e AS (SELECT CAST(doc_id AS BIGINT) AS a, CAST(doc_id AS BIGINT) + 1 AS b
        |  FROM documents, nn
        |  WHERE doc_id % ${graft.operators.Curation.Q142ChainLen} <> ${graft.operators.Curation.Q142ChainLen - 1}
        |   AND doc_id + 1 < nn.n),
        | sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
        | r AS (
        |  SELECT doc_id AS id, doc_id AS reach FROM documents
        |  UNION
        |  SELECT r.id, s.b FROM r JOIN sym s ON s.a = r.reach)
        |SELECT id AS doc_id, min(reach) AS cluster_id FROM r
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // streaming ingest dedup: the SAME exact cross-side Jaccard
    // oracle as q62 — the stateless stream's pair set must be
    // independent of its micro-batch split
    "q102_stream_ingest_dedup" ->
      s"""WITH sides AS (SELECT doc_id, text,
        |   CASE WHEN substr(md5(text), 1, 1) >= '${graft.operators.Curation.Q62IncomingHex}' THEN 1 ELSE 0 END AS incoming
        |  FROM documents),
        | toks AS (SELECT doc_id, incoming, string_split(text, ' ') AS w FROM sides),
        | grams AS (SELECT DISTINCT doc_id, incoming,
        |   list_extract(w, CAST(i AS INT)) || ' ' || list_extract(w, CAST(i AS INT)+1) || ' ' || list_extract(w, CAST(i AS INT)+2) AS g
        |  FROM toks CROSS JOIN LATERAL unnest(range(1, len(w)-1)) AS t(i)),
        | sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
        | inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
        |  FROM grams x JOIN grams y ON x.g = y.g
        |   AND x.incoming = 0 AND y.incoming = 1
        |  GROUP BY 1,2)
        |SELECT i.a AS existing_id, i.b AS incoming_id,
        | round(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6) AS jaccard
        |FROM inter i JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
        |WHERE round(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6) >= 0.8
        |ORDER BY 1, 2""".stripMargin,
    // streaming passage hits: q84's fixed-window passage law per
    // side of the q62 boundary — incoming windows joined to the
    // existing-side digest occurrence counts
    "q103_stream_passage_hits" ->
      s"""WITH sides AS (SELECT doc_id, text,
        |   CASE WHEN substr(md5(text), 1, 1) >= '${graft.operators.Curation.Q62IncomingHex}' THEN 1 ELSE 0 END AS incoming
        |  FROM documents),
        | toks AS (SELECT doc_id, incoming, string_split(text, ' ') AS w FROM sides),
        | pass AS (SELECT doc_id, incoming,
        |   CAST((i - 1) // ${graft.operators.Curation.Q84PassageLen} AS INT) AS slot,
        |   md5(array_to_string(w[CAST(i AS INT):CAST(i AS INT)+${graft.operators.Curation.Q84PassageLen - 1}], ' ')) AS d
        |  FROM toks CROSS JOIN LATERAL unnest(range(1, greatest(len(w), 1)+1, ${graft.operators.Curation.Q84PassageLen})) AS t(i)),
        | idx AS (SELECT d, count(*) AS corpus_df FROM pass WHERE incoming = 0 GROUP BY 1)
        |SELECT p.doc_id AS incoming_id, p.slot, p.d AS digest, idx.corpus_df
        |FROM pass p JOIN idx USING (d) WHERE p.incoming = 1
        |ORDER BY 1, 2""".stripMargin,
    // eval-set decontamination: distinct 8-gram intersection counts
    // between the non-src0 (train) and src0 (eval) sides
    "q64_decontamination" ->
      s"""WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
        | grams AS (SELECT DISTINCT doc_id, source,
        |   array_to_string(w[CAST(i AS INT):CAST(i AS INT)+${graft.operators.Curation.Q64GramN - 1}], ' ') AS g
        |  FROM toks CROSS JOIN LATERAL unnest(range(1, len(w)-${graft.operators.Curation.Q64GramN - 2})) AS t(i))
        |SELECT t.doc_id AS train_id, e.doc_id AS eval_id, count(*) AS n_shared
        |FROM grams t JOIN grams e ON t.g = e.g
        | AND t.source <> '${graft.operators.Curation.Q64EvalSource}'
        | AND e.source = '${graft.operators.Curation.Q64EvalSource}'
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    // end-to-end curation pipeline: the q28 quality formula + lang
    // gate, then q52's two dedup phases over the gated subset, then
    // q57's content-hash split
    "q67_curation_pipeline" ->
      s"""WITH t AS (SELECT doc_id, text, lang, ' ' || lower(text) || ' ' AS p,
        |   list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS toks
        |  FROM documents),
        | m AS (SELECT doc_id, lang, text,
        |   CAST(len(toks) AS INT) AS n_tokens,
        |   CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
        |   ${langScoreSql("en")} AS stopword_hits
        |  FROM t),
        | gated AS (SELECT doc_id, text FROM m WHERE lang = 'en' AND
        |   round(round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) * 0.4
        |     + (CASE WHEN n_tokens >= 20 AND n_tokens <= 200 THEN 0.3 ELSE 0.0 END)
        |     + (CASE WHEN round(CAST(stopword_hits AS DOUBLE) / n_tokens, 6) > 0.01 THEN 0.2 ELSE 0.0 END), 6)
        |    >= ${graft.operators.Curation.Q67MinQuality}),
        | keepers AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(text)),
        | docs2 AS (SELECT g.doc_id, g.text FROM gated g JOIN keepers USING (doc_id)),
        | toks2 AS (SELECT doc_id, string_split(text, ' ') AS w FROM docs2),
        | grams AS (SELECT DISTINCT doc_id,
        |   list_extract(w, CAST(i AS INT)) || ' ' || list_extract(w, CAST(i AS INT)+1) || ' ' || list_extract(w, CAST(i AS INT)+2) AS g
        |  FROM toks2 CROSS JOIN LATERAL unnest(range(1, len(w)-1)) AS t(i)),
        | sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
        | inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
        |  FROM grams x JOIN grams y ON x.g = y.g AND x.doc_id < y.doc_id GROUP BY 1,2),
        | drops AS (SELECT DISTINCT i.b AS doc_id
        |  FROM inter i JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
        |  WHERE round(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6) >= 0.8)
        |SELECT doc_id,
        | CASE WHEN substr(md5(text), 1, 2) < '0a' THEN 'val' ELSE 'train' END AS split
        |FROM docs2 WHERE doc_id NOT IN (SELECT doc_id FROM drops)
        |ORDER BY 1""".stripMargin,
    // unigram entropy: −p·log2(p) terms computed in double on both
    // engines, then summed as DECIMAL(28,18) so addition order cannot
    // move the 6-dp rounding
    "q66_token_entropy" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        | c AS (SELECT doc_id, tok, count(*) AS c FROM w GROUP BY 1, 2),
        | n AS (SELECT doc_id, sum(c) AS n FROM c GROUP BY 1)
        |SELECT c.doc_id,
        | round(CAST(sum(CAST(-(CAST(c.c AS DOUBLE) / CAST(n.n AS DOUBLE))
        |   * log2(CAST(c.c AS DOUBLE) / CAST(n.n AS DOUBLE)) AS DECIMAL(28,18))) AS DOUBLE), 6)
        |  AS token_entropy
        |FROM c JOIN n ON c.doc_id = n.doc_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // data-mixture rollup: exact integer counts; shares derived from
    // them, rounded
    "q65_corpus_mix" ->
      """WITH agg AS (SELECT lang, source, count(*) AS n_docs,
        |  sum(n_chars) AS n_chars FROM documents GROUP BY 1, 2),
        | tot AS (SELECT sum(n_docs) AS td, sum(n_chars) AS tc FROM agg)
        |SELECT lang, source, n_docs, CAST(n_chars AS BIGINT) AS n_chars,
        | round(CAST(n_docs AS DOUBLE) / CAST(td AS DOUBLE), 6) AS doc_share,
        | round(CAST(n_chars AS DOUBLE) / CAST(tc AS DOUBLE), 6) AS char_share
        |FROM agg CROSS JOIN tot
        |ORDER BY 1, 2""".stripMargin,
    // per-doc repetition metrics: bare single-space split on both
    // engines (string_split ≡ split — same token multisets, empties
    // included), exact integer counts, round(…,6) doubles
    "q63_repetition" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        | c AS (SELECT doc_id, tok, count(*) AS c FROM w GROUP BY 1, 2)
        |SELECT doc_id,
        | CAST(sum(c) AS BIGINT) AS n_words,
        | CAST(count(*) AS BIGINT) AS n_distinct_words,
        | round(1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS dup_word_frac,
        | round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS top_word_frac
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    // end-to-end corpus dedup: exact keepers, then the SAME uncapped
    // exact-Jaccard pairs restricted to keepers → drop the larger id
    "q52_dedup_corpus" ->
      """WITH keepers AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        | docs AS (SELECT d.doc_id, d.text FROM documents d JOIN keepers USING (doc_id)),
        | toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM docs),
        | grams AS (SELECT DISTINCT doc_id,
        |   list_extract(w, CAST(i AS INT)) || ' ' || list_extract(w, CAST(i AS INT)+1) || ' ' || list_extract(w, CAST(i AS INT)+2) AS g
        |  FROM toks CROSS JOIN LATERAL unnest(range(1, len(w)-1)) AS t(i)),
        | sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
        | inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
        |  FROM grams x JOIN grams y ON x.g = y.g AND x.doc_id < y.doc_id GROUP BY 1,2),
        | drops AS (SELECT DISTINCT i.b AS doc_id
        |  FROM inter i JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
        |  WHERE round(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6) >= 0.8)
        |SELECT doc_id FROM docs WHERE doc_id NOT IN (SELECT doc_id FROM drops)
        |ORDER BY 1""".stripMargin,
    // duplicate clusters: min reachable id over the symmetric exact
    // τ=0.8 Jaccard pair graph, via recursive CTE (components are
    // small, so the reach sets stay tiny); singletons reach only
    // themselves
    "q68_dup_clusters" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | grams AS (SELECT DISTINCT doc_id,
        |   list_extract(w, CAST(i AS INT)) || ' ' || list_extract(w, CAST(i AS INT)+1) || ' ' || list_extract(w, CAST(i AS INT)+2) AS g
        |  FROM toks CROSS JOIN LATERAL unnest(range(1, len(w)-1)) AS t(i)),
        | sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
        | inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
        |  FROM grams x JOIN grams y ON x.g = y.g AND x.doc_id < y.doc_id GROUP BY 1,2),
        | pairs AS (SELECT i.a, i.b
        |  FROM inter i JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
        |  WHERE round(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6) >= 0.8),
        | sym AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
        | r AS (
        |  SELECT doc_id AS id, doc_id AS reach FROM documents
        |  UNION
        |  SELECT r.id, s.b FROM r JOIN sym s ON s.a = r.reach)
        |SELECT id AS doc_id, min(reach) AS cluster_id FROM r
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // boilerplate fraction: distinct-gram doc frequencies, top-K by
    // (df DESC, g ASC) row_number (deterministic at the K boundary),
    // per-doc membership fraction
    "q69_boilerplate" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | grams AS (SELECT DISTINCT doc_id,
        |   list_extract(w, CAST(i AS INT)) || ' ' || list_extract(w, CAST(i AS INT)+1) || ' ' || list_extract(w, CAST(i AS INT)+2) AS g
        |  FROM toks CROSS JOIN LATERAL unnest(range(1, len(w)-1)) AS t(i)),
        | dfreq AS (SELECT g, count(*) AS df FROM grams GROUP BY 1),
        | topk AS (SELECT g FROM (
        |   SELECT g, row_number() OVER (ORDER BY df DESC, g ASC) AS rn FROM dfreq) z
        |  WHERE rn <= ${graft.operators.Curation.Q69TopK})
        |SELECT gr.doc_id,
        | CAST(count(*) AS INT) AS n_grams,
        | CAST(sum(CASE WHEN tk.g IS NOT NULL THEN 1 ELSE 0 END) AS INT) AS n_boiler,
        | round(CAST(sum(CASE WHEN tk.g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS boiler_frac
        |FROM grams gr LEFT JOIN topk tk USING (g)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // quality-weighted deterministic sampling: the q28 quality formula,
    // kept iff the text's 6-hex md5 prefix sorts below the score's
    // 6-hex fixed-point rendering (quality·2^24 — a power-of-two scale,
    // so the double multiply is exact on both engines)
    "q70_quality_sample" ->
      s"""WITH t AS (SELECT doc_id, text, ' ' || lower(text) || ' ' AS p,
        |   list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS toks
        |  FROM documents),
        | m AS (SELECT doc_id, text,
        |   CAST(len(toks) AS INT) AS n_tokens,
        |   CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
        |   ${langScoreSql("en")} AS stopword_hits
        |  FROM t),
        | q AS (SELECT doc_id, text,
        |   round(round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) * 0.4
        |     + (CASE WHEN n_tokens >= 20 AND n_tokens <= 200 THEN 0.3 ELSE 0.0 END)
        |     + (CASE WHEN round(CAST(stopword_hits AS DOUBLE) / n_tokens, 6) > 0.01 THEN 0.2 ELSE 0.0 END), 6) AS quality
        |  FROM m)
        |SELECT doc_id, quality FROM q
        |WHERE substr(md5(text), 1, 6) < printf('%06x', CAST(floor(quality * 16777216) AS BIGINT))
        |ORDER BY 1""".stripMargin,
    // cross-source duplication matrix over the same exact-Jaccard
    // pairs; least/greatest normalizes the cell key
    "q71_source_overlap" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | grams AS (SELECT DISTINCT doc_id,
        |   list_extract(w, CAST(i AS INT)) || ' ' || list_extract(w, CAST(i AS INT)+1) || ' ' || list_extract(w, CAST(i AS INT)+2) AS g
        |  FROM toks CROSS JOIN LATERAL unnest(range(1, len(w)-1)) AS t(i)),
        | sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
        | inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
        |  FROM grams x JOIN grams y ON x.g = y.g AND x.doc_id < y.doc_id GROUP BY 1,2),
        | pairs AS (SELECT i.a, i.b
        |  FROM inter i JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
        |  WHERE round(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6) >= 0.8)
        |SELECT least(da.source, db.source) AS src_a,
        | greatest(da.source, db.source) AS src_b,
        | count(*) AS n_pairs
        |FROM pairs p JOIN documents da ON da.doc_id = p.a
        | JOIN documents db ON db.doc_id = p.b
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // cluster representatives: q68's recursive-CTE clusters joined to
    // q70's quality formula; best member per cluster by
    // (quality DESC, doc_id ASC) row_number
    "q72_cluster_reps" ->
      s"""WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | grams AS (SELECT DISTINCT doc_id,
        |   list_extract(w, CAST(i AS INT)) || ' ' || list_extract(w, CAST(i AS INT)+1) || ' ' || list_extract(w, CAST(i AS INT)+2) AS g
        |  FROM toks CROSS JOIN LATERAL unnest(range(1, len(w)-1)) AS t(i)),
        | sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
        | inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
        |  FROM grams x JOIN grams y ON x.g = y.g AND x.doc_id < y.doc_id GROUP BY 1,2),
        | pairs AS (SELECT i.a, i.b
        |  FROM inter i JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
        |  WHERE round(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6) >= 0.8),
        | sym AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
        | r AS (
        |  SELECT doc_id AS id, doc_id AS reach FROM documents
        |  UNION
        |  SELECT r.id, s.b FROM r JOIN sym s ON s.a = r.reach),
        | cl AS (SELECT id AS doc_id, min(reach) AS cluster_id FROM r GROUP BY 1),
        | qt AS (SELECT doc_id, ' ' || lower(text) || ' ' AS p,
        |   list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS tk
        |  FROM documents),
        | qm AS (SELECT doc_id,
        |   CAST(len(tk) AS INT) AS n_tokens,
        |   CAST(len(list_distinct(tk)) AS INT) AS n_distinct,
        |   ${langScoreSql("en")} AS stopword_hits
        |  FROM qt),
        | qq AS (SELECT doc_id,
        |   round(round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) * 0.4
        |     + (CASE WHEN n_tokens >= 20 AND n_tokens <= 200 THEN 0.3 ELSE 0.0 END)
        |     + (CASE WHEN round(CAST(stopword_hits AS DOUBLE) / n_tokens, 6) > 0.01 THEN 0.2 ELSE 0.0 END), 6) AS quality
        |  FROM qm),
        | ranked AS (SELECT cl.cluster_id, qq.doc_id, qq.quality,
        |   row_number() OVER (PARTITION BY cl.cluster_id
        |     ORDER BY qq.quality DESC, qq.doc_id ASC) AS rn,
        |   count(*) OVER (PARTITION BY cl.cluster_id) AS nm
        |  FROM cl JOIN qq USING (doc_id))
        |SELECT cluster_id, doc_id AS rep_id, CAST(nm AS INT) AS n_members,
        | quality AS rep_quality
        |FROM ranked WHERE rn = 1 ORDER BY 1""".stripMargin,
    // gram novelty: first-seen = min doc_id per distinct gram; docs
    // too short for a trigram surface with zero grams via the left join
    "q73_gram_novelty" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | grams AS (SELECT DISTINCT doc_id,
        |   list_extract(w, CAST(i AS INT)) || ' ' || list_extract(w, CAST(i AS INT)+1) || ' ' || list_extract(w, CAST(i AS INT)+2) AS g
        |  FROM toks CROSS JOIN LATERAL unnest(range(1, len(w)-1)) AS t(i)),
        | fs AS (SELECT g, min(doc_id) AS first_id FROM grams GROUP BY 1),
        | per AS (SELECT gr.doc_id,
        |   CAST(count(*) AS INT) AS n_grams,
        |   CAST(sum(CASE WHEN f.first_id = gr.doc_id THEN 1 ELSE 0 END) AS INT) AS n_novel
        |  FROM grams gr JOIN fs f USING (g) GROUP BY 1)
        |SELECT d.doc_id,
        | coalesce(n_grams, 0) AS n_grams,
        | coalesce(n_novel, 0) AS n_novel,
        | round(CASE WHEN coalesce(n_grams, 0) > 0
        |   THEN CAST(n_novel AS DOUBLE) / n_grams ELSE 0.0 END, 6) AS novelty_frac
        |FROM documents d LEFT JOIN per USING (doc_id) ORDER BY 1""".stripMargin,
    // redaction audit: same portable regexes on both engines (DuckDB
    // needs the explicit 'g' flag; Spark replaces all by default);
    // red_hash pins the exact rewrite, not just the counts
    "q74_redaction" ->
      s"""WITH r1 AS (SELECT doc_id, text AS t0,
        |   regexp_replace(text, '$q74BlockSql', '[TERM]', 'g') AS t1
        |  FROM documents),
        | r2 AS (SELECT *, regexp_replace(t1, '${Redaction.EmailPattern}', '[EMAIL]', 'g') AS t2 FROM r1),
        | r3 AS (SELECT *, regexp_replace(t2, '${Redaction.PhonePattern}', '[PHONE]', 'g') AS t3 FROM r2)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(t0, '$q74BlockSql')) AS INT) AS n_term,
        | CAST(len(regexp_extract_all(t1, '${Redaction.EmailPattern}')) AS INT) AS n_email,
        | CAST(len(regexp_extract_all(t2, '${Redaction.PhonePattern}')) AS INT) AS n_phone,
        | CAST(len(regexp_extract_all(t3, '${Redaction.Ipv4Pattern}')) AS INT) AS n_ip,
        | md5(regexp_replace(t3, '${Redaction.Ipv4Pattern}', '[IP]', 'g')) AS red_hash
        |FROM r3 ORDER BY 1""".stripMargin,
    // sequence packing: per-source running token sum in doc_id order;
    // a doc belongs to the pack where it starts
    "q75_sequence_packing" ->
      s"""WITH t AS (SELECT doc_id, source,
        |   CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
        |  FROM documents),
        | c AS (SELECT *, sum(n_tokens) OVER (
        |   PARTITION BY source ORDER BY doc_id) AS endc FROM t)
        |SELECT doc_id, source, n_tokens,
        | CAST(floor(CAST(endc - n_tokens AS DOUBLE) / ${graft.operators.Curation.Q75PackBudget}) AS INT) AS pack_id,
        | CAST((endc - n_tokens) % ${graft.operators.Curation.Q75PackBudget} AS INT) AS pack_offset
        |FROM c ORDER BY 1""".stripMargin,
    // mixture rebalance: suffix-derived weights, keep rate
    // min(1, outF·total·w / (Σw·n)), q70's fixed-point-hex hash gate;
    // every factor cast to DOUBLE so both engines do float math
    // (DuckDB bare literals are DECIMAL)
    "q76_mixture_rebalance" ->
      """WITH cnt AS (SELECT source, count(*) AS n_grp,
        |   (CAST(substr(source, 4) AS INT) % 4) + 1 AS w
        |  FROM documents GROUP BY 1),
        | tot AS (SELECT sum(n_grp) AS total, sum(w) AS sum_w FROM cnt),
        | rates AS (SELECT source,
        |   round(least(CAST(1.0 AS DOUBLE),
        |     CAST(0.5 AS DOUBLE) * CAST(total AS DOUBLE) * CAST(w AS DOUBLE)
        |       / (CAST(sum_w AS DOUBLE) * CAST(n_grp AS DOUBLE))), 6) AS keep_rate
        |  FROM cnt CROSS JOIN tot)
        |SELECT d.doc_id, d.source, r.keep_rate
        |FROM documents d JOIN rates r USING (source)
        |WHERE r.keep_rate >= CAST(1.0 AS DOUBLE)
        |   OR substr(md5(d.text), 1, 6) <
        |      printf('%06x', CAST(floor(r.keep_rate * 16777216) AS BIGINT))
        |ORDER BY 1""".stripMargin,
    // unigram surprisal: corpus unigram p(t), per-doc mean of −log2 p
    // over the token multiset; DECIMAL term-sum (the q66 trick) keeps
    // the per-doc sum order-independent
    "q77_unigram_surprisal" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        | freq AS (SELECT t, count(*) AS n FROM tok GROUP BY 1),
        | tot AS (SELECT sum(n) AS total FROM freq),
        | term AS (SELECT doc_id,
        |   CAST(-log2(CAST(n AS DOUBLE) / total) AS DECIMAL(28,18)) AS s
        |  FROM tok JOIN freq USING (t) CROSS JOIN tot)
        |SELECT doc_id, CAST(count(*) AS INT) AS n_tokens,
        | round(CAST(sum(s) AS DOUBLE) / count(*), 6) AS avg_surprisal
        |FROM term GROUP BY 1 ORDER BY 1""".stripMargin,
    // DSIR unigram importance weights: both distributions add-one
    // smoothed over the raw vocabulary; term-level DECIMAL(28,18)
    // sums keep the per-doc total order-independent (q77's trick)
    "q79_importance_weights" ->
      s"""WITH tok AS (SELECT doc_id,
        |   CASE WHEN source = '${Curation.Q79TargetSource}' THEN 1 ELSE 0 END AS tgt,
        |   unnest(string_split(text, ' ')) AS t FROM documents),
        | vocab AS (SELECT t, count(*) AS n, sum(tgt) AS nt FROM tok GROUP BY 1),
        | tot AS (SELECT sum(n) AS tot_raw, sum(nt) AS tot_tgt, count(*) AS v FROM vocab),
        | term AS (SELECT t,
        |   CAST(log2((CAST(nt AS DOUBLE) + 1) / (tot_tgt + v))
        |      - log2((CAST(n AS DOUBLE) + 1) / (tot_raw + v)) AS DECIMAL(28,18)) AS s
        |  FROM vocab CROSS JOIN tot)
        |SELECT doc_id, CAST(max(tgt) AS INT) AS in_target,
        | CAST(count(*) AS INT) AS n_tokens,
        | round(CAST(sum(s) AS DOUBLE) / count(*), 6) + 0 AS avg_log_ratio
        |FROM tok JOIN term USING (t) GROUP BY 1 ORDER BY 1""".stripMargin,
    "q80_semantic_dedup" -> semanticDedupSql,
    // two-level distinct (vocab partials then rollup) mirrored exactly;
    // CAST sums to BIGINT (DuckDB sum() widens to HUGEINT)
    "q82_vocab_stats" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS t FROM documents),
        | vocab AS (SELECT source, t, count(*) AS n FROM tok GROUP BY 1,2),
        | stats AS (SELECT source, count(*) AS n_distinct,
        |   CAST(sum(n) AS BIGINT) AS n_tokens FROM vocab GROUP BY 1),
        | d AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1)
        |SELECT source, n_docs, n_tokens, n_distinct,
        | round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS ttr
        |FROM d JOIN stats USING (source) ORDER BY source""".stripMargin,
    // tolerance-based oracle (round-10 ADVICE): the Spark side emits
    // n_distinct_ok = 1 iff |HLL++ − exact| ≤ 5·rsd·exact, so the
    // oracle asserts the sketch's accuracy contract by expecting a
    // constant-1 flag next to exact doc/token counts
    "q83_vocab_stats_approx" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS t FROM documents),
        | stats AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens FROM tok GROUP BY 1),
        | d AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1)
        |SELECT source, n_docs, n_tokens, CAST(1 AS INT) AS n_distinct_ok
        |FROM d JOIN stats USING (source) ORDER BY source""".stripMargin,
    // passage-level dedup: the same fixed 10-token windows (tail keeps
    // its remainder; DuckDB slice bounds are inclusive and clip), a
    // passage is duplicated when its text occurs anywhere else
    "q84_passage_dedup" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | pass AS (SELECT doc_id,
        |   array_to_string(w[CAST(i AS INT):CAST(i AS INT)+${Curation.Q84PassageLen - 1}], ' ') AS p
        |  FROM toks CROSS JOIN LATERAL unnest(range(1, greatest(len(w), 1)+1, ${Curation.Q84PassageLen})) AS t(i)),
        | occ AS (SELECT p, count(*) AS df FROM pass GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS INT) AS n_passages,
        | CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS INT) AS n_dup_passages,
        | round(CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS dup_frac
        |FROM pass JOIN occ USING (p) GROUP BY 1 ORDER BY 1""".stripMargin,
    // asymmetric containment over the q21 kept trigram sets: ordered
    // pairs, C(a→b) = inter / |kept grams(a)|
    "q85_containment" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | grams0 AS (SELECT DISTINCT doc_id,
        |   list_extract(w, CAST(i AS INT)) || ' ' || list_extract(w, CAST(i AS INT)+1) || ' ' || list_extract(w, CAST(i AS INT)+2) AS g
        |  FROM toks CROSS JOIN LATERAL unnest(range(1, len(w)-1)) AS t(i)),
        | kept AS (SELECT g FROM grams0 GROUP BY g HAVING count(*) <= ${Curation.Q21MaxShingleDf}),
        | grams AS (SELECT grams0.doc_id, grams0.g FROM grams0 JOIN kept USING (g)),
        | sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
        | inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
        |  FROM grams x JOIN grams y ON x.g = y.g AND x.doc_id < y.doc_id
        |  GROUP BY 1,2),
        | dirs AS (
        |  SELECT i.a AS contained_id, i.b AS container_id,
        |    round(CAST(i.inter AS DOUBLE) / sa.sz, 6) AS containment
        |  FROM inter i JOIN sizes sa ON sa.doc_id = i.a
        |  UNION ALL
        |  SELECT i.b, i.a, round(CAST(i.inter AS DOUBLE) / sb.sz, 6)
        |  FROM inter i JOIN sizes sb ON sb.doc_id = i.b)
        |SELECT contained_id, container_id, containment
        |FROM dirs WHERE containment >= ${Curation.Q85MinContainment}
        |ORDER BY 1, 2""".stripMargin,
    // deterministic shard manifest: first md5 hex digit → shard 0-15,
    // in-shard position by (hash, doc_id)
    "q86_shard_manifest" ->
      """WITH m AS (SELECT doc_id, md5(text) AS h,
        |   len(string_split(text, ' ')) AS n_tokens FROM documents),
        | s AS (SELECT doc_id,
        |   CAST(strpos('0123456789abcdef', substr(h, 1, 1)) - 1 AS INT) AS shard,
        |   h, n_tokens FROM m)
        |SELECT doc_id, shard,
        | CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS INT) AS pos,
        | CAST(n_tokens AS INT) AS n_tokens
        |FROM s ORDER BY doc_id""".stripMargin,
    // cross-source passage matrix: distinct (source, passage) slims,
    // digest self-join bounded by the source count per digest
    "q88_source_passage_matrix" ->
      s"""WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
        | pass AS (SELECT doc_id, source,
        |   array_to_string(w[CAST(i AS INT):CAST(i AS INT)+${Curation.Q84PassageLen - 1}], ' ') AS p
        |  FROM toks CROSS JOIN LATERAL unnest(range(1, greatest(len(w), 1)+1, ${Curation.Q84PassageLen})) AS t(i)),
        | sd AS (SELECT DISTINCT source, p FROM pass)
        |SELECT x.source AS src_a, y.source AS src_b,
        | count(DISTINCT x.p) AS n_shared
        |FROM sd x JOIN sd y ON x.p = y.p AND x.source < y.source
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    // effective tokens: corpus-first passage occurrence keeps its
    // tokens, every later occurrence is boilerplate; first = smallest
    // (doc_id, start) exactly as the Spark window orders
    "q89_effective_tokens" ->
      s"""WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
        | pass AS (SELECT doc_id, source, CAST(i AS INT) AS slot,
        |   array_to_string(w[CAST(i AS INT):CAST(i AS INT)+${Curation.Q84PassageLen - 1}], ' ') AS p,
        |   least(${Curation.Q84PassageLen}, len(w) - CAST(i AS INT) + 1) AS ptok
        |  FROM toks CROSS JOIN LATERAL unnest(range(1, greatest(len(w), 1)+1, ${Curation.Q84PassageLen})) AS t(i)),
        | ranked AS (SELECT source, ptok,
        |   row_number() OVER (PARTITION BY p ORDER BY doc_id, slot) AS rn
        |  FROM pass)
        |SELECT source, CAST(sum(ptok) AS BIGINT) AS gross_tokens,
        | CAST(sum(CASE WHEN rn = 1 THEN ptok ELSE 0 END) AS BIGINT) AS effective_tokens,
        | round(CAST(sum(CASE WHEN rn = 1 THEN ptok ELSE 0 END) AS DOUBLE) / sum(ptok), 6) AS dedup_ratio
        |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin,
    // real-codec WAV decode: the oracle recomputes the features from
    // the SynthWav generative law (doc d: 800 + (d%100)*8 samples,
    // sample i = ((d*31 + i*17) mod 65536) - 32768 at 16 kHz), while
    // the Spark side round-trips REAL RIFF/PCM16 bytes through the
    // pure-JVM parser — hash-green proves encoder + walker
    "q90_media_wav" ->
      """WITH d AS (SELECT doc_id, 800 + (doc_id % 100) * 8 AS n FROM documents),
        | s AS (SELECT doc_id, n, ((doc_id * 31 + i * 17) % 65536) - 32768 AS v
        |  FROM d CROSS JOIN LATERAL unnest(range(0, n)) AS t(i))
        |SELECT doc_id,
        | CAST(max(n) * 2 + 44 AS INT) AS n_bytes,
        | CAST(16000 AS INT) AS sample_rate,
        | CAST(max(n) AS INT) AS n_samples,
        | CAST(max(n) * 1000000 // 16000 AS BIGINT) AS duration_us,
        | round(sqrt(CAST(sum(CAST(CAST(v AS BIGINT) * v AS DECIMAL(28,0))) AS DOUBLE) / max(n)), 6) AS rms,
        | CAST(max(abs(v)) AS INT) AS peak
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    // real-codec BMP decode, q90's pattern for images: doc d is
    // (16 + d%17) x (16 + d%13) px, channel c of (x,y) =
    // (d*7 + x*3 + y*5 + c*11) mod 256; n_bytes adds the 54-byte
    // header and the spec's 4-byte row padding
    "q91_media_bmp" ->
      """WITH d AS (SELECT doc_id, 16 + doc_id % 17 AS w, 16 + doc_id % 13 AS h FROM documents),
        | px AS (SELECT doc_id, w, h,
        |   (doc_id * 7 + x * 3 + y * 5) % 256 AS r,
        |   (doc_id * 7 + x * 3 + y * 5 + 11) % 256 AS g,
        |   (doc_id * 7 + x * 3 + y * 5 + 22) % 256 AS b
        |  FROM d CROSS JOIN LATERAL unnest(range(0, w)) AS tx(x)
        |        CROSS JOIN LATERAL unnest(range(0, h)) AS ty(y))
        |SELECT doc_id,
        | CAST(max(54 + (3 * w + (4 - (3 * w) % 4) % 4) * h) AS INT) AS n_bytes,
        | CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
        | round(CAST(sum(r) AS DOUBLE) / (max(w) * max(h)), 6) AS mean_r,
        | round(CAST(sum(g) AS DOUBLE) / (max(w) * max(h)), 6) AS mean_g,
        | round(CAST(sum(b) AS DOUBLE) / (max(w) * max(h)), 6) AS mean_b
        |FROM px GROUP BY 1 ORDER BY 1""".stripMargin,
    // audio gate over the q90 signal law: clip/silence counts are
    // exact integers; the flag thresholds mirror Multimodal's
    "q92_media_audio_gate" ->
      """WITH d AS (SELECT doc_id, 800 + (doc_id % 100) * 8 AS n FROM documents),
        | s AS (SELECT doc_id, n, abs(((doc_id * 31 + i * 17) % 65536) - 32768) AS v
        |  FROM d CROSS JOIN LATERAL unnest(range(0, n)) AS t(i)),
        | agg AS (SELECT doc_id, max(n) AS n,
        |   sum(CASE WHEN v >= 29491 THEN 1 ELSE 0 END) AS clip,
        |   sum(CASE WHEN v <= 328 THEN 1 ELSE 0 END) AS silent
        |  FROM s GROUP BY 1)
        |SELECT doc_id, CAST(n AS INT) AS n_samples,
        | round(CAST(clip AS DOUBLE) / n, 6) AS clip_ratio,
        | round(CAST(silent AS DOUBLE) / n, 6) AS silence_ratio,
        | CAST(CASE WHEN round(CAST(clip AS DOUBLE) / n, 6) < 0.10
        |   AND round(CAST(silent AS DOUBLE) / n, 6) < 0.50
        |   THEN 1 ELSE 0 END AS INT) AS ok
        |FROM agg ORDER BY 1""".stripMargin,
    // image dedup over REAL PNG payloads: pixel-digest groups equal
    // the mod-40 congruence classes of the q93 pixel law (k*7 mod
    // 256 separates classes), PROVIDED encode+decode are faithful —
    // which q96 gates for the PNG path
    "q93_media_image_dedup" ->
      """SELECT CAST(min(doc_id) AS BIGINT) AS keeper,
        | count(*) AS n_copies
        |FROM documents GROUP BY doc_id % 40 ORDER BY 1""".stripMargin,
    // stateful streaming sessionization: q60's gap-split SQL rolled
    // up per session — the Spark side ran flatMapGroupsWithState
    // micro-batches for real, flushed by a sentinel-advanced
    // watermark, totals in exact integer micros
    "q101_stream_sessions" ->
      """WITH flagged AS (
        | SELECT user_id, epoch_us(ts) AS tn, CAST(value AS DECIMAL(18,6)) AS v,
        |  CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |    OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))),
        | sess AS (
        | SELECT user_id, tn, v,
        |  sum(new_s) OVER (PARTITION BY user_id ORDER BY tn
        |    ROWS UNBOUNDED PRECEDING) AS session_seq
        | FROM flagged)
        |SELECT user_id, count(*) AS n_events,
        | round(CAST(sum(v) AS DOUBLE), 6) AS total_value,
        | min(tn) AS start_us, max(tn) AS end_us
        |FROM sess GROUP BY user_id, session_seq
        |ORDER BY user_id, start_us""".stripMargin,
    // gzip text ingest: the oracle recomputes chars/tokens/md5 from
    // the PLAIN text — the Spark side only matches if its gzip
    // round trip reproduced every byte
    // HTML extraction: the law makes the extracted text a closed
    // form, so the md5 only matches if markup stripping, block
    // removal, entity decode and whitespace collapse ALL land
    "q111_html_extract" ->
      """SELECT doc_id,
        | CAST(len('T' || doc_id || ' Doc ' || doc_id || ' ' || text) AS INT) AS n_chars,
        | md5('T' || doc_id || ' Doc ' || doc_id || ' ' || text) AS text_md5
        |FROM documents ORDER BY 1""".stripMargin,
    // cascade update: matched rows refresh from the (thinned) master,
    // unmatched rows coalesce-keep their stale denormalized value
    "q119_cdc_cascade_update" ->
      """SELECT o.o_orderkey,
        | coalesce(c.c_name, 'stale-' || o.o_custkey) AS cust_name
        |FROM orders o LEFT JOIN
        | (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 <> 0) c
        | ON o.o_custkey = c.c_custkey
        |ORDER BY 1""".stripMargin,
    // voucher renumbering: re-pulled (auto-type) rows join-replace
    // their number, manual-type rows coalesce-keep; `changed` is the
    // null-safe shift-detection set a partitioned warehouse rewrites
    "q120_cdc_voucher_renumber" ->
      """SELECT o_orderkey,
        | CASE WHEN o_orderkey % 3 = 0
        |   THEN 'V-' || CAST(o_orderkey + 1 AS VARCHAR)
        |   ELSE 'V-' || CAST(o_orderkey AS VARCHAR) END AS voucher_number,
        | CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END AS changed
        |FROM orders ORDER BY 1""".stripMargin,
    // codec corruption rejection: the stored corpus carries
    // class-keyed damage (intact / protected-region / truncation /
    // bad magic), and FLAC/AVI decode must reject exactly the
    // damaged classes while accepting every intact control — the
    // fail-loudly half of the foreign-payload contract, closed-form
    // from the id law
    "q121_codec_corrupt_reject" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 2 = 0 THEN 'flac' ELSE 'avi' END AS codec,
        | CAST((doc_id // 2) % 4 AS INT) AS corrupt_class,
        | CASE WHEN (doc_id // 2) % 4 = 0 THEN 0 ELSE 1 END AS rejected
        |FROM documents ORDER BY 1""".stripMargin,
    // unicode canonicalization: the messy wire form (decomposed
    // combining marks + injected U+FFFD) is synthesized in closed
    // form, and DuckDB's own independent nfc_normalize recomputes the
    // audit — hash green means both engines' UAX #15 implementations
    // agree byte for byte
    "q122_unicode_normalize" ->
      """WITH m AS (
        | SELECT doc_id,
        |  CASE WHEN doc_id % 13 = 0 THEN chr(65533) ELSE '' END ||
        |   replace(text, 'a', 'a' || chr(768)) AS m
        | FROM documents)
        |SELECT doc_id,
        | CAST(length(m) AS INT) AS n_chars_raw,
        | CAST(length(nfc_normalize(m)) AS INT) AS n_chars_nfc,
        | CAST(m <> nfc_normalize(m) AS INT) AS changed,
        | CAST(length(m) - length(replace(m, chr(65533), '')) AS INT)
        |   AS n_suspect,
        | md5(nfc_normalize(m)) AS text_md5
        |FROM m ORDER BY doc_id""".stripMargin,
    // int8 quantization: the stored code vectors are integer-exact
    // (double divide + floor-half-up both engines; md5 proves every
    // lane); the float reconstruction laws are self-gating flags the
    // rounding guarantee pins at 1
    "q123_embed_quant_int8" ->
      """WITH s AS (
        | SELECT vec_id, embedding,
        |  list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127
        |   AS scale
        | FROM embeddings),
        |q AS (
        | SELECT vec_id, scale,
        |  list_transform(embedding,
        |   x -> CAST(floor(x::DOUBLE / scale + 0.5) AS INT)) AS qv
        | FROM s)
        |SELECT vec_id,
        | md5(array_to_string(qv, ',')) AS q_md5,
        | CAST(list_sum(qv) AS BIGINT) AS q_sum,
        | CAST(list_min(qv) AS INT) AS q_min,
        | CAST(list_max(qv) AS INT) AS q_max,
        | 1 AS ok_err, 1 AS ok_cos
        |FROM q ORDER BY vec_id""".stripMargin,
    // quantized-domain KNN: scores over int8 codes are rationals of
    // exact integers (codes ≤ 127, d = 64 ⇒ every double partial sum
    // exact), so the ANN serving path sits under the hash oracle with
    // no tolerance flag; scales cancel out of the cosine
    "q124_embed_quant_knn" ->
      """WITH s AS (
        | SELECT vec_id, embedding,
        |  list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127
        |   AS scale
        | FROM embeddings),
        |q AS (
        | SELECT vec_id,
        |  list_transform(embedding,
        |   x -> CAST(floor(x::DOUBLE / scale + 0.5) AS INT)) AS qv
        | FROM s),
        |n AS (SELECT vec_id, qv,
        |  sqrt(CAST(list_dot_product(qv, qv) AS DOUBLE)) AS nrm FROM q),
        |p AS (
        | SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |  CAST(list_dot_product(a.qv, b.qv) AS DOUBLE) / (a.nrm * b.nrm)
        |   AS qc
        | FROM n a JOIN n b ON a.vec_id < 10 AND a.vec_id <> b.vec_id),
        |r AS (
        | SELECT query_id, neighbor_id, qc, row_number() OVER (
        |   PARTITION BY query_id ORDER BY qc DESC, neighbor_id) AS rank
        | FROM p)
        |SELECT query_id, neighbor_id, round(qc, 6) + 0 AS qcos,
        | CAST(rank AS INT) AS rank
        |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // streaming hourly rollup: the q18 aggregation — the stream's
    // complete-mode final state must equal it whatever the
    // micro-batch split (exact-decimal accumulation)
    "q118_stream_hourly" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hr_s,
        | event_type, count(*) AS n,
        | round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS total
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    // streaming exact dedup: one kept row per text digest — the
    // original (min id), never the later-arriving re-keyed duplicate
    // wave the entry stages; an undropped re-arrival duplicates a
    // digest row and fails the compare
    "q113_stream_exact_dedup" ->
      """SELECT md5(text) AS digest, min(doc_id) AS doc_id
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // foreign-media decode: javax.imageio wrote the stored payloads
    // (independent encoder — PNG filter choices, GIF palette/LZW,
    // JPEG entropy coding outside this repo's control); the repo's
    // codecs decode them and the oracle recomputes the exact
    // per-channel pixel sums from the generative laws (see
    // ForeignMedia for why each format's law is lossless-exact)
    "q112_media_foreign" ->
      """WITH ids AS (SELECT doc_id AS id FROM documents),
        | png AS (SELECT id, CAST(8 + (id // 3) % 9 AS INT) AS w,
        |   CAST(8 + (id // 3) % 7 AS INT) AS h FROM ids WHERE id % 3 = 0),
        | pngf AS (SELECT id AS doc_id, 'png' AS fmt, w, h,
        |   CAST(sum((id*7 + x) % 256) AS BIGINT) AS sum_c1,
        |   CAST(sum((id*11 + y) % 256) AS BIGINT) AS sum_c2,
        |   CAST(sum((id*13 + x + y) % 256) AS BIGINT) AS sum_c3
        |  FROM png CROSS JOIN LATERAL unnest(range(0, w)) AS tx(x)
        |           CROSS JOIN LATERAL unnest(range(0, h)) AS ty(y)
        |  GROUP BY 1,2,3,4),
        | gif AS (SELECT id, CAST(8 + 2*(id % 5) AS INT) AS w,
        |   CAST(8 + 2*(id % 4) AS INT) AS h FROM ids WHERE id % 3 = 1),
        | giff AS (SELECT id AS doc_id, 'gif' AS fmt, w, h,
        |   CAST(sum((id + 3*x + 7*y) % 256) AS BIGINT) AS sum_c1,
        |   CAST(sum(((id + 3*x + 7*y) % 256) * 3 % 256) AS BIGINT) AS sum_c2,
        |   CAST(sum(((id + 3*x + 7*y) % 256) * 7 % 256) AS BIGINT) AS sum_c3
        |  FROM gif CROSS JOIN LATERAL unnest(range(0, w)) AS tx(x)
        |           CROSS JOIN LATERAL unnest(range(0, h)) AS ty(y)
        |  GROUP BY 1,2,3,4),
        | jpg AS (SELECT id, CAST(16*(1 + (id // 3) % 3) AS INT) AS w,
        |   CAST(16*(1 + (id // 3) % 2) AS INT) AS h FROM ids WHERE id % 3 = 2),
        | jpgf AS (SELECT id AS doc_id, 'jpeg' AS fmt, w, h,
        |   CAST(sum(((id*37 + bx*11 + by*5) % 256) * 64) AS BIGINT) AS sum_c1,
        |   CAST(128 * w * h AS BIGINT) AS sum_c2,
        |   CAST(128 * w * h AS BIGINT) AS sum_c3
        |  FROM jpg CROSS JOIN LATERAL unnest(range(0, w // 8)) AS tb(bx)
        |           CROSS JOIN LATERAL unnest(range(0, h // 8)) AS tc(by)
        |  GROUP BY 1,2,3,4)
        |SELECT doc_id, fmt, w, h, sum_c1, sum_c2, sum_c3
        |FROM (SELECT * FROM pngf UNION ALL SELECT * FROM giff
        |      UNION ALL SELECT * FROM jpgf)
        |ORDER BY doc_id""".stripMargin,
    // foreign-audio decode: the JDK's own WAV writer produced the
    // stored payloads; the strict RIFF walker decodes them and the
    // oracle recomputes exact integer sample statistics from the law
    "q117_media_foreign_audio" ->
      """WITH d AS (SELECT doc_id AS id,
        |   CAST(400 + doc_id % 800 AS INT) AS n FROM documents),
        | s AS (SELECT id, n, ((id*131 + t*37) % 65536) - 32768 AS v
        |  FROM d CROSS JOIN LATERAL unnest(range(0, n)) AS tt(t))
        |SELECT id AS doc_id, CAST(8000 AS INT) AS sample_rate,
        | CAST(max(n) AS INT) AS n_samples,
        | CAST(sum(v) AS BIGINT) AS sum_s,
        | CAST(min(v) AS INT) AS min_s, CAST(max(v) AS INT) AS max_s
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    // foreign-FRAME video decode: own AVI container, every frame
    // written by ImageIO's JPEG encoder (grayscale block-constant at
    // quality 1.0 — the exact point); the q105-style motion law
    // couples consecutive frames, so the hash gate proves frame order
    // through the container walk over entropy coding this repo does
    // not control. Laws are 8x8-block-constant, so the oracle sums
    // blocks x 64 instead of unnesting pixels.
    "q127_media_foreign_video" ->
      """WITH d AS (SELECT doc_id, 8*(2 + doc_id % 4) AS w,
        |   8*(2 + doc_id % 3) AS h, 3 + doc_id % 4 AS nf FROM documents),
        | blk AS (SELECT doc_id, w, h, nf,
        |   (doc_id * 37 + f * 41 + bx * 11 + by * 5) % 256 AS yv,
        |   CASE WHEN f > 0 THEN abs(
        |     (doc_id * 37 + f * 41 + bx * 11 + by * 5) % 256
        |     - (doc_id * 37 + (f - 1) * 41 + bx * 11 + by * 5) % 256)
        |    ELSE 0 END AS dy
        |  FROM d CROSS JOIN LATERAL unnest(range(0, nf)) AS tf(f)
        |        CROSS JOIN LATERAL unnest(range(0, w // 8)) AS tb(bx)
        |        CROSS JOIN LATERAL unnest(range(0, h // 8)) AS tc(by))
        |SELECT doc_id,
        | CAST(max(nf) AS INT) AS n_frames,
        | CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
        | CAST(10 AS INT) AS fps,
        | round(CAST(sum(yv) * 64 AS DOUBLE) / (max(w) * max(h) * max(nf)), 6) AS mean_y,
        | round(CAST(sum(dy) * 64 AS DOUBLE) / (max(w) * max(h) * (max(nf) - 1)), 6) AS motion
        |FROM blk GROUP BY 1 ORDER BY 1""".stripMargin,
    // Bloom-prefiltered exact incremental dedup: the sketch only
    // PRUNES (no false negatives; false positives die in the exact
    // semi-join), so the result equals the plain digest semi-join —
    // exact under the hash oracle. The incoming batch derives by the
    // duplicate-wave law (mod-8 ids borrow their successor's text).
    "q129_dedup_bloom_incremental" ->
      """WITH succ AS (SELECT doc_id - 1 AS doc_id, text AS succ_text FROM documents),
        | inc AS (SELECT a.doc_id,
        |   CASE WHEN a.doc_id % 8 = 0 THEN s.succ_text ELSE a.text END AS text
        |  FROM documents a JOIN succ s USING (doc_id)
        |  WHERE a.doc_id % 4 = 0)
        |SELECT i.doc_id AS doc_id FROM inc i
        |WHERE EXISTS (SELECT 1 FROM documents e
        |  WHERE e.doc_id % 4 <> 0 AND e.text = i.text)
        |ORDER BY 1""".stripMargin,
    // the same dedup served from the persisted, incrementally MERGED
    // Bloom artifact: merged ≡ rebuilt is exact (identical filter
    // geometry ⇒ identical bitsets) and false positives still die in
    // the stored-digest verify join, so the same plain SQL decides
    "q136_dedup_bloom_artifact" ->
      """WITH succ AS (SELECT doc_id - 1 AS doc_id, text AS succ_text FROM documents),
        | inc AS (SELECT a.doc_id,
        |   CASE WHEN a.doc_id % 8 = 0 THEN s.succ_text ELSE a.text END AS text
        |  FROM documents a JOIN succ s USING (doc_id)
        |  WHERE a.doc_id % 4 = 0)
        |SELECT i.doc_id AS doc_id FROM inc i
        |WHERE EXISTS (SELECT 1 FROM documents e
        |  WHERE e.doc_id % 4 <> 0 AND e.text = i.text)
        |ORDER BY 1""".stripMargin,
    // foreign PROGRESSIVE JPEG decode: ImageIO's writer in SOF2 mode
    // emits the IJG multi-scan script (spectral selection +
    // successive approximation) — scan structure this repo does not
    // control — and the quality-1.0 block-constant law keeps the
    // multi-scan round trip bit-exact; non-multiple-of-8 dims
    // exercise the cropped edge blocks. Odd ids are THREE-component
    // color (gray-valued RGB ⇒ Y = law, Cb = Cr = 128 exactly
    // through libjpeg's fixed-point converter), gating the
    // interleaved-DC + per-component-AC scan interaction; ncomp is
    // read from the stored SOF2 marker, so a grayscale-only corpus
    // cannot pass the color half
    "q128_media_foreign_progressive" ->
      """WITH d AS (SELECT doc_id, 8*(1 + doc_id % 6) + (doc_id % 5) AS w,
        |   8*(1 + doc_id % 4) + (doc_id % 3) AS h FROM documents),
        | px AS (SELECT doc_id, w, h,
        |   (doc_id * 41 + (x // 8) * 7 + (y // 8) * 13) % 256 AS yv
        |  FROM d CROSS JOIN LATERAL unnest(range(0, w)) AS tx(x)
        |        CROSS JOIN LATERAL unnest(range(0, h)) AS ty(y))
        |SELECT doc_id,
        | CAST(CASE WHEN doc_id % 2 = 1 THEN 3 ELSE 1 END AS INT) AS ncomp,
        | CAST(max(w) AS INT) AS w, CAST(max(h) AS INT) AS h,
        | CAST(sum(yv) AS BIGINT) AS sum_y,
        | CAST(min(yv) AS INT) AS min_y, CAST(max(yv) AS INT) AS max_y,
        | CAST(128 * max(w) * max(h) AS BIGINT) AS sum_cb,
        | CAST(128 * max(w) * max(h) AS BIGINT) AS sum_cr
        |FROM px GROUP BY 1 ORDER BY 1""".stripMargin,
    // BM25 ranked retrieval: the inverted-file derivation recomputed
    // in SQL — rational odds weight (no ln), per-term IEEE doubles,
    // exact decimal accumulation, (score desc, doc_id) tie-break
    "q137_bm25_topk" -> bm25Sql,
    // the same ranking served from the persisted prefix-partitioned
    // inverted file — must reproduce the one-job derivation exactly
    "q138_bm25_stored" -> bm25Sql,
    // the stored serving path driven through a real availableNow
    // stream of query micro-batches — scoring is per-query
    // independent over a read-only index, so any batch split must
    // reproduce the one-batch answer
    "q154_stream_bm25_serve" -> bm25Sql,
    // index MAINTENANCE: built on 75%, the 25% batch appended with
    // an additive df merge — the appended index must reproduce the
    // union-corpus ranking exactly (df additivity is an identity)
    "q139_bm25_index_append" -> bm25Sql,
    // link-graph PageRank quality prior: five damped fixed-point
    // iterations in pure integer arithmetic — rank values hash-exact
    "q140_link_pagerank" -> pageRankSql,
    "q146_link_pagerank_dangling" -> pageRankDanglingSql,
    // HITS: integer sum-normalized mutual reinforcement — hubs and
    // authorities hash-exact after four unrolled rounds
    "q149_link_hits" -> hitsSql,
    // PageRank over the variable-degree law, gated at the uniform
    // prior, grouped by source — the quality prior composing into
    // curation
    "q153_link_quality_gate" -> linkQualityGateSql,
    // the same gate served from the STORED centrality prior (ranks
    // computed once at publish, joined per batch) — identical law,
    // so the identical SQL gates it; likewise HITS from its prior
    "q155_link_prior_stored" -> linkQualityGateSql,
    "q156_hits_prior_stored" -> hitsSql,
    // personalized PageRank: the teleport vector concentrated on one
    // target domain's documents — integer rounds, hash-exact
    "q159_link_ppr" -> personalizedPageRankSql,
    // count-min heavy hitters: exact top-k columns, constant-true
    // CMS-law flags (raw estimates are sketch-internal — the
    // q61/q83 self-gating discipline)
    "q150_token_heavy_hitters" -> heavyHittersSql,
    // the same answer served from the persisted artifact after a 25%
    // sketch merge + count-segment append — merged ≡ rebuilt is an
    // exact identity, so the identical SQL gates it
    "q157_cms_heavy_hitters_stored" -> heavyHittersSql,
    // exact duplicated-substring spans: overlapping L-token window
    // digests, global df, then interval merging per doc — the spliced
    // derived corpus (prefix + unique marker + suffix) forces
    // multi-span documents so the merge logic itself is gated
    "q147_substring_dedup" -> substringSpansSql,
    // the same spans served from the stored segment index after a
    // 25% append — segment-summed df must equal the in-plan df
    "q151_substring_dedup_stored" -> substringSpansSql,
    // the same spans after the append slice arrives as STREAMED
    // micro-batches (one pure-additive segment per batch — df is
    // additive over any disjoint split, so the stream answers the
    // one-batch oracle)
    "q158_stream_substring_append" -> substringSpansSql,
    // the post-DELETE index serving the remaining corpus: tombstone
    // segments cancel the deleted quarter's window mass exactly, so
    // the oracle recomputes the span law over the remaining corpus
    "q160_substring_delete" -> substringDeleteSql,
    // the tombstone-deleted inverted file serving the remaining
    // corpus's queries: dfs subtracted exactly, postings anti-joined
    // against the tombstone ledger — the oracle recomputes BM25 over
    // the remaining corpus directly
    "q161_bm25_delete" -> bm25DeleteSql,
    // the ANN delete tier (doc-local tombstones + serve-time
    // anti-join): each index serves the REMAINING corpus's exact
    // top-AnnOracleK — the oracle recomputes KNN over the corpus
    // minus the deleted quarter directly (delete ≡ rebuild-without
    // under the recall gate)
    "q162_ann_ivf_sq8_delete" ->
      knnDeleteSql(graft.operators.Curation.AnnOracleK),
    "q163_ann_pq_delete" ->
      knnDeleteSql(graft.operators.Curation.AnnOracleK),
    "q164_ann_ivfpq_delete" ->
      knnDeleteSql(graft.operators.Curation.AnnOracleK),
    // near-dup delete tier: index built on the FULL corpus, the
    // incoming slice deleted — serving the incoming batch then
    // answers exactly the existing-only oracle q62/q116 share
    // (delete ≡ rebuild-without is EXACT for doc-local tables)
    "q165_neardup_index_delete" -> incrementalDedupSql,
    // semantic decontamination: paraphrase probes (corpus vectors
    // with dim 1 zeroed, ids +5M) against the stored IVF-SQ8 codes —
    // the oracle recomputes the identical int8 quantization and
    // quantized cosine over ALL (train, eval) pairs and keeps
    // qc ≥ 0.8 (the q124 integer-exact discipline: every product an
    // integer, the score a partition-order-independent rational)
    "q166_semantic_decontam" ->
      """WITH ev AS (SELECT vec_id + 5000000 AS vec_id,
        |   [CAST(0 AS FLOAT)] || embedding[2:] AS embedding
        |  FROM embeddings WHERE vec_id < 10),
        | sq AS (SELECT vec_id,
        |   list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127 AS scale,
        |   embedding FROM ev),
        | q AS (SELECT vec_id, list_transform(embedding,
        |   x -> CAST(floor(x::DOUBLE / scale + 0.5) AS INT)) AS qv FROM sq),
        | qn AS (SELECT vec_id, qv,
        |   sqrt(CAST(list_dot_product(qv, qv) AS DOUBLE)) AS nrm FROM q),
        | sc AS (SELECT vec_id,
        |   list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127 AS scale,
        |   embedding FROM embeddings),
        | c AS (SELECT vec_id, list_transform(embedding,
        |   x -> CAST(floor(x::DOUBLE / scale + 0.5) AS INT)) AS qv FROM sc),
        | cn AS (SELECT vec_id, qv,
        |   sqrt(CAST(list_dot_product(qv, qv) AS DOUBLE)) AS nrm FROM c),
        | p AS (SELECT c.vec_id AS train_id, e.vec_id AS eval_id,
        |   CAST(list_dot_product(c.qv, e.qv) AS DOUBLE) / (c.nrm * e.nrm) AS qc
        |  FROM cn c CROSS JOIN qn e)
        |SELECT train_id, eval_id, round(qc, 6) + 0 AS score
        |FROM p WHERE qc >= 0.8 ORDER BY eval_id, train_id""".stripMargin,
    // composed curation pipeline v2: q67's gate + dedup phases, then
    // q64's 8-gram decontamination and q166's quantized semantic
    // probe over the SURVIVORS, one provenance status per document —
    // the CASE order IS the precedence law (a doc both near-dup and
    // contaminated drops once, as near_dup)
    "q167_curation_pipeline_v2" ->
      s"""WITH t AS (SELECT doc_id, text, lang, source, ' ' || lower(text) || ' ' AS p,
        |   list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS toks
        |  FROM documents),
        | m AS (SELECT doc_id, lang, source, text,
        |   CAST(len(toks) AS INT) AS n_tokens,
        |   CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
        |   ${langScoreSql("en")} AS stopword_hits
        |  FROM t),
        | gated AS (SELECT doc_id, text FROM m
        |  WHERE source <> '${graft.operators.Curation.Q64EvalSource}' AND lang = 'en' AND
        |   round(round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) * 0.4
        |     + (CASE WHEN n_tokens >= 20 AND n_tokens <= 200 THEN 0.3 ELSE 0.0 END)
        |     + (CASE WHEN round(CAST(stopword_hits AS DOUBLE) / n_tokens, 6) > 0.01 THEN 0.2 ELSE 0.0 END), 6)
        |    >= ${graft.operators.Curation.Q67MinQuality}),
        | keepers AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(text)),
        | docs2 AS (SELECT g.doc_id, g.text FROM gated g JOIN keepers USING (doc_id)),
        | toks2 AS (SELECT doc_id, string_split(text, ' ') AS w FROM docs2),
        | grams AS (SELECT DISTINCT doc_id,
        |   list_extract(w, CAST(i AS INT)) || ' ' || list_extract(w, CAST(i AS INT)+1) || ' ' || list_extract(w, CAST(i AS INT)+2) AS g
        |  FROM toks2 CROSS JOIN LATERAL unnest(range(1, len(w)-1)) AS t(i)),
        | sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
        | inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
        |  FROM grams x JOIN grams y ON x.g = y.g AND x.doc_id < y.doc_id GROUP BY 1,2),
        | drops AS (SELECT DISTINCT i.b AS doc_id
        |  FROM inter i JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
        |  WHERE round(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6) >= 0.8),
        | kept3 AS (SELECT doc_id, text FROM docs2
        |  WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
        | tokA AS (SELECT doc_id, string_split(text, ' ') AS w FROM kept3),
        | gA AS (SELECT DISTINCT doc_id,
        |   array_to_string(w[CAST(i AS INT):CAST(i AS INT)+${graft.operators.Curation.Q64GramN - 1}], ' ') AS g
        |  FROM tokA CROSS JOIN LATERAL unnest(range(1, len(w)-${graft.operators.Curation.Q64GramN - 2})) AS t(i)),
        | tokE AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE source = '${graft.operators.Curation.Q64EvalSource}'),
        | gE AS (SELECT DISTINCT doc_id,
        |   array_to_string(w[CAST(i AS INT):CAST(i AS INT)+${graft.operators.Curation.Q64GramN - 1}], ' ') AS g
        |  FROM tokE CROSS JOIN LATERAL unnest(range(1, len(w)-${graft.operators.Curation.Q64GramN - 2})) AS t(i)),
        | ngram AS (SELECT DISTINCT a.doc_id FROM gA a JOIN gE e ON a.g = e.g),
        | ev AS (SELECT vec_id + 5000000 AS vec_id,
        |   [CAST(0 AS FLOAT)] || embedding[2:] AS embedding
        |  FROM embeddings WHERE vec_id < 10),
        | sq AS (SELECT vec_id,
        |   list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127 AS scale,
        |   embedding FROM ev),
        | q AS (SELECT vec_id, list_transform(embedding,
        |   x -> CAST(floor(x::DOUBLE / scale + 0.5) AS INT)) AS qv FROM sq),
        | qn AS (SELECT vec_id, qv,
        |   sqrt(CAST(list_dot_product(qv, qv) AS DOUBLE)) AS nrm FROM q),
        | sc AS (SELECT vec_id,
        |   list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127 AS scale,
        |   embedding FROM embeddings),
        | c AS (SELECT vec_id, list_transform(embedding,
        |   x -> CAST(floor(x::DOUBLE / scale + 0.5) AS INT)) AS qv FROM sc),
        | cn AS (SELECT vec_id, qv,
        |   sqrt(CAST(list_dot_product(qv, qv) AS DOUBLE)) AS nrm FROM c),
        | p2 AS (SELECT c.vec_id AS train_id,
        |   CAST(list_dot_product(c.qv, e.qv) AS DOUBLE) / (c.nrm * e.nrm) AS qc
        |  FROM cn c CROSS JOIN qn e),
        | sem AS (SELECT DISTINCT train_id AS doc_id FROM p2 WHERE qc >= 0.8)
        |SELECT d.doc_id,
        | CASE
        |   WHEN d.source = '${graft.operators.Curation.Q64EvalSource}' THEN 'eval'
        |   WHEN d.doc_id NOT IN (SELECT doc_id FROM gated) THEN 'gated'
        |   WHEN d.doc_id NOT IN (SELECT doc_id FROM keepers) THEN 'exact_dup'
        |   WHEN d.doc_id IN (SELECT doc_id FROM drops) THEN 'near_dup'
        |   WHEN d.doc_id IN (SELECT doc_id FROM ngram) THEN 'contam_ngram'
        |   WHEN d.doc_id IN (SELECT doc_id FROM sem) THEN 'contam_semantic'
        |   WHEN substr(md5(d.text), 1, 2) < '0a' THEN 'kept_val'
        |   ELSE 'kept_train'
        | END AS status
        |FROM documents d ORDER BY 1""".stripMargin,
    // the per-source token-budget report of the span pass, over the
    // RAW corpus (no splice — the report is the deployment shape)
    "q152_substring_effective" -> substringEffectiveSql,
    // URL dedup: the canonical form in closed form — scheme by
    // parity, host/path/params straight off the id laws; group sizes
    // shift if ANY normalization rule (case, www, ports, utm,
    // param sort, trailing slash, fragment) misfires
    "q110_url_dedup" ->
      """WITH c AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END) || '://example' ||
        |  (doc_id % 3) || '.com/Path/' || (doc_id % 5) || '/item?a=' || (doc_id % 2) ||
        |  '&b=' || (doc_id % 3) AS url_canonical FROM documents)
        |SELECT url_canonical, count(*) AS n_docs,
        | CAST(min(doc_id) AS BIGINT) AS keeper
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    // real frame sampling: luma mean over frames 0, 2, 4, ... only —
    // an off-by-one or all-frames fallback shifts the mean
    "q109_frame_sample" ->
      """WITH d AS (SELECT doc_id, 24 + doc_id % 33 AS w, 24 + doc_id % 29 AS h,
        |   3 + doc_id % 4 AS nf FROM documents),
        | px AS (SELECT doc_id, w, h, nf, f,
        |   (doc_id * 7 + f * 37 + (x // 8) * 13 + (y // 8) * 29) % 256 AS yv
        |  FROM d CROSS JOIN LATERAL unnest(range(0, nf, 2)) AS tf(f)
        |        CROSS JOIN LATERAL unnest(range(0, w)) AS tx(x)
        |        CROSS JOIN LATERAL unnest(range(0, h)) AS ty(y))
        |SELECT doc_id,
        | CAST(max(nf) AS INT) AS n_frames,
        | CAST(count(DISTINCT f) AS INT) AS n_sampled,
        | round(CAST(sum(yv) AS DOUBLE) / (max(w) * max(h) * count(DISTINCT f)), 6) AS mean_y
        |FROM px GROUP BY 1 ORDER BY 1""".stripMargin,
    // real pixel resample: per-output-pixel box means (integer sums,
    // round-half-away — both engines agree on positives) over the
    // q96 pixel law, then channel means of the RESIZED image
    "q108_media_resize" ->
      """WITH d AS (SELECT doc_id, 16 + doc_id % 17 AS w, 16 + doc_id % 13 AS h FROM documents),
        | o AS (SELECT doc_id, w, h, (w + 1) // 2 AS ow, (h + 1) // 2 AS oh FROM d),
        | box AS (SELECT doc_id, w, h, ow, oh, i, j,
        |   CAST(round(CAST(sum((doc_id * 7 + x * 3 + y * 5) % 256) AS DOUBLE) / count(*), 0) AS BIGINT) AS r,
        |   CAST(round(CAST(sum((doc_id * 7 + x * 3 + y * 5 + 11) % 256) AS DOUBLE) / count(*), 0) AS BIGINT) AS g,
        |   CAST(round(CAST(sum((doc_id * 7 + x * 3 + y * 5 + 22) % 256) AS DOUBLE) / count(*), 0) AS BIGINT) AS b
        |  FROM o
        |  CROSS JOIN LATERAL unnest(range(0, ow)) AS ti(i)
        |  CROSS JOIN LATERAL unnest(range(0, oh)) AS tj(j)
        |  CROSS JOIN LATERAL unnest(range(2 * i, least(2 * i + 2, w))) AS tx(x)
        |  CROSS JOIN LATERAL unnest(range(2 * j, least(2 * j + 2, h))) AS ty(y)
        |  GROUP BY 1, 2, 3, 4, 5, 6, 7)
        |SELECT doc_id,
        | CAST(max(w) AS INT) AS in_w, CAST(max(h) AS INT) AS in_h,
        | CAST(max(ow) AS INT) AS out_w, CAST(max(oh) AS INT) AS out_h,
        | round(CAST(sum(r) AS DOUBLE) / (max(ow) * max(oh)), 6) AS mean_r,
        | round(CAST(sum(g) AS DOUBLE) / (max(ow) * max(oh)), 6) AS mean_g,
        | round(CAST(sum(b) AS DOUBLE) / (max(ow) * max(oh)), 6) AS mean_b
        |FROM box GROUP BY 1 ORDER BY 1""".stripMargin,
    // zstd/lz4 corpus ingest: md5 of the decompressed bytes proves
    // the round trip for both codec families
    "q107_compressed_ingest" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 2 = 0 THEN 'zstd' ELSE 'lz4' END AS codec,
        | CAST(len(text) AS INT) AS n_chars,
        | CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        | md5(text) AS text_md5
        |FROM documents ORDER BY 1""".stripMargin,
    "q100_gzip_ingest" ->
      """SELECT doc_id,
        | CAST(len(text) AS INT) AS n_chars,
        | CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        | md5(text) AS text_md5
        |FROM documents ORDER BY 1""".stripMargin,
    // real COMPRESSED-codec FLAC decode: the q90 signal law (left
    // channel; a second series for stereo docs) through
    // fixed-predictor/LPC + Rice compression, all four stereo
    // decorrelation modes (doc%5 law), and back; lossless, so the
    // oracle recomputes the decoded quantities exactly from the
    // signal law + channel count alone (no n_bytes — compressed size
    // is encoder-dependent). rms/peak aggregate over both channels'
    // samples; n_samples stays per-channel.
    "q99_media_flac" ->
      """WITH d AS (SELECT doc_id, 800 + (doc_id % 100) * 8 AS n,
        |   CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 2 END AS nch,
        |   CASE WHEN doc_id % 7 = 0 THEN -4 ELSE -1 END AS mw FROM documents),
        | s0 AS (SELECT doc_id, n, nch, mw, ((doc_id * 31 + i * 17) % 65536) - 32768 AS v
        |  FROM d CROSS JOIN LATERAL unnest(range(0, n)) AS t(i)
        |  UNION ALL
        |  SELECT doc_id, n, nch, mw, ((doc_id * 37 + i * 23) % 65536) - 32768 AS v
        |  FROM d CROSS JOIN LATERAL unnest(range(0, n)) AS t(i)
        |  WHERE nch = 2),
        | s AS (SELECT doc_id, n, nch, v & mw AS v FROM s0)
        |SELECT doc_id,
        | CAST(16000 AS INT) AS sample_rate,
        | CAST(max(nch) AS INT) AS n_channels,
        | CAST(max(n) AS INT) AS n_samples,
        | CAST(max(n) * 1000000 // 16000 AS BIGINT) AS duration_us,
        | round(sqrt(CAST(sum(CAST(CAST(v AS BIGINT) * v AS DECIMAL(28,0))) AS DOUBLE) / (max(n) * max(nch))), 6) AS rms,
        | CAST(max(abs(v)) AS INT) AS peak
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    // real COMPRESSED-codec PNG decode: the q91 pixel law decoded
    // back out of real zlib'd PNG bytes (rotating filters 0-4, split
    // IDAT, CRC-checked chunks). No n_bytes column — container size
    // is deflate-dependent; the oracle recomputes the DECODED
    // quantities, which is exactly what proves the decoder
    // real LOSSY-codec JPEG decode: luma constant per 8x8 block and
    // chroma constant per 16x16 MCU make the DCT round trip exact
    // (all energy in DC, DC quant step 8), so the oracle recomputes
    // the DECODED planes straight from the block law — hash-green
    // proves the Huffman + DCT + subsampling + restart pipeline
    "q104_media_jpeg" ->
      """WITH d AS (SELECT doc_id, 24 + doc_id % 41 AS w, 24 + doc_id % 37 AS h FROM documents),
        | px AS (SELECT doc_id, w, h,
        |   (doc_id * 7 + (x // 8) * 13 + (y // 8) * 29) % 256 AS yv,
        |   (doc_id * 11 + (x // 16) * 17 + (y // 16) * 23) % 256 AS cb,
        |   (doc_id * 13 + (x // 16) * 19 + (y // 16) * 31) % 256 AS cr
        |  FROM d CROSS JOIN LATERAL unnest(range(0, w)) AS tx(x)
        |        CROSS JOIN LATERAL unnest(range(0, h)) AS ty(y))
        |SELECT doc_id,
        | CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
        | round(CAST(sum(yv) AS DOUBLE) / (max(w) * max(h)), 6) AS mean_y,
        | round(CAST(sum(cb) AS DOUBLE) / (max(w) * max(h)), 6) AS mean_cb,
        | round(CAST(sum(cr) AS DOUBLE) / (max(w) * max(h)), 6) AS mean_cr
        |FROM px GROUP BY 1 ORDER BY 1""".stripMargin,
    // real VIDEO (Motion-JPEG AVI) decode: every frame is a DC-exact
    // JPEG under the q104 law with a frame axis mixed in; `motion`
    // couples CONSECUTIVE frames, so the hash gate proves frame
    // order/count through the container walk, not just pixel decode
    "q105_media_video" ->
      """WITH d AS (SELECT doc_id, 24 + doc_id % 33 AS w, 24 + doc_id % 29 AS h,
        |   3 + doc_id % 4 AS nf FROM documents),
        | px AS (SELECT doc_id, w, h, nf,
        |   (doc_id * 7 + f * 37 + (x // 8) * 13 + (y // 8) * 29) % 256 AS yv,
        |   CASE WHEN f > 0 THEN abs(
        |     (doc_id * 7 + f * 37 + (x // 8) * 13 + (y // 8) * 29) % 256
        |     - (doc_id * 7 + (f - 1) * 37 + (x // 8) * 13 + (y // 8) * 29) % 256)
        |    ELSE 0 END AS dy
        |  FROM d CROSS JOIN LATERAL unnest(range(0, nf)) AS tf(f)
        |        CROSS JOIN LATERAL unnest(range(0, w)) AS tx(x)
        |        CROSS JOIN LATERAL unnest(range(0, h)) AS ty(y))
        |SELECT doc_id,
        | CAST(max(nf) AS INT) AS n_frames,
        | CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
        | CAST(10 AS INT) AS fps,
        | round(CAST(sum(yv) AS DOUBLE) / (max(w) * max(h) * max(nf)), 6) AS mean_y,
        | round(CAST(sum(dy) AS DOUBLE) / (max(w) * max(h) * (max(nf) - 1)), 6) AS motion
        |FROM px GROUP BY 1 ORDER BY 1""".stripMargin,
    // real GIF/LZW decode: lossless palette-indexed pixels, so the
    // oracle recomputes the decoded channel means straight from the
    // per-pixel index law through the fixed color table
    "q106_media_gif" ->
      """WITH d AS (SELECT doc_id, 20 + doc_id % 31 AS w, 20 + doc_id % 23 AS h FROM documents),
        | px AS (SELECT doc_id, w, h,
        |   (doc_id * 3 + x * 5 + y * 11) % 256 AS i
        |  FROM d CROSS JOIN LATERAL unnest(range(0, w)) AS tx(x)
        |        CROSS JOIN LATERAL unnest(range(0, h)) AS ty(y))
        |SELECT doc_id,
        | CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
        | round(CAST(sum(i) AS DOUBLE) / (max(w) * max(h)), 6) AS mean_r,
        | round(CAST(sum((i * 7) % 256) AS DOUBLE) / (max(w) * max(h)), 6) AS mean_g,
        | round(CAST(sum((i * 13) % 256) AS DOUBLE) / (max(w) * max(h)), 6) AS mean_b
        |FROM px GROUP BY 1 ORDER BY 1""".stripMargin,
    "q96_media_png" ->
      """WITH d AS (SELECT doc_id, 16 + doc_id % 17 AS w, 16 + doc_id % 13 AS h FROM documents),
        | px AS (SELECT doc_id, w, h,
        |   (doc_id * 7 + x * 3 + y * 5) % 256 AS r,
        |   (doc_id * 7 + x * 3 + y * 5 + 11) % 256 AS g,
        |   (doc_id * 7 + x * 3 + y * 5 + 22) % 256 AS b
        |  FROM d CROSS JOIN LATERAL unnest(range(0, w)) AS tx(x)
        |        CROSS JOIN LATERAL unnest(range(0, h)) AS ty(y))
        |SELECT doc_id,
        | CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
        | round(CAST(sum(r) AS DOUBLE) / (max(w) * max(h)), 6) AS mean_r,
        | round(CAST(sum(g) AS DOUBLE) / (max(w) * max(h)), 6) AS mean_g,
        | round(CAST(sum(b) AS DOUBLE) / (max(w) * max(h)), 6) AS mean_b
        |FROM px GROUP BY 1 ORDER BY 1""".stripMargin,
    // perceptual near-dup: aHash groups equal the mod-30 classes of
    // the q94 pixel law (within-class noise never crosses a block's
    // mean margin; cross-class block patterns differ — spec-pinned)
    "q94_media_image_neardup" ->
      """SELECT CAST(min(doc_id) AS BIGINT) AS keeper,
        | count(*) AS n_copies
        |FROM documents GROUP BY doc_id % 30 ORDER BY 1""".stripMargin,
    // audio fingerprint near-dup: loudness-profile groups equal the
    // mod-25 classes of the q95 signal law (same margin + structural
    // class-bit arguments as q94, spec-pinned)
    "q95_media_audio_neardup" ->
      """SELECT CAST(min(doc_id) AS BIGINT) AS keeper,
        | count(*) AS n_copies
        |FROM documents GROUP BY doc_id % 25 ORDER BY 1""".stripMargin,
    // bigram surprisal: q77's shape over the adjacent-pair multiset;
    // DECIMAL(28,18) term sums keep per-doc totals order-independent
    "q87_bigram_surprisal" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | tok AS (SELECT doc_id,
        |   list_extract(w, CAST(i AS INT)) || ' ' || list_extract(w, CAST(i AS INT)+1) AS t
        |  FROM toks CROSS JOIN LATERAL unnest(range(1, len(w))) AS t(i)),
        | freq AS (SELECT t, count(*) AS n FROM tok GROUP BY 1),
        | tot AS (SELECT sum(n) AS total FROM freq),
        | term AS (SELECT doc_id,
        |   CAST(-log2(CAST(n AS DOUBLE) / total) AS DECIMAL(28,18)) AS s
        |  FROM tok JOIN freq USING (t) CROSS JOIN tot)
        |SELECT doc_id, CAST(count(*) AS INT) AS n_grams,
        | round(CAST(sum(s) AS DOUBLE) / count(*), 6) AS avg_surprisal
        |FROM term GROUP BY 1 ORDER BY 1""".stripMargin,
    // centroid = decimal-exact elementwise mean per label; score =
    // exact decimal cosine (knnSql's accumulation); outlier = bottom-K
    // rank per label with a vec_id tie-break
    "q81_embed_outliers" ->
      s"""WITH pos AS (SELECT vec_id, label, CAST(i AS INT) AS i,
        |   CAST(list_extract(embedding, CAST(i AS INT)) AS DOUBLE) AS x
        |  FROM embeddings CROSS JOIN LATERAL unnest(range(1, len(embedding)+1)) AS t(i)),
        | cent AS (SELECT label, i,
        |   CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS c
        |  FROM pos GROUP BY 1,2),
        | dots AS (SELECT p.vec_id, p.label,
        |   sum(CAST(p.x * c.c AS DECIMAL(28,12))) AS dot,
        |   sum(CAST(p.x * p.x AS DECIMAL(28,12))) AS nv,
        |   sum(CAST(c.c * c.c AS DECIMAL(28,12))) AS nc
        |  FROM pos p JOIN cent c ON c.label = p.label AND c.i = p.i
        |  GROUP BY 1,2),
        | scored AS (SELECT vec_id, label,
        |   round(CAST(dot AS DOUBLE)/(sqrt(CAST(nv AS DOUBLE))*sqrt(CAST(nc AS DOUBLE))), 6) AS cos_centroid
        |  FROM dots)
        |SELECT vec_id, label, cos_centroid,
        | CAST(CASE WHEN row_number() OVER (PARTITION BY label
        |   ORDER BY cos_centroid ASC, vec_id ASC) <= ${Curation.Q81BottomK}
        |  THEN 1 ELSE 0 END AS INT) AS outlier
        |FROM scored ORDER BY vec_id""".stripMargin,
    "q24_embed_knn" -> knnSql(10),
    // ANN entries emit only the exact-top-AnnOracleK prefix of their
    // approximate top-10 (see Curation scaladoc): the exact-KNN oracle
    // bounded at that rank is a true recall gate — a missed neighbor
    // drops a row and fails the compare.
    "q25_embed_ann_lsh"  -> knnSql(graft.operators.Curation.AnnOracleK),
    "q47_embed_ann_ivf"  -> knnSql(graft.operators.Curation.AnnOracleK),
    // same exact-KNN oracle gates the STORED-index probe path (q115):
    // partition-pruned reads of the persisted inverted file must
    // reproduce the in-memory derivation bit for bit
    "q115_embed_ann_ivf_stored" ->
      knnSql(graft.operators.Curation.AnnOracleK),
    // IVF + SQ8 + exact rerank: the full serving stack must still
    // reproduce the exact top-AnnOracleK - a neighbor the int8
    // prerank wrongly buried or a missed probe drops a row
    "q125_embed_ann_ivf_sq8" ->
      knnSql(graft.operators.Curation.AnnOracleK),
    // the same stack served from the STORED code column (probe →
    // pruned partitions → SQ8 prerank from the artifact → exact
    // rerank): still the exact top-AnnOracleK or the hash fails
    "q126_embed_ann_ivf_sq8_stored" ->
      knnSql(graft.operators.Curation.AnnOracleK),
    // product quantization: ADC prerank over 8-byte codes, exact
    // rerank decides — a true neighbor the PQ distortion buries below
    // the rerank window drops a row and fails the hash
    "q130_embed_ann_pq" ->
      knnSql(graft.operators.Curation.AnnOracleK),
    // PQ on the clustered corpus: the narrow-window regime PQ is
    // designed for (copies quantize onto their original's codebook
    // entries) — exact KNN over the same augmentation decides
    "q131_embed_ann_pq_clustered" ->
      knnAugSql(graft.operators.Curation.AnnOracleK),
    // the same PQ stack served from the stored code column — still
    // the exact top-AnnOracleK or the hash fails
    "q132_embed_ann_pq_stored" ->
      knnSql(graft.operators.Curation.AnnOracleK),
    // index MAINTENANCE: built on 75%, the 25% ingest batch appended
    // against the fixed centroids — the exact full-corpus top-K must
    // still come back through the appended inverted file
    "q133_ann_index_append" ->
      knnSql(graft.operators.Curation.AnnOracleK),
    // the SAME maintenance contract driven through a real
    // availableNow stream: three single-file micro-batch appends via
    // foreachBatch must land exactly where q133's one batch did
    "q148_stream_index_append" ->
      knnSql(graft.operators.Curation.AnnOracleK),
    // IVFADC: PQ codes served from inside the probed inverted-file
    // partitions — still the exact top-AnnOracleK or the hash fails
    "q134_embed_ann_ivfpq_stored" ->
      knnSql(graft.operators.Curation.AnnOracleK),
    // PQ index MAINTENANCE: built on 75%, the 25% batch encoded
    // against the fixed books and appended — the exact full-corpus
    // top-K must still come back through the appended code table
    "q135_pq_index_append" ->
      knnSql(graft.operators.Curation.AnnOracleK),
    // exact KNN over the SAME clustered augmentation (original ∪ three
    // one-dim-zeroed copies) — a missed cluster member fails the hash
    "q53_embed_ann_ivf_clustered" ->
      knnAugSql(graft.operators.Curation.AnnOracleK),
    "q26_embed_near_dup"     -> nearDupSql,
    // derived-parameter selective LSH over the deterministic sign-flip
    // near-dup corpus (Curation.q48EmbedNearDupLsh): the bucketed
    // generator must reproduce the exact all-pairs τ=0.9 result
    "q48_embed_near_dup_lsh" -> nearDupHiSql(0.9),
    // same fixture, scale-derived at the ultra-selective τ=0.95 point
    "q51_embed_near_dup_lsh_hi" ->
      nearDupHiSql(graft.operators.Curation.Q51MinCosine),
    "q27_text_langid" -> langIdSql,
    "q28_text_quality" -> qualitySql,
    "q29_token_freq" ->
      """SELECT token, count(*) AS freq FROM (
        | SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |   x -> len(x) > 0)) AS token FROM documents) t
        |GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 50""".stripMargin,
    "q30_fingerprint" ->
      """SELECT doc_id,
        | md5(array_to_string(list_sort(list_distinct(
        |   list_filter(string_split(lower(text), ' '), x -> len(x) > 0))), ' ')) AS fp
        |FROM documents ORDER BY 1""".stripMargin,
    // the salted join must be row-identical to the plain equi-join —
    // the oracle is deliberately UNSALTED
    "q54_salted_join" ->
      """SELECT o.o_orderstatus, count(*) AS n,
        | round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // The oracle spells out the as-of semantics as a window arg-max
    // (latest tn, then max view_id) rather than DuckDB's native ASOF
    // JOIN: among equal-timestamp matches ASOF's pick is unspecified,
    // while the Spark side tie-breaks on view_id — this form pins the
    // same deterministic choice on both engines. Exact nanoseconds.
    "q55_asof_join" ->
      """WITH clicks AS (SELECT event_id AS click_id, user_id, epoch_ns(ts) AS tn
        |  FROM events WHERE event_type = 'click'),
        | views AS (SELECT event_id AS view_id, user_id, epoch_ns(ts) AS tn,
        |   round(CAST(value AS DOUBLE), 6) AS view_value
        |  FROM events WHERE event_type = 'view')
        |SELECT c.click_id, c.user_id, v.view_id, v.view_value
        |FROM clicks c LEFT JOIN views v
        |  ON c.user_id = v.user_id AND v.tn <= c.tn
        |QUALIFY row_number() OVER (PARTITION BY c.click_id
        |  ORDER BY v.tn DESC NULLS LAST, v.view_id DESC NULLS LAST) = 1
        |ORDER BY c.click_id""".stripMargin,
    // the bucketed containment join must equal the naive BETWEEN join
    "q56_range_join" ->
      """WITH errors AS (SELECT event_id AS error_id, user_id, epoch_ns(ts) AS s,
        |   epoch_ns(ts) + 3600000000000 AS e
        |  FROM events WHERE event_type = 'error'),
        | clicks AS (SELECT user_id, epoch_ns(ts) AS tn, CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE event_type = 'click')
        |SELECT er.error_id, er.user_id,
        | count(c.tn) AS n_clicks,
        | round(CAST(coalesce(sum(c.v), 0) AS DOUBLE), 6) AS click_value
        |FROM errors er LEFT JOIN clicks c
        |  ON c.user_id = er.user_id AND c.tn BETWEEN er.s AND er.e
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    // both engines hash md5 over the same bytes and hex lowercases
    // compare lexicographically — the split is engine-portable
    "q57_hash_split" ->
      s"""SELECT doc_id,
        | CASE WHEN substring(md5(text), 1, 2) < '${Curation.Q57ValHex}' THEN 'val' ELSE 'train' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    // split leakage: q62's cross-side exact-Jaccard oracle with the
    // sides derived from the q57 hash split (val = incoming)
    "q78_split_leakage" ->
      s"""WITH sides AS (SELECT doc_id, text,
        |   CASE WHEN substr(md5(text), 1, 2) < '${Curation.Q78ValHex}' THEN 1 ELSE 0 END AS incoming
        |  FROM documents),
        | toks AS (SELECT doc_id, incoming, string_split(text, ' ') AS w FROM sides),
        | grams AS (SELECT DISTINCT doc_id, incoming,
        |   list_extract(w, CAST(i AS INT)) || ' ' || list_extract(w, CAST(i AS INT)+1) || ' ' || list_extract(w, CAST(i AS INT)+2) AS g
        |  FROM toks CROSS JOIN LATERAL unnest(range(1, len(w)-1)) AS t(i)),
        | sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
        | inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
        |  FROM grams x JOIN grams y ON x.g = y.g
        |   AND x.incoming = 0 AND y.incoming = 1
        |  GROUP BY 1,2)
        |SELECT i.a AS train_id, i.b AS val_id,
        | round(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6) AS jaccard
        |FROM inter i JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
        |WHERE round(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6) >= 0.8
        |ORDER BY 1, 2""".stripMargin,
    // Spark's exact `percentile` and DuckDB's quantile_cont both use
    // linear interpolation over the sorted values — bit-comparable
    // after the rounding discipline
    "q59_value_stats" ->
      """SELECT event_type, count(*) AS n,
        | round(CAST(avg(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS mean,
        | round(CAST(quantile_cont(value, 0.5) AS DOUBLE), 6) AS p50,
        | round(CAST(quantile_cont(value, 0.95) AS DOUBLE), 6) AS p95,
        | round(CAST(quantile_cont(value, 0.99) AS DOUBLE), 6) AS p99,
        | round(CAST(max(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS vmax
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // tolerance-based oracle for the GK-sketch twin (q83's pattern):
    // the Spark side emits pXX_ok = 1 iff approx(q) lies between the
    // exact percentiles at ranks q ± 1/accuracy, so the oracle
    // asserts the sketch's error contract as constant-1 flags
    "q61_value_stats_approx" ->
      """SELECT event_type, count(*) AS n,
        | round(CAST(avg(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS mean,
        | CAST(1 AS INT) AS p50_ok, CAST(1 AS INT) AS p95_ok,
        | CAST(1 AS INT) AS p99_ok,
        | round(CAST(max(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS vmax
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // gap sessionization via lag -> flag -> running-sum windows; both
    // engines work in MICROseconds (DuckDB truncates parquet nanos)
    "q60_sessions_batch" ->
      """WITH flagged AS (
        | SELECT user_id, epoch_us(ts) AS tn, CAST(value AS DECIMAL(18,6)) AS v,
        |  CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |    OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))),
        | sess AS (
        | SELECT user_id, tn, v,
        |  sum(new_s) OVER (PARTITION BY user_id ORDER BY tn
        |    ROWS UNBOUNDED PRECEDING) AS session_seq
        | FROM flagged)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        | count(*) AS n_events, min(tn) AS start_us, max(tn) AS end_us,
        | round(CAST(sum(v) AS DOUBLE), 6) AS total_value
        |FROM sess GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q58_lang_quota" ->
      """SELECT doc_id, lang, rn FROM (
        | SELECT doc_id, lang,
        |  CAST(row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS INT) AS rn
        | FROM documents) t
        |WHERE rn <= 40 ORDER BY lang, rn""".stripMargin,
    "q31_media_features" ->
      """SELECT doc_id,
        | CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
        | CAST(64 + octet_length(CAST(text AS BLOB)) % 640 AS INT) AS width,
        | CAST(64 + (octet_length(CAST(text AS BLOB)) // 2) % 480 AS INT) AS height,
        | lower(substring(hex(CAST(text AS BLOB)), 1, 16)) AS head_hex
        |FROM documents ORDER BY 1""".stripMargin,
  ) ++ graft.tally.TallyReportQueries.oracleSql

  /** q48/q51 oracle: exact all-pairs at τ = `tau` over the corpus
    * unioned with its first-dimension-sign-flipped copy — float sign
    * flip is exact on both engines, so the augmented corpora are
    * bit-identical (mirrors Curation.flippedNearDupCorpus). */
  private def nearDupHiSql(tau: Double): String =
    s"""WITH aug AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000, [-embedding[1]] || embedding[2:]
      |  FROM embeddings),
      | e1 AS (SELECT vec_id AS a, embedding AS av FROM aug),
      | e2 AS (SELECT vec_id AS b, embedding AS bv FROM aug),
      | flat AS (SELECT a, b, unnest(av) AS x, unnest(bv) AS y FROM e1 JOIN e2 ON a < b),
      | dots AS (SELECT a, b,
      |   sum(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(28,12))) AS dot,
      |   sum(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12))) AS na,
      |   sum(CAST(CAST(y AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(28,12))) AS nb
      |  FROM flat GROUP BY 1,2)
      |SELECT a, b, round(CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6) AS cos
      |FROM dots
      |WHERE round(CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6) >= $tau
      |ORDER BY 1, 2""".stripMargin

  /** q80 oracle: exact all-pairs τ = 0.9 over the flip fixture (the
    * nearDupHiSql pair set), closed into components by recursive
    * min-label reach, keep = (id == component min). The LSH edge
    * stream must reproduce the exact component structure. */
  private val semanticDedupSql: String =
    """WITH RECURSIVE aug AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000, [-embedding[1]] || embedding[2:]
      |  FROM embeddings),
      | e1 AS (SELECT vec_id AS a, embedding AS av FROM aug),
      | e2 AS (SELECT vec_id AS b, embedding AS bv FROM aug),
      | flat AS (SELECT a, b, unnest(av) AS x, unnest(bv) AS y FROM e1 JOIN e2 ON a < b),
      | dots AS (SELECT a, b,
      |   sum(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(28,12))) AS dot,
      |   sum(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12))) AS na,
      |   sum(CAST(CAST(y AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(28,12))) AS nb
      |  FROM flat GROUP BY 1,2),
      | pairs AS (SELECT a, b FROM dots
      |  WHERE round(CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6) >= 0.9),
      | sym AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
      | r AS (
      |  SELECT vec_id AS id, vec_id AS reach FROM aug
      |  UNION
      |  SELECT r.id, s.b FROM r JOIN sym s ON s.a = r.reach)
      |SELECT id AS vec_id, min(reach) AS cluster_id,
      | CAST(CASE WHEN id = min(reach) THEN 1 ELSE 0 END AS INT) AS keep
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  /** Exact all-pairs cosine near-dup oracle (a < b, cos ≥ 0.4) for
    * the exact q26 baseline (τ=0.4 is deliberately NOT served by an
    * LSH query — see Curation.q48EmbedNearDupLsh). */
  /** The q137/q138 BM25 oracle: the same inverted-file derivation in
    * SQL. All literal arithmetic mirrors the Scala side op for op —
    * (1.2 + 1.0) stays a SUM of parsed literals (its double differs
    * from a parsed 2.2 in the last ulp), avgdl is the same single
    * division, and every per-term contribution is +,−,×,÷ in double
    * (correctly rounded ⇒ bit-identical) cast to DECIMAL(28,12) and
    * summed order-independently. Corpus stats count token-bearing
    * docs (the postings-derived law). */
  /** The BM25 oracle over a corpus CTE: rational odds weight ×
    * tf-saturation, decimal accumulation, top-10 per query (queries =
    * the first five corpus-law tokens of the corpus's docs 0–4).
    * `corpusSel` selects (doc_id, text) — the full table for
    * q137/q138/q139/q154, the post-delete remainder for q161. */
  private def bm25SqlOver(corpusSel: String): String =
    s"""WITH docs AS ($corpusSel),
      | tok AS (SELECT doc_id,
      |   unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
      |     x -> len(x) > 0)) AS term FROM docs),
      | tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
      | dl AS (SELECT doc_id, count(*) AS len FROM tok GROUP BY 1),
      | stats AS (SELECT count(*) AS n, sum(len) AS sl FROM dl),
      | dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      | q AS (SELECT doc_id AS query_id,
      |   unnest(list_distinct(list_slice(
      |     list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
      |       x -> len(x) > 0), 1, 5))) AS term
      |  FROM docs WHERE doc_id < 5),
      | c AS (SELECT q.query_id, tf.doc_id,
      |   CAST(((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
      |          / (CAST(df AS DOUBLE) + 0.5))
      |     * ((CAST(tf AS DOUBLE) * (1.2 + 1.0))
      |          / (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75)
      |             + 0.75 * (CAST(len AS DOUBLE)
      |                 / (CAST(sl AS DOUBLE) / CAST(n AS DOUBLE))))))
      |     AS DECIMAL(28,12)) AS c
      |  FROM q JOIN dfs USING (term) JOIN tf USING (term)
      |       JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats),
      | s AS (SELECT query_id, doc_id, CAST(sum(c) AS DECIMAL(38,12)) AS s
      |  FROM c GROUP BY 1, 2),
      | r AS (SELECT query_id, doc_id, s,
      |   row_number() OVER (PARTITION BY query_id
      |     ORDER BY s DESC, doc_id) AS rank FROM s)
      |SELECT query_id, doc_id, round(CAST(s AS DOUBLE), 6) AS score, rank
      |FROM r WHERE rank <= 10 ORDER BY 1, 4""".stripMargin

  private val bm25Sql: String =
    bm25SqlOver("SELECT doc_id, text FROM documents")

  /** q161 oracle: the SAME BM25 law over the corpus minus the deleted
    * quarter — the ground truth a tombstone-deleted inverted file
    * must reproduce, df corrections and all. */
  private val bm25DeleteSql: String =
    bm25SqlOver(
      "SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 1")

  /** The q143–q145 BPE oracle CTE chain: the corpus word table under
    * the shared token law, then [[graft.operators.Curation.Q143Merges]]
    * unrolled merge-selection steps (the q140 iteration precedent) —
    * each step a pair-count aggregation, a (n desc, x, y) argmax, and
    * a literal double-space replace (see [[graft.operators.Bpe]] for
    * why the representation makes replace() exactly greedy BPE in
    * both engines). Pure string/integer ops throughout. */
  private def bpeCtes(k: Int): String = {
    // every v_i is referenced TWICE (next step's pair counts + next
    // replace); DuckDB inlines plain CTEs, so without MATERIALIZED
    // the expansion doubles per step — 2^k plans, minutes at k=12
    // (measured; the Catalyst round-10 lesson, DuckDB edition).
    // MATERIALIZED pins each state to one evaluation: 0.2 s.
    val sb = new StringBuilder
    sb ++= "WITH v0 AS MATERIALIZED (SELECT w, cnt,\n" +
      "  ' ' || array_to_string(string_split(w, ''), '  ') || ' ' AS seq\n" +
      " FROM (SELECT t AS w, count(*) AS cnt FROM (\n" +
      "   SELECT unnest(list_filter(regexp_split_to_array(lower(text)," +
      " '[^a-z0-9]+'),\n" +
      "     x -> len(x) > 0)) AS t FROM documents) GROUP BY 1))"
    for (i <- 1 to k) {
      sb ++= s""",
 p$i AS (SELECT cnt, list_extract(t, CAST(j AS INT)) AS x,
   list_extract(t, CAST(j AS INT) + 1) AS y
  FROM (SELECT cnt, string_split(trim(seq), '  ') AS t FROM v${i - 1}) tt
  CROSS JOIN LATERAL unnest(range(1, len(t))) AS r(j)),
 m$i AS (SELECT x, y FROM (
   SELECT x, y, sum(cnt) AS n FROM p$i GROUP BY 1, 2)
  ORDER BY n DESC, x ASC, y ASC LIMIT 1),
 v$i AS MATERIALIZED (SELECT w, cnt,
   replace(seq, ' ' || m.x || '  ' || m.y || ' ',
     ' ' || m.x || m.y || ' ') AS seq
  FROM v${i - 1}, m$i m)"""
    }
    sb.toString
  }

  /** The shared q144/q145 tail: per-word BPE token counts from the
    * final vocab state, joined back onto every doc's word multiset
    * (zero-token docs count 0). */
  private def bpeDocCountCtes(k: Int): String =
    s""",
 wt AS (SELECT w, CAST(len(string_split(trim(seq), '  ')) AS BIGINT) AS n_tok
  FROM v$k),
 dw AS (SELECT doc_id, unnest(list_filter(
   regexp_split_to_array(lower(text), '[^a-z0-9]+'),
   x -> len(x) > 0)) AS w FROM documents),
 dc AS (SELECT dw.doc_id, sum(wt.n_tok) AS bt
  FROM dw JOIN wt USING (w) GROUP BY 1)"""

  private def bpeMergesSql: String = {
    val k = graft.operators.Curation.Q143Merges
    bpeCtes(k) + "\nSELECT step, x, y FROM (" +
      (1 to k).map(i =>
        s"SELECT CAST($i AS INT) AS step, x, y FROM m$i")
        .mkString(" UNION ALL ") +
      ") ORDER BY step"
  }

  private def bpeTokenCountsSql: String = {
    val k = graft.operators.Curation.Q143Merges
    bpeCtes(k) + bpeDocCountCtes(k) +
      """
SELECT d.doc_id, CAST(coalesce(dc.bt, 0) AS BIGINT) AS bpe_tokens
FROM documents d LEFT JOIN dc ON dc.doc_id = d.doc_id
ORDER BY 1"""
  }

  private def bpePackingSql: String = {
    val k = graft.operators.Curation.Q143Merges
    val budget = graft.operators.Curation.Q75PackBudget
    bpeCtes(k) + bpeDocCountCtes(k) +
      s""",
 t AS (SELECT d.doc_id, d.source, CAST(coalesce(dc.bt, 0) AS INT) AS n_tokens
  FROM documents d LEFT JOIN dc ON dc.doc_id = d.doc_id),
 c AS (SELECT *, sum(n_tokens) OVER (
   PARTITION BY source ORDER BY doc_id) AS endc FROM t)
SELECT doc_id, source, n_tokens,
 CAST(floor(CAST(endc - n_tokens AS DOUBLE) / $budget) AS INT) AS pack_id,
 CAST((endc - n_tokens) % $budget AS INT) AS pack_offset
FROM c ORDER BY 1"""
  }

  /** The q146 dangling-mass PageRank oracle: q140's unrolled CTE
    * pairs plus, per round, a ONE-ROW dangling-share CTE
    * (Σ r over the dangling set, floor-divided by n) folded into the
    * damped update exactly as
    * [[graft.operators.LinkGraph.pageRankFixedDangling]] computes it.
    * Edge law: docs ≡ 4 (mod 5) emit no links. */
  private val pageRankDanglingSql: String = {
    val iters = (1 to 5).map { k =>
      s""" dg$k AS (SELECT coalesce((SELECT sum(r.r)
         |    FROM r${k - 1} r JOIN dang USING (id)), 0)
         |   // (SELECT n FROM nn) AS share),
         | c$k AS (SELECT e.dst AS id, sum(r.r // e.od) AS cs
         |  FROM r${k - 1} r JOIN edges e ON r.id = e.src GROUP BY 1),
         | r$k AS (SELECT nodes.id,
         |   ((1000000000000 // n) * 150) // 1000
         |     + (850 * (coalesce(c$k.cs, 0) + dg$k.share)) // 1000 AS r
         |  FROM nodes CROSS JOIN nn CROSS JOIN dg$k
         |   LEFT JOIN c$k ON nodes.id = c$k.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH nn AS (SELECT count(*) AS n FROM documents),
       | nodes AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
       | edges0 AS (SELECT CAST(doc_id AS BIGINT) AS src,
       |   unnest([ (CAST(doc_id AS BIGINT) * 31 + 7) % n,
       |            (CAST(doc_id AS BIGINT) * 17 + 3) % n,
       |            (CAST(doc_id AS BIGINT) * 13 + 11) % n ]) AS dst
       |  FROM documents CROSS JOIN nn WHERE doc_id % 5 <> 4),
       | outdeg AS (SELECT src, count(*) AS od FROM edges0 GROUP BY 1),
       | edges AS (SELECT e.src, e.dst, o.od
       |  FROM edges0 e JOIN outdeg o USING (src)),
       | dang AS (SELECT id FROM nodes
       |  WHERE id NOT IN (SELECT DISTINCT src FROM edges0)),
       | r0 AS (SELECT id, (1000000000000 // n) AS r
       |  FROM nodes CROSS JOIN nn),
       |$iters
       |SELECT id AS doc_id, CAST(r AS BIGINT) AS pr
       |FROM r5 ORDER BY 1""".stripMargin
  }

  /** The q140 PageRank oracle: the same fixed-point iteration
    * unrolled as CTE pairs (contributions, ranks) — ALL integer
    * arithmetic (// is DuckDB floor division ≡ Spark's `div` on the
    * positive values here), so ranks are engine-exact; division
    * order mirrors LinkGraph.pageRankFixed token for token. */
  private val pageRankSql: String = {
    val iters = (1 to 5).map { k =>
      s""" c$k AS (SELECT e.dst AS id, sum(r.r // e.od) AS cs
         |  FROM r${k - 1} r JOIN edges e ON r.id = e.src GROUP BY 1),
         | r$k AS (SELECT nodes.id,
         |   ((1000000000000 // n) * 150) // 1000
         |     + (850 * coalesce(c$k.cs, 0)) // 1000 AS r
         |  FROM nodes CROSS JOIN nn LEFT JOIN c$k ON nodes.id = c$k.id)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH nn AS (SELECT count(*) AS n FROM documents),
       | nodes AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
       | edges0 AS (SELECT CAST(doc_id AS BIGINT) AS src,
       |   unnest([ (CAST(doc_id AS BIGINT) * 31 + 7) % n,
       |            (CAST(doc_id AS BIGINT) * 17 + 3) % n,
       |            (CAST(doc_id AS BIGINT) * 13 + 11) % n ]) AS dst
       |  FROM documents CROSS JOIN nn),
       | outdeg AS (SELECT src, count(*) AS od FROM edges0 GROUP BY 1),
       | edges AS (SELECT e.src, e.dst, o.od
       |  FROM edges0 e JOIN outdeg o USING (src)),
       | r0 AS (SELECT id, (1000000000000 // n) AS r
       |  FROM nodes CROSS JOIN nn),
       |$iters
       |SELECT id AS doc_id, CAST(r AS BIGINT) AS pr
       |FROM r5 ORDER BY 1""".stripMargin
  }

  /** q149 HITS oracle: four unrolled mutual-reinforcement rounds in
    * pure integer arithmetic — raw half-step tables MATERIALIZED
    * because each feeds both its normalization scalar and the
    * rescale (plain CTEs would inline exponentially). */
  private val hitsSql: String = {
    val m = 1000000000L
    val iters = (1 to 4).map { k =>
      s""" ar$k AS MATERIALIZED (SELECT e.dst AS id, sum(h.h) AS cs
         |  FROM h${k - 1} h JOIN edges e ON h.id = e.src GROUP BY 1),
         | sa$k AS (SELECT sum(cs) AS s FROM ar$k),
         | a$k AS MATERIALIZED (SELECT nodes.id,
         |   (coalesce(ar$k.cs, 0) * $m) // sa$k.s AS a
         |  FROM nodes CROSS JOIN sa$k LEFT JOIN ar$k ON nodes.id = ar$k.id),
         | hr$k AS MATERIALIZED (SELECT e.src AS id, sum(a.a) AS cs
         |  FROM a$k a JOIN edges e ON a.id = e.dst GROUP BY 1),
         | sh$k AS (SELECT sum(cs) AS s FROM hr$k),
         | h$k AS MATERIALIZED (SELECT nodes.id,
         |   (coalesce(hr$k.cs, 0) * $m) // sh$k.s AS h
         |  FROM nodes CROSS JOIN sh$k LEFT JOIN hr$k ON nodes.id = hr$k.id)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH nn AS (SELECT count(*) AS n FROM documents),
       | nodes AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
       | edges AS (
       |  SELECT DISTINCT src, dst FROM (
       |   SELECT CAST(doc_id AS BIGINT) AS src,
       |     (CAST(doc_id AS BIGINT) * 31 + 7) % n AS dst
       |    FROM documents CROSS JOIN nn WHERE doc_id % 4 > 0
       |   UNION ALL
       |   SELECT CAST(doc_id AS BIGINT) AS src,
       |     (CAST(doc_id AS BIGINT) * 17 + 3) % n AS dst
       |    FROM documents CROSS JOIN nn WHERE doc_id % 4 > 1
       |   UNION ALL
       |   SELECT CAST(doc_id AS BIGINT) AS src,
       |     (CAST(doc_id AS BIGINT) * 13 + 11) % n AS dst
       |    FROM documents CROSS JOIN nn WHERE doc_id % 4 > 2)),
       | h0 AS (SELECT id, ($m // n) AS h FROM nodes CROSS JOIN nn),
       |$iters
       |SELECT a4.id AS doc_id, CAST(a4.a AS BIGINT) AS auth,
       | CAST(h4.h AS BIGINT) AS hub
       |FROM a4 JOIN h4 ON a4.id = h4.id ORDER BY 1""".stripMargin
  }

  /** q150/q157 oracle: the exact token top-k (count desc, token asc)
    * plus constant-true CMS-law flags — shared by the in-plan sketch
    * pass and the stored merged-artifact serve (merged ≡ rebuilt is
    * byte-exact, so both answer the same SQL). */
  private val heavyHittersSql: String =
    s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
      | cnt AS (SELECT t, count(*) AS cnt FROM tok GROUP BY 1),
      | ranked AS (SELECT t, CAST(cnt AS BIGINT) AS cnt,
      |   CAST(row_number() OVER (ORDER BY cnt DESC, t) AS INT) AS rank
      |  FROM cnt)
      |SELECT t, cnt, rank, 1 AS est_ok FROM ranked
      |WHERE rank <= ${graft.operators.Curation.Q150TopK}
      |ORDER BY rank""".stripMargin

  /** Shared duplicated-substring span pipeline: `corpusCte` must
    * define a CTE named `corpus` with (doc_id, text[, carried
    * columns]); `carry`/`carryP` thread extra columns (e.g.
    * ", source" / ", p.source") through to the final `bnd` table;
    * `tail` is the final SELECT over `bnd` (columns: doc_id + carry,
    * pos, tok, cv covered flag, nb span-boundary flag). One
    * definition of the window/digest/coverage law serves every
    * substring-family oracle. */
  private def substringSpanPipelineSql(corpusCte: String,
      carry: String, carryP: String, tail: String): String = {
    val L = graft.operators.Curation.Q147SpanLen
    s"""WITH $corpusCte,
      | toks AS (SELECT doc_id$carry, string_split(text, ' ') AS w FROM corpus),
      | pos AS (SELECT doc_id$carry, w, CAST(i AS INT) AS pos,
      |   list_extract(w, CAST(i AS INT)) AS tok, len(w) AS n
      |  FROM toks CROSS JOIN LATERAL unnest(range(1, len(w)+1)) AS t(i)),
      | starts AS (SELECT doc_id, pos,
      |   md5(array_to_string(w[pos:pos+${L - 1}], ' ')) AS d
      |  FROM pos WHERE pos <= n - $L + 1),
      | occ AS (SELECT d FROM starts GROUP BY d HAVING count(*) > 1),
      | dups AS (SELECT starts.doc_id, starts.pos, 1 AS dst
      |  FROM starts JOIN occ USING (d)),
      | flagged AS (SELECT p.doc_id$carryP, p.pos, p.tok, coalesce(s.dst, 0) AS dst
      |  FROM pos p LEFT JOIN dups s ON p.doc_id = s.doc_id AND p.pos = s.pos),
      | cov AS (SELECT doc_id$carry, pos, tok, dst,
      |   max(dst) OVER (PARTITION BY doc_id ORDER BY pos
      |     ROWS BETWEEN ${L - 1} PRECEDING AND CURRENT ROW) AS cv
      |  FROM flagged),
      | bnd AS (SELECT *, CASE WHEN cv = 1 AND
      |    coalesce(lag(cv) OVER (PARTITION BY doc_id ORDER BY pos), 0) = 0
      |   THEN 1 ELSE 0 END AS nb FROM cov)
      |$tail""".stripMargin
  }

  /** The spliced derived corpus (prefix-L + unique marker + suffix-L
    * twins at +Q147SpliceOffset ids) as CTEs ending in `corpus0` —
    * shared by every substring-family oracle over the spliced corpus
    * (q147/q151/q158 full, q160 post-delete subset). */
  private def splicedCorpusCtes: String = {
    val L = graft.operators.Curation.Q147SpanLen
    val off = graft.operators.Curation.Q147SpliceOffset
    s"""spl AS (SELECT doc_id + $off AS doc_id,
      |   array_to_string(w[1:$L], ' ') || ' uq' || CAST(doc_id AS VARCHAR) || ' ' ||
      |   array_to_string(w[len(w)-${L - 1}:len(w)], ' ') AS text
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      |  WHERE len(w) >= ${2 * L + 1}),
      | corpus0 AS (SELECT doc_id, text FROM documents UNION ALL SELECT doc_id, text FROM spl)""".stripMargin
  }

  /** The per-doc span report tail shared by the spliced-corpus
    * substring oracles. */
  private val substringSpansTail: String =
    """SELECT doc_id, CAST(count(*) AS INT) AS n_tokens,
      | CAST(sum(nb) AS INT) AS n_dup_spans,
      | CAST(sum(cv) AS INT) AS dup_tokens,
      | CAST(count(*) - sum(cv) AS INT) AS kept_tokens,
      | md5(coalesce(string_agg(tok, ' ' ORDER BY pos) FILTER (WHERE cv = 0), '')) AS kept_digest,
      | round(CAST(sum(cv) AS DOUBLE) / count(*), 6) AS dup_frac
      |FROM bnd GROUP BY 1 ORDER BY 1""".stripMargin

  /** q147/q151/q158 oracle: exact duplicated-substring spans over the
    * spliced corpus — overlapping L-token window digests, global df,
    * gaps-and-islands interval merging, cleaned-text digest. q151/
    * q158 serve the identical law from the stored segment index, so
    * all sit under this one SQL. */
  private val substringSpansSql: String =
    substringSpanPipelineSql(
      splicedCorpusCtes +
        ",\n corpus AS (SELECT doc_id, text FROM corpus0)",
      carry = "", carryP = "", tail = substringSpansTail)

  /** q160 oracle: the SAME span law over the corpus MINUS the deleted
    * quarter (doc_id ≡ 1 mod 4) — the ground truth a tombstone-
    * deleted index must reproduce exactly (delete ≡ rebuild-without
    * is a signed-multiset identity). */
  private val substringDeleteSql: String =
    substringSpanPipelineSql(
      splicedCorpusCtes +
        ",\n corpus AS (SELECT doc_id, text FROM corpus0 WHERE doc_id % 4 <> 1)",
      carry = "", carryP = "", tail = substringSpansTail)

  /** q152 oracle: the same span pipeline over the RAW corpus, rolled
    * up to the per-source token budget. */
  private val substringEffectiveSql: String =
    substringSpanPipelineSql(
      "corpus AS (SELECT doc_id, source, text FROM documents)",
      carry = ", source", carryP = ", p.source",
      tail = """SELECT source, CAST(count(*) AS BIGINT) AS gross_tokens,
        | CAST(sum(cv) AS BIGINT) AS dup_tokens,
        | CAST(count(*) - sum(cv) AS BIGINT) AS kept_tokens,
        | round(CAST(count(*) - sum(cv) AS DOUBLE) / count(*), 6) AS kept_frac
        |FROM bnd GROUP BY 1 ORDER BY 1""".stripMargin)

  /** q153 oracle: q140's unrolled integer PageRank arithmetic over
    * the q149 variable-out-degree edge law (UNION ALL — multi-edges
    * kept, mirroring the Spark side), gated at the uniform prior and
    * grouped by source. The edge table feeds outdeg and all five
    * contribution rounds — MATERIALIZED against re-inlining. */
  private val linkQualityGateSql: String = {
    val iters = (1 to 5).map { k =>
      s""" c$k AS (SELECT e.dst AS id, sum(r.r // e.od) AS cs
         |  FROM r${k - 1} r JOIN edges e ON r.id = e.src GROUP BY 1),
         | r$k AS (SELECT nodes.id,
         |   ((1000000000000 // n) * 150) // 1000
         |     + (850 * coalesce(c$k.cs, 0)) // 1000 AS r
         |  FROM nodes CROSS JOIN nn LEFT JOIN c$k ON nodes.id = c$k.id)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH nn AS (SELECT count(*) AS n FROM documents),
       | nodes AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
       | degs AS (SELECT doc_id,
       |   (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) % 3 AS degm
       |  FROM documents),
       | edges0 AS MATERIALIZED (
       |  SELECT CAST(doc_id AS BIGINT) AS src,
       |    (CAST(doc_id AS BIGINT) * 31 + 7) % n AS dst
       |   FROM degs CROSS JOIN nn WHERE degm >= 0
       |  UNION ALL
       |  SELECT CAST(doc_id AS BIGINT) AS src,
       |    (CAST(doc_id AS BIGINT) * 17 + 3) % n AS dst
       |   FROM degs CROSS JOIN nn WHERE degm >= 1
       |  UNION ALL
       |  SELECT CAST(doc_id AS BIGINT) AS src,
       |    (CAST(doc_id AS BIGINT) * 13 + 11) % n AS dst
       |   FROM degs CROSS JOIN nn WHERE degm >= 2),
       | outdeg AS (SELECT src, count(*) AS od FROM edges0 GROUP BY 1),
       | edges AS MATERIALIZED (SELECT e.src, e.dst, o.od
       |  FROM edges0 e JOIN outdeg o USING (src)),
       | r0 AS (SELECT id, (1000000000000 // n) AS r
       |  FROM nodes CROSS JOIN nn),
       |$iters
       |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       | CAST(sum(CASE WHEN r5.r > (1000000000000 // n) THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       | round(CAST(sum(CASE WHEN r5.r > (1000000000000 // n) THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS kept_frac
       |FROM r5 JOIN documents d ON r5.id = d.doc_id CROSS JOIN nn
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q159 oracle: personalized PageRank — q153's content-hash degree
    * edge law, five unrolled integer rounds where the teleport term
    * lands ONLY on the seed domain's documents (min source), mirrored
    * token for token against
    * [[graft.operators.LinkGraph.pageRankFixedPersonalized]]. */
  private val personalizedPageRankSql: String = {
    val iters = (1 to 5).map { k =>
      s""" c$k AS (SELECT e.dst AS id, sum(r.r // e.od) AS cs
         |  FROM r${k - 1} r JOIN edges e ON r.id = e.src GROUP BY 1),
         | r$k AS (SELECT nodes.id,
         |   (CASE WHEN seeds.id IS NOT NULL
         |     THEN ((1000000000000 // s) * 150) // 1000 ELSE 0 END)
         |     + (850 * coalesce(c$k.cs, 0)) // 1000 AS r
         |  FROM nodes CROSS JOIN ns
         |   LEFT JOIN seeds ON nodes.id = seeds.id
         |   LEFT JOIN c$k ON nodes.id = c$k.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH nn AS (SELECT count(*) AS n FROM documents),
       | nodes AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
       | seeds AS MATERIALIZED (SELECT CAST(doc_id AS BIGINT) AS id
       |  FROM documents
       |  WHERE source = (SELECT min(source) FROM documents)),
       | ns AS (SELECT count(*) AS s FROM seeds),
       | degs AS (SELECT doc_id,
       |   (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) % 3 AS degm
       |  FROM documents),
       | edges0 AS MATERIALIZED (
       |  SELECT CAST(doc_id AS BIGINT) AS src,
       |    (CAST(doc_id AS BIGINT) * 31 + 7) % n AS dst
       |   FROM degs CROSS JOIN nn WHERE degm >= 0
       |  UNION ALL
       |  SELECT CAST(doc_id AS BIGINT) AS src,
       |    (CAST(doc_id AS BIGINT) * 17 + 3) % n AS dst
       |   FROM degs CROSS JOIN nn WHERE degm >= 1
       |  UNION ALL
       |  SELECT CAST(doc_id AS BIGINT) AS src,
       |    (CAST(doc_id AS BIGINT) * 13 + 11) % n AS dst
       |   FROM degs CROSS JOIN nn WHERE degm >= 2),
       | outdeg AS (SELECT src, count(*) AS od FROM edges0 GROUP BY 1),
       | edges AS MATERIALIZED (SELECT e.src, e.dst, o.od
       |  FROM edges0 e JOIN outdeg o USING (src)),
       | r0 AS (SELECT nodes.id,
       |   CASE WHEN seeds.id IS NOT NULL THEN (1000000000000 // s)
       |    ELSE 0 END AS r
       |  FROM nodes CROSS JOIN ns LEFT JOIN seeds ON nodes.id = seeds.id),
       |$iters
       |SELECT id AS doc_id, CAST(r AS BIGINT) AS ppr
       |FROM r5 ORDER BY 1""".stripMargin
  }

  private val nearDupSql: String =
    """WITH e1 AS (SELECT vec_id AS a, embedding AS av FROM embeddings),
      | e2 AS (SELECT vec_id AS b, embedding AS bv FROM embeddings),
      | flat AS (SELECT a, b, unnest(av) AS x, unnest(bv) AS y FROM e1 JOIN e2 ON a < b),
      | dots AS (SELECT a, b,
      |   sum(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(28,12))) AS dot,
      |   sum(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12))) AS na,
      |   sum(CAST(CAST(y AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(28,12))) AS nb
      |  FROM flat GROUP BY 1,2)
      |SELECT a, b, round(CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6) AS cos
      |FROM dots
      |WHERE round(CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6) >= 0.4
      |ORDER BY 1, 2""".stripMargin

  /** q74's blocklist alternation, shared by the Spark entry and the
    * oracle so the two regexes cannot drift. */
  private def q74BlockSql: String =
    Redaction.blocklistPattern(Curation.Q74Blocklist)

  /** q62/q116 oracle: exact cross-side trigram Jaccard at τ = 0.8
    * over the md5 incoming/existing split. */
  private val incrementalDedupSql: String =
    s"""WITH sides AS (SELECT doc_id, text,
      |   CASE WHEN substr(md5(text), 1, 1) >= '${graft.operators.Curation.Q62IncomingHex}' THEN 1 ELSE 0 END AS incoming
      |  FROM documents),
      | toks AS (SELECT doc_id, incoming, string_split(text, ' ') AS w FROM sides),
      | grams AS (SELECT DISTINCT doc_id, incoming,
      |   list_extract(w, CAST(i AS INT)) || ' ' || list_extract(w, CAST(i AS INT)+1) || ' ' || list_extract(w, CAST(i AS INT)+2) AS g
      |  FROM toks CROSS JOIN LATERAL unnest(range(1, len(w)-1)) AS t(i)),
      | sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
      | inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
      |  FROM grams x JOIN grams y ON x.g = y.g
      |   AND x.incoming = 0 AND y.incoming = 1
      |  GROUP BY 1,2)
      |SELECT i.a AS existing_id, i.b AS incoming_id,
      | round(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6) AS jaccard
      |FROM inter i JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
      |WHERE round(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6) >= 0.8
      |ORDER BY 1, 2""".stripMargin

  /** Exact-KNN oracle: cosine top-`maxRank` per query vector, exact
    * decimal dot/norm accumulation mirroring [[Similarity.cosine]]. */
  private def knnSql(maxRank: Int): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
       | c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
       | flat AS (SELECT query_id, neighbor_id, unnest(qv) AS x, unnest(cv) AS y
       |   FROM q JOIN c ON query_id <> neighbor_id),
       | dots AS (SELECT query_id, neighbor_id,
       |   sum(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(28,12))) AS dot,
       |   sum(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12))) AS na,
       |   sum(CAST(CAST(y AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(28,12))) AS nb
       |  FROM flat GROUP BY 1,2),
       | scored AS (SELECT query_id, neighbor_id,
       |   round(CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6) AS cos
       |  FROM dots),
       | ranked AS (SELECT query_id, neighbor_id, cos,
       |   CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= $maxRank
       |ORDER BY 1, 4""".stripMargin

  /** [[knnSql]] over the corpus MINUS the ANN delete gates' quarter
    * (vec_id ≡ 1 mod 4, sparing the query ids — mirrors
    * Curation.annDeleteBatch): the rebuild-without ground truth a
    * tombstone-deleted vector index must serve exactly. */
  private def knnDeleteSql(maxRank: Int): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
       | c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings
       |   WHERE NOT (vec_id % 4 = 1 AND vec_id >= 10)),
       | flat AS (SELECT query_id, neighbor_id, unnest(qv) AS x, unnest(cv) AS y
       |   FROM q JOIN c ON query_id <> neighbor_id),
       | dots AS (SELECT query_id, neighbor_id,
       |   sum(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(28,12))) AS dot,
       |   sum(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12))) AS na,
       |   sum(CAST(CAST(y AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(28,12))) AS nb
       |  FROM flat GROUP BY 1,2),
       | scored AS (SELECT query_id, neighbor_id,
       |   round(CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6) AS cos
       |  FROM dots),
       | ranked AS (SELECT query_id, neighbor_id, cos,
       |   CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= $maxRank
       |ORDER BY 1, 4""".stripMargin

  /** Exact KNN over the clustered augmented corpus (mirrors
    * Curation.clusteredEmbeddings: ids +1M/+2M/+3M, dimension j
    * zeroed). */
  private def knnAugSql(maxRank: Int): String =
    s"""WITH aug AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL SELECT vec_id + 1000000, [CAST(0 AS FLOAT)] || embedding[2:] FROM embeddings
       |  UNION ALL SELECT vec_id + 2000000, embedding[:1] || [CAST(0 AS FLOAT)] || embedding[3:] FROM embeddings
       |  UNION ALL SELECT vec_id + 3000000, embedding[:2] || [CAST(0 AS FLOAT)] || embedding[4:] FROM embeddings),
       | q AS (SELECT vec_id AS query_id, embedding AS qv FROM aug WHERE vec_id < 10),
       | c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM aug),
       | flat AS (SELECT query_id, neighbor_id, unnest(qv) AS x, unnest(cv) AS y
       |   FROM q JOIN c ON query_id <> neighbor_id),
       | dots AS (SELECT query_id, neighbor_id,
       |   sum(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(28,12))) AS dot,
       |   sum(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12))) AS na,
       |   sum(CAST(CAST(y AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(28,12))) AS nb
       |  FROM flat GROUP BY 1,2),
       | scored AS (SELECT query_id, neighbor_id,
       |   round(CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6) AS cos
       |  FROM dots),
       | ranked AS (SELECT query_id, neighbor_id, cos,
       |   CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= $maxRank
       |ORDER BY 1, 4""".stripMargin

  /** Exact word-trigram Jaccard pairs ≥ 0.8 — the oracle for the
    * n-gram dedup AND for MinHash-LSH (32 bands × 4 rows makes LSH
    * candidate recall ≈ 1 at τ=0.8, and the exact-Jaccard verification
    * filter makes precision exact, so both agree). `maxDf` mirrors the
    * engine's stop-shingle cap: grams in more than `maxDf` docs are
    * dropped BEFORE sizes/intersections, matching the kept-gram
    * Jaccard semantics of `TextDedup.explodedShingles`. */
  private def ngramJaccardSql(maxDf: Option[Long],
      extraCols: String = ""): String = {
    val keep = maxDf.map(n =>
      s"""| kept AS (SELECT g FROM grams0 GROUP BY g HAVING count(*) <= $n),
          | grams AS (SELECT grams0.doc_id, grams0.g FROM grams0 JOIN kept USING (g)),"""
        .stripMargin)
      .getOrElse("| grams AS (SELECT * FROM grams0),")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       | grams0 AS (SELECT DISTINCT doc_id,
       |   list_extract(w, CAST(i AS INT)) || ' ' || list_extract(w, CAST(i AS INT)+1) || ' ' || list_extract(w, CAST(i AS INT)+2) AS g
       |  FROM toks CROSS JOIN LATERAL unnest(range(1, len(w)-1)) AS t(i)),
       $keep
       | sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
       | inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
       |  FROM grams x JOIN grams y ON x.g = y.g AND x.doc_id < y.doc_id GROUP BY 1,2)
       |SELECT i.a, i.b,
       | round(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6) AS jaccard$extraCols
       |FROM inter i JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
       |WHERE round(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6) >= 0.8
       |ORDER BY 1, 2""".stripMargin
  }

  /** SQL occurrence count of a literal marker via the replace-length
    * trick — mirrors [[graft.operators.TextAnalysis.occurrences]]. */
  private def occSql(padded: String, m: String): String = {
    val esc = m.replace("'", "''")
    s"CAST((len($padded) - len(replace($padded, '$esc', ''))) / ${m.length} AS INT)"
  }

  private def langScoreSql(lang: String): String =
    graft.operators.TextAnalysis.langMarkers(lang)
      .map(occSql("p", _)).mkString("(", " + ", ")")

  private val langIdSql: String = {
    val langs = graft.operators.TextAnalysis.langMarkers.keys.toSeq.sorted
    val scoreCte = langs.map(l => s"${langScoreSql(l)} AS s_$l").mkString(", ")
    // first language (alphabetical) whose score >= all later ones —
    // identical to the strict-> fold in TextAnalysis.langId
    val cases = langs.init.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1).map(r => s"s_$l >= s_$r").mkString(" AND ")
      s"WHEN $rest THEN '$l'"
    }.mkString(" ")
    s"""WITH padded AS (SELECT doc_id, lang, ' ' || lower(text) || ' ' AS p FROM documents),
       | scores AS (SELECT doc_id, lang, $scoreCte FROM padded)
       |SELECT doc_id,
       | CASE $cases ELSE '${langs.last}' END AS pred_lang,
       | lang AS tagged_lang
       |FROM scores ORDER BY 1""".stripMargin
  }

  /** q97 oracle: the windowed quality monitor recomputed in batch SQL
    * — per (epoch-hour window × source) doc counts, token volume,
    * exact-decimal quality mean, and tagged-vs-predicted language
    * mismatches, with ts = epoch + doc_id minutes (the deterministic
    * event time the Spark entry assigns). The Spark side ran a real
    * availableNow stream in COMPLETE mode, so its final state must
    * equal this batch aggregation exactly. */
  private val streamQualityMonitorSql: String = {
    val langs = graft.operators.TextAnalysis.langMarkers.keys.toSeq.sorted
    val scoreCte = langs.map(l => s"${langScoreSql(l)} AS s_$l").mkString(", ")
    val cases = langs.init.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1).map(r => s"s_$l >= s_$r").mkString(" AND ")
      s"WHEN $rest THEN '$l'"
    }.mkString(" ")
    s"""WITH t AS (SELECT doc_id, source, lang, text, ' ' || lower(text) || ' ' AS p,
       |   list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS toks
       |  FROM documents),
       | scored AS (SELECT doc_id, source, lang, $scoreCte,
       |   CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
       |   CAST(len(toks) AS INT) AS n_toks,
       |   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |   (doc_id * 60 // 3600) * 3600 AS ws
       |  FROM t),
       | perdoc AS (SELECT source, ws, n_tokens, lang,
       |   CASE $cases ELSE '${langs.last}' END AS pred_lang,
       |   round(round(CAST(n_distinct AS DOUBLE) / n_toks, 6) * 0.4
       |     + (CASE WHEN n_toks >= 20 AND n_toks <= 200 THEN 0.3 ELSE 0.0 END)
       |     + (CASE WHEN round(CAST(s_en AS DOUBLE) / n_toks, 6) > 0.01 THEN 0.2 ELSE 0.0 END), 6) AS quality
       |  FROM scored)
       |SELECT CAST(ws AS BIGINT) AS window_start_s, source,
       | count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       | round(CAST(sum(CAST(quality AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS mean_quality,
       | CAST(sum(CASE WHEN pred_lang <> lang THEN 1 ELSE 0 END) AS BIGINT) AS lang_mismatch
       |FROM perdoc GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  private val qualitySql: String =
    s"""WITH t AS (SELECT doc_id, text, ' ' || lower(text) || ' ' AS p,
       |   list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS toks
       |  FROM documents),
       | m AS (SELECT doc_id,
       |   CAST(len(text) AS INT) AS n_chars,
       |   CAST(len(toks) AS INT) AS n_tokens,
       |   CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
       |   CAST(list_sum(list_transform(toks, x -> len(x))) AS BIGINT) AS total_len,
       |   ${langScoreSql("en")} AS stopword_hits
       |  FROM t)
       |SELECT doc_id, n_chars, n_tokens, n_distinct,
       | round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS distinct_ratio,
       | round(CAST(total_len AS DOUBLE) / n_tokens, 6) AS mean_token_len,
       | stopword_hits,
       | round(CAST(stopword_hits AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
       | round(round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) * 0.4
       |   + (CASE WHEN n_tokens >= 20 AND n_tokens <= 200 THEN 0.3 ELSE 0.0 END)
       |   + (CASE WHEN round(CAST(stopword_hits AS DOUBLE) / n_tokens, 6) > 0.01 THEN 0.2 ELSE 0.0 END), 6) AS quality
       |FROM m ORDER BY 1""".stripMargin
}
