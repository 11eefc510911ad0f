package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._
import graft.streaming.StreamOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` declares one key per implemented operator (SURVEY.md §2);
  * `oracleSql` carries the DuckDB-equivalent SQL for every key that is
  * deterministically SQL-expressible (SURVEY.md §2.2 rules). Keys
  * without an oracle entry are verified by unit/property tests instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.qAggPricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_pricing"       -> Relational.qAggPricing _,
    "q_join_topk"         -> Relational.qJoinTopk _,
    "q_join_regional"     -> Relational.qJoinRegional _,
    "q_join_semi"         -> Relational.qJoinSemi _,
    "q_join_anti"         -> Relational.qJoinAnti _,
    "q_window_topk"       -> Relational.qWindowTopk _,
    "q_agg_rollup"        -> Relational.qAggRollup _,
    "q_agg_distinct"      -> Relational.qAggDistinct _,
    "q_sort_limit"        -> Relational.qSortLimit _,
    "q_events_tumbling"   -> Events.qEventsTumbling _,
    "q_events_sessionize" -> Events.qEventsSessionize _,
    "q_events_sliding"    -> Events.qEventsSliding _,
    "q_events_session_window" -> Events.qEventsSessionWindow _,
    "q_events_retention"  -> Events.qEventsRetention _,
    "q_events_session_ids" -> Events.qEventsSessionIds _,
    "q_events_funnel"     -> Events.qEventsFunnel _,
    "q_json_extract"      -> Events.qJsonExtract _,
    "q_dedup_near"        -> LlmOps.qDedupNear _,
    "q_cosine_topk"       -> LlmOps.qCosineTopk _,
    // §2.4-C join variants
    "q_join_left_outer"   -> Joins.qJoinLeftOuter _,
    "q_join_full_outer"   -> Joins.qJoinFullOuter _,
    "q_join_right_outer"  -> Joins.qJoinRightOuter _,
    "q_join_range_band"   -> Joins.qJoinRangeBand _,
    "q_join_asof"         -> Joins.qJoinAsof _,
    "q_join_smj"          -> Joins.qJoinSmj _,
    "q_subquery_scalar"   -> Joins.qSubqueryScalar _,
    "q_subquery_in"       -> Joins.qSubqueryIn _,
    "q_join_nullsafe"     -> Joins.qJoinNullsafe _,
    // §2.4-F set ops + exact dedup
    "q_set_union_all"     -> SetOps.qSetUnionAll _,
    "q_set_union"         -> SetOps.qSetUnion _,
    "q_set_intersect"     -> SetOps.qSetIntersect _,
    "q_set_except"        -> SetOps.qSetExcept _,
    "q_set_except_all"    -> SetOps.qSetExceptAll _,
    "q_set_intersect_all" -> SetOps.qSetIntersectAll _,
    "q_dedup_exact"       -> SetOps.qDedupExact _,
    "q_merge_upsert"      -> SetOps.qMergeUpsert _,
    // physical layout: partitionBy write → partition-pruned read
    "q_part_pruned"       -> Layout.qPartPruned _,
    // true Structured Streaming executions, oracle-verified (bounded
    // replay; complete-mode agg / update-mode stateful snapshots ⇒
    // deterministic final table)
    "q_stream_tumbling"   -> StreamOps.qStreamTumbling _,
    "q_stream_sessionize" -> StreamOps.qStreamSessionize _,
    // §2.4-E window functions
    "q_window_rank_family" -> Windows.qWindowRankFamily _,
    "q_window_running"     -> Windows.qWindowRunning _,
    "q_window_range_frame" -> Windows.qWindowRangeFrame _,
    "q_window_firstlast"   -> Windows.qWindowFirstLast _,
    "q_window_lag_lead"    -> Windows.qWindowLagLead _,
    // §2.4-D aggregates
    "q_agg_global"         -> Aggs.qAggGlobal _,
    "q_agg_cube"           -> Aggs.qAggCube _,
    "q_agg_grouping_sets"  -> Aggs.qAggGroupingSets _,
    "q_agg_stats"          -> Aggs.qAggStats _,
    "q_agg_percentile"     -> Aggs.qAggPercentile _,
    "q_agg_collect"        -> Aggs.qAggCollect _,
    "q_agg_pivot"          -> Aggs.qAggPivot _,
    "q_agg_cond_bool"      -> Aggs.qAggCondBool _,
    "q_agg_regr"           -> Aggs.qAggRegr _,
    "q_fn_try"             -> Functions.qFnTry _,
    "q_agg_unpivot"        -> Aggs.qAggUnpivot _,
    // §2.4-G scalar function families
    "q_fn_string"          -> Functions.qFnString _,
    "q_fn_datetime"        -> Functions.qFnDatetime _,
    "q_fn_math"            -> Functions.qFnMath _,
    "q_fn_cond"            -> Functions.qFnCond _,
    "q_fn_array"           -> Functions.qFnArray _,
    "q_fn_explode"         -> Functions.qFnExplode _,
    "q_fn_map"             -> Functions.qFnMap _,
    "q_fn_json_struct"     -> Functions.qFnJsonStruct _,
    // §2.4-H text analysis
    "q_text_wordcount"     -> TextOps.qTextWordcount _,
    "q_text_tfidf"         -> TextOps.qTextTfidf _,
    "q_text_profile"       -> TextOps.qTextProfile _,
    "q_text_tokens"        -> TextOps.qTextTokens _,
    "q_text_quality"       -> TextOps.qTextQuality _,
    "q_text_langid"        -> TextOps.qTextLangid _,
    "q_text_fingerprint"   -> TextOps.qTextFingerprint _,
    "q_text_chunk"         -> TextOps.qTextChunk _,
    "q_text_bigrams"       -> TextOps.qTextBigrams _,
    "q_text_sample"        -> TextOps.qTextSample _,
    "q_text_contamination" -> TextOps.qTextContamination _,
    "q_text_repetition"    -> TextOps.qTextRepetition _,
    "q_pii_scrub"          -> ScrubOps.qPiiScrub _,
    "q_text_normalize"     -> ScrubOps.qTextNormalize _,
    "q_scrub_boilerplate"  -> ScrubOps.qScrubBoilerplate _,
    "q_scrub_substring"    -> ScrubOps.qScrubSubstring _,
    "q_dedup_substring"    -> DedupOps.qDedupSubstring _,
    "q_quality_linear"     -> TextOps.qQualityLinear _,
    "q_quality_gopher"     -> TextOps.qQualityGopher _,
    "q_sample_stratified"  -> TextOps.qSampleStratified _,
    "q_sample_importance"  -> TextOps.qSampleImportance _,
    "q_stream_join"        -> StreamOps.qStreamJoin _,
    "q_pack_shards"        -> PipelineOps.qPackShards _,
    "q_mix_sources"        -> PipelineOps.qMixSources _,
    "q_pack_sequences"     -> PipelineOps.qPackSequences _,
    "q_sketch_cms"         -> PipelineOps.qSketchCms _,
    "q_bucket_join"        -> Layout.qBucketJoin _,
    "q_skew_salted"        -> Aggs.qSkewSalted _,
    "q_csv_roundtrip"      -> Layout.qCsvRoundtrip _,
    "q_sample_temperature" -> TextOps.qSampleTemperature _,
    "q_json_roundtrip"     -> Layout.qJsonRoundtrip _,
    // LLM-pipeline dedup (north star)
    "q_dedup_minhash"      -> DedupOps.qDedupMinhash _,
    "q_dedup_incremental"  -> DedupOps.qDedupIncremental _,
    "q_dedup_clusters"     -> DedupOps.qDedupClusters _,
    "q_dedup_simhash"      -> DedupOps.qDedupSimhash _,
    "q_dedup_ngram_jaccard" -> DedupOps.qDedupNgramJaccard _,
    "q_dedup_levenshtein"  -> DedupOps.qDedupLevenshtein _,
    "q_fn_string2"         -> Functions.qFnString2 _,
    // §2.4-J custom Expression / UDF / UDAF + vector similarity
    "q_cosine_expr"        -> VectorOps.qCosineExpr _,
    "q_cosine_udf"         -> VectorOps.qCosineUdf _,
    "q_dedup_embedding"    -> VectorOps.qDedupEmbedding _,
    "q_knn_bucketed"       -> VectorOps.qKnnBucketed _,
    "q_agg_udaf_wavg"      -> VectorOps.qAggUdafWavg _,
    "q_topk_custom"        -> VectorOps.qTopkCustom _,
    "q_emb_centroid"       -> VectorOps.qEmbCentroid _,
    "q_knn_ivf"            -> VectorOps.qKnnIvf _,
    // round-6 warehouse/curation ops
    "q_dq_audit"           -> WarehouseOps.qDqAudit _,
    "q_scd2"               -> WarehouseOps.qScd2 _,
    "q_dpp_join"           -> WarehouseOps.qDppJoin _,
    "q_interval_overlap"   -> WarehouseOps.qIntervalOverlap _,
    "q_zorder_layout"      -> WarehouseOps.qZorderLayout _,
    "q_emb_quantize"       -> VectorOps.qEmbQuantize _,
    "q_text_zipf"          -> TextOps.qTextZipf _,
    "q_orc_roundtrip"      -> Layout.qOrcRoundtrip _,
    "q_stream_sliding"     -> StreamOps.qStreamSliding _,
    "q_stream_dedup"       -> StreamOps.qStreamDedup _,
    "q_window_distinct"    -> Windows.qWindowDistinct _,
    "q_agg_histogram"      -> Aggs.qAggHistogram _,
    "q_quantile_hist"      -> WarehouseOps.qQuantileHist _,
    "q_graph_triangles"    -> WarehouseOps.qGraphTriangles _,
    "q_binary_payload"     -> graft.multimodal.MediaOps.qBinaryPayload _,
    "q_sql_interface"      -> WarehouseOps.qSqlInterface _,
    "q_knn_rerank"         -> VectorOps.qKnnRerank _,
    "q_fn_bitwise"         -> Functions.qFnBitwise _,
    // round-7 pipeline keys
    "q_fn_url"             -> Functions.qFnUrl _,
    "q_decontam_bloom"     -> TextOps.qDecontamBloom _,
    "q_text_perplexity"    -> TextOps.qTextPerplexity _,
    "q_stream_enrich"      -> StreamOps.qStreamEnrich _,
    "q_graph_pagerank"     -> WarehouseOps.qGraphPagerank _,
    "q_media_meta"         -> graft.multimodal.MediaOps.qMediaMeta _,
    "q_stream_decontam"    -> StreamOps.qStreamDecontam _,
    "q_dedup_containment"  -> DedupOps.qDedupContainment _,
    "q_dedup_url"          -> DedupOps.qDedupUrl _,
    // round-9: unsupervised IVF quantizer build
    "q_kmeans_build"       -> VectorOps.qKmeansBuild _,
    // round-10: unsupervised end-to-end IVF (kmeans cells → retrieval)
    "q_knn_ivf_kmeans"     -> VectorOps.qKnnIvfKmeans _,
    // round-11: the fine-cell multi-probe point of the same dial —
    // (64, 2, 16): same quarter-corpus scan, recall 0.47 → 0.80+
    "q_knn_ivf_mp"         -> VectorOps.qKnnIvfMp _,
    // round-10: SemDeDup — kmeans cells as semantic dedup blocking
    "q_dedup_semantic"     -> VectorOps.qDedupSemantic _,
    // round-10: BM25 retrieval scoring (zero-shuffle two-pass shape)
    "q_text_bm25"          -> TextOps.qTextBm25 _,
    // round-10: online IVF-cell assignment (stream-static model join)
    "q_stream_assign"      -> StreamOps.qStreamAssign _,
    // round-10: multi-probe SemDeDup (top-2 cell blocking, CellTopP)
    "q_dedup_semantic_mp"  -> VectorOps.qDedupSemanticMp _,
    // round-10: ingestion-time near-dup detection (stream-static LSH)
    "q_stream_neardup"     -> StreamOps.qStreamNeardup _,
    "q_stream_quality"     -> StreamOps.qStreamQuality _,
    // round-10: survivor selection (keep best copy per dup cluster)
    "q_dedup_keep"         -> DedupOps.qDedupKeep _,
    // round-13: production-geometry embedding near-dup (12×24, τ=0.85)
    "q_dedup_embedding_scaled" -> VectorOps.qDedupEmbeddingScaled _,
    // round-13: high-recall half-scan IVF point (128, 2, 64)
    "q_knn_ivf_hr"         -> VectorOps.qKnnIvfHr _,
    // round-14: the COMPOSED five-stage curation funnel as one key
    "q_pipeline_curate"    -> PipelineOps.qPipelineCurate _,
    // round-14: BPE tokenizer-pair statistics (unrolled merge rounds)
    "q_bpe_merges"         -> TextOps.qBpeMerges _,
    // round-14: apply the learned BPE vocabulary (corpus token stats)
    "q_bpe_tokenize"       -> TextOps.qBpeTokenize _,
    // round-14: product-quantization ADC retrieval (codes-only scan)
    "q_knn_pq"             -> VectorOps.qKnnPq _,
    // round-15: the PRODUCTION PQ build (sampled codebooks) and the
    // full Faiss IVF-PQ composition (coarse gate + codes-only ADC)
    "q_knn_pq_sampled"     -> VectorOps.qKnnPqSampled _,
    "q_knn_ivf_pq"         -> VectorOps.qKnnIvfPq _,
    // round-15: the complete retrieval ladder — IVF gate → PQ codes
    // → exact rerank of the bounded ADC shortlist
    "q_knn_ivf_pq_rerank"  -> VectorOps.qKnnIvfPqRerank _,
    // round-19: the measured k ∝ N recipe (gate cells scale with the
    // corpus, exact rerank consumes the whole gated set)
    "q_knn_ivf_pq_rerank_scaled" -> VectorOps.qKnnIvfPqRerankScaled _,
    // round-19: the reference's own HGT decode path (R1/R2/R4) as an
    // oracle-declared key — synthetic tiles, real DSv2 scan
    "q_hgt_points"         -> HgtOps.qHgtPoints _,
    // round-15: batched BPE — top-B symbol-disjoint merges per round
    // (lifts the greedy loop's measured ~0.55 s/round driver floor)
    "q_bpe_merges_batched" -> TextOps.qBpeMergesBatched _,
    // round-17: the production ENCODE — the learned merge table
    // applied to novel words as one rank-ordered broadcast fold
    "q_bpe_encode"         -> TextOps.qBpeEncode _,
    // round-14: the interval join under the PRODUCTION ordered feed —
    // watermark advances per batch, state plateaus (same oracle)
    "q_stream_join_ordered" -> StreamOps.qStreamJoinOrdered _
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = OracleSql.all
}
