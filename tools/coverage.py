"""Generate COVERAGE.md: SURVEY.md §2B target surface -> registered query
mapping, plus the full registry inventory. Fails (exit 1) if a §2B row
maps to a name the registry doesn't know — keeping the doc honest.

Usage: python tools/coverage.py > COVERAGE.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import us_stock_data_pipeline_spark  # noqa: F401
from us_stock_data_pipeline_spark import registry

# SURVEY.md §2B row -> implementing queries (registry names).
SECTION_2B = [
    ("scan: parquet all tables", ["q1_pricing_summary", "etl_reference_pipeline"]),
    ("scan: JSON / CSV / ORC landing zones", ["source_json_scan", "source_csv_scan", "source_orc_scan"]),
    ("sink: partitioned write + idempotent re-run", ["etl_idempotent_reingest"]),
    ("projection: typed rename/cast (bronze->silver)", ["etl_curated_projection"]),
    ("filter: range/conjunctive; session bucketing", ["filter_conjunctive_range", "etl_session_label"]),
    ("join: broadcast equi", ["join_broadcast_dim"]),
    ("join: shuffle/sort-merge chain", ["join_multiway_chain", "q3_shipping_priority", "q5_local_supplier_volume", "q10_returned_items"]),
    ("join: TPC-H suite (every fixture-expressible query: 1,3-8,10,12-19,22)", ["q4_order_priority", "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share", "q12_shipping_modes", "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier", "q16_parts_supplier_cnt", "q17_small_qty_revenue", "q18_large_volume_customer", "q19_disjunctive_revenue", "q22_global_sales_opportunity"]),
    ("join: left / semi / anti / full / cross", ["join_left_outer", "join_semi", "join_anti", "join_full_outer", "join_cross"]),
    ("join: range/theta non-equi", ["join_range_nonequi"]),
    ("join: as-of (stock-native; window + cogrouped-pandas twins)", ["join_asof", "join_asof_pandas"]),
    ("join: bucketed co-located (exchange-free)", ["join_bucketed_colocated"]),
    ("join: salted skew mitigation", ["join_salted_skew"]),
    ("join: null-safe equality", ["join_null_safe"]),
    ("agg: hash groupBy (Q1 shape)", ["q1_pricing_summary"]),
    ("agg: distinct / approx distinct", ["agg_distinct", "agg_approx_distinct"]),
    ("agg: rollup / cube / grouping sets", ["agg_rollup", "agg_cube", "agg_grouping_sets"]),
    ("agg: percentiles exact + approx", ["agg_percentiles"]),
    ("agg: statistical moments (stddev/var/corr/covar)", ["agg_stats_moments"]),
    ("agg: fixed-width histogram", ["agg_histogram"]),
    ("agg: filtered/conditional (FILTER clause)", ["agg_conditional_filter"]),
    ("agg: boolean (bool_and/bool_or)", ["agg_bool"]),
    ("agg: arg-max (min_by/max_by)", ["agg_minmax_by"]),
    ("agg: ordered collect to array", ["agg_collect_sorted"]),
    ("agg: ordered string concat (string_agg)", ["agg_string_concat"]),
    ("agg: hypertable multi-grain time rollup", ["rollup_time_multigrain", "bars_ohlcv_resample"]),
    ("window: ranking / top-N per group", ["window_rank_topn"]),
    ("window: analytic lag/lead", ["window_lag_lead"]),
    ("window: running / range frames", ["window_running_frame", "window_range_frame"]),
    ("window: distribution (ntile/percent_rank/cume_dist)", ["window_distribution"]),
    ("window: value functions (first/last/nth)", ["window_value_functions"]),
    ("sort / limit / global top-k", ["topk_global"]),
    ("set ops: union / intersect / except", ["set_union", "set_intersect", "set_except"]),
    ("dedup: exact distinct on keys", ["distinct_pairs", "dedup_exact"]),
    ("reshape: pivot / unpivot", ["pivot_counts", "unpivot_long"]),
    ("subqueries: scalar / correlated / IN", ["subquery_scalar", "subquery_correlated", "subquery_in"]),
    ("scalar: string batteries", ["scalar_string", "scalar_string2"]),
    ("scalar: date/time batteries", ["scalar_datetime", "scalar_datetime2"]),
    ("scalar: math", ["scalar_math"]),
    ("scalar: array + HOFs", ["scalar_array", "scalar_array2"]),
    ("scalar: map ops", ["map_ops"]),
    ("scalar: JSON extraction", ["scalar_json"]),
    ("scalar: casts / try_cast", ["scalar_cast_try"]),
    ("scalar: bitwise", ["scalar_bitwise"]),
    ("scalar: regex battery", ["scalar_regex"]),
    ("scalar: hash / encoding (md5/sha256/base64/hex/bucket)", ["scalar_hash_encode"]),
    ("reshape: lateral explode with ordinality", ["lateral_posexplode"]),
    ("timeseries: calendar gap-fill (generated scaffold)", ["timeseries_gap_fill"]),
    ("agg: median / any_value", ["agg_median_any"]),
    ("dedup: CDC latest-row-per-key snapshot", ["dedup_latest_snapshot"]),
    ("ETL: batch MERGE / upsert (full-outer coalesce)", ["etl_merge_upsert"]),
    ("agg: HLL sketch (mergeable approx distinct)", ["agg_hll_sketch"]),
    ("agg: linear-regression battery (regr_*)", ["agg_regression"]),
    ("agg: product (log-space rewrite)", ["agg_product_logspace"]),
    ("scalar: trig / transcendental battery", ["scalar_trig"]),
    ("conditional / null handling", ["conditional_null"]),
    ("ETL: incremental watermark (global + per-key)", ["etl_incremental_watermark", "etl_watermark_per_key"]),
    ("ETL: full reference pipeline parity", ["etl_reference_pipeline"]),
    ("ETL: sessionization (gaps-and-islands)", ["etl_sessionization_gaps"]),
    ("streaming: tumbling / sliding windows", ["stream_tumbling_window", "stream_sliding_window"]),
    ("streaming: session window", ["stream_session_window"]),
    ("streaming: watermark / late data", ["stream_watermarked_append"]),
    ("streaming: stateful dedup", ["stream_dedup"]),
    ("streaming: stream-stream interval join", ["stream_stream_join"]),
    ("streaming: custom state (applyInPandasWithState)", ["stream_stateful_running_totals"]),
    ("UDF surface: python udf / pandas_udf / applyInPandas", ["udf_zscore_by_group", "pandas_udf_vowel_stats"]),
    ("LLM dedup: exact hash", ["dedup_exact"]),
    ("LLM dedup: MinHash + LSH", ["dedup_minhash_lsh"]),
    ("LLM dedup: SimHash", ["dedup_simhash"]),
    ("LLM dedup: n-gram Jaccard", ["dedup_ngram_jaccard", "text_jaccard_pairs"]),
    ("LLM dedup: embedding-cosine near-dup", ["dedup_embedding_cosine"]),
    ("LLM similarity: brute-force cosine top-k", ["knn_bruteforce_cosine"]),
    ("LLM similarity: LSH-bucketed ANN", ["ann_lsh_cosine"]),
    ("LLM similarity: IVF inverted-list ANN", ["ann_ivf_cosine"]),
    ("LLM text: quality stats / token counting", ["text_stats"]),
    ("LLM text: term frequency", ["text_term_frequency"]),
    ("LLM text: language ID", ["text_language_id"]),
    ("LLM text: document fingerprint (rolling hash)", ["doc_fingerprint"]),
    ("LLM text: fuzzy edit distance (levenshtein)", ["text_edit_distance"]),
    ("stock: technical indicators over bars", ["bars_technical_indicators"]),
    ("LLM multimodal: struct column (documents x embeddings)", ["multimodal_struct"]),
    ("LLM multimodal: binary payload + metadata", ["multimodal_binary_meta"]),
    ("LLM multimodal: frame sampling (mapInPandas)", ["multimodal_frame_sample"]),
    ("LLM pipeline: composite corpus curation (filter->dedup->rollup)", ["pipeline_corpus_curation"]),
    ("LLM assembly: deterministic train/val/test split (content hash)", ["split_train_val_test"]),
    ("LLM assembly: context-window chunking with overlap", ["doc_chunking"]),
    ("LLM assembly: token-budget packing", ["pack_token_budget"]),
    ("LLM dedup: cluster resolution (connected components, pointer doubling)", ["dedup_cluster_connected"]),
    ("LLM text: TF-IDF term scoring", ["text_tfidf"]),
    ("LLM sampling: deterministic stratified hash sample", ["sample_deterministic"]),
    ("analytics: ordered funnel", ["events_funnel"]),
    ("analytics: retention cohorts", ["events_retention"]),
    ("stock: VWAP / TWAP derivation", ["bars_vwap_twap"]),
    ("analytics: rolling z-score anomaly detection", ["anomaly_rolling_zscore"]),
    ("analytics: distribution entropy", ["agg_entropy"]),
    ("stock: recursive EMA (applyInPandas kernel, recursive-CTE oracle)", ["bars_ema"]),
    ("ETL: SCD Type 2 dimension history", ["etl_scd2_dimension"]),
    ("ETL: FK conformance audit", ["etl_fk_conformance"]),
    ("ETL: column profiling (single-pass)", ["etl_profile_table"]),
    ("streaming: foreachBatch MERGE upsert sink", ["stream_foreachbatch_upsert"]),
    ("agg: Theta sketch set operations (intersect/union of distinct sets)", ["agg_theta_sketch"]),
    ("agg: KLL quantile sketch (streaming percentiles)", ["agg_kll_quantiles"]),
    ("join: pure band/range via bucket binning (no equi key)", ["join_range_banded"]),
    ("ETL: SCD2 point-in-time lookup join", ["etl_scd2_lookup"]),
    ("ETL: table diff / version reconciliation", ["etl_table_diff"]),
    ("stock: cross-series correlation matrix", ["bars_correlation_matrix"]),
    ("analytics: winsorization (group-percentile outlier capping)", ["clean_winsorize"]),
    ("LLM quality: unigram-LM cross-entropy (perplexity filter)", ["text_unigram_logprob"]),
    ("LLM quality: benchmark decontamination (8-gram overlap)", ["text_contamination_check"]),
    ("LLM quality: repetition/boilerplate ratio", ["text_repetition_ratio"]),
    ("ML: equi-depth feature binning (ntile deciles + per-bin stats)", ["feature_binning_ntile"]),
    ("analytics: cumulative uniques via first-seen compaction", ["events_cumulative_uniques"]),
    ("analytics: Markov transition matrix over event sequences", ["events_markov_transition"]),
    ("LLM pipeline: per-source corpus scorecard (dup rate + quality rollup)", ["pipeline_source_scorecard"]),
    ("LLM sampling: exact k-per-group (balanced subset builder)", ["sample_k_per_group"]),
    ("agg: median absolute deviation (robust outlier score)", ["agg_mad_robust"]),
    ("analytics: longest activity streak (calendar gaps-and-islands)", ["events_activity_streaks"]),
    ("stock: log returns + realized/annualized volatility", ["bars_volatility"]),
    ("LLM quality: language mix per source", ["corpus_language_mix"]),
    ("LLM pipeline: curation yield funnel (single-pass gates)", ["pipeline_curation_yield"]),
    ("LLM compliance: PII detection + redaction (regex codegen)", ["pii_redact"]),
    ("LLM tokenizer: BPE adjacent-pair counting kernel", ["bpe_pair_counts"]),
    ("LLM sampling: corpus mixture to target source weights", ["corpus_mixture_sample"]),
    ("LLM assembly: exact greedy first-fit packing (applyInPandas + recursive-CTE oracle)", ["pack_greedy_exact"]),
    ("join: Bloom-filter runtime semi-join pruning", ["bloom_semijoin"]),
    ("LLM serving: length-sorted inference micro-batching (padding minimization)", ["batch_padding_builder"]),
    ("analytics: heavy-hitter skew profiling (pre-join diagnostic)", ["skew_heavy_hitters"]),
    ("LLM sampling: weighted reservoir (Efraimidis-Spirakis A-ES)", ["sample_weighted_reservoir"]),
    ("agg: count-min sketch (mergeable frequency estimates)", ["agg_count_min_sketch"]),
    ("analytics: last-touch attribution (conditional running-max window)", ["events_attribution_last_touch"]),
    ("agg: exact weighted median (cumulative-weight crossing)", ["agg_weighted_median"]),
    ("LLM embedding: int8 quantization + reconstruction-error audit", ["embedding_quantize_int8"]),
    ("LLM similarity: product-quantization ANN (ADC)", ["ann_pq_adc"]),
    ("LLM assembly: curriculum difficulty staging", ["curriculum_difficulty_stages"]),
    ("graph: PageRank over trade network (iterative, shrink-then-iterate)", ["graph_pagerank_trade"]),
    ("LLM quality: logistic classifier inference as codegen expression", ["pipeline_quality_classifier"]),
    ("LLM dedup: asymmetric containment (rare-shingle blocking)", ["dedup_containment_ngram"]),
    ("analytics: A/B lift + two-proportion z-score", ["events_ab_test_lift"]),
    ("LLM quality: bigram LM scorer (order-aware perplexity)", ["text_bigram_lm"]),
    ("ETL: parquet schema evolution (mergeSchema additive columns)", ["etl_schema_evolution"]),
    ("scan: hive-partitioned landing + partition pruning", ["source_partitioned_scan"]),
    ("ETL: data-quality quarantine gate (single-pass rule bitmap)", ["etl_quarantine_validation"]),
    ("agg: exact mode with deterministic tie-break", ["agg_mode_exact"]),
    ("agg: geometric / harmonic / arithmetic means (log-space)", ["agg_pythagorean_means"]),
    ("join: forward as-of (next-event semantics)", ["join_asof_forward"]),
    ("analytics: rolling DAU/WAU stickiness (spread-then-aggregate)", ["events_rolling_dau_wau"]),
    ("agg: skewness/kurtosis from raw power sums (engine-neutral)", ["agg_higher_moments"]),
    ("analytics: Pareto concentration + Gini coefficient", ["events_pareto_gini"]),
    ("LLM text: Zipf rank-frequency fit (corpus health)", ["text_zipf_slope"]),
    ("analytics: hour-of-week seasonality + chi-square", ["events_seasonality_chisq"]),
    ("analytics: market-basket association rules (support/confidence/lift)", ["orders_market_basket"]),
    ("analytics: RFM customer segmentation (exact-cent quintiles)", ["customer_rfm_segments"]),
    ("analytics: session path analysis (ordered sequence mining)", ["events_path_analysis"]),
    ("analytics: inter-arrival distribution fit (Poisson check)", ["events_interarrival_fit"]),
    ("LLM dedup: URL canonicalization (crawl dedup ladder, step 0)", ["dedup_url_canonical"]),
    ("LLM tokenizer: vocabulary-coverage / OOV audit", ["tokenizer_vocab_coverage"]),
    ("LLM embedding: effective dimensionality (participation ratio)", ["embedding_effective_dim"]),
    ("ETL: CDC changelog apply with delete tombstones", ["etl_cdc_changelog_apply"]),
    ("LLM assembly: training-shard manifest (per-source byte budget)", ["data_shard_manifest"]),
    ("scalar: nested-struct build / withField update / leaf pruning", ["scalar_struct_ops"]),
    ("agg: full covariance/correlation matrix (joinless in-row pairs)", ["agg_covariance_matrix"]),
    ("timeseries: M4 downsampling (min/max/first/last per bin)", ["timeseries_m4_downsample"]),
    ("graph: triangle count + transitivity (canonical orientation)", ["graph_triangle_count"]),
    ("streaming: continuous OHLCV bar construction (reference core, streaming twin)", ["stream_ohlcv_bars"]),
    ("streaming: windowed trending top-k (state/rank split)", ["stream_trending_topk"]),
    ("UDF surface: Python UDTF (row->table expansion)", ["udtf_installment_expand"]),
    ("source: custom Python DataSource (parallel paged connector)", ["source_python_datasource"]),
    ("LLM multimodal: audio chunk planning (metadata-only scheduling)", ["multimodal_audio_chunk_plan"]),
    ("LLM text: RAKE keyword extraction (degree/frequency)", ["text_keyword_rake"]),
    ("LLM embedding: Matryoshka truncation recall audit", ["embedding_matryoshka_recall"]),
    ("SQL: recursive CTE hierarchy walk (WITH RECURSIVE, Spark 4)", ["sql_recursive_hierarchy"]),
    ("scalar: VARIANT semi-structured extraction (parse once, Spark 4)", ["scalar_variant_props"]),
    ("LLM assembly: SFT loss-mask spans (completion-only loss)", ["sft_loss_mask_spans"]),
    ("LLM assembly: RLHF/DPO preference pairs (rank-matched)", ["rlhf_preference_pairs"]),
    ("analytics: cohort LTV triangle (exact-cent revenue)", ["customer_ltv_cohort"]),
    ("analytics: fulfillment lead-time SLA profile", ["orders_fulfillment_leadtime"]),
    ("window: native INTERVAL range frame (burst / rate-limit detection)", ["window_interval_burst"]),
    ("join: as-of with tolerance (stale-match nullifier)", ["join_asof_tolerance"]),
    ("LLM dedup: first-seen n-gram novelty (incremental-crawl gate)", ["text_ngram_novelty"]),
    # --- round 6 ---
    ("ML: distributed k-means (Lloyd, exact integer centroids)", ["kmeans_lloyd_exact"]),
    ("LLM dedup: SemDeDup semantic dedup within k-means cells", ["dedup_semdedup"]),
    ("LLM sampling: DSIR importance weights (LM log-ratio)", ["dsir_importance_weights"]),
    ("LLM multimodal: image tile/patch planning (ViT grid)", ["multimodal_image_tile_plan"]),
    ("stock: maximum drawdown (running-peak risk metric)", ["bars_max_drawdown"]),
    ("stock: Cutler RSI-14 momentum index", ["bars_rsi_cutler"]),
    ("stats: Mann-Whitney U rank-sum test (exact midranks)", ["stats_mannwhitney_u"]),
    ("stats: Welch unequal-variance t-test", ["stats_welch_ttest"]),
    ("analytics: peak concurrent sessions (sweep-line)", ["events_concurrency_peak"]),
    ("timeseries: autocorrelation function (exact mean-free)", ["timeseries_acf"]),
    ("timeseries: CUSUM changepoint detection", ["timeseries_changepoint_cusum"]),
    ("layout: z-order clustering keys + skipping stats", ["layout_zorder_clustering"]),
    ("layout: range-partition boundary planner", ["layout_partition_planner"]),
    ("join: interval-overlap via month binning", ["join_interval_overlap"]),
    ("stats: Kolmogorov-Smirnov two-sample (exact CDF supremum)", ["stats_ks_two_sample"]),
    ("dedup: fuzzy transaction matching (neighboring-bin blocking)", ["dedup_fuzzy_transactions"]),
    ("timeseries: Holt linear-trend smoothing (recursive kernel)", ["timeseries_holt_linear"]),
    ("LLM embedding: PCA top component (exact power iteration)", ["embedding_pca_power_iteration"]),
    ("ML eval: AUC-ROC (exact rank-sum)", ["ml_auc_roc"]),
    ("ML eval: confusion matrix + precision/recall/F1", ["ml_confusion_matrix"]),
    ("ML eval: calibration / reliability bins", ["ml_calibration_bins"]),
    ("analytics: Kaplan-Meier survival with censoring", ["survival_kaplan_meier"]),
    ("stock: V-reversal pattern match (MATCH_RECOGNIZE-lite)", ["bars_pattern_vreversal"]),
    ("analytics: conversion latency (first-touch to first-buy)", ["events_conversion_latency"]),
    ("ETL: incremental aggregate-state merge (partial rollup)", ["etl_incremental_agg_merge"]),
    ("ETL: late-arriving dimension audit (backfill queue)", ["etl_late_arriving_dimension"]),
    ("stock: MACD 12/26/9 (triple coupled recursion)", ["bars_macd"]),
    ("SQL: correlated LATERAL top-N (decorrelation)", ["sql_lateral_topn"]),
    ("LLM text: boilerplate span detection (span-level dedup)", ["text_boilerplate_spans"]),
    ("LLM tokenizer: full BPE merge step (count->apply->recount)", ["bpe_merge_step"]),
    ("join: nearest as-of (bidirectional, tie backward)", ["join_asof_nearest"]),
    ("analytics: time-bounded funnel (24h step windows)", ["events_funnel_time_bounded"]),
    ("scalar: business-day arithmetic (closed form)", ["scalar_business_days"]),
    ("source: binaryFile scan (multimodal ingest manifest)", ["source_binaryfile_scan"]),
    ("source: raw-text log landing + regex parse", ["source_text_regex_parse"]),
    ("graph: link prediction (Jaccard common-neighbors)", ["graph_link_prediction_jaccard"]),
    ("analytics: bitmap activity state (bit_count retention)", ["events_activity_bitmap"]),
    ("analytics: year-over-year growth (lag-12 window)", ["orders_yoy_growth"]),
    ("analytics: recency churn flagging per segment", ["customer_churn_flag"]),
    ("analytics: revenue waterfall (cent-exact bridge)", ["lineitem_revenue_waterfall"]),
]


def main() -> int:
    all_q = registry.all_queries()
    missing = [n for _, names in SECTION_2B for n in names if n not in all_q]
    if missing:
        print(f"UNKNOWN REGISTRY NAMES: {missing}", file=sys.stderr)
        return 1
    mapped = {n for _, names in SECTION_2B for n in names}
    unmapped = sorted(set(all_q) - mapped)

    print("# COVERAGE — SURVEY.md §2B target surface -> implementation\n")
    print("Generated by `python tools/coverage.py`. Every row names its")
    print("registered queries; `oracle` marks a full DuckDB value-hash check,")
    print("`rows-only` a weaker count-only check (non-SQL-expressible ops).\n")
    print("| §2B target | queries | check |")
    print("| --- | --- | --- |")
    for row, names in SECTION_2B:
        checks = ", ".join(
            "oracle" if all_q[n].oracle else "rows-only" for n in names
        )
        print(f"| {row} | {', '.join(f'`{n}`' for n in names)} | {checks} |")
    print(f"\n**{len(all_q)} registered queries**, "
          f"{sum(1 for q in all_q.values() if q.oracle)} oracle-checked, "
          f"{sum(1 for q in all_q.values() if q.bench)} in the bench headline set.")
    if unmapped:
        print("\nRegistered but outside §2B rows (extras): "
              + ", ".join(f"`{n}`" for n in unmapped))
    return 0


if __name__ == "__main__":
    main()
