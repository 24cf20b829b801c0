"""Query registry: every engine operator as a (Spark fn, oracle SQL) pair.

Each operator from SURVEY.md §2 registers exactly once:

- ``fn(spark, sf_dir) -> DataFrame`` — the Spark-native implementation,
- ``oracle`` — an equivalent ANSI-SQL string DuckDB runs on the same
  parquet tables (None for non-SQL-expressible ops: LSH, streaming state,
  approximate sketches — those get rows-only checks plus pytest property
  tests instead).

Column names and types are aligned on both sides (the driver's compare
sorts columns by name and hashes values), and float-derived columns are
rounded identically on both sides so double summation order can't flip
the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from us_stock_data_pipeline_spark.session import ensure_session_confs

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, Query] = {}

# The correctness driver verifies ``queries()`` in iteration order and has a
# bounded per-round budget (~50/round), so iteration order IS verification
# priority. Names listed here are emitted first, in this order; everything
# else follows in registration order.
# Round 6: front-load the round-6 additions, then the round-5 additions
# (no CORRECTNESS_r05 artifact ever landed in the repo, so the round-5
# surface still lacks official rows), then the round-4 NTZ casualties
# whose fix also never got an official green row; everything already
# green re-verifies after in registration order.
_VERIFY_PRIORITY: tuple[str, ...] = (
    # --- results CHANGED this round (stale prior rows) — verify first ---
    "embedding_bucket_balance",  # hyperplane mixer fix
    "interval_union_coverage",  # equal-start island fix
    # --- round-7 additions (newest, no official row yet) ---
    "stats_spearman_corr",
    "stats_wilson_ci",
    "agg_benford_digits",
    "agg_herfindahl_index",
    "timeseries_theil_sen",
    "orders_backlog_aging",
    "etl_freshness_sla",
    "ml_lift_deciles",
    "feature_target_encoding_loo",
    "sample_stratified_neyman",
    "quantile_normalize",
    "text_hapax_legomena",
    "corpus_ngram_saturation",
    "events_attribution_ushape",
    "embedding_centroid_distance",
    "bars_stochastic_oscillator",
    "bars_obv",
    "graph_degree_distribution",
    "timeseries_weekday_index",
    "dedup_survivor_pick",
    "corpus_length_histogram",
    "corpus_js_divergence",
    "etl_dq_rule_scorecard",
    "join_nearest_numeric_1d",
    "pivot_multi_agg",
    "etl_observe_inflight_metrics",
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q11_important_stock",
    "q20_excess_shippers",
    "q21_sole_late_shipper",
    "stream_error_rate_alert",
    "events_bot_detection",
    "forecast_eval_seasonal_naive",
    "etl_backfill_plan",
    "text_pmi_cooccurrence",
    "bars_atr",
    "agg_trimmed_mean",
    "customer_repeat_latency",
    "corpus_token_budget_forecast",
    "embedding_exact_duplicates",
    "set_ops_bag_semantics",
    "agg_grouping_id_labels",
    "agg_ratio_delta_ci",
    "events_simpson_check",
    "knn_loo_label_eval",
    "text_burstiness_dispersion",
    "lineitem_tax_reconciliation",
    "etl_surrogate_key_audit",
    "join_inline_code_table",
    "window_sliding_median",
    "etl_input_file_skew",
    "events_alert_debounce",
    "scalar_format_battery",
    "orders_whale_concentration",
    "etl_deletion_manifest",
    "agg_multi_distinct_expand",
    "subquery_null_semantics",
    "orders_fiscal_calendar_445",
    "events_error_budget_burn",
    "agg_percentile_disc_cont",
    "text_source_similarity_matrix",
    "embedding_quantization_sweep",
    "window_percent_of_parent",
    "scalar_try_arithmetic",
    "events_segment_transition",
    "stream_static_enrich_join",
    "events_double_submission",
    "events_out_of_order_ratio",
    "corpus_dedup_savings",
    "embedding_shard_plan",
    "lineitem_pvm_bridge",
    "supplier_weighted_scorecard",
    "events_growth_accounting",
    # --- round-6 additions ---
    "kmeans_lloyd_exact",
    "dedup_semdedup",
    "dsir_importance_weights",
    "multimodal_image_tile_plan",
    "bars_max_drawdown",
    "bars_rsi_cutler",
    "stats_mannwhitney_u",
    "stats_welch_ttest",
    "events_concurrency_peak",
    "timeseries_acf",
    "timeseries_changepoint_cusum",
    "layout_zorder_clustering",
    "layout_partition_planner",
    "join_interval_overlap",
    "stats_ks_two_sample",
    "dedup_fuzzy_transactions",
    "timeseries_holt_linear",
    "embedding_pca_power_iteration",
    "ml_auc_roc",
    "ml_confusion_matrix",
    "ml_calibration_bins",
    "survival_kaplan_meier",
    "bars_pattern_vreversal",
    "events_conversion_latency",
    "etl_incremental_agg_merge",
    "etl_late_arriving_dimension",
    "bars_macd",
    "sql_lateral_topn",
    "text_boilerplate_spans",
    "bpe_merge_step",
    "join_asof_nearest",
    "events_funnel_time_bounded",
    "scalar_business_days",
    "source_binaryfile_scan",
    "source_text_regex_parse",
    "graph_link_prediction_jaccard",
    "events_activity_bitmap",
    "orders_yoy_growth",
    "customer_churn_flag",
    "lineitem_revenue_waterfall",
    "orders_abc_classification",
    "embedding_norm_audit",
    "events_audience_overlap",
    # --- round-4 NTZ casualties (fix landed round 5, no official row) ---
    "window_range_frame",
    "bars_ohlcv_resample",
    "bars_technical_indicators",
    "etl_sessionization_gaps",
    "source_json_scan",
    "source_csv_scan",
    "source_orc_scan",
    # --- round-5 additions (no prior official row) ---
    "sample_weighted_reservoir",
    "agg_count_min_sketch",
    "events_attribution_last_touch",
    "agg_weighted_median",
    "embedding_quantize_int8",
    "ann_pq_adc",
    "curriculum_difficulty_stages",
    "graph_pagerank_trade",
    "pipeline_quality_classifier",
    "dedup_containment_ngram",
    "events_ab_test_lift",
    "text_bigram_lm",
    "etl_schema_evolution",
    "source_partitioned_scan",
    "etl_quarantine_validation",
    "agg_mode_exact",
    "agg_pythagorean_means",
    "join_asof_forward",
    "events_rolling_dau_wau",
    "agg_higher_moments",
    "events_pareto_gini",
    "text_zipf_slope",
    "events_seasonality_chisq",
    "orders_market_basket",
    "customer_rfm_segments",
    "events_path_analysis",
    "events_interarrival_fit",
    "dedup_url_canonical",
    "tokenizer_vocab_coverage",
    "embedding_effective_dim",
    "etl_cdc_changelog_apply",
    "data_shard_manifest",
    "scalar_struct_ops",
    "agg_covariance_matrix",
    "timeseries_m4_downsample",
    "graph_triangle_count",
    "stream_ohlcv_bars",
    "stream_trending_topk",
    "udtf_installment_expand",
    "source_python_datasource",
    "multimodal_audio_chunk_plan",
    "text_keyword_rake",
    "embedding_matryoshka_recall",
    "sql_recursive_hierarchy",
    "scalar_variant_props",
    "sft_loss_mask_spans",
    "rlhf_preference_pairs",
    "customer_ltv_cohort",
    "orders_fulfillment_leadtime",
    "window_interval_burst",
    "join_asof_tolerance",
    "text_ngram_novelty",
)


def _ordered_names() -> list[str]:
    """Registry names with _VERIFY_PRIORITY first, then registration order."""
    pri = [n for n in _VERIFY_PRIORITY if n in _REGISTRY]
    rest = [n for n in _REGISTRY if n not in set(pri)]
    return pri + rest


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` under ``name`` with its oracle twin."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        _REGISTRY[name] = Query(
            name=name, fn=wrapped, oracle=oracle, tags=tuple(tags), doc=fn.__doc__ or "", bench=bench
        )
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    return {n: _REGISTRY[n] for n in _ordered_names()}


def queries() -> dict[str, QueryFn]:
    return {n: _REGISTRY[n].fn for n in _ordered_names()}


def oracles() -> dict[str, str]:
    return {
        n: _REGISTRY[n].oracle
        for n in _ordered_names()
        if _REGISTRY[n].oracle is not None
    }


def bench_queries() -> dict[str, QueryFn]:
    return {n: _REGISTRY[n].fn for n in _ordered_names() if _REGISTRY[n].bench}
