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
# Round 3: front-load the two non-green rows from r02 (pack_token_budget's
# oracle cast is fixed; stream_watermarked_append now carries a real oracle),
# then the 60 queries that have never had an official CORRECTNESS row
# (rounds 1+2 checked 98 of 158), then round-3 additions. The 96
# already-green queries re-verify last.
_VERIFY_PRIORITY: tuple[str, ...] = (
    # red / rows-only in r02 — fixed this round, need fresh green rows
    "pack_token_budget",
    "stream_watermarked_append",
    # --- never officially checked (r01+r02 budget tail), 60 queries ---
    # scalar batteries
    "scalar_math",
    "scalar_trig",
    "scalar_array",
    "scalar_array2",
    "scalar_json",
    "scalar_cast_try",
    "scalar_hash_encode",
    "map_ops",
    "conditional_null",
    # relational tail
    "lateral_posexplode",
    "timeseries_gap_fill",
    "agg_median_any",
    "agg_regression",
    "agg_product_logspace",
    "agg_bool",
    # TPC-H suite
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_parts_supplier_cnt",
    "q17_small_qty_revenue",
    "q18_large_volume_customer",
    "q19_disjunctive_revenue",
    "q22_global_sales_opportunity",
    # LLM / analytics / ETL-quality / sketch families (round-2 additions)
    "dedup_cluster_connected",
    "text_tfidf",
    "sample_deterministic",
    "events_funnel",
    "events_retention",
    "bars_vwap_twap",
    "anomaly_rolling_zscore",
    "agg_entropy",
    "bars_ema",
    "etl_scd2_dimension",
    "etl_fk_conformance",
    "etl_profile_table",
    "stream_foreachbatch_upsert",
    "agg_theta_sketch",
    "agg_kll_quantiles",
    "etl_scd2_lookup",
    "etl_table_diff",
    "bars_correlation_matrix",
    "join_range_banded",
    "clean_winsorize",
    "text_unigram_logprob",
    "text_contamination_check",
    "text_repetition_ratio",
    "feature_binning_ntile",
    "events_cumulative_uniques",
    "events_markov_transition",
    "pipeline_source_scorecard",
    "sample_k_per_group",
    "agg_mad_robust",
    "events_activity_streaks",
    "bars_volatility",
    "corpus_language_mix",
    "pipeline_curation_yield",
    # --- round-3 additions (no prior row by definition) appended below ---
    "q12_shipping_modes",
    "pii_redact",
    "bpe_pair_counts",
    "corpus_mixture_sample",
    "pack_greedy_exact",
    "bloom_semijoin",
    "batch_padding_builder",
    "skew_heavy_hitters",
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
