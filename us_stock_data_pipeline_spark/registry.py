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
# Round 4: front-load the 20 queries with no official CORRECTNESS row in any
# round (r01+r02+r03 cumulatively checked 146 of 166): the 12 round-2
# stragglers, q12_shipping_modes, and the 7 round-3 llm_ops6 operators —
# followed by round-4 additions. Everything already green re-verifies after.
_VERIFY_PRIORITY: tuple[str, ...] = (
    # --- never officially checked (cumulative budget tail), 20 queries ---
    # round-2 stragglers
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
    # derived-shipmode TPC-H Q12
    "q12_shipping_modes",
    # round-3 llm_ops6 operators
    "pii_redact",
    "bpe_pair_counts",
    "corpus_mixture_sample",
    "pack_greedy_exact",
    "bloom_semijoin",
    "batch_padding_builder",
    "skew_heavy_hitters",
    # --- round-4 additions (no prior row by definition) ---
    "bpe_merge_round",
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
