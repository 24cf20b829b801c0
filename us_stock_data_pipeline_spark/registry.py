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
# in a long-lived session running all 673 queries (the sweep, the external
# driver), at most one query's cached blocks are ever resident per thread
# instead of an unbounded accumulation that evicts/spills and erodes the
# very perf wins being measured (advisor r8 low). The list is
# THREAD-LOCAL (advisor r9 medium): bench.py's concurrent phase runs
# queries on a thread pool, and a shared list would let each entering
# query unpersist other in-flight queries' just-persisted frames —
# silently defeating persists exactly in the concurrent measurement.
# unpersist() before a collect is semantically harmless (the plan just
# recomputes), so an unusual caller that builds many plans before
# collecting stays correct.
import threading as _threading

_TRACKED_CACHES = _threading.local()


def _tracked_list() -> list[DataFrame]:
    lst = getattr(_TRACKED_CACHES, "frames", None)
    if lst is None:
        lst = _TRACKED_CACHES.frames = []
    return lst


def track_persist(df: DataFrame) -> DataFrame:
    """persist() + registration for release at the next query's entry
    (on this thread)."""
    df = df.persist()
    _tracked_list().append(df)
    return df


def release_tracked_caches() -> None:
    lst = _tracked_list()
    while lst:
        df = lst.pop()
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — session may be gone; nothing to free
            pass

# The correctness driver verifies ``queries()`` in iteration order with a
# bounded per-round budget (~50/round), so iteration order IS verification
# priority. Round-10 fix (VERDICT r9 #2): the order is computed DYNAMICALLY
# from the committed CORRECTNESS_r*.json artifacts —
#   1. round-10 additions (never sampled by construction, listed statically
#      so they outrank the backlog),
#   2. red rechecks (queries the driver last saw red),
#   3. every never-driver-sampled name in registration order,
#   4. the cumulatively-green remainder in registration order.
# A static tuple rots: r9's hand-maintained backlog list had already been
# consumed by the r7-r9 drivers, so r9 burned 34 of 50 slots re-sampling
# green queries. Reading the artifacts makes the rotation self-updating.

_NEW_THIS_ROUND: tuple[str, ...] = (
    "multimodal_jpeg_color_decode",
)

_RED_RECHECK: tuple[str, ...] = ("survival_kaplan_meier",)


def _driver_sampled_names() -> frozenset[str]:
    """Names ever sampled by the external driver (CORRECTNESS_r*.json)."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sampled: set[str] = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            with open(path, encoding="utf-8") as fh:
                sampled.update(json.load(fh).keys())
        except Exception:  # noqa: BLE001 — a malformed artifact must not break queries()
            continue
    return frozenset(sampled)


def _ordered_names() -> list[str]:
    """Verification-priority order: new-this-round, red rechecks,
    never-driver-sampled (registration order), then the green remainder."""
    sampled = _driver_sampled_names()
    pri = [n for n in (*_NEW_THIS_ROUND, *_RED_RECHECK) if n in _REGISTRY]
    seen = set(pri)
    never = [n for n in _REGISTRY if n not in sampled and n not in seen]
    rest = [n for n in _REGISTRY if n in sampled and n not in seen]
    return pri + never + rest


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
