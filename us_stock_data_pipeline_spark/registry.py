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
    round: int = 0  # build round that registered this query (0 = legacy)


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
# priority. Round-10 fix (VERDICT r9 #2) computed the order from the
# committed CORRECTNESS_r*.json artifacts, but kept a STATIC
# "new-this-round" tuple — which rotted in round 12 exactly like r9's
# static backlog: the tuple still named r11's queries, so r12's 9 new
# registrations were never sampled (VERDICT r12 "What's wrong" #1).
# Round-13 fix: "new" is registration-time metadata committed WITH the
# query (``register(..., round=N)``), never a separate list to forget.
#   1. tagged (round > 0) never-driver-sampled queries, oldest round
#      first (longest-waiting = most at risk of rotting un-verified),
#   2. red rechecks — any query whose LATEST driver row was red/err,
#      computed from the artifacts (no static list),
#   3. every never-driver-sampled untagged name in registration order,
#   4. the cumulatively-green remainder in registration order.


def _driver_rows() -> dict[str, tuple[int, dict]]:
    """name -> (highest round sampled, that round's result row)."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, tuple[int, dict]] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path, encoding="utf-8") as fh:
                rows = json.load(fh)
        except Exception:  # noqa: BLE001 — a malformed artifact must not break queries()
            continue
        for name, row in rows.items():
            if name not in latest or rnd > latest[name][0]:
                latest[name] = (rnd, row if isinstance(row, dict) else {})
    return latest


def _driver_sampled_names() -> frozenset[str]:
    """Names ever sampled by the external driver (CORRECTNESS_r*.json)."""
    return frozenset(_driver_rows())


def _red_recheck_names() -> list[str]:
    """Queries whose most recent driver row was red or errored."""
    reds = []
    for name, (_rnd, row) in _driver_rows().items():
        ok = (
            row.get("rows_match") is True
            and row.get("schema_match") is not False
            and row.get("hash_match") is not False
            and row.get("err") in (None, "")
        )
        if not ok:
            reds.append(name)
    return sorted(reds)


def _ordered_names() -> list[str]:
    """Verification-priority order: tagged never-sampled (oldest round
    first), red rechecks, never-sampled untagged, then the remainder."""
    sampled = _driver_sampled_names()
    order = list(_REGISTRY)
    pos = {n: i for i, n in enumerate(order)}
    tagged = sorted(
        (n for n in order if n not in sampled and _REGISTRY[n].round > 0),
        key=lambda n: (_REGISTRY[n].round, pos[n]),
    )
    seen = set(tagged)
    reds = [n for n in _red_recheck_names() if n in _REGISTRY and n not in seen]
    seen.update(reds)
    never = [n for n in order if n not in sampled and n not in seen]
    seen.update(never)
    rest = [n for n in order if n not in seen]
    return tagged + reds + never + rest


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
    round: int = 0,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` under ``name`` with its oracle twin.

    ``round`` is the build round that added the query; until the driver's
    CORRECTNESS artifacts show a sample, round-tagged queries lead the
    verification order (oldest round first).
    """

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
            name=name,
            fn=wrapped,
            oracle=oracle,
            tags=tuple(tags),
            doc=fn.__doc__ or "",
            bench=bench,
            round=round,
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
