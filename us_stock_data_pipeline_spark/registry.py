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
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in _REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {n: q.oracle for n, q in _REGISTRY.items() if q.oracle is not None}


def bench_queries() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in _REGISTRY.items() if q.bench}
