"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing excludes JVM/session startup (a fixed cost the driver's baseline
doesn't pay either) but includes full plan execution + result collection
per query. A tiny warm-up action runs first so the first measured query
doesn't absorb classloading.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import us_stock_data_pipeline_spark  # noqa: F401
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Hot-benchmark methodology: run every headline query once at the
    # smallest scale factor first so JIT/codegen/streaming-machinery
    # warm-up is excluded from the measured sf numbers (the measured runs
    # still execute the full plan on the full sf data).
    warm_dir = sf_dir.replace(m.group(0), "sf0.001") if m else sf_dir
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name, fn in registry.bench_queries().items():
        try:
            fn(spark, warm_dir).collect()
        except Exception as e:  # noqa: BLE001
            print(f"# warmup {name} failed: {e}", file=sys.stderr)

    timings: dict[str, float] = {}
    for name, fn in registry.bench_queries().items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = len(df.collect())
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.2f}s rows={n}", file=sys.stderr)

    # Secondary metric: the same set run CONCURRENTLY (Spark's scheduler
    # interleaves the jobs across the cores, as a multi-tenant cluster
    # would) — per-query driver/job overhead amortizes, so this is the
    # fairer throughput number for a set of small queries.
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=18) as pool:
        list(pool.map(lambda fn: fn(spark, sf_dir).collect(), registry.bench_queries().values()))
    concurrent_wall = round(time.time() - t0, 3)

    # Baseline twin: DuckDB single-node on the oracle SQL of the same set
    # (BASELINE.md) — recorded here so every BENCH_r{N}.json carries its
    # own comparison point.
    duck_total = None
    try:
        import duckdb

        from us_stock_data_pipeline_spark.catalog import TABLES

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        oracles = registry.oracles()
        t0 = time.time()
        for name in registry.bench_queries():
            if name in oracles:
                con.execute(oracles[name]).fetchall()
        duck_total = round(time.time() - t0, 3)
    except Exception as e:  # noqa: BLE001
        print(f"# duckdb baseline failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "concurrent_wall_sec": concurrent_wall,
                "duckdb_baseline_sec": duck_total,
            }
        )
    )


if __name__ == "__main__":
    main()
