"""Round-37 tests: Mann-Kendall, runs test."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _daily_closes(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    rows = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
        .orderBy("event_type", "day")
        .collect()
    )
    from collections import defaultdict

    series = defaultdict(list)
    for r in rows:
        series[r.event_type].append(r.c)
    return series


def test_mann_kendall_matches_python(spark):
    got = {r.symbol: r for r in registry.queries()["stats_mann_kendall"](spark, SF).collect()}
    for sym, xs in _daily_closes(spark).items():
        n = len(xs)
        s = sum(
            (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
            for i in range(n)
            for j in range(i + 1, n)
        )
        from collections import Counter

        ties = sum(t * (t - 1) * (2 * t + 5) for t in Counter(xs).values())
        var = (n * (n - 1) * (2 * n + 5) - ties) / 18.0
        corr = s - 1.0 if s > 0 else s + 1.0 if s < 0 else 0.0
        z = math.floor(corr / math.sqrt(var) * 1e4 + 0.5)
        assert got[sym].mk_s == s
        assert got[sym].mk_z_e4 == z


def test_runs_test_matches_python(spark):
    got = {r.symbol: r for r in registry.queries()["stats_runs_test"](spark, SF).collect()}
    for sym, xs in _daily_closes(spark).items():
        ups = [1 if b > a else 0 for a, b in zip(xs, xs[1:])]
        n_runs = 1 + sum(1 for a, b in zip(ups, ups[1:]) if a != b)
        n1, n2 = sum(ups), len(ups) - sum(ups)
        mean_r = 2.0 * n1 * n2 / (n1 + n2) + 1.0
        var_r = (
            2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
            / (float(n1 + n2) * (n1 + n2) * (n1 + n2 - 1))
        )
        z = math.floor((n_runs - mean_r) / math.sqrt(var_r) * 1e4 + 0.5)
        r = got[sym]
        assert (r.n_runs, r.n_up, r.n_down) == (n_runs, n1, n2)
        assert r.runs_z_e4 == z
