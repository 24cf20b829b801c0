"""Round-91 tests: two-pass exact median, spectral entropy."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_two_pass_median_matches_exact(spark):
    (row,) = registry.queries()["agg_median_two_pass"](spark, SF).collect()
    vals = sorted(
        r.v
        for r in spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"))
        .collect()
    )
    n = len(vals)
    lo, hi = vals[(n + 1) // 2 - 1], vals[(n + 2) // 2 - 1]
    assert row.n_rows == n
    assert row.median2_cents == lo + hi


def test_two_pass_median_never_global_sorts(spark):
    df = registry.queries()["agg_median_two_pass"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the full value column must never feed a range-partitioned global
    # sort; only per-bucket sorts (hash-partitioned window) are allowed
    assert "rangepartitioning(v" not in plan.replace(" ", "").lower()


def test_spectral_entropy_matches_bruteforce(spark):
    rows = registry.queries()["timeseries_spectral_entropy"](spark, SF).collect()
    assert rows
    ev = spark.read.parquet(f"{SF}/events.parquet")
    closes = (
        ev.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
        .orderBy("symbol", "day")
        .collect()
    )
    seqs = defaultdict(list)
    for r in closes:
        seqs[r.symbol].append(r.c)
    K = 10
    for r in rows:
        cs = seqs[r.symbol]
        rets = [math.floor((c - p) * 10000.0 / p + 0.5) for p, c in zip(cs, cs[1:])]
        n = len(rets)
        pws = []
        for k in range(1, K + 1):
            a = sum(
                rv * round(math.cos(2 * math.pi * k * t / n) * 1e6)
                for t, rv in enumerate(rets, start=1)
            )
            b = sum(
                rv * round(math.sin(2 * math.pi * k * t / n) * 1e6)
                for t, rv in enumerate(rets, start=1)
            )
            pws.append(math.floor((a / 1e6) ** 2 + (b / 1e6) ** 2 + 0.5))
        tp = sum(pws)
        terms = [
            math.floor(-(pw / tp) * math.log(pw / tp) * 1e6 + 0.5)
            for pw in pws
            if pw > 0
        ]
        assert r.n_freqs == len(terms)
        assert r.spectral_entropy_micro == sum(terms)
        # entropy of a 10-bin distribution is bounded by ln(10)
        assert 0 <= r.spectral_entropy_micro <= r.max_entropy_micro + len(terms)
        assert r.max_entropy_micro == round(math.log(10) * 1e6)
