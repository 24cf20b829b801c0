"""Round-82 tests: DTW distance, Atkinson index."""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.queries.analytics_ops76 import _dtw_pairs

SF = "/root/testdata/sf0.001"


def _dtw_ref(a, b, w=10):
    INF = float("inf")
    n, m = len(a), len(b)
    D = {(0, 0): 0}
    for i in range(1, n + 1):
        for j in range(max(1, i - w), min(m, i + w) + 1):
            best = min(
                D.get((i - 1, j), INF), D.get((i, j - 1), INF), D.get((i - 1, j - 1), INF)
            )
            D[(i, j)] = abs(a[i - 1] - b[j - 1]) + best
    return D[(n, m)]


def test_dtw_kernel_identity_and_shift():
    # identical series have zero distance
    assert _dtw_pairs(pd.Series([[1, 5, 3, 8]]), pd.Series([[1, 5, 3, 8]]))[0] == 0
    # an inserted repeat is absorbed by the warp at zero extra cost
    assert _dtw_pairs(pd.Series([[1, 2, 3, 4]]), pd.Series([[1, 1, 2, 3, 4]]))[0] == 0
    # triangle-ish sanity: all-shifted series costs |shift| per step at most n
    d = _dtw_pairs(pd.Series([[0, 0, 0]]), pd.Series([[2, 2, 2]]))[0]
    assert d == 6


def test_dtw_query_matches_bruteforce(spark):
    rows = registry.queries()["timeseries_dtw_distance"](spark, SF).collect()
    assert len(rows) == 10  # C(5,2) symbol pairs
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
    rets = {
        s: [
            math.floor((c - p) * 10000.0 / p + 0.5)
            for p, c in zip(cs, cs[1:])
        ]
        for s, cs in seqs.items()
    }
    for r in rows:
        a, b = rets[r.symbol_a], rets[r.symbol_b]
        assert (r.n_a, r.n_b) == (len(a), len(b))
        assert r.dtw_qbp == _dtw_ref(a, b)


def test_atkinson_matches_bruteforce(spark):
    rows = registry.queries()["agg_atkinson_index"](spark, SF).collect()
    assert rows
    c = spark.read.parquet(f"{SF}/customer.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    joined = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
        .collect()
    )
    per_seg = defaultdict(list)
    for r in joined:
        per_seg[r.c_mktsegment].append(r.cents)
    for r in rows:
        cents = per_seg[r.segment]
        n = len(cents)
        slq = sum(round(math.log(x) * 1_000_000) for x in cents)
        assert (r.n_customers, r.total_cents, r.sum_log_micro) == (n, sum(cents), slq)
        a = 1 - math.exp(slq / n / 1_000_000) / (sum(cents) / n)
        assert r.atkinson_micro == math.floor(a * 1_000_000 + 0.5)
        # Atkinson index lives in [0, 1); equality only under perfect equality
        assert 0 <= r.atkinson_micro < 1_000_000
