"""Round-84 tests: Ichimoku cloud, risk-parity weights."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _bars(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    rows = (
        ev.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(
            F.round(F.max("value") * 100).cast("long").alias("h"),
            F.round(F.min("value") * 100).cast("long").alias("l"),
            F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"),
        )
        .orderBy("symbol", "day")
        .collect()
    )
    out = defaultdict(list)
    for r in rows:
        out[r.symbol].append((r.day, r.h, r.l, r.c))
    return out


def test_ichimoku_matches_bruteforce(spark):
    rows = registry.queries()["bars_ichimoku_cloud"](spark, SF).collect()
    assert rows
    T, K, S = 3, 7, 14
    bars = _bars(spark)
    expected = {}
    for sym, seq in bars.items():
        def mid2(i, n):
            win = seq[max(0, i - n + 1): i + 1]
            return max(x[1] for x in win) + min(x[2] for x in win)

        for i in range(len(seq)):
            src = i - K
            if src < 0 or src + 1 < S:
                continue
            ten2 = mid2(i, T)
            kij2 = mid2(i, K)
            sa4 = mid2(src, T) + mid2(src, K)
            sb2 = mid2(src, S)
            sign = 1 if 2 * sa4 > 4 * sb2 else (-1 if 2 * sa4 < 4 * sb2 else 0)
            expected[(sym, seq[i][0])] = (seq[i][3], ten2, kij2, sa4, sb2, sign)
    assert len(rows) == len(expected)
    for r in rows:
        assert expected[(r.symbol, r.day)] == (
            r.close_cents, r.tenkan2, r.kijun2, r.senkou_a4, r.senkou_b2, r.cloud_sign
        )


def test_risk_parity_matches_bruteforce(spark):
    rows = registry.queries()["portfolio_risk_parity_weights"](spark, SF).collect()
    assert rows
    bars = _bars(spark)
    inv = {}
    stats = {}
    for sym, seq in bars.items():
        cs = [x[3] for x in seq]
        rets = [math.floor((c - p) * 10000.0 / p + 0.5) for p, c in zip(cs, cs[1:])]
        n, sr, srr = len(rets), sum(rets), sum(r * r for r in rets)
        var_n2 = n * srr - sr * sr
        inv[sym] = math.floor(1e9 * n / math.sqrt(var_n2) + 0.5)
        stats[sym] = (n, var_n2)
    tot = sum(inv.values())
    for r in rows:
        n, var_n2 = stats[r.symbol]
        assert (r.n_returns, r.var_n2, r.inv_nano) == (n, var_n2, inv[r.symbol])
        assert r.weight_ppm == inv[r.symbol] * 1_000_000 // tot


def test_risk_parity_weights_sum_to_one(spark):
    rows = registry.queries()["portfolio_risk_parity_weights"](spark, SF).collect()
    total = sum(r.weight_ppm for r in rows)
    # floor-division leaves at most (k-1) ppm on the table
    assert 1_000_000 - len(rows) < total <= 1_000_000
    # lower variance -> higher weight (monotone allocation)
    by_var = sorted(rows, key=lambda r: r.var_n2 / (r.n_returns**2))
    ws = [r.weight_ppm for r in by_var]
    assert ws == sorted(ws, reverse=True)
