"""Round-79 tests: Chow break test, A/D line + Chaikin money flow."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _closes(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    rows = (
        ev.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
        .orderBy("symbol", "day")
        .collect()
    )
    out = defaultdict(list)
    for r in rows:
        out[r.symbol].append(r.c)
    return out


def _ols_sse(pts):
    n = len(pts)
    sx = sum(i for i, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(i * i for i, _ in pts)
    sxy = sum(i * y for i, y in pts)
    syy = sum(y * y for _, y in pts)
    cyy = syy - sy * sy / n
    cxy = sxy - sx * sy / n
    cxx = sxx - sx * sx / n
    return cyy - cxy * cxy / cxx


def test_chow_matches_bruteforce(spark):
    rows = registry.queries()["stats_chow_break_test"](spark, SF).collect()
    assert rows
    closes = _closes(spark)
    for r in rows:
        cs = closes[r.symbol]
        n = len(cs)
        pts = [(i + 1, c) for i, c in enumerate(cs)]
        seg1 = [p for p in pts if p[0] * 2 <= n]
        seg2 = [p for p in pts if p[0] * 2 > n]
        sse_p = _ols_sse(pts)
        sse_s = _ols_sse(seg1) + _ols_sse(seg2)
        assert r.n_days == n
        assert r.sse_pooled == math.floor(sse_p + 0.5)
        assert r.sse_split == math.floor(sse_s + 0.5)
        f = (sse_p - sse_s) / 2 / (sse_s / (n - 4))
        assert r.chow_f_milli == math.floor(f * 1000 + 0.5)
        # split fit can never be worse than pooled
        assert r.sse_split <= r.sse_pooled
        assert r.chow_f_milli >= 0


def _bars_hlcv(spark):
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
            F.count(F.lit(1)).cast("long").alias("v"),
        )
        .orderBy("symbol", "day")
        .collect()
    )
    out = defaultdict(list)
    for r in rows:
        out[r.symbol].append((r.day, r.h, r.l, r.c, r.v))
    return out


def _trunc_div(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_adl_cmf_matches_bruteforce(spark):
    rows = registry.queries()["bars_adl_chaikin_cmf"](spark, SF).collect()
    assert rows
    bars = _bars_hlcv(spark)
    N = 20
    expected = {}
    for sym, seq in bars.items():
        mfvs = []
        adl = 0
        for i, (day, h, l, c, v) in enumerate(seq):
            mfv = 0 if h == l else _trunc_div((2 * c - h - l) * v * 1_000_000, h - l)
            mfvs.append(mfv)
            adl += mfv
            if i + 1 >= N:
                num = sum(mfvs[i - N + 1: i + 1])
                den = sum(x[4] for x in seq[i - N + 1: i + 1]) * 1000
                expected[(sym, day)] = (adl, _trunc_div(num, den))
    assert len(rows) == len(expected)
    for r in rows:
        assert expected[(r.symbol, r.day)] == (r.adl_micro, r.cmf_milli)


def test_cmf_bounded(spark):
    rows = registry.queries()["bars_adl_chaikin_cmf"](spark, SF).collect()
    # CMF is a volume-weighted mean of a multiplier in [-1, 1]
    for r in rows:
        assert -1000 <= r.cmf_milli <= 1000
