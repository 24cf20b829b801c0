"""Round-86 tests: Heikin-Ashi candles, circular timing statistics."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_heikin_ashi_matches_bruteforce(spark):
    rows = registry.queries()["bars_heikin_ashi"](spark, SF).collect()
    assert rows
    ev = spark.read.parquet(f"{SF}/events.parquet")
    bars = (
        ev.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(
            F.round(F.min_by("value", "event_id") * 100).cast("long").alias("o"),
            F.round(F.max("value") * 100).cast("long").alias("h"),
            F.round(F.min("value") * 100).cast("long").alias("l"),
            F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"),
        )
        .orderBy("symbol", "day")
        .collect()
    )
    seqs = defaultdict(list)
    for r in bars:
        seqs[r.symbol].append((r.day, r.o, r.h, r.l, r.c))
    expected = {}
    for sym, seq in seqs.items():
        op4 = cl4 = None
        for i, (d, o, h, l, c) in enumerate(seq):
            new_cl4 = o + h + l + c
            op4 = (o + c) * 2 if i == 0 else (op4 + cl4) // 2
            cl4 = new_cl4
            hi4 = max(h * 4, op4, cl4)
            lo4 = min(l * 4, op4, cl4)
            trend = 1 if cl4 > op4 else (-1 if cl4 < op4 else 0)
            expected[(sym, d)] = (op4, cl4, hi4, lo4, trend)
    assert len(rows) == len(expected)
    for r in rows:
        assert expected[(r.symbol, r.day)] == (
            r.ha_open4, r.ha_close4, r.ha_high4, r.ha_low4, r.ha_trend
        )
        # HA candle envelope is consistent
        assert r.ha_low4 <= min(r.ha_open4, r.ha_close4)
        assert r.ha_high4 >= max(r.ha_open4, r.ha_close4)


def test_circular_stats_matches_bruteforce(spark):
    rows = registry.queries()["events_circular_timing_stats"](spark, SF).collect()
    assert rows
    ev = spark.read.parquet(f"{SF}/events.parquet")
    hrs = (
        ev.groupBy("event_type", F.hour("ts").alias("hr"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    per = defaultdict(dict)
    for r in hrs:
        per[r.event_type][r.hr] = r.n
    two_pi = 2 * math.pi
    for r in rows:
        bins = per[r.event_type]
        sx = sum(
            math.floor(math.cos(two_pi * h / 24) * n * 1e6 + 0.5) for h, n in bins.items()
        )
        sy = sum(
            math.floor(math.sin(two_pi * h / 24) * n * 1e6 + 0.5) for h, n in bins.items()
        )
        n_ev = sum(bins.values())
        assert (r.n_events, r.sum_cos_micro, r.sum_sin_micro) == (n_ev, sx, sy)
        res = math.floor(math.sqrt(sx * sx + sy * sy) / n_ev + 0.5)
        assert r.resultant_micro == res
        mh = math.floor((math.atan2(sy, sx) + two_pi) / two_pi * 24000 + 0.5) % 24000
        assert r.mean_hour_milli == mh
        # R is a mean of unit vectors: bounded by 1 (micro units)
        assert 0 <= r.resultant_micro <= 1_000_000
        assert 0 <= r.mean_hour_milli < 24_000
