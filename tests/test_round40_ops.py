"""Round-40 tests: periodogram, decay engagement."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_periodogram_detects_planted_cycle(spark):
    """A synthetic pure 7-day cosine must put (almost) all its power at
    period 7 — computed through the same quantized pipeline in python."""
    from us_stock_data_pipeline_spark.queries.analytics_ops45 import _PERIODS

    n = 56
    series = [100_000 + round(10_000 * math.cos(2 * math.pi * t / 7)) for t in range(n)]
    mean = sum(series) // n
    amps = {}
    for p in _PERIODS:
        c = sum(
            math.floor((y - mean) * math.cos(2 * math.pi * t / p) * 1000 + 0.5)
            for t, y in enumerate(series)
        )
        s = sum(
            math.floor((y - mean) * math.sin(2 * math.pi * t / p) * 1000 + 0.5)
            for t, y in enumerate(series)
        )
        amps[p] = math.sqrt(c * c + s * s) / 1000
    assert amps[7] > 10 * max(amps[3], amps[14])


def test_periodogram_rows_complete(spark):
    from us_stock_data_pipeline_spark.queries.analytics_ops45 import _PERIODS

    rows = registry.queries()["timeseries_periodogram"](spark, SF).collect()
    assert len(rows) == 5 * len(_PERIODS)
    for r in rows:
        assert r.amplitude_cents >= 0


def test_decay_engagement_bounds(spark):
    rows = registry.queries()["events_decay_engagement"](spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    totals = {
        r.user_id: r.c
        for r in ev.groupBy("user_id")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"))
        .collect()
    }
    counts = {r.user_id: r.c for r in ev.groupBy("user_id").agg(F.count("*").alias("c")).collect()}
    assert len(rows) == len(totals)
    for r in rows:
        # decayed score can never exceed the undecayed total (x1000 scale)
        assert 0 <= r.engagement_milli_cents <= totals[r.user_id] * 1000 + r.n_events
        assert r.n_events == counts[r.user_id]
