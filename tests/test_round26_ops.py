"""Round-26 tests: Kyle lambda, VPIN, quadratic trend, newsvendor, RLE."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_kyle_lambda_finite_per_symbol(spark):
    rows = registry.queries()["bars_kyle_lambda"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_days > 1
        assert r.kyle_lambda_e9 is not None


def test_vpin_bounded_zero_one(spark):
    rows = registry.queries()["bars_vpin"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_buckets >= 1
        assert 0 <= r.vpin_mean_e6 <= r.vpin_max_e6 <= 1_000_000


def test_quadratic_trend_matches_numpy(spark):
    import numpy as np

    rows = {r.symbol: r for r in registry.queries()["timeseries_quadratic_trend"](spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("y"))
        .orderBy("event_type", "day")
        .collect()
    )
    from collections import defaultdict

    series = defaultdict(list)
    for r in daily:
        series[r.event_type].append(r.y)
    for sym, ys in series.items():
        n = len(ys)
        t = np.array([2 * i - (n - 1) for i in range(n)], dtype=float)
        coef = np.polyfit(t, np.array(ys, dtype=float), 2)  # c, b, a
        got = rows[sym]
        assert abs(got.c_e6 / 1e6 - coef[0]) < 1e-3
        assert abs(got.b_e6 / 1e6 - coef[1]) < 1e-3
        assert abs(got.a_milli / 1e3 - coef[2]) < 1e-1


def test_newsvendor_level_is_exact_order_statistic(spark):
    rows = registry.queries()["orders_newsvendor_level"](spark, SF).collect()
    assert rows
    for r in rows:
        # ceil(0.8n) of n days covered at minimum (level covers its rank)
        assert r.n_days_covered >= (4 * r.n_days + 4) // 5
        assert r.n_days_covered <= r.n_days


def test_rle_total_events_conserved(spark):
    rows = registry.queries()["events_run_length_encoding"](spark, SF).collect()
    total = sum(r.run_len * r.n_runs for r in rows)
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert total == n_events
