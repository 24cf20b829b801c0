"""Round-50 tests: IQR fences, overnight/intraday decomposition."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_iqr_fences_match_python(spark):
    got = {r.symbol: r for r in registry.queries()["anomaly_iqr_fences"](spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    from collections import defaultdict

    vals = defaultdict(list)
    for e in ev:
        vals[e.event_type].append(round(e.value * 100))
    for sym, xs in vals.items():
        xs.sort()
        n = len(xs)
        q1 = xs[(n + 3) // 4 - 1]
        q3 = xs[(3 * n + 3) // 4 - 1]
        low2, high2 = 2 * q1 - 3 * (q3 - q1), 2 * q3 + 3 * (q3 - q1)
        lo = sum(1 for x in xs if 2 * x < low2)
        hi = sum(1 for x in xs if 2 * x > high2)
        r = got[sym]
        assert (r.q1_cents, r.q3_cents) == (q1, q3)
        assert (r.n_low_outliers, r.n_high_outliers) == (lo, hi)
        assert r.n_trades == n


def test_overnight_plus_intraday_sums_to_close_log(spark):
    """Within quantization, total overnight + intraday log returns
    telescope to ln(last_close/first_open)."""
    rows = {r.symbol: r for r in registry.queries()["bars_overnight_intraday"](spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    ohlc = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.round(F.min_by("value", "event_id") * 100).cast("long").alias("o"),
            F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"),
        )
        .orderBy("event_type", "day")
        .collect()
    )
    from collections import defaultdict

    series = defaultdict(list)
    for r in ohlc:
        series[r.event_type].append((r.o, r.c))
    for sym, days in series.items():
        # telescoped total: ln(c_n / c_0) minus day-1 intraday (excluded)
        want = math.log(days[-1][1] / days[0][1]) * 1e6
        r = rows[sym]
        got = r.total_overnight_e6 + r.total_intraday_e6
        assert abs(got - want) <= r.n_days * 2 + 2, sym  # quantization slack
