"""Round-100 tests: Holt-Winters additive, peak-to-average ratio."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _trunc_div(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_holt_winters_matches_bruteforce(spark):
    rows = registry.queries()["timeseries_holt_winters_additive"](spark, SF).collect()
    assert rows
    ev = spark.read.parquet(f"{SF}/events.parquet")
    closes = (
        ev.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("y"))
        .orderBy("symbol", "day")
        .collect()
    )
    seqs = defaultdict(list)
    for r in closes:
        seqs[r.symbol].append((r.day, r.y))
    m = 7
    expected = {}
    for sym, seq in seqs.items():
        ys = [y for _, y in seq]
        l = sum(ys[:m]) // m
        b = 0
        s = [ys[i] - l for i in range(m)]
        for t in range(m + 1, len(ys) + 1):
            y = ys[t - 1]
            p = (t - 1) % m
            fitted = l + b + s[p]
            lnew = _trunc_div((y - s[p]) + 4 * (l + b), 5)
            bnew = _trunc_div((lnew - l) + 9 * b, 10)
            s[p] = _trunc_div(3 * (y - lnew) + 7 * s[p], 10)
            l, b = lnew, bnew
            expected[(sym, seq[t - 1][0])] = (l, b, fitted, y - fitted)
    assert len(rows) == len(expected)
    for r in rows:
        assert expected[(r.symbol, r.day)] == (
            r.level_c, r.trend_c, r.fitted_c, r.resid_c
        )


def test_holt_winters_tracks_level(spark):
    # the smoothed level must stay within the observed price range
    rows = registry.queries()["timeseries_holt_winters_additive"](spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    rng = (
        ev.groupBy(F.col("event_type").alias("symbol"))
        .agg(
            (F.round(F.min("value") * 100) * 0.5).alias("lo"),
            (F.round(F.max("value") * 100) * 1.5).alias("hi"),
        )
        .collect()
    )
    bounds = {r.symbol: (r.lo, r.hi) for r in rng}
    for r in rows:
        lo, hi = bounds[r.symbol]
        assert lo <= r.level_c <= hi


def test_peak_to_average_matches_bruteforce(spark):
    rows = registry.queries()["events_peak_to_average"](spark, SF).collect()
    assert rows
    ev = spark.read.parquet(f"{SF}/events.parquet")
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    per = defaultdict(list)
    for r in hourly:
        per[r.event_type].append(r.n)
    for r in rows:
        ns = per[r.event_type]
        assert (r.n_hours, r.total_events, r.peak_hour_events) == (
            len(ns), sum(ns), max(ns)
        )
        assert r.par_milli == max(ns) * len(ns) * 1000 // sum(ns)
        assert r.par_milli >= 1000  # peak >= mean always
