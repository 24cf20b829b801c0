"""Round-76 tests: Hodges-Lehmann pseudo-median, Siegel repeated-median slope."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _daily_closes(spark):
    """symbol -> ordered list of close_cents, mirroring the query's rollup."""
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
    out: dict[str, list[int]] = {}
    for r in rows:
        out.setdefault(r.symbol, []).append(r.c)
    return out


def _returns_qbp(closes: list[int]) -> list[int]:
    return [
        math.floor((c - p) * 10000.0 / p + 0.5)
        for p, c in zip(closes, closes[1:])
    ]


def _median2x(sorted_vals: list[int]) -> int:
    """2x the exact median: odd -> 2*middle, even -> lo+hi."""
    n = len(sorted_vals)
    if n % 2:
        return 2 * sorted_vals[n // 2]
    return sorted_vals[n // 2 - 1] + sorted_vals[n // 2]


def test_hodges_lehmann_matches_bruteforce(spark):
    rows = registry.queries()["stats_hodges_lehmann"](spark, SF).collect()
    assert rows
    closes = _daily_closes(spark)
    for r in rows:
        rets = _returns_qbp(closes[r.symbol])
        walsh2 = sorted(
            rets[i] + rets[j] for i in range(len(rets)) for j in range(i, len(rets))
        )
        assert r.n_walsh == len(walsh2)
        assert r.hl_qbp == _median2x(walsh2)


def test_hodges_lehmann_between_min_and_max(spark):
    rows = registry.queries()["stats_hodges_lehmann"](spark, SF).collect()
    closes = _daily_closes(spark)
    for r in rows:
        rets = _returns_qbp(closes[r.symbol])
        # HL estimator lies within the data range (4x quarter-bp units)
        assert 4 * min(rets) <= r.hl_qbp <= 4 * max(rets)


def test_siegel_slope_matches_bruteforce(spark):
    rows = registry.queries()["stats_siegel_slope"](spark, SF).collect()
    assert rows
    closes = _daily_closes(spark)
    for r in rows:
        cs = closes[r.symbol]
        n = len(cs)
        assert r.n_points == n
        inner = []
        for ia in range(n):
            slopes = sorted(
                math.floor((cs[ib] - cs[ia]) * 1_000_000.0 / (ib - ia) + 0.5)
                for ib in range(n)
                if ib != ia
            )
            inner.append(_median2x(slopes))
        assert r.siegel_slope_4x_e6 == _median2x(sorted(inner))


def test_siegel_on_linear_series_recovers_slope(spark):
    # A perfectly linear synthetic check of the same arithmetic the
    # query pins: slope recovery is exact on clean data.
    cs = [1000 + 7 * i for i in range(9)]
    inner = []
    for ia in range(len(cs)):
        slopes = sorted(
            math.floor((cs[ib] - cs[ia]) * 1_000_000.0 / (ib - ia) + 0.5)
            for ib in range(len(cs))
            if ib != ia
        )
        inner.append(_median2x(slopes))
    assert _median2x(sorted(inner)) == 4 * 7 * 1_000_000
