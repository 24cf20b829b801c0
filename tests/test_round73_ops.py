"""Round-73 tests: variance ratio, Haar energy."""

from __future__ import annotations

import math

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_variance_ratio_manual_q2(spark):
    rows = [
        r
        for r in registry.queries()["stats_variance_ratio"](spark, SF).collect()
        if r.q == 2
    ]
    assert rows
    from pyspark.sql import functions as F

    closes = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
        .orderBy("symbol", "day")
        .collect()
    )
    by_sym: dict[str, list[int]] = {}
    for r in closes:
        by_sym.setdefault(r.symbol, []).append(r.c)
    for row in rows:
        cs = by_sym[row.symbol]
        rets = [math.floor((b - a) * 10000.0 / a + 0.5) for a, b in zip(cs, cs[1:])]
        n1 = len(rets)
        var1 = (sum(r * r for r in rets) - sum(rets) ** 2 / n1) / n1
        q2 = [a + b for a, b in zip(rets, rets[1:])]
        nq = len(q2)
        varq = (sum(r * r for r in q2) - sum(q2) ** 2 / nq) / nq
        vr = varq / (2 * var1)
        assert row.n_windows == nq
        assert abs(row.vr_e6 / 1e6 - vr) < 2e-6


def test_haar_energy_shares_sum_to_one(spark):
    rows = registry.queries()["timeseries_haar_energy"](spark, SF).collect()
    # sparse small-sf order calendars may lack complete 2^k-day blocks at
    # the deepest level; present levels must be an ordered subset
    assert rows
    levels = [r.level for r in rows]
    assert levels == sorted(levels) and set(levels) <= {1, 2, 3, 4}
    total = sum(r.energy_share_e6 for r in rows)
    # truncating division loses at most 1 ppm per level
    assert 1_000_000 - len(rows) <= total <= 1_000_000
    for r in rows:
        assert r.n_blocks > 0
