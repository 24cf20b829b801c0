"""Round-83 tests: grid box-containment join, RiskMetrics EWMA variance."""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import date, timedelta

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_grid_join_matches_naive(spark):
    rows = registry.queries()["join_grid_box_containment"](spark, SF).collect()
    assert rows
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).collect()
    base = date(1992, 1, 1)
    expected = defaultdict(lambda: [0, 0])
    for k in range(25):
        d_lo = base + timedelta(days=k * 90)
        d_hi = base + timedelta(days=k * 90 + 180)
        p_lo, p_hi = k * 2_000_000, k * 2_000_000 + 3_000_000
        for r in o:
            if d_lo <= r.o_orderdate < d_hi and p_lo <= r.cents < p_hi:
                expected[k][0] += 1
                expected[k][1] += r.cents
    got = {r.campaign_id: (r.n_orders, r.revenue_cents) for r in rows}
    assert got == {k: tuple(v) for k, v in expected.items() if v[0] > 0}


def test_grid_join_plan_has_no_cartesian(spark):
    df = registry.queries()["join_grid_box_containment"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ewma_matches_bruteforce(spark):
    rows = registry.queries()["bars_riskmetrics_ewma_var"](spark, SF).collect()
    assert rows
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
        seqs[r.symbol].append((r.day, r.c))
    expected = {}
    for sym, seq in seqs.items():
        v = None
        for (d0, p), (d1, c) in zip(seq, seq[1:]):
            r = math.floor((c - p) * 10000.0 / p + 0.5)
            v = r * r if v is None else (94 * v + 6 * r * r) // 100
            expected[(sym, d1)] = (r, v)
    assert len(rows) == len(expected)
    for r in rows:
        assert expected[(r.symbol, r.day)] == (r.ret_qbp, r.ewma_var_qbp2)
        assert r.ewma_var_qbp2 >= 0
