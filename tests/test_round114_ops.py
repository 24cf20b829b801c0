"""Round-113 tests: BCG quadrants, turning-point test."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _tdiv(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_bcg_matches_bruteforce(spark):
    rows = registry.queries()["orders_bcg_growth_share"](spark, SF).collect()
    assert rows
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    p = spark.read.parquet(f"{SF}/part.parquet")
    joined = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(p, p.p_partkey == li.l_partkey)
        .select(
            "p_brand",
            F.year("o_orderdate").alias("y"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        )
        .collect()
    )
    y1 = max(r.y for r in joined)
    rev = defaultdict(lambda: [0, 0])
    for r in joined:
        if r.y == y1:
            rev[r.p_brand][0] += r.cents
        elif r.y == y1 - 1:
            rev[r.p_brand][1] += r.cents
    rev = {b: v for b, v in rev.items() if v[1] > 0}
    t1 = sum(v[0] for v in rev.values())
    assert len(rows) == len(rev)
    for r in rows:
        r1, r0 = rev[r.brand]
        growth = _tdiv((r1 - r0) * 10000, r0)
        share = r1 * 10000 // t1
        assert (r.rev_latest_cents, r.rev_prior_cents) == (r1, r0)
        assert (r.growth_bp, r.share_bp) == (growth, share)
        quad = (
            "star" if growth >= 0 and share >= 400
            else "question_mark" if growth >= 0
            else "cash_cow" if share >= 400
            else "dog"
        )
        assert r.quadrant == quad
    # shares across brands sum to ~100%
    assert abs(sum(r.share_bp for r in rows) - 10000) <= len(rows)


def test_turning_point_matches_bruteforce(spark):
    rows = registry.queries()["stats_turning_point_test"](spark, SF).collect()
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
        seqs[r.symbol].append(r.c)
    for r in rows:
        cs = seqs[r.symbol]
        rets = [math.floor((c - p) * 10000.0 / p + 0.5) for p, c in zip(cs, cs[1:])]
        tps = sum(
            1
            for i in range(1, len(rets) - 1)
            if (rets[i] > rets[i - 1] and rets[i] > rets[i + 1])
            or (rets[i] < rets[i - 1] and rets[i] < rets[i + 1])
        )
        n = len(rets)
        inner = n - 2
        assert (r.n_obs, r.n_turning_points) == (n, tps)
        z = (tps - 2.0 * inner / 3) / math.sqrt((16.0 * n - 29) / 90)
        assert r.z_milli == math.floor(z * 1000 + 0.5)
