"""Round-105 tests: seasonal strength indices, Bartlett test."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_strength_indices_matches_bruteforce(spark):
    rows = registry.queries()["timeseries_strength_indices"](spark, SF).collect()
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
    for r in rows:
        seq = seqs[r.symbol]
        n = len(seq)
        xs = list(range(1, n + 1))
        cs = [c for _, c in seq]
        dows = [d.isoweekday() % 7 + 1 for d, _ in seq]  # Spark dayofweek: Sun=1
        sx, sy = sum(xs), sum(cs)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, cs))
        b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        a = (sy - b * sx) / n
        d_m = [math.floor((y - (a + b * x)) * 1000 + 0.5) for x, y in zip(xs, cs)]
        by_dow = defaultdict(list)
        for dm, dow in zip(d_m, dows):
            by_dow[dow].append(dm)

        def tdiv(aa, bb):
            q = abs(aa) // abs(bb)
            return q if (aa >= 0) == (bb >= 0) else -q

        s_m = {dow: tdiv(sum(v), len(v)) for dow, v in by_dow.items()}
        r_m = [dm - s_m[dow] for dm, dow in zip(d_m, dows)]
        sdd, sd = sum(x * x for x in d_m), sum(d_m)
        srr, sr = sum(x * x for x in r_m), sum(r_m)
        var_d = sdd - sd * sd / n
        var_r = srr - sr * sr / n
        strength = math.floor(max(0.0, 1 - var_r / var_d) * 1e6 + 0.5)
        assert (r.n_days, r.detrended_ss, r.residual_ss) == (n, sdd, srr)
        assert r.seasonal_strength_micro == strength
        assert 0 <= r.seasonal_strength_micro <= 1_000_000


def test_bartlett_matches_bruteforce(spark):
    (row,) = registry.queries()["stats_bartlett_test"](spark, SF).collect()
    c = spark.read.parquet(f"{SF}/customer.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    pts = (
        c.join(o, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100").alias("v"),
        )
        .collect()
    )
    per = defaultdict(list)
    for r in pts:
        per[r.seg].append(r.v)
    k = len(per)
    nn = sum(len(v) for v in per.values())
    sum_nlnv = 0
    pooled_milli = 0
    sum_inv_nano = 0
    for vs in per.values():
        n = len(vs)
        s, ss = sum(vs), sum(v * v for v in vs)
        cs = ss - s * s / n
        sum_nlnv += math.floor((n - 1) * math.log(cs / (n - 1)) * 1e6 + 0.5)
        pooled_milli += math.floor(cs * 1000 + 0.5)
        sum_inv_nano += math.floor(1e9 / (n - 1) + 0.5)
    t = (
        (nn - k) * math.log(pooled_milli / 1000 / (nn - k)) - sum_nlnv / 1e6
    ) / (1 + (sum_inv_nano / 1e9 - 1.0 / (nn - k)) / (3 * (k - 1)))
    assert (row.n_groups, row.n_rows) == (k, nn)
    assert row.bartlett_t_milli == math.floor(t * 1000 + 0.5)
    assert row.bartlett_t_milli >= 0
