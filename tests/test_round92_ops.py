"""Round-92 tests: relative rotation quadrants, t-closeness EMD."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_rrg_matches_bruteforce(spark):
    rows = registry.queries()["bars_relative_rotation"](spark, SF).collect()
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
    idx = {
        s: [(d, c * 10000 // seq[0][1]) for d, c in seq] for s, seq in seqs.items()
    }
    by_day = defaultdict(list)
    for s, seq in idx.items():
        for d, v in seq:
            by_day[d].append(v)
    bench = {d: sum(vs) // len(vs) for d, vs in by_day.items()}
    expected = {}
    for s, seq in idx.items():
        rss = [(d, v - bench[d]) for d, v in seq]
        for i in range(5, len(rss)):
            d, rs = rss[i]
            mom = rs - rss[i - 5][1]
            quad = (
                "leading" if rs >= 0 and mom >= 0
                else "weakening" if rs >= 0
                else "lagging" if mom < 0
                else "improving"
            )
            expected[(s, d)] = (rs, mom, quad)
    assert len(rows) == len(expected)
    for r in rows:
        assert expected[(r.symbol, r.day)] == (r.rs_bp, r.mom_bp, r.quadrant)


def test_tcloseness_matches_bruteforce(spark):
    rows = registry.queries()["privacy_t_closeness_emd"](spark, SF).collect()
    assert rows
    c = spark.read.parquet(f"{SF}/customer.parquet")
    n = spark.read.parquet(f"{SF}/nation.parquet")
    binned = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            F.least(
                F.greatest(
                    F.expr("(CAST(round(c_acctbal * 100) AS BIGINT) + 100000) * 10 div 1100000"),
                    F.lit(0),
                ),
                F.lit(9),
            ).alias("bin"),
        )
        .collect()
    )
    cls = defaultdict(lambda: [0] * 10)
    glob = [0] * 10
    for r in binned:
        cls[(r.nation, r.segment)][r.bin] += 1
        glob[r.bin] += 1
    N = len(binned)
    results = {}
    for key, hist in cls.items():
        n_cls = sum(hist)
        cum_c = cum_g = 0
        gap_sum = 0
        for j in range(10):
            cum_c += hist[j]
            cum_g += glob[j]
            gap_sum += abs(cum_c * N - cum_g * n_cls)
        emd = math.floor(gap_sum / 9 / n_cls / N * 1e6 + 0.5)
        results[key] = (n_cls, gap_sum, emd)
    top = sorted(results.items(), key=lambda kv: (-kv[1][2], kv[0]))[:20]
    got = [((r.nation, r.segment), (r.n_class, r.gap_scaled_sum, r.emd_micro)) for r in rows]
    assert got == top
    for _, (_, _, emd) in got:
        assert 0 <= emd <= 1_000_000  # EMD on [0,1]-normalized support
