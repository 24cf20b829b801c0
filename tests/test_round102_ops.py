"""Round-102 tests: volatility cones, rank-policy pin."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_volatility_cones_matches_bruteforce(spark):
    rows = registry.queries()["bars_volatility_cones"](spark, SF).collect()
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
        h = r.horizon
        vols = []
        for i in range(h - 1, len(rets)):
            win = rets[i - h + 1: i + 1]
            s, ss = sum(win), sum(x * x for x in win)
            vols.append(math.floor(math.sqrt((ss - s * s / h) / h) + 0.5))
        n = len(vols)
        svols = sorted(vols)
        assert r.n_windows == n
        assert r.p10_qbp == svols[(n + 9) // 10 - 1]
        assert r.p50_qbp == svols[(n + 1) // 2 - 1]
        assert r.p90_qbp == svols[(9 * n + 9) // 10 - 1]
        assert (r.min_qbp, r.max_qbp) == (svols[0], svols[-1])
        # the cone is ordered
        assert r.min_qbp <= r.p10_qbp <= r.p50_qbp <= r.p90_qbp <= r.max_qbp


def test_rank_policy_invariants(spark):
    rows = registry.queries()["window_rank_policy_pin"](spark, SF).collect()
    assert rows
    for r in rows:
        # row_number is a bijection; dense_rank counts distinct bands;
        # rank's max can't exceed row count
        assert r.max_row_number == r.n_rows
        assert r.max_dense_rank <= r.max_rank <= r.n_rows
        # top-10 by row_number is exactly 10 (enough rows per segment)
        assert r.top10_by_rownum == 10
        # ties only widen the other two definitions
        assert r.top10_by_rank >= 10
        assert r.top10_by_dense >= r.top10_by_rank
