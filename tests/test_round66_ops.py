"""Round-66 tests: binseg changepoint, permutation entropy."""

from __future__ import annotations

import itertools
import math

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_binseg_matches_exhaustive_scan(spark):
    (row,) = registry.queries()["timeseries_changepoint_binseg"](spark, SF).collect()
    daily = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
        .orderBy("day")
        .collect()
    )
    xs = [r.cents for r in daily]
    n = len(xs)
    s_all, ss_all = sum(xs), sum(x * x for x in xs)
    best_gain, best_k = -1.0, None
    ps = 0
    for k in range(1, n):
        ps += xs[k - 1]
        gain = ps * ps / k + (s_all - ps) ** 2 / (n - k) - s_all * s_all / n
        if gain > best_gain + 1e-9:
            best_gain, best_k = gain, k
    assert row.n_left == best_k
    assert row.n_right == n - best_k
    assert 0 <= row.gain_ratio_e6 <= 1_000_000
    assert daily[best_k - 1].day == row.split_day


def test_permutation_entropy_manual(spark):
    rows = registry.queries()["timeseries_permutation_entropy"](spark, SF).collect()
    assert rows
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

    def pattern(x0, x1, x2):
        # order of appearance breaks ties: earlier index is "smaller"
        order = sorted(range(3), key=lambda i: ((x0, x1, x2)[i], i))
        return list(itertools.permutations(range(3))).index(tuple(order))

    for row in rows:
        cs = by_sym[row.symbol]
        pats = [pattern(*cs[i : i + 3]) for i in range(len(cs) - 2)]
        n = len(pats)
        from collections import Counter

        counts = Counter(pats)
        total_e9 = sum(
            math.floor(-(c / n) * math.log(c / n) / math.log(6) * 1e9 + 0.5)
            for c in counts.values()
        )
        assert row.n_triples == n
        assert row.n_pats == len(counts)
        assert row.perm_entropy_e6 == total_e9 // 1000
