"""Round-101 tests: Friedman test, Cohen's d / Hedges' g."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_friedman_matches_bruteforce(spark):
    (row,) = registry.queries()["stats_friedman_test"](spark, SF).collect()
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
    rets = defaultdict(dict)  # day -> symbol -> r
    for sym, seq in seqs.items():
        for (d0, p), (d1, c) in zip(seq, seq[1:]):
            rets[d1][sym] = math.floor((c - p) * 10000.0 / p + 0.5)
    k = len(seqs)
    blocks = {d: m for d, m in rets.items() if len(m) == k}
    r2 = defaultdict(int)
    a4 = 0
    for d, m in blocks.items():
        order = sorted(m.items(), key=lambda kv: (kv[1], kv[0]))
        rn = {sym: i + 1 for i, (sym, _) in enumerate(order)}
        groups = defaultdict(list)
        for sym, v in m.items():
            groups[v].append(rn[sym])
        for sym, v in m.items():
            g = groups[v]
            rank2 = min(g) + max(g)
            r2[sym] += rank2
            a4 += rank2 * rank2
    n = len(blocks)
    ss = sum((v - n * (k + 1)) ** 2 for v in r2.values())
    chi2 = (k - 1) * ss / (a4 - n * k * (k + 1) ** 2)
    assert (row.n_blocks, row.k_treatments) == (n, k)
    assert row.friedman_chi2_milli == math.floor(chi2 * 1000 + 0.5)
    assert 0 <= row.friedman_chi2_milli


def test_cohens_d_matches_bruteforce(spark):
    (row,) = registry.queries()["stats_cohens_d_effect"](spark, SF).collect()
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("g"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100").alias("v"),
    ).collect()
    g1 = [r.v for r in o if r.g]
    g2 = [r.v for r in o if not r.g]
    n1, n2 = len(g1), len(g2)
    m1, m2 = sum(g1) / n1, sum(g2) / n2
    ssq1 = sum(v * v for v in g1) - sum(g1) ** 2 / n1
    ssq2 = sum(v * v for v in g2) - sum(g2) ** 2 / n2
    d = (m1 - m2) / math.sqrt((ssq1 + ssq2) / (n1 + n2 - 2))
    assert (row.n_urgent, row.n_standard) == (n1, n2)
    assert row.cohens_d_micro == math.floor(d * 1e6 + 0.5)
    g = d * (1 - 3.0 / (4 * (n1 + n2) - 9))
    assert row.hedges_g_micro == math.floor(g * 1e6 + 0.5)
    # the correction shrinks magnitude
    assert abs(row.hedges_g_micro) <= abs(row.cohens_d_micro)
