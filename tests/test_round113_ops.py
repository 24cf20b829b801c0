"""Round-112 tests: edge triangle support, Theil MSE decomposition."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_edge_triangle_support_matches_bruteforce(spark):
    (row,) = registry.queries()["graph_edge_triangle_support"](spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    ).collect()
    per_order = defaultdict(set)
    for r in li:
        per_order[r.l_orderkey].add(r.l_suppkey)
    edges0 = set()
    for ss in per_order.values():
        ss = sorted(ss)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                edges0.add((ss[i], ss[j]))
    deg = defaultdict(int)
    for u, v in edges0:
        deg[u] += 1
        deg[v] += 1
    keep = {n for n, d in deg.items() if d <= 40}
    edges = {(u, v) for u, v in edges0 if u in keep and v in keep}
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
    support = defaultdict(int)
    for u, v in edges:
        for w in adj[v]:
            if w in adj[u]:
                support[(u, v)] += 1
                support[(v, w)] += 1
                support[(u, w)] += 1
    assert row.n_edges == len(edges)
    assert row.n_bridge_like == sum(1 for e in edges if support[e] == 0)
    assert row.support_sum == sum(support[e] for e in edges)
    assert row.max_support == (max(support.values()) if support else 0)
    # identity: total support = 3 x triangle count
    assert row.support_sum % 3 == 0


def test_theil_decomposition_matches_and_sums_to_one(spark):
    rows = registry.queries()["forecast_theil_mse_decomposition"](spark, SF).collect()
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
        pairs = [(cs[i], cs[i - 7]) for i in range(7, len(cs))]
        n = len(pairs)
        sa = sum(a for a, _ in pairs)
        sf_ = sum(f for _, f in pairs)
        saa = sum(a * a for a, _ in pairs)
        sff = sum(f * f for _, f in pairs)
        saf = sum(a * f for a, f in pairs)
        sse = sum((a - f) ** 2 for a, f in pairs)
        mse = sse / n
        mdiff = sf_ / n - sa / n
        sd_f = math.sqrt((sff - sf_ * sf_ / n) / n)
        sd_a = math.sqrt((saa - sa * sa / n) / n)
        cov = (saf - sa * sf_ / n) / n
        assert (r.n_obs, r.sse_cents2) == (n, sse)
        assert r.bias_share_micro == math.floor(mdiff**2 / mse * 1e6 + 0.5)
        assert r.variance_share_micro == math.floor((sd_f - sd_a) ** 2 / mse * 1e6 + 0.5)
        assert r.covariance_share_micro == math.floor(
            2 * (sd_f * sd_a - cov) / mse * 1e6 + 0.5
        )
        # the three shares are a decomposition of 1 (up to quantization)
        total = r.bias_share_micro + r.variance_share_micro + r.covariance_share_micro
        assert abs(total - 1_000_000) <= 3
