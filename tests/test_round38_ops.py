"""Round-38 tests: assortativity, SQL PIVOT clause."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_assortativity_matches_numpy(spark):
    import numpy as np

    r = registry.queries()["graph_assortativity"](spark, SF).collect()[0]
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    edges = {(e.l_suppkey, e.l_partkey) for e in li.select("l_suppkey", "l_partkey").collect()}
    from collections import Counter

    ds = Counter(s for s, _ in edges)
    dp = Counter(p for _, p in edges)
    xs = np.array([ds[s] for s, p in sorted(edges)], float)
    ys = np.array([dp[p] for s, p in sorted(edges)], float)
    want = np.corrcoef(xs, ys)[0, 1]
    assert r.n_edges == len(edges)
    assert abs(r.assortativity_e6 / 1e6 - want) < 1e-3


def test_pivot_clause_counts_conserved(spark):
    rows = registry.queries()["sql_pivot_clause"](spark, SF).collect()
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert sum(r.f_orders + r.o_orders + r.p_orders for r in rows) == n_orders
