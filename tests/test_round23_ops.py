"""Round-23 tests: k-core decomposition."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.queries.relational27 import _KCORE_K, _KCORE_ROUNDS

SF = "/root/testdata/sf0.001"


def test_kcore_monotone_shrink_and_convergence(spark):
    rows = registry.queries()["graph_kcore_decomposition"](spark, SF).collect()
    assert len(rows) == _KCORE_ROUNDS + 1
    edges = [r.n_edges for r in rows]
    assert edges == sorted(edges, reverse=True), "peeling can only shrink"
    # once two consecutive rounds agree the set is a fixed point forever
    for i in range(1, len(rows) - 1):
        if rows[i].n_edges == rows[i - 1].n_edges:
            assert rows[i + 1].n_edges == rows[i].n_edges


def test_kcore_final_set_satisfies_degree_bound(spark):
    """Every node surviving the final round has degree >= k within the
    surviving edge set (the defining k-core property, brute-forced)."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    edges = [(r.l_suppkey, r.l_partkey) for r in li.select("l_suppkey", "l_partkey").distinct().collect()]
    cur = set(edges)
    for _ in range(_KCORE_ROUNDS):
        from collections import Counter

        ds = Counter(s for s, _ in cur)
        dp = Counter(p for _, p in cur)
        cur = {(s, p) for s, p in cur if ds[s] >= _KCORE_K and dp[p] >= _KCORE_K}
    rows = registry.queries()["graph_kcore_decomposition"](spark, SF).collect()
    final = rows[-1]
    assert final.n_edges == len(cur)
    assert final.n_suppliers == len({s for s, _ in cur})
    assert final.n_parts == len({p for _, p in cur})
    if cur:
        from collections import Counter

        ds = Counter(s for s, _ in cur)
        dp = Counter(p for _, p in cur)
        assert min(ds.values()) >= _KCORE_K and min(dp.values()) >= _KCORE_K
