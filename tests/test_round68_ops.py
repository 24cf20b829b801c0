"""Round-68 tests: LSH S-curve calibration, graph modularity."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.queries.llm_ops32 import _theory_e4

SF = "/root/testdata/sf0.001"


def test_scurve_theory_column_matches_formula(spark):
    rows = registry.queries()["dedup_lsh_scurve"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.theory_e4 == _theory_e4(r.decile)
        assert 0 <= r.n_collided <= r.n_pairs
        assert r.observed_e4 == r.n_collided * 10_000 // r.n_pairs
    # low-similarity pairs must essentially never collide; if a decile-9
    # bucket exists it must essentially always collide
    for r in rows:
        if r.decile == 0:
            assert r.observed_e4 <= 500
        if r.decile == 9 and r.n_pairs >= 3:
            assert r.observed_e4 >= 9_000


def test_modularity_invariants(spark):
    rows = registry.queries()["graph_modularity"](spark, SF).collect()
    assert rows
    sup = spark.read.parquet(f"{SF}/supplier.parquet")
    n_nations = sup.select("s_nationkey").distinct().count()
    assert len(rows) <= n_nations
    # degree mass sums to 2m and within-edges cannot exceed degree mass
    total_d = sum(r.d_sum for r in rows)
    total_within = sum(r.e_within for r in rows)
    assert total_d % 2 == 0
    m = total_d // 2
    assert total_within <= m
    # modularity is bounded: -0.5 <= Q <= 1
    q = sum(r.q_contrib_e9 for r in rows) / 1e9
    assert -0.5 <= q <= 1.0
