"""Round-53 tests: Ljung-Box Q test, Adamic-Adar link prediction."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_ljung_box_q_monotone_and_rho_bounded(spark):
    rows = registry.queries()["stats_ljung_box"](spark, SF).collect()
    assert rows
    by_sym: dict[str, list] = {}
    for r in rows:
        by_sym.setdefault(r.symbol, []).append(r)
    for sym, rs in by_sym.items():
        assert [r.lag for r in rs] == [1, 2, 3, 4, 5]
        qs = [r.q_e4 for r in rs]
        # Q accumulates non-negative chi-square terms -> monotone in lag
        assert qs == sorted(qs)
        assert qs[0] >= 0
        for r in rs:
            assert -1_000_000 <= r.rho_e6 <= 1_000_000


def test_adamic_adar_matches_manual_recompute(spark):
    rows = registry.queries()["graph_adamic_adar"](spark, SF).collect()
    assert rows
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    edges = {
        (r.l_suppkey, r.l_partkey)
        for r in li.select("l_suppkey", "l_partkey").distinct().collect()
    }
    pdeg: dict[int, int] = {}
    for _, p in edges:
        pdeg[p] = pdeg.get(p, 0) + 1
    kept = {(s, p) for s, p in edges if pdeg[p] <= 40}
    kdeg: dict[int, int] = {}
    for _, p in kept:
        kdeg[p] = kdeg.get(p, 0) + 1
    by_supp: dict[int, set] = {}
    for s, p in kept:
        by_supp.setdefault(s, set()).add(p)
    top = rows[0]
    common = by_supp[top.s1] & by_supp[top.s2]
    common = {p for p in common if kdeg[p] >= 2}
    want = sum(math.floor(1e9 / math.log(kdeg[p]) + 0.5) for p in common)
    assert top.n_common == len(common)
    assert top.aa_e9 == want
    # scores are presented best-first
    scores = [r.aa_e9 for r in rows]
    assert scores == sorted(scores, reverse=True)
