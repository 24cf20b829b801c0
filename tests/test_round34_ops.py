"""Round-34 tests: Markov matrix power, embedding hubness."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_matrix_power_matches_python_squaring(spark):
    from collections import defaultdict

    from pyspark.sql import Window, functions as F

    rows = {(r.src, r.dst): r.p8_e6 for r in registry.queries()["events_markov_matrix_power"](spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("event_id")
    steps = (
        ev.select("event_type", F.lead("event_type").over(w).alias("nxt"))
        .filter(F.col("nxt").isNotNull())
        .groupBy("event_type", "nxt")
        .count()
        .collect()
    )
    totals = defaultdict(int)
    for s in steps:
        totals[s.event_type] += s["count"]
    t = {(s.event_type, s.nxt): s["count"] * 1_000_000 // totals[s.event_type] for s in steps}

    def square(m):
        out = defaultdict(int)
        for (a, mid1), p1 in m.items():
            for (mid2, b), p2 in m.items():
                if mid1 == mid2:
                    out[(a, b)] += p1 * p2
        return {k: v // 1_000_000 for k, v in out.items()}

    for _ in range(3):
        t = square(t)
    assert rows == {k: v for k, v in t.items()}


def test_matrix_power_rows_near_stochastic(spark):
    from collections import defaultdict

    rows = registry.queries()["events_markov_matrix_power"](spark, SF).collect()
    by_src = defaultdict(int)
    for r in rows:
        by_src[r.src] += r.p8_e6
    for src, tot in by_src.items():
        # quantization loses at most a few e-6 per squaring
        assert 990_000 <= tot <= 1_000_000, (src, tot)


def test_hubness_distribution_conserves_slots(spark):
    from us_stock_data_pipeline_spark.queries.analytics_ops42 import (
        _HUB_K,
        _HUB_QUERY_MOD,
    )

    rows = registry.queries()["embedding_hubness_audit"](spark, SF).collect()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n_queries = emb.filter(f"vec_id % {_HUB_QUERY_MOD} = 0").count()
    total_slots = sum(r.k_occurrence * r.n_vectors for r in rows)
    assert total_slots == n_queries * _HUB_K
