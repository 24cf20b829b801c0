"""Round-60 tests: mutual-kNN reciprocity, Markov entropy rate."""

from __future__ import annotations

import math

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_mutual_knn_bounds_and_edge_count(spark):
    rows = registry.queries()["embedding_mutual_knn"](spark, SF).collect()
    assert rows
    n_vecs_total = sum(r.n_vecs for r in rows)
    emb_count = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert n_vecs_total == emb_count
    for r in rows:
        assert r.n_edges == r.n_vecs * 5
        assert 0 <= r.n_mutual <= r.n_edges
        assert 0 <= r.mutual_e6 <= 1_000_000


def test_entropy_rate_bounded_by_log_states(spark):
    (row,) = registry.queries()["events_entropy_rate"](spark, SF).collect()
    assert row.n_states >= 2
    # 0 <= H <= log2(k) for a k-state chain
    assert 0 <= row.entropy_rate_e6 <= math.log2(row.n_states) * 1_000_000 + 1
    assert row.n_transitions > 0
