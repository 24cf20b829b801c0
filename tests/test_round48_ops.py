"""Round-48 tests: count_if battery, pairwise cosine histogram."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_count_if_battery_semantics(spark):
    rows = registry.queries()["agg_count_if_every_any"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.all_positive == 1  # totalprice always positive
        assert r.all_in_range == 1  # fixture dates start 1995
        assert r.n_finished >= 0
        assert r.any_whale in (0, 1)


def test_pair_histogram_counts_all_sampled_pairs(spark):
    from us_stock_data_pipeline_spark.queries.relational33 import _PAIR_MOD

    rows = registry.queries()["embedding_pairwise_cosine_histogram"](spark, SF).collect()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.filter(f"vec_id % {_PAIR_MOD} = 0").count()
    assert sum(r.n_pairs for r in rows) == n * (n - 1) // 2
    for r in rows:
        assert -10 <= r.cos_decile <= 10
