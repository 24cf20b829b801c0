"""Plan-quality regression tests: the physical plans the 100 TB design
depends on (docs/SCALE.md). A correctness-preserving code change that
regresses one of these (a lost broadcast, a filter that stops pushing,
a top-k that starts globally sorting) fails here, not in production."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _executed(spark, name):
    df = registry.queries()[name](spark, SF)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_and_projection_reach_scan(spark):
    plan = _executed(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 7 needed columns, not all 11
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read and "l_partkey" not in read


def test_dim_joins_broadcast(spark):
    for name in ["join_broadcast_dim", "q5_local_supplier_volume", "join_multiway_chain"]:
        plan = _executed(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_topk_uses_window_group_limit_and_take_ordered(spark):
    plan = _executed(spark, "window_rank_topn")
    assert "WindowGroupLimit" in plan  # per-group top-N pushed below shuffle
    plan2 = _executed(spark, "topk_global")
    assert "TakeOrderedAndProject" in plan2  # no global sort materialized


def test_knn_corpus_never_shuffles(spark):
    """Brute-force kNN must broadcast the query side; the corpus flows
    map-side into the scoring — only the tiny scored result shuffles for
    the per-query window."""
    plan = _executed(spark, "knn_bruteforce_cosine")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    pre = plan.split("Join")[0]  # above the join: window machinery only
    assert "embeddings.parquet" not in pre


def test_minhash_no_cartesian(spark):
    plan = _executed(spark, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
