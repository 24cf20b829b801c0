"""Plan-shape assertions for the driver-round-6 operator additions:
the physical properties their docstrings claim, pinned executable."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _executed(spark, name):
    df = registry.queries()[name](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_grid_box_join_is_hash_join_on_cells(spark):
    """The 2-D box join must run as an equi hash join on grid cells,
    never a cartesian/nested-loop theta join."""
    plan = _executed(spark, "join_grid_box_containment")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_dunning_bigram_join_not_cartesian(spark):
    plan = _executed(spark, "text_dunning_collocations")
    assert "CartesianProduct" not in plan


def test_rich_club_edges_join_not_cartesian(spark):
    plan = _executed(spark, "graph_rich_club")
    assert "CartesianProduct" not in plan


def test_hits_edge_table_persisted(spark):
    """HITS iterates on the aggregated edge list; the plan must reuse
    the cached edges (InMemoryTableScan) instead of re-joining facts
    per half-step."""
    plan = _executed(spark, "graph_hits_hubs_authorities")
    assert "InMemoryTableScan" in plan


def test_mutual_knn_sample_is_bounded(spark):
    """Post-fix invariant: the kNN graph builds over the fixed sample,
    so the pair stage's build side is a broadcast."""
    plan = _executed(spark, "embedding_mutual_knn")
    assert "CartesianProduct" not in plan


def test_multiblock_prefilter_before_levenshtein(spark):
    """The length-difference prefilter must appear in the plan (it
    prunes before the O(n*m) edit-distance DP)."""
    df = registry.queries()["dedup_multiblock_union"](spark, SF)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "levenshtein" in plan
    assert "abs(" in plan and "length(" in plan


def test_safety_stock_dims_broadcast(spark):
    plan = _executed(spark, "orders_safety_stock_rop")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
