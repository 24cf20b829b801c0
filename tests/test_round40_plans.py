"""Plan-shape assertions for the round-30..47 operators."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _executed(spark, name):
    df = registry.queries()[name](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_psi_edges_broadcast_back(spark):
    plan = _executed(spark, "ml_population_stability_index")
    assert "BroadcastNestedLoopJoin BuildRight, Cross" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_walk_forward_models_broadcast(spark):
    plan = _executed(spark, "ml_walk_forward_cv")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_integrity_single_fact_pass(spark):
    """One scan, one day-keyed aggregate — no joins at all."""
    plan = _executed(spark, "etl_row_hash_integrity")
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1  # matches FileScan too


def test_volume_profile_two_window_one_shuffle_family(spark):
    plan = _executed(spark, "bars_volume_profile")
    assert "CartesianProduct" not in plan


def test_matrix_power_iterates_on_broadcast_edge_list(spark):
    """Every squaring joins broadcast edge lists — the states^2 table
    never rides a shuffle join."""
    plan = _executed(spark, "events_markov_matrix_power")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_decay_engagement_head_broadcast(spark):
    plan = _executed(spark, "events_decay_engagement")
    assert "BroadcastNestedLoopJoin BuildRight, Cross" in plan
    assert plan.count("Exchange hashpartitioning") <= 1
