"""Round-11 plan assertions: the coverage rewrite's single shuffle,
LTTB's broadcast centroid joins, ahash signature-only shuffle."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _executed(spark, name):
    df = registry.queries()[name](spark, SF)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]


def test_interval_coverage_single_data_shuffle(spark):
    """After the round-6 rewrite the full-data path has exactly one
    exchange (the user_id window); only the final bounded rollup may
    add more. Guard: at most 2 exchanges total, no island-id
    re-shuffle of raw rows."""
    plan = _executed(spark, "interval_union_coverage")
    n_exchanges = plan.count("Exchange ")
    assert n_exchanges <= 2, f"expected <=2 exchanges, saw {n_exchanges}:\n{plan}"
    assert "island_id" not in plan


def test_lttb_centroids_broadcast(spark):
    plan = _executed(spark, "timeseries_lttb_downsample")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ahash_join_is_signature_keyed(spark):
    """The self-join must key on the 8-byte signature, never
    broadcast-nested-loop over payloads."""
    plan = _executed(spark, "multimodal_ahash_neardup")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "ahash" in plan


def test_pairs_spread_stats_broadcast(spark):
    plan = _executed(spark, "bars_pairs_spread")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
