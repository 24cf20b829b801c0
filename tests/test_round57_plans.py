"""Round-57 plan assertions for the round-52..55 operators: the
Gram-matrix single pass, the CCF equi-join, Adamic-Adar's broadcast
weights, and the range-volatility two-level aggregate."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _executed(spark, name):
    df = registry.queries()[name](spark, SF)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]


def test_ridge_gram_is_single_aggregate_no_join(spark):
    """The normal-equations pass must be one partial+final aggregate
    over the fact scan — no join, no window, and exactly one exchange
    (the final single-partition reduce)."""
    plan = _executed(spark, "ml_ridge_normal_equations")
    assert "Join" not in plan
    assert "Window" not in plan
    n_exchanges = plan.count("Exchange ")
    assert n_exchanges <= 1, f"expected <=1 exchange, saw {n_exchanges}:\n{plan}"


def test_cross_correlation_is_equi_join_not_cartesian(spark):
    """The (day+lag) alignment must plan as a hash/sort-merge equi
    join; a cartesian or broadcast-nested-loop over returns would be
    quadratic in the tape."""
    plan = _executed(spark, "timeseries_cross_correlation")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan.replace(
        "BroadcastNestedLoopJoin BuildRight, Cross", "", 1
    )  # the 7-row lag fan-out may ride a nested-loop cross; returns must not


def test_adamic_adar_weights_broadcast_no_cartesian(spark):
    """r14 contract: the whole pair stage is join-free — the distinct
    edge set, degree, hot cap and 1/ln weight read off ONE part-keyed
    collect_set rollup and the C(k,2) pairs expand in-row (Generate).
    Only the 1-row audit attach may join, and it must be broadcast:
    no cartesian, no sort-merge ANYWHERE in the plan."""
    plan = _executed(spark, "graph_adamic_adar")
    assert "Generate explode" in plan  # in-row pair expansion survives
    assert "collect_set" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_range_volatility_two_level_tree(spark):
    """Daily OHLC then per-symbol: two aggregates, no window, no
    join; partial aggregation must appear (map-side combine)."""
    plan = _executed(spark, "bars_range_volatility")
    assert "Join" not in plan
    assert "Window" not in plan
    assert "partial" in plan.lower()


def test_intraday_seasonality_single_tape_window(spark):
    """Exactly one WIDE window over the tape (the lag); the share
    denominator is a window over the post-aggregate 24-rows-per-symbol
    frame, so the raw events must be window-sorted once, not twice."""
    plan = _executed(spark, "bars_intraday_seasonality")
    assert plan.count("windowspecdefinition(event_type") <= 2  # lag fn + its spec echo
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
