"""Round-7 plan-shape assertions: the physical-plan properties the
new operators' 100 TB docstrings claim (docs/SCALE.md §7e)."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _executed(spark, name):
    df = registry.queries()[name](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_q9_part_filter_broadcasts(spark):
    plan = _executed(spark, "q9_product_profit")
    assert "BroadcastHashJoin" in plan


def test_pmi_pair_join_not_cartesian(spark):
    plan = _executed(spark, "text_pmi_cooccurrence")
    assert "CartesianProduct" not in plan


def test_js_divergence_no_cartesian_fact_join(spark):
    plan = _executed(spark, "corpus_js_divergence")
    assert "CartesianProduct" not in plan


def test_multi_distinct_uses_expand(spark):
    """Four distinct aggregates over different keys must compile to
    the single-pass Expand plan, not four separate aggregations."""
    plan = _executed(spark, "agg_multi_distinct_expand")
    assert "Expand" in plan


def test_obv_two_exchanges_daily_then_window(spark):
    plan = _executed(spark, "bars_obv")
    assert plan.count("Exchange hashpartitioning") <= 2


def test_survivor_pick_single_fingerprint_exchange(spark):
    plan = _executed(spark, "dedup_survivor_pick")
    assert plan.count("Exchange hashpartitioning") == 1


def test_source_similarity_joins_on_term_key(spark):
    plan = _executed(spark, "text_source_similarity_matrix")
    assert "CartesianProduct" not in plan


def test_segment_transition_shares_user_shuffle(spark):
    plan = _executed(spark, "events_segment_transition")
    # weekly groupBy on (user, wk), lead window on user, final tiny agg
    assert plan.count("Exchange hashpartitioning") <= 3
