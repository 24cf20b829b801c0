"""Round-8 plan-shape assertions: pin the physical-plan properties the
round-6 scale fixes and the newest heavy joins claim (VERDICT r5 item 7).
"""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _executed(spark, name):
    df = registry.queries()[name](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_pvm_bridge_no_cartesian_and_part_broadcasts(spark):
    """The year-pair self-join is on the tiny (type, year) aggregate;
    the part dim join on the fact side must broadcast — never a
    cartesian anywhere."""
    plan = _executed(spark, "lineitem_pvm_bridge")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_supplier_scorecard_no_cartesian(spark):
    plan = _executed(spark, "supplier_weighted_scorecard")
    assert "CartesianProduct" not in plan


def test_fuzzy_dedup_banded_equi_join(spark):
    """The tolerance predicates must ride as an equi-join on the
    (cust, bin, fbin) block key — a SortMergeJoin/ShuffledHashJoin
    with all three keys, never a cartesian or a broadcast nested
    loop over the corpus."""
    plan = _executed(spark, "dedup_fuzzy_transactions")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the fortnight bucket is part of the join key, not a post-filter
    assert "fbin" in plan


def test_link_prediction_hot_cap_anti_join(spark):
    """r14 contract: the frequent-neighbor cutoff is a size filter on
    the part-keyed collect_set rollup (no anti-join needed — the set
    size IS the degree) and candidate pairs expand in-row (Generate);
    the 1-row audit cross join must be broadcast (no CartesianProduct)
    and the pair path must not sort-merge."""
    df = registry.queries()["graph_link_prediction_jaccard"](spark, SF)
    df.collect()
    full = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in full.split("== Initial Plan ==")[0]
    assert "collect_set" in full
    assert "Generate explode" in full
    assert "SortMergeJoin" not in full.split("== Initial Plan ==")[0]


def test_whale_concentration_no_cartesian(spark):
    plan = _executed(spark, "orders_whale_concentration")
    assert "CartesianProduct" not in plan
