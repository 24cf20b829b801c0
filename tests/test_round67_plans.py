"""Round-67 plan assertions for rounds 58-64 operators."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _executed(spark, name):
    df = registry.queries()[name](spark, SF)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]


def test_bitmap_distinct_avoids_expand(spark):
    """The whole point of the bitmap path: exact distinct WITHOUT the
    count-distinct Expand fan-out; two plain hash aggregates."""
    plan = _executed(spark, "agg_bitmap_distinct")
    assert "Expand" not in plan
    assert "bitmap_count" in plan or "bitmap" in plan.lower()
    assert "Join" not in plan


def test_dickey_fuller_single_moment_aggregate(spark):
    plan = _executed(spark, "stats_dickey_fuller")
    assert "Join" not in plan
    assert "partial" in plan.lower()  # map-side combine of the Gram moments


def test_binseg_linear_not_quadratic(spark):
    """One cumulative window + a broadcast total: no O(days^2) join of
    the series against itself."""
    plan = _executed(spark, "timeseries_changepoint_binseg")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # the only nested-loop is the 1-row total broadcast
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_mutual_knn_mutual_join_is_equi(spark):
    """The O(n^2) candidate stage is a deliberate nested-loop over the
    corpus; the MUTUAL edge check must be a hash equi-join on
    (src,dst), never a second quadratic pass."""
    plan = _executed(spark, "embedding_mutual_knn")
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan


def test_delong_touches_docs_once(spark):
    """Scores aggregate once; everything downstream runs at distinct-
    score cardinality (one window, no second tokenize-explode)."""
    plan = _executed(spark, "ml_auc_delong_ci")
    assert plan.count("Generate explode") <= 1
