"""Round-5 batch-4 tests (analytics_ops2): semantic properties beyond
the value-hash oracles."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.catalog import load_table

SF = "/root/testdata/sf0.001"


def _executed(spark, name):
    df = registry.queries()[name](spark, SF)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def _rows(spark, name):
    return registry.queries()[name](spark, SF).collect()


def test_higher_moments_single_pass_no_join(spark):
    """All five accumulators ride one groupBy: no join, one event_type
    exchange."""
    plan = _executed(spark, "agg_higher_moments")
    assert "Join" not in plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys == {"event_type"}, keys


def test_higher_moments_variance_positive(spark):
    """m2 > 0 and the universal moment inequality
    kurtosis >= skewness^2 + 1, i.e. excess >= skew^2 - 2 — holds for
    EVERY distribution, so a violation means broken moment algebra."""
    for r in _rows(spark, "agg_higher_moments"):
        assert r["m2"] > 0
        assert r["kurtosis_excess"] >= r["skewness_pop"] ** 2 - 2 - 1e-6


def test_pareto_thresholds_monotone_and_gini_range(spark):
    r = _rows(spark, "events_pareto_gini")[0]
    assert 1 <= r["users_for_50pct"] <= r["users_for_80pct"] <= r["users_for_90pct"] <= r["n_users"]
    assert 0.0 <= r["gini"] < 1.0


def test_pareto_window_runs_on_user_table_not_corpus(spark):
    """The cumulative window's single-partition exchange must sit above
    the per-user aggregate, so its input is |users| rows."""
    plan = _executed(spark, "events_pareto_gini")
    final = plan.split("== Initial Plan ==")[0]
    # one user_id hash exchange (corpus groupBy); the SinglePartition
    # exchange feeds the window over aggregated rows only
    assert "hashpartitioning(user_id" in final
    assert "CartesianProduct" not in plan


def test_zipf_slope_negative_with_decent_fit(spark):
    r = _rows(spark, "text_zipf_slope")[0]
    assert r["zipf_slope"] < 0  # frequency decreases with rank, always
    assert 0.0 <= r["fit_r2"] <= 1.0
    assert r["n_terms"] > 10  # sf0.001's vocabulary is only ~30 terms


def test_seasonality_cells_partition_corpus(spark):
    rows = _rows(spark, "events_seasonality_chisq")
    n_events = load_table(spark, SF, "events").count()
    assert sum(r["n"] for r in rows) == n_events
    assert len(rows) <= 168
    for r in rows:
        assert 0 <= r["dow"] <= 6 and 0 <= r["hour"] <= 23
        assert r["chi2_cell"] >= 0
