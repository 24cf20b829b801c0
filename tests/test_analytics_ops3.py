"""Round-5 batch-5 tests (analytics_ops3): semantic properties beyond
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


def test_basket_pairs_ordered_and_lift_consistent(spark):
    rows = _rows(spark, "orders_market_basket")
    assert rows
    for r in rows:
        assert r["part_a"] < r["part_b"]
        assert r["pair_supp"] >= 3
        assert 0.0 < r["conf_a_to_b"] <= 1.0
        assert r["lift"] > 0


def test_basket_join_is_basket_keyed_top50_take_ordered(spark):
    """Pair generation must co-partition on the basket key (never an
    all-items cartesian), and the top-50 compiles to
    TakeOrderedAndProject."""
    plan = _executed(spark, "orders_market_basket")
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_rfm_segments_cover_all_customers(spark):
    rows = _rows(spark, "customer_rfm_segments")
    n_cust = load_table(spark, SF, "orders").select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5
        assert r["avg_monetary"] > 0


def test_path_analysis_paths_bounded(spark):
    rows = _rows(spark, "events_path_analysis")
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
    # counts monotone non-increasing by rank
    counts = [r["n"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert 1 <= len(r["path"].split(">")) <= 5


def test_path_total_sessions_conserved(spark):
    """Every session produces exactly one path; the full (unlimited)
    path count must equal the session count."""
    ev = load_table(spark, SF, "events")
    n_sessions = (
        ev.select("user_id", F.to_date("ts").alias("d")).distinct().count()
    )
    # recompute without the top-20 cut, using the same building blocks
    seq = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("s")
    )
    total = seq.count()
    assert total == n_sessions


def test_interarrival_exponential_ish(spark):
    """Event streams are Poisson-ish in the fixture: median/mean should
    sit below 1 (exponential gives ln2~0.69; regular scheduling ~1)."""
    for r in _rows(spark, "events_interarrival_fit"):
        assert r["n_gaps"] > 0
        assert r["mean_s"] > 0
        assert r["median_s"] <= r["p90_s"]
        assert 0.0 < r["median_over_mean"] < 1.5


def test_interarrival_single_shuffle(spark):
    """lag window and groupBy share the event_type exchange."""
    plan = _executed(spark, "events_interarrival_fit")
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys == {"event_type"}, keys
