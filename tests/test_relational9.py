"""Round-5 batch-7 tests (relational9)."""

from __future__ import annotations

import re

from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.catalog import load_table

SF = "/root/testdata/sf0.001"


def _executed(spark, name):
    df = registry.queries()[name](spark, SF)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def _rows(spark, name):
    return registry.queries()[name](spark, SF).collect()


def test_struct_ops_no_join_and_leaf_pruned_scan(spark):
    """Struct work is pure expressions; the scan must not read columns
    the struct never touches (c_address, c_phone...)."""
    plan = _executed(spark, "scalar_struct_ops")
    assert "Join" not in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "c_address" not in read and "c_comment" not in read


def test_struct_uplift_is_10pct_floor(spark):
    rows = _rows(spark, "scalar_struct_ops")
    cust = {
        r["c_custkey"]: r["c_acctbal"]
        for r in load_table(spark, SF, "customer").select("c_custkey", "c_acctbal").collect()
    }
    for r in rows[:100]:
        c = round(cust[r["c_custkey"]] * 100) * 110
        # truncation-toward-zero, matching Spark `div` and DuckDB `//`
        want = c // 100 if c >= 0 else -((-c) // 100)
        assert abs(r["p_bal_uplifted"] - want / 100.0) < 1e-9


def test_covariance_matrix_upper_triangle_complete(spark):
    rows = _rows(spark, "agg_covariance_matrix")
    assert len(rows) == 10  # C(4,2) + 4 diagonal
    for r in rows:
        assert r["var_a"] <= r["var_b"]
        if r["var_a"] == r["var_b"]:
            assert r["cov"] >= 0  # variance on the diagonal
            assert abs(r["corr"] - 1.0) < 1e-6


def test_covariance_is_joinless_single_pass(spark):
    plan = _executed(spark, "agg_covariance_matrix")
    assert "Join" not in plan
    assert plan.count("Scan parquet") <= 2  # AQE may print the tree twice


def test_m4_bounds_and_single_shuffle(spark):
    rows = _rows(spark, "timeseries_m4_downsample")
    n_events = load_table(spark, SF, "events").count()
    assert sum(r["n_points"] for r in rows) == n_events
    for r in rows:
        assert r["v_min"] <= r["v_first"] <= r["v_max"]
        assert r["v_min"] <= r["v_last"] <= r["v_max"]
    plan = _executed(spark, "timeseries_m4_downsample")
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys == {"event_type"}, keys  # windows + groupBy share it


def test_triangle_count_consistent(spark):
    r = _rows(spark, "graph_triangle_count")[0]
    assert r["n_nodes"] <= 25
    # undirected simple graph bounds
    max_edges = r["n_nodes"] * (r["n_nodes"] - 1) // 2
    assert 0 < r["n_edges"] <= max_edges
    max_tri = r["n_nodes"] * (r["n_nodes"] - 1) * (r["n_nodes"] - 2) // 6
    assert 0 <= r["n_triangles"] <= max_tri
    assert 0.0 <= r["transitivity"] <= 1.0


def test_interval_burst_counts_include_self(spark):
    """Every surviving row's 24h count includes itself and is >= 3 by
    the threshold; counts ride one user_id exchange."""
    rows = registry.queries()["window_interval_burst"](spark, SF).collect()
    assert rows
    for r in rows[:200]:
        assert r["n_24h"] >= 3
    plan = _executed(spark, "window_interval_burst")
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys == {"user_id"}, keys


def test_asof_tolerance_is_subset_of_unbounded(spark):
    """Tolerance matches must equal the unbounded as-of match whenever
    that match is within the horizon, and NULL whenever it is older."""
    unb = {r["event_id"]: r["last_click_ts"] for r in registry.queries()["join_asof"](spark, SF).collect()}
    tol = {r["event_id"]: r for r in registry.queries()["join_asof_tolerance"](spark, SF).collect()}
    assert unb.keys() == tol.keys()
    import datetime
    hour = datetime.timedelta(hours=1)
    for eid, r in tol.items():
        full = unb[eid]
        if r["last_click_1h"] is not None:
            assert r["last_click_1h"] == full
            assert r["ts"] - r["last_click_1h"] <= hour
        elif full is not None:
            assert r["ts"] - full > hour


def test_novelty_first_doc_is_fully_novel_and_shares_bounded(spark):
    rows = registry.queries()["text_ngram_novelty"](spark, SF).collect()
    by_id = {r["doc_id"]: r for r in rows}
    first = by_id[min(by_id)]
    assert first["novelty"] == 1.0  # the earliest doc introduces all its grams
    for r in rows:
        assert 0.0 <= r["novelty"] <= 1.0
        assert 0 <= r["n_novel"] <= r["n_grams"]
