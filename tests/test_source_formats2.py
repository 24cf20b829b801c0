"""Round-5 batch-3 tests: schema evolution, partition pruning, the
quarantine gate, and the relational8 additions."""

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


# --------------------------------------------------------------------------
# schema evolution
# --------------------------------------------------------------------------


def test_schema_evolution_merges_to_superset(spark):
    """The merged read must expose the evolved column; pre-evolution
    rows must surface with NULLs, not be dropped."""
    r = _rows(spark, "etl_schema_evolution")[0]
    n_events = load_table(spark, SF, "events").count()
    assert r["n_rows"] == n_events
    assert r["n_with_type"] == r["n_evolved"]  # only v2 rows carry the column
    assert 0 < r["n_evolved"] < r["n_rows"]


# --------------------------------------------------------------------------
# partition pruning
# --------------------------------------------------------------------------


def test_partitioned_scan_prunes_partitions(spark):
    """The event_type filter must land in PartitionFilters (file-listing
    pruning), NOT PushedFilters (row-group filtering after listing)."""
    plan = _executed(spark, "source_partitioned_scan")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, "no PartitionFilters in scan node"
    assert "event_type" in m.group(1)


def test_partitioned_scan_counts_match_direct(spark):
    got = {r["event_type"]: r["n_events"] for r in _rows(spark, "source_partitioned_scan")}
    ev = load_table(spark, SF, "events")
    want = {
        r["event_type"]: r["n"]
        for r in ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# quarantine gate
# --------------------------------------------------------------------------


def test_quarantine_counts_are_consistent(spark):
    r = _rows(spark, "etl_quarantine_validation")[0]
    assert r["n_total"] == load_table(spark, SF, "events").count()
    # clean + at-least-one-violation partitions the corpus
    n_viol_rows = r["n_total"] - r["n_clean"]
    assert 0 < n_viol_rows < r["n_total"]
    # inclusion-exclusion sanity: per-rule sums >= distinct violating rows
    assert r["n_value_viol"] + r["n_user_viol"] + r["n_type_viol"] >= n_viol_rows
    assert r["n_multi_viol"] >= 0


def test_quarantine_is_single_pass_no_join(spark):
    plan = _executed(spark, "etl_quarantine_validation")
    assert "Join" not in plan
    assert plan.count("Scan parquet") <= 2  # AQE may print the tree twice


# --------------------------------------------------------------------------
# relational8: mode / means / forward as-of / DAU-WAU
# --------------------------------------------------------------------------


def test_mode_window_runs_on_aggregated_state_only(spark):
    """The ranking window's input is the counted (group, bucket) table —
    the only corpus-sized shuffle is the groupBy's."""
    plan = _executed(spark, "agg_mode_exact")
    keys = re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
    assert all("event_type" in k for k in keys), keys


def test_pythagorean_inequality(spark):
    """HM <= GM <= AM for positive inputs — the defining property."""
    for r in _rows(spark, "agg_pythagorean_means"):
        assert r["harm_mean"] <= r["geo_mean"] <= r["arith_mean"], r


def test_asof_forward_and_backward_bracket_each_purchase(spark):
    """For every purchase: last_click_ts <= ts <= next_click_ts (when
    both exist) — the two as-of directions must be consistent."""
    back = {r["event_id"]: r for r in _rows(spark, "join_asof")}
    fwd = {r["event_id"]: r for r in _rows(spark, "join_asof_forward")}
    assert back.keys() == fwd.keys()
    for eid, b in back.items():
        f = fwd[eid]
        if b["last_click_ts"] is not None:
            assert b["last_click_ts"] <= b["ts"]
        if f["next_click_ts"] is not None:
            assert f["next_click_ts"] >= f["ts"]


def test_asof_forward_is_windowed_union_not_join(spark):
    plan = _executed(spark, "join_asof_forward")
    assert "Join" not in plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys == {"user_id"}, keys


def test_dau_wau_bounds(spark):
    """DAU <= WAU always; stickiness in (0, 1]."""
    for r in _rows(spark, "events_rolling_dau_wau"):
        assert r["dau"] <= r["wau"]
        assert 0.0 < r["stickiness"] <= 1.0
