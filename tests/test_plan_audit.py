"""Executed-plan regression tests (VERDICT r9 #5): the pushdown /
pruning / broadcast evidence committed in docs/PLAN_AUDIT.md, asserted
in pytest so a regression fails the suite instead of silently editing a
doc.

Uses `tools/plan_audit._audit_plan` — the same extractor the doc is
generated with — against EXECUTED post-AQE plans at sf0.001 (plan shape,
not timing, is under test; AQE decisions like broadcast-hash-join
selection are size-threshold driven and the fixture dims are far below
the 10 MB default at every sf).
"""

from __future__ import annotations

import os
import sys

import pytest

import us_stock_data_pipeline_spark  # noqa: F401 — populates the registry
from us_stock_data_pipeline_spark import registry

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from plan_audit import _audit_plan  # noqa: E402

SF = "/root/testdata/sf0.001"


def _executed_audit(spark, name: str) -> dict:
    # full-width plan metadata: the default 100-char truncation cuts
    # PushedFilters/ReadSchema mid-list and under-reports both
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    q = registry.all_queries()[name]
    df = q.fn(spark, SF)
    df.collect()  # materialize so AQE finalizes the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    return _audit_plan(plan)


# --------------------------------------------------------------------------
# invariant 1: filters reach the parquet scan
# --------------------------------------------------------------------------

# headline queries whose logic filters a scanned table on a pushable
# predicate — at least one scan must carry PushedFilters. A `.cache()`
# inserted between scan and filter (the regression this test exists to
# catch) drops the pushed filter and fails here.
_PUSHDOWN_QUERIES = [
    "filter_conjunctive_range",
    "q6_forecast_revenue",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "join_broadcast_dim",
]


@pytest.mark.parametrize("name", _PUSHDOWN_QUERIES)
def test_filter_pushdown_reaches_scan(spark, name):
    a = _executed_audit(spark, name)
    assert a["scans"] >= 1, f"{name}: expected parquet scans, got {a}"
    assert a["scans_with_pushed_filters"] >= 1, (
        f"{name}: no scan carries PushedFilters — a filter stopped "
        f"reaching the parquet reader: {a}"
    )


# --------------------------------------------------------------------------
# invariant 2: column pruning — no scan over-reads
# --------------------------------------------------------------------------

# fixture tables are 4-16 columns wide; headline queries project 2-7
# columns per table. A scan reading >10 columns means pruning broke.
_PRUNING_QUERIES = [
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "join_multiway_chain",
    "dedup_exact",
    "knn_bruteforce_cosine",
    "text_term_frequency",
]


@pytest.mark.parametrize("name", _PRUNING_QUERIES)
def test_column_pruning_no_overread(spark, name):
    a = _executed_audit(spark, name)
    assert a["read_cols_per_scan"], f"{name}: no ReadSchema extracted: {a}"
    wide = [c for c in a["read_cols_per_scan"] if c > 10]
    assert not wide, (
        f"{name}: scan reads {max(wide)} columns — column pruning "
        f"regressed: {a}"
    )


# --------------------------------------------------------------------------
# invariant 3: dim joins broadcast (no shuffle on the small side)
# --------------------------------------------------------------------------

_BROADCAST_QUERIES = {
    # query -> minimum broadcast exchanges the plan must keep
    "join_broadcast_dim": 1,
    "q5_local_supplier_volume": 3,  # region/nation/supplier dims
    "join_multiway_chain": 2,
    "q3_shipping_priority": 1,
}


@pytest.mark.parametrize("name,min_bcast", sorted(_BROADCAST_QUERIES.items()))
def test_dim_joins_broadcast(spark, name, min_bcast):
    a = _executed_audit(spark, name)
    assert a["broadcast_exchanges"] >= min_bcast, (
        f"{name}: expected >= {min_bcast} broadcast exchanges, plan has "
        f"{a['broadcast_exchanges']} — a dim join fell back to shuffle: {a}"
    )


# --------------------------------------------------------------------------
# invariant 4: Python stays out of the hot path
# --------------------------------------------------------------------------

# the ONLY headline queries allowed a Python/Arrow stage are the two
# declared applyInPandas kernels (bars_ema's sequential EMA recursion,
# bars_turtle_backtest's stateful position walk — both per-symbol
# grouped, Arrow-batched). Everything else must be pure JVM whole-stage
# codegen.
_PY_ALLOWED: dict[str, int] = {"bars_ema": 1, "bars_turtle_backtest": 1}


def test_no_python_stages_in_headline_set(spark):
    offenders = {}
    for name, q in registry.all_queries().items():
        if not q.bench or name == "stream_tumbling_window":
            continue  # streaming query materializes via its own sink
        a = _executed_audit(spark, name)
        allowed = _PY_ALLOWED.get(name, 0)
        if a["python_stages"] > allowed:
            offenders[name] = a["python_stages"]
    assert not offenders, f"Python stages leaked into headline plans: {offenders}"
