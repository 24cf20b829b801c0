"""Round-9 plan-shape assertions: broadcasts where dims are small,
codegen (not Python) for the lexicon probe, pushdown for the SQL UDF.
"""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _executed(spark, name):
    df = registry.queries()[name](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_zonemap_probes_broadcast(spark):
    """The 6-row probe table must broadcast onto the file-stats
    aggregate — stats pruning never reshuffles the stats table."""
    plan = _executed(spark, "layout_zonemap_skipping")
    assert "CartesianProduct" not in plan
    assert "Broadcast" in plan


def test_bh_part_dim_broadcasts(spark):
    """The part dim joins the fact scan as a BroadcastHashJoin; the
    global BH window runs over brand-count rows only."""
    plan = _executed(spark, "stats_benjamini_hochberg")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_lexicon_probe_is_codegen_no_python(spark):
    """The IN-list membership test compiles into whole-stage codegen:
    no Python UDF evaluation node anywhere in the plan."""
    plan = _executed(spark, "text_lexicon_hit_rate")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # whole-stage-codegen stages render as "*(n)" in the executed plan
    assert "*(" in plan


def test_sql_udf_inlines_with_pushdown(spark):
    """A SQL UDF leaves no Python boundary: the plan is a plain
    codegen aggregate and the shipdate filter reaches the scan."""
    plan = _executed(spark, "sql_udf_scalar")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in plan


def test_k_anonymity_class_rollup_broadcasts(spark):
    """Class-level tables (bounded by QI cardinality) join broadcast;
    no cartesian anywhere."""
    plan = _executed(spark, "compliance_k_anonymity")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_sax_breakpoints_broadcast(spark):
    """Per-symbol quartile breakpoints (symbol-count rows) broadcast
    back onto the daily closes."""
    plan = _executed(spark, "timeseries_symbolic_sax")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
