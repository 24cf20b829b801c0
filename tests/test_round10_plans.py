"""Round-10 plan-shape assertions: dynamic partition pruning fires,
SQL sugar leaves no Python boundary, training ops keep their
bounded-window / broadcast shapes.
"""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _executed(spark, name):
    df = registry.queries()[name](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan


def test_dynamic_partition_pruning_fires(spark):
    """The fact scan's PartitionFilters must contain a
    dynamicpruningexpression — the dim filter reached the file
    listing at runtime, so non-conversion partitions were never
    opened."""
    plan = _executed(spark, "join_dynamic_partition_pruning")
    assert "dynamicpruning" in plan.lower()
    assert "PartitionFilters" in plan


def test_pipe_syntax_plan_is_plain_codegen_aggregate(spark):
    """Pipe syntax is analyzer sugar: the executed plan is the same
    pushed-filter codegen aggregate as the ANSI form — no Python, no
    extra exchanges."""
    plan = _executed(spark, "sql_pipe_syntax").split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in plan


def test_session_variable_folds_to_pushed_filter(spark):
    """The variable's value is a literal at plan time, so the cutoff
    must reach the scan as a pushed filter (a scalar subquery would
    not)."""
    plan = _executed(spark, "sql_session_variables")
    assert "GreaterThan(o_orderdate" in plan


def test_naive_bayes_consts_broadcast(spark):
    """Per-class constants and the vocab scalar broadcast; the only
    shuffles are the model groupBys and the sparse correction join."""
    plan = _executed(spark, "ml_naive_bayes_lang").split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bootstrap_expansion_combines_map_side(spark):
    """The x64 explode must feed a partial (hash) aggregate before the
    exchange — the shuffle carries 64 partials per task, not expanded
    rows."""
    plan = _executed(spark, "stats_bootstrap_ci").split("== Initial Plan ==")[0]
    assert "partial" in plan.lower() or "HashAggregate" in plan
    assert "CartesianProduct" not in plan
