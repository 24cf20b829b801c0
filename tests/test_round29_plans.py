"""Plan-shape assertions for the round-23..29 operators."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _executed(spark, name):
    df = registry.queries()[name](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_kcore_iterates_on_cached_edges(spark):
    """r14 contract: the stats plan reads the PERSISTED degree tables
    (InMemoryTableScan) over lazily-checkpointed edge rounds (Scan
    ExistingRDD — lineage flat, never the rebuilt chain), and the peel
    never degenerates to a cartesian product."""
    plan = _executed(spark, "graph_kcore_decomposition")
    assert "InMemoryTableScan" in plan
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_vpin_windows_share_symbol_sort(spark):
    """Tick-sign and prefix-sum windows ride one (symbol, event_id)
    shuffle: at most one hashpartitioning exchange before aggregation
    feeds the window stack."""
    plan = _executed(spark, "bars_vpin")
    assert plan.count("Exchange hashpartitioning(symbol") <= 2


def test_min_variance_day_join_not_cartesian(spark):
    plan = _executed(spark, "portfolio_min_variance_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bm25_model_tables_broadcast(spark):
    plan = _executed(spark, "text_bm25_scoring")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_fifo_overlap_join_is_keyed_shuffled_hash(spark):
    """The banded overlap join must stay a KEYED join (never a
    nested-loop over raw intervals); since the optimization round it is
    hinted shuffled-hash — both sides arrive freshly exploded, so
    sort-merge paid two sorts the per-partition hash build skips."""
    plan = _executed(spark, "bars_fifo_pnl")
    assert "ShuffledHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_winnowing_explode_parallelized(spark):
    """The pre-explode repartition must survive into the executed plan
    (AQE must not coalesce the md5 fan-out back to one task)."""
    plan = _executed(spark, "doc_winnowing_fingerprint")
    assert "Exchange hashpartitioning(doc_id" in plan


def test_shapley_only_first_aggregate_touches_facts(spark):
    plan = _executed(spark, "events_shapley_attribution")
    # one scan of events; the lattice joins are all broadcast
    assert plan.count("Scan parquet") == 1 or plan.count("FileScan parquet") == 1
    assert "CartesianProduct" not in plan
