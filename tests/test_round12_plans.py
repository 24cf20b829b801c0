"""Round-12 plan assertions: the AQE demonstrations actually exercise
AQE — runtime broadcast conversion and skew-join splitting — plus the
subject-extract broadcast shape."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.queries.aqe_ops import (
    _AQE_BCAST_CONFS,
    _AQE_SKEW_CONFS,
    _build_runtime_broadcast_join,
    _build_skew_join,
    _conf_bracket,
)

SF = "/root/testdata/sf0.001"


def test_aqe_converts_smj_to_broadcast_at_runtime(spark):
    """Initial plan: shuffle join (static broadcast disabled). Final
    plan: broadcast join (AQE saw the dim's runtime row count)."""
    with _conf_bracket(spark, _AQE_BCAST_CONFS) as iso:
        df = _build_runtime_broadcast_join(iso, SF)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    final = plan.split("== Initial Plan ==")[0]
    initial = plan.split("== Initial Plan ==")[1]
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" in initial or "ShuffledHashJoin" in initial
    assert "BroadcastHashJoin" not in initial


def test_aqe_splits_skewed_partition(spark):
    """The hot key-0 partition crosses the lowered threshold and the
    join node reports skew=true."""
    with _conf_bracket(spark, _AQE_SKEW_CONFS) as iso:
        df = _build_skew_join(iso, SF)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan


def test_subject_extract_all_joins_broadcast(spark):
    df = registry.queries()["etl_subject_access_extract"](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # subject list broadcasts everywhere
    assert "BroadcastHashJoin" in plan
