"""Round-25 tests: checkpoint restart, STL decomposition, join hints,
applyInArrow."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_checkpoint_restart_exactly_once(spark):
    """The sink after stop+restart equals the batch truth: no row is
    duplicated (restart reprocesses nothing) and none is dropped."""
    df = registry.queries()["stream_checkpoint_restart"](spark, SF)
    got = {r.event_type: (r.n_events, r.total_cents) for r in df.collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    want = {
        r.event_type: (r.n, r.c)
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"),
        )
        .collect()
    }
    assert got == want
    # run it again: a third restart with no new files must be a no-op
    again = {
        r.event_type: (r.n_events, r.total_cents)
        for r in registry.queries()["stream_checkpoint_restart"](spark, SF).collect()
    }
    assert again == got


def test_stl_components_reassemble(spark):
    rows = registry.queries()["timeseries_stl_decompose"](spark, SF).collect()
    assert rows
    for r in rows:
        assert (
            r.close_cents * 1000
            == r.trend_milli + r.seasonal_milli + r.residual_milli
        )
    # seasonal means of residuals are ~0 by construction: per (symbol,
    # weekday), residuals sum to a sub-count remainder of the floor div
    from collections import defaultdict

    acc = defaultdict(lambda: [0, 0])
    for r in rows:
        k = (r.symbol, r.weekday)
        acc[k][0] += r.residual_milli
        acc[k][1] += 1
    for (sym, wd), (tot, n) in acc.items():
        # integer division truncates toward zero in BOTH engines
        # (duckdb // on ints == spark div), so the remainder keeps the
        # sum's sign and is bounded by the group size
        assert abs(tot) < n, (sym, wd, tot, n)


def test_join_hint_forces_sort_merge(spark):
    df = registry.queries()["join_strategy_hints"](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan.split("== Initial Plan ==")[0]


def test_apply_in_arrow_matches_builtin_agg(spark):
    got = {r.symbol: r for r in registry.queries()["udf_apply_in_arrow"](spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    want = (
        ev.select(
            "event_id",
            F.col("event_type").alias("symbol"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("symbol")
        .agg(
            F.count("*").alias("n"),
            F.sum("cents").alias("s"),
            (F.max("cents") - F.min("cents")).alias("rng"),
            F.max_by("cents", "event_id").alias("last"),
        )
        .collect()
    )
    for w in want:
        g = got[w.symbol]
        assert (g.n_trades, g.flow_cents, g.range_cents, g.last_cents) == (
            w.n,
            w.s,
            w.rng,
            w.last,
        )
