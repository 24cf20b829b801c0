"""Round-36 tests: batch session_window + sliding window."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_session_window_events_conserved(spark):
    df = registry.queries()["agg_session_window_batch"](spark, SF)
    rows = df.collect()
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert sum(r.n_events for r in rows) == n_events
    for r in rows:
        assert r.duration_sec >= 0


def test_session_gap_property(spark):
    """No two consecutive sessions of a user may be closer than the gap
    (else session_window would have merged them)."""
    from us_stock_data_pipeline_spark.queries.relational29 import _SESSION_GAP_MIN

    rows = registry.queries()["agg_session_window_batch"](spark, SF).collect()
    from collections import defaultdict

    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    for user, sessions in by_user.items():
        sessions.sort(key=lambda r: r.session_start)
        for a, b in zip(sessions, sessions[1:]):
            import datetime

            a_end = a.session_start + datetime.timedelta(seconds=a.duration_sec)
            gap = (b.session_start - a_end).total_seconds()
            assert gap > _SESSION_GAP_MIN * 60, (user, a_end, b.session_start)


def test_sliding_window_duplication_factor(spark):
    df = registry.queries()["agg_sliding_window_batch"](spark, SF)
    rows = df.collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_events = ev.count()
    # 2h window, 1h slide: every event counted exactly twice
    assert sum(r.n_events for r in rows) == 2 * n_events
    cents = ev.select(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("c")
    ).collect()[0].c
    assert sum(r.total_cents for r in rows) == 2 * cents
