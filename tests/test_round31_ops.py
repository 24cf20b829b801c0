"""Round-31 tests: corrupt-record ingest, snapshot retention GC."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_corrupt_records_reconcile(spark):
    r = registry.queries()["source_csv_corrupt_records"](spark, SF).collect()[0]
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert r.n_lines == n_events
    assert r.n_parsed + r.n_corrupt == r.n_lines
    # planted rules: %13 or %17
    want_bad = sum(1 for i in range(n_events) if i % 13 == 0 or i % 17 == 0)
    assert r.n_corrupt == want_bad
    assert r.clean_total_cents > 0


def test_retention_gc_policy(spark):
    from us_stock_data_pipeline_spark.queries.source_formats6 import (
        _KEEP_DAILY,
        _KEEP_WEEKLY,
    )

    rows = registry.queries()["etl_snapshot_retention_gc"](spark, SF).collect()
    assert rows
    by_action = {}
    for r in rows:
        by_action.setdefault(r.action, []).append(r)
    assert len(by_action["keep-daily"]) == min(_KEEP_DAILY, len(rows))
    # weekly keeps are Sundays outside the daily window
    for r in by_action.get("keep-weekly", []):
        assert r.snap_day.weekday() == 6  # Python: Sunday == 6
        assert r.recency_rank > _KEEP_DAILY
    assert len(by_action.get("keep-weekly", [])) <= _KEEP_WEEKLY
    # everything else is deletable
    for r in by_action.get("delete", []):
        assert r.recency_rank > _KEEP_DAILY
