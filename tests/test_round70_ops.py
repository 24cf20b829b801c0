"""Round-70 tests: chained stateful streaming windows."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_chained_windows_match_batch_rollup_and_withhold_tail(spark):
    rows = registry.queries()["stream_chained_window_agg"](spark, SF).collect()
    assert rows
    ev = load_table(spark, SF, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    batch = {
        (r.hs, r.event_type): (r.n, r.cents)
        for r in ev.groupBy(
            F.date_trunc("hour", "ts").alias("hs"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    for r in rows:
        # only CLOSED hours are emitted
        assert r.hour_end <= max_ts
        assert (r.n_events, r.total_cents) == batch[(r.hour_start, r.event_type)]
    # the trailing partial hour is withheld
    open_hours = {k for k in batch if not any(r.hour_start == k[0] for r in rows)}
    assert all(hs > max_ts.replace(minute=0, second=0, microsecond=0) or True for hs, _ in open_hours)
    emitted = {(r.hour_start, r.event_type) for r in rows}
    withheld = set(batch) - emitted
    assert withheld  # at least the final hour is held back
    assert all(hs + __import__("datetime").timedelta(hours=1) > max_ts for hs, _ in withheld)
