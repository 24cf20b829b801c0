"""Round-5 streaming additions: streaming OHLCV bar construction (the
reference pipeline's core semantic as a continuous query) and windowed
trending top-k.

Both reuse streaming_ops.py's file-source staging and availableNow
memory-sink harness, and carry batch-equivalent DuckDB oracles — the
stream processes the same fixture to completion, so the materialized
result must hash-match the batch SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.queries.streaming_ops import (
    _events_stream,
    _run_to_table,
)
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Streaming OHLCV bars
# --------------------------------------------------------------------------

_STREAM_OHLCV_ORACLE = """
SELECT
  make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS bar_start,
  event_type AS symbol,
  round(min_by(value, event_id), 4) AS open,
  round(max(value), 4) AS high,
  round(min(value), 4) AS low,
  round(max_by(value, event_id), 4) AS close,
  round(sum(value), 2) AS volume,
  CAST(count(*) AS BIGINT) AS trades
FROM events
GROUP BY 1, 2
ORDER BY bar_start, symbol
"""


@register("stream_ohlcv_bars", oracle=_STREAM_OHLCV_ORACLE, tags=("streaming", "stock"))
def stream_ohlcv_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference pipeline's core semantic — minute/hour OHLCV bar
    construction (`1m-seesion-pipeline/ingest_1m_session.py`'s batch
    rollup) — as a CONTINUOUS streaming query: groupBy(window(ts, 1h),
    symbol) with open/close elected by min_by/max_by on the arrival
    sequence. This is the shape a live market feed actually needs:
    state is one OHLCV accumulator per (window, symbol) — bounded by
    time x symbols, never by tick volume — and every aggregate
    (min_by, max_by, min, max, sum, count) is mergeable, so partial
    bars combine across micro-batches exactly like map-side combines
    in batch. At scale a watermark expires closed bars to the sink
    (the repo's stream_watermarked_append pattern); availableNow + a
    complete-mode memory sink here makes the run batch-equivalent and
    oracle-checkable."""
    ev = _events_stream(spark, sf_dir)
    agg = ev.groupBy(F.window("ts", "1 hour"), F.col("event_type").alias("symbol")).agg(
        F.round(F.expr("min_by(value, event_id)"), 4).alias("open"),
        F.round(F.max("value"), 4).alias("high"),
        F.round(F.min("value"), 4).alias("low"),
        F.round(F.expr("max_by(value, event_id)"), 4).alias("close"),
        F.round(F.sum("value"), 2).alias("volume"),
        F.count(F.lit(1)).alias("trades"),
    )
    out = _run_to_table(agg, spark, "complete")
    return out.select(
        F.col("window.start").alias("bar_start"),
        "symbol",
        "open",
        "high",
        "low",
        "close",
        "volume",
        "trades",
    ).orderBy("bar_start", "symbol")


# --------------------------------------------------------------------------
# Streaming trending top-k
# --------------------------------------------------------------------------

_TRENDING_ORACLE = """
WITH counted AS (
  SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS window_start,
         event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT window_start, event_type, n,
         row_number() OVER (PARTITION BY window_start ORDER BY n DESC, event_type)
           AS rnk
  FROM counted
)
SELECT window_start, CAST(rnk AS BIGINT) AS rnk, event_type, n
FROM ranked WHERE rnk <= 3
ORDER BY window_start, rnk
"""


@register("stream_trending_topk", oracle=_TRENDING_ORACLE, tags=("streaming",))
def stream_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed trending top-k: the STREAM maintains per-(window, item)
    counts — the only state that must be continuous — and the rank
    runs on the materialized aggregate at read time, because ranking
    is not an incremental operation (a late row can reorder everything
    below it) and pushing it into the stream would force complete-mode
    recomputation of all windows every batch anyway. Splitting
    stateful counting (streaming) from ordering (serving read) is the
    canonical architecture for live leaderboards; the rank input is
    |windows| x |items| aggregate rows, not events."""
    ev = _events_stream(spark, sf_dir)
    agg = ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    out = _run_to_table(agg, spark, "complete")
    rnk = F.row_number().over(
        W.partitionBy("window_start").orderBy(F.desc("n"), "event_type")
    )
    return (
        out.select(F.col("window.start").alias("window_start"), "event_type", "n")
        .withColumn("rnk", rnk.cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("window_start", "rnk", "event_type", "n")
        .orderBy("window_start", "rnk")
    )
