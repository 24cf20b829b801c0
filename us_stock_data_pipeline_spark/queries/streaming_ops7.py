"""Streaming ops, part 7: chained stateful operators — a 15-minute
tumbling aggregation re-aggregated into hourly windows inside ONE
streaming query (multiple stateful operators, Spark 3.4+/4.x).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.queries.streaming_ops import (
    _events_stream,
    _run_to_table,
)
from us_stock_data_pipeline_spark.registry import register

# Append mode + 0s watermark: every window whose END <= max(ts) is
# finalized and emitted; the trailing partial hour is withheld by design.
# The oracle reproduces exactly that emission rule in batch SQL.
_CHAIN_ORACLE = """
WITH hourly AS (
  SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS hour_start,
         event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
  FROM events
  GROUP BY 1, 2
),
wm AS (SELECT max(ts) AS w FROM events)
SELECT h.hour_start, h.hour_start + INTERVAL 1 HOUR AS hour_end,
       h.event_type, h.n_events, h.total_cents
FROM hourly h CROSS JOIN wm
WHERE h.hour_start + INTERVAL 1 HOUR <= wm.w
ORDER BY h.hour_start, h.event_type
"""


@register("stream_chained_window_agg", oracle=_CHAIN_ORACLE, tags=("streaming",))
def stream_chained_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED stateful streaming operators: a 15-minute tumbling
    count/sum per event type, re-windowed into 1-hour rollups — two
    stateful aggregations in ONE append-mode streaming query, the
    multi-stateful-operator capability Spark added in 3.4 (before it,
    this took two queries glued by a sink, doubling latency and
    storage; the reference's batch ETL has no streaming at all —
    SURVEY §1). The 0-second watermark finalizes every window whose
    end precedes max(ts), so emitted rows are exactly the CLOSED
    hours; the oracle reproduces that emission rule in batch SQL and
    withholds the same trailing partial hour. Values aggregate as
    exact integer cents: the 15-min partials sum losslessly into
    hours, the invariant that makes hierarchical streaming rollups
    (minute -> hour -> day) safe at any scale. State: keyed by
    (window, type) per level — bounded by time range x type
    cardinality, never by input volume."""
    ev = _events_stream(spark, sf_dir).withWatermark("ts", "0 seconds")
    q15 = ev.groupBy(F.window("ts", "15 minutes"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    hourly = (
        q15.groupBy(F.window(F.col("window"), "1 hour"), "event_type")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
    )
    out = _run_to_table(hourly, spark, "append")
    return out.select(
        F.col("window.start").alias("hour_start"),
        F.col("window.end").alias("hour_end"),
        "event_type",
        "n_events",
        "total_cents",
    ).orderBy("hour_start", "event_type")
