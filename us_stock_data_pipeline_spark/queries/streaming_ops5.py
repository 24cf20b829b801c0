"""Structured Streaming operators, part 5: watermark-bounded
streaming dedup (Spark 3.5+ ``dropDuplicatesWithinWatermark``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.queries.streaming_ops import (
    _events_stream,
    _run_to_table,
)
from us_stock_data_pipeline_spark.registry import register

_DDWW_ORACLE = """
SELECT DISTINCT user_id, event_type
FROM events
ORDER BY user_id, event_type
"""


@register("stream_dedup_within_watermark", oracle=_DDWW_ORACLE, tags=("streaming", "state"))
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-bounded streaming dedup
    (``dropDuplicatesWithinWatermark``): unlike plain streaming
    ``dropDuplicates`` (`stream_dedup`), whose key state grows FOREVER
    (the classic production OOM: every key ever seen stays in the
    state store), the within-watermark variant expires a key's state
    once the watermark passes it — state is bounded by keys-per-
    watermark-window, not keys-ever. This is the API to use whenever
    duplicates arrive close together (at-least-once sources, retry
    storms — exactly the reference pipeline's re-run duplication bug,
    ingest_1m_session.py mode('append')). Emitted row CONTENT per key
    depends on arrival order inside a batch, so the checked result is
    the deterministic KEY SET, equal to batch DISTINCT over the
    single availableNow batch."""
    ev = _events_stream(spark, sf_dir)
    deduped = (
        ev.withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    out = _run_to_table(deduped, spark, "append")
    return out.select("user_id", "event_type").orderBy("user_id", "event_type")
