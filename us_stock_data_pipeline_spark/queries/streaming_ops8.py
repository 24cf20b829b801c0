"""Round-97 streaming, part 8: stream-stream LEFT OUTER interval join
with watermark-gated null emission.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.queries.streaming_ops import (
    _events_stream,
    _run_to_table,
)
from us_stock_data_pipeline_spark.registry import register

# The outer side's null rows are NOT batch left-join semantics: an
# unmatched click emits only once the global watermark proves no future
# purchase can match it. With a 1h join window and 1h watermark delay,
# that means c_ts + 1h < min(max click ts, max purchase ts) - 1h; clicks
# in the final two hours of the tape stay PENDING forever (measured on
# this exact harness: 4 tail clicks held back at sf0.01).
_SSLOJ_ORACLE = """
WITH c AS (
  SELECT event_id AS click_id, user_id, ts AS c_ts
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT event_id AS purchase_id, user_id AS pu, ts AS p_ts
  FROM events WHERE event_type = 'purchase'
),
wm AS (
  SELECT least((SELECT max(c_ts) FROM c), (SELECT max(p_ts) FROM p))
         - INTERVAL 1 HOUR AS w
),
joined AS (
  SELECT c.click_id, p.purchase_id, c.user_id, c.c_ts
  FROM c LEFT JOIN p
    ON p.pu = c.user_id AND p.p_ts > c.c_ts
   AND p.p_ts <= c.c_ts + INTERVAL 1 HOUR
)
SELECT click_id, purchase_id, user_id
FROM joined, wm
WHERE purchase_id IS NOT NULL
   OR c_ts + INTERVAL 1 HOUR < wm.w
ORDER BY click_id, purchase_id
"""


@register(
    "stream_stream_left_outer_join",
    oracle=_SSLOJ_ORACLE,
    tags=("streaming", "join", "watermark"),
)
def stream_stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click, matched to
    purchases within the following hour — with unmatched clicks
    emitting NULL rows. The outer side is the genuinely streaming-
    hard part: a null can only emit once the watermark PROVES no
    matching purchase can still arrive, so state eviction (not the
    join itself) drives emission. The oracle pins the exact
    semantics: unmatched clicks appear iff c_ts + 1h (the join upper
    bound) precedes the final global watermark min(max c_ts,
    max p_ts) - 1h — the last two hours of the tape stay pending, a
    real difference from the batch left join that anyone switching
    between `join_left_outer` and this operator must understand (the
    inner twin `stream_stream_join` has no such gap). Watermarks
    bound both sides' join state to the window, the property that
    makes this run forever at 100 TB/day."""
    ev = _events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "leftOuter",
    ).select("click_id", "purchase_id", "user_id")
    out = _run_to_table(joined, spark, "append")
    return out.orderBy("click_id", "purchase_id")
