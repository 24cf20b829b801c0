"""Round-5 final relational addition: native INTERVAL range frames
(burst / rate-limit detection) — the time-based window frame API the
surface expressed only via unix_micros arithmetic until now.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from us_stock_data_pipeline_spark.catalog import register_views
from us_stock_data_pipeline_spark.registry import register

# The IDENTICAL SQL text runs on both engines — INTERVAL range frames
# are ANSI, and keeping one string is itself the parity demonstration.
_BURST_SQL = """
WITH windowed AS (
  SELECT event_id, user_id, ts, event_type,
         CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)
           AS BIGINT) AS n_24h
  FROM events
)
SELECT event_id, user_id, ts, event_type, n_24h
FROM windowed
WHERE n_24h >= 3
ORDER BY event_id
"""


@register("window_interval_burst", oracle=_BURST_SQL, tags=("window", "interval"))
def window_interval_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection via a NATIVE time-interval range frame: for each
    event, the count of same-user events in the trailing 24 hours
    (`RANGE BETWEEN INTERVAL 24 HOURS PRECEDING`), flagging rows past a
    rate threshold — the abuse/rate-limit primitive. Unlike
    `window_range_frame` (which buys the same semantics by converting
    ts to epoch micros and using a numeric range), the INTERVAL frame
    orders by the timestamp itself — the exact same SQL text runs on
    both engines, so the oracle IS the query. Physical shape is
    unchanged: one hash exchange on user_id, per-key ordered scan with
    a sliding two-pointer frame, threshold filter above the window.
    At 100 TB the trailing-window state per key is bounded by the
    interval's event capacity, and the streaming twin is a watermarked
    sliding window (stream_sliding_window)."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_BURST_SQL)
