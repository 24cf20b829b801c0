"""Round-36 relational, part 29: BATCH session_window and sliding
window() aggregation — the batch twins of the streaming time-window
operators, pinned against first-principles SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Batch session_window == gaps-and-islands
# --------------------------------------------------------------------------

_SESSION_GAP_MIN = 30

_SESSION_ORACLE = f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_SESSION_GAP_MIN} * 60 * 1000000
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT user_id, min(ts) AS session_start,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS BIGINT)
         AS duration_sec
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


@register("agg_session_window_batch", oracle=_SESSION_ORACLE, tags=("agg", "window"))
def agg_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH `F.session_window` — the native session-gap aggregate
    (groupBy(session_window(ts, '{_SESSION_GAP_MIN} minutes'))) whose
    streaming twin `stream_session_window` already runs, here pinned
    against the first-principles gaps-and-islands SQL: a session
    breaks where the gap to the previous event exceeds the threshold,
    islands number by a running sum of break flags. The subtlety the
    oracle encodes: session_window's close is last_event + gap, so
    the reported DURATION is max(ts) - min(ts), not the window
    bounds — and Spark merges sessions on (user, overlapping
    windows) exactly like the manual island construction when the
    gap rule matches (> gap breaks; equality keeps — pinned here).
    One shuffle on the session key either way; the native form saves
    the two window passes."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", f"{_SESSION_GAP_MIN} minutes")
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.count("*").cast("long").alias("n_events"),
            (
                (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
                / F.lit(1_000_000)
            )
            .cast("long")
            .alias("duration_sec"),
        )
        .select("user_id", "session_start", "n_events", "duration_sec")
        .orderBy("user_id", "session_start")
    )


# --------------------------------------------------------------------------
# Batch sliding window() — overlapping membership
# --------------------------------------------------------------------------

_SLIDE_ORACLE = """
WITH offsets AS (SELECT unnest(ARRAY[0, 1]) AS k),
assigned AS (
  -- a 2h window sliding by 1h: every event belongs to exactly 2
  -- windows, whose starts are the two hour-floors at lags 0 and 1
  SELECT make_timestamp(((epoch_us(e.ts) // 3600000000) - o.k) * 3600000000)
           AS window_start,
         e.event_type,
         CAST(round(e.value * 100) AS BIGINT) AS cents
  FROM events e CROSS JOIN offsets o
)
SELECT window_start, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM assigned
GROUP BY window_start, event_type
ORDER BY window_start, event_type
"""


@register("agg_sliding_window_batch", oracle=_SLIDE_ORACLE, tags=("agg", "window"))
def agg_sliding_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH sliding `F.window(ts, '2 hours', '1 hour')`: each event
    belongs to window_size/slide = 2 overlapping windows, and Spark
    implements exactly the fan-out the oracle writes by hand (an
    Expand of one row per covering window, then a plain hash
    aggregate) — worth pinning because the duplication factor is the
    COST MODEL of sliding aggregation: at 100 TB a 24h window sliding
    hourly multiplies the shuffle 24x, which is why production rolls
    up to the slide grain first and composes windows from partials
    (`rollup_time_multigrain` is that pattern). The oracle assigns
    windows by hour-floor arithmetic on epoch micros — exact
    integers."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("win"),
            "event_type",
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("total_cents"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_cents",
        )
        .orderBy("window_start", "event_type")
    )
