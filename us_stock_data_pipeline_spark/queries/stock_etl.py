"""Reference-parity stock-ETL operators, re-expressed over the events
table (its ts/value columns stand in for bar ts/price — the driver's
testdata has no bar table; the true bar schemas live in
`us_stock_data_pipeline_spark.etl` with their own unit tests).

Parity map (SURVEY.md §2A):
- curated projection  -> P1-P3  (`ingest_massive.py:125-138`)
- session labeling    -> F1, P4, P5 (`1m-seesion-pipeline/utils.py:3-19`)
- incremental watermark -> F2, A1, C1 (`ingest_massive.py:140-141`,
  `symbols(historical)/utils.py:13-19,25-58`)
- per-key watermark   -> fixes the reference's global-max bug (SURVEY §3 EP3)
- idempotent re-ingest -> the reference appends blindly (SURVEY §1.4);
  here at-least-once input + dedup = exactly-once output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register


@register(
    "etl_curated_projection",
    oracle="""
SELECT
  make_timestamp(epoch_ms(ts) * 1000) AS bar_ts,
  event_type                          AS symbol,
  round(value, 4)                     AS close,
  round(value * 1.01, 4)              AS high,
  CAST(floor(value * 1000) AS BIGINT) AS volume,
  CAST(floor(value) AS BIGINT)        AS trades
FROM events
ORDER BY event_id
""",
    tags=("etl",),
)
def etl_curated_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bronze->silver typed projection: epoch-millis -> timestamp
    (`timestamp_millis`, the clean builtin for the reference's
    `(t/1000).cast("timestamp")` at `ingest_massive.py:127`), rename/alias,
    and the long casts the reference's AGG_SCHEMA declares but never
    enforces (`1m-seesion-pipeline/schemas.py:29-41`). floor() before the
    long cast pins truncation semantics identically in both engines.
    Pure projection — zero shuffles at any scale."""
    ev = load_table(spark, sf_dir, "events")
    raw = ev.select(F.unix_millis("ts").alias("t"), "event_type", "value", "event_id")
    return raw.select(
        F.timestamp_millis("t").alias("bar_ts"),
        F.col("event_type").alias("symbol"),
        F.round("value", 4).alias("close"),
        F.round(F.col("value") * 1.01, 4).alias("high"),
        F.floor(F.col("value") * 1000).cast("long").alias("volume"),
        F.floor("value").cast("long").alias("trades"),
        "event_id",
    ).orderBy("event_id").drop("event_id")


@register(
    "etl_session_label",
    oracle="""
WITH labeled AS (
  SELECT
    value,
    hour(ts - INTERVAL 5 HOUR) * 100 + minute(ts - INTERVAL 5 HOUR) AS hhmm
  FROM events
)
SELECT
  CASE
    WHEN hhmm BETWEEN 400 AND 929   THEN 'premarket'
    WHEN hhmm BETWEEN 930 AND 1600  THEN 'regular'
    WHEN hhmm BETWEEN 1601 AND 2000 THEN 'afterhours'
    ELSE 'closed'
  END AS session,
  count(*)             AS n_rows,
  round(sum(value), 2) AS total_value
FROM labeled
GROUP BY 1
ORDER BY session
""",
    tags=("etl",),
)
def etl_session_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session labeling, one pass: the reference filters the SAME data
    three times into three Delta tables (`ingest_1m_session.py:273-293`);
    here session is a single when/otherwise expression — one scan, and
    session becomes a partition column instead of a table name.
    Band semantics are exact parity: inclusive hhmm bands 400-929 /
    930-1600 / 1601-2000 in America/New_York
    (`1m-seesion-pipeline/utils.py:7-19`).

    The Spark side uses the real `from_utc_timestamp` (DST-correct); the
    oracle uses a fixed UTC-5 shift, valid because the events fixture spans
    only 2024-01-01..01-30 (EST throughout, no DST transition — verified).
    DST correctness is covered by unit tests in tests/test_etl_bars.py.
    """
    ev = load_table(spark, sf_dir, "events")
    ts_et = F.from_utc_timestamp("ts", "America/New_York")
    hhmm = F.hour(ts_et) * 100 + F.minute(ts_et)
    session = (
        F.when(hhmm.between(400, 929), "premarket")
        .when(hhmm.between(930, 1600), "regular")
        .when(hhmm.between(1601, 2000), "afterhours")
        .otherwise("closed")
    )
    return (
        ev.select(session.alias("session"), "value")
        .groupBy("session")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("session")
    )


@register(
    "etl_incremental_watermark",
    oracle="""
SELECT
  count(*)                       AS n_new_rows,
  count(DISTINCT user_id)        AS n_users,
  round(sum(value), 2)           AS total_value
FROM events
WHERE ts > (SELECT max(ts) - INTERVAL 7 DAY FROM events)
""",
    tags=("etl",),
)
def etl_incremental_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch watermark pattern (parity: F2+A1, `ingest_massive.py:140-141`
    + `symbols(historical)/utils.py:13-19`): global max(ts) seeds a strict
    `>` filter for incremental loads. Spark-first: the 1-row max aggregate
    is cross-joined back broadcast-style instead of collect()ed, so the
    plan has no driver round-trip and composes lazily."""
    ev = load_table(spark, sf_dir, "events")
    wm = ev.agg((F.max("ts") - F.expr("INTERVAL 7 DAY")).alias("wm"))
    return (
        ev.join(F.broadcast(wm))
        .filter(F.col("ts") > F.col("wm"))
        .agg(
            F.count(F.lit(1)).alias("n_new_rows"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "etl_watermark_per_key",
    oracle="""
SELECT
  e.user_id,
  count(*)             AS n_recent,
  round(sum(value), 2) AS recent_value
FROM events e
JOIN (SELECT user_id, max(ts) AS mx FROM events GROUP BY user_id) m
  ON e.user_id = m.user_id
WHERE e.ts > m.mx - INTERVAL 3 DAY
GROUP BY e.user_id
ORDER BY e.user_id
""",
    tags=("etl",),
)
def etl_watermark_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key watermark — the fix for the reference's incremental bug
    (SURVEY §3 EP3: global max_ts silently drops the gap for symbols that
    lagged behind a crash). Per-symbol max is a tiny aggregate (one row
    per key), joined back on the key — at 100 TB the watermark side is
    |keys| rows, so AQE broadcasts it and the fact side never shuffles."""
    ev = load_table(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg((F.max("ts") - F.expr("INTERVAL 3 DAY")).alias("wm"))
    return (
        ev.join(F.broadcast(per_key), "user_id")
        .filter(F.col("ts") > F.col("wm"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_recent"), F.round(F.sum("value"), 2).alias("recent_value"))
        .orderBy("user_id")
    )


@register(
    "etl_idempotent_reingest",
    oracle="""
SELECT event_id, user_id, ts, round(value, 4) AS value
FROM events
WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
ORDER BY event_id
""",
    tags=("etl", "dedup"),
)
def etl_idempotent_reingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once-by-dedup: the reference's 1m pipeline appends blindly,
    duplicating rows on re-run (SURVEY §1.4). Here a doubled (at-least-
    once) input is deduped on the natural key before the watermark filter —
    union + dropDuplicates(key) is the batch MERGE. The dedup shuffles
    only on event_id; at scale this is the idempotency layer in front of
    every append sink."""
    ev = load_table(spark, sf_dir, "events")
    replayed = ev.unionByName(ev)  # simulate a re-run that re-fetched everything
    return (
        replayed.dropDuplicates(["event_id"])
        .filter(F.col("ts") > F.lit("2024-01-15").cast("timestamp"))
        .select("event_id", "user_id", "ts", F.round("value", 4).alias("value"))
        .orderBy("event_id")
    )


@register(
    "etl_reference_pipeline",
    oracle="""
WITH raw AS (
  SELECT epoch_ms(ts) AS t, event_type AS symbol, value FROM events
),
curated AS (
  SELECT
    make_timestamp(t * 1000)            AS ts,
    symbol,
    round(value, 4)                     AS close,
    CAST(floor(value * 1000) AS BIGINT) AS volume
  FROM raw
),
labeled AS (
  SELECT *,
    hour(ts - INTERVAL 5 HOUR) * 100 + minute(ts - INTERVAL 5 HOUR) AS hhmm
  FROM curated
)
SELECT
  symbol,
  CASE
    WHEN hhmm BETWEEN 400 AND 929   THEN 'premarket'
    WHEN hhmm BETWEEN 930 AND 1600  THEN 'regular'
    WHEN hhmm BETWEEN 1601 AND 2000 THEN 'afterhours'
    ELSE 'closed'
  END AS session,
  count(*)                      AS n_bars,
  round(sum(close), 2)          AS sum_close,
  CAST(sum(volume) AS BIGINT)   AS sum_volume
FROM labeled
GROUP BY 1, 2
ORDER BY symbol, session
""",
    tags=("etl", "parity"),
)
def etl_reference_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end reference pipeline through the actual
    `us_stock_data_pipeline_spark.etl` package: wire-format rows ->
    curate() (typed projection, AGG-schema long casts) -> with_session()
    (from_utc_timestamp + hhmm bands) -> per-symbol/session rollup.
    This is the whole of `ingest_1m_session.py` as one declarative plan:
    one scan, one shuffle (the final groupBy), versus the reference's
    per-symbol driver loop with three filtered writes.
    (Oracle uses a fixed UTC-5 shift — valid for the January-only events
    fixture; DST correctness is unit-tested in tests/test_etl_bars.py.)"""
    from us_stock_data_pipeline_spark.etl.bars import curate, with_session

    ev = load_table(spark, sf_dir, "events")
    raw = ev.select(
        F.unix_millis("ts").alias("t"),
        F.col("event_type").alias("symbol"),
        F.round("value", 4).alias("c"),
        (F.col("value") * 1000).alias("v"),
        F.lit(None).cast("double").alias("o"),
        F.lit(None).cast("double").alias("h"),
        F.lit(None).cast("double").alias("l"),
        F.lit(None).cast("double").alias("vw"),
        F.lit(None).cast("double").alias("n"),
    )
    curated = curate(raw)  # symbol taken from the existing column
    labeled = with_session(curated)
    return (
        labeled.groupBy("symbol", "session")
        .agg(
            F.count(F.lit(1)).alias("n_bars"),
            F.round(F.sum("close"), 2).alias("sum_close"),
            F.sum("volume").alias("sum_volume"),
        )
        .orderBy("symbol", "session")
    )


@register(
    "etl_sessionization_gaps",
    oracle="""
WITH flagged AS (
  SELECT
    user_id, ts, event_id, value,
    CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT *,
    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
      AS session_id
  FROM flagged
)
SELECT
  user_id,
  CAST(session_id AS BIGINT) AS session_id,
  min(ts)              AS session_start,
  max(ts)              AS session_end,
  count(*)             AS n_events,
  round(sum(value), 2) AS session_value
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
    tags=("etl", "session"),
    bench=True,
)
def etl_sessionization_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands, 30 min inactivity gap):
    lag -> gap flag -> running sum = session id -> per-session rollup.
    One shuffle on user_id shared by both windows and the final groupBy
    (Catalyst reuses the hash partitioning). This is also the batch oracle
    for the streaming session_window operator."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return (
        numbered.groupBy("user_id", F.col("session_id").cast("long").alias("session_id"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .orderBy("user_id", "session_id")
    )
