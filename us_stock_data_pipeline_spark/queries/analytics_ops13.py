"""Round-7 analytics additions, part 13: bot-likeness scoring,
seasonal-naive forecast backtesting, and hourly backfill planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Bot-likeness scoring (inter-event regularity)
# --------------------------------------------------------------------------

_BOT_MIN_EVENTS = 20
_BOT_CV_LIMIT = 0.5  # coefficient of variation below which cadence is "robotic"

_BOT_ORACLE = f"""
WITH gaps AS (
  SELECT user_id,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id)) // 1000000 AS gap_sec
  FROM events
),
stats AS (
  SELECT user_id,
         CAST(count(gap_sec) AS BIGINT) AS n_gaps,
         CAST(sum(gap_sec) AS BIGINT) AS sx,
         CAST(sum(gap_sec * gap_sec) AS BIGINT) AS sxx
  FROM gaps WHERE gap_sec IS NOT NULL
  GROUP BY user_id
)
SELECT user_id, n_gaps,
       CAST(sx // n_gaps AS BIGINT) AS mean_gap_sec,
       floor(CASE WHEN n_gaps > 1 AND sx > 0 THEN
               sqrt((CAST(sxx AS DOUBLE) * n_gaps - CAST(sx AS DOUBLE) * sx)
                    / (CAST(n_gaps AS DOUBLE) * (n_gaps - 1)))
               / (CAST(sx AS DOUBLE) / n_gaps)
             ELSE 0 END * 10000 + 0.5) / 10000 AS gap_cv,
       (n_gaps + 1 >= {_BOT_MIN_EVENTS}
        AND CASE WHEN n_gaps > 1 AND sx > 0 THEN
              sqrt((CAST(sxx AS DOUBLE) * n_gaps - CAST(sx AS DOUBLE) * sx)
                   / (CAST(n_gaps AS DOUBLE) * (n_gaps - 1)))
              / (CAST(sx AS DOUBLE) / n_gaps)
            ELSE 0 END < {_BOT_CV_LIMIT}) AS bot_flag
FROM stats
ORDER BY user_id
"""


@register("events_bot_detection", oracle=_BOT_ORACLE, tags=("analytics", "quality"))
def events_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot-likeness scoring from inter-event cadence: real users are
    bursty, schedulers are metronomes — so a LOW coefficient of
    variation of the inter-event gap on a high-volume account is the
    classic automation tell (the traffic-quality gate a training-data
    pipeline runs before `events_*` engagement metrics trust the
    users). The CV comes from exact integer gap sums
    (n*Sxx - Sx^2 over microseconds), divided once — the same
    numerically-stable two-moment trick `sample_stratified_neyman`
    uses, over SECOND-granularity gaps so the squared sums stay exact
    int64 on both engines — and the flag combines an exact integer
    volume test with the CV threshold. One user-partitioned lag
    window and one groupBy share a single shuffle."""
    ev = load_table(spark, sf_dir, "events")
    gaps = ev.select(
        "user_id",
        F.expr(
            "(unix_micros(ts) - lag(unix_micros(ts)) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id)) div 1000000"
        ).alias("gap_sec"),
    ).filter(F.col("gap_sec").isNotNull())
    stats = gaps.groupBy("user_id").agg(
        F.count("gap_sec").cast("long").alias("n_gaps"),
        F.sum("gap_sec").cast("long").alias("sx"),
        F.sum(F.col("gap_sec") * F.col("gap_sec")).cast("long").alias("sxx"),
    )
    cv = F.when(
        (F.col("n_gaps") > 1) & (F.col("sx") > 0),
        F.sqrt(
            (
                F.col("sxx").cast("double") * F.col("n_gaps")
                - F.col("sx").cast("double") * F.col("sx")
            )
            / (F.col("n_gaps").cast("double") * (F.col("n_gaps") - 1))
        )
        / (F.col("sx").cast("double") / F.col("n_gaps")),
    ).otherwise(0.0)
    return stats.select(
        "user_id",
        "n_gaps",
        F.expr("sx div n_gaps").cast("long").alias("mean_gap_sec"),
        (F.floor(cv * 10000 + F.lit(0.5)) / 10000).alias("gap_cv"),
        (
            (F.col("n_gaps") + 1 >= _BOT_MIN_EVENTS) & (cv < _BOT_CV_LIMIT)
        ).alias("bot_flag"),
    ).orderBy("user_id")


# --------------------------------------------------------------------------
# Seasonal-naive forecast backtest (MAPE / sMAPE)
# --------------------------------------------------------------------------

_SNAIVE_LAG = 7  # weekly seasonal naive

_SNAIVE_ORACLE = f"""
WITH daily AS (
  SELECT event_type AS symbol, CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
forecast AS (
  SELECT symbol, day, cents,
         lag(cents, {_SNAIVE_LAG}) OVER (PARTITION BY symbol ORDER BY day) AS fc
  FROM daily
)
SELECT symbol,
       CAST(count(fc) AS BIGINT) AS n_evals,
       floor(avg(CAST(abs(cents - fc) AS DOUBLE) / cents) * 10000 + 0.5) / 10000
         AS mape,
       floor(avg(2.0 * abs(cents - fc) / (cents + fc)) * 10000 + 0.5) / 10000
         AS smape
FROM forecast
WHERE fc IS NOT NULL AND cents > 0
GROUP BY symbol
ORDER BY symbol
"""


@register("forecast_eval_seasonal_naive", oracle=_SNAIVE_ORACLE, tags=("timeseries", "ml"))
def forecast_eval_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's revenue
    with the value {_SNAIVE_LAG} days earlier and score MAPE/sMAPE per
    symbol — the baseline every forecasting effort must beat, and the
    error floor that `timeseries_holt_linear` and
    `timeseries_weekday_index` improvements are judged against.
    Actuals and forecasts are exact integer cents (so |a-f| is
    exact); only the per-row error ratios and their mean are doubles.
    The lag window and the final groupBy share one symbol-keyed
    shuffle over the calendar-bounded daily table."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("symbol"), F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents"))
    w = Window.partitionBy("symbol").orderBy("day")
    forecast = daily.select(
        "symbol", "cents", F.lag("cents", _SNAIVE_LAG).over(w).alias("fc")
    ).filter(F.col("fc").isNotNull() & (F.col("cents") > 0))
    err = F.abs(F.col("cents") - F.col("fc")).cast("double")
    return (
        forecast.groupBy("symbol")
        .agg(
            F.count("fc").cast("long").alias("n_evals"),
            (
                F.floor(F.avg(err / F.col("cents")) * 10000 + F.lit(0.5)) / 10000
            ).alias("mape"),
            (
                F.floor(
                    F.avg(2.0 * err / (F.col("cents") + F.col("fc"))) * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("smape"),
        )
        .orderBy("symbol")
    )


# --------------------------------------------------------------------------
# Hourly backfill plan (missing-partition ranges)
# --------------------------------------------------------------------------

_BACKFILL_ORACLE = """
WITH bounds AS (
  SELECT min(epoch_us(ts) // 3600000000) AS h0,
         max(epoch_us(ts) // 3600000000) AS h1
  FROM events
),
slots AS (
  SELECT t.event_type,
         b.h0 + unnest(generate_series(0, CAST(b.h1 - b.h0 AS BIGINT)))
           AS hour_idx
  FROM bounds b, (SELECT DISTINCT event_type FROM events) t
),
present AS (
  SELECT DISTINCT event_type, epoch_us(ts) // 3600000000 AS hour_idx FROM events
),
missing AS (
  SELECT s.event_type, s.hour_idx
  FROM slots s LEFT JOIN present p
    ON p.event_type = s.event_type AND p.hour_idx = s.hour_idx
  WHERE p.hour_idx IS NULL
),
runs AS (
  SELECT event_type, hour_idx,
         hour_idx - row_number() OVER (PARTITION BY event_type ORDER BY hour_idx)
           AS grp
  FROM missing
)
SELECT event_type,
       make_timestamp(min(hour_idx) * 3600000000) AS gap_start,
       make_timestamp((max(hour_idx) + 1) * 3600000000) AS gap_end,
       CAST(count(*) AS BIGINT) AS n_hours
FROM runs
GROUP BY event_type, grp
ORDER BY event_type, gap_start
"""


@register("etl_backfill_plan", oracle=_BACKFILL_ORACLE, tags=("etl", "planning"))
def etl_backfill_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill planner: diff the expected hourly partition grid
    (min..max hour x source) against the hours actually present, then
    collapse the missing slots into contiguous [start, end) ranges
    with the classic index-minus-rank trick — the exact artifact an
    orchestrator turns into one backfill job per range instead of one
    per hour (`etl_freshness_sla` says a feed is behind; this says
    precisely WHICH hours to replay). The grid is generated from a
    2-scalar bound — calendar-sized, never data-sized; the anti-join
    runs on (source, hour) integers; everything is exact micros
    arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    hour = (F.unix_micros("ts") / 3600000000).cast("long")
    bounds = ev.agg(F.min(hour).alias("h0"), F.max(hour).alias("h1"))
    types = ev.select("event_type").distinct()
    slots = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("h1") - F.col("h0"))
            ).alias("i"),
            "h0",
        )
        .select("event_type", (F.col("h0") + F.col("i")).alias("hour_idx"))
    )
    present = ev.select("event_type", hour.alias("hour_idx")).distinct()
    missing = slots.join(present, ["event_type", "hour_idx"], "left_anti")
    runs = missing.select(
        "event_type",
        "hour_idx",
        (
            F.col("hour_idx")
            - F.row_number().over(
                Window.partitionBy("event_type").orderBy("hour_idx")
            )
        ).alias("grp"),
    )
    return (
        runs.groupBy("event_type", "grp")
        .agg(
            F.timestamp_micros(F.min("hour_idx") * 3600000000).alias("gap_start"),
            F.timestamp_micros((F.max("hour_idx") + 1) * 3600000000).alias("gap_end"),
            F.count(F.lit(1)).cast("long").alias("n_hours"),
        )
        .drop("grp")
        .orderBy("event_type", "gap_start")
    )
