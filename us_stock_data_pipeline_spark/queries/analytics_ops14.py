"""Round-7 analytics additions, part 14: ATR true-range volatility,
trimmed means, and repeat-purchase latency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Average True Range (Wilder's ATR, simple-mean variant)
# --------------------------------------------------------------------------

_ATR_N = 14

_ATR_ORACLE = f"""
WITH ohlc AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(max(value) * 100) AS BIGINT) AS high_cents,
         CAST(round(min(value) * 100) AS BIGINT) AS low_cents,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS close_cents
  FROM events GROUP BY 1, 2
),
tr AS (
  SELECT symbol, day,
         greatest(high_cents - low_cents,
                  abs(high_cents - lag(close_cents) OVER w),
                  abs(low_cents - lag(close_cents) OVER w)) AS tr_cents,
         row_number() OVER w AS rn
  FROM ohlc
  WINDOW w AS (PARTITION BY symbol ORDER BY day)
)
SELECT symbol, day, CAST(tr_cents AS BIGINT) AS tr_cents,
       CAST(floor(avg(CAST(tr_cents AS DOUBLE)) OVER (
               PARTITION BY symbol ORDER BY day
               ROWS BETWEEN {_ATR_N - 1} PRECEDING AND CURRENT ROW) + 0.5)
         AS BIGINT) AS atr_cents
FROM tr
WHERE rn > {_ATR_N}
ORDER BY symbol, day
"""


@register("bars_atr", oracle=_ATR_ORACLE, tags=("stock", "window"))
def bars_atr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average True Range: the true range folds the overnight gap into
    the day's spread (max of high-low, |high-prev_close|,
    |low-prev_close|) and ATR smooths it over {_ATR_N} days — the
    volatility unit position-sizing and stop placement are quoted in,
    complementing the close-to-close stddev of `bars_volatility`
    (which is blind to intraday range). Daily OHLC derives from the
    tick stream in one groupBy; TR is exact integer cents (lag +
    greatest); ATR averages those exact integers. The lag, the
    row_number warmup gate, and the ATR frame all share a single
    (symbol, day) sort — one shuffle after the daily rollup."""
    ev = load_table(spark, sf_dir, "events")
    ohlc = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.max("value") * 100).cast("long").alias("high_cents"),
        F.round(F.min("value") * 100).cast("long").alias("low_cents"),
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("close_cents"),
    )
    w = Window.partitionBy("symbol").orderBy("day")
    prev_close = F.lag("close_cents").over(w)
    tr = ohlc.select(
        "symbol",
        "day",
        F.greatest(
            F.col("high_cents") - F.col("low_cents"),
            F.abs(F.col("high_cents") - prev_close),
            F.abs(F.col("low_cents") - prev_close),
        ).alias("tr_cents"),
        F.row_number().over(w).alias("rn"),
    )
    w_atr = Window.partitionBy("symbol").orderBy("day").rowsBetween(-(_ATR_N - 1), 0)
    return (
        tr.filter(F.col("rn") > _ATR_N)
        .select(
            "symbol",
            "day",
            F.col("tr_cents").cast("long").alias("tr_cents"),
            F.floor(
                F.avg(F.col("tr_cents").cast("double")).over(w_atr) + F.lit(0.5)
            ).alias("atr_cents"),
        )
        .orderBy("symbol", "day")
    )


# --------------------------------------------------------------------------
# Trimmed mean (10% both tails)
# --------------------------------------------------------------------------

_TRIM_PCT = 10

_TRIM_ORACLE = f"""
WITH ranked AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
kept AS (
  SELECT event_type, cents, n,
         CAST(n * {_TRIM_PCT} // 100 AS BIGINT) AS k
  FROM ranked
  WHERE rn > n * {_TRIM_PCT} // 100 AND rn <= n - n * {_TRIM_PCT} // 100
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n_total,
       CAST(count(*) AS BIGINT) AS n_kept,
       floor(avg(CAST(cents AS DOUBLE)) / 100 * 10000 + 0.5) / 10000
         AS trimmed_mean,
       floor(CAST(sum(cents) AS DOUBLE) / count(*) / 100 * 10000 + 0.5) / 10000
         AS trimmed_mean_check
FROM kept
GROUP BY event_type
ORDER BY event_type
"""


@register("agg_trimmed_mean", oracle=_TRIM_ORACLE, tags=("stats", "agg"))
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_TRIM_PCT}%-trimmed mean per event type: drop the k lowest and
    k highest values (k = floor(n*{_TRIM_PCT}/100), integer-derived so
    the cut line is identical on both engines) and average the core —
    the robust location estimate between the mean and the median
    (`clean_winsorize` CAPS the tails; trimming EXCLUDES them — the
    two standard tail treatments). One rank window and the final agg
    share the event_type shuffle; the mean is emitted twice (avg of
    exact cents and sum/count) to pin that both engines agree on the
    trimmed set itself, not just the rounded value."""
    ev = load_table(spark, sf_dir, "events")
    wp = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.row_number().over(wp.orderBy("value", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    k = F.expr(f"n * {_TRIM_PCT} div 100")
    kept = ranked.filter((F.col("rn") > k) & (F.col("rn") <= F.col("n") - k))
    return (
        kept.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_total"),
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            (
                F.floor(F.avg(F.col("cents").cast("double")) / 100 * 10000 + F.lit(0.5))
                / 10000
            ).alias("trimmed_mean"),
            (
                F.floor(
                    F.sum("cents").cast("double") / F.count(F.lit(1)) / 100 * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("trimmed_mean_check"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Repeat-purchase latency distribution
# --------------------------------------------------------------------------

_REPEAT_ORACLE = """
WITH gaps AS (
  SELECT o_custkey,
         date_diff('day',
           lag(CAST(o_orderdate AS DATE)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           CAST(o_orderdate AS DATE)) AS gap_days
  FROM orders
),
per_cust AS (
  SELECT o_custkey,
         CAST(count(gap_days) AS BIGINT) AS n_repeats,
         floor(avg(CAST(gap_days AS DOUBLE)) * 100 + 0.5) / 100 AS avg_gap_days
  FROM gaps WHERE gap_days IS NOT NULL
  GROUP BY o_custkey
)
SELECT CAST(CAST(floor(avg_gap_days) AS BIGINT) // 7 AS BIGINT) AS gap_weeks_bucket,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(n_repeats) AS BIGINT) AS n_repeat_orders,
       floor(min(avg_gap_days) * 100 + 0.5) / 100 AS min_avg_gap,
       floor(max(avg_gap_days) * 100 + 0.5) / 100 AS max_avg_gap
FROM per_cust
GROUP BY 1
ORDER BY gap_weeks_bucket
"""


@register("customer_repeat_latency", oracle=_REPEAT_ORACLE, tags=("analytics", "retention"))
def customer_repeat_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase latency: per customer, the average days between
    consecutive orders, then the population histogram on week buckets
    — the replenishment-cycle readout subscription and CRM teams set
    win-back timers from (`customer_rfm_segments` scores recency
    once; this measures each customer's personal CADENCE). Gaps are
    exact integer days from a lag window; the per-customer mean is
    quantized to 2dp BEFORE bucketing so both engines bucket the
    same value. The lag window and per-customer agg share one
    custkey shuffle; the final histogram is weeks-bounded."""
    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = od.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    per_cust = gaps.groupBy("o_custkey").agg(
        F.count("gap_days").cast("long").alias("n_repeats"),
        (
            F.floor(F.avg(F.col("gap_days").cast("double")) * 100 + F.lit(0.5)) / 100
        ).alias("avg_gap_days"),
    )
    return (
        per_cust.groupBy(
            F.expr("CAST(floor(avg_gap_days) AS BIGINT) div 7")
            .cast("long")
            .alias("gap_weeks_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("n_repeats").cast("long").alias("n_repeat_orders"),
            (
                F.floor(F.min("avg_gap_days") * 100 + F.lit(0.5)) / 100
            ).alias("min_avg_gap"),
            (
                F.floor(F.max("avg_gap_days") * 100 + F.lit(0.5)) / 100
            ).alias("max_avg_gap"),
        )
        .orderBy("gap_weeks_bucket")
    )
