"""Round-6 analytics additions, part 8: conversion latency,
incremental aggregate-state merge, late-arriving dimension handling,
and MACD — product analytics, warehouse-maintenance, and momentum
coverage.

House contract: Spark-first plans, identically-aliased DuckDB oracles,
exact-integer accumulation (microseconds / cents / counts).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register


def _round4(col):
    return F.floor(col * 10000 + F.lit(0.5)) / 10000


# --------------------------------------------------------------------------
# Conversion latency (first view -> first purchase)
# --------------------------------------------------------------------------

_CONV_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS first_view,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS first_buy
  FROM events
  GROUP BY user_id
),
conv AS (
  SELECT user_id, first_buy - first_view AS lat_us
  FROM firsts
  WHERE first_view IS NOT NULL AND first_buy IS NOT NULL
    AND first_buy > first_view
)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM firsts WHERE first_view IS NOT NULL) AS n_viewers,
  CAST(count(*) AS BIGINT) AS n_converted,
  floor(avg(lat_us) / 3600000000.0 * 10000 + 0.5) / 10000 AS avg_hours,
  floor(quantile_cont(lat_us, 0.5) / 3600000000.0 * 10000 + 0.5) / 10000 AS p50_hours,
  floor(quantile_cont(lat_us, 0.9) / 3600000000.0 * 10000 + 0.5) / 10000 AS p90_hours
FROM conv
"""


@register("events_conversion_latency", oracle=_CONV_ORACLE, tags=("analytics", "funnel"))
def events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-view to first-purchase latency distribution — the
    time-dimension companion to `events_funnel` (which counts WHO
    converts; this measures HOW FAST). One conditional-min groupBy per
    user (map-side combinable: two mins in one pass, no per-type
    scans), then a one-row summary with exact integer microsecond
    latencies; the percentile buffer holds converter latencies only —
    converter-cardinality-sized, and swappable for the rank-based
    `agg_percentiles` formulation when even that outgrows a task."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.unix_micros("ts"))).alias(
            "first_view"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))).alias(
            "first_buy"
        ),
    )
    conv = firsts.filter(
        F.col("first_view").isNotNull()
        & F.col("first_buy").isNotNull()
        & (F.col("first_buy") > F.col("first_view"))
    ).select((F.col("first_buy") - F.col("first_view")).alias("lat_us"))
    n_viewers = firsts.filter(F.col("first_view").isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n_viewers")
    )
    hour = 3600000000.0
    summary = conv.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        _round4(F.avg("lat_us") / hour).alias("avg_hours"),
        _round4(F.expr("percentile(lat_us, 0.5)") / hour).alias("p50_hours"),
        _round4(F.expr("percentile(lat_us, 0.9)") / hour).alias("p90_hours"),
    )
    return n_viewers.crossJoin(F.broadcast(summary)).select(
        "n_viewers", "n_converted", "avg_hours", "p50_hours", "p90_hours"
    )


# --------------------------------------------------------------------------
# Incremental aggregate-state merge (partial -> merged rollup)
# --------------------------------------------------------------------------

_MERGE_ORACLE = """
WITH daily AS (
  -- the materialized daily partial state a warehouse maintains
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
         CAST(min(round(value * 100)) AS BIGINT) AS min_cents,
         CAST(max(round(value * 100)) AS BIGINT) AS max_cents
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(date_trunc('month', day) AS DATE) AS month,
       CAST(sum(cnt) AS BIGINT) AS cnt,
       CAST(sum(sum_cents) AS BIGINT) AS sum_cents,
       min(min_cents) AS min_cents,
       max(max_cents) AS max_cents,
       floor(CAST(sum(sum_cents) AS DOUBLE) / sum(cnt) / 100 * 10000 + 0.5) / 10000
         AS avg_value
FROM daily
GROUP BY 1, 2
ORDER BY event_type, month
"""


@register("etl_incremental_agg_merge", oracle=_MERGE_ORACLE, tags=("etl", "agg", "incremental"))
def etl_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: build per-day PARTIAL state
    (count/sum/min/max — all algebraic, so partials merge losslessly),
    then roll partials up to months without touching raw data again —
    the pattern behind every incremental materialized view and the
    reason a 100 TB daily pipeline re-aggregates only the new
    partition. The derived average comes from merged exact sums, never
    from averaging averages (the classic incremental-rollup bug).
    Plan: two groupBys where the second one's input is day-grain tiny;
    at scale the daily table is the stored artifact and the monthly
    merge reads partition-pruned partials only."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(cents).cast("long").alias("sum_cents"),
        F.min(cents).cast("long").alias("min_cents"),
        F.max(cents).cast("long").alias("max_cents"),
    )
    return (
        daily.groupBy(
            "event_type", F.date_trunc("month", F.col("day")).cast("date").alias("month")
        )
        .agg(
            F.sum("cnt").cast("long").alias("cnt"),
            F.sum("sum_cents").cast("long").alias("sum_cents"),
            F.min("min_cents").alias("min_cents"),
            F.max("max_cents").alias("max_cents"),
            _round4(
                F.sum("sum_cents").cast("double") / F.sum("cnt") / 100
            ).alias("avg_value"),
        )
        .orderBy("event_type", "month")
    )


# --------------------------------------------------------------------------
# Late-arriving dimension handling
# --------------------------------------------------------------------------

_LATE_MOD = 50

_LATE_ORACLE = f"""
WITH dim_now AS (
  -- simulate the dimension feed lagging: every 50th customer key has
  -- not arrived yet when the fact batch loads
  SELECT * FROM customer WHERE c_custkey % {_LATE_MOD} <> 0
),
joined AS (
  SELECT o.o_orderpriority, o.o_custkey,
         CASE WHEN d.c_custkey IS NULL THEN 1 ELSE 0 END AS is_late
  FROM orders o LEFT JOIN dim_now d ON o.o_custkey = d.c_custkey
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(is_late) AS BIGINT) AS n_late,
       CAST(count(DISTINCT CASE WHEN is_late = 1 THEN o_custkey END) AS BIGINT)
         AS n_pending_keys,
       floor(CAST(sum(is_late) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000
         AS late_share
FROM joined
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("etl_late_arriving_dimension", oracle=_LATE_ORACLE, tags=("etl", "join", "quality"))
def etl_late_arriving_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving dimension audit: facts LEFT-join the currently
    loaded dimension snapshot; unmatched rows are quantified per
    priority class along with the distinct pending keys that form the
    backfill queue — the bookkeeping every warehouse does before
    deciding to hold, default, or backfill (the inferred-member
    pattern; `etl_fk_conformance` is the static sibling, this is the
    operational one). Plan: the filtered dim broadcasts (dims stay
    KB-sized at any fact scale), the left join and both aggregates are
    one shuffle on the priority key — and the pending-key count uses
    the conditional-distinct shape, no second scan."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % _LATE_MOD != 0
    )
    joined = o.join(
        F.broadcast(c.select("c_custkey")), o.o_custkey == c.c_custkey, "left"
    ).select(
        "o_orderpriority",
        "o_custkey",
        F.when(F.col("c_custkey").isNull(), 1).otherwise(0).alias("is_late"),
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("is_late").cast("long").alias("n_late"),
            F.countDistinct(
                F.when(F.col("is_late") == 1, F.col("o_custkey"))
            )
            .cast("long")
            .alias("n_pending_keys"),
            _round4(F.sum("is_late").cast("double") / F.count(F.lit(1))).alias(
                "late_share"
            ),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# MACD (12/26 EMA spread + 9-EMA signal line)
# --------------------------------------------------------------------------

_MACD_ORACLE = """
WITH RECURSIVE bars0 AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         arg_max(value, event_id) AS close
  FROM events GROUP BY 1, 2
),
bars AS (
  SELECT symbol, day, close,
         row_number() OVER (PARTITION BY symbol ORDER BY day) AS rn
  FROM bars0
),
macd(symbol, day, rn, e12, e26, sig) AS (
  SELECT symbol, day, rn, close, close, CAST(0 AS DOUBLE) FROM bars WHERE rn = 1
  UNION ALL
  SELECT b.symbol, b.day, b.rn,
         (2.0 / 13) * b.close + (1 - 2.0 / 13) * m.e12,
         (2.0 / 27) * b.close + (1 - 2.0 / 27) * m.e26,
         (2.0 / 10) * (((2.0 / 13) * b.close + (1 - 2.0 / 13) * m.e12)
                       - ((2.0 / 27) * b.close + (1 - 2.0 / 27) * m.e26))
           + (1 - 2.0 / 10) * m.sig
  FROM bars b JOIN macd m ON b.symbol = m.symbol AND b.rn = m.rn + 1
)
SELECT symbol, day,
       round(e12 - e26, 4) AS macd,
       round(sig, 4) AS signal,
       round((e12 - e26) - sig, 4) AS histogram
FROM macd
ORDER BY symbol, day
"""


@register("bars_macd", oracle=_MACD_ORACLE, tags=("stock", "udf", "recursive"))
def bars_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD (12/26/9) over daily closes: THREE coupled recursions (fast
    EMA, slow EMA, signal EMA over their spread) in one pass — the
    deepest member of the recursive-kernel family (`bars_ema` one
    recursion, `timeseries_holt_linear` two, this three). Same
    architecture: shuffle once on symbol, applyInPandas kernel per
    series, arithmetic written to match the oracle's recursive CTE
    term-for-term (smoothing constants appear as 2.0/13-style
    divisions so both engines derive the identical double). The
    histogram column (MACD minus signal) is the crossover signal
    traders actually chart."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.max_by("value", "event_id").alias("close"))

    a12, a26, a9 = 2.0 / 13, 2.0 / 27, 2.0 / 10

    def macd_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        e12s = [0.0] * len(pdf)
        e26s = [0.0] * len(pdf)
        sigs = [0.0] * len(pdf)
        e12 = e26 = sig = None
        for i, x in enumerate(pdf["close"]):
            if e12 is None:
                e12, e26, sig = x, x, 0.0
            else:
                e12 = a12 * x + (1 - a12) * e12
                e26 = a26 * x + (1 - a26) * e26
                sig = a9 * (e12 - e26) + (1 - a9) * sig
            e12s[i], e26s[i], sigs[i] = e12, e26, sig
        pdf["e12"], pdf["e26"], pdf["sig"] = e12s, e26s, sigs
        return pdf[["symbol", "day", "e12", "e26", "sig"]]

    out_schema = "symbol string, day date, e12 double, e26 double, sig double"
    return (
        daily.groupBy("symbol")
        .applyInPandas(macd_kernel, out_schema)
        .select(
            "symbol",
            "day",
            F.round(F.col("e12") - F.col("e26"), 4).alias("macd"),
            F.round("sig", 4).alias("signal"),
            F.round((F.col("e12") - F.col("e26")) - F.col("sig"), 4).alias("histogram"),
        )
        .orderBy("symbol", "day")
    )
