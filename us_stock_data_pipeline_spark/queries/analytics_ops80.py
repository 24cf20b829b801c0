"""Round-86 analytics, part 80: Heikin-Ashi smoothed candles
(integer-exact recursion) and circular statistics of intraday timing.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.functions import detmath
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Heikin-Ashi candles: ha_open recursion carried at 4x exact integer
# --------------------------------------------------------------------------

_HA_ORACLE = """
WITH RECURSIVE bars0 AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_min(value, event_id) * 100) AS BIGINT) AS o,
         CAST(round(max(value) * 100) AS BIGINT) AS h,
         CAST(round(min(value) * 100) AS BIGINT) AS l,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
bars AS (
  SELECT symbol, day, o, h, l, c,
         row_number() OVER (PARTITION BY symbol ORDER BY day) AS rn
  FROM bars0
),
-- state carried at 4x cents: ha_close4 = o+h+l+c (exact); the open
-- recursion halves with truncating integer division, identical in both
-- engines for the positive values here
ha(symbol, day, rn, o, h, l, c, ha_open4, ha_close4) AS (
  SELECT symbol, day, rn, o, h, l, c, (o + c) * 2, o + h + l + c
  FROM bars WHERE rn = 1
  UNION ALL
  SELECT b.symbol, b.day, b.rn, b.o, b.h, b.l, b.c,
         (p.ha_open4 + p.ha_close4) // 2,
         b.o + b.h + b.l + b.c
  FROM bars b JOIN ha p ON b.symbol = p.symbol AND b.rn = p.rn + 1
)
SELECT symbol, day,
       CAST(ha_open4 AS BIGINT) AS ha_open4,
       CAST(ha_close4 AS BIGINT) AS ha_close4,
       CAST(greatest(h * 4, ha_open4, ha_close4) AS BIGINT) AS ha_high4,
       CAST(least(l * 4, ha_open4, ha_close4) AS BIGINT) AS ha_low4,
       CAST(CASE WHEN ha_close4 > ha_open4 THEN 1
                 WHEN ha_close4 < ha_open4 THEN -1 ELSE 0 END AS BIGINT)
         AS ha_trend
FROM ha
ORDER BY symbol, day
"""


@register("bars_heikin_ashi", oracle=_HA_ORACLE, tags=("stock", "udf", "recursive"))
def bars_heikin_ashi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heikin-Ashi smoothed candles: ha_close = (O+H+L+C)/4 and
    ha_open = (prev ha_open + prev ha_close)/2 — the trend-smoothing
    transform chartists use to suppress single-bar noise, and another
    genuinely recursive indicator (ha_open feeds back on itself, so
    window frames can't express it — the `bars_ema` escape-hatch
    family). Exactness: everything carries at 4x cents so ha_close is
    EXACT; the open recursion halves with truncating integer division,
    keeping kernel and recursive-CTE oracle bit-identical at any
    horizon. ha_high/low fold the raw extremes against both HA lines
    (all at 4x, no division). The day's open proxies as the value at
    the smallest event_id (arg_min), the close as arg_max — the same
    convention the OHLCV resample pins. One shuffle on symbol; each
    series is one Arrow batch in the applyInPandas kernel."""
    ev = load_table(spark, sf_dir, "events")
    bars = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.min_by("value", "event_id") * 100).cast("long").alias("o"),
        F.round(F.max("value") * 100).cast("long").alias("h"),
        F.round(F.min("value") * 100).cast("long").alias("l"),
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"),
    )

    def ha_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        # plain-array recursion, not iterrows: the per-row pandas Series
        # construction dominated the kernel (same rewrite as the r8
        # Croston fix, ~1s). ha_close4 is vectorized; only the true
        # ha_open feedback walks the arrays.
        pdf = pdf.sort_values("day").reset_index(drop=True)
        o = pdf["o"].to_numpy()
        closes = o + pdf["h"].to_numpy() + pdf["l"].to_numpy() + pdf["c"].to_numpy()
        opens = closes.copy()
        if len(o):
            opens[0] = (int(o[0]) + int(pdf["c"].iloc[0])) * 2
            cl = closes.tolist()
            op = opens.tolist()
            for i in range(1, len(op)):
                op[i] = (op[i - 1] + cl[i - 1]) // 2
            opens = op
        pdf["ha_open4"] = opens
        pdf["ha_close4"] = closes
        return pdf[["symbol", "day", "o", "h", "l", "c", "ha_open4", "ha_close4"]]

    out_schema = (
        "symbol string, day date, o long, h long, l long, c long, "
        "ha_open4 long, ha_close4 long"
    )
    ha = bars.groupBy("symbol").applyInPandas(ha_kernel, out_schema)
    return ha.select(
        "symbol",
        "day",
        "ha_open4",
        "ha_close4",
        F.greatest(F.col("h") * 4, F.col("ha_open4"), F.col("ha_close4"))
        .cast("long")
        .alias("ha_high4"),
        F.least(F.col("l") * 4, F.col("ha_open4"), F.col("ha_close4"))
        .cast("long")
        .alias("ha_low4"),
        F.when(F.col("ha_close4") > F.col("ha_open4"), 1)
        .when(F.col("ha_close4") < F.col("ha_open4"), -1)
        .otherwise(0)
        .cast("long")
        .alias("ha_trend"),
    ).orderBy("symbol", "day")


# --------------------------------------------------------------------------
# Circular statistics: mean direction + resultant length of event timing
# --------------------------------------------------------------------------

# the 24 hour-bin unit vectors are PYTHON double literals (repr round-
# trips exactly, so both engines parse the same bits), and the mean
# direction runs through the libm-free det_atan2 kernel — no trig libm
# anywhere in a hashed column (transcendental audit r9).
_CIRC_TWO_PI = 2 * 3.141592653589793
_CIRC_TRIG = [
    (hr, math.cos(_CIRC_TWO_PI * hr / 24), math.sin(_CIRC_TWO_PI * hr / 24))
    for hr in range(24)
]
_CIRC_VALUES = ", ".join(
    f"({h}, CAST({c!r} AS DOUBLE), CAST({s!r} AS DOUBLE))" for h, c, s in _CIRC_TRIG
)
_CIRC_AT_STAGES = detmath.det_atan2_stages(
    "CAST(sy AS DOUBLE)", "CAST(sx AS DOUBLE)", "circ_at"
)
_CIRC_MEAN_HOUR = (
    f"CAST(floor(((circ_at + {_CIRC_TWO_PI!r}) / {_CIRC_TWO_PI!r}) * 24000 + 0.5)"
    " AS BIGINT) % 24000"
)

_CIRC_ORACLE = f"""
WITH hours AS (
  SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS hr,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
trig AS (SELECT * FROM (VALUES {_CIRC_VALUES}) AS t(hr, cosv, sinv)),
-- per-bin unit vectors on the 24-hour circle, scaled by EXACT counts and
-- quantized to integer micro per bin BEFORE the sum: the cross-bin
-- aggregation is order-free integer arithmetic (24 bins max)
vecs AS (
  SELECT event_type, h.hr, n,
         CAST(floor(t.cosv * n * 1000000 + 0.5) AS BIGINT) AS cx,
         CAST(floor(t.sinv * n * 1000000 + 0.5) AS BIGINT) AS cy
  FROM hours h JOIN trig t ON t.hr = h.hr
),
agg AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS n_events,
         CAST(sum(cx) AS BIGINT) AS sx, CAST(sum(cy) AS BIGINT) AS sy
  FROM vecs GROUP BY event_type
)
SELECT event_type, n_events, sx AS sum_cos_micro, sy AS sum_sin_micro,
       -- resultant length R in micro (0 = uniform, 1e6 = fully peaked)
       CAST(floor(sqrt(CAST(sx AS DOUBLE) * sx + CAST(sy AS DOUBLE) * sy)
                  / n_events + 0.5) AS BIGINT) AS resultant_micro,
       -- mean direction in milli-hours on [0, 24000)
       {_CIRC_MEAN_HOUR} AS mean_hour_milli
FROM {detmath.stages_to_select(_CIRC_AT_STAGES, "agg")}
ORDER BY event_type
"""


@register("events_circular_timing_stats", oracle=_CIRC_ORACLE, tags=("stats", "analytics"))
def events_circular_timing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular statistics of intraday event timing per type: hours map
    to angles on the 24-hour circle, and the resultant vector gives the
    MEAN DIRECTION (peak hour) and concentration R (0 = uniform, 1 =
    all events in one hour) — the correct average for cyclic data,
    where a naive mean of {23h, 1h} says noon and the circular mean
    says midnight (`events_seasonality_chisq` tests non-uniformity;
    this measures WHERE the mass points and how hard). Exactness: the
    tape first collapses to a 24-bin exact histogram; each bin's unit
    vector scales by its exact count and quantizes to integer micro,
    so the cross-bin sums are order-free BIGINT; one atan2 + one sqrt
    assemble the outputs. Plan: one groupBy to (type, hour) — 24 rows
    per type no matter the tape — then a tiny second aggregate."""
    ev = load_table(spark, sf_dir, "events")
    hours = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hr")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    trig = spark.createDataFrame(_CIRC_TRIG, "hr long, cosv double, sinv double")
    vecs = hours.join(F.broadcast(trig), "hr").selectExpr(
        "event_type",
        "n",
        "CAST(floor(cosv * n * 1000000 + 0.5) AS BIGINT) AS cx",
        "CAST(floor(sinv * n * 1000000 + 0.5) AS BIGINT) AS cy",
    )
    agg = vecs.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n_events"),
        F.sum("cx").cast("long").alias("sx"),
        F.sum("cy").cast("long").alias("sy"),
    )
    return (
        detmath.apply_stages(agg, _CIRC_AT_STAGES)
        .selectExpr(
            "event_type",
            "n_events",
            "sx AS sum_cos_micro",
            "sy AS sum_sin_micro",
            "CAST(floor(sqrt(CAST(sx AS DOUBLE) * sx + CAST(sy AS DOUBLE) * sy)"
            " / n_events + 0.5) AS BIGINT) AS resultant_micro",
            f"{_CIRC_MEAN_HOUR} AS mean_hour_milli",
        )
        .orderBy("event_type")
    )
