"""Round-41 analytics, part 46: jackknife variance of a ratio estimator
and session position-bias curves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Jackknife variance of the revenue-per-quantity ratio
# --------------------------------------------------------------------------

_JACK_ORACLE = """
WITH obs AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
         CAST(round(l_quantity) AS BIGINT) AS x
  FROM lineitem
),
tot AS (
  SELECT flag, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x) AS BIGINT) AS sx
  FROM obs GROUP BY flag
),
loo AS (  -- leave-one-out ratio per row, from the group totals
  SELECT o.flag, t.n, t.sy, t.sx,
         CAST(floor(CAST(t.sy - o.y AS DOUBLE) / (t.sx - o.x) + 0.5)
           AS BIGINT) AS theta_i_q
  FROM obs o JOIN tot t ON t.flag = o.flag
),
agg AS (
  SELECT flag, n, sy, sx,
         CAST(sum(theta_i_q) AS BIGINT) AS s1,
         CAST(sum(theta_i_q * theta_i_q) AS BIGINT) AS s2
  FROM loo GROUP BY flag, n, sy, sx
)
SELECT flag, n AS n_lines,
       CAST(floor(CAST(sy AS DOUBLE) / sx * 1000000 + 0.5) AS BIGINT)
         AS ratio_e6,
       -- jackknife variance: (n-1)/n * sum (theta_i - mean_theta)^2, in
       -- quantized-theta units: (n-1)/n * (s2 - s1^2/n)
       CAST(floor((CAST(n AS DOUBLE) - 1) / n
                  * (s2 - CAST(s1 AS DOUBLE) * s1 / n) + 0.5) AS BIGINT)
         AS jack_var_q
FROM agg
ORDER BY flag
"""


@register("stats_jackknife_ratio", oracle=_JACK_ORACLE, tags=("stats",))
def stats_jackknife_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jackknife variance of a RATIO estimator (revenue per unit) — the
    resampling answer for statistics where no closed-form variance
    exists (a ratio of sums is the canonical case; the delta method
    `agg_ratio_delta_ci` approximates what the jackknife measures
    empirically). The trick that makes it one pass: the leave-one-out
    ratio theta_i = (Sy - y_i)/(Sx - x_i) needs only the GROUP TOTALS
    joined back per row — no n re-aggregations, no loop — and each
    theta_i is quantized to WHOLE CENTS before the variance power
    sums (the ratio sits near 1.6e5 cents/unit, so any finer grid
    squares past int64 on a 200k-row group; cents-squared variance
    units are exactly what the delta-method CI consumes), so
    everything downstream is exact BIGINT (one double expression at
    the end for the (n-1)/n scaling). Contrast with the Poisson
    bootstrap (`stats_bootstrap_ci`): jackknife is deterministic by
    construction. Plan: one totals aggregate broadcast back, one
    power-sum rollup — two fact passes total."""
    obs = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        F.round("l_quantity").cast("long").alias("x"),
    )
    tot = obs.groupBy("flag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("x").cast("long").alias("sx"),
    )
    loo = obs.join(F.broadcast(tot), "flag").select(
        "flag",
        "n",
        "sy",
        "sx",
        F.floor(
            (F.col("sy") - F.col("y")).cast("double") / (F.col("sx") - F.col("x"))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("theta_i_q"),
    )
    agg = loo.groupBy("flag", "n", "sy", "sx").agg(
        F.sum("theta_i_q").cast("long").alias("s1"),
        F.sum(F.col("theta_i_q") * F.col("theta_i_q")).cast("long").alias("s2"),
    )
    return agg.select(
        "flag",
        F.col("n").alias("n_lines"),
        F.floor(F.col("sy").cast("double") / F.col("sx") * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("ratio_e6"),
        F.floor(
            (F.col("n").cast("double") - 1)
            / F.col("n")
            * (F.col("s2") - F.col("s1").cast("double") * F.col("s1") / F.col("n"))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("jack_var_q"),
    ).orderBy("flag")


# --------------------------------------------------------------------------
# Session position-bias curve
# --------------------------------------------------------------------------

_POSBIAS_MAX_POS = 10

_POSBIAS_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS pos,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS nxt
  FROM events
)
SELECT CAST(pos AS BIGINT) AS position,
       CAST(count(*) AS BIGINT) AS n_impressions,
       CAST(sum(CASE WHEN nxt = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_conversions,
       CAST(sum(CASE WHEN nxt = 'purchase' THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS cvr_e6
FROM seq
WHERE pos <= {_POSBIAS_MAX_POS} AND nxt IS NOT NULL
GROUP BY pos
ORDER BY position
"""


@register("events_position_bias", oracle=_POSBIAS_ORACLE, tags=("analytics", "window"))
def events_position_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-bias curve: conversion probability of the NEXT action
    as a function of how deep into their event sequence a user is —
    the curve a search/recommendation team divides out of click data
    before training a ranker on it (raw click-through conflates
    relevance with position; the bias curve is the denominator).
    Position is the exact sequence index per user, conversion the
    exact next-event test, CVR an exact integer ratio. Truncated at
    position {_POSBIAS_MAX_POS} where impressions thin out. Plan:
    one (user, event_id) sort shared by row_number and lead, one
    small rollup."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = ev.select(
        F.row_number().over(w).alias("pos"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter((F.col("pos") <= _POSBIAS_MAX_POS) & F.col("nxt").isNotNull())
    return (
        seq.groupBy(F.col("pos").cast("long").alias("position"))
        .agg(
            F.count("*").cast("long").alias("n_impressions"),
            F.sum(F.when(F.col("nxt") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("n_conversions"),
            F.expr(
                "CAST(sum(CASE WHEN nxt = 'purchase' THEN 1 ELSE 0 END) * 1000000"
                " div count(*) AS BIGINT)"
            ).alias("cvr_e6"),
        )
        .orderBy("position")
    )
