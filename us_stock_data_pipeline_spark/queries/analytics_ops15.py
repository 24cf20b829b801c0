"""Round-7 analytics additions, part 15: delta-method ratio-metric CI
and Simpson's-paradox segment audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Delta-method confidence interval for a ratio metric
# --------------------------------------------------------------------------

_RATIO_Z = 1.96

_RATIO_ORACLE = f"""
WITH per_user AS (
  SELECT event_type, user_id,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY event_type, user_id
),
m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x AS DOUBLE) * x) AS sxx,
         sum(CAST(y AS DOUBLE) * y) AS syy,
         sum(CAST(x AS DOUBLE) * y) AS sxy
  FROM per_user GROUP BY event_type
),
d AS (
  SELECT event_type, n, sx, sy,
         CAST(sx AS DOUBLE) / sy AS r,
         (sxx - CAST(sx AS DOUBLE) * sx / n) / (n - 1) AS vx,
         (syy - CAST(sy AS DOUBLE) * sy / n) / (n - 1) AS vy,
         (sxy - CAST(sx AS DOUBLE) * sy / n) / (n - 1) AS cxy,
         CAST(sy AS DOUBLE) / n AS ybar
  FROM m WHERE n > 1
)
SELECT event_type, n AS n_users,
       floor(r / 100 * 10000 + 0.5) / 10000 AS revenue_per_event,
       floor((r - {_RATIO_Z} * sqrt((vx - 2 * r * cxy + r * r * vy)
                                    / (ybar * ybar) / n)) / 100 * 10000 + 0.5) / 10000
         AS ci_low,
       floor((r + {_RATIO_Z} * sqrt((vx - 2 * r * cxy + r * r * vy)
                                    / (ybar * ybar) / n)) / 100 * 10000 + 0.5) / 10000
         AS ci_high
FROM d
ORDER BY event_type
"""


@register("agg_ratio_delta_ci", oracle=_RATIO_ORACLE, tags=("stats", "experiment"))
def agg_ratio_delta_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method 95% CI for a RATIO metric (revenue per event,
    randomization unit = user): ratio metrics violate the i.i.d.
    assumption behind `stats_wilson_ci`-style per-row intervals
    because both numerator and denominator vary per user — the delta
    method corrects with the covariance term, and is how every
    experimentation platform bounds revenue-per-session. All moments
    (Sx, Sy, Sxx, Syy, Sxy) accumulate from exact per-user integers
    in one groupBy; the variance formula evaluates as the same
    literal double expression on both engines. Two aggregations total
    — unit-level then metric-level — both map-side combinable."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("x"),
        F.count(F.lit(1)).cast("long").alias("y"),
    )
    xd = F.col("x").cast("double")
    yd = F.col("y").cast("double")
    m = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(xd * F.col("x")).alias("sxx"),
        F.sum(yd * F.col("y")).alias("syy"),
        F.sum(xd * F.col("y")).alias("sxy"),
    ).filter(F.col("n") > 1)
    n = F.col("n").cast("double")
    r = F.col("sx").cast("double") / F.col("sy")
    vx = (F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / n) / (n - 1)
    vy = (F.col("syy") - F.col("sy").cast("double") * F.col("sy") / n) / (n - 1)
    cxy = (F.col("sxy") - F.col("sx").cast("double") * F.col("sy") / n) / (n - 1)
    ybar = F.col("sy").cast("double") / n
    half = F.lit(_RATIO_Z) * F.sqrt(
        (vx - 2 * r * cxy + r * r * vy) / (ybar * ybar) / n
    )

    def r4(c):
        return F.floor(c / 100 * 10000 + F.lit(0.5)) / 10000

    return m.select(
        "event_type",
        F.col("n").alias("n_users"),
        r4(r).alias("revenue_per_event"),
        r4(r - half).alias("ci_low"),
        r4(r + half).alias("ci_high"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Simpson's-paradox segment audit
# --------------------------------------------------------------------------

_SIMPSON_ORACLE = """
WITH activity AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev FROM events GROUP BY user_id
),
med AS (
  SELECT max(n_ev) AS m FROM (
    SELECT n_ev, row_number() OVER (ORDER BY n_ev, user_id) AS rn,
           count(*) OVER () AS n
    FROM activity) t
  WHERE rn * 2 <= n + 1
),
labeled AS (
  SELECT e.user_id, e.event_type,
         CASE WHEN day(e.ts) <= 15 THEN 'early' ELSE 'late' END AS period,
         CASE WHEN a.n_ev > med.m THEN 'heavy' ELSE 'light' END AS segment
  FROM events e JOIN activity a ON a.user_id = e.user_id, med
),
rates AS (
  SELECT segment, period,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS conv
  FROM labeled GROUP BY segment, period
  UNION ALL
  SELECT 'pooled', period, CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
  FROM labeled GROUP BY period
)
SELECT e.segment,
       e.n AS n_early, e.conv AS conv_early,
       l.n AS n_late, l.conv AS conv_late,
       floor(CAST(e.conv AS DOUBLE) / e.n * 10000 + 0.5) / 10000 AS rate_early,
       floor(CAST(l.conv AS DOUBLE) / l.n * 10000 + 0.5) / 10000 AS rate_late,
       (e.conv * l.n > l.conv * e.n) AS early_gt_late
FROM rates e JOIN rates l
  ON l.segment = e.segment AND e.period = 'early' AND l.period = 'late'
ORDER BY e.segment
"""


@register("events_simpson_check", oracle=_SIMPSON_ORACLE, tags=("stats", "audit"))
def events_simpson_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox audit: conversion rate early- vs late-month,
    computed POOLED and within heavy/light user segments (split at
    the lower-median activity). When the pooled direction disagrees
    with every segment's direction, the aggregate is lying about the
    trend — the classic composition trap every metrics review checks
    before shipping a topline claim. Direction booleans are exact
    integer cross-multiplications (conv_e * n_l > conv_l * n_e), so
    the verdict can't flip on a float; the median split uses the
    rank-spelled lower median both engines agree on. Two fact passes
    (activity, then labeled rates) each one groupBy; the final
    compare is 3 rows."""
    ev = load_table(spark, sf_dir, "events")
    activity = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("n_ev"))
    from pyspark.sql import Window

    ranked = activity.select(
        "n_ev",
        F.row_number().over(Window.orderBy("n_ev", "user_id")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    med = ranked.filter(F.col("rn") * 2 <= F.col("n") + 1).agg(
        F.max("n_ev").alias("m")
    )
    labeled = (
        ev.join(activity, "user_id")
        .crossJoin(F.broadcast(med))
        .select(
            F.when(F.dayofmonth("ts") <= 15, "early").otherwise("late").alias("period"),
            F.when(F.col("n_ev") > F.col("m"), "heavy").otherwise("light").alias(
                "segment"
            ),
            F.col("event_type"),
        )
    )
    seg = labeled.groupBy("segment", "period").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("conv"),
    )
    pooled = labeled.groupBy("period").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("conv"),
    ).select(F.lit("pooled").alias("segment"), "period", "n", "conv")
    rates = seg.unionByName(pooled)
    e = rates.filter(F.col("period") == "early").select(
        "segment",
        F.col("n").alias("n_early"),
        F.col("conv").alias("conv_early"),
    )
    late = rates.filter(F.col("period") == "late").select(
        "segment",
        F.col("n").alias("n_late"),
        F.col("conv").alias("conv_late"),
    )

    def r4(c):
        return F.floor(c * 10000 + F.lit(0.5)) / 10000

    return (
        e.join(late, "segment")
        .select(
            "segment",
            "n_early",
            "conv_early",
            "n_late",
            "conv_late",
            r4(F.col("conv_early").cast("double") / F.col("n_early")).alias(
                "rate_early"
            ),
            r4(F.col("conv_late").cast("double") / F.col("n_late")).alias("rate_late"),
            (
                F.col("conv_early") * F.col("n_late")
                > F.col("conv_late") * F.col("n_early")
            ).alias("early_gt_late"),
        )
        .orderBy("segment")
    )
