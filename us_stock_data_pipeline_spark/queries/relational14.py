"""Round-7 relational additions, part 14: interval union coverage,
Theil-Sen robust trend, backlog aging, and source freshness SLA.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Interval union coverage (merge overlapping intervals, sweep-line)
# --------------------------------------------------------------------------

_COVERAGE_ORACLE = """
WITH iv AS (
  SELECT user_id, event_id,
         epoch_us(ts) AS s,
         epoch_us(ts) + CAST(round(value) AS BIGINT) * 1000000 AS e
  FROM events
),
flagged AS (
  SELECT user_id, event_id, s, e,
         CASE WHEN s > coalesce(max(e) OVER (
                PARTITION BY user_id ORDER BY s, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -9223372036854775807)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  SELECT user_id, s, e,
         sum(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
                               ROWS UNBOUNDED PRECEDING) AS island_id
  FROM flagged
),
merged AS (
  SELECT user_id, island_id, min(s) AS ms, max(e) AS me
  FROM islands GROUP BY user_id, island_id
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(me - ms) // 1000000 AS BIGINT) AS covered_seconds
FROM merged
GROUP BY user_id
ORDER BY user_id
"""


@register("interval_union_coverage", oracle=_COVERAGE_ORACLE, tags=("relational", "interval"))
def interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union coverage: each event opens an interval
    [ts, ts + value seconds]; per user, merge every overlapping run
    into islands (the sweep-line classic) and report how many disjoint
    islands remain and the total covered wall-clock — the shape behind
    machine-uptime, ad-exposure, and on-call coverage accounting, and
    a strictly harder variant of `etl_sessionization_gaps` because
    interval ENDS vary per row (an interval can swallow several
    successors). The island flag compares each start to the running
    max end over STRICTLY PRECEDING rows; coverage uses the sweep-line
    identity sum(island_max_e - island_min_s) ==
    sum(max(0, e - max(s, prev_max_e))) — each row contributes only
    its NEW area — which is exact for non-negative interval lengths
    (value >= 0 in this corpus) and folds the island-id cumsum +
    (user, island) merge + final rollup into ONE groupBy(user_id)
    directly after the window: one shuffle total instead of three
    (the round-6 scale sweep measured the 3-shuffle form at 12.5x
    wall for 10x data; this form re-measures sub-linear). All
    arithmetic is exact integer microseconds."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.round("value").cast("long") * 1000000).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.coalesce(F.max("e").over(w_prev), F.lit(-9223372036854775807))
    flagged = iv.select(
        "user_id",
        F.when(F.col("s") > prev_max, 1).otherwise(0).alias("new_island"),
        F.greatest(
            F.lit(0), F.col("e") - F.greatest(F.col("s"), prev_max)
        ).alias("new_cover_us"),
    )
    return (
        flagged.groupBy("user_id")
        .agg(
            F.sum("new_island").cast("long").alias("n_islands"),
            F.floor(F.sum("new_cover_us") / 1000000).cast("long").alias("covered_seconds"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Theil-Sen robust trend slope (median of pairwise slopes)
# --------------------------------------------------------------------------

_THEILSEN_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type,
         CAST(b.cents - a.cents AS DOUBLE) / date_diff('day', a.d, b.d) AS slope
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d
),
ranked AS (
  SELECT event_type, slope,
         row_number() OVER (PARTITION BY event_type ORDER BY slope) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM pairs
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n_pairs,
       floor(max(CASE WHEN rn * 2 <= n + 1 THEN slope END) * 10000 + 0.5) / 10000
         AS theil_sen_slope
FROM ranked
GROUP BY event_type
ORDER BY event_type
"""


@register("timeseries_theil_sen", oracle=_THEILSEN_ORACLE, tags=("stats", "timeseries"))
def timeseries_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen estimator: the LOWER MEDIAN of all pairwise
    day-over-day slopes of a type's daily revenue — the robust trend
    line that shrugs off the outlier days that wreck the OLS fit in
    `agg_regression` (up to ~29% contamination). Slopes are exact-int
    differences divided once in IEEE double, so both engines order
    pairs identically and the rank-picked lower median is
    deterministic without any float-accumulation concern. The pair
    join is PER-TYPE on the DAILY aggregate — O(days^2) per series,
    days bounded by the calendar, never by corpus size — after a
    single fact groupBy; at 100 TB the only full-data pass is that
    first aggregation."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents"))
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type")) & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.cents") - F.col("a.cents")).cast("double")
            / F.datediff(F.col("b.d"), F.col("a.d"))
        ).alias("slope"),
    )
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(Window.partitionBy("event_type").orderBy("slope")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_pairs"),
            (
                F.floor(
                    F.max(
                        F.when(F.col("rn") * 2 <= F.col("n") + 1, F.col("slope"))
                    )
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("theil_sen_slope"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Backlog aging report
# --------------------------------------------------------------------------

_AGING_ORACLE = """
WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
aged AS (
  SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), mx.maxd) <= 30 THEN '0-30'
              WHEN date_diff('day', CAST(o_orderdate AS DATE), mx.maxd) <= 60 THEN '31-60'
              WHEN date_diff('day', CAST(o_orderdate AS DATE), mx.maxd) <= 90 THEN '61-90'
              ELSE '90+' END AS age_bucket,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders, mx
  WHERE o_orderstatus <> 'F'
),
tot AS (SELECT CAST(sum(cents) AS BIGINT) AS t FROM aged)
SELECT age_bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS open_cents,
       floor(CAST(sum(cents) AS DOUBLE) / max(tot.t) * 10000 + 0.5) / 10000
         AS value_share
FROM aged, tot
GROUP BY age_bucket
ORDER BY age_bucket
"""


@register("orders_backlog_aging", oracle=_AGING_ORACLE, tags=("analytics", "etl"))
def orders_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog aging: every non-finalized order bucketed by
    days outstanding relative to the dataset's watermark date
    (0-30/31-60/61-90/90+), with exact open value in integer cents and
    each bucket's share of total backlog — the AR-aging shape every
    finance close runs (`orders_fulfillment_leadtime` measures closed
    orders; this measures what's still open). The watermark is one
    broadcast scalar; bucketing is a map-side CASE on datediff; one
    4-group agg ends it. Status filter prunes at the scan."""
    od = load_table(spark, sf_dir, "orders")
    mx = od.agg(F.max(F.col("o_orderdate").cast("date")).alias("maxd"))
    age = F.datediff(F.col("maxd"), F.col("o_orderdate").cast("date"))
    aged = (
        od.filter(F.col("o_orderstatus") != "F")
        .crossJoin(F.broadcast(mx))
        .select(
            F.when(age <= 30, "0-30")
            .when(age <= 60, "31-60")
            .when(age <= 90, "61-90")
            .otherwise("90+")
            .alias("age_bucket"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    tot = aged.agg(F.sum("cents").cast("long").alias("t"))
    return (
        aged.crossJoin(F.broadcast(tot))
        .groupBy("age_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("open_cents"),
            (
                F.floor(F.sum("cents").cast("double") / F.max("t") * 10000 + F.lit(0.5))
                / 10000
            ).alias("value_share"),
        )
        .orderBy("age_bucket")
    )


# --------------------------------------------------------------------------
# Source freshness SLA report
# --------------------------------------------------------------------------

_FRESHNESS_ORACLE = """
WITH mx AS (SELECT max(epoch_us(ts)) AS gmax FROM events),
per AS (
  SELECT event_type,
         max(epoch_us(ts)) AS last_us,
         CAST(count(*) AS BIGINT) AS rows_total,
         CAST(sum(CASE WHEN epoch_us(ts) > mx.gmax - CAST(604800000000 AS BIGINT)
                       THEN 1 ELSE 0 END) AS BIGINT) AS rows_7d
  FROM events, mx
  GROUP BY event_type, mx.gmax
)
SELECT event_type,
       CAST((SELECT gmax FROM mx) // 60000000 - last_us // 60000000 AS BIGINT)
         AS minutes_behind,
       CAST(((SELECT gmax FROM mx) // 60000000 - last_us // 60000000) > 1440 AS BOOLEAN)
         AS sla_breach,
       rows_7d, rows_total
FROM per
ORDER BY event_type
"""


@register("etl_freshness_sla", oracle=_FRESHNESS_ORACLE, tags=("etl", "quality"))
def etl_freshness_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source freshness SLA report: how many minutes each event
    type's newest record lags the newest record anywhere, whether that
    breaches a 24h SLA, and the 7-day vs lifetime row volumes — the
    ingestion-health dashboard row that pages the on-call when one
    upstream feed silently stalls (the monitoring twin of
    `etl_incremental_watermark`, which CONSUMES these watermarks).
    Lag arithmetic is exact integer minutes (floor-divided micros, so
    the engines can't disagree on a boundary). One projected scan,
    one per-type agg, one broadcast global max."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    mx = ev.agg(F.max(us).alias("gmax"))
    per = (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("event_type", "gmax")
        .agg(
            F.max(us).alias("last_us"),
            F.count(F.lit(1)).cast("long").alias("rows_total"),
            F.sum(
                F.when(us > F.col("gmax") - F.lit(7 * 86400 * 1000000).cast("long"), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("rows_7d"),
        )
    )
    behind = (
        F.floor(F.col("gmax") / 60000000) - F.floor(F.col("last_us") / 60000000)
    ).cast("long")
    return per.select(
        "event_type",
        behind.alias("minutes_behind"),
        (behind > 1440).alias("sla_breach"),
        "rows_7d",
        "rows_total",
    ).orderBy("event_type")
