"""Round-114 analytics, part 104: daily category-mix surprise score
and session bounce/depth profile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Daily mix-surprise: KL divergence of each day's event mix vs the
# whole-corpus profile (top anomalous days)
# --------------------------------------------------------------------------

_SURPRISE_TOPK = 10

_SURPRISE_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
day_tot AS (SELECT day, CAST(sum(n) AS BIGINT) AS dn FROM daily GROUP BY day),
gprof AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS g FROM daily GROUP BY event_type
),
gt AS (SELECT CAST(sum(g) AS BIGINT) AS gn FROM gprof),
-- per-(day, type) KL term p*ln(p/q), quantized micro BEFORE the per-day
-- sum (types present globally but absent on a day contribute zero)
terms AS (
  SELECT d.day,
         CAST(floor(CAST(d.n AS DOUBLE) / t.dn
                    * ln(CAST(d.n AS DOUBLE) / t.dn
                         / (CAST(g.g AS DOUBLE) / gt.gn)) * 1000000 + 0.5)
           AS BIGINT) AS kl_micro
  FROM daily d
  JOIN day_tot t ON t.day = d.day
  JOIN gprof g ON g.event_type = d.event_type
  CROSS JOIN gt
),
scored AS (
  SELECT day, CAST(sum(kl_micro) AS BIGINT) AS surprise_micro
  FROM terms GROUP BY day
)
SELECT day, surprise_micro,
       CAST(row_number() OVER (ORDER BY surprise_micro DESC, day) AS BIGINT) AS rnk
FROM scored
QUALIFY rnk <= {_SURPRISE_TOPK}
ORDER BY rnk
"""


@register("events_mix_surprise_days", oracle=_SURPRISE_ORACLE, tags=("events", "drift"))
def events_mix_surprise_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily mix-surprise ranking: the KL divergence of each day's
    event-type distribution from the whole-corpus profile, surfacing
    the {_SURPRISE_TOPK} most anomalous days — the categorical-drift
    alarm in its per-period form (`corpus_js_divergence` compares
    SOURCES pairwise; this watches TIME and answers 'which days did
    the traffic composition break'). Exactness: each (day, type) KL
    term quantizes to integer micro before the per-day sum (order-
    free); zero-count cells drop out of the sum exactly as the limit
    prescribes. Plan: one (day, type) rollup — calendar x cardinality
    bounded — one broadcast global profile, one top-k window over
    days."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    registry.track_persist(daily)
    day_tot = daily.groupBy("day").agg(F.sum("n").cast("long").alias("dn"))
    glob = daily.groupBy("event_type").agg(F.sum("n").cast("long").alias("g"))
    gt = glob.agg(F.sum("g").cast("long").alias("gn"))
    p = F.col("n").cast("double") / F.col("dn")
    q = F.col("g").cast("double") / F.col("gn")
    terms = (
        daily.join(day_tot, "day")
        .join(F.broadcast(glob), "event_type")
        .crossJoin(F.broadcast(gt))
        .select(
            "day",
            F.floor(p * F.log(p / q) * 1000000 + F.lit(0.5)).cast("long").alias("kl_micro"),
        )
    )
    scored = terms.groupBy("day").agg(F.sum("kl_micro").cast("long").alias("surprise_micro"))
    w = Window.orderBy(F.col("surprise_micro").desc(), "day")
    return (
        scored.select("day", "surprise_micro", F.row_number().over(w).cast("long").alias("rnk"))
        .filter(F.col("rnk") <= _SURPRISE_TOPK)
        .orderBy("rnk")
    )


# --------------------------------------------------------------------------
# Session bounce rate + depth distribution (30-minute gap sessions)
# --------------------------------------------------------------------------

_BOUNCE_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM ordered
),
depth AS (
  SELECT user_id, sess_id, CAST(count(*) AS BIGINT) AS depth
  FROM sess GROUP BY user_id, sess_id
)
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN depth = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
       CAST(sum(CASE WHEN depth = 1 THEN 1 ELSE 0 END) * 10000 // count(*)
         AS BIGINT) AS bounce_rate_bp,
       CAST(max(depth) AS BIGINT) AS max_depth,
       CAST(sum(depth) AS BIGINT) AS total_events,
       CAST(sum(depth) * 1000 // count(*) AS BIGINT) AS mean_depth_milli
FROM depth
"""


@register("events_session_bounce_depth", oracle=_BOUNCE_ORACLE, tags=("events", "session"))
def events_session_bounce_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session bounce rate and depth profile over 30-minute-gap
    sessions: the fraction of sessions with exactly ONE event (the
    bounce rate every product dashboard leads with), plus depth mean
    and max — the summary readout on top of the sessionization
    machinery (`etl_sessionization_gaps` builds the sessions;
    `events_path_analysis` mines their order; this reports the
    engagement headline). Sessions form with the standard
    gaps-and-islands cumsum over a 30-minute inactivity gap with the
    (ts, event_id) tiebreak both windows repeat exactly. All counts
    exact integers; rates quantize via positive integer division.
    Plan: one user-keyed sort shared by the gap flag and the cumsum,
    one session rollup, one scalar reduce."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap: a seconds-truncated cast would disagree with
    # the oracle's INTERVAL comparison on sub-second boundaries
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    ordered = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap_us.isNull() | (gap_us > 1800 * 1_000_000), 1)
        .otherwise(0)
        .alias("new_sess"),
    )
    w_cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = ordered.select("user_id", F.sum("new_sess").over(w_cum).alias("sess_id"))
    depth = sess.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).cast("long").alias("depth")
    )
    return depth.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(F.when(F.col("depth") == 1, 1).otherwise(0)).cast("long").alias("n_bounces"),
        F.expr(
            "sum(CASE WHEN depth = 1 THEN 1 ELSE 0 END) * 10000 div count(*)"
        ).cast("long").alias("bounce_rate_bp"),
        F.max("depth").cast("long").alias("max_depth"),
        F.sum("depth").cast("long").alias("total_events"),
        F.expr("sum(depth) * 1000 div count(*)").cast("long").alias("mean_depth_milli"),
    )
