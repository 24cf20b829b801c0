"""Round-5 relational/analytics additions, part 8: exact mode,
geometric/harmonic means, forward as-of join, and rolling DAU/WAU
engagement — each a distinct capability the earlier surface lacked.

House contract: Spark-first plans, identically-aliased DuckDB oracles,
floats rounded identically, 100 TB rationale in docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Exact mode (most frequent value) per group
# --------------------------------------------------------------------------

_MODE_ORACLE = """
WITH b AS (
  SELECT event_type, CAST(floor(value / 50) AS BIGINT) AS bucket FROM events
),
c AS (
  SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM b GROUP BY 1, 2
),
r AS (
  SELECT event_type, bucket, cnt,
         row_number() OVER (PARTITION BY event_type ORDER BY cnt DESC, bucket) AS rn
  FROM c
)
SELECT event_type, bucket AS mode_bucket, cnt AS mode_count
FROM r WHERE rn = 1
ORDER BY event_type
"""


@register("agg_mode_exact", oracle=_MODE_ORACLE, tags=("agg",))
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact mode per group (most frequent value-bucket, deterministic
    smallest-bucket tie-break) — the discrete companion to
    `agg_median_any`. Two partial aggregates: count per (group, bucket),
    then argmax per group via a window over the COUNTED table — the
    window input is |groups| x |buckets| rows, not the corpus, so at
    100 TB the heavy data passes through one map-side-combined groupBy
    and the ranking touches only aggregate state. (Spark's own `mode()`
    agg has an undefined tie-break — the windowed formulation pins it.)"""
    ev = load_table(spark, sf_dir, "events")
    c = (
        ev.select(
            "event_type", F.floor(F.col("value") / 50).cast("long").alias("bucket")
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rn = F.row_number().over(
        W.partitionBy("event_type").orderBy(F.desc("cnt"), "bucket")
    )
    return (
        c.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("bucket").alias("mode_bucket"),
            F.col("cnt").alias("mode_count"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Geometric / harmonic means
# --------------------------------------------------------------------------

_PYTHAGOREAN_ORACLE = """
SELECT l_returnflag,
       round(exp(avg(ln(l_extendedprice))), 2) AS geo_mean,
       round(count(*) / sum(1.0 / l_extendedprice), 2) AS harm_mean,
       round(avg(l_extendedprice), 2) AS arith_mean
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("agg_pythagorean_means", oracle=_PYTHAGOREAN_ORACLE, tags=("agg",))
def agg_pythagorean_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three Pythagorean means in one pass: geometric via the
    log-space rewrite (exp(avg(ln x)) — the same overflow-proof trick as
    `agg_product_logspace`: a direct product of 20k prices overflows
    double at ~1e308, the log-sum never does) and harmonic via
    n / sum(1/x) (the right mean for rates). One map-side-combined
    groupBy carries all three accumulators — adding means costs zero
    extra shuffles, the classic mergeable-aggregate property."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.exp(F.avg(F.log("l_extendedprice"))), 2).alias("geo_mean"),
            F.round(
                F.count(F.lit(1)) / F.sum(1.0 / F.col("l_extendedprice")), 2
            ).alias("harm_mean"),
            F.round(F.avg("l_extendedprice"), 2).alias("arith_mean"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Forward as-of join
# --------------------------------------------------------------------------


@register(
    "join_asof_forward",
    oracle="""
SELECT
  p.event_id,
  p.user_id,
  p.ts,
  (SELECT min(c.ts) FROM events c
    WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts >= p.ts
  ) AS next_click_ts
FROM events p
WHERE p.event_type = 'purchase'
ORDER BY p.event_id
""",
    tags=("join", "asof"),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (next click at-or-after each purchase) —
    completing the as-of pair with `join_asof` (backward). Same
    union + single-window formulation, mirrored: conditional running
    MIN over an unbounded-FOLLOWING frame. At equal timestamps the
    click must be visible to the purchase (>= semantics), so purchases
    sort BEFORE clicks within a ts via side DESC — the exact boundary
    trick the backward twin uses in reverse. Still one shuffle on
    user_id, no per-row subquery, no join at all."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(0).alias("side"), F.lit(None).cast("long").alias("event_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("side"), "event_id"
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", F.desc("side"))
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    merged = clicks.unionByName(purchases).withColumn(
        "next_click_ts", F.min(F.when(F.col("side") == 0, F.col("ts"))).over(w)
    )
    return (
        merged.filter(F.col("side") == 1)
        .select("event_id", "user_id", "ts", "next_click_ts")
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Rolling DAU / WAU engagement
# --------------------------------------------------------------------------

_DAU_WAU_ORACLE = """
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY d),
spread AS (
  SELECT du.user_id, du.d + CAST(x.i AS INTEGER) AS target_d
  FROM du, generate_series(0, 6) x(i)
),
wau AS (
  SELECT target_d AS d, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
  FROM spread GROUP BY 1
)
SELECT dau.d, dau.dau, wau.wau,
       round(dau.dau * 1.0 / wau.wau, 4) AS stickiness
FROM dau JOIN wau USING (d)
ORDER BY d
"""


@register("events_rolling_dau_wau", oracle=_DAU_WAU_ORACLE, tags=("analytics", "window"))
def events_rolling_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day. Rolling DISTINCT
    counts can't ride a window frame (count(distinct) over a moving
    range isn't mergeable state) — the scalable formulation SPREADS each
    (user, active-day) pair to the 7 target days it contributes to
    (explode of a 7-element sequence, map-side) and then runs a plain
    countDistinct per target day. Data volume grows 7x in-stage but
    shuffles ONCE on the day key, versus the naive 7-way self-join or a
    per-day subquery scan. This spread-then-aggregate shape is how
    rolling-unique metrics (WAU/MAU, trailing-k retention) are computed
    over billions of users — the multiplier is the window length, not
    the corpus size."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    dau = du.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    spread = du.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        "d",
    ).select("user_id", F.expr("date_add(d, i)").alias("d"))
    wau = spread.groupBy("d").agg(F.countDistinct("user_id").alias("wau"))
    return (
        dau.join(wau, "d")
        .select(
            "d",
            "dau",
            "wau",
            F.round(F.col("dau") * 1.0 / F.col("wau"), 4).alias("stickiness"),
        )
        .orderBy("d")
    )
