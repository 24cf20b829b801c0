"""Round-66 analytics, part 65: CUPED variance-reduced A/B lift and
primary-vendor switching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# CUPED: pre-period covariate adjustment for the A/B purchase metric
# --------------------------------------------------------------------------

_CUPED_SPLIT_DAY = "2024-01-16"  # first 15 days are the pre-period

_CUPED_ORACLE = f"""
WITH users AS (
  SELECT DISTINCT user_id FROM events
),
metric AS (
  SELECT u.user_id, u.user_id % 2 AS treat,
         CAST(coalesce(sum(CASE WHEN e.ts < TIMESTAMP '{_CUPED_SPLIT_DAY}'
                    THEN CAST(round(e.value * 100) AS BIGINT) END), 0) AS BIGINT)
           AS pre,
         CAST(coalesce(sum(CASE WHEN e.ts >= TIMESTAMP '{_CUPED_SPLIT_DAY}'
                    THEN CAST(round(e.value * 100) AS BIGINT) END), 0) AS BIGINT)
           AS post
  FROM users u LEFT JOIN events e
    ON e.user_id = u.user_id AND e.event_type = 'purchase'
  GROUP BY u.user_id
),
pooled AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(pre) AS HUGEINT) AS sp, CAST(sum(post) AS HUGEINT) AS so,
         CAST(sum(pre * pre) AS HUGEINT) AS spp,
         CAST(sum(pre * post) AS HUGEINT) AS spo,
         CAST(sum(post * post) AS HUGEINT) AS soo
  FROM metric
),
arms AS (
  SELECT treat, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(pre) AS HUGEINT) AS sp, CAST(sum(post) AS HUGEINT) AS so
  FROM metric GROUP BY treat
),
theta AS (
  SELECT (CAST(p.n AS DOUBLE) * CAST(p.spo AS DOUBLE)
          - CAST(p.sp AS DOUBLE) * CAST(p.so AS DOUBLE)) AS cov_n,
         (CAST(p.n AS DOUBLE) * CAST(p.spp AS DOUBLE)
          - CAST(p.sp AS DOUBLE) * CAST(p.sp AS DOUBLE)) AS varp_n,
         (CAST(p.n AS DOUBLE) * CAST(p.soo AS DOUBLE)
          - CAST(p.so AS DOUBLE) * CAST(p.so AS DOUBLE)) AS varo_n,
         CAST(p.sp AS DOUBLE) / CAST(p.n AS DOUBLE) AS mean_pre_all
  FROM pooled p
),
armstats AS (
  SELECT a.treat, CAST(a.n AS BIGINT) AS n,
         CAST(a.so AS DOUBLE) / CAST(a.n AS DOUBLE) AS mean_post,
         CAST(a.so AS DOUBLE) / CAST(a.n AS DOUBLE)
           - (t.cov_n / t.varp_n)
             * (CAST(a.sp AS DOUBLE) / CAST(a.n AS DOUBLE) - t.mean_pre_all)
           AS mean_adj
  FROM arms a CROSS JOIN theta t
),
a1 AS (SELECT n, mean_post, mean_adj FROM armstats WHERE treat = 1),
a0 AS (SELECT n, mean_post, mean_adj FROM armstats WHERE treat = 0)
SELECT a1.n AS n_treat, a0.n AS n_control,
       CAST(floor(t.cov_n / t.varp_n * 1000000 + 0.5) AS BIGINT) AS theta_e6,
       CAST(floor((a1.mean_post - a0.mean_post) * 100 + 0.5) AS BIGINT)
         AS raw_lift_cents_e2,
       CAST(floor((a1.mean_adj - a0.mean_adj) * 100 + 0.5) AS BIGINT)
         AS cuped_lift_cents_e2,
       CAST(floor((1.0 - t.cov_n * t.cov_n / (t.varp_n * t.varo_n)) * 10000 + 0.5)
         AS BIGINT) AS var_ratio_e4
FROM a1 CROSS JOIN a0 CROSS JOIN theta t
"""


@register("events_ab_cuped", oracle=_CUPED_ORACLE, tags=("events", "ml", "stats"))
def events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B lift on per-user purchase revenue:
    the pre-period covariate (first 15 days) absorbs between-user
    variance via theta = cov(pre,post)/var(pre), shrinking the
    post-period variance by exactly rho^2 (reported as var_ratio =
    1 - rho^2) — the standard way experiments reach significance
    weeks earlier (`events_ab_test_lift` reports the RAW lift; CUPED
    reports the same estimand with less noise, and on a hash-split
    null experiment the two must agree in expectation). Assignment
    is the deterministic user_id parity; all moments (n, S_pre,
    S_post, cross and squared sums) are exact integers, so theta,
    both adjusted means, and the variance ratio are fixed double
    expressions. Plan: one metric aggregate per user (left join
    keeps zero-activity users — dropping them biases both arms), two
    broadcast-sized moment rollups."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    purch = ev.filter(F.col("event_type") == "purchase")
    split = F.lit(_CUPED_SPLIT_DAY).cast("timestamp")
    metric = (
        users.join(purch, "user_id", "left")
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("ts") < split, F.round(F.col("value") * 100).cast("long"))
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("pre"),
            F.coalesce(
                F.sum(
                    F.when(F.col("ts") >= split, F.round(F.col("value") * 100).cast("long"))
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("post"),
        )
        .select("user_id", (F.col("user_id") % 2).alias("treat"), "pre", "post")
    )
    dec = "decimal(38,0)"
    pooled = metric.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("pre").cast(dec).alias("sp"),
        F.sum("post").cast(dec).alias("so"),
        F.sum(F.col("pre") * F.col("pre")).cast(dec).alias("spp"),
        F.sum(F.col("pre") * F.col("post")).cast(dec).alias("spo"),
        F.sum(F.col("post") * F.col("post")).cast(dec).alias("soo"),
    )
    arms = metric.groupBy("treat").agg(
        F.count(F.lit(1)).cast(dec).alias("na"),
        F.sum("pre").cast(dec).alias("spa"),
        F.sum("post").cast(dec).alias("soa"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    cov_n = d("n") * d("spo") - d("sp") * d("so")
    varp_n = d("n") * d("spp") - d("sp") * d("sp")
    varo_n = d("n") * d("soo") - d("so") * d("so")
    th = cov_n / varp_n
    joined = arms.crossJoin(F.broadcast(pooled))
    armstats = joined.select(
        "treat",
        F.col("na").cast("long").alias("n"),
        (d("soa") / d("na")).alias("mean_post"),
        (d("soa") / d("na") - th * (d("spa") / d("na") - d("sp") / d("n"))).alias("mean_adj"),
    )
    t1 = armstats.filter(F.col("treat") == 1).select(
        F.col("n").alias("n_treat"),
        F.col("mean_post").alias("mp1"),
        F.col("mean_adj").alias("ma1"),
    )
    t0 = armstats.filter(F.col("treat") == 0).select(
        F.col("n").alias("n_control"),
        F.col("mean_post").alias("mp0"),
        F.col("mean_adj").alias("ma0"),
    )
    rho2 = cov_n * cov_n / (varp_n * varo_n)
    consts = pooled.select(
        F.floor(th * 1_000_000 + F.lit(0.5)).cast("long").alias("theta_e6"),
        F.floor((1.0 - rho2) * 10_000 + F.lit(0.5)).cast("long").alias("var_ratio_e4"),
    )
    return (
        t1.crossJoin(t0)
        .crossJoin(F.broadcast(consts))
        .select(
            "n_treat",
            "n_control",
            "theta_e6",
            F.floor((F.col("mp1") - F.col("mp0")) * 100 + F.lit(0.5))
            .cast("long")
            .alias("raw_lift_cents_e2"),
            F.floor((F.col("ma1") - F.col("ma0")) * 100 + F.lit(0.5))
            .cast("long")
            .alias("cuped_lift_cents_e2"),
            "var_ratio_e4",
        )
    )


# --------------------------------------------------------------------------
# Primary-vendor switching between two years
# --------------------------------------------------------------------------

_VS_Y1, _VS_Y2 = 1997, 1998

_VS_ORACLE = f"""
WITH spend AS (
  SELECT o.o_custkey AS cust, year(o.o_orderdate) AS yr, l.l_suppkey AS supp,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE year(o.o_orderdate) IN ({_VS_Y1}, {_VS_Y2})
  GROUP BY 1, 2, 3
),
primary_v AS (
  SELECT cust, yr, supp FROM (
    SELECT cust, yr, supp,
           row_number() OVER (PARTITION BY cust, yr ORDER BY cents DESC, supp) AS rn
    FROM spend
  ) WHERE rn = 1
),
paired AS (
  SELECT a.cust, a.supp AS supp1, b.supp AS supp2
  FROM primary_v a JOIN primary_v b
    ON b.cust = a.cust AND a.yr = {_VS_Y1} AND b.yr = {_VS_Y2}
),
y1_only AS (
  SELECT count(*) AS c FROM primary_v p1
  WHERE p1.yr = {_VS_Y1}
    AND NOT EXISTS (SELECT 1 FROM primary_v p2
                    WHERE p2.yr = {_VS_Y2} AND p2.cust = p1.cust)
),
y2_only AS (
  SELECT count(*) AS c FROM primary_v p2
  WHERE p2.yr = {_VS_Y2}
    AND NOT EXISTS (SELECT 1 FROM primary_v p1
                    WHERE p1.yr = {_VS_Y1} AND p1.cust = p2.cust)
)
SELECT CAST(count(*) AS BIGINT) AS n_both,
       CAST(sum(CASE WHEN supp1 = supp2 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
       CAST(sum(CASE WHEN supp1 <> supp2 THEN 1 ELSE 0 END) AS BIGINT) AS n_switched,
       CAST(sum(CASE WHEN supp1 = supp2 THEN 1 ELSE 0 END) * 10000 // count(*)
         AS BIGINT) AS retained_e4,
       CAST((SELECT c FROM y1_only) AS BIGINT) AS n_churned,
       CAST((SELECT c FROM y2_only) AS BIGINT) AS n_new
FROM paired
"""


@register("customer_vendor_switching", oracle=_VS_ORACLE, tags=("analytics", "supply-chain"))
def customer_vendor_switching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-vendor switching: each customer's top supplier by spend
    in {_VS_Y1} vs {_VS_Y2} — retained / switched / churned / new,
    the B2B loyalty view that prices supplier relationships
    (`customer_churn_flag` asks "did they stop buying"; this asks
    "did they take the spend ELSEWHERE", which procurement cares
    about more). The primary vendor is a rank-1 window with an
    explicit (spend DESC, suppkey) tie-break so both engines crown
    the same vendor on ties; all counts are exact; the retention
    rate is an integer floor-divide. Plan: one fact join + (cust,
    yr, supp) aggregate, one rank window, a cust-keyed self-join at
    customer grain plus two anti-join counts."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    spend = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .filter(F.year("o_orderdate").isin(_VS_Y1, _VS_Y2))
        .groupBy(
            F.col("o_custkey").alias("cust"),
            F.year("o_orderdate").alias("yr"),
            F.col("l_suppkey").alias("supp"),
        )
        .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast("long").alias("cents"))
    )
    w = Window.partitionBy("cust", "yr").orderBy(F.desc("cents"), F.asc("supp"))
    primary = (
        spend.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).select("cust", "yr", "supp")
    )
    p1 = primary.filter(F.col("yr") == _VS_Y1).select("cust", F.col("supp").alias("supp1"))
    p2 = primary.filter(F.col("yr") == _VS_Y2).select(
        F.col("cust").alias("cust2"), F.col("supp").alias("supp2")
    )
    paired = p1.join(p2, F.col("cust2") == F.col("cust"))
    churned = p1.join(p2, F.col("cust2") == F.col("cust"), "left_anti").agg(
        F.count(F.lit(1)).cast("long").alias("n_churned")
    )
    new = p2.join(p1, F.col("cust") == F.col("cust2"), "left_anti").agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    core = paired.agg(
        F.count(F.lit(1)).cast("long").alias("n_both"),
        F.sum(F.when(F.col("supp1") == F.col("supp2"), 1).otherwise(0))
        .cast("long")
        .alias("n_retained"),
        F.sum(F.when(F.col("supp1") != F.col("supp2"), 1).otherwise(0))
        .cast("long")
        .alias("n_switched"),
    )
    return (
        core.crossJoin(F.broadcast(churned))
        .crossJoin(F.broadcast(new))
        .select(
            "n_both",
            "n_retained",
            "n_switched",
            F.floor(F.col("n_retained") * 10_000 / F.col("n_both")).cast("long").alias("retained_e4"),
            "n_churned",
            "n_new",
        )
        .select("n_both", "n_retained", "n_switched", "retained_e4", "n_churned", "n_new")
    )
