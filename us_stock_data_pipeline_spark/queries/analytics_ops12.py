"""Round-7 analytics additions, part 12: rank correlation, binomial
confidence intervals, Benford first-digit audit, and market
concentration (HHI).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Spearman rank correlation (exact d^2 formula, tie-free ranks)
# --------------------------------------------------------------------------

_SPEARMAN_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY event_type ORDER BY cents, d) AS r_cents,
         row_number() OVER (PARTITION BY event_type ORDER BY n_events, d) AS r_n
  FROM daily
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum((r_cents - r_n) * (r_cents - r_n)) AS BIGINT) AS sum_d2,
       floor((1.0 - 6.0 * sum((r_cents - r_n) * (r_cents - r_n))
                    / (count(*) * (CAST(count(*) AS BIGINT) * count(*) - 1)))
             * 10000 + 0.5) / 10000 AS spearman_rho
FROM ranked
GROUP BY event_type
ORDER BY event_type
"""


@register("stats_spearman_corr", oracle=_SPEARMAN_ORACLE, tags=("stats", "analytics"))
def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between a type's daily revenue and its
    daily event count — the robust, outlier-proof complement to the
    Pearson battery in `agg_stats_moments`. Ranks are ROW_NUMBERs with
    a deterministic day tiebreak, so both engines assign identical
    tie-free ranks and rho collapses to the exact-integer classic
    formula rho = 1 - 6*sum(d^2)/(n(n^2-1)) — no streaming-moment
    float accumulation at all, hence bit-stable across engines and
    partitionings. Plan: one groupBy to the per-(type, day) grain
    (days-bounded, tiny), two in-partition window rank passes sharing
    one shuffle on event_type, one exact-integer groupBy. At 100 TB
    the fact scan dominates; everything after the first agg is
    per-type-days-sized."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    ranked = daily.select(
        "event_type",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("cents", "d"))
        .alias("r_cents"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("n_events", "d"))
        .alias("r_n"),
    )
    d2 = (F.col("r_cents") - F.col("r_n")) * (F.col("r_cents") - F.col("r_n"))
    n = F.count(F.lit(1)).cast("long")
    return (
        ranked.groupBy("event_type")
        .agg(
            n.alias("n_days"),
            F.sum(d2).cast("long").alias("sum_d2"),
            (
                F.floor(
                    (
                        F.lit(1.0)
                        - F.lit(6.0) * F.sum(d2) / (n * (n * n - F.lit(1)))
                    )
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("spearman_rho"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Wilson score confidence interval for binomial proportions
# --------------------------------------------------------------------------

_WILSON_Z = 1.96  # 95% two-sided

_WILSON_ORACLE = f"""
WITH agg AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS x
  FROM events GROUP BY event_type
)
SELECT event_type, n, x,
       floor(CAST(x AS DOUBLE) / n * 10000 + 0.5) / 10000 AS p_hat,
       floor(((CAST(x AS DOUBLE) / n + {_WILSON_Z} * {_WILSON_Z} / (2.0 * n)
               - {_WILSON_Z} * sqrt((CAST(x AS DOUBLE) / n) * (1.0 - CAST(x AS DOUBLE) / n) / n
                                    + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n)))
              / (1.0 + {_WILSON_Z} * {_WILSON_Z} / n)) * 10000 + 0.5) / 10000 AS ci_low,
       floor(((CAST(x AS DOUBLE) / n + {_WILSON_Z} * {_WILSON_Z} / (2.0 * n)
               + {_WILSON_Z} * sqrt((CAST(x AS DOUBLE) / n) * (1.0 - CAST(x AS DOUBLE) / n) / n
                                    + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n)))
              / (1.0 + {_WILSON_Z} * {_WILSON_Z} / n)) * 10000 + 0.5) / 10000 AS ci_high
FROM agg
ORDER BY event_type
"""


@register("stats_wilson_ci", oracle=_WILSON_ORACLE, tags=("stats", "analytics"))
def stats_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95% confidence interval for the per-type share of
    high-value events — the interval every experimentation platform
    quotes instead of the normal approximation because it behaves at
    small n and extreme p (`events_ab_test_lift` gives the lift point
    estimate; this bounds it). Counts are exact from one groupBy; the
    closed-form interval is evaluated as the same literal double
    expression on both engines, so IEEE gives bit-identical results.
    Map-side combine does all the work — the reduced table is
    |event_types| rows regardless of corpus size."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("value") > 100, 1).otherwise(0)).cast("long").alias("x"),
    )
    z = F.lit(_WILSON_Z)
    n = F.col("n").cast("double")
    p = F.col("x").cast("double") / n
    center = p + z * z / (2.0 * n)
    half = z * F.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
    denom = F.lit(1.0) + z * z / n

    def r4(c):
        return F.floor(c * 10000 + F.lit(0.5)) / 10000

    return agg.select(
        "event_type",
        "n",
        "x",
        r4(p).alias("p_hat"),
        r4((center - half) / denom).alias("ci_low"),
        r4((center + half) / denom).alias("ci_high"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Benford first-digit audit
# --------------------------------------------------------------------------

# the nine log10(1+1/d) expectations are PYTHON double literals (repr
# round-trips exactly, both engines parse the same bits) and the square
# is explicit multiplication — no libm in any hashed column
# (transcendental audit r9).
_BENFORD_SHARES = [(d, math.log10(1.0 + 1.0 / d)) for d in range(1, 10)]
_BENFORD_VALUES = ", ".join(
    f"({d}, CAST({bs!r} AS DOUBLE))" for d, bs in _BENFORD_SHARES
)

_BENFORD_ORACLE = f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
              AS INTEGER) AS digit
  FROM orders
  WHERE o_totalprice > 0
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM digits),
obs AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n_obs, max(tot.n) AS n
  FROM digits, tot GROUP BY digit
),
bl AS (SELECT * FROM (VALUES {_BENFORD_VALUES}) AS t(digit, bs))
SELECT o.digit, o.n_obs,
       floor(CAST(o.n_obs AS DOUBLE) / o.n * 10000 + 0.5) / 10000
         AS observed_share,
       floor(b.bs * 10000 + 0.5) / 10000 AS benford_share,
       floor((o.n_obs - o.n * b.bs) * (o.n_obs - o.n * b.bs)
             / (o.n * b.bs) * 10000 + 0.5) / 10000
         AS chi2_term
FROM obs o JOIN bl b ON b.digit = o.digit
ORDER BY o.digit
"""


@register("agg_benford_digits", oracle=_BENFORD_ORACLE, tags=("stats", "audit"))
def agg_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the standard
    forensic screen for fabricated or truncated monetary data. The
    leading digit is taken from the DECIMAL STRING of exact integer
    cents (substr of a bigint cast), never from log10 of a float, so
    boundary amounts like 999.99 vs 1000.00 can't land in different
    digits across engines. Output is the 9-row digit histogram with
    observed vs log10(1+1/d) expected shares and per-digit chi-square
    terms. Map-side: one projected scan, a 9-group agg, one broadcast
    total."""
    od = load_table(spark, sf_dir, "orders")
    digits = od.filter(F.col("o_totalprice") > 0).select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    tot = digits.agg(F.count(F.lit(1)).cast("long").alias("n"))
    obs = (
        digits.crossJoin(F.broadcast(tot))
        .groupBy("digit")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            F.max("n").alias("n"),
        )
    )
    bl = spark.createDataFrame(_BENFORD_SHARES, "digit int, bs double")
    return (
        obs.join(F.broadcast(bl), "digit")
        .selectExpr(
            "digit",
            "n_obs",
            "floor(CAST(n_obs AS DOUBLE) / n * 10000 + 0.5) / 10000 AS observed_share",
            "floor(bs * 10000 + 0.5) / 10000 AS benford_share",
            "floor((n_obs - n * bs) * (n_obs - n * bs) / (n * bs) * 10000 + 0.5)"
            " / 10000 AS chi2_term",
        )
        .orderBy("digit")
    )


# --------------------------------------------------------------------------
# Herfindahl-Hirschman market concentration index
# --------------------------------------------------------------------------

_HHI_ORACLE = """
WITH rev AS (
  SELECT n.n_name AS nation, l.l_suppkey,
         CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  GROUP BY 1, 2
),
tot AS (SELECT nation, CAST(sum(cents) AS BIGINT) AS t FROM rev GROUP BY nation)
-- sum of squared shares as EXACT integer sum-of-squares over t^2: no
-- power() libm call, no double-sum order dependence (transcendental
-- audit r9); the single terminal division is deterministic IEEE.
SELECT rev.nation,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       max(tot.t) AS total_cents,
       floor(CAST(sum(CAST(rev.cents AS HUGEINT) * rev.cents) AS DOUBLE)
             / (CAST(max(tot.t) AS DOUBLE) * CAST(max(tot.t) AS DOUBLE))
             * 10000 * 10000 + 0.5)
         / 10000 AS hhi
FROM rev
JOIN tot ON tot.nation = rev.nation
GROUP BY rev.nation
ORDER BY rev.nation
"""


@register("agg_herfindahl_index", oracle=_HHI_ORACLE, tags=("analytics", "concentration"))
def agg_herfindahl_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman index of supplier revenue concentration per
    nation, on the regulator's 0-10000 scale — the concentration
    summary `events_pareto_gini` (Gini) and `orders_abc_classification`
    (segments) don't give: the squared-share sum antitrust analysis
    quotes. Revenue is exact integer cents per (nation, supplier);
    shares and their squares are terminal double arithmetic on the
    per-nation supplier table (supplier-cardinality, tiny). Plan: fact
    groupBy on (suppkey) grain with two broadcast dim hops, then a
    nation-level rollup — one fact shuffle total."""
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "l_suppkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("long")
            )
            .cast("long")
            .alias("cents")
        )
    )
    tot = rev.groupBy("nation").agg(F.sum("cents").cast("long").alias("t"))
    sq = F.col("cents").cast("decimal(19,0)") * F.col("cents").cast("decimal(19,0)")
    return (
        rev.join(F.broadcast(tot), "nation")
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.max("t").alias("total_cents"),
            (
                F.floor(
                    F.sum(sq).cast("double")
                    / (F.max("t").cast("double") * F.max("t").cast("double"))
                    * 10000
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("hhi"),
        )
        .orderBy("nation")
    )
