"""Mergeable-sketch aggregations beyond HLL: Theta set-operation
sketches (audience overlap without exact distinct) and KLL quantile
sketches (streaming percentiles).

Sketches are THE 100 TB aggregation story: fixed-size partial states
that merge associatively across partitions/days/tables, so expensive
distinct/quantile questions roll up without re-scanning raw data. Like
agg_hll_sketch, the oracle verifies the estimate CONTRACT (estimates
within tolerance of exact values DuckDB recomputes), not the
engine-specific sketch bytes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Theta sketches: set operations on distinct sets
# --------------------------------------------------------------------------

_THETA_ORACLE = """
WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view')
SELECT 'purchase' AS cohort, CAST((SELECT count(*) FROM p) AS BIGINT) AS exact_users,
       TRUE AS within_tol
UNION ALL
SELECT 'view', CAST((SELECT count(*) FROM v) AS BIGINT), TRUE
UNION ALL
SELECT 'both', CAST((SELECT count(*) FROM p JOIN v USING (user_id)) AS BIGINT), TRUE
UNION ALL
SELECT 'either', CAST((SELECT count(*) FROM (SELECT * FROM p UNION SELECT * FROM v)) AS BIGINT), TRUE
ORDER BY cohort
"""


@register("agg_theta_sketch", oracle=_THETA_ORACLE, tags=("agg", "sketch"))
def agg_theta_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap via Theta sketches: distinct purchasers, distinct
    viewers, their INTERSECTION and UNION — all from two fixed-size
    sketches, no exact distinct shuffle and no join between the cohorts.
    This is the set-operation capability HLL lacks (HLL unions but can't
    intersect); at 100 TB it answers "users who did A and B" from
    per-segment sketches computed independently. The oracle recomputes
    all four cardinalities exactly and the booleans assert each estimate
    lands within 10% (at fixture cardinalities the sketches are in exact
    mode, so the tolerance never flakes)."""
    ev = load_table(spark, sf_dir, "events")
    pu = ev.filter(F.col("event_type") == "purchase").agg(
        F.theta_sketch_agg("user_id").alias("sk_p"),
        F.count_distinct("user_id").alias("exact_p"),
    )
    vi = ev.filter(F.col("event_type") == "view").agg(
        F.theta_sketch_agg("user_id").alias("sk_v"),
        F.count_distinct("user_id").alias("exact_v"),
    )
    both_exact = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .intersect(ev.filter(F.col("event_type") == "view").select("user_id"))
        .agg(F.count(F.lit(1)).alias("exact_both"))
    )
    either_exact = (
        ev.filter(F.col("event_type").isin("purchase", "view"))
        .agg(F.count_distinct("user_id").alias("exact_either"))
    )
    combined = pu.crossJoin(vi).crossJoin(both_exact).crossJoin(either_exact).select(
        F.theta_sketch_estimate("sk_p").alias("est_p"),
        F.theta_sketch_estimate("sk_v").alias("est_v"),
        F.theta_sketch_estimate(F.theta_intersection("sk_p", "sk_v")).alias("est_both"),
        F.theta_sketch_estimate(F.theta_union("sk_p", "sk_v")).alias("est_either"),
        "exact_p",
        "exact_v",
        "exact_both",
        "exact_either",
    )
    # One explode, not a 4-way union of selects over the same aggregate —
    # a union would recompute the whole sketch build once per branch.
    cohorts = F.array(
        *[
            F.struct(
                F.lit(cohort).alias("cohort"),
                F.col(exact).alias("exact_users"),
                (F.abs(F.col(est) - F.col(exact)) <= 0.10 * F.col(exact)).alias(
                    "within_tol"
                ),
            )
            for cohort, est, exact in (
                ("purchase", "est_p", "exact_p"),
                ("view", "est_v", "exact_v"),
                ("both", "est_both", "exact_both"),
                ("either", "est_either", "exact_either"),
            )
        ]
    )
    return (
        combined.select(F.explode(cohorts).alias("c"))
        .select("c.cohort", "c.exact_users", "c.within_tol")
        .orderBy("cohort")
    )


# --------------------------------------------------------------------------
# KLL quantile sketches
# --------------------------------------------------------------------------

_KLL_ORACLE = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50_exact,
       round(quantile_cont(value, 0.9), 4) AS p90_exact,
       TRUE AS kll_within_tol
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("agg_kll_quantiles", oracle=_KLL_ORACLE, tags=("agg", "sketch", "quantile"))
def agg_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming quantiles via KLL sketches: per-group p50/p90 estimated
    from a fixed-size mergeable sketch, checked against exact
    percentiles computed in the same pass. Exact percentiles need the
    full sorted group; the KLL state is KBs regardless of group size and
    merges across partitions — the 100 TB percentile path (and the
    engine behind approx_percentile-style telemetry rollups). The
    boolean asserts each KLL estimate falls within the exact p45-p55 /
    p85-p95 band, i.e. rank error under 5% — the sketch's contract
    (default k has ~1.7% rank error) with margin, so it never flakes."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.kll_sketch_agg_double("value").alias("sk"),
        F.percentile("value", F.lit(0.5)).alias("p50"),
        F.percentile("value", F.lit(0.9)).alias("p90"),
        F.percentile("value", F.lit(0.45)).alias("p45"),
        F.percentile("value", F.lit(0.55)).alias("p55"),
        F.percentile("value", F.lit(0.85)).alias("p85"),
        F.percentile("value", F.lit(0.95)).alias("p95"),
    )
    kll50 = F.kll_sketch_get_quantile_double("sk", F.lit(0.5))
    kll90 = F.kll_sketch_get_quantile_double("sk", F.lit(0.9))
    return agg.select(
        "event_type",
        F.round("p50", 4).alias("p50_exact"),
        F.round("p90", 4).alias("p90_exact"),
        (
            kll50.between(F.col("p45"), F.col("p55"))
            & kll90.between(F.col("p85"), F.col("p95"))
        ).alias("kll_within_tol"),
    ).orderBy("event_type")
