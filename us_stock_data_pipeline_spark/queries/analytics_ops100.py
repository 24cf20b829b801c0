"""Round-110 analytics, part 100: golden-record precedence merge and
odds/risk ratios with log-scale confidence intervals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Golden record: per-user survivorship by source priority then recency
# --------------------------------------------------------------------------

# source priority: purchases are authoritative, then signups, then the rest
_GOLDEN_PRIORITY = "CASE event_type WHEN 'purchase' THEN 1 WHEN 'signup' THEN 2 ELSE 3 END"

_GOLDEN_ORACLE = f"""
WITH ranked AS (
  SELECT user_id, event_type, value, ts, event_id,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY {_GOLDEN_PRIORITY}, ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id,
       event_type AS golden_source,
       CAST(round(value * 100) AS BIGINT) AS golden_value_cents,
       CAST(event_id AS BIGINT) AS golden_event_id
FROM ranked WHERE rn = 1
ORDER BY user_id
"""


@register("etl_golden_record_merge", oracle=_GOLDEN_ORACLE, tags=("etl", "mdm", "dedup"))
def etl_golden_record_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record survivorship merge: one row per entity chosen by
    SOURCE PRIORITY first (purchase events are authoritative, then
    signups, then everything else) and RECENCY second — the
    master-data-management rule that differs fundamentally from the
    CDC latest-row snapshot (`dedup_latest_snapshot` trusts the clock;
    MDM trusts the source hierarchy, so a stale authoritative record
    beats a fresh low-trust one, which is exactly the behavior this
    pins). Tie-break chain (priority, ts DESC, event_id DESC) is
    total, so the survivor is unique and deterministic. Plan: one
    entity-keyed ranking window — single shuffle, and at 100 TB this
    is the same one-pass survivorship shape as `dedup_survivor_pick`
    with the policy lifted into the sort key."""
    ev = load_table(spark, sf_dir, "events")
    pri = (
        F.when(F.col("event_type") == "purchase", 1)
        .when(F.col("event_type") == "signup", 2)
        .otherwise(3)
    )
    w = Window.partitionBy("user_id").orderBy(
        pri, F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.select(
            "user_id",
            "event_type",
            "value",
            "event_id",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("golden_source"),
            F.round(F.col("value") * 100).cast("long").alias("golden_value_cents"),
            F.col("event_id").cast("long").alias("golden_event_id"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Odds ratio & risk ratio with 95% log-scale CIs (2x2 epidemiology)
# --------------------------------------------------------------------------

_OR_ORACLE = """
WITH flags AS (
  -- exposure: urgent/high priority; outcome: any line returned
  SELECT CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END
           AS exposed,
         max(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS outcome
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderpriority
),
cells AS (
  SELECT CAST(sum(exposed * outcome) AS BIGINT) AS a,
         CAST(sum(exposed * (1 - outcome)) AS BIGINT) AS b,
         CAST(sum((1 - exposed) * outcome) AS BIGINT) AS c,
         CAST(sum((1 - exposed) * (1 - outcome)) AS BIGINT) AS d
  FROM flags
)
SELECT a, b, c, d,
       -- OR = ad/bc, RR = (a/(a+b)) / (c/(c+d)); CIs on the log scale
       CAST(floor(CAST(a AS DOUBLE) * d / b / c * 1000000 + 0.5) AS BIGINT)
         AS odds_ratio_micro,
       CAST(floor(exp(ln(CAST(a AS DOUBLE) * d / b / c)
                      - 1.96 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)) * 1000000
                  + 0.5) AS BIGINT) AS or_ci_lo_micro,
       CAST(floor(exp(ln(CAST(a AS DOUBLE) * d / b / c)
                      + 1.96 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)) * 1000000
                  + 0.5) AS BIGINT) AS or_ci_hi_micro,
       CAST(floor(CAST(a AS DOUBLE) * (c + d) / c / (a + b) * 1000000 + 0.5)
         AS BIGINT) AS risk_ratio_micro,
       CAST(floor(exp(ln(CAST(a AS DOUBLE) * (c + d) / c / (a + b))
                      - 1.96 * sqrt(1.0/a - 1.0/(a + b) + 1.0/c - 1.0/(c + d)))
                  * 1000000 + 0.5) AS BIGINT) AS rr_ci_lo_micro
FROM cells
"""


@register("stats_odds_risk_ratio", oracle=_OR_ORACLE, tags=("stats",))
def stats_odds_risk_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Odds ratio and risk ratio for return-outcome vs urgent-priority
    exposure, with 95% log-scale confidence intervals — the 2x2
    association measures every cohort analysis quotes: RR is the
    interpretable one ('urgent orders are 1.03x as likely to have a
    return'), OR the one logistic models and case-control designs
    estimate, and they diverge exactly when the outcome is common
    (`stats_cmh_odds_ratio` pools ORs across strata; this is the
    single-table primitive with its Woolf/Katz standard errors).
    Exactness: the four cells are exact integer sums off one
    order-level rollup; the ratios and their log-scale CIs assemble
    once in pinned DOUBLE, micro-quantized. Plan: one fact-fact
    groupBy to per-order flags, one 1-row reduce."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    flags = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("outcome"))
        .select(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int").alias("exposed"),
            "outcome",
        )
    )
    cells = flags.agg(
        F.sum(F.col("exposed") * F.col("outcome")).cast("long").alias("a"),
        F.sum(F.col("exposed") * (1 - F.col("outcome"))).cast("long").alias("b"),
        F.sum((1 - F.col("exposed")) * F.col("outcome")).cast("long").alias("c"),
        F.sum((1 - F.col("exposed")) * (1 - F.col("outcome"))).cast("long").alias("d"),
    )
    a, b, c, d = (F.col(x).cast("double") for x in ("a", "b", "c", "d"))
    or_ = a * d / b / c
    se_or = F.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
    rr = a * (c + d) / c / (a + b)
    se_rr = F.sqrt(1.0 / a - 1.0 / (a + b) + 1.0 / c - 1.0 / (c + d))
    q = lambda col: F.floor(col * 1000000 + F.lit(0.5)).cast("long")  # noqa: E731
    return cells.select(
        "a",
        "b",
        "c",
        "d",
        q(or_).alias("odds_ratio_micro"),
        q(F.exp(F.log(or_) - 1.96 * se_or)).alias("or_ci_lo_micro"),
        q(F.exp(F.log(or_) + 1.96 * se_or)).alias("or_ci_hi_micro"),
        q(rr).alias("risk_ratio_micro"),
        q(F.exp(F.log(rr) - 1.96 * se_rr)).alias("rr_ci_lo_micro"),
    )
