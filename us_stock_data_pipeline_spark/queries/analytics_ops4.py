"""Round-5 analytics additions, part 4: cohort LTV triangle and
order-fulfillment lead-time profile — the two classic warehouse
readouts the surface still lacked.

House contract: Spark-first plans, identically-aliased DuckDB oracles,
money carried as exact integer cents (the round() half-boundary lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Cohort LTV triangle
# --------------------------------------------------------------------------

_LTV_ORACLE = """
WITH firsts AS (
  SELECT o_custkey,
         min(CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)) AS cohort_month
  FROM orders GROUP BY 1
),
orders_m AS (
  SELECT o.o_custkey, f.cohort_month,
         (year(o.o_orderdate) - year(f.cohort_month)) * 12
           + (month(o.o_orderdate) - month(f.cohort_month)) AS months_since,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN firsts f USING (o_custkey)
)
SELECT cohort_month,
       CAST(months_since AS BIGINT) AS months_since,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS active_customers,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM orders_m
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("customer_ltv_cohort", oracle=_LTV_ORACLE, tags=("analytics", "cohort"))
def customer_ltv_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle: customers grouped by first-order month,
    revenue and active count tracked by months-since-acquisition — the
    retention economics readout every subscription/commerce warehouse
    maintains (`events_retention` is its event-side sibling; this is
    the revenue side). Plan: one groupBy for the acquisition month,
    joined back on the customer key (both sides shuffle once on
    o_custkey and AQE usually downgrades the per-customer firsts table
    to a broadcast), then a (cohort, offset) rollup whose cell count
    is months^2/2, not data-sized. Revenue is integer cents end-to-end
    — the triangle is an accounting artifact, it must sum exactly."""
    o = load_table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate")).alias("cohort_month")
    )
    months_since = (
        (F.year("o_orderdate") - F.year("cohort_month")) * 12
        + (F.month("o_orderdate") - F.month("cohort_month"))
    ).cast("long")
    orders_m = o.join(firsts, "o_custkey").select(
        "o_custkey",
        "cohort_month",
        months_since.alias("months_since"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return (
        orders_m.groupBy("cohort_month", "months_since")
        .agg(
            F.countDistinct("o_custkey").alias("active_customers"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .orderBy("cohort_month", "months_since")
    )


# --------------------------------------------------------------------------
# Fulfillment lead-time profile
# --------------------------------------------------------------------------

_LEADTIME_ORACLE = """
WITH lt AS (
  SELECT o.o_orderpriority,
         epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate) AS lead_us
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate >= o.o_orderdate
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(avg(lead_us) / 86400000000.0, 4) AS avg_days,
       round(quantile_cont(lead_us, 0.5) / 86400000000.0, 4) AS p50_days,
       round(quantile_cont(lead_us, 0.9) / 86400000000.0, 4) AS p90_days,
       round(max(lead_us) / 86400000000.0, 4) AS max_days
FROM lt
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("orders_fulfillment_leadtime", oracle=_LEADTIME_ORACLE, tags=("analytics", "ops"))
def orders_fulfillment_leadtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lead-time profile per priority class — the
    operational SLA readout (is URGENT actually shipping faster?).
    Lead times come from the lineitem x orders fact-fact equi-join
    (shuffle on the order key, AQE sizes it) carried as EXACT integer
    microseconds; only the final per-priority summaries are floats.
    The percentile state is the per-group value buffer — at fixture
    scale the built-in is fine, and the rank-based spillable
    formulation (agg_percentiles) is the drop-in when group volumes
    outgrow task memory."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lt = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            "o_orderpriority",
            (F.unix_micros("l_shipdate") - F.unix_micros("o_orderdate")).alias(
                "lead_us"
            ),
        )
    )
    day = 86_400_000_000.0
    return (
        lt.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.avg("lead_us") / day, 4).alias("avg_days"),
            F.round(F.expr("percentile(lead_us, 0.5)") / day, 4).alias("p50_days"),
            F.round(F.expr("percentile(lead_us, 0.9)") / day, 4).alias("p90_days"),
            F.round(F.max("lead_us") / day, 4).alias("max_days"),
        )
        .orderBy("o_orderpriority")
    )
