"""Round-6 analytics additions, part 10: the classic warehouse
readouts — year-over-year growth, churn flagging, and the revenue
waterfall — small operators with outsized real-world frequency.

House contract: exact integer cents everywhere; ratios are terminal
single divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register


def _round4(col):
    return F.floor(col * 10000 + F.lit(0.5)) / 10000


# --------------------------------------------------------------------------
# Year-over-year monthly growth
# --------------------------------------------------------------------------

_YOY_ORACLE = """
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
laged AS (
  SELECT month, cents,
         lag(cents, 12) OVER (ORDER BY month) AS cents_prev_year
  FROM monthly
)
SELECT month, cents, cents_prev_year,
       floor((CAST(cents AS DOUBLE) / cents_prev_year - 1) * 10000 + 0.5) / 10000
         AS yoy_growth
FROM laged
WHERE cents_prev_year IS NOT NULL
ORDER BY month
"""


@register("orders_yoy_growth", oracle=_YOY_ORACLE, tags=("analytics", "window"))
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue growth — the first chart in
    every revenue dashboard, and a deliberate demonstration that
    SEASONAL comparison is a lag-12 window over the month-grain
    rollup, not a self-join (the join formulation shuffles the fact
    table twice; this shuffles it once to month grain — dozens of
    rows — then windows for free). Exact integer cents; the growth
    ratio is the only division. A calendar gap (a month with zero
    orders) would misalign ROW-based lag-12; at this fixture months
    are dense, and the production guard is the `timeseries_gap_fill`
    scaffold feeding the same window."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    laged = monthly.select(
        "month",
        "cents",
        F.lag("cents", 12).over(Window.orderBy("month")).alias("cents_prev_year"),
    )
    return (
        laged.filter(F.col("cents_prev_year").isNotNull())
        .select(
            "month",
            "cents",
            "cents_prev_year",
            _round4(F.col("cents").cast("double") / F.col("cents_prev_year") - 1).alias(
                "yoy_growth"
            ),
        )
        .orderBy("month")
    )


# --------------------------------------------------------------------------
# Churn flagging (recency cutoff against the observation horizon)
# --------------------------------------------------------------------------

_CHURN_DAYS = 365

_CHURN_ORACLE = f"""
WITH horizon AS (
  SELECT max(o_orderdate) AS h FROM orders
),
cust AS (
  SELECT o.o_custkey,
         max(o.o_orderdate) AS last_order,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders o GROUP BY o.o_custkey
),
flagged AS (
  SELECT c.c_mktsegment,
         CASE WHEN date_diff('day', cu.last_order, horizon.h) > {_CHURN_DAYS}
              THEN 1 ELSE 0 END AS churned
  FROM cust cu
  JOIN customer c ON cu.o_custkey = c.c_custkey
  CROSS JOIN horizon
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(churned) AS BIGINT) AS n_churned,
       floor(CAST(sum(churned) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000
         AS churn_rate
FROM flagged
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("customer_churn_flag", oracle=_CHURN_ORACLE, tags=("analytics", "retention"))
def customer_churn_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-based churn flagging: a customer whose last order is
    more than a year before the observation horizon (the dataset's max
    date — never wall-clock, so the query is reproducible) counts as
    churned, rolled up per market segment — the classic RFM 'R' turned
    into the retention KPI (`customer_rfm_segments` bins it;
    `survival_kaplan_meier` models it properly). One fact groupBy to
    per-customer recency, a broadcast dim join, a 1-row horizon
    broadcast — two shuffles, both on keys the plan already needs."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    horizon = o.agg(F.max("o_orderdate").alias("h"))
    cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )
    flagged = (
        cust.join(F.broadcast(c.select("c_custkey", "c_mktsegment")),
                  cust.o_custkey == F.col("c_custkey"))
        .crossJoin(F.broadcast(horizon))
        .select(
            "c_mktsegment",
            F.when(
                F.datediff(F.col("h"), F.col("last_order")) > _CHURN_DAYS, 1
            )
            .otherwise(0)
            .alias("churned"),
        )
    )
    return (
        flagged.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("churned").cast("long").alias("n_churned"),
            _round4(F.sum("churned").cast("double") / F.count(F.lit(1))).alias(
                "churn_rate"
            ),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Revenue waterfall (gross -> discount -> net -> tax -> charged)
# --------------------------------------------------------------------------

_WATERFALL_ORACLE = """
SELECT CAST(year(l_shipdate) AS BIGINT) AS year,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS gross_cents,
       CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT)
         AS discount_cents,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
            - sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT)
         AS net_cents,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * l_tax * 100) AS BIGINT)) AS BIGINT)
         AS tax_cents,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
            - sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT))
            + sum(CAST(round(l_extendedprice * (1 - l_discount) * l_tax * 100) AS BIGINT)) AS BIGINT)
         AS charged_cents
FROM lineitem
GROUP BY year(l_shipdate)
ORDER BY year
"""


@register("lineitem_revenue_waterfall", oracle=_WATERFALL_ORACLE, tags=("analytics", "finance"))
def lineitem_revenue_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue waterfall per ship year: gross -> minus discounts ->
    net -> plus tax -> charged, each bridge step an EXACT integer-cent
    sum (each per-line money amount rounds to cents ONCE, then only
    integer adds — the net/charged columns are derived by arithmetic
    on the already-summed components, so the waterfall reconciles to
    the cent by construction, the property auditors actually check).
    One single-pass groupBy over the fact table, map-side combinable,
    five aggregates sharing one shuffle — the Q1 shape extended to a
    finance bridge."""
    li = load_table(spark, sf_dir, "lineitem")
    gross = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_extendedprice") * F.col("l_discount") * 100).cast("long")
    tax = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.col("l_tax") * 100
    ).cast("long")
    return (
        li.groupBy(F.year("l_shipdate").cast("long").alias("year"))
        .agg(
            F.sum(gross).cast("long").alias("gross_cents"),
            F.sum(disc).cast("long").alias("discount_cents"),
            (F.sum(gross) - F.sum(disc)).cast("long").alias("net_cents"),
            F.sum(tax).cast("long").alias("tax_cents"),
            (F.sum(gross) - F.sum(disc) + F.sum(tax)).cast("long").alias("charged_cents"),
        )
        .orderBy("year")
    )
