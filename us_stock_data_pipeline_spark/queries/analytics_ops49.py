"""Round-51 analytics, part 49: part price-dispersion audit and the
orders-per-customer frequency histogram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Unit-price dispersion per part (pricing-leakage audit)
# --------------------------------------------------------------------------

_DISP_TOPN = 50

_DISP_ORACLE = f"""
WITH prices AS (
  SELECT l_partkey AS partkey,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           // CAST(round(l_quantity) AS BIGINT) AS unit_cents
  FROM lineitem
),
sums AS (
  SELECT partkey, CAST(count(*) AS BIGINT) AS n,
         CAST(min(unit_cents) AS BIGINT) AS min_cents,
         CAST(max(unit_cents) AS BIGINT) AS max_cents,
         CAST(sum(unit_cents) AS BIGINT) AS s1,
         CAST(sum(unit_cents * unit_cents) AS BIGINT) AS s2
  FROM prices GROUP BY partkey
)
SELECT partkey, n AS n_sales, min_cents, max_cents,
       CAST(max_cents - min_cents AS BIGINT) AS spread_cents,
       CAST(floor(sqrt((CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
                       / (CAST(n AS DOUBLE) * n)) + 0.5) AS BIGINT) AS stddev_cents
FROM sums
WHERE n >= 5
ORDER BY spread_cents DESC, partkey
LIMIT {_DISP_TOPN}
"""


@register("part_price_dispersion", oracle=_DISP_ORACLE, tags=("analytics", "agg"))
def part_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-price dispersion per part — the pricing-leakage audit: the
    SAME part selling at widely different unit prices means discount
    policy is leaking (or segmentation is working; either way someone
    wants the top-{_DISP_TOPN} list on their desk). Unit price is the
    exact integer cents-div-quantity; spread is pure integer; the
    population stddev is assembled from BIGINT power sums with
    per-factor casts and quantized to whole cents. The n >= 5 support
    floor keeps one-off sales out of the ranking. Plan: one fact
    aggregate to part grain, one global top-N — the plan every
    'top offenders' report shares."""
    prices = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("partkey"),
        F.expr(
            "CAST(round(l_extendedprice * 100) AS BIGINT)"
            " div CAST(round(l_quantity) AS BIGINT)"
        ).alias("unit_cents"),
    )
    sums = prices.groupBy("partkey").agg(
        F.count("*").cast("long").alias("n"),
        F.min("unit_cents").cast("long").alias("min_cents"),
        F.max("unit_cents").cast("long").alias("max_cents"),
        F.sum("unit_cents").cast("long").alias("s1"),
        F.sum(F.col("unit_cents") * F.col("unit_cents")).cast("long").alias("s2"),
    )
    std = F.floor(
        F.sqrt(
            (F.col("n").cast("double") * F.col("s2") - F.col("s1").cast("double") * F.col("s1"))
            / (F.col("n").cast("double") * F.col("n"))
        )
        + F.lit(0.5)
    ).cast("long")
    return (
        sums.filter(F.col("n") >= 5)
        .select(
            "partkey",
            F.col("n").alias("n_sales"),
            "min_cents",
            "max_cents",
            (F.col("max_cents") - F.col("min_cents")).cast("long").alias("spread_cents"),
            std.alias("stddev_cents"),
        )
        .orderBy(F.col("spread_cents").desc(), "partkey")
        .limit(_DISP_TOPN)
    )


# --------------------------------------------------------------------------
# Orders-per-customer frequency histogram
# --------------------------------------------------------------------------

_FREQ_ORACLE = """
WITH per_cust AS (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
)
SELECT n_orders,
       CAST(count(*) AS BIGINT) AS n_customers
FROM per_cust
GROUP BY n_orders
ORDER BY n_orders
"""


@register("orders_per_customer_histogram", oracle=_FREQ_ORACLE, tags=("analytics", "agg"))
def orders_per_customer_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The orders-per-customer frequency histogram — the count-of-
    counts distribution under every CRM model (the zero bucket from
    the LEFT join is the never-purchased base that an inner join
    silently erases — the classic denominator bug in 'average orders
    per customer'); NBD/Pareto lifetime models are fitted to exactly
    this histogram. Two hash aggregates: customer grain, then
    count-of-counts — the second input is customer-sized, the
    histogram output order-count-sized. Everything exact."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").cast("long").alias("n_customers"))
        .orderBy("n_orders")
    )
