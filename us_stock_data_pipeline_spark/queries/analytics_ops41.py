"""Round-32 analytics, part 41: experiment power analysis and price
elasticity — the design-side and economics-side companions to the
testing and index operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Two-proportion power analysis (required sample size)
# --------------------------------------------------------------------------

_Z_ALPHA = 1.959964  # two-sided 5%
_Z_BETA = 0.841621  # power 80%
_MDE_E6 = 20_000  # minimum detectable effect: 2 percentage points

_POWER_ORACLE = f"""
WITH base AS (
  SELECT c.c_mktsegment AS segment,
         CAST(count(*) AS BIGINT) AS n_customers,
         CAST(sum(CASE WHEN o.has_urgent = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_converted
  FROM customer c
  LEFT JOIN (
    SELECT o_custkey, max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
             AS has_urgent
    FROM orders GROUP BY o_custkey
  ) o ON o.o_custkey = c.c_custkey
  GROUP BY 1
),
rates AS (
  SELECT segment, n_customers, n_converted,
         CAST(n_converted AS DOUBLE) / n_customers AS p1,
         CAST(n_converted AS DOUBLE) / n_customers + {_MDE_E6} / 1e6 AS p2
  FROM base
)
SELECT segment, n_customers, n_converted,
       CAST(floor(p1 * 1000000 + 0.5) AS BIGINT) AS baseline_rate_e6,
       CAST(ceil(power({_Z_ALPHA} + {_Z_BETA}, 2)
                 * (p1 * (1.0 - p1) + p2 * (1.0 - p2))
                 / power({_MDE_E6} / 1e6, 2)) AS BIGINT) AS n_required_per_arm,
       CASE WHEN n_customers // 2 >= CAST(ceil(power({_Z_ALPHA} + {_Z_BETA}, 2)
                 * (p1 * (1.0 - p1) + p2 * (1.0 - p2))
                 / power({_MDE_E6} / 1e6, 2)) AS BIGINT)
            THEN 1 ELSE 0 END AS segment_is_powered
FROM rates
ORDER BY segment
"""


@register("stats_power_analysis", oracle=_POWER_ORACLE, tags=("stats", "eval"))
def stats_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion power analysis: for each segment's measured
    baseline conversion rate, the sample size per arm needed to detect
    a {_MDE_E6 // 10_000}-point lift at two-sided alpha=5% and power
    80% — the capacity-planning question every experimentation
    platform answers BEFORE the A/B test that
    `events_ab_test_lift` evaluates after. n = (z_a + z_b)^2 *
    (p1 q1 + p2 q2) / MDE^2 with the z constants as fixed literals,
    the rates exact count ratios, and the output ceil'd to whole
    customers; the `segment_is_powered` flag answers "can THIS
    segment even host the test?". Plan: one customer-grain aggregate,
    5 segment rows, pure expression arithmetic after that."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    conv = orders.groupBy("o_custkey").agg(
        F.max(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        ).alias("has_urgent")
    )
    base = (
        cust.join(conv, cust.c_custkey == conv.o_custkey, "left")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum(F.when(F.col("has_urgent") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_converted"),
        )
    )
    p1 = F.col("n_converted").cast("double") / F.col("n_customers")
    p2 = p1 + _MDE_E6 / 1e6
    n_req = F.ceil(
        F.pow(F.lit(_Z_ALPHA + _Z_BETA), 2)
        * (p1 * (1.0 - p1) + p2 * (1.0 - p2))
        / F.pow(F.lit(_MDE_E6 / 1e6), 2)
    ).cast("long")
    return base.select(
        "segment",
        "n_customers",
        "n_converted",
        F.floor(p1 * 1_000_000 + F.lit(0.5)).cast("long").alias("baseline_rate_e6"),
        n_req.alias("n_required_per_arm"),
        F.when(F.expr("n_customers div 2") >= n_req, 1).otherwise(0).alias(
            "segment_is_powered"
        ),
    ).orderBy("segment")


# --------------------------------------------------------------------------
# Price elasticity of demand (log-log slope per brand)
# --------------------------------------------------------------------------

_ELASTICITY_ORACLE = """
WITH obs AS (
  SELECT p.p_brand AS brand,
         CAST(floor(ln(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       / CAST(round(l.l_quantity) AS BIGINT) + 0.0)
                    * 100000 + 0.5) AS BIGINT) AS ln_p_e5,
         CAST(floor(ln(CAST(round(l.l_quantity) AS BIGINT) + 0.0)
                    * 100000 + 0.5) AS BIGINT) AS ln_q_e5
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
sums AS (
  SELECT brand, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(ln_p_e5) AS BIGINT) AS sx, CAST(sum(ln_q_e5) AS BIGINT) AS sy,
         CAST(sum(ln_p_e5 * ln_p_e5) AS BIGINT) AS sxx,
         CAST(sum(ln_p_e5 * ln_q_e5) AS BIGINT) AS sxy
  FROM obs GROUP BY brand
)
SELECT brand, n AS n_lines,
       CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                  / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                  * 1000000 + 0.5) AS BIGINT) AS elasticity_e6
FROM sums
ORDER BY brand
"""


@register("orders_price_elasticity", oracle=_ELASTICITY_ORACLE, tags=("analytics", "stats"))
def orders_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price elasticity of demand per brand: the log-log regression
    slope d(ln q)/d(ln p) — the pricing team's core number (elasticity
    < -1 means a price cut grows revenue). Unit price is the double
    ratio of two exact integers (cents / quantity — identical in both
    engines); both logs are 1e-5-quantized BIGINTs at birth (1e-6 would
    push the squared-log power sums past int64 at a 600k-line brand
    panel — the slope is scale-invariant, so the coarser grid costs
    nothing), and the slope is one double expression with per-factor
    casts. Integer-quantity demand with integer
    prices is exactly the panel a marketplace has. Plan: one
    broadcast dim join, one power-sum aggregate — the regression adds
    nothing to the scan cost."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    obs = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            F.col("p_brand").alias("brand"),
            F.floor(
                F.log(
                    F.expr(
                        "CAST(round(l_extendedprice * 100) AS BIGINT)"
                        " / CAST(round(l_quantity) AS BIGINT) + 0.0"
                    )
                )
                * 100_000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("ln_p_e5"),
            F.floor(
                F.log(F.expr("CAST(round(l_quantity) AS BIGINT) + 0.0")) * 100_000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("ln_q_e5"),
        )
    )
    sums = obs.groupBy("brand").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("ln_p_e5").cast("long").alias("sx"),
        F.sum("ln_q_e5").cast("long").alias("sy"),
        F.sum(F.col("ln_p_e5") * F.col("ln_p_e5")).cast("long").alias("sxx"),
        F.sum(F.col("ln_p_e5") * F.col("ln_q_e5")).cast("long").alias("sxy"),
    )
    slope = F.floor(
        (F.col("n").cast("double") * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
        / (F.col("n").cast("double") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * 1_000_000
        + F.lit(0.5)
    ).cast("long")
    return sums.select(
        "brand", F.col("n").alias("n_lines"), slope.alias("elasticity_e6")
    ).orderBy("brand")
