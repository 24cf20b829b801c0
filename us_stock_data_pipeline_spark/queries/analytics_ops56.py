"""Round-57 analytics, part 56: XYZ demand-variability classification
and supplier delivery-reliability scorecard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# XYZ classification: demand-variability tiers by weekly CV
# --------------------------------------------------------------------------

_XYZ_MIN_WEEKS = 3
_XYZ_X_E4, _XYZ_Y_E4 = 5_000, 10_000  # cv < 0.5 -> X, < 1.0 -> Y, else Z

_XYZ_ORACLE = f"""
WITH weekly AS (
  SELECT l_partkey AS part,
         datediff('day', DATE '1992-01-01', l_shipdate) // 7 AS wk,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY 1, 2
),
per_part AS (
  SELECT part, CAST(count(*) AS BIGINT) AS nw,
         CAST(sum(qty) AS HUGEINT) AS s, CAST(sum(qty * qty) AS HUGEINT) AS ss
  FROM weekly GROUP BY part HAVING count(*) >= {_XYZ_MIN_WEEKS}
),
cv AS (
  SELECT part, nw, CAST(s AS BIGINT) AS total_qty,
         CAST(floor(sqrt((CAST(nw AS DOUBLE) * CAST(ss AS DOUBLE)
                          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)))
                    / CAST(s AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS cv_e4
  FROM per_part WHERE s > 0
),
classed AS (
  SELECT CASE WHEN cv_e4 < {_XYZ_X_E4} THEN 'X'
              WHEN cv_e4 < {_XYZ_Y_E4} THEN 'Y' ELSE 'Z' END AS xyz_class,
         total_qty, cv_e4
  FROM cv
)
SELECT xyz_class, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(total_qty) AS BIGINT) AS total_qty,
       CAST(sum(cv_e4) // count(*) AS BIGINT) AS mean_cv_e4
FROM classed
GROUP BY xyz_class
ORDER BY xyz_class
"""


@register("orders_xyz_variability", oracle=_XYZ_ORACLE, tags=("analytics", "supply-chain"))
def orders_xyz_variability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ demand-variability classification — the companion axis to
    `orders_abc_classification` (ABC ranks by VALUE; XYZ tiers by
    forecastability): weekly demand per part, coefficient of
    variation sqrt(n*SS - S^2)/S (the population CV times sqrt(n),
    folded into one fixed expression from exact integer moments),
    tiers X (steady, safe to min-stock), Y, Z (erratic, needs
    buffer). Each part's CV quantizes to integer e4 BEFORE the
    class rollup so the class-level mean is an exact integer
    floor-divide — no order-dependent double accumulation. Weeks are
    an epoch-day floor-divide off the shipdate (observed weeks only;
    parts under {_XYZ_MIN_WEEKS} weeks of history are excluded as
    unclassifiable). Plan: two map-side-combined aggregates (part-
    week, then part) and a 3-row class rollup — a pure aggregation
    tree that rides any cluster width."""
    li = load_table(spark, sf_dir, "lineitem")
    weekly = li.groupBy(
        F.col("l_partkey").alias("part"),
        F.floor(
            F.datediff(F.col("l_shipdate"), F.lit("1992-01-01").cast("date")) / 7
        ).cast("long").alias("wk"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"))
    dec = "decimal(38,0)"
    per_part = (
        weekly.groupBy("part")
        .agg(
            F.count(F.lit(1)).cast("long").alias("nw"),
            F.sum("qty").cast(dec).alias("s"),
            F.sum(F.col("qty") * F.col("qty")).cast(dec).alias("ss"),
        )
        .filter(F.col("nw") >= _XYZ_MIN_WEEKS)
    )
    cv_expr = (
        F.sqrt(
            F.col("nw").cast("double") * F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
        )
        / F.col("s").cast("double")
    )
    cv = per_part.filter(F.col("s") > 0).select(
        "part",
        F.col("s").cast("long").alias("total_qty"),
        F.floor(cv_expr * 10_000 + F.lit(0.5)).cast("long").alias("cv_e4"),
    )
    classed = cv.select(
        F.when(F.col("cv_e4") < _XYZ_X_E4, "X")
        .when(F.col("cv_e4") < _XYZ_Y_E4, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
        "total_qty",
        "cv_e4",
    )
    return (
        classed.groupBy("xyz_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("total_qty").cast("long").alias("total_qty"),
            F.floor(F.sum("cv_e4") / F.count(F.lit(1))).cast("long").alias("mean_cv_e4"),
        )
        .orderBy("xyz_class")
    )


# --------------------------------------------------------------------------
# Supplier order-to-ship lead-time scorecard (mean + rank-exact P90)
# --------------------------------------------------------------------------

_LEAD_SLA_DAYS = 60

_REL_ORACLE = f"""
WITH lines AS (
  SELECT l.l_suppkey AS supp,
         datediff('day', o.o_orderdate, l.l_shipdate) AS lead_d
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
base AS (
  SELECT supp, CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(lead_d) AS BIGINT) AS lead_days,
         CAST(sum(CASE WHEN lead_d <= {_LEAD_SLA_DAYS} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_within_sla
  FROM lines GROUP BY supp
),
ranked AS (
  SELECT supp, lead_d,
         row_number() OVER (PARTITION BY supp ORDER BY lead_d) AS rn
  FROM lines
),
p90 AS (
  SELECT r.supp,
         CAST(max(CASE WHEN r.rn = greatest(1, CAST(ceil(b.n_lines * 0.9) AS BIGINT))
                       THEN r.lead_d END) AS BIGINT) AS p90_lead_d
  FROM ranked r JOIN base b ON b.supp = r.supp
  GROUP BY r.supp
)
SELECT b.supp, b.n_lines,
       -- lead can be NEGATIVE in the synthetic fixture (shipdate precedes
       -- orderdate); DuckDB's integer // truncates toward zero there while
       -- Spark floors, so floor an explicit double division on both sides
       CAST(floor(CAST(b.lead_days AS DOUBLE) / b.n_lines) AS BIGINT) AS mean_lead_d,
       CAST(b.n_within_sla * 10000 // b.n_lines AS BIGINT) AS sla_hit_e4,
       p.p90_lead_d
FROM base b JOIN p90 p ON p.supp = b.supp
ORDER BY b.supp
"""


@register("supplier_lead_time_scorecard", oracle=_REL_ORACLE, tags=("analytics", "supply-chain"))
def supplier_lead_time_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier order-to-ship lead-time scorecard: mean lead days,
    {_LEAD_SLA_DAYS}-day SLA hit rate, and the rank-exact P90 tail
    per supplier — the procurement reliability grade behind
    `q21_sole_late_shipper` (which names the worst offenders; this
    grades EVERYONE, and `supplier_weighted_scorecard` can consume
    it as a criterion; `orders_fulfillment_leadtime` is the ORDER-
    grain sibling). Lead times are exact integer days off the
    order-date join; mean and SLA rate are integer floor-divides;
    P90 is the ceil(0.9 n)-th order statistic — no interpolation, so
    both engines select the identical element. Plan: one fact join
    (orderkey-partitioned sort-merge), one supplier aggregate, one
    per-supplier rank window, a supplier-grain join — the window
    shuffles once on the supplier key and everything after is
    supplier-cardinality small."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    lines = li.join(od, li.l_orderkey == od.o_orderkey).select(
        F.col("l_suppkey").alias("supp"),
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("lead_d"),
    )
    base = lines.groupBy("supp").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("lead_d").cast("long").alias("lead_days"),
        F.sum(F.when(F.col("lead_d") <= _LEAD_SLA_DAYS, 1).otherwise(0))
        .cast("long")
        .alias("n_within_sla"),
    )
    w_rank = Window.partitionBy("supp").orderBy("lead_d")
    ranked = lines.select("supp", "lead_d", F.row_number().over(w_rank).alias("rn"))
    k = F.greatest(F.lit(1).cast("long"), F.ceil(F.col("n_lines") * 0.9))
    p90 = (
        ranked.join(base.select("supp", "n_lines"), "supp")
        .groupBy("supp")
        .agg(
            F.max(F.when(F.col("rn") == k, F.col("lead_d"))).cast("long").alias("p90_lead_d")
        )
    )
    return (
        base.join(p90, "supp")
        .select(
            "supp",
            "n_lines",
            F.floor(F.col("lead_days") / F.col("n_lines")).cast("long").alias("mean_lead_d"),
            F.floor(F.col("n_within_sla") * 10_000 / F.col("n_lines"))
            .cast("long")
            .alias("sla_hit_e4"),
            "p90_lead_d",
        )
        .orderBy("supp")
    )
