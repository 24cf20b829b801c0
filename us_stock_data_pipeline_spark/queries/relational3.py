"""Relational surface, part 3: TPC-H classic query shapes (Q3/Q5/Q10),
full-outer and cross joins, statistical-moment aggregates, and arg-max
aggregation (min_by/max_by).

These extend SURVEY.md §2B's join/agg rows with the canonical
multi-join + agg + top-k reporting shapes a warehouse runs daily; each
docstring carries the 100 TB plan rationale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# TPC-H classic shapes (adapted to the fixture's column subset — FIXTURES.md)
# --------------------------------------------------------------------------

Q3_ORACLE = """
SELECT
  l_orderkey,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=Q3_ORACLE, tags=("join", "agg", "topk"), bench=True)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority report (TPC-H Q3 shape): selective dim filter ->
    two-join chain -> hash agg -> global top-10. The c_mktsegment filter
    makes customer small enough to broadcast (~1/5 of customers), so only
    orders<->lineitem shuffles — and AQE will downgrade that to broadcast
    too when the date filters cut orders far enough. TakeOrderedAndProject
    bounds the top-k: no global sort of the aggregate ever materializes."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


Q5_ORACLE = """
SELECT
  n_name,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey   = c_custkey
JOIN lineitem ON l_orderkey  = o_orderkey
JOIN supplier ON l_suppkey   = s_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register("q5_local_supplier_volume", oracle=Q5_ORACLE, tags=("join", "agg"), bench=True)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume (TPC-H Q5 shape): a six-table join where the
    supplier join carries an extra same-nation equality. region/nation/
    supplier are fixed-cardinality -> broadcast (zero shuffle); the
    orders<->customer and lineitem<->orders joins shuffle on their keys and
    AQE reorders/downgrades at runtime. The same-nation condition rides the
    supplier broadcast join as a residual — no extra exchange."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (supp.s_nationkey == cust.c_nationkey),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q10_ORACLE = """
SELECT
  c_custkey,
  c_name,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  round(c_acctbal, 2) AS c_acctbal,
  n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", oracle=Q10_ORACLE, tags=("join", "agg", "topk"))
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item report (TPC-H Q10 shape): who returned the most value
    last quarter. The returnflag filter pushes to the lineitem scan; the
    agg keys include the wide customer attributes, which Catalyst carries
    through the final aggregate only (partial aggs shuffle just the
    grouping hash + partial sums)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Remaining join flavors
# --------------------------------------------------------------------------


@register(
    "join_full_outer",
    oracle="""
SELECT
  coalesce(big.o_custkey, sml.c_custkey) AS custkey,
  big.n_orders,
  sml.c_acctbal
FROM (
  SELECT o_custkey, count(*) AS n_orders
  FROM orders WHERE o_totalprice > 300000 GROUP BY o_custkey
) big
FULL OUTER JOIN (
  SELECT c_custkey, round(c_acctbal, 2) AS c_acctbal
  FROM customer WHERE c_acctbal < 0
) sml ON big.o_custkey = sml.c_custkey
ORDER BY custkey
""",
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of two partially-overlapping keyed sets (big-ticket
    customers vs negative-balance customers) — rows survive from both
    sides with nulls opposite. Full outer can't broadcast (both sides must
    see all keys), so it shuffle-hash/sort-merge joins on the key; at
    100 TB both inputs here are already aggregates, tiny relative to the
    facts that produced them."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        orders.filter(F.col("o_totalprice") > 300000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    sml = cust.filter(F.col("c_acctbal") < 0).select(
        "c_custkey", F.round("c_acctbal", 2).alias("c_acctbal")
    )
    return (
        big.join(sml, big.o_custkey == sml.c_custkey, "full_outer")
        .select(
            F.coalesce("o_custkey", "c_custkey").alias("custkey"),
            "n_orders",
            "c_acctbal",
        )
        .orderBy("custkey")
    )


@register(
    "join_cross",
    oracle="""
SELECT r_name, n_name, r_regionkey = n_regionkey AS is_home
FROM region CROSS JOIN nation
ORDER BY r_name, n_name
""",
    tags=("join",),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product of the two fixed-cardinality dims (5x25
    rows) — the grid-expansion pattern (calendar x entity scaffolds,
    parameter sweeps). Safe only when at least one side is tiny and
    broadcast; Spark requires the explicit crossJoin call precisely so a
    planner bug can't silently cartesian two fact tables."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return (
        region.crossJoin(F.broadcast(nation))
        .select(
            "r_name",
            "n_name",
            (F.col("r_regionkey") == F.col("n_regionkey")).alias("is_home"),
        )
        .orderBy("r_name", "n_name")
    )


# --------------------------------------------------------------------------
# Statistical aggregates
# --------------------------------------------------------------------------


@register(
    "agg_stats_moments",
    oracle="""
SELECT
  l_returnflag,
  round(stddev_samp(l_extendedprice), 4)            AS sd_price,
  round(var_samp(l_quantity), 4)                    AS var_qty,
  round(corr(l_extendedprice, l_quantity), 6)       AS corr_price_qty,
  round(covar_samp(l_extendedprice, l_discount), 4) AS cov_price_disc,
  count(*)                                          AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("agg", "stats"),
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics per group: sample stddev/variance,
    Pearson correlation, sample covariance. All are single-pass
    partial-aggregatable sketches (sum, sum-of-squares, co-moments), so
    the shuffle carries O(groups) state regardless of input size — the
    right building block for feature-stats jobs over a 100 TB corpus."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_price_qty"),
            F.round(F.covar_samp("l_extendedprice", "l_discount"), 4).alias("cov_price_disc"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_minmax_by",
    oracle="""
SELECT
  o_custkey,
  arg_max(o_orderkey, o_totalprice) AS biggest_order,
  round(max(o_totalprice), 2)       AS biggest_total,
  arg_min(o_orderkey, o_totalprice) AS smallest_order,
  round(min(o_totalprice), 2)       AS smallest_total
FROM orders
GROUP BY o_custkey
HAVING count(*) >= 3
ORDER BY o_custkey
""",
    tags=("agg",),
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-max/arg-min aggregation (max_by/min_by): the order id that
    carried each customer's largest/smallest total. One hash aggregate —
    no self-join or window needed for "row achieving the extreme", which
    at 100 TB replaces a shuffle+sort per extreme with carried (arg, val)
    pairs. (o_custkey, o_totalprice) is duplicate-free in this dataset at
    every sf, so the arg is well-defined on both engines."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
            F.round(F.max("o_totalprice"), 2).alias("biggest_total"),
            F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
            F.round(F.min("o_totalprice"), 2).alias("smallest_total"),
            F.count(F.lit(1)).alias("_n"),
        )
        .filter(F.col("_n") >= 3)
        .drop("_n")
        .orderBy("o_custkey")
    )
