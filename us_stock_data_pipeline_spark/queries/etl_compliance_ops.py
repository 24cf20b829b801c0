"""Round-12 compliance ETL: GDPR subject-access extract manifest —
the read-side twin of `etl_deletion_manifest`'s right-to-erasure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# Deterministic request batch: every 97th customer key.
_SAR_MOD = 97

_SAR_ORACLE = f"""
WITH subjects AS (
  SELECT c_custkey, c_name, c_mktsegment,
         CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
  FROM customer WHERE c_custkey % {_SAR_MOD} = 0
),
ord AS (
  SELECT o.o_custkey,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_cents,
         min(o.o_orderdate) AS first_order,
         max(o.o_orderdate) AS last_order
  FROM orders o JOIN subjects s ON s.c_custkey = o.o_custkey
  GROUP BY o.o_custkey
),
li AS (
  SELECT o.o_custkey, CAST(count(*) AS BIGINT) AS n_lineitems
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN subjects s ON s.c_custkey = o.o_custkey
  GROUP BY o.o_custkey
)
SELECT s.c_custkey, s.c_name, s.c_mktsegment, s.acctbal_cents,
       coalesce(o.n_orders, 0) AS n_orders,
       coalesce(o.spend_cents, 0) AS spend_cents,
       o.first_order, o.last_order,
       coalesce(l.n_lineitems, 0) AS n_lineitems
FROM subjects s
LEFT JOIN ord o ON o.o_custkey = s.c_custkey
LEFT JOIN li l ON l.o_custkey = s.c_custkey
ORDER BY s.c_custkey
"""


@register("etl_subject_access_extract", oracle=_SAR_ORACLE, tags=("etl", "compliance"))
def etl_subject_access_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR subject-access-request extract: for a batch of data
    subjects (deterministic every-{_SAR_MOD}th customer), assemble the
    one-row-per-subject manifest of everything the warehouse holds on
    them — profile fields, order count and exact spend, activity date
    range, and line-item footprint — the read-side twin of
    `etl_deletion_manifest` (Article 15 vs Article 17), and the query
    a privacy team runs on a 30-day SLA. The subject list broadcasts
    into every fact scan (a semi-join-shaped pre-filter, so the fact
    tables are reduced BEFORE any aggregation); subjects without
    orders still appear with zero counts via the left joins. Plan:
    broadcast subject filter on both fact paths, two
    map-side-combined groupBys, a final bounded three-way join on
    the subject list."""
    cust = load_table(spark, sf_dir, "customer")
    subjects = cust.filter(F.col("c_custkey") % _SAR_MOD == 0).select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_cents"),
    )
    orders = load_table(spark, sf_dir, "orders")
    sub_keys = subjects.select("c_custkey")
    ord_agg = (
        orders.join(F.broadcast(sub_keys), orders.o_custkey == sub_keys.c_custkey)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("spend_cents"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )
    )
    li = load_table(spark, sf_dir, "lineitem")
    sub_orders = orders.join(
        F.broadcast(sub_keys), orders.o_custkey == sub_keys.c_custkey
    ).select("o_orderkey", "o_custkey")
    li_agg = (
        li.join(F.broadcast(sub_orders), li.l_orderkey == sub_orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_lineitems"))
    )
    return (
        subjects.join(
            F.broadcast(ord_agg), subjects.c_custkey == ord_agg.o_custkey, "left"
        )
        .drop("o_custkey")
        .join(F.broadcast(li_agg), subjects.c_custkey == li_agg.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            "c_mktsegment",
            "acctbal_cents",
            F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
            F.coalesce("spend_cents", F.lit(0)).cast("long").alias("spend_cents"),
            "first_order",
            "last_order",
            F.coalesce("n_lineitems", F.lit(0)).cast("long").alias("n_lineitems"),
        )
        .orderBy("c_custkey")
    )
