"""Round-16 relational/ETL, part 26: bitemporal point-in-time audit
and capacity-constrained greedy allocation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Bitemporal point-in-time: "as known at" vs "as of now"
# --------------------------------------------------------------------------

_BT_ASOF = "1996-06-30"

# Update stream synthesized from lineitem: each line is a price record
# for its part with valid_from = shipdate (business time) and
# recorded_at = shipdate + linenumber days (transaction time — later
# lines of an order model corrections that ARRIVE later).
_BT_ORACLE = f"""
WITH updates AS (
  SELECT l.l_partkey, p.p_brand,
         CAST(l_shipdate AS DATE) AS valid_from,
         CAST(l_shipdate AS DATE) + CAST(l_linenumber AS INTEGER) AS recorded_at,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
         l.l_orderkey, l.l_linenumber
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
pit AS (
  SELECT l_partkey, p_brand, price_cents,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY valid_from DESC, recorded_at DESC,
                                     l_orderkey DESC, l_linenumber DESC) AS rn
  FROM updates
  WHERE valid_from <= DATE '{_BT_ASOF}' AND recorded_at <= DATE '{_BT_ASOF}'
),
now_view AS (
  SELECT l_partkey, price_cents,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY valid_from DESC, recorded_at DESC,
                                     l_orderkey DESC, l_linenumber DESC) AS rn
  FROM updates
  WHERE valid_from <= DATE '{_BT_ASOF}'
)
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n_parts_known,
       CAST(sum(CASE WHEN n.price_cents IS NOT NULL
                      AND n.price_cents <> p2.price_cents THEN 1 ELSE 0 END)
            AS BIGINT) AS n_revised_late,
       CAST(sum(p2.price_cents) AS BIGINT) AS pit_price_total_cents
FROM (SELECT DISTINCT l_partkey, p_brand FROM updates) p
JOIN (SELECT l_partkey, price_cents FROM pit WHERE rn = 1) p2
  ON p2.l_partkey = p.l_partkey
LEFT JOIN (SELECT l_partkey, price_cents FROM now_view WHERE rn = 1) n
  ON n.l_partkey = p.l_partkey
GROUP BY p.p_brand
ORDER BY p.p_brand
"""


@register("etl_bitemporal_pit", oracle=_BT_ORACLE, tags=("etl", "temporal"))
def etl_bitemporal_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal point-in-time audit: price records carry TWO time
    axes — valid_from (when the price took effect) and recorded_at
    (when the warehouse learned it) — and the query compares "what
    we KNEW on {_BT_ASOF}" (both axes filtered) against "what we NOW
    know about {_BT_ASOF}" (only business time filtered). Parts
    whose answers differ were revised by LATE-ARRIVING records — the
    count a regulator asks for when yesterday's report disagrees
    with today's rerun, and the two-axis upgrade of
    `etl_scd2_lookup`'s single-axis point-in-time. Both views are
    one latest-row-per-key window with a fully pinned tiebreak over
    the same partkey shuffle. Plan: one scan, broadcast part dim,
    two windows sharing a shuffle, bounded brand rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    updates = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey",
        "p_brand",
        F.to_date("l_shipdate").alias("valid_from"),
        F.expr("CAST(l_shipdate AS DATE) + CAST(l_linenumber AS INT)").alias(
            "recorded_at"
        ),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_cents"),
        "l_orderkey",
        "l_linenumber",
    )
    w_latest = Window.partitionBy("l_partkey").orderBy(
        F.col("valid_from").desc(),
        F.col("recorded_at").desc(),
        F.col("l_orderkey").desc(),
        F.col("l_linenumber").desc(),
    )
    pit = (
        updates.filter(
            (F.col("valid_from") <= _BT_ASOF) & (F.col("recorded_at") <= _BT_ASOF)
        )
        .withColumn("rn", F.row_number().over(w_latest))
        .filter(F.col("rn") == 1)
        .select(F.col("l_partkey").alias("pk"), F.col("price_cents").alias("pit_price"))
    )
    now_view = (
        updates.filter(F.col("valid_from") <= _BT_ASOF)
        .withColumn("rn", F.row_number().over(w_latest))
        .filter(F.col("rn") == 1)
        .select(F.col("l_partkey").alias("nk"), F.col("price_cents").alias("now_price"))
    )
    parts = updates.select("l_partkey", "p_brand").distinct()
    joined = (
        parts.join(pit, parts.l_partkey == pit.pk)
        .join(now_view, parts.l_partkey == now_view.nk, "left")
    )
    return (
        joined.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts_known"),
            F.sum(
                F.when(
                    F.col("now_price").isNotNull()
                    & (F.col("now_price") != F.col("pit_price")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_revised_late"),
            F.sum("pit_price").cast("long").alias("pit_price_total_cents"),
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# Capacity-constrained greedy allocation (fill / partial / backorder)
# --------------------------------------------------------------------------

_CAP_ORACLE = """
WITH demand AS (
  SELECT l.l_partkey, l.l_orderkey, l.l_linenumber,
         CAST(l.l_quantity AS BIGINT) AS qty,
         o.o_orderdate, o.o_orderpriority
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
cap AS (
  SELECT l_partkey, CAST(sum(qty) // 2 AS BIGINT) AS capacity
  FROM demand GROUP BY l_partkey
),
queued AS (
  SELECT d.*, c.capacity,
         sum(d.qty) OVER (PARTITION BY d.l_partkey
                          ORDER BY d.o_orderdate, d.l_orderkey, d.l_linenumber
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM demand d JOIN cap c ON c.l_partkey = d.l_partkey
),
classed AS (
  SELECT o_orderpriority, qty, capacity, cum,
         CASE WHEN cum <= capacity THEN 'filled'
              WHEN cum - qty < capacity THEN 'partial'
              ELSE 'backorder' END AS status,
         CASE WHEN cum <= capacity THEN qty
              WHEN cum - qty < capacity THEN capacity - (cum - qty)
              ELSE 0 END AS qty_filled
  FROM queued
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN status = 'filled' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
       CAST(sum(CASE WHEN status = 'partial' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial,
       CAST(sum(CASE WHEN status = 'backorder' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_backordered,
       CAST(sum(qty_filled) AS BIGINT) AS qty_filled,
       CAST(sum(qty_filled) * 1000 // sum(qty) AS BIGINT) AS fill_permille
FROM classed
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("orders_capacity_allocation", oracle=_CAP_ORACLE, tags=("analytics", "window"))
def orders_capacity_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capacity-constrained first-come-first-served allocation: each
    part has finite supply (half its total demand), demand lines
    queue by order date, and a running-quantity cumsum classifies
    every line as filled, partially filled (the one line that
    straddles the capacity boundary gets the remainder), or
    backordered — the greedy ATP (available-to-promise) pass an OMS
    runs at order intake, and the demand-side mirror of
    `orders_backlog_aging`. Pure integer arithmetic: the cumsum,
    the boundary straddle, and the partial quantity are all exact,
    with a fully pinned queue order (date, orderkey, linenumber).
    Plan: fact join, bounded per-part capacity aggregate joined
    back, ONE cumsum window on the partkey shuffle, priority
    rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    demand = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("qty"),
        "o_orderdate",
        "o_orderpriority",
    )
    cap = demand.groupBy(F.col("l_partkey").alias("ck")).agg(
        F.expr("CAST(sum(qty) div 2 AS BIGINT)").alias("capacity")
    )
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("o_orderdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    queued = demand.join(F.broadcast(cap), demand.l_partkey == cap.ck).withColumn(
        "cum", F.sum("qty").over(w)
    )
    classed = queued.select(
        "o_orderpriority",
        "qty",
        F.when(F.col("cum") <= F.col("capacity"), "filled")
        .when(F.col("cum") - F.col("qty") < F.col("capacity"), "partial")
        .otherwise("backorder")
        .alias("status"),
        F.when(F.col("cum") <= F.col("capacity"), F.col("qty"))
        .when(
            F.col("cum") - F.col("qty") < F.col("capacity"),
            F.col("capacity") - (F.col("cum") - F.col("qty")),
        )
        .otherwise(0)
        .alias("qty_filled"),
    )
    return (
        classed.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.when(F.col("status") == "filled", 1).otherwise(0))
            .cast("long")
            .alias("n_filled"),
            F.sum(F.when(F.col("status") == "partial", 1).otherwise(0))
            .cast("long")
            .alias("n_partial"),
            F.sum(F.when(F.col("status") == "backorder", 1).otherwise(0))
            .cast("long")
            .alias("n_backordered"),
            F.sum("qty_filled").cast("long").alias("qty_filled"),
            F.expr("CAST(sum(qty_filled) * 1000 div sum(qty) AS BIGINT)").alias(
                "fill_permille"
            ),
        )
        .orderBy("o_orderpriority")
    )
