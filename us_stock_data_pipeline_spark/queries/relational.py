"""Relational operator surface: scan/filter/project, joins (broadcast,
shuffle, semi/anti, non-equi range, as-of), aggregation (hash, distinct,
rollup/cube/grouping sets), windows (ranking, analytic, frames), sort/topk,
set ops, dedup.

Scale notes apply per-operator in docstrings: the point of every choice is
that the same plan survives 100 TB — broadcast the fixed-cardinality side,
shuffle on the high-cardinality key, keep expressions inside whole-stage
codegen, and let AQE fix skew at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table, register_views
from us_stock_data_pipeline_spark.registry import register


# --------------------------------------------------------------------------
# Scan / filter / project / hash-agg spine (reference parity: S5, P3, F1-F2,
# A1-A2 → SURVEY.md §2A) — TPC-H Q1 shape.
# --------------------------------------------------------------------------

Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2)                                        AS sum_qty,
  round(sum(l_extendedprice), 2)                                   AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
  round(avg(l_quantity), 4)                                        AS avg_qty,
  round(avg(l_extendedprice), 4)                                   AS avg_price,
  round(avg(l_discount), 4)                                        AS avg_disc,
  count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=Q1_ORACLE, tags=("agg", "flagship"), bench=True)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (TPC-H Q1 shape): scan -> filter -> hash agg
    -> sort. The filter and the 2-of-11-column projection reach the parquet
    scan (PushedFilters / ReadSchema); the groupBy is a partial (map-side)
    + final hash aggregate — at 100 TB the shuffle carries only
    |returnflag|x|linestatus| partial rows per task, not data.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "filter_conjunctive_range",
    oracle="""
SELECT
  round(sum(l_extendedprice * l_discount), 2) AS revenue,
  count(*)                                    AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    tags=("filter",),
    bench=True,
)
def filter_conjunctive_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive range predicates (TPC-H Q6 shape; parity ancestor F1/F2:
    the reference's hhmm session bands and ts>max_ts watermark are the same
    conjunctive-range pattern, `1m-seesion-pipeline/utils.py:7-19`).
    All four predicates push to parquet row-group stats — at 100 TB this
    prunes whole row groups before any CPU is spent.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------


@register(
    "join_broadcast_dim",
    oracle="""
SELECT
  p_brand,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  count(*)                                          AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
""",
    tags=("join",),
    bench=True,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast equi-join: fact lineitem x small dim part. The explicit
    broadcast hint guarantees a BroadcastHashJoin — zero shuffle of the
    100 TB fact side; the dim ships once per executor.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("p_brand")
    )


@register(
    "join_multiway_chain",
    oracle="""
SELECT
  n_name,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  count(*)                                          AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    tags=("join",),
    bench=True,
)
def join_multiway_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way join chain (TPC-H Q5 shape): the two big tables
    (lineitem x orders) meet in a shuffle join on l_orderkey — the only
    unavoidable shuffle — while customer/nation/region are broadcast.
    The region filter is applied before the join so the broadcast side is
    pre-pruned (Catalyst pushes it regardless; stated for intent).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), F.col("o_custkey") == customer.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "join_left_outer",
    oracle="""
SELECT
  c_custkey,
  count(o_orderkey)                       AS n_orders,
  round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
FROM customer
LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey
ORDER BY c_custkey
""",
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders; count(col)
    skips nulls so empty customers report 0. Shuffle join on c_custkey;
    at scale AQE converts to broadcast if the build side shrinks."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_totalprice > 400000
)
ORDER BY c_custkey
""",
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join = EXISTS. Semi joins ship only the join key of the
    probe side and stop at first match — at scale, vastly cheaper than
    join+distinct."""
    cust = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        cust.join(big_orders, cust.c_custkey == big_orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey
)
ORDER BY c_custkey
""",
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join = NOT EXISTS: customers who never ordered."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))
        .orderBy("c_custkey")
    )


@register(
    "join_range_nonequi",
    oracle="""
SELECT
  c.event_id  AS click_id,
  p.event_id  AS purchase_id,
  c.user_id   AS user_id,
  round(p.value, 4) AS purchase_value
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click'
 AND p.event_type = 'purchase'
 AND p.ts > c.ts
 AND p.ts <= c.ts + INTERVAL 1 HOUR
ORDER BY click_id, purchase_id
""",
    tags=("join",),
)
def join_range_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join: click -> purchase conversions within 1 hour.
    The equi part (user_id) drives the shuffle; the time band is evaluated
    as a post-join predicate within each key group, so the plan is a
    sort-merge join, NOT a cartesian product — this is what keeps it
    feasible at 100 TB (band-only joins need bucketized time keys instead).
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id"), F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("p_ts"),
        F.col("value"),
    )
    return (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("p_ts") > F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select("click_id", "purchase_id", "user_id", F.round("value", 4).alias("purchase_value"))
        .orderBy("click_id", "purchase_id")
    )


@register(
    "join_asof",
    oracle="""
SELECT
  p.event_id,
  p.user_id,
  p.ts,
  (SELECT max(c.ts) FROM events c
    WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
  ) AS last_click_ts
FROM events p
WHERE p.event_type = 'purchase'
ORDER BY p.event_id
""",
    tags=("join", "asof"),
    bench=True,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (stock-native: latest bar <= event time per key),
    expressed Spark-first as union + running max over a single window —
    one shuffle on (user_id), no per-row subquery, no cartesian blowup.
    Rows are interleaved with clicks sorting before purchases at equal ts
    (side=0 before side=1) so `<=` semantics hold exactly.
    At 100 TB this is the canonical formulation: both streams shuffle once
    on the key, then a linear scan per key — same cost as a sort-merge join.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(0).alias("side"), F.lit(None).cast("long").alias("event_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("side"), "event_id"
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = clicks.unionByName(purchases).withColumn(
        "last_click_ts", F.max(F.when(F.col("side") == 0, F.col("ts"))).over(w)
    )
    return (
        merged.filter(F.col("side") == 1)
        .select("event_id", "user_id", "ts", "last_click_ts")
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Aggregation beyond plain groupBy
# --------------------------------------------------------------------------


@register(
    "agg_distinct",
    oracle="""
SELECT
  event_type,
  count(DISTINCT user_id) AS n_users,
  count(*)                AS n_events,
  round(sum(value), 2)    AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    tags=("agg",),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation. Spark expands count(DISTINCT) into a
    two-phase aggregate (partial dedup per partition, then merge) — no
    single-node bottleneck at scale."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_approx_distinct",
    oracle="""
SELECT
  event_type,
  count(DISTINCT user_id) AS exact_users,
  TRUE                    AS within_tol
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    tags=("agg", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the 100 TB path where exact
    distinct's dedup shuffle is too expensive.

    The sketch estimate itself is engine-specific, so the compared
    columns are the exact count (DuckDB recomputes it) plus a boolean
    asserting the HLL estimate landed within 10% relative error of the
    exact count — i.e. the oracle verifies the approximation CONTRACT,
    not the implementation-defined estimate value. rsd=0.02 makes a 10%
    miss a >5-sigma event, so the row is deterministic in practice."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.10 * F.col("exact_users")
            ).alias("within_tol"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_rollup",
    oracle="""
SELECT
  coalesce(o_orderstatus, 'ALL')   AS status,
  coalesce(o_orderpriority, 'ALL') AS priority,
  count(*)                         AS n_orders,
  round(sum(o_totalprice), 2)      AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY status, priority
""",
    tags=("agg",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status, status+priority, grand total)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total",
        )
        .orderBy("status", "priority")
    )


@register(
    "agg_cube",
    oracle="""
SELECT
  coalesce(o_orderstatus, 'ALL')  AS status,
  coalesce(c_mktsegment, 'ALL')   AS segment,
  count(*)                        AS n_orders,
  round(sum(o_totalprice), 2)     AS total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE (o_orderstatus, c_mktsegment)
ORDER BY status, segment
""",
    tags=("agg",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over a join: all 2^2 grouping combinations in one pass (Spark
    expands to a single Expand + hash-agg, not 4 scans)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .cube("o_orderstatus", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            "n_orders",
            "total",
        )
        .orderBy("status", "segment")
    )


@register(
    "agg_grouping_sets",
    oracle="""
SELECT
  coalesce(o_orderstatus, 'ALL')   AS status,
  coalesce(o_orderpriority, 'ALL') AS priority,
  count(*)                         AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
ORDER BY status, priority
""",
    tags=("agg",),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL path (same Catalyst Expand
    operator as rollup/cube)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT
          coalesce(o_orderstatus, 'ALL')   AS status,
          coalesce(o_orderpriority, 'ALL') AS priority,
          count(*)                         AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY status, priority
        """
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


@register(
    "window_rank_topn",
    oracle="""
SELECT
  o_custkey,
  o_orderkey,
  totalprice,
  rn,
  rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS status_rank
FROM (
  SELECT
    o_custkey,
    o_orderkey,
    o_orderstatus,
    round(o_totalprice, 2) AS totalprice,
    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
ORDER BY o_custkey, rn
""",
    tags=("window",),
    bench=True,
)
def window_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group via ranking window, with a second analytic window
    (status rank among the survivors) stacked above. The top-N filter sits
    DIRECTLY on its window so Spark rewrites it to WindowGroupLimit
    (asserted in tests/test_plans.py): each map task pre-ships only K rows
    per key — at 100 TB that's the difference between shuffling 3 rows and
    shuffling every order a customer ever placed. Both windows partition
    by o_custkey, so one shuffle serves the pair. Deterministic tiebreak
    on o_orderkey keeps the oracle hash stable."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    w2 = W.partitionBy("o_custkey").orderBy("o_orderstatus")
    top = (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )
    return (
        top.select(
            "o_custkey",
            "o_orderkey",
            "totalprice",
            "rn",
            F.rank().over(w2).alias("status_rank"),
        )
        .orderBy("o_custkey", "rn")
    )


@register(
    "window_lag_lead",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
         round(sum(o_totalprice), 2) AS revenue
  FROM orders GROUP BY 1
)
SELECT
  day,
  revenue,
  round(lag(revenue)  OVER (ORDER BY day), 2) AS prev_revenue,
  round(lead(revenue) OVER (ORDER BY day), 2) AS next_revenue,
  round(revenue - coalesce(lag(revenue) OVER (ORDER BY day), revenue), 2) AS delta
FROM daily
ORDER BY day
""",
    tags=("window",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag/lead over a pre-aggregated daily series. The global
    (unpartitioned) window is fine here because the daily rollup has
    bounded cardinality (days, not rows) — the rule at scale: only ever
    order a window whose partition fits one task."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    w = W.orderBy("day")
    return daily.select(
        "day",
        "revenue",
        F.round(F.lag("revenue").over(w), 2).alias("prev_revenue"),
        F.round(F.lead("revenue").over(w), 2).alias("next_revenue"),
        F.round(F.col("revenue") - F.coalesce(F.lag("revenue").over(w), F.col("revenue")), 2).alias(
            "delta"
        ),
    ).orderBy("day")


@register(
    "window_running_frame",
    oracle="""
SELECT
  user_id,
  event_id,
  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value,
  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)         AS moving_avg_7
FROM events
ORDER BY user_id, event_id
""",
    tags=("window",),
)
def window_running_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-frame windows: running total + 7-row moving average per user
    (the reference's bar streams need exactly this for rolling indicators).
    Single shuffle on user_id; frames are streaming (O(1) per row)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2).alias(
            "running_value"
        ),
        F.round(F.avg("value").over(w.rowsBetween(-6, 0)), 4).alias("moving_avg_7"),
    ).orderBy("user_id", "event_id")


@register(
    "window_range_frame",
    oracle="""
SELECT
  user_id,
  event_id,
  round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                         RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW), 2) AS value_24h,
  count(*)         OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                         RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)     AS n_24h
FROM events
ORDER BY user_id, event_id
""",
    tags=("window",),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: trailing-24h sum/count per user. Ordering on
    epoch microseconds makes the numeric range identical in Spark and the
    oracle (no interval-arithmetic dialect gap)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-86_400_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("value_24h"),
        F.count(F.lit(1)).over(w).alias("n_24h"),
    ).orderBy("user_id", "event_id")


# --------------------------------------------------------------------------
# Sort / top-k / set ops / dedup
# --------------------------------------------------------------------------


@register(
    "topk_global",
    oracle="""
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
    tags=("sort",),
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy+limit compiles to TakeOrderedAndProject —
    each partition keeps its local top 10, driver merges 10*P rows. No
    global sort ever materializes, which is the only sane plan at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice"), "o_orderdate")
        .limit(10)
    )


@register(
    "set_union",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
ORDER BY c_custkey
""",
    tags=("setop",),
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.union(b).distinct().orderBy("c_custkey")


@register(
    "set_intersect",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
ORDER BY c_custkey
""",
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.intersect(b).orderBy("c_custkey")


@register(
    "set_except",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
ORDER BY c_custkey
""",
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.subtract(b).orderBy("c_custkey")


@register(
    "distinct_pairs",
    oracle="""
SELECT DISTINCT o_orderstatus AS status, o_orderpriority AS priority
FROM orders
ORDER BY status, priority
""",
    tags=("setop", "dedup"),
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection-level dedup (dropDuplicates == DISTINCT after pruning to
    the key columns — shuffles only the 2 key columns, not whole rows)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(F.col("o_orderstatus").alias("status"), F.col("o_orderpriority").alias("priority"))
        .dropDuplicates()
        .orderBy("status", "priority")
    )


@register(
    "pivot_counts",
    oracle="""
SELECT
  CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
  count(*) FILTER (WHERE event_type = 'click')    AS click,
  count(*) FILTER (WHERE event_type = 'error')    AS error,
  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
  count(*) FILTER (WHERE event_type = 'signup')   AS signup,
  count(*) FILTER (WHERE event_type = 'view')     AS view
FROM events
GROUP BY 1
ORDER BY day
""",
    tags=("agg", "pivot"),
)
def pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long->wide): daily counts per event type. The explicit value
    list avoids the extra distinct-values job Spark otherwise runs — at
    scale, always pass the pivot domain."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    piv = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    ).orderBy("day")
