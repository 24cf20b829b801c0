"""Round-7 relational additions, part 22: percent-of-parent shares,
try_* arithmetic, and weekly segment transitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Percent-of-parent hierarchical shares
# --------------------------------------------------------------------------

_POP_ORACLE = """
WITH leaf AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY 1, 2
)
SELECT region, nation, cents,
       floor(CAST(cents AS DOUBLE)
             / sum(cents) OVER (PARTITION BY region) * 10000 + 0.5) / 10000
         AS pct_of_region,
       floor(CAST(cents AS DOUBLE) / sum(cents) OVER () * 10000 + 0.5) / 10000
         AS pct_of_total
FROM leaf
ORDER BY region, nation
"""


@register("window_percent_of_parent", oracle=_POP_ORACLE, tags=("window", "analytics"))
def window_percent_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent: each nation's revenue as a share of its
    region AND of the grand total — the hierarchical-share shape
    every BI drill-down renders next to raw numbers (the windowed
    dual of `agg_grouping_id_labels`' subtotal lattice: there the
    parents become ROWS, here they become DENOMINATORS). Both parent
    sums are unbounded window aggregates over the LEAF table
    (nation-cardinality — the windows never see the fact table), so
    the whole share computation costs nothing after the one fact
    groupBy through broadcast dims. Shares are terminal divisions
    over exact cents."""
    od = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    leaf = (
        od.join(F.broadcast(cust), od.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )

    def r4(c):
        return F.floor(c * 10000 + F.lit(0.5)) / 10000

    return leaf.select(
        "region",
        "nation",
        "cents",
        r4(
            F.col("cents").cast("double")
            / F.sum("cents").over(Window.partitionBy("region"))
        ).alias("pct_of_region"),
        r4(
            F.col("cents").cast("double") / F.sum("cents").over(Window.partitionBy())
        ).alias("pct_of_total"),
    ).orderBy("region", "nation")


# --------------------------------------------------------------------------
# try_* error-safe arithmetic battery
# --------------------------------------------------------------------------

_TRY_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_discount = 0 THEN NULL
            ELSE floor(l_extendedprice / l_discount * 100 + 0.5) / 100 END
         AS price_per_discount_point,
       TRY_CAST(l_returnflag AS BIGINT) AS flag_as_number,
       TRY_CAST(CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS BIGINT)
         AS qty_roundtrip,
       CASE WHEN l_quantity = 0 THEN NULL
            ELSE floor(l_extendedprice / l_quantity * 100 + 0.5) / 100 END
         AS unit_price
FROM lineitem
WHERE l_orderkey <= 100
ORDER BY l_orderkey, l_linenumber
"""


@register("scalar_try_arithmetic", oracle=_TRY_ORACLE, tags=("scalar", "semantics"))
def scalar_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic battery: try_divide returns NULL on /0
    instead of failing the job, try_cast returns NULL on malformed
    input — the ANSI-mode escape hatches that keep one poison row
    from killing a 100 TB pass (`scalar_cast_try` covers cast
    matrices; this covers ARITHMETIC, where ANSI Spark would
    otherwise throw DIVIDE_BY_ZERO mid-stage). The oracle spells each
    try_* as its explicit CASE equivalent, pinning that NULL — not an
    error, not a sentinel — is the contract. Map-side projection
    over a key-bounded slice."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)

    def r2(c):
        return F.floor(c * 100 + F.lit(0.5)) / 100

    return li.select(
        "l_orderkey",
        "l_linenumber",
        r2(F.try_divide(F.col("l_extendedprice"), F.col("l_discount"))).alias(
            "price_per_discount_point"
        ),
        F.try_to_number(F.col("l_returnflag"), F.lit("999"))
        .cast("long")
        .alias("flag_as_number"),
        F.col("l_quantity").cast("long").cast("string").cast("long").alias(
            "qty_roundtrip"
        ),
        r2(F.try_divide(F.col("l_extendedprice"), F.col("l_quantity"))).alias(
            "unit_price"
        ),
    ).orderBy("l_orderkey", "l_linenumber")


# --------------------------------------------------------------------------
# Weekly activity-segment transition matrix
# --------------------------------------------------------------------------

_SEG_THRESHOLD = 5  # events per week: >= -> 'heavy', else 'light'

_SEG_ORACLE = f"""
WITH weekly AS (
  SELECT user_id, (epoch_us(ts) // (7 * 86400 * 1000000::BIGINT)) AS wk,
         CAST(count(*) AS BIGINT) AS n_ev
  FROM events GROUP BY 1, 2
),
labeled AS (
  SELECT user_id, wk,
         CASE WHEN n_ev >= {_SEG_THRESHOLD} THEN 'heavy' ELSE 'light' END AS seg
  FROM weekly
),
trans AS (
  SELECT user_id, wk, seg,
         lead(seg) OVER (PARTITION BY user_id ORDER BY wk) AS next_seg,
         lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk
  FROM labeled
)
SELECT seg AS from_seg,
       CASE WHEN next_wk = wk + 1 THEN next_seg ELSE 'inactive' END AS to_seg,
       CAST(count(*) AS BIGINT) AS n_users
FROM trans
GROUP BY 1, 2
ORDER BY from_seg, to_seg
"""


@register("events_segment_transition", oracle=_SEG_ORACLE, tags=("analytics", "lifecycle"))
def events_segment_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly lifecycle-segment transition matrix: label each user
    heavy/light per week by event volume, then count week-over-week
    transitions — including the drop to 'inactive' when the next
    active week isn't consecutive — the user-state machine growth
    teams steer by (`events_markov_transition` chains EVENT types;
    this chains USER STATES, the retention-relevant object). Weeks
    are exact integer epoch buckets; the lead window and both
    groupBys share the user_id shuffle; output is states^2-bounded.
    A non-consecutive (or absent) next active week counts as a
    transition to 'inactive' — churn is a destination state, so every
    observed user-week row contributes exactly one transition."""
    ev = load_table(spark, sf_dir, "events")
    wk_us = 7 * 86400 * 1000000
    weekly = ev.groupBy(
        "user_id", F.expr(f"unix_micros(ts) div {wk_us}").alias("wk")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_ev"))
    labeled = weekly.select(
        "user_id",
        "wk",
        F.when(F.col("n_ev") >= _SEG_THRESHOLD, "heavy").otherwise("light").alias(
            "seg"
        ),
    )
    w = Window.partitionBy("user_id").orderBy("wk")
    trans = labeled.select(
        "seg",
        F.lead("seg").over(w).alias("next_seg"),
        "wk",
        F.lead("wk").over(w).alias("next_wk"),
    )
    return (
        trans.select(
            F.col("seg").alias("from_seg"),
            F.when(F.col("next_wk") == F.col("wk") + 1, F.col("next_seg"))
            .otherwise("inactive")
            .alias("to_seg"),
        )
        .groupBy("from_seg", "to_seg")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("from_seg", "to_seg")
    )
