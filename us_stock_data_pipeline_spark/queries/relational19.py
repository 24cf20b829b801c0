"""Round-7 relational additions, part 19: invoice reconciliation,
surrogate-key audit, inline code-table joins, and sliding medians.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Invoice total reconciliation (lineitem rollup vs orders header)
# --------------------------------------------------------------------------

_RECON_ORACLE = """
WITH line_tot AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100)
                       AS BIGINT)) AS BIGINT) AS computed_cents
  FROM lineitem GROUP BY l_orderkey
),
recon AS (
  SELECT o.o_orderkey,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS header_cents,
         coalesce(lt.computed_cents, 0) AS computed_cents
  FROM orders o LEFT JOIN line_tot lt ON lt.l_orderkey = o.o_orderkey
),
classed AS (
  SELECT CASE
           WHEN computed_cents = 0 THEN 'no_lines'
           WHEN abs(header_cents - computed_cents) = 0 THEN 'exact'
           WHEN abs(header_cents - computed_cents) * 1000 <= header_cents
             THEN 'within_0_1pct'
           ELSE 'mismatch' END AS recon_class,
         header_cents,
         abs(header_cents - computed_cents) AS diff_cents
  FROM recon
)
SELECT recon_class,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(header_cents) AS BIGINT) AS header_cents,
       CAST(max(diff_cents) AS BIGINT) AS max_diff_cents
FROM classed
GROUP BY recon_class
ORDER BY recon_class
"""


@register("lineitem_tax_reconciliation", oracle=_RECON_ORACLE, tags=("etl", "finance"))
def lineitem_tax_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invoice reconciliation: recompute each order's total from its
    lines (price x (1-discount) x (1+tax), per-line exact cents) and
    class the difference against the header total — exact, within
    0.1%, mismatch, or headerless — the daily close-of-books recon
    every billing system runs (`etl_fk_conformance` checks the KEYS
    agree; this checks the MONEY agrees). The tolerance test is
    integer cross-multiplication (diff*1000 <= header), no float
    boundary. One fact groupBy on the natural join key, one left
    join at order grain, a 4-row class rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    line_tot = li.groupBy("l_orderkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * 100
            ).cast("long")
        )
        .cast("long")
        .alias("computed_cents")
    )
    recon = od.join(line_tot, od.o_orderkey == line_tot.l_orderkey, "left").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("header_cents"),
        F.coalesce(F.col("computed_cents"), F.lit(0)).alias("computed_cents"),
    )
    diff = F.abs(F.col("header_cents") - F.col("computed_cents"))
    classed = recon.select(
        F.when(F.col("computed_cents") == 0, "no_lines")
        .when(diff == 0, "exact")
        .when(diff * 1000 <= F.col("header_cents"), "within_0_1pct")
        .otherwise("mismatch")
        .alias("recon_class"),
        "header_cents",
        diff.alias("diff_cents"),
    )
    return (
        classed.groupBy("recon_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("header_cents").cast("long").alias("header_cents"),
            F.max("diff_cents").cast("long").alias("max_diff_cents"),
        )
        .orderBy("recon_class")
    )


# --------------------------------------------------------------------------
# Hash surrogate-key generation + collision audit
# --------------------------------------------------------------------------

_SK_ORACLE = """
WITH keyed AS (
  SELECT c_custkey,
         substr(sha256(c_name || '|' || CAST(c_nationkey AS VARCHAR)), 1, 16)
           AS sk16,
         substr(sha256(c_name || '|' || CAST(c_nationkey AS VARCHAR)), 1, 8)
           AS sk8
  FROM customer
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT sk16) AS BIGINT) AS distinct_sk16,
       CAST(count(*) - count(DISTINCT sk16) AS BIGINT) AS collisions_sk16,
       CAST(count(DISTINCT sk8) AS BIGINT) AS distinct_sk8,
       CAST(count(*) - count(DISTINCT sk8) AS BIGINT) AS collisions_sk8
FROM keyed
"""


@register("etl_surrogate_key_audit", oracle=_SK_ORACLE, tags=("etl", "keys"))
def etl_surrogate_key_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash surrogate keys: derive deterministic dimension keys from
    the natural key (sha256 of the concatenated business columns,
    truncated to 16 and 8 hex chars) and audit the collision count at
    each width — the decision data every warehouse makes when it
    swaps sequence-generated keys for hash keys to get
    order-independent, re-runnable loads (the reason
    `etl_idempotent_reingest` can exist without a key service). Hash
    keys compute map-side with zero coordination — the property that
    matters at 1000 executors, where a sequence generator is a
    bottleneck and monotonically_increasing_id is partition-unstable.
    One projected scan, one distinct-counting aggregate."""
    cust = load_table(spark, sf_dir, "customer")
    h = F.sha2(
        F.concat_ws("|", F.col("c_name"), F.col("c_nationkey").cast("string")), 256
    )
    keyed = cust.select(
        F.substring(h, 1, 16).alias("sk16"), F.substring(h, 1, 8).alias("sk8")
    )
    return keyed.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("sk16").cast("long").alias("distinct_sk16"),
        (F.count(F.lit(1)) - F.countDistinct("sk16")).cast("long").alias(
            "collisions_sk16"
        ),
        F.countDistinct("sk8").cast("long").alias("distinct_sk8"),
        (F.count(F.lit(1)) - F.countDistinct("sk8")).cast("long").alias(
            "collisions_sk8"
        ),
    )


# --------------------------------------------------------------------------
# Inline VALUES code-table join
# --------------------------------------------------------------------------

_SLA_ROWS = [
    ("1-URGENT", 2),
    ("2-HIGH", 5),
    ("3-MEDIUM", 10),
    ("4-NOT SPECIFIED", 21),
    ("5-LOW", 30),
]

_SLA_VALUES_SQL = ", ".join(f"('{p}', {d})" for p, d in _SLA_ROWS)

_CODE_TABLE_ORACLE = f"""
WITH sla(o_orderpriority, sla_days) AS (VALUES {_SLA_VALUES_SQL})
SELECT s.o_orderpriority, CAST(s.sla_days AS BIGINT) AS sla_days,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                    DATE '2001-08-01') > s.sla_days
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_breached
FROM orders o
JOIN sla s ON s.o_orderpriority = o.o_orderpriority
WHERE o.o_orderstatus <> 'F'
GROUP BY s.o_orderpriority, s.sla_days
ORDER BY s.o_orderpriority
"""


@register("join_inline_code_table", oracle=_CODE_TABLE_ORACLE, tags=("relational", "join"))
def join_inline_code_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline code-table join: the SLA-days-per-priority mapping lives
    as literal VALUES in the query itself — the pattern for small
    business rule tables that belong in code review, not in a
    database (every warehouse has dozens: status→bucket,
    code→display, tier→quota). Spark builds the 5-row DataFrame
    driver-side and broadcasts it, so the fact side streams map-side
    with zero shuffle for the join; the open-order SLA-breach count
    is an exact integer date comparison against a fixed audit date.
    The rule: literal dims ride broadcast joins — never a shuffle,
    never a file."""
    od = load_table(spark, sf_dir, "orders")
    sla = spark.createDataFrame(
        _SLA_ROWS, "o_orderpriority string, sla_days long"
    )
    breached = F.sum(
        F.when(
            F.datediff(F.lit("2001-08-01").cast("date"), F.col("o_orderdate").cast("date"))
            > F.col("sla_days"),
            1,
        ).otherwise(0)
    )
    return (
        od.filter(F.col("o_orderstatus") != "F")
        .join(F.broadcast(sla), "o_orderpriority")
        .groupBy("o_orderpriority", "sla_days")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            breached.cast("long").alias("n_breached"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Sliding exact median smoother
# --------------------------------------------------------------------------

_SLIDE_N = 7

_SLIDE_MED_ORACLE = f"""
WITH daily AS (
  SELECT event_type AS symbol, CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
framed AS (
  SELECT symbol, day, cents,
         list_sort(list(cents) OVER (PARTITION BY symbol ORDER BY day
                    ROWS BETWEEN {_SLIDE_N - 1} PRECEDING AND CURRENT ROW)) AS win,
         row_number() OVER (PARTITION BY symbol ORDER BY day) AS rn
  FROM daily
)
SELECT symbol, day, cents,
       CAST(win[(len(win) + 1) // 2] AS BIGINT) AS median_cents
FROM framed
WHERE rn >= {_SLIDE_N}
ORDER BY symbol, day
"""


@register("window_sliding_median", oracle=_SLIDE_MED_ORACLE, tags=("window", "timeseries"), bench=True)
def window_sliding_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding exact median smoother: the {_SLIDE_N}-day rolling LOWER
    median of daily revenue — the robust trend line that ignores
    single-day spikes which drag every rolling MEAN
    (`window_running_frame` et al). Exact sliding medians can't ride
    a mergeable window aggregate, so the frame is materialized as a
    sorted array (collect_list over the frame, array_sort, pick rank
    ceil(n/2)) — O(k log k) per row with k fixed at {_SLIDE_N}, the
    standard exact formulation when the window is small and the
    tie convention must be engine-identical (lower median of exact
    integer cents). One (symbol, day) sort serves the frame collect
    and the warmup row_number."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("symbol"), F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents"))
    w_ord = Window.partitionBy("symbol").orderBy("day")
    w_frame = w_ord.rowsBetween(-(_SLIDE_N - 1), 0)
    framed = daily.select(
        "symbol",
        "day",
        "cents",
        F.array_sort(F.collect_list("cents").over(w_frame)).alias("win"),
        F.row_number().over(w_ord).alias("rn"),
    )
    return (
        framed.filter(F.col("rn") >= _SLIDE_N)
        .select(
            "symbol",
            "day",
            "cents",
            F.element_at("win", F.expr("CAST((size(win) + 1) div 2 AS INT)"))
            .cast("long")
            .alias("median_cents"),
        )
        .orderBy("symbol", "day")
    )
