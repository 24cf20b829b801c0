"""Relational surface, part 4: bucketed co-located joins, hypertable-style
multi-granularity time rollups, bitwise scalars, and ordered collect
aggregation.

The bucketed join is the flagship scale technique here: pre-shuffling
both sides of a recurring join into the same bucket layout at write time
makes every subsequent join exchange-free — the 100 TB answer to "this
join runs every hour on the same keys".
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Bucketed co-located join
# --------------------------------------------------------------------------

_BUCKETED_ORACLE = """
SELECT
  o_orderstatus,
  count(*)                      AS n_lineitems,
  round(sum(l_quantity), 2)     AS total_qty
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write lineitem+orders as tables bucketed by the join key, once per
    sf_dir. Bucketing pre-applies the join's hash partitioning at write
    time; reads then carry a hashpartitioning output that lets the
    planner elide both exchanges (and the sort, within bucket files)."""
    import shutil
    from urllib.parse import urlparse

    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    li_tbl, o_tbl = f"li_bkt_{key}", f"o_bkt_{key}"
    existing = {t.name for t in spark.catalog.listTables()}
    # The default catalog is session-scoped but warehouse directories
    # persist: a table absent from THIS session's catalog may still have a
    # stale location on disk from a prior session — clear it before the
    # managed-table write (bucket metadata lives in the catalog, so the
    # files alone are not reusable).
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for tbl in (li_tbl, o_tbl):
        if tbl not in existing:
            shutil.rmtree(f"{wh}/{tbl}", ignore_errors=True)
    if li_tbl not in existing:
        (
            load_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_quantity")
            .write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(li_tbl)
        )
    if o_tbl not in existing:
        (
            load_table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderstatus")
            .write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(o_tbl)
        )
    return li_tbl, o_tbl


@register("join_bucketed_colocated", oracle=_BUCKETED_ORACLE, tags=("join", "bucketing"))
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exchange-free fact-fact join via bucketed tables: both sides were
    written `bucketBy(8, key)`, so their on-disk layout IS the join's
    hash partitioning and the SortMergeJoin runs with zero shuffles
    (asserted in tests/test_new_ops.py). At 100 TB this converts the
    nightly lineitem x orders shuffle — the single biggest network event
    in a warehouse — into a map-side merge. The broadcast-threshold conf
    is not touched; bucket co-location, not size, removes the exchange."""
    li_tbl, o_tbl = _bucketed_tables(spark, sf_dir)
    li = spark.table(li_tbl)
    # The merge hint pins the SortMergeJoin path: at toy scale the planner
    # would broadcast the small side instead and never exercise bucket
    # co-location (at 100 TB neither side is broadcastable and SMJ is what
    # the planner picks on its own).
    orders = spark.table(o_tbl).hint("merge")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# Hypertable-style multi-granularity rollup
# --------------------------------------------------------------------------


@register(
    "rollup_time_multigrain",
    oracle="""
SELECT grain, g_ts, event_type, n_events, total_value FROM (
  SELECT 'hour' AS grain, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS g_ts, event_type,
         count(*) AS n_events, round(sum(value), 2) AS total_value
  FROM events GROUP BY 2, 3
  UNION ALL
  SELECT 'day', CAST(date_trunc('day', ts) AS TIMESTAMP), event_type,
         count(*), round(sum(value), 2)
  FROM events GROUP BY 2, 3
  UNION ALL
  SELECT 'week', CAST(date_trunc('week', ts) AS TIMESTAMP), event_type,
         count(*), round(sum(value), 2)
  FROM events GROUP BY 2, 3
)
ORDER BY grain, g_ts, event_type
""",
    tags=("agg", "timeseries"),
)
def rollup_time_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate build: hour/day/week rollups
    of the event stream in ONE job. The hour grain aggregates the raw
    table; day and week CASCADE from the hour partials (re-aggregating
    ~24x/168x fewer rows) — the standard materialized-rollup maintenance
    shape. At 100 TB the hour aggregate is the only pass over raw data;
    coarser grains are nearly free, and each level lands in its own
    partition of the rollup table for partition-pruned reads."""
    ev = load_table(spark, sf_dir, "events")
    hour = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("g_ts"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
    )
    # day/week re-aggregate the hour partials, not the raw events
    day = (
        hour.groupBy(F.date_trunc("day", "g_ts").alias("g_ts"), "event_type")
        .agg(F.sum("n_events").alias("n_events"), F.sum("sum_value").alias("sum_value"))
    )
    week = (
        day.groupBy(F.date_trunc("week", "g_ts").alias("g_ts"), "event_type")
        .agg(F.sum("n_events").alias("n_events"), F.sum("sum_value").alias("sum_value"))
    )

    def fin(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            "g_ts",
            "event_type",
            "n_events",
            F.round("sum_value", 2).alias("total_value"),
        )

    return (
        fin(hour, "hour")
        .unionByName(fin(day, "day"))
        .unionByName(fin(week, "week"))
        .orderBy("grain", "g_ts", "event_type")
    )


# --------------------------------------------------------------------------
# Bitwise scalar battery
# --------------------------------------------------------------------------


@register(
    "scalar_bitwise",
    oracle="""
SELECT
  event_id,
  event_id & 255                   AS low_byte,
  event_id | 4096                  AS with_flag,
  xor(event_id, user_id)           AS xored,
  event_id << 2                    AS shl2,
  event_id >> 3                    AS shr3,
  CAST(bit_count(event_id) AS INT) AS popcount
FROM events
WHERE event_id < 2000
ORDER BY event_id
""",
    tags=("scalar", "bitwise"),
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar battery (and/or/xor/shifts/popcount) — the flag-mask
    and hash-mixing primitives every fingerprinting/bucketing pipeline
    leans on. All JVM codegen expressions."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("event_id").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("event_id").bitwiseXOR(F.col("user_id")).alias("xored"),
        F.shiftleft("event_id", 2).alias("shl2"),
        F.shiftright("event_id", 3).alias("shr3"),
        F.bit_count("event_id").alias("popcount"),
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# Ordered collect aggregation
# --------------------------------------------------------------------------


@register(
    "agg_collect_sorted",
    oracle="""
SELECT
  o_custkey,
  array_to_string(list(o_orderkey ORDER BY o_orderkey), ',')                AS order_ids,
  array_to_string(list(DISTINCT o_orderstatus ORDER BY o_orderstatus), ',') AS statuses
FROM orders
WHERE o_custkey < 100
GROUP BY o_custkey
ORDER BY o_custkey
""",
    tags=("agg", "array"),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect-to-array aggregation with deterministic ordering:
    collect_list is order-nondeterministic under parallel merge, so a
    stable pipeline ALWAYS wraps it in array_sort (this is the
    denormalize-for-serving step — one row per customer with their order
    history embedded). Bounded-size groups only; an unbounded collect is
    an OOM, not an operator.

    Compared columns are the arrays serialized to CSV strings
    (concat_ws / array_to_string on the two sides) so the driver's
    pandas-based canonicalizer never has to hash a raw array cell."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("o_orderkey"))).alias("order_ids"),
            F.concat_ws(",", F.array_sort(F.collect_set("o_orderstatus"))).alias("statuses"),
        )
        .orderBy("o_custkey")
    )


# --------------------------------------------------------------------------
# Technical indicators over resampled bars
# --------------------------------------------------------------------------


@register(
    "bars_technical_indicators",
    oracle="""
WITH bars AS (
  SELECT
    make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS bar_ts,
    event_type AS symbol,
    arg_max(value, event_id) AS close
  FROM events
  GROUP BY 1, 2
)
SELECT
  symbol,
  bar_ts,
  round(close, 4) AS close,
  round(avg(close) OVER w5, 4) AS sma5,
  round(CASE WHEN count(*) OVER w5 >= 2 THEN stddev_samp(close) OVER w5 END, 4) AS vol5,
  round(close / lag(close) OVER wp - 1, 6) AS pct_return,
  round(max(close) OVER wrun, 4) AS run_high
FROM bars
WINDOW
  wp   AS (PARTITION BY symbol ORDER BY bar_ts),
  w5   AS (PARTITION BY symbol ORDER BY bar_ts ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
  wrun AS (PARTITION BY symbol ORDER BY bar_ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY symbol, bar_ts
""",
    tags=("window", "stock"),
)
def bars_technical_indicators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Technical-indicator sweep over resampled bars: 5-bar SMA, 5-bar
    rolling volatility, bar-over-bar return, running high — the standard
    signal block downstream of the reference's ingested bars. One shuffle
    on symbol serves ALL FOUR window frames (same partitioning, same
    sort); the bar build beneath is the one-pass OHLCV hash aggregate.
    At 100 TB add the time bucket to the partition key to bound any one
    symbol's window state."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    hour = F.timestamp_micros((F.unix_micros("ts") / 3_600_000_000).cast("long") * 3_600_000_000)
    bars = (
        ev.groupBy(hour.alias("bar_ts"), F.col("event_type").alias("symbol"))
        .agg(F.max_by("value", "event_id").alias("close"))
    )
    wp = W.partitionBy("symbol").orderBy("bar_ts")
    w5 = wp.rowsBetween(-4, 0)
    wrun = wp.rowsBetween(W.unboundedPreceding, 0)
    return bars.select(
        "symbol",
        "bar_ts",
        F.round("close", 4).alias("close"),
        F.round(F.avg("close").over(w5), 4).alias("sma5"),
        F.round(
            F.when(F.count(F.lit(1)).over(w5) >= 2, F.stddev_samp("close").over(w5)), 4
        ).alias("vol5"),
        F.round(F.col("close") / F.lag("close").over(wp) - 1, 6).alias("pct_return"),
        F.round(F.max("close").over(wrun), 4).alias("run_high"),
    ).orderBy("symbol", "bar_ts")


# --------------------------------------------------------------------------
# Histogram aggregation
# --------------------------------------------------------------------------


@register(
    "agg_histogram",
    oracle="""
SELECT
  CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
  CAST(floor(o_totalprice / 50000) AS BIGINT) * 50000 AS bucket_lo,
  count(*) AS n,
  round(avg(o_totalprice), 2) AS mean_in_bucket
FROM orders
GROUP BY 1, 2
ORDER BY bucket
""",
    tags=("agg", "stats"),
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram as a groupBy on the bucket expression — the
    distribution profile at corpus scale. One partial-aggregatable shuffle
    of O(buckets); contrast with exact percentiles (per-group sort). The
    equal-width bucket id is a pure expression, so the scan prunes to one
    column and the whole thing codegens."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000).cast("long")
    return (
        orders.groupBy(bucket.alias("bucket"), (bucket * 50000).alias("bucket_lo"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("o_totalprice"), 2).alias("mean_in_bucket"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# Filtered (conditional) aggregation
# --------------------------------------------------------------------------


@register(
    "agg_conditional_filter",
    oracle="""
SELECT
  l_returnflag,
  count(*) FILTER (l_quantity >= 25)                          AS n_bulk,
  count(*) FILTER (l_quantity < 25)                           AS n_small,
  round(sum(l_extendedprice) FILTER (l_discount > 0.05), 2)   AS rev_discounted,
  round(sum(l_extendedprice) FILTER (l_discount <= 0.05), 2)  AS rev_full_price,
  round(avg(l_tax) FILTER (l_returnflag = 'R'), 6)            AS avg_tax_returned
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("agg",),
)
def agg_conditional_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregation (SQL FILTER clause): several conditional
    metrics in ONE pass over the fact table — the alternative is N
    self-joined subqueries, N scans. Spark expresses FILTER as
    agg(when(cond, x)): count ignores nulls, so count(when(...)) and
    sum(when(...)) are exact FILTER equivalents, all partial-aggregatable
    in the same single shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.when(F.col("l_quantity") >= 25, 1)).alias("n_bulk"),
            F.count(F.when(F.col("l_quantity") < 25, 1)).alias("n_small"),
            F.round(
                F.sum(F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))), 2
            ).alias("rev_discounted"),
            F.round(
                F.sum(F.when(F.col("l_discount") <= 0.05, F.col("l_extendedprice"))), 2
            ).alias("rev_full_price"),
            F.round(
                F.avg(F.when(F.col("l_returnflag") == "R", F.col("l_tax"))), 6
            ).alias("avg_tax_returned"),
        )
        .orderBy("l_returnflag")
    )
