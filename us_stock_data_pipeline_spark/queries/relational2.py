"""Second relational batch: time-series resampling (OHLCV bars),
percentile aggregates, distribution windows, unpivot, and the subquery
family (scalar, correlated, IN) through the SQL path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table, register_views
from us_stock_data_pipeline_spark.registry import register


@register(
    "bars_ohlcv_resample",
    oracle="""
SELECT
  make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS bar_ts,
  event_type                                   AS symbol,
  round(arg_min(value, event_id), 4)           AS open,
  round(max(value), 4)                         AS high,
  round(min(value), 4)                         AS low,
  round(arg_max(value, event_id), 4)           AS close,
  round(sum(value), 2)                         AS volume,
  count(*)                                     AS trades,
  round(sum(value * value) / sum(value), 4)    AS vwap
FROM events
GROUP BY 1, 2
ORDER BY bar_ts, symbol
""",
    tags=("agg", "stock"),
    bench=True,
)
def bars_ohlcv_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stock-native resample: tick-ish events -> 1-hour OHLCV bars per
    symbol in ONE hash aggregate (min_by/max_by give open/close without a
    sort or window). This is the aggregation the reference's whole domain
    revolves around (its upstream API pre-aggregates bars; the engine can
    build them from raw prints). One shuffle keyed (hour, symbol), fully
    partial-aggregatable — the canonical 100 TB rollup. event_id is the
    arrival-order tiebreak (fixture timestamps are not unique per key)."""
    ev = load_table(spark, sf_dir, "events")
    hour = F.timestamp_micros((F.unix_micros("ts") / 3_600_000_000).cast("long") * 3_600_000_000)
    return (
        ev.groupBy(hour.alias("bar_ts"), F.col("event_type").alias("symbol"))
        .agg(
            F.round(F.min_by("value", "event_id"), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", "event_id"), 4).alias("close"),
            F.round(F.sum("value"), 2).alias("volume"),
            F.count(F.lit(1)).alias("trades"),
            F.round(F.sum(F.col("value") * F.col("value")) / F.sum("value"), 4).alias("vwap"),
        )
        .orderBy("bar_ts", "symbol")
    )


@register(
    "agg_percentiles",
    oracle="""
SELECT
  l_returnflag,
  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
  round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
  round(avg(l_extendedprice), 4)                 AS mean,
  round(stddev_samp(l_extendedprice), 4)         AS sd
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("agg",),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (PERCENTILE_CONT semantics ==
    DuckDB quantile_cont) via RANK-BASED BOUNDARY SELECTION instead of
    Spark's `percentile` aggregate: the object-hash aggregate buffers
    every group value in an in-memory map (measured 3.4s at sf0.1);
    the window formulation rides the shuffle's spillable SORT instead
    — row_number + per-group count, keep only the <= 2 boundary rows
    per requested percentile, interpolate from aggregated state
    (measured 2.5s, ~1.4x here; the fixture has only 3 groups so sort
    parallelism is capped at 3 tasks — at real group cardinality the
    gap widens, and unlike the object-hash buffer this spills instead
    of OOMing on a hot group). Same single exchange also carries
    mean/sd as window aggregates; the partial-aggregatable fallback
    remains approx_percentile."""
    li = load_table(spark, sf_dir, "lineitem")
    g, v = "l_returnflag", "l_extendedprice"
    w_all = W.partitionBy(g)
    ranked = li.select(
        g,
        v,
        F.row_number().over(w_all.orderBy(v)).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.avg(v).over(w_all).alias("mean_all"),
        F.stddev_samp(v).over(w_all).alias("sd_all"),
    )
    ps = {"p25": 0.25, "p50": 0.50, "p75": 0.75}
    pos = {k: 1 + p * (F.col("n") - 1) for k, p in ps.items()}
    keep = None
    for k in ps:
        c = (F.col("rn") == F.floor(pos[k])) | (F.col("rn") == F.ceil(pos[k]))
        keep = c if keep is None else (keep | c)
    boundary = ranked.filter(keep)
    agg_cols = [F.max("n").alias("n")]
    for k in ps:
        agg_cols.append(
            F.max(F.when(F.col("rn") == F.floor(pos[k]), F.col(v))).alias(f"{k}_lo")
        )
        agg_cols.append(
            F.max(F.when(F.col("rn") == F.ceil(pos[k]), F.col(v))).alias(f"{k}_hi")
        )
    agg_cols.append(F.round(F.max("mean_all"), 4).alias("mean"))
    agg_cols.append(F.round(F.max("sd_all"), 4).alias("sd"))
    folded = boundary.groupBy(g).agg(*agg_cols)
    out_pct = []
    for k, p in ps.items():
        gpos = 1 + p * (F.col("n") - 1)
        frac = gpos - F.floor(gpos)
        out_pct.append(
            F.round(
                F.col(f"{k}_lo") + frac * (F.col(f"{k}_hi") - F.col(f"{k}_lo")), 4
            ).alias(k)
        )
    return folded.select(g, *out_pct, "mean", "sd").orderBy(g)


@register(
    "window_distribution",
    oracle="""
SELECT
  o_orderkey,
  CAST(ntile(4)      OVER w AS BIGINT) AS quartile,
  round(percent_rank() OVER w, 6)      AS pct_rank,
  round(cume_dist()    OVER w, 6)      AS cume
FROM orders
WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
ORDER BY o_orderkey
""",
    tags=("window",),
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows (ntile / percent_rank / cume_dist) over a
    deterministic total order. Global-window note as in window_lag_lead:
    a single-partition window is only acceptable when the partition is
    bounded; for unbounded data rank against percentile cutoffs instead."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = W.orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    ).orderBy("o_orderkey")


@register(
    "unpivot_long",
    oracle="""
SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS val
FROM lineitem WHERE l_orderkey <= 200
UNION ALL
SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem WHERE l_orderkey <= 200
UNION ALL
SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem WHERE l_orderkey <= 200
ORDER BY l_orderkey, l_linenumber, metric
""",
    tags=("reshape",),
)
def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long) via the native unpivot/melt operator — a
    projection-time Expand, no shuffle, constant cost per row at scale."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    return (
        li.unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_discount", "l_tax"],
            "metric",
            "val",
        )
        .withColumn("metric", F.regexp_replace("metric", "^l_", ""))
        .orderBy("l_orderkey", "l_linenumber", "metric")
    )


@register(
    "subquery_scalar",
    oracle="""
SELECT
  o_orderkey,
  round(o_totalprice, 2) AS totalprice,
  round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 2) AS delta_vs_avg
FROM orders
ORDER BY o_orderkey
""",
    tags=("subquery",),
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery through the SQL path — Catalyst plans
    the 1-row aggregate as a broadcast-reused subquery, the same shape as
    the hand-built broadcast join in etl_incremental_watermark."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT
          o_orderkey,
          round(o_totalprice, 2) AS totalprice,
          round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 2) AS delta_vs_avg
        FROM orders
        ORDER BY o_orderkey
        """
    )


@register(
    "subquery_correlated",
    oracle="""
SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 2) AS totalprice
FROM orders o
WHERE o.o_totalprice > (
  SELECT avg(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
)
ORDER BY o.o_orderkey
""",
    tags=("subquery",),
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: Catalyst decorrelates it into an
    aggregate + join on the correlation key (one shuffle on o_custkey) —
    never a per-row re-execution, which is what makes correlated
    predicates viable at 100 TB."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 2) AS totalprice
        FROM orders o
        WHERE o.o_totalprice > (
          SELECT avg(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
        )
        ORDER BY o.o_orderkey
        """
    )


@register(
    "subquery_in",
    oracle="""
SELECT o_orderkey, o_custkey
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
ORDER BY o_orderkey
""",
    tags=("subquery",),
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (planned as a left-semi join; with a NOT IN twin the
    planner must also handle the null-aware anti-join case — covered by
    join_anti for the EXISTS form)."""
    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        ORDER BY o_orderkey
        """
    )
