"""Round-25 analytics, part 35: STL-lite seasonal-trend decomposition
and an explicit join-strategy-hint operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# STL-lite: trend (centered MA) + weekday seasonal + residual
# --------------------------------------------------------------------------

_STL_HALF = 3  # centered 7-day moving average

_STL_ORACLE = f"""
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS close_cents
  FROM events GROUP BY 1, 2
),
trended AS (
  SELECT symbol, day, close_cents,
         CAST(floor(avg(CAST(close_cents AS DOUBLE)) OVER w * 1000 + 0.5) AS BIGINT)
           AS trend_milli,
         row_number() OVER (PARTITION BY symbol ORDER BY day) AS rn,
         count(*) OVER (PARTITION BY symbol) AS n
  FROM closes
  WINDOW w AS (PARTITION BY symbol ORDER BY day
               ROWS BETWEEN {_STL_HALF} PRECEDING AND {_STL_HALF} FOLLOWING)
),
gated AS (
  SELECT symbol, day, close_cents, trend_milli,
         close_cents * 1000 - trend_milli AS detr_milli,
         date_part('dow', day) AS wd
  FROM trended WHERE rn > {_STL_HALF} AND rn <= n - {_STL_HALF}
),
seasonal AS (
  SELECT symbol, wd, CAST(sum(detr_milli) // count(*) AS BIGINT) AS seasonal_milli
  FROM gated GROUP BY symbol, wd
)
SELECT g.symbol, g.day, g.close_cents, g.trend_milli,
       CAST(g.wd AS BIGINT) AS weekday,
       s.seasonal_milli,
       CAST(g.detr_milli - s.seasonal_milli AS BIGINT) AS residual_milli
FROM gated g JOIN seasonal s ON s.symbol = g.symbol AND s.wd = g.wd
ORDER BY g.symbol, g.day
"""


@register("timeseries_stl_decompose", oracle=_STL_ORACLE, tags=("timeseries", "stock"))
def timeseries_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite additive decomposition close = trend + seasonal +
    residual: trend is the centered 7-day moving average (full windows
    only — the row_number gates drop the {_STL_HALF}-day edges where a
    centered frame would silently shrink and bias the trend), the
    seasonal component is the per-(symbol, weekday) mean of the
    detrended series as an EXACT integer floor-division, and the
    residual is what anomaly detectors should consume instead of the
    raw series (bars' weekday rhythm would otherwise dominate any
    z-score — `timeseries_weekday_index` measures that rhythm; this
    removes it). Classic STL loess-iterates; the one-pass MA+means
    variant is the standard engine-side approximation and keeps every
    component integer-exact after one quantized trend division.
    Plan: daily rollup, one symbol-sorted window pass (MA + gates
    share it), one tiny seasonal aggregate joined back broadcast."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("close_cents")
    )
    w_ord = Window.partitionBy("symbol").orderBy("day")
    w_ma = w_ord.rowsBetween(-_STL_HALF, _STL_HALF)
    trended = closes.select(
        "symbol",
        "day",
        "close_cents",
        F.floor(F.avg(F.col("close_cents").cast("double")).over(w_ma) * 1000 + F.lit(0.5))
        .cast("long")
        .alias("trend_milli"),
        F.row_number().over(w_ord).alias("rn"),
        F.count("*").over(Window.partitionBy("symbol")).alias("n"),
    )
    gated = trended.filter(
        (F.col("rn") > _STL_HALF) & (F.col("rn") <= F.col("n") - _STL_HALF)
    ).select(
        "symbol",
        "day",
        "close_cents",
        "trend_milli",
        (F.col("close_cents") * 1000 - F.col("trend_milli")).alias("detr_milli"),
        (F.dayofweek("day") - 1).alias("wd"),
    )
    seasonal = gated.groupBy("symbol", "wd").agg(
        F.expr("CAST(sum(detr_milli) div count(*) AS BIGINT)").alias("seasonal_milli")
    )
    return (
        gated.join(F.broadcast(seasonal), ["symbol", "wd"])
        .select(
            "symbol",
            "day",
            "close_cents",
            "trend_milli",
            F.col("wd").cast("long").alias("weekday"),
            "seasonal_milli",
            (F.col("detr_milli") - F.col("seasonal_milli"))
            .cast("long")
            .alias("residual_milli"),
        )
        .orderBy("symbol", "day")
    )


# --------------------------------------------------------------------------
# Join strategy hints
# --------------------------------------------------------------------------

_HINTS_ORACLE = """
SELECT c.c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY 1
ORDER BY 1
"""


@register("join_strategy_hints", oracle=_HINTS_ORACLE, tags=("join",))
def join_strategy_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit join-strategy override: the customer side carries a
    MERGE hint, forcing a sort-merge join where the optimizer would
    pick broadcast at this size (plan-asserted in
    tests/test_round25_ops.py). The hint surface is how a user pins
    the strategy when statistics mislead the planner — the classic
    case at 100 TB is a "small" dim that is small per partition but
    arrives un-analyzed, or a broadcast that OOMs the driver; MERGE
    (sort-merge) is the safe harbor because it never materializes a
    side in memory. Semantics are hint-independent — the oracle is
    the plain join — which is exactly the point: hints change the
    physical plan only."""
    cust = load_table(spark, sf_dir, "customer").hint("merge")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("total_cents"),
        )
        .orderBy("segment")
    )
