"""Round-29 analytics, part 39: chained equal-weight index construction
— the benchmark-series builder, chained exactly in log space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

_SCALE = 1_000_000

_INDEX_ORACLE = f"""
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS close_cents
  FROM events GROUP BY 1, 2
),
rets AS (
  SELECT symbol, day,
         CAST(floor(ln(CAST(close_cents AS DOUBLE)
                       / CAST(lag(close_cents) OVER w AS DOUBLE))
                    * {_SCALE} + 0.5) AS BIGINT) AS r
  FROM closes
  WINDOW w AS (PARTITION BY symbol ORDER BY day)
),
mkt AS (
  SELECT day, CAST(sum(r) // count(*) AS BIGINT) AS m
  FROM rets WHERE r IS NOT NULL GROUP BY day
),
chained AS (
  SELECT day, m,
         CAST(sum(m) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS log_index_e6
  FROM mkt
)
SELECT day, m AS mkt_logret_e6, log_index_e6,
       CAST(floor(exp(CAST(log_index_e6 AS DOUBLE) / {_SCALE}) * 100 * 1000
                  + 0.5) AS BIGINT) AS index_milli,
       CASE WHEN log_index_e6 >= 0 THEN 1 ELSE 0 END AS above_base
FROM chained
ORDER BY day
"""


@register("bars_equal_weight_index", oracle=_INDEX_ORACLE, tags=("stock", "timeseries"))
def bars_equal_weight_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained equal-weight index, base 100: the market's daily return
    is the exact integer mean of per-symbol 1e-6 log returns, and the
    index CHAINS IN LOG SPACE — a running integer sum, which is where
    multiplicative chaining becomes exact and overflow-proof (a
    fixed-point product recursion either floors each step, making the
    result order-path-dependent, or overflows when a synthetic tape
    compounds hard; the log chain is a plain window cumsum of exact
    BIGINTs). The displayed level exponentiates ONCE per day from the
    exact log state — one identical double expression per engine —
    so the chain itself never accumulates float error. Plan: daily
    rollup, lag, a day-grain market table, one ordered window over
    O(days) rows; only the first rollup touches the fact table."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("close_cents")
    )
    w = Window.partitionBy("symbol").orderBy("day")
    rets = closes.select(
        "symbol",
        "day",
        F.floor(
            F.log(
                F.col("close_cents").cast("double")
                / F.lag("close_cents").over(w).cast("double")
            )
            * _SCALE
            + F.lit(0.5)
        )
        .cast("long")
        .alias("r"),
    ).filter(F.col("r").isNotNull())
    mkt = rets.groupBy("day").agg(
        F.expr("CAST(sum(r) div count(*) AS BIGINT)").alias("m")
    )
    w_chain = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    chained = mkt.select(
        "day",
        "m",
        F.sum("m").over(w_chain).cast("long").alias("log_index_e6"),
    )
    return chained.select(
        "day",
        F.col("m").alias("mkt_logret_e6"),
        "log_index_e6",
        F.floor(
            F.exp(F.col("log_index_e6").cast("double") / _SCALE) * 100 * 1000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("index_milli"),
        F.when(F.col("log_index_e6") >= 0, 1).otherwise(0).alias("above_base"),
    ).orderBy("day")
