"""Round-42 analytics, part 47: the volume profile (price-level
histogram + point of control)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Volume profile + point of control
# --------------------------------------------------------------------------

_VP_BUCKET_CENTS = 500  # $5 price buckets

_VP_ORACLE = f"""
WITH trades AS (
  SELECT event_type AS symbol,
         CAST(round(value * 100) AS BIGINT) // {_VP_BUCKET_CENTS} AS price_bucket,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
profile AS (
  SELECT symbol, price_bucket,
         CAST(count(*) AS BIGINT) AS n_trades,
         CAST(sum(cents) AS BIGINT) AS traded_cents
  FROM trades GROUP BY symbol, price_bucket
),
ranked AS (
  SELECT symbol, price_bucket, n_trades, traded_cents,
         row_number() OVER (PARTITION BY symbol
                            ORDER BY traded_cents DESC, price_bucket) AS rk,
         CAST(sum(traded_cents) OVER (PARTITION BY symbol) AS BIGINT) AS sym_cents
  FROM profile
)
SELECT symbol, price_bucket, n_trades, traded_cents,
       CASE WHEN rk = 1 THEN 1 ELSE 0 END AS is_poc,
       CAST(traded_cents * 1000000 // sym_cents AS BIGINT) AS share_e6
FROM ranked
ORDER BY symbol, price_bucket
"""


@register("bars_volume_profile", oracle=_VP_ORACLE, tags=("stock", "agg"))
def bars_volume_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume profile: traded value histogrammed by PRICE level
    (${_VP_BUCKET_CENTS // 100} buckets) instead of by time — where
    did the market actually transact? — with the point of control
    (the highest-volume bucket, the price the market 'accepts') and
    each bucket's exact share. Support/resistance levels, fair-value
    gaps, and volume-weighted stop placement all read off this
    histogram; it is the orthogonal axis to every time-bucketed bar
    operator in the repo. Exact integers end to end (floor-div
    bucketing, integer shares, deterministic POC tie to the lower
    bucket). One hash aggregate plus a per-symbol rank — the
    cheapest operator in the stock family, and at 100 TB the profile
    table is symbols x price-levels, always tiny."""
    trades = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("symbol"),
        F.expr(f"CAST(round(value * 100) AS BIGINT) div {_VP_BUCKET_CENTS}").alias(
            "price_bucket"
        ),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    profile = trades.groupBy("symbol", "price_bucket").agg(
        F.count("*").cast("long").alias("n_trades"),
        F.sum("cents").cast("long").alias("traded_cents"),
    )
    w_rank = Window.partitionBy("symbol").orderBy(
        F.col("traded_cents").desc(), "price_bucket"
    )
    w_sym = Window.partitionBy("symbol")
    ranked = profile.select(
        "symbol",
        "price_bucket",
        "n_trades",
        "traded_cents",
        F.row_number().over(w_rank).alias("rk"),
        F.sum("traded_cents").over(w_sym).cast("long").alias("sym_cents"),
    )
    return ranked.select(
        "symbol",
        "price_bucket",
        "n_trades",
        "traded_cents",
        F.when(F.col("rk") == 1, 1).otherwise(0).alias("is_poc"),
        F.expr("CAST(traded_cents * 1000000 div sym_cents AS BIGINT)").alias(
            "share_e6"
        ),
    ).orderBy("symbol", "price_bucket")
