"""Round-61 analytics, part 60: bitmap-aggregate distinct counting and
the Kupiec VaR backtest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Bitmap-aggregate exact distinct (Spark 3.5+ bitmap_* functions)
# --------------------------------------------------------------------------

_BITMAP_ORACLE = """
SELECT event_type AS etype,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY event_type
ORDER BY etype
"""


@register("agg_bitmap_distinct", oracle=_BITMAP_ORACLE, tags=("agg", "modern"))
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-user counts computed through Spark's bitmap
    aggregate family (`bitmap_bucket_number` / `bitmap_bit_position`
    / `bitmap_construct_agg` / `bitmap_count`) — the MERGEABLE exact
    alternative to `count(DISTINCT ...)`'s expand-and-shuffle: each
    partition builds a fixed 4KB bitmap per (group, bucket), bitmaps
    OR together associatively (the same re-aggregation property the
    HLL sketch of `agg_hll_native_sketch` has, but EXACT), and the
    final count is a popcount. This is how engines make exact
    distinct cheap on dense integer keys at 100 TB — distinct state
    per group is bounded by key range, not cardinality, and an
    incremental pipeline can store the bitmaps. The oracle is plain
    COUNT(DISTINCT): the bitmap path must be value-identical."""
    ev = load_table(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        F.col("event_type").alias("etype"),
        F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm"),
        F.count(F.lit(1)).cast("long").alias("n_ev"),
    )
    return (
        per_bucket.groupBy("etype")
        .agg(
            F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n_users"),
            F.sum("n_ev").cast("long").alias("n_events"),
        )
        .orderBy("etype")
    )


# --------------------------------------------------------------------------
# Kupiec proportion-of-failures VaR backtest
# --------------------------------------------------------------------------

_KUPIEC_P_PCT = 5  # the VaR confidence complement (95% VaR -> p = 0.05)

_KUPIEC_ORACLE = f"""
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS close_cents
  FROM events GROUP BY 1, 2
),
rets AS (
  SELECT symbol, day,
         CAST(floor((close_cents - lag(close_cents) OVER w) * 10000.0
                    / lag(close_cents) OVER w + 0.5) AS BIGINT) AS ret_bp
  FROM closes WINDOW w AS (PARTITION BY symbol ORDER BY day)
  QUALIFY lag(close_cents) OVER w IS NOT NULL
),
ranked AS (
  SELECT symbol, ret_bp,
         row_number() OVER (PARTITION BY symbol ORDER BY ret_bp) AS rn,
         CAST(count(*) OVER (PARTITION BY symbol) AS BIGINT) AS n
  FROM rets
),
var_cut AS (
  SELECT symbol, n,
         max(CASE WHEN rn = greatest(1, CAST(ceil(n * {_KUPIEC_P_PCT} / 100.0)
                                             AS BIGINT))
                  THEN ret_bp END) AS var_bp
  FROM ranked GROUP BY symbol, n
),
viol AS (
  SELECT r.symbol, v.n, v.var_bp,
         CAST(sum(CASE WHEN r.ret_bp < v.var_bp THEN 1 ELSE 0 END) AS BIGINT) AS x
  FROM rets r JOIN var_cut v ON v.symbol = r.symbol
  GROUP BY r.symbol, v.n, v.var_bp
)
SELECT symbol, n AS n_days, var_bp, x AS n_violations,
       CAST(floor(
         -2.0 * ( (n - x) * ln(1.0 - {_KUPIEC_P_PCT} / 100.0)
                  + x * ln({_KUPIEC_P_PCT} / 100.0)
                  - (n - x) * ln(CASE WHEN x = n THEN 1.0
                                      ELSE 1.0 - CAST(x AS DOUBLE) / n END)
                  - x * ln(CASE WHEN x = 0 THEN 1.0
                                ELSE CAST(x AS DOUBLE) / n END) )
         * 10000 + 0.5) AS BIGINT) AS kupiec_lr_e4
FROM viol
ORDER BY symbol
"""


@register("stats_kupiec_var_backtest", oracle=_KUPIEC_ORACLE, tags=("stats", "stock"))
def stats_kupiec_var_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kupiec proportion-of-failures backtest of the historical 95%
    VaR: count days the return breached the VaR cut (STRICTLY below
    the k-th order statistic — the statistic itself is not a breach)
    and report the likelihood-ratio LR = -2 ln[ L(p) / L(x/n) ],
    chi-square(1) under correct coverage — the regulatory (Basel)
    test that decides whether `bars_var_expected_shortfall`'s VaR
    can be trusted. Degenerate x=0 / x=n branches pin 0*ln(0) to 0
    identically in both engines. Counts and the VaR cut are
    rank-exact integers; the LR is one fixed double expression
    quantized at 1e-4. Plan: the same daily-return window as the
    VaR op, one rank window, a symbol-grain join + aggregate."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("close_cents")
    )
    w = Window.partitionBy("symbol").orderBy("day")
    prev = F.lag("close_cents").over(w)
    rets = (
        closes.select("symbol", prev.alias("prev_c"), F.col("close_cents").alias("c"))
        .filter(F.col("prev_c").isNotNull())
        .select(
            "symbol",
            F.floor((F.col("c") - F.col("prev_c")) * 10000.0 / F.col("prev_c") + F.lit(0.5))
            .cast("long")
            .alias("ret_bp"),
        )
    )
    w_rank = Window.partitionBy("symbol").orderBy("ret_bp")
    w_all = Window.partitionBy("symbol")
    ranked = rets.select(
        "symbol",
        "ret_bp",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n"),
    )
    k = F.greatest(F.lit(1).cast("long"), F.ceil(F.col("n") * _KUPIEC_P_PCT / 100.0))
    var_cut = ranked.groupBy("symbol", "n").agg(
        F.max(F.when(F.col("rn") == k, F.col("ret_bp"))).alias("var_bp")
    )
    viol = (
        rets.join(var_cut, "symbol")
        .groupBy("symbol", "n", "var_bp")
        .agg(
            F.sum(F.when(F.col("ret_bp") < F.col("var_bp"), 1).otherwise(0))
            .cast("long")
            .alias("x")
        )
    )
    p = _KUPIEC_P_PCT / 100.0
    xn = F.col("x").cast("double") / F.col("n")
    lr = -2.0 * (
        (F.col("n") - F.col("x")) * F.log(F.lit(1.0 - p))
        + F.col("x") * F.log(F.lit(p))
        - (F.col("n") - F.col("x"))
        * F.log(F.when(F.col("x") == F.col("n"), F.lit(1.0)).otherwise(1.0 - xn))
        - F.col("x") * F.log(F.when(F.col("x") == 0, F.lit(1.0)).otherwise(xn))
    )
    return viol.select(
        "symbol",
        F.col("n").alias("n_days"),
        "var_bp",
        F.col("x").alias("n_violations"),
        F.floor(lr * 10_000 + F.lit(0.5)).cast("long").alias("kupiec_lr_e4"),
    ).orderBy("symbol")
