"""Round-84 analytics, part 78: Ichimoku cloud components and
inverse-volatility risk-parity portfolio weights.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Ichimoku cloud (fixture-scaled periods 3/7/14, displacement 7)
# --------------------------------------------------------------------------

_ICH_T = 3   # tenkan (conversion) period
_ICH_K = 7   # kijun (base) period + displacement
_ICH_S = 14  # senkou B period
# periods scale to the fixture's ~30-day calendar (classic 9/26/52 needs
# 78 bars before the first cloud row exists)

_ICHIMOKU_ORACLE = f"""
WITH bars AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(max(value) * 100) AS BIGINT) AS h,
         CAST(round(min(value) * 100) AS BIGINT) AS l,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
-- midlines carried DOUBLED (max+min) so everything stays exact integer;
-- senkou values displace forward {_ICH_K} bars = lag when read at t
lines AS (
  SELECT symbol, day, c,
         row_number() OVER o AS rn,
         max(h) OVER wt + min(l) OVER wt AS tenkan2,
         max(h) OVER wk + min(l) OVER wk AS kijun2,
         max(h) OVER ws + min(l) OVER ws AS senkou_b2_raw
  FROM bars
  WINDOW o AS (PARTITION BY symbol ORDER BY day),
         wt AS (PARTITION BY symbol ORDER BY day
                ROWS BETWEEN {_ICH_T - 1} PRECEDING AND CURRENT ROW),
         wk AS (PARTITION BY symbol ORDER BY day
                ROWS BETWEEN {_ICH_K - 1} PRECEDING AND CURRENT ROW),
         ws AS (PARTITION BY symbol ORDER BY day
                ROWS BETWEEN {_ICH_S - 1} PRECEDING AND CURRENT ROW)
),
shifted AS (
  SELECT symbol, day, c, rn, tenkan2, kijun2,
         lag(tenkan2 + kijun2, {_ICH_K}) OVER w AS senkou_a4,
         lag(senkou_b2_raw, {_ICH_K}) OVER w AS senkou_b2,
         lag(rn, {_ICH_K}) OVER w AS src_rn
  FROM lines
  WINDOW w AS (PARTITION BY symbol ORDER BY day)
)
SELECT symbol, day, c AS close_cents,
       CAST(tenkan2 AS BIGINT) AS tenkan2,
       CAST(kijun2 AS BIGINT) AS kijun2,
       CAST(senkou_a4 AS BIGINT) AS senkou_a4,
       CAST(senkou_b2 AS BIGINT) AS senkou_b2,
       CAST(CASE WHEN 2 * senkou_a4 > 4 * senkou_b2 THEN 1
                 WHEN 2 * senkou_a4 < 4 * senkou_b2 THEN -1
                 ELSE 0 END AS BIGINT) AS cloud_sign
FROM shifted
WHERE src_rn >= {_ICH_S}
ORDER BY symbol, day
"""


@register("bars_ichimoku_cloud", oracle=_ICHIMOKU_ORACLE, tags=("stock", "window"))
def bars_ichimoku_cloud(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ichimoku cloud components (fixture-scaled {_ICH_T}/{_ICH_K}/
    {_ICH_S}): tenkan and kijun are rolling (high+low)/2 midlines,
    senkou A/B displace forward {_ICH_K} bars to form the cloud, and
    cloud_sign says whether the leading span A sits above B (bullish
    cloud) — a multi-window, displaced-window indicator that exercises
    FOUR window frames plus a lag on one (symbol, day) sort. All
    midlines carry doubled (max+min, exact cents; senkou A at 4x) so
    no division ever happens; the cross-scale cloud comparison
    normalizes by cross-multiplying. The warmup gate keys on the
    DISPLACED row number (src_rn) so a row only emits when its cloud
    source had a full {_ICH_S}-bar window. One shuffle after the
    daily rollup; frames are O({_ICH_S}) state at any scale."""
    ev = load_table(spark, sf_dir, "events")
    bars = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.max("value") * 100).cast("long").alias("h"),
        F.round(F.min("value") * 100).cast("long").alias("l"),
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"),
    )
    w_o = Window.partitionBy("symbol").orderBy("day")
    w_t = w_o.rowsBetween(-(_ICH_T - 1), 0)
    w_k = w_o.rowsBetween(-(_ICH_K - 1), 0)
    w_s = w_o.rowsBetween(-(_ICH_S - 1), 0)
    lines = bars.select(
        "symbol",
        "day",
        "c",
        F.row_number().over(w_o).alias("rn"),
        (F.max("h").over(w_t) + F.min("l").over(w_t)).alias("tenkan2"),
        (F.max("h").over(w_k) + F.min("l").over(w_k)).alias("kijun2"),
        (F.max("h").over(w_s) + F.min("l").over(w_s)).alias("senkou_b2_raw"),
    )
    shifted = lines.select(
        "symbol",
        "day",
        "c",
        "tenkan2",
        "kijun2",
        F.lag(F.col("tenkan2") + F.col("kijun2"), _ICH_K).over(w_o).alias("senkou_a4"),
        F.lag("senkou_b2_raw", _ICH_K).over(w_o).alias("senkou_b2"),
        F.lag("rn", _ICH_K).over(w_o).alias("src_rn"),
    )
    return (
        shifted.filter(F.col("src_rn") >= _ICH_S)
        .select(
            "symbol",
            "day",
            F.col("c").alias("close_cents"),
            F.col("tenkan2").cast("long").alias("tenkan2"),
            F.col("kijun2").cast("long").alias("kijun2"),
            F.col("senkou_a4").cast("long").alias("senkou_a4"),
            F.col("senkou_b2").cast("long").alias("senkou_b2"),
            F.when(2 * F.col("senkou_a4") > 4 * F.col("senkou_b2"), 1)
            .when(2 * F.col("senkou_a4") < 4 * F.col("senkou_b2"), -1)
            .otherwise(0)
            .cast("long")
            .alias("cloud_sign"),
        )
        .orderBy("symbol", "day")
    )


# --------------------------------------------------------------------------
# Risk-parity (inverse-volatility) portfolio weights across symbols
# --------------------------------------------------------------------------

_RP_ORACLE = """
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
rets AS (
  SELECT symbol,
         CAST(floor((c - lag(c) OVER w) * 10000.0 / lag(c) OVER w + 0.5)
           AS BIGINT) AS r
  FROM closes WINDOW w AS (PARTITION BY symbol ORDER BY day)
  QUALIFY lag(c) OVER w IS NOT NULL
),
sums AS (
  SELECT symbol, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(r) AS BIGINT) AS sr, CAST(sum(r * r) AS BIGINT) AS srr
  FROM rets GROUP BY symbol
),
-- population sigma = sqrt(n*srr - sr^2) / n; the inverse-vol quantizes
-- to exact integer nano BEFORE the cross-symbol sum, so the allocation
-- is order-free integer arithmetic
inv AS (
  SELECT symbol, n,
         CAST(n * srr - sr * sr AS BIGINT) AS var_n2,
         CAST(floor(1000000000.0 * n / sqrt(CAST(n * srr - sr * sr AS DOUBLE))
                    + 0.5) AS BIGINT) AS inv_nano
  FROM sums
)
SELECT symbol, n AS n_returns, var_n2, inv_nano,
       CAST(inv_nano * 1000000 // (SELECT sum(inv_nano) FROM inv) AS BIGINT)
         AS weight_ppm
FROM inv
ORDER BY symbol
"""


@register("portfolio_risk_parity_weights", oracle=_RP_ORACLE, tags=("stock", "portfolio"))
def portfolio_risk_parity_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-volatility risk-parity weights across the symbol
    universe: w_i = (1/sigma_i) / sum_j (1/sigma_j) — the allocation
    where every sleeve contributes equal standalone risk, the standard
    first rung above equal-weight (`bars_equal_weight_index`) and
    below full covariance optimization (`portfolio_min_variance_pairs`
    handles the 2-asset closed form). Exactness: per-symbol population
    variance comes from exact BIGINT power sums (n*srr - sr^2); the
    single sqrt quantizes each inverse-vol to integer NANO before the
    cross-symbol normalization, so the weight sum is order-free
    integer division — no float accumulation across symbols. Plan:
    one groupBy to per-symbol sums (map-side combinable over the
    tape), one broadcast scalar for the normalizer."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
    w = Window.partitionBy("symbol").orderBy("day")
    prev = F.lag("c").over(w)
    rets = (
        closes.select("symbol", prev.alias("p"), "c")
        .filter(F.col("p").isNotNull())
        .select(
            "symbol",
            F.floor((F.col("c") - F.col("p")) * 10000.0 / F.col("p") + F.lit(0.5))
            .cast("long")
            .alias("r"),
        )
    )
    sums = rets.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r").cast("long").alias("sr"),
        F.sum(F.col("r") * F.col("r")).cast("long").alias("srr"),
    )
    var_n2 = (F.col("n") * F.col("srr") - F.col("sr") * F.col("sr")).cast("long")
    inv = sums.select(
        "symbol",
        "n",
        var_n2.alias("var_n2"),
        F.floor(
            F.lit(1000000000.0) * F.col("n") / F.sqrt(var_n2.cast("double")) + F.lit(0.5)
        )
        .cast("long")
        .alias("inv_nano"),
    )
    total = inv.agg(F.sum("inv_nano").alias("tot"))
    return (
        inv.crossJoin(F.broadcast(total))
        .select(
            "symbol",
            F.col("n").alias("n_returns"),
            "var_n2",
            "inv_nano",
            F.expr("inv_nano * 1000000 div tot").alias("weight_ppm"),
        )
        .orderBy("symbol")
    )
