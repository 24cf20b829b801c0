"""Round-60 analytics, part 59: Dickey-Fuller unit-root test and
Theil's U2 forecast-skill ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Dickey-Fuller test (drift variant, no augmentation lags)
# --------------------------------------------------------------------------

_DF_ORACLE = """
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT symbol, lag(c) OVER w AS x, c - lag(c) OVER w AS d
  FROM closes WINDOW w AS (PARTITION BY symbol ORDER BY day)
  QUALIFY lag(c) OVER w IS NOT NULL
),
sums AS (
  SELECT symbol, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(d) AS HUGEINT) AS sd,
         CAST(sum(x * x) AS HUGEINT) AS sxx, CAST(sum(x * d) AS HUGEINT) AS sxd,
         CAST(sum(d * d) AS HUGEINT) AS sdd
  FROM pairs GROUP BY symbol
),
fit AS (
  SELECT symbol, CAST(n AS BIGINT) AS n_obs,
         CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd_, CAST(sd AS DOUBLE) AS sdd_,
         CAST(sxx AS DOUBLE) AS sxxd, CAST(sxd AS DOUBLE) AS sxdd,
         CAST(sdd AS DOUBLE) AS sddd
  FROM sums
),
beta AS (
  SELECT symbol, n_obs, nd, sxd_, sdd_, sxxd, sxdd, sddd,
         (nd * sxdd - sxd_ * sdd_) / (nd * sxxd - sxd_ * sxd_) AS b
  FROM fit WHERE nd * sxxd > sxd_ * sxd_
),
ffit AS (
  SELECT symbol, n_obs, nd, sxxd, sxd_, b,
         (sdd_ - b * sxd_) / nd AS a,
         sddd + nd * ((sdd_ - b * sxd_) / nd) * ((sdd_ - b * sxd_) / nd)
           + b * b * sxxd
           - 2 * ((sdd_ - b * sxd_) / nd) * sdd_
           - 2 * b * sxdd
           + 2 * ((sdd_ - b * sxd_) / nd) * b * sxd_ AS sse
  FROM beta
)
SELECT symbol, n_obs,
       CAST(floor(b * 1000000000 + 0.5) AS BIGINT) AS beta_e9,
       CAST(floor(b / sqrt(sse / (nd - 2) / (sxxd - sxd_ * sxd_ / nd)) * 10000 + 0.5)
         AS BIGINT) AS df_t_e4
FROM ffit
WHERE sse > 0 AND nd > 2
ORDER BY symbol
"""


@register("stats_dickey_fuller", oracle=_DF_ORACLE, tags=("stats", "timeseries"))
def stats_dickey_fuller(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey-Fuller unit-root test (drift variant): regress the daily
    price CHANGE on the lagged LEVEL and report the t-statistic of
    the level coefficient — the stationarity gate every pairs/mean-
    reversion strategy runs before trusting `timeseries_ou_half_life`
    (whose half-life is meaningless on a unit-root series; DF decides
    IF it mean-reverts, OU says HOW FAST). All regression moments
    (n, Sx, Sd, Sxx, Sxd, Sdd) are exact integer sums; beta, the SSE
    decomposition, and the t-stat are one fixed double expression
    tree, so both engines agree bit-for-bit. Plan: daily rollup, one
    lag window, one per-symbol moment aggregate — the same
    Gram-matrix shape as `ml_ridge_normal_equations`, map-side
    combined at any scale."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
    w = Window.partitionBy("symbol").orderBy("day")
    prev = F.lag("c").over(w)
    pairs = (
        closes.select("symbol", prev.alias("x"), (F.col("c") - prev).alias("d"))
        .filter(F.col("x").isNotNull())
    )
    dec = "decimal(38,0)"
    sums = pairs.groupBy("symbol").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("d").cast(dec).alias("sd"),
        F.sum(F.col("x") * F.col("x")).cast(dec).alias("sxx"),
        F.sum(F.col("x") * F.col("d")).cast(dec).alias("sxd"),
        F.sum(F.col("d") * F.col("d")).cast(dec).alias("sdd"),
    )
    fit = sums.select(
        "symbol",
        F.col("n").cast("long").alias("n_obs"),
        F.col("n").cast("double").alias("nd"),
        F.col("sx").cast("double").alias("sxd_"),
        F.col("sd").cast("double").alias("sdd_"),
        F.col("sxx").cast("double").alias("sxxd"),
        F.col("sxd").cast("double").alias("sxdd"),
        F.col("sdd").cast("double").alias("sddd"),
    )
    b = (F.col("nd") * F.col("sxdd") - F.col("sxd_") * F.col("sdd_")) / (
        F.col("nd") * F.col("sxxd") - F.col("sxd_") * F.col("sxd_")
    )
    beta = fit.filter(
        F.col("nd") * F.col("sxxd") > F.col("sxd_") * F.col("sxd_")
    ).withColumn("b", b)
    a = (F.col("sdd_") - F.col("b") * F.col("sxd_")) / F.col("nd")
    sse = (
        F.col("sddd")
        + F.col("nd") * a * a
        + F.col("b") * F.col("b") * F.col("sxxd")
        - 2 * a * F.col("sdd_")
        - 2 * F.col("b") * F.col("sxdd")
        + 2 * a * F.col("b") * F.col("sxd_")
    )
    full = beta.withColumn("sse", sse)
    t_stat = F.col("b") / F.sqrt(
        F.col("sse") / (F.col("nd") - 2) / (F.col("sxxd") - F.col("sxd_") * F.col("sxd_") / F.col("nd"))
    )
    return (
        full.filter((F.col("sse") > 0) & (F.col("nd") > 2))
        .select(
            "symbol",
            "n_obs",
            F.floor(F.col("b") * 1_000_000_000 + F.lit(0.5)).cast("long").alias("beta_e9"),
            F.floor(t_stat * 10_000 + F.lit(0.5)).cast("long").alias("df_t_e4"),
        )
        .orderBy("symbol")
    )


# --------------------------------------------------------------------------
# Theil's U2: seasonal-naive forecast skill vs the naive benchmark
# --------------------------------------------------------------------------

_U2_SEASON = 7

_U2_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
lagged AS (
  SELECT day, cents,
         lag(cents, 1) OVER (ORDER BY day) AS naive_f,
         lag(cents, {_U2_SEASON}) OVER (ORDER BY day) AS seasonal_f
  FROM daily
  QUALIFY lag(cents, {_U2_SEASON}) OVER (ORDER BY day) IS NOT NULL
),
sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(CAST(seasonal_f - cents AS HUGEINT)
                  * CAST(seasonal_f - cents AS HUGEINT)) AS HUGEINT) AS sse_seasonal,
         CAST(sum(CAST(naive_f - cents AS HUGEINT)
                  * CAST(naive_f - cents AS HUGEINT)) AS HUGEINT) AS sse_naive
  FROM lagged
)
SELECT n_days,
       CAST(floor(sqrt(CAST(sse_seasonal AS DOUBLE) / n_days) + 0.5) AS BIGINT)
         AS rmse_seasonal_cents,
       CAST(floor(sqrt(CAST(sse_naive AS DOUBLE) / n_days) + 0.5) AS BIGINT)
         AS rmse_naive_cents,
       CAST(floor(sqrt(CAST(sse_seasonal AS DOUBLE) / CAST(sse_naive AS DOUBLE))
                  * 1000000 + 0.5) AS BIGINT) AS theil_u2_e6
FROM sums
WHERE sse_naive > 0
"""


@register("forecast_theil_u2", oracle=_U2_ORACLE, tags=("timeseries", "ml"))
def forecast_theil_u2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's U2 for the weekly-seasonal-naive forecast of daily
    revenue: U2 = RMSE(seasonal-naive)/RMSE(naive) — under 1 means
    the {_U2_SEASON}-day seasonal memory genuinely beats "tomorrow =
    today", the zero-parameter skill bar every forecasting pipeline
    must clear before anyone ships a model
    (`forecast_eval_seasonal_naive` reports that forecast's absolute
    errors; U2 NORMALIZES them by the naive benchmark so skill is
    comparable across series). Squared errors are exact integer
    cents; each RMSE and the ratio are single fixed double
    expressions. Both lags ride ONE ordered window over the
    day-grain series. Plan: date-grain aggregate, one window, one
    total aggregate — nothing above day cardinality after the first
    groupBy."""
    od = load_table(spark, sf_dir, "orders")
    daily = od.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("cents")
    )
    w = Window.orderBy("day")
    lagged = (
        daily.select(
            "cents",
            F.lag("cents", 1).over(w).alias("naive_f"),
            F.lag("cents", _U2_SEASON).over(w).alias("seasonal_f"),
        )
        .filter(F.col("seasonal_f").isNotNull())
    )
    dec = "decimal(38,0)"
    # daily revenue cents reach ~1e9; err^2 overflows BIGINT, so square
    # in decimal on both sides
    err_s = (F.col("seasonal_f") - F.col("cents")).cast("decimal(38,0)")
    err_n = (F.col("naive_f") - F.col("cents")).cast("decimal(38,0)")
    sums = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(err_s * err_s).cast(dec).alias("sse_seasonal"),
        F.sum(err_n * err_n).cast(dec).alias("sse_naive"),
    )
    return sums.filter(F.col("sse_naive") > 0).select(
        "n_days",
        F.floor(F.sqrt(F.col("sse_seasonal").cast("double") / F.col("n_days")) + F.lit(0.5))
        .cast("long")
        .alias("rmse_seasonal_cents"),
        F.floor(F.sqrt(F.col("sse_naive").cast("double") / F.col("n_days")) + F.lit(0.5))
        .cast("long")
        .alias("rmse_naive_cents"),
        F.floor(
            F.sqrt(F.col("sse_seasonal").cast("double") / F.col("sse_naive").cast("double"))
            * 1_000_000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("theil_u2_e6"),
    )
