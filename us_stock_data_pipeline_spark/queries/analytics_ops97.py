"""Round-105 analytics, part 97: trend/seasonal strength indices and
Bartlett's variance-homogeneity test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Trend & seasonal strength (Hyndman feature-based decomposition)
# --------------------------------------------------------------------------

_STRENGTH_ORACLE = """
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT symbol, day, c,
         row_number() OVER (PARTITION BY symbol ORDER BY day) AS i,
         CAST(dayofweek(day) AS BIGINT) AS dow
  FROM closes
),
-- trend: per-symbol OLS line; seasonal: per-(symbol, weekday) mean of the
-- detrended series. All components quantize to integer milli-cents per
-- row BEFORE the variance sums, so every aggregate is order-free.
fit AS (
  SELECT symbol, CAST(count(*) AS BIGINT) AS n,
         (CAST(count(*) AS DOUBLE) * sum(i * c) - CAST(sum(i) AS DOUBLE) * sum(c))
           / (CAST(count(*) AS DOUBLE) * sum(i * i) - CAST(sum(i) AS DOUBLE) * sum(i))
           AS b,
         (CAST(sum(c) AS DOUBLE)
          - (CAST(count(*) AS DOUBLE) * sum(i * c) - CAST(sum(i) AS DOUBLE) * sum(c))
            / (CAST(count(*) AS DOUBLE) * sum(i * i) - CAST(sum(i) AS DOUBLE) * sum(i))
            * sum(i)) / count(*) AS a
  FROM idx GROUP BY symbol
),
detr AS (
  SELECT i.symbol, i.i, i.dow,
         CAST(floor((i.c - (f.a + f.b * i.i)) * 1000 + 0.5) AS BIGINT) AS d_m
  FROM idx i JOIN fit f ON f.symbol = i.symbol
),
seas AS (
  SELECT symbol, dow, CAST(sum(d_m) // count(*) AS BIGINT) AS s_m
  FROM detr GROUP BY symbol, dow
),
resid AS (
  SELECT d.symbol, d.d_m, d.d_m - s.s_m AS r_m
  FROM detr d JOIN seas s ON s.symbol = d.symbol AND s.dow = d.dow
),
vars_ AS (
  SELECT symbol, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(d_m * d_m) AS BIGINT) AS sdd, CAST(sum(d_m) AS BIGINT) AS sd,
         CAST(sum(r_m * r_m) AS BIGINT) AS srr, CAST(sum(r_m) AS BIGINT) AS sr
  FROM resid GROUP BY symbol
)
SELECT symbol, n AS n_days,
       -- F_seasonal = max(0, 1 - var(resid)/var(detrended)), micro
       CAST(floor(greatest(0.0,
           1 - (CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) * sr / n)
               / (CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * sd / n)) * 1000000
           + 0.5) AS BIGINT) AS seasonal_strength_micro,
       CAST(sdd AS BIGINT) AS detrended_ss, CAST(srr AS BIGINT) AS residual_ss
FROM vars_
ORDER BY symbol
"""


@register("timeseries_strength_indices", oracle=_STRENGTH_ORACLE, tags=("timeseries", "stats"))
def timeseries_strength_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-strength index per symbol (Hyndman's feature-based
    measure): detrend with the OLS line, estimate the weekday
    component as per-weekday means, and report F_seasonal = max(0,
    1 - Var(remainder)/Var(detrended)) — the [0,1] score that says
    how much of the non-trend variation the weekly cycle explains,
    THE feature used to route series to seasonal vs non-seasonal
    forecasters (`timeseries_weekday_index` reports the profile;
    this scores its explanatory power, gating whether Holt-Winters
    or plain Holt should run). Exactness: detrended values quantize
    to integer milli-cents per row; the weekday means use truncating
    integer division; both variance computations are exact BIGINT
    power sums assembled once in pinned DOUBLE. Plan: two aggregates
    and two broadcast joins over the daily rollup — no window at
    all."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
    w = Window.partitionBy("symbol").orderBy("day")
    idx = closes.select(
        "symbol",
        "c",
        F.row_number().over(w).alias("i"),
        F.dayofweek("day").cast("long").alias("dow"),
    )
    sums = idx.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("i").cast("long").alias("sx"),
        F.sum("c").cast("long").alias("sy"),
        F.sum(F.col("i") * F.col("i")).cast("long").alias("sxx"),
        F.sum(F.col("i") * F.col("c")).cast("long").alias("sxy"),
    )
    nD = F.col("n").cast("double")
    b = (nD * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        nD * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    a = (F.col("sy").cast("double") - b * F.col("sx")) / F.col("n")
    fit = sums.select("symbol", a.alias("a"), b.alias("b"))
    detr = idx.join(F.broadcast(fit), "symbol").select(
        "symbol",
        "dow",
        F.floor((F.col("c") - (F.col("a") + F.col("b") * F.col("i"))) * 1000 + F.lit(0.5))
        .cast("long")
        .alias("d_m"),
    )
    seas = detr.groupBy("symbol", "dow").agg(
        F.expr("sum(d_m) div count(*)").cast("long").alias("s_m")
    )
    resid = detr.join(F.broadcast(seas), ["symbol", "dow"]).select(
        "symbol", "d_m", (F.col("d_m") - F.col("s_m")).alias("r_m")
    )
    vars_ = resid.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("d_m") * F.col("d_m")).cast("long").alias("sdd"),
        F.sum("d_m").cast("long").alias("sd"),
        F.sum(F.col("r_m") * F.col("r_m")).cast("long").alias("srr"),
        F.sum("r_m").cast("long").alias("sr"),
    )
    var_d = F.col("sdd").cast("double") - F.col("sd").cast("double") * F.col("sd") / F.col("n")
    var_r = F.col("srr").cast("double") - F.col("sr").cast("double") * F.col("sr") / F.col("n")
    return vars_.select(
        "symbol",
        F.col("n").alias("n_days"),
        F.floor(F.greatest(F.lit(0.0), 1 - var_r / var_d) * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("seasonal_strength_micro"),
        F.col("sdd").alias("detrended_ss"),
        F.col("srr").alias("residual_ss"),
    ).orderBy("symbol")


# --------------------------------------------------------------------------
# Bartlett's test for variance homogeneity across segments
# --------------------------------------------------------------------------

_BARTLETT_ORACLE = """
WITH pts AS (
  SELECT c.c_mktsegment AS seg,
         CAST(round(o.o_totalprice * 100) AS BIGINT) // 100 AS v
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
),
sums AS (
  SELECT seg, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS s,
         CAST(sum(v * v) AS BIGINT) AS ss
  FROM pts GROUP BY seg
),
-- per-group sample variance and its quantized log term; terms quantize
-- micro BEFORE the cross-group sums so aggregation is order-free
terms AS (
  SELECT seg, n,
         (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1) AS var_i,
         CAST(floor((n - 1) * ln((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                                 / (n - 1)) * 1000000 + 0.5) AS BIGINT)
           AS nlnv_micro,
         CAST(floor((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) * 1000 + 0.5)
           AS BIGINT) AS ssq_milli
  FROM sums
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nn,
         CAST(sum(nlnv_micro) AS BIGINT) AS sum_nlnv,
         CAST(sum(ssq_milli) AS BIGINT) AS pooled_ssq_milli,
         CAST(sum(CAST(floor(1000000000.0 / (n - 1) + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_inv_nano
  FROM terms
)
SELECT k AS n_groups, nn AS n_rows,
       -- T = ((N-k) ln s_p^2 - sum (n_i-1) ln s_i^2) / C with
       -- C = 1 + (sum 1/(n_i-1) - 1/(N-k)) / (3(k-1))
       CAST(floor((
         (nn - k) * ln(CAST(pooled_ssq_milli AS DOUBLE) / 1000 / (nn - k))
         - CAST(sum_nlnv AS DOUBLE) / 1000000
       ) / (1 + (CAST(sum_inv_nano AS DOUBLE) / 1000000000
                 - 1.0 / (nn - k)) / (3 * (k - 1)))
       * 1000 + 0.5) AS BIGINT) AS bartlett_t_milli
FROM tot
"""


@register("stats_bartlett_test", oracle=_BARTLETT_ORACLE, tags=("stats",))
def stats_bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test for equal variances across market segments:
    T = ((N-k) ln s_pooled^2 - sum (n_i - 1) ln s_i^2) / C — the
    likelihood-ratio variance-homogeneity test, more powerful than
    Brown-Forsythe (`stats_brown_forsythe`) under normality and the
    classic pre-check before pooled-variance ANOVA
    (`stats_anova_oneway` assumes what this verifies). Exactness:
    per-group (n-1) ln s^2 terms, pooled sums of squares, and the
    1/(n_i - 1) correction terms each quantize to integers BEFORE the
    cross-group sums, so the distributed aggregation is order-free;
    one pinned assembly produces the statistic. Plan: one two-level
    aggregate over the fact join — map-side combinable, k rows of
    state."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    pts = c.join(o, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100").alias("v"),
    )
    sums = pts.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("ss"),
    )
    cs = F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n")
    terms = sums.select(
        "n",
        F.floor((F.col("n") - 1) * F.log(cs / (F.col("n") - 1)) * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("nlnv_micro"),
        F.floor(cs * 1000 + F.lit(0.5)).cast("long").alias("ssq_milli"),
        F.floor(F.lit(1000000000.0) / (F.col("n") - 1) + F.lit(0.5))
        .cast("long")
        .alias("inv_nano"),
    )
    tot = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum("nlnv_micro").cast("long").alias("sum_nlnv"),
        F.sum("ssq_milli").cast("long").alias("pooled_ssq_milli"),
        F.sum("inv_nano").cast("long").alias("sum_inv_nano"),
    )
    t_stat = (
        (F.col("nn") - F.col("k"))
        * F.log(F.col("pooled_ssq_milli").cast("double") / 1000 / (F.col("nn") - F.col("k")))
        - F.col("sum_nlnv").cast("double") / 1000000
    ) / (
        1
        + (F.col("sum_inv_nano").cast("double") / 1000000000 - 1.0 / (F.col("nn") - F.col("k")))
        / (3 * (F.col("k") - 1))
    )
    return tot.select(
        F.col("k").alias("n_groups"),
        F.col("nn").alias("n_rows"),
        F.floor(t_stat * 1000 + F.lit(0.5)).cast("long").alias("bartlett_t_milli"),
    )
