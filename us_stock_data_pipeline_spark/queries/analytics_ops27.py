"""Round-13 analytics, part 27: one-way ANOVA from exact power sums
and a robust three-signal anomaly ensemble.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# One-way ANOVA (F statistic + eta-squared) across event types
# --------------------------------------------------------------------------

_ANOVA_ORACLE = """
WITH g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS ss
  FROM events GROUP BY event_type
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n) AS BIGINT) AS nn,
         CAST(sum(s) AS BIGINT) AS stot,
         CAST(sum(ss) AS BIGINT) AS sstot,
         sum(CAST(s AS DOUBLE) * s / n) AS sb_raw
  FROM g
)
SELECT k AS n_groups, nn AS n_rows,
       CAST(k - 1 AS BIGINT) AS df_between,
       CAST(nn - k AS BIGINT) AS df_within,
       floor((sb_raw - CAST(stot AS DOUBLE) * stot / nn) / (k - 1)
             / ((sstot - sb_raw) / (nn - k)) * 10000 + 0.5) / 10000 AS f_stat,
       floor((sb_raw - CAST(stot AS DOUBLE) * stot / nn)
             / (sstot - CAST(stot AS DOUBLE) * stot / nn) * 1000000 + 0.5)
         / 1000000 AS eta_squared
FROM tot
"""


@register("stats_anova_oneway", oracle=_ANOVA_ORACLE, tags=("stats", "agg"))
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA across event types: F = (SSB/df_b)/(SSW/df_w)
    and effect size eta^2 = SSB/SST, computed entirely from per-group
    exact integer power sums (n, sum, sum-of-squares in cents) — the
    parametric sibling of `stats_kruskal_wallis` (same question, rank
    test), completing the classical-test shelf next to Welch, KS and
    Mann-Whitney. The distributed state is three mergeable counters
    per group; every double enters in one terminal expression on both
    engines. Plan: one scan, one map-side-combined groupBy on a
    5-value key, one singleton rollup."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(cents).cast("long").alias("s"),
        F.sum(cents * cents).cast("long").alias("ss"),
    )
    tot = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum("s").cast("long").alias("stot"),
        F.sum("ss").cast("long").alias("sstot"),
        F.sum(F.col("s").cast("double") * F.col("s") / F.col("n")).alias("sb_raw"),
    )
    ssb = F.col("sb_raw") - F.col("stot").cast("double") * F.col("stot") / F.col("nn")
    ssw = F.col("sstot") - F.col("sb_raw")
    sst = F.col("sstot") - F.col("stot").cast("double") * F.col("stot") / F.col("nn")
    return tot.select(
        F.col("k").alias("n_groups"),
        F.col("nn").alias("n_rows"),
        (F.col("k") - 1).cast("long").alias("df_between"),
        (F.col("nn") - F.col("k")).cast("long").alias("df_within"),
        (
            F.floor(
                ssb / (F.col("k") - 1) / (ssw / (F.col("nn") - F.col("k"))) * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("f_stat"),
        (F.floor(ssb / sst * 1000000 + F.lit(0.5)) / 1000000).alias("eta_squared"),
    )


# --------------------------------------------------------------------------
# Robust anomaly ensemble: return / level / volume signals, 2-of-3 vote
# --------------------------------------------------------------------------

_ENSEMBLE_ORACLE = """
WITH daily AS (
  SELECT event_type AS symbol,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS vol
  FROM events GROUP BY 1, 2
),
feat AS (
  SELECT symbol, day, c, vol,
         (c - lag(c) OVER w) * 10000 // lag(c) OVER w AS ret_bp,
         7 * c - sum(c) OVER (w ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS lvl7,
         count(*) OVER (w ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7
  FROM daily WINDOW w AS (PARTITION BY symbol ORDER BY day)
),
valid AS (
  SELECT symbol, day, vol, ret_bp, lvl7
  FROM feat WHERE ret_bp IS NOT NULL AND n7 = 7
),
med AS (
  SELECT symbol,
         CAST(quantile_disc(ret_bp, 0.5) AS BIGINT) AS med_ret,
         CAST(quantile_disc(vol, 0.5) AS BIGINT) AS med_vol
  FROM valid GROUP BY symbol
),
dev AS (
  SELECT v.symbol, v.day, v.vol, v.ret_bp, v.lvl7, m.med_ret, m.med_vol,
         abs(v.ret_bp - m.med_ret) AS adev_ret,
         abs(v.lvl7) AS adev_lvl
  FROM valid v JOIN med m ON m.symbol = v.symbol
),
mad AS (
  SELECT symbol,
         CAST(quantile_disc(adev_ret, 0.5) AS BIGINT) AS mad_ret,
         CAST(quantile_disc(adev_lvl, 0.5) AS BIGINT) AS mad_lvl
  FROM dev GROUP BY symbol
),
flags AS (
  SELECT d.symbol, d.day,
         CASE WHEN d.adev_ret > 3 * a.mad_ret THEN 1 ELSE 0 END AS f_ret,
         CASE WHEN d.adev_lvl > 3 * a.mad_lvl THEN 1 ELSE 0 END AS f_lvl,
         CASE WHEN d.vol > 2 * d.med_vol THEN 1 ELSE 0 END AS f_vol
  FROM dev d JOIN mad a ON a.symbol = d.symbol
)
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(f_ret) AS BIGINT) AS n_flag_return,
       CAST(sum(f_lvl) AS BIGINT) AS n_flag_level,
       CAST(sum(f_vol) AS BIGINT) AS n_flag_volume,
       CAST(sum(CASE WHEN f_ret + f_lvl + f_vol >= 2 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_anomalies,
       min(CASE WHEN f_ret + f_lvl + f_vol >= 2 THEN day END) AS first_anomaly_day
FROM flags
GROUP BY symbol
ORDER BY symbol
"""


@register("anomaly_ensemble_vote", oracle=_ENSEMBLE_ORACLE, tags=("analytics", "stats"))
def anomaly_ensemble_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-signal anomaly ensemble with a 2-of-3 vote: a return
    outlier (|ret - median| > 3 MAD), a detrended level outlier
    (|7c - centered-7-sum| > 3 MAD of its own magnitude — integer
    detrending, no fractional moving average), and a volume spike
    (> 2x median volume). Single-signal detectors page too often
    (`anomaly_rolling_zscore`'s known weakness on fat tails); the
    vote is what production alerting actually ships. Every signal is
    robust (median/MAD via percentile_disc on exact integers), so
    both engines flag the identical day set. Plan: daily rollup, one
    (symbol, day) window pass for both features, two bounded
    per-symbol median tables broadcast back, one conditional-sum
    rollup."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    daily = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"),
        F.sum(cents).cast("long").alias("vol"),
    )
    w = Window.partitionBy("symbol").orderBy("day")
    w7 = w.rowsBetween(-3, 3)
    feat = daily.select(
        "symbol",
        "day",
        "vol",
        F.expr(
            "(c - lag(c) OVER (PARTITION BY symbol ORDER BY day)) * 10000"
            " div lag(c) OVER (PARTITION BY symbol ORDER BY day)"
        ).alias("ret_bp"),
        (7 * F.col("c") - F.sum("c").over(w7)).alias("lvl7"),
        F.count(F.lit(1)).over(w7).alias("n7"),
    )
    valid = feat.filter(F.col("ret_bp").isNotNull() & (F.col("n7") == 7)).select(
        "symbol", "day", "vol", "ret_bp", "lvl7"
    )
    med = valid.groupBy(F.col("symbol").alias("ms")).agg(
        F.expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY ret_bp) AS BIGINT)").alias(
            "med_ret"
        ),
        F.expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY vol) AS BIGINT)").alias(
            "med_vol"
        ),
    )
    dev = valid.join(F.broadcast(med), valid.symbol == med.ms).select(
        "symbol",
        "day",
        "vol",
        "med_vol",
        F.abs(F.col("ret_bp") - F.col("med_ret")).alias("adev_ret"),
        F.abs(F.col("lvl7")).alias("adev_lvl"),
    )
    mad = dev.groupBy(F.col("symbol").alias("as_")).agg(
        F.expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY adev_ret) AS BIGINT)").alias(
            "mad_ret"
        ),
        F.expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY adev_lvl) AS BIGINT)").alias(
            "mad_lvl"
        ),
    )
    flags = dev.join(F.broadcast(mad), dev.symbol == mad.as_).select(
        "symbol",
        "day",
        F.when(F.col("adev_ret") > 3 * F.col("mad_ret"), 1).otherwise(0).alias("f_ret"),
        F.when(F.col("adev_lvl") > 3 * F.col("mad_lvl"), 1).otherwise(0).alias("f_lvl"),
        F.when(F.col("vol") > 2 * F.col("med_vol"), 1).otherwise(0).alias("f_vol"),
    )
    vote = F.col("f_ret") + F.col("f_lvl") + F.col("f_vol")
    return (
        flags.groupBy("symbol")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("f_ret").cast("long").alias("n_flag_return"),
            F.sum("f_lvl").cast("long").alias("n_flag_level"),
            F.sum("f_vol").cast("long").alias("n_flag_volume"),
            F.sum(F.when(vote >= 2, 1).otherwise(0)).cast("long").alias("n_anomalies"),
            F.min(F.when(vote >= 2, F.col("day"))).alias("first_anomaly_day"),
        )
        .orderBy("symbol")
    )
