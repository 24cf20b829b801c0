"""Round-10 analytics, part 23: deterministic Poisson-bootstrap
confidence intervals and an event-study abnormal-return table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Deterministic Poisson bootstrap CI for the mean order value
# --------------------------------------------------------------------------

_BOOT_B = 64  # resamples

# Poisson(1) inverse-CDF thresholds scaled by 1e6 (cumulative:
# P(0)=.367879, P(<=1)=.735759, P(<=2)=.919699, P(<=3)=.980998,
# P(<=4)=.996340). A row's weight in resample b comes from a
# deterministic integer mixer of (orderkey, b) — identical on both
# engines, no RNG, reproducible under any partitioning.
_W_CASE = """
CASE WHEN h < 367879 THEN 0
     WHEN h < 735759 THEN 1
     WHEN h < 919699 THEN 2
     WHEN h < 980998 THEN 3
     WHEN h < 996340 THEN 4
     ELSE 5 END
"""

_BOOT_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
expanded AS (
  SELECT b.b, o.cents,
         ((o.o_orderkey + b.b * 1000003) % 1048573 * 2654435761) % 1000000 AS h
  FROM base o CROSS JOIN (SELECT unnest(generate_series(1, {_BOOT_B})) AS b) b
),
weighted AS (
  SELECT b, cents, {_W_CASE} AS w FROM expanded
),
means AS (
  SELECT b, CAST(sum(w * cents) // sum(w) AS BIGINT) AS mean_cents
  FROM weighted GROUP BY b HAVING sum(w) > 0
)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM base) AS n_orders,
  (SELECT CAST(sum(cents) // count(*) AS BIGINT) FROM base) AS point_mean_cents,
  CAST(quantile_disc(mean_cents, 0.025) AS BIGINT) AS ci_lo_cents,
  CAST(quantile_disc(mean_cents, 0.975) AS BIGINT) AS ci_hi_cents,
  CAST(count(*) AS BIGINT) AS n_resamples
FROM means
"""


@register("stats_bootstrap_ci", oracle=_BOOT_ORACLE, tags=("stats", "sampling"))
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% CI for the mean order value with a fully
    DETERMINISTIC resampling scheme: each (order, resample-b) pair
    draws its multiplicity from Poisson(1) via inverse-CDF thresholds
    on an integer hash mixer — the trick that makes the bootstrap a
    pure, reproducible dataflow (the same idea production systems use
    so a re-run or a second engine lands on identical resamples; RNG
    bootstraps can't be oracle-checked at all). Per-resample means are
    exact integer floor-divisions; the CI is percentile_disc over the
    {_BOOT_B} means. Scale shape: the x{_BOOT_B} expansion is map-side
    only — the shuffle carries {_BOOT_B} partial (sum, count) pairs
    per partition, not expanded rows, because the groupBy(b) combines
    locally first; this is the standard 'Poisson bootstrap beats
    multinomial at scale' argument made executable."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    expanded = base.select(
        "o_orderkey",
        "cents",
        F.explode(F.sequence(F.lit(1), F.lit(_BOOT_B))).alias("b"),
    ).withColumn(
        "h",
        F.expr("((o_orderkey + b * 1000003) % 1048573 * 2654435761) % 1000000"),
    )
    weighted = expanded.withColumn("w", F.expr(_W_CASE))
    means = (
        weighted.groupBy("b")
        .agg(
            F.expr("CAST(sum(w * cents) div sum(w) AS BIGINT)").alias("mean_cents"),
            F.sum("w").alias("wsum"),
        )
        .filter(F.col("wsum") > 0)
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.expr("CAST(sum(cents) div count(*) AS BIGINT)").alias("point_mean_cents"),
    )
    ci = means.agg(
        F.expr("CAST(percentile_disc(0.025) WITHIN GROUP (ORDER BY mean_cents) AS BIGINT)")
        .alias("ci_lo_cents"),
        F.expr("CAST(percentile_disc(0.975) WITHIN GROUP (ORDER BY mean_cents) AS BIGINT)")
        .alias("ci_hi_cents"),
        F.count(F.lit(1)).cast("long").alias("n_resamples"),
    )
    return stats.crossJoin(F.broadcast(ci)).select(
        "n_orders", "point_mean_cents", "ci_lo_cents", "ci_hi_cents", "n_resamples"
    )


# --------------------------------------------------------------------------
# Event study: abnormal returns on high-volume days
# --------------------------------------------------------------------------

_EVENT_ORACLE = """
WITH daily AS (
  SELECT event_type AS symbol,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS vol
  FROM events GROUP BY 1, 2
),
rets AS (
  SELECT symbol, day, vol,
         (c - lag(c) OVER w) * 10000 // lag(c) OVER w AS ret_bp
  FROM daily
  WINDOW w AS (PARTITION BY symbol ORDER BY day)
),
valid AS (
  SELECT symbol, day, vol, ret_bp FROM rets WHERE ret_bp IS NOT NULL
),
thr AS (
  SELECT symbol, CAST(quantile_disc(vol, 0.9) AS BIGINT) AS v90
  FROM valid GROUP BY symbol
),
tagged AS (
  SELECT v.symbol, v.ret_bp,
         CASE WHEN v.vol >= t.v90 THEN 1 ELSE 0 END AS is_event
  FROM valid v JOIN thr t ON t.symbol = v.symbol
)
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(is_event) AS BIGINT) AS n_event_days,
       floor(CAST(sum(CASE WHEN is_event = 1 THEN ret_bp ELSE 0 END) AS DOUBLE)
             / sum(is_event) * 100 + 0.5) / 100 AS mean_event_ret_bp,
       floor(CAST(sum(CASE WHEN is_event = 0 THEN ret_bp ELSE 0 END) AS DOUBLE)
             / sum(1 - is_event) * 100 + 0.5) / 100 AS mean_other_ret_bp,
       floor((CAST(sum(CASE WHEN is_event = 1 THEN ret_bp ELSE 0 END) AS DOUBLE)
              / sum(is_event)
              - CAST(sum(ret_bp) AS DOUBLE) / count(*)) * 100 + 0.5) / 100
         AS mean_abnormal_bp
FROM tagged
GROUP BY symbol
ORDER BY symbol
"""


@register("bars_event_study", oracle=_EVENT_ORACLE, tags=("stock", "stats"))
def bars_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event study: tag each symbol's top-decile-volume days
    (percentile_disc on exact integer volume — a value the data
    contains) as events and compare their mean return against the
    symbol's unconditional mean — the abnormal-return table behind
    'do volume spikes move prices?'. Returns are integer basis
    points (both engines truncate integer division toward zero, so
    negative returns bin identically); only the three displayed
    means are terminal quantized doubles from exact integer sums.
    Plan: calendar-bounded daily rollup, one lag window, a broadcast
    per-symbol threshold join, one conditional-sum groupBy — the
    whole study is two shuffles on (symbol)."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100)
    daily = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"),
        F.sum(cents.cast("long")).cast("long").alias("vol"),
    )
    w = Window.partitionBy("symbol").orderBy("day")
    rets = daily.select(
        "symbol",
        "day",
        "vol",
        F.expr(
            "(c - lag(c) OVER (PARTITION BY symbol ORDER BY day)) * 10000"
            " div lag(c) OVER (PARTITION BY symbol ORDER BY day)"
        ).alias("ret_bp"),
    ).filter(F.col("ret_bp").isNotNull())
    thr = rets.groupBy(F.col("symbol").alias("tsymbol")).agg(
        F.expr("CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY vol) AS BIGINT)").alias(
            "v90"
        )
    )
    tagged = rets.join(F.broadcast(thr), rets.symbol == thr.tsymbol).select(
        "symbol",
        "ret_bp",
        F.when(F.col("vol") >= F.col("v90"), 1).otherwise(0).alias("is_event"),
    )
    ev_sum = F.sum(F.when(F.col("is_event") == 1, F.col("ret_bp")).otherwise(0)).cast(
        "double"
    )
    ot_sum = F.sum(F.when(F.col("is_event") == 0, F.col("ret_bp")).otherwise(0)).cast(
        "double"
    )
    n_ev = F.sum("is_event")
    n_ot = F.sum(1 - F.col("is_event"))
    return (
        tagged.groupBy("symbol")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            n_ev.cast("long").alias("n_event_days"),
            (F.floor(ev_sum / n_ev * 100 + F.lit(0.5)) / 100).alias("mean_event_ret_bp"),
            (F.floor(ot_sum / n_ot * 100 + F.lit(0.5)) / 100).alias("mean_other_ret_bp"),
            (
                F.floor(
                    (ev_sum / n_ev - F.sum("ret_bp").cast("double") / F.count(F.lit(1)))
                    * 100
                    + F.lit(0.5)
                )
                / 100
            ).alias("mean_abnormal_bp"),
        )
        .orderBy("symbol")
    )
