"""Round-50 analytics, part 48: Tukey IQR outlier fences and the
overnight/intraday return decomposition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.functions import detmath
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Tukey IQR fences (exact order-statistic quartiles)
# --------------------------------------------------------------------------

_IQR_ORACLE = """
WITH vals AS (
  SELECT event_type AS symbol, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
ranked AS (
  SELECT symbol, cents,
         row_number() OVER (PARTITION BY symbol ORDER BY cents, 1) AS rn,
         count(*) OVER (PARTITION BY symbol) AS n
  FROM vals
),
quarts AS (  -- type-1 (ceil-rank) quartiles: exact order statistics
  SELECT symbol,
         CAST(max(CASE WHEN rn = (n + 3) // 4 THEN cents END) AS BIGINT) AS q1,
         CAST(max(CASE WHEN rn = (3 * n + 3) // 4 THEN cents END) AS BIGINT) AS q3
  FROM ranked GROUP BY symbol
),
fenced AS (
  SELECT v.symbol, v.cents, q.q1, q.q3,
         -- 1.5*IQR without halves: fences scaled x2 so everything
         -- stays integer: low2 = 2*q1 - 3*(q3-q1), cents2 = 2*cents
         2 * q.q1 - 3 * (q.q3 - q.q1) AS low2,
         2 * q.q3 + 3 * (q.q3 - q.q1) AS high2
  FROM vals v JOIN quarts q ON q.symbol = v.symbol
)
SELECT symbol, CAST(max(q1) AS BIGINT) AS q1_cents,
       CAST(max(q3) AS BIGINT) AS q3_cents,
       CAST(count(*) AS BIGINT) AS n_trades,
       CAST(sum(CASE WHEN 2 * cents < low2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low_outliers,
       CAST(sum(CASE WHEN 2 * cents > high2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_high_outliers
FROM fenced
GROUP BY symbol
ORDER BY symbol
"""


@register("anomaly_iqr_fences", oracle=_IQR_ORACLE, tags=("stats", "analytics"))
def anomaly_iqr_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey boxplot fences — THE default outlier rule (flag anything
    beyond quartile +- 1.5*IQR), here fully exact: quartiles are
    type-1 ceil-rank ORDER STATISTICS (no interpolation to diverge
    between engines), and the half-unit in 1.5*IQR is removed by
    scaling the comparison x2 — fence checks are pure integer
    inequalities. Complements the z-score detector
    (`anomaly_rolling_zscore`, parametric, rolling) with the
    distribution-free batch rule, and the MAD score (`agg_mad_robust`)
    with the rule practitioners actually quote. Plan: one ranked pass
    per symbol for two quartile rows, broadcast back, one fence
    scan."""
    vals = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("symbol"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("symbol").orderBy("cents", F.lit(1))
    ranked = vals.select(
        "symbol",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("symbol")).alias("n"),
    )
    quarts = ranked.groupBy("symbol").agg(
        F.max(F.when(F.col("rn") == F.expr("(n + 3) div 4"), F.col("cents")))
        .cast("long")
        .alias("q1"),
        F.max(F.when(F.col("rn") == F.expr("(3 * n + 3) div 4"), F.col("cents")))
        .cast("long")
        .alias("q3"),
    )
    fenced = vals.join(F.broadcast(quarts), "symbol").select(
        "symbol",
        "cents",
        "q1",
        "q3",
        (2 * F.col("q1") - 3 * (F.col("q3") - F.col("q1"))).alias("low2"),
        (2 * F.col("q3") + 3 * (F.col("q3") - F.col("q1"))).alias("high2"),
    )
    return (
        fenced.groupBy("symbol")
        .agg(
            F.max("q1").cast("long").alias("q1_cents"),
            F.max("q3").cast("long").alias("q3_cents"),
            F.count("*").cast("long").alias("n_trades"),
            F.sum(F.when(2 * F.col("cents") < F.col("low2"), 1).otherwise(0))
            .cast("long")
            .alias("n_low_outliers"),
            F.sum(F.when(2 * F.col("cents") > F.col("high2"), 1).otherwise(0))
            .cast("long")
            .alias("n_high_outliers"),
        )
        .orderBy("symbol")
    )


# --------------------------------------------------------------------------
# Overnight vs intraday return decomposition
# --------------------------------------------------------------------------

# log returns via the libm-free det_ln kernel (bit-identical doubles in
# both engines — transcendental audit r9); NULL prev_close propagates
# NULL through the stages identically on both sides.
_OVERNIGHT_STAGES = detmath.det_ln_ratio_stages(
    "open_cents", "prev_close", "on_lr"
) + detmath.det_ln_ratio_stages("close_cents", "open_cents", "id_lr")

_OVERNIGHT_ORACLE = f"""
WITH ohlc AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_min(value, event_id) * 100) AS BIGINT) AS open_cents,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS close_cents
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT symbol, day, open_cents, close_cents,
         lag(close_cents) OVER (PARTITION BY symbol ORDER BY day) AS prev_close
  FROM ohlc
),
decomp AS (
  SELECT symbol, day,
         CAST(floor(on_lr * 1000000 + 0.5) AS BIGINT) AS overnight_e6,
         CAST(floor(id_lr * 1000000 + 0.5) AS BIGINT) AS intraday_e6
  FROM {detmath.stages_to_select(_OVERNIGHT_STAGES, "lagged")}
)
SELECT symbol,
       CAST(count(overnight_e6) AS BIGINT) AS n_days,
       CAST(sum(overnight_e6) AS BIGINT) AS total_overnight_e6,
       CAST(sum(intraday_e6) AS BIGINT) AS total_intraday_e6
FROM decomp
WHERE overnight_e6 IS NOT NULL
GROUP BY symbol
ORDER BY symbol
"""


@register("bars_overnight_intraday", oracle=_OVERNIGHT_ORACLE, tags=("stock", "window"))
def bars_overnight_intraday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overnight vs intraday return decomposition: the close-to-close
    move splits exactly into prev_close -> open (the gap risk a
    day-trader never holds, where earnings and news land) plus
    open -> close (the session move) — log returns make the split
    additive, and the well-documented empirical puzzle is that the
    overnight leg carries most of the equity premium. Both legs are
    1e-6-quantized log returns from exact integer open/close cents
    (open by arg_min on arrival order, close by arg_max — the house
    OHLC convention); per-symbol cumulative totals are exact BIGINT
    sums. One daily rollup, one lag on the shared symbol sort."""
    ev = load_table(spark, sf_dir, "events")
    ohlc = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.min_by("value", "event_id") * 100).cast("long").alias("open_cents"),
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("close_cents"),
    )
    w = Window.partitionBy("symbol").orderBy("day")
    lagged = ohlc.select(
        "symbol",
        "open_cents",
        "close_cents",
        F.lag("close_cents").over(w).alias("prev_close"),
    )
    decomp = detmath.apply_stages(lagged, _OVERNIGHT_STAGES).selectExpr(
        "symbol",
        "CAST(floor(on_lr * 1000000 + 0.5) AS BIGINT) AS overnight_e6",
        "CAST(floor(id_lr * 1000000 + 0.5) AS BIGINT) AS intraday_e6",
    ).filter(F.col("overnight_e6").isNotNull())
    return (
        decomp.groupBy("symbol")
        .agg(
            F.count("overnight_e6").cast("long").alias("n_days"),
            F.sum("overnight_e6").cast("long").alias("total_overnight_e6"),
            F.sum("intraday_e6").cast("long").alias("total_intraday_e6"),
        )
        .orderBy("symbol")
    )
