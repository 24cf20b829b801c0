"""Round-71 analytics, part 70: Hodges-Lehmann pseudo-median and the
Siegel repeated-median slope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Hodges-Lehmann estimator of daily returns (median of Walsh averages)
# --------------------------------------------------------------------------

_HL_ORACLE = """
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS close_cents
  FROM events GROUP BY 1, 2
),
rets AS (
  SELECT symbol, row_number() OVER w AS i,
         CAST(floor((close_cents - lag(close_cents) OVER w) * 10000.0
                    / lag(close_cents) OVER w + 0.5) AS BIGINT) AS r
  FROM closes WINDOW w AS (PARTITION BY symbol ORDER BY day)
  QUALIFY lag(close_cents) OVER w IS NOT NULL
),
walsh AS (  -- all pairwise averages incl. self-pairs, carried as 2x (exact)
  SELECT a.symbol, a.r + b.r AS w2
  FROM rets a JOIN rets b ON b.symbol = a.symbol AND b.i >= a.i
),
ranked AS (
  SELECT symbol, w2,
         row_number() OVER (PARTITION BY symbol ORDER BY w2) AS rn,
         CAST(count(*) OVER (PARTITION BY symbol) AS BIGINT) AS n
  FROM walsh
)
SELECT symbol, CAST(max(n) AS BIGINT) AS n_walsh,
       -- exact median of the doubled values: avg of the two middles, still
       -- an exact integer in quarter-bp units (x4)
       -- odd n: 2 * middle; even n: lo + hi — both equal 2 * median(w2)
       -- = 4 * HL, an exact integer in quarter-bp units
       CAST(sum(CASE WHEN rn = (n + 1) // 2 OR rn = (n + 2) // 2 THEN w2
                     ELSE 0 END)
            * (CASE WHEN (n + 2) // 2 = (n + 1) // 2 THEN 2 ELSE 1 END)
         AS BIGINT) AS hl_qbp
FROM ranked
GROUP BY symbol, n
ORDER BY symbol
"""


@register("stats_hodges_lehmann", oracle=_HL_ORACLE, tags=("stats", "stock"))
def stats_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann location estimator of daily returns: the median
    of all Walsh averages (x_i + x_j)/2, i <= j — the robust "typical
    return" with 86% Gaussian efficiency AND a 29% breakdown point,
    where the plain median wastes efficiency and the mean breaks on
    one flash-crash day (it is also the point estimate dual to
    `stats_mannwhitney_u`'s test). Exactness: Walsh averages are
    carried DOUBLED (x_i + x_j, exact ints); the median of the
    doubled multiset is the average of the two middle order
    statistics, again exact, so the output is an integer in
    quarter-basis-point units — float-free end to end. The pair
    fan-out is O(days^2) per symbol, bounded by the calendar, not
    the tape (the same argument as `stats_mann_kendall`). Plan:
    returns window, symbol-keyed pair self-join, one rank window,
    one aggregate."""
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
        closes.select(
            "symbol",
            F.row_number().over(w).alias("i"),
            prev.alias("prev_c"),
            F.col("close_cents").alias("c"),
        )
        .filter(F.col("prev_c").isNotNull())
        .select(
            "symbol",
            "i",
            F.floor((F.col("c") - F.col("prev_c")) * 10000.0 / F.col("prev_c") + F.lit(0.5))
            .cast("long")
            .alias("r"),
        )
    )
    b = rets.select(
        F.col("symbol").alias("symbol_b"), F.col("i").alias("ib"), F.col("r").alias("rb")
    )
    walsh = rets.join(
        b, (F.col("symbol_b") == F.col("symbol")) & (F.col("ib") >= F.col("i"))
    ).select("symbol", (F.col("r") + F.col("rb")).alias("w2"))
    w_rank = Window.partitionBy("symbol").orderBy("w2")
    w_all = Window.partitionBy("symbol")
    ranked = walsh.select(
        "symbol",
        "w2",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n"),
    )
    lo = F.floor((F.col("n") + 1) / 2)
    hi = F.floor((F.col("n") + 2) / 2)
    pick = F.sum(
        F.when((F.col("rn") == lo) | (F.col("rn") == hi), F.col("w2")).otherwise(0)
    )
    doubler = F.when(hi == lo, 2).otherwise(1)
    return (
        ranked.groupBy("symbol", "n")
        .agg((pick * F.max(doubler)).cast("long").alias("hl_qbp"))
        .select("symbol", F.col("n").alias("n_walsh"), "hl_qbp")
        .orderBy("symbol")
    )


# --------------------------------------------------------------------------
# Siegel repeated-median slope (daily close vs day index)
# --------------------------------------------------------------------------

_SIEGEL_ORACLE = """
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT symbol, row_number() OVER (PARTITION BY symbol ORDER BY day) AS i, c
  FROM closes
),
slopes AS (  -- pairwise slope quantized e6 per pair (exact int afterwards)
  SELECT a.symbol, a.i AS ia,
         CAST(floor((b.c - a.c) * 1000000.0 / (b.i - a.i) + 0.5) AS BIGINT) AS s_e6
  FROM idx a JOIN idx b ON b.symbol = a.symbol AND b.i <> a.i
),
ranked_i AS (
  SELECT symbol, ia, s_e6,
         row_number() OVER (PARTITION BY symbol, ia ORDER BY s_e6) AS rn,
         CAST(count(*) OVER (PARTITION BY symbol, ia) AS BIGINT) AS n
  FROM slopes
),
inner_med AS (  -- per-point median x2 (sum of the two middles; odd doubles)
  SELECT symbol, ia,
         CAST(sum(CASE WHEN rn = (n + 1) // 2 OR rn = (n + 2) // 2 THEN s_e6
                       ELSE 0 END)
              * (CASE WHEN (n + 2) // 2 = (n + 1) // 2 THEN 2 ELSE 1 END)
           AS BIGINT) AS med2_e6
  FROM ranked_i
  GROUP BY symbol, ia, n
),
ranked_o AS (
  SELECT symbol, med2_e6,
         row_number() OVER (PARTITION BY symbol ORDER BY med2_e6, ia) AS rn,
         CAST(count(*) OVER (PARTITION BY symbol) AS BIGINT) AS n
  FROM inner_med
)
SELECT symbol, CAST(max(n) AS BIGINT) AS n_points,
       CAST(sum(CASE WHEN rn = (n + 1) // 2 OR rn = (n + 2) // 2 THEN med2_e6
                     ELSE 0 END)
            * (CASE WHEN (n + 2) // 2 = (n + 1) // 2 THEN 2 ELSE 1 END)
         AS BIGINT) AS siegel_slope_4x_e6
FROM ranked_o
GROUP BY symbol, n
ORDER BY symbol
"""


@register("stats_siegel_slope", oracle=_SIEGEL_ORACLE, tags=("stats", "timeseries"))
def stats_siegel_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Siegel repeated-median slope of daily closes: for each point,
    the median slope to every other point; then the median of those
    per-point medians — the 50%-breakdown robust trend
    (`timeseries_theil_sen` medians the FLAT pair-slope pool and
    breaks at 29%; Siegel's nesting survives when HALF the points are
    corrupted, the difference that matters for glitchy tick feeds).
    Each pairwise slope quantizes to integer e6 BEFORE the medians;
    both median layers are exact two-middle averages carried at 2x
    (the output is 4x the slope in e6 units — the caller divides by
    4, keeping the pipeline float-free). Inner-median ties on the
    outer ordering break by point index. Same calendar-bounded
    O(days^2) pair argument as the HL estimator. Plan: one index
    window, a symbol-keyed pair join, two rank windows, two
    aggregates."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
    w = Window.partitionBy("symbol").orderBy("day")
    idx = closes.select("symbol", F.row_number().over(w).alias("i"), "c")
    b = idx.select(
        F.col("symbol").alias("symbol_b"), F.col("i").alias("ib"), F.col("c").alias("cb")
    )
    slopes = idx.join(
        b, (F.col("symbol_b") == F.col("symbol")) & (F.col("ib") != F.col("i"))
    ).select(
        "symbol",
        F.col("i").alias("ia"),
        F.floor(
            (F.col("cb") - F.col("c")) * 1_000_000.0 / (F.col("ib") - F.col("i")) + F.lit(0.5)
        )
        .cast("long")
        .alias("s_e6"),
    )
    w_rank_i = Window.partitionBy("symbol", "ia").orderBy("s_e6")
    w_all_i = Window.partitionBy("symbol", "ia")
    ranked_i = slopes.select(
        "symbol",
        "ia",
        "s_e6",
        F.row_number().over(w_rank_i).alias("rn"),
        F.count(F.lit(1)).over(w_all_i).cast("long").alias("n"),
    )
    lo = F.floor((F.col("n") + 1) / 2)
    hi = F.floor((F.col("n") + 2) / 2)
    pick = F.sum(
        F.when((F.col("rn") == lo) | (F.col("rn") == hi), F.col("s_e6")).otherwise(0)
    )
    doubler = F.when(hi == lo, 2).otherwise(1)
    inner = (
        ranked_i.groupBy("symbol", "ia", "n")
        .agg((pick * F.max(doubler)).cast("long").alias("med2_e6"))
        .select("symbol", "ia", "med2_e6")
    )
    w_rank_o = Window.partitionBy("symbol").orderBy("med2_e6", "ia")
    w_all_o = Window.partitionBy("symbol")
    ranked_o = inner.select(
        "symbol",
        "med2_e6",
        F.row_number().over(w_rank_o).alias("rn"),
        F.count(F.lit(1)).over(w_all_o).cast("long").alias("n"),
    )
    pick_o = F.sum(
        F.when((F.col("rn") == lo) | (F.col("rn") == hi), F.col("med2_e6")).otherwise(0)
    )
    return (
        ranked_o.groupBy("symbol", "n")
        .agg((pick_o * F.max(doubler)).cast("long").alias("med4_e6"))
        .select("symbol", F.col("n").alias("n_points"), F.col("med4_e6").alias("siegel_slope_4x_e6"))
        .orderBy("symbol")
    )
