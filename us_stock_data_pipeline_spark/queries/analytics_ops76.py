"""Round-82 analytics, part 76: band-limited Dynamic Time Warping
between symbol return series (applyInPandas-style custom kernel with a
recursive-CTE DP oracle) and the Atkinson inequality index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.functions import detmath
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Dynamic Time Warping distance (Sakoe-Chiba band) between return series
# --------------------------------------------------------------------------

_DTW_BAND = 10

_DTW_ORACLE = f"""
WITH RECURSIVE closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
rets AS (
  -- row_number counts the dropped seed row, so the return index is rn-1
  SELECT symbol, row_number() OVER w - 1 AS i,
         CAST(floor((c - lag(c) OVER w) * 10000.0 / lag(c) OVER w + 0.5)
           AS BIGINT) AS r
  FROM closes WINDOW w AS (PARTITION BY symbol ORDER BY day)
  QUALIFY lag(c) OVER w IS NOT NULL
),
dims AS (SELECT symbol, CAST(max(i) AS BIGINT) AS n FROM rets GROUP BY symbol),
pairs AS (
  SELECT a.symbol AS pa, b.symbol AS pb, a.n AS na, b.n AS nb
  FROM dims a JOIN dims b ON a.symbol < b.symbol
),
cells AS (
  SELECT p.pa, p.pb, ra.i, rb.i AS j, abs(ra.r - rb.r) AS cost
  FROM pairs p
  JOIN rets ra ON ra.symbol = p.pa
  JOIN rets rb ON rb.symbol = p.pb
  WHERE abs(ra.i - rb.i) <= {_DTW_BAND}
),
dp(pa, pb, i, j, val) AS (
  SELECT pa, pb, i, j, cost FROM cells WHERE i = 1 AND j = 1
  UNION ALL
  (
    -- one anti-diagonal per iteration; the working table carries the
    -- frontier diagonal plus a pass-through copy of the one before it
    SELECT c.pa, c.pb, c.i, c.j, c.cost + min(p.val)
    FROM cells c
    JOIN (SELECT pa, pb, max(i + j) AS fr FROM dp GROUP BY pa, pb) f
      ON f.pa = c.pa AND f.pb = c.pb AND c.i + c.j = f.fr + 1
    JOIN dp p ON p.pa = c.pa AND p.pb = c.pb AND (
      (p.i + p.j = c.i + c.j - 1 AND ((p.i = c.i - 1 AND p.j = c.j)
                                      OR (p.i = c.i AND p.j = c.j - 1)))
      OR (p.i + p.j = c.i + c.j - 2 AND p.i = c.i - 1 AND p.j = c.j - 1))
    GROUP BY c.pa, c.pb, c.i, c.j, c.cost
    UNION ALL
    SELECT p.pa, p.pb, p.i, p.j, p.val
    FROM dp p
    JOIN (SELECT pa, pb, max(i + j) AS fr FROM dp GROUP BY pa, pb) f
      ON f.pa = p.pa AND f.pb = p.pb AND p.i + p.j = f.fr
    JOIN pairs pr ON pr.pa = p.pa AND pr.pb = p.pb AND f.fr < pr.na + pr.nb
  )
)
SELECT pr.pa AS symbol_a, pr.pb AS symbol_b,
       CAST(pr.na AS BIGINT) AS n_a, CAST(pr.nb AS BIGINT) AS n_b,
       CAST(min(dp.val) AS BIGINT) AS dtw_qbp
FROM pairs pr
JOIN dp ON dp.pa = pr.pa AND dp.pb = pr.pb AND dp.i = pr.na AND dp.j = pr.nb
GROUP BY pr.pa, pr.pb, pr.na, pr.nb
ORDER BY symbol_a, symbol_b
"""

_INF = np.int64(2) ** 62


def _dtw_pairs(sa: pd.Series, sb: pd.Series) -> pd.Series:
    out = []
    for a, b in zip(sa, sb):
        a = np.asarray(a, dtype=np.int64)
        b = np.asarray(b, dtype=np.int64)
        n, m = len(a), len(b)
        D = np.full((n + 1, m + 1), _INF, dtype=np.int64)
        D[0, 0] = 0
        for i in range(1, n + 1):
            lo = max(1, i - _DTW_BAND)
            hi = min(m, i + _DTW_BAND)
            for j in range(lo, hi + 1):
                best = min(D[i - 1, j], D[i, j - 1], D[i - 1, j - 1])
                if best < _INF:
                    D[i, j] = abs(a[i - 1] - b[j - 1]) + best
        out.append(int(D[n, m]))
    return pd.Series(out)


@register("timeseries_dtw_distance", oracle=_DTW_ORACLE, tags=("timeseries", "udf", "similarity"))
def timeseries_dtw_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-limited Dynamic Time Warping distance between every pair of
    symbols' daily-return series — the alignment-tolerant similarity
    that lock-step measures miss (`timeseries_cross_correlation` only
    tests FIXED lags; DTW lets the warp path stretch locally, the
    standard for shape matching). The O(n x band) DP has a sequential
    data dependency no SQL window or HOF expresses, so it runs as an
    Arrow-batched pandas UDF over per-symbol return arrays — the
    poster case for the Pandas-UDF escape hatch — while the ORACLE
    re-derives the same DP in pure SQL as a recursive CTE marching one
    anti-diagonal per iteration (working set = frontier diagonal +
    pass-through of the previous one). Exactness: returns are integer
    quarter-bp, costs |ra-rb| exact BIGINT, so the distance is exact.
    Scale: series are calendar-bounded (the same argument as
    `stats_mann_kendall`), the Sakoe-Chiba band ({_DTW_BAND}) caps
    each DP at O(n x band), and pairs fan out embarrassingly parallel;
    the kernel ships arrays, never row-per-cell state."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
    w = Window.partitionBy("symbol").orderBy("day")
    prev = F.lag("c").over(w)
    rets = (
        closes.select(
            "symbol",
            F.row_number().over(w).alias("i"),
            prev.alias("p"),
            "c",
        )
        .filter(F.col("p").isNotNull())
        .select(
            "symbol",
            (F.col("i") - 1).alias("i"),
            F.floor((F.col("c") - F.col("p")) * 10000.0 / F.col("p") + F.lit(0.5))
            .cast("long")
            .alias("r"),
        )
    )
    series = rets.groupBy("symbol").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "r"))), lambda x: x["r"]
        ).alias("series"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    a = series.select(
        F.col("symbol").alias("symbol_a"), F.col("series").alias("sa"), F.col("n").alias("n_a")
    )
    b = series.select(
        F.col("symbol").alias("symbol_b"), F.col("series").alias("sb"), F.col("n").alias("n_b")
    )
    pairs = a.join(b, F.col("symbol_a") < F.col("symbol_b"))
    dtw_kernel = pandas_udf(_dtw_pairs, "long")
    return pairs.select(
        "symbol_a",
        "symbol_b",
        "n_a",
        "n_b",
        dtw_kernel("sa", "sb").alias("dtw_qbp"),
    ).orderBy("symbol_a", "symbol_b")


# --------------------------------------------------------------------------
# Atkinson inequality index (epsilon = 1) of customer spend by segment
# --------------------------------------------------------------------------

# ln/exp via the libm-free detmath kernels (bit-identical in both
# engines — transcendental audit r9): per-customer ln(cents) quantizes
# to micro-nats BEFORE the mean, and the geomean exp runs on the tiny
# per-segment aggregate row.
_ATK_LN_STAGES = detmath.det_ln_int_stages("cents", "atk_ln")
_ATK_LQ = "CAST(round(atk_ln * 1000000) AS BIGINT)"
_ATK_EXP_STAGES = [
    ("atk_x", "CAST(sum_log_micro AS DOUBLE) / n_customers / 1000000")
] + detmath.det_exp_stages("atk_x", "atk_g")
_ATK_FINAL = (
    "CAST(floor((1 - atk_g / (CAST(total_cents AS DOUBLE) / n_customers))"
    " * 1000000 + 0.5) AS BIGINT)"
)

_ATKINSON_ORACLE = f"""
WITH spend AS (
  SELECT c.c_mktsegment AS segment,
         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, c.c_custkey
),
logs AS (
  SELECT segment, cents, {_ATK_LQ} AS lq
  FROM {detmath.stages_to_select(_ATK_LN_STAGES, "spend")}
),
sums AS (
  SELECT segment, CAST(count(*) AS BIGINT) AS n_customers,
         CAST(sum(cents) AS BIGINT) AS total_cents,
         CAST(sum(lq) AS BIGINT) AS sum_log_micro
  FROM logs GROUP BY segment
)
SELECT segment, n_customers, total_cents, sum_log_micro,
       {_ATK_FINAL} AS atkinson_micro
FROM {detmath.stages_to_select(_ATK_EXP_STAGES, "sums")}
ORDER BY segment
"""


@register("agg_atkinson_index", oracle=_ATKINSON_ORACLE, tags=("stats", "analytics"))
def agg_atkinson_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson inequality index (epsilon = 1) of customer spend per
    market segment: A = 1 - geomean/mean — the welfare-theoretic
    inequality measure with an explicit aversion parameter, reading as
    'the share of total spend you could discard and keep equal social
    welfare' (Gini, in `events_pareto_gini`, weights transfers by rank;
    Atkinson weights the LOW tail, so the two orderings disagree
    exactly when concentration hides at the bottom). Exactness: per-
    customer ln(spend) quantizes to integer micro-nats before any
    aggregation, the two sums are exact BIGINT, and the final assembly
    is one exp + one division in DOUBLE with pinned association. Plan:
    one customer-orders shuffle into a two-level groupBy — both
    aggregates map-side combinable, segment cardinality-bounded
    output."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    spend = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "c_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
        )
    )
    logs = detmath.apply_stages(spend, _ATK_LN_STAGES).selectExpr(
        "segment", "cents", f"{_ATK_LQ} AS lq"
    )
    sums = logs.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.sum("lq").cast("long").alias("sum_log_micro"),
    )
    return (
        detmath.apply_stages(sums, _ATK_EXP_STAGES)
        .selectExpr(
            "segment",
            "n_customers",
            "total_cents",
            "sum_log_micro",
            f"{_ATK_FINAL} AS atkinson_micro",
        )
        .orderBy("segment")
    )
