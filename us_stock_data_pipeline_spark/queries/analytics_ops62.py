"""Round-63 analytics, part 62: binary-segmentation changepoint and
Bandt-Pompe permutation entropy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Binary segmentation: the single best mean-shift split of daily revenue
# --------------------------------------------------------------------------

_BINSEG_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
idx AS (
  SELECT day, cents,
         row_number() OVER (ORDER BY day) AS i,
         CAST(sum(cents) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS ps,
         CAST(sum(CAST(cents AS HUGEINT) * cents) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS pss
  FROM daily
),
tot AS (
  SELECT CAST(max(i) AS BIGINT) AS n, max_by(ps, i) AS s, max_by(pss, i) AS ss
  FROM idx
),
gains AS (
  SELECT x.day, x.i AS k, t.n,
         CAST(x.ps AS BIGINT) AS s_left,
         -- gain = SSE_total - SSE_left - SSE_right, each SSE = SS - S^2/n
         (CAST(x.ps AS DOUBLE) * CAST(x.ps AS DOUBLE) / x.i
          + (CAST(t.s AS DOUBLE) - CAST(x.ps AS DOUBLE))
            * (CAST(t.s AS DOUBLE) - CAST(x.ps AS DOUBLE)) / (t.n - x.i)
          - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE) / t.n) AS gain,
         (CAST(t.ss AS DOUBLE) - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE) / t.n)
           AS sse_total
  FROM idx x CROSS JOIN tot t
  WHERE x.i < t.n
),
ranked AS (
  SELECT day, k, n, s_left, gain, sse_total,
         -- rank on the BOUNDED gain/SSE ratio (raw gain is cents^2 ~ 1e19
         -- and overflows a BIGINT quantizer); e9 quantization + index
         -- tie-break keeps the argmax engine-identical
         row_number() OVER (ORDER BY
           CAST(floor(gain / sse_total * 1000000000 + 0.5) AS BIGINT) DESC, k) AS rnk
  FROM gains
)
SELECT day AS split_day, CAST(k AS BIGINT) AS n_left, CAST(n - k AS BIGINT) AS n_right,
       CAST(floor(gain / sse_total * 1000000 + 0.5) AS BIGINT) AS gain_ratio_e6
FROM ranked
WHERE rnk = 1 AND sse_total > 0
"""


@register("timeseries_changepoint_binseg", oracle=_BINSEG_ORACLE, tags=("timeseries", "stats"))
def timeseries_changepoint_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-segmentation changepoint: the single split of the daily
    revenue series that maximizes the between-segment SSE reduction —
    the offline regime-break locator (CUSUM in
    `timeseries_changepoint_cusum` DETECTS drift online; binseg
    LOCATES the break exactly, and iterating it on each half is the
    classic multi-changepoint algorithm). Every candidate split's
    gain derives from prefix sums (exact HUGEINT/decimal), evaluated
    as one fixed double expression; the argmax ranks on the BOUNDED
    gain/SSE ratio quantized to integer e9 with an index tie-break
    (raw gain is cents^2 ~ 1e19 and would overflow the quantizer),
    so both engines select the identical split even on collisions. Plan:
    date-grain aggregate, ONE cumulative window in day order, a
    broadcast total, a linear gain scan + top-1 — O(days), not
    O(days^2)."""
    od = load_table(spark, sf_dir, "orders")
    daily = od.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("cents")
    )
    w_cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec = "decimal(38,0)"
    idx = daily.select(
        "day",
        F.row_number().over(Window.orderBy("day")).alias("i"),
        F.sum("cents").over(w_cum).cast(dec).alias("ps"),
        F.sum(F.col("cents").cast(dec) * F.col("cents")).over(w_cum).cast(dec).alias("pss"),
    )
    tot = idx.agg(
        F.max("i").cast("long").alias("n"),
        F.max_by("ps", "i").alias("s"),
        F.max_by("pss", "i").alias("ss"),
    )
    g = idx.crossJoin(F.broadcast(tot)).filter(F.col("i") < F.col("n"))
    psd = F.col("ps").cast("double")
    sd = F.col("s").cast("double")
    gain = (
        psd * psd / F.col("i")
        + (sd - psd) * (sd - psd) / (F.col("n") - F.col("i"))
        - sd * sd / F.col("n")
    )
    sse_total = F.col("ss").cast("double") - sd * sd / F.col("n")
    gains = g.select(
        "day",
        F.col("i").alias("k"),
        "n",
        gain.alias("gain"),
        sse_total.alias("sse_total"),
    )
    w_rank = Window.orderBy(
        F.floor(F.col("gain") / F.col("sse_total") * 1_000_000_000 + F.lit(0.5))
        .cast("long")
        .desc(),
        F.col("k"),
    )
    return (
        gains.withColumn("rnk", F.row_number().over(w_rank))
        .filter((F.col("rnk") == 1) & (F.col("sse_total") > 0))
        .select(
            F.col("day").alias("split_day"),
            F.col("k").cast("long").alias("n_left"),
            (F.col("n") - F.col("k")).cast("long").alias("n_right"),
            F.floor(F.col("gain") / F.col("sse_total") * 1_000_000 + F.lit(0.5))
            .cast("long")
            .alias("gain_ratio_e6"),
        )
    )


# --------------------------------------------------------------------------
# Bandt-Pompe permutation entropy (order 3) per symbol
# --------------------------------------------------------------------------

# Tie rule: earlier position counts as smaller (the standard Bandt-Pompe
# order-of-appearance convention), so every triple maps to exactly one of
# the 6 permutation classes via strict "<" with positional tie-break.
_PERM_CASE = """
CASE
  WHEN x0 <= x1 AND x1 <= x2 THEN 0
  WHEN x0 <= x2 AND x2 <  x1 THEN 1
  WHEN x1 <  x0 AND x0 <= x2 THEN 2
  WHEN x2 <  x0 AND x0 <= x1 THEN 3
  WHEN x1 <= x2 AND x2 <  x0 THEN 4
  ELSE 5
END
"""

_PERM_ORACLE = f"""
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
triples AS (
  SELECT symbol, c AS x0,
         lead(c, 1) OVER w AS x1, lead(c, 2) OVER w AS x2
  FROM closes WINDOW w AS (PARTITION BY symbol ORDER BY day)
  QUALIFY lead(c, 2) OVER w IS NOT NULL
),
pats AS (
  SELECT symbol, {_PERM_CASE} AS pat FROM triples
),
counts AS (
  SELECT symbol, pat, CAST(count(*) AS BIGINT) AS c FROM pats GROUP BY symbol, pat
),
tot AS (
  SELECT symbol, CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS n_pats
  FROM counts GROUP BY symbol
),
terms AS (
  SELECT t.symbol,
         CAST(floor(
           -(CAST(t.c AS DOUBLE) / tt.n) * ln(CAST(t.c AS DOUBLE) / tt.n)
           / ln(6.0) * 1000000000 + 0.5) AS BIGINT) AS term_e9
  FROM counts t JOIN tot tt ON tt.symbol = t.symbol
)
SELECT t.symbol, tt.n AS n_triples, tt.n_pats,
       CAST(sum(t.term_e9) // 1000 AS BIGINT) AS perm_entropy_e6
FROM terms t JOIN tot tt ON tt.symbol = t.symbol
GROUP BY t.symbol, tt.n, tt.n_pats
ORDER BY t.symbol
"""


@register("timeseries_permutation_entropy", oracle=_PERM_ORACLE, tags=("timeseries", "stats"))
def timeseries_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bandt-Pompe permutation entropy (order 3, normalized by ln 6)
    per symbol: entropy of the ORDINAL pattern distribution of
    consecutive close triples — the complexity measure that is
    invariant to monotone transforms of price (unlike spectral or
    variance measures) and separates deterministic structure from
    noise with ~90 days of data; low PE plus `timeseries_hurst_
    exponent` far from 0.5 is the strongest simple evidence of
    exploitable dynamics. Ties map by order of appearance (the
    standard convention), so the 6-way CASE is exact on integer
    cents; per-pattern entropy terms quantize to integer e9 before
    the cross-pattern sum. Plan: one per-symbol window (two leads,
    one sort), a 6-row-per-symbol aggregate, broadcast joins."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
    w = Window.partitionBy("symbol").orderBy("day")
    triples = (
        closes.select(
            "symbol",
            F.col("c").alias("x0"),
            F.lead("c", 1).over(w).alias("x1"),
            F.lead("c", 2).over(w).alias("x2"),
        )
        .filter(F.col("x2").isNotNull())
    )
    pats = triples.select("symbol", F.expr(_PERM_CASE).alias("pat"))
    counts = pats.groupBy("symbol", "pat").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = counts.groupBy("symbol").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_pats"),
    )
    p = F.col("c").cast("double") / F.col("n")
    term = F.floor(-p * F.log(p) / F.log(F.lit(6.0)) * 1_000_000_000 + F.lit(0.5)).cast("long")
    terms = counts.join(F.broadcast(tot), "symbol").select(
        "symbol", term.alias("term_e9"), "n", "n_pats"
    )
    return (
        terms.groupBy("symbol", "n", "n_pats")
        .agg(F.floor(F.sum("term_e9") / 1000).cast("long").alias("perm_entropy_e6"))
        .select(
            "symbol",
            F.col("n").alias("n_triples"),
            "n_pats",
            "perm_entropy_e6",
        )
        .orderBy("symbol")
    )
