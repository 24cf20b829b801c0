"""Round-85 analytics, part 79: Vortex indicator and Bhattacharyya
distribution distance between segment spend histograms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Vortex indicator (VI+ / VI-, period 14)
# --------------------------------------------------------------------------

_VI_N = 14

_VORTEX_ORACLE = f"""
WITH bars AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(max(value) * 100) AS BIGINT) AS h,
         CAST(round(min(value) * 100) AS BIGINT) AS l,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
mv AS (
  SELECT symbol, day,
         abs(h - lag(l) OVER w) AS vm_plus,
         abs(l - lag(h) OVER w) AS vm_minus,
         greatest(h - l, abs(h - lag(c) OVER w), abs(l - lag(c) OVER w)) AS tr,
         row_number() OVER w AS rn
  FROM bars WINDOW w AS (PARTITION BY symbol ORDER BY day)
),
winsum AS (
  SELECT symbol, day, rn,
         sum(vm_plus) OVER f AS svp, sum(vm_minus) OVER f AS svm,
         sum(tr) OVER f AS str
  FROM mv WHERE rn > 1
  WINDOW f AS (PARTITION BY symbol ORDER BY day
               ROWS BETWEEN {_VI_N - 1} PRECEDING AND CURRENT ROW)
)
SELECT symbol, day,
       CAST(svp AS BIGINT) AS vm_plus_sum, CAST(svm AS BIGINT) AS vm_minus_sum,
       CAST(str AS BIGINT) AS tr_sum,
       CAST(svp * 10000 // str AS BIGINT) AS vi_plus_bp,
       CAST(svm * 10000 // str AS BIGINT) AS vi_minus_bp
FROM winsum
WHERE rn > {_VI_N}
ORDER BY symbol, day
"""


@register("bars_vortex_indicator", oracle=_VORTEX_ORACLE, tags=("stock", "window"))
def bars_vortex_indicator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vortex indicator (period {_VI_N}): VI+ = sum|high - prev_low| /
    sum TR and VI- = sum|low - prev_high| / sum TR — the trend-reversal
    detector that reads upward and downward range crossings separately
    and fires on their crossover (ATR, in `bars_atr`, collapses both
    into one magnitude; the vortex keeps the direction). Exactness:
    vortex movements and true range are exact integer cents off one
    lag; the two ratios quantize to basis points with positive-only
    integer division against the shared TR denominator. The rolling
    sums start at the SECOND bar (the first has no previous close) and
    gate on a full {_VI_N}-bar window — note the window numbers rows
    AFTER the rn > 1 filter would shift them, so the gate reuses the
    original bar index. One (symbol, day) sort carries everything."""
    ev = load_table(spark, sf_dir, "events")
    bars = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.max("value") * 100).cast("long").alias("h"),
        F.round(F.min("value") * 100).cast("long").alias("l"),
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"),
    )
    w = Window.partitionBy("symbol").orderBy("day")
    mv = bars.select(
        "symbol",
        "day",
        F.abs(F.col("h") - F.lag("l").over(w)).alias("vm_plus"),
        F.abs(F.col("l") - F.lag("h").over(w)).alias("vm_minus"),
        F.greatest(
            F.col("h") - F.col("l"),
            F.abs(F.col("h") - F.lag("c").over(w)),
            F.abs(F.col("l") - F.lag("c").over(w)),
        ).alias("tr"),
        F.row_number().over(w).alias("rn"),
    )
    w_f = Window.partitionBy("symbol").orderBy("day").rowsBetween(-(_VI_N - 1), 0)
    winsum = mv.filter(F.col("rn") > 1).select(
        "symbol",
        "day",
        "rn",
        F.sum("vm_plus").over(w_f).alias("svp"),
        F.sum("vm_minus").over(w_f).alias("svm"),
        F.sum("tr").over(w_f).alias("str"),
    )
    return (
        winsum.filter(F.col("rn") > _VI_N)
        .select(
            "symbol",
            "day",
            F.col("svp").cast("long").alias("vm_plus_sum"),
            F.col("svm").cast("long").alias("vm_minus_sum"),
            F.col("str").cast("long").alias("tr_sum"),
            F.expr("svp * 10000 div str").cast("long").alias("vi_plus_bp"),
            F.expr("svm * 10000 div str").cast("long").alias("vi_minus_bp"),
        )
        .orderBy("symbol", "day")
    )


# --------------------------------------------------------------------------
# Bhattacharyya distance between segment spend distributions
# --------------------------------------------------------------------------

_BH_BIN_CENTS = 5_000_000  # $50k histogram bins

_BHATTACHARYYA_ORACLE = f"""
WITH spend AS (
  SELECT c.c_mktsegment AS seg,
         CAST(round(o.o_totalprice * 100) AS BIGINT) // {_BH_BIN_CENTS} AS bin
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
),
hist AS (SELECT seg, bin, CAST(count(*) AS BIGINT) AS n FROM spend GROUP BY seg, bin),
tot AS (SELECT seg, CAST(sum(n) AS BIGINT) AS t FROM hist GROUP BY seg),
pairs AS (
  SELECT a.seg AS seg_a, b.seg AS seg_b, a.bin,
         -- per-bin sqrt(p*q) quantized to exact integer micro BEFORE the
         -- sum, so the coefficient is an order-free integer aggregate
         CAST(floor(sqrt(CAST(a.n AS DOUBLE) / ta.t * b.n / tb.t) * 1000000
                    + 0.5) AS BIGINT) AS term_micro
  FROM hist a
  JOIN hist b ON b.bin = a.bin AND b.seg > a.seg
  JOIN tot ta ON ta.seg = a.seg
  JOIN tot tb ON tb.seg = b.seg
)
SELECT seg_a, seg_b,
       CAST(count(*) AS BIGINT) AS shared_bins,
       CAST(sum(term_micro) AS BIGINT) AS bc_micro,
       CAST(floor(-ln(CAST(sum(term_micro) AS DOUBLE) / 1000000) * 1000000 + 0.5)
         AS BIGINT) AS bhattacharyya_micro
FROM pairs
GROUP BY seg_a, seg_b
ORDER BY seg_a, seg_b
"""


@register("stats_bhattacharyya_distance", oracle=_BHATTACHARYYA_ORACLE, tags=("stats", "drift"))
def stats_bhattacharyya_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bhattacharyya distance between every pair of market segments'
    order-value distributions: BC = sum_i sqrt(p_i q_i) over shared
    histogram bins, D_B = -ln BC — the overlap-based distribution
    distance that (unlike `corpus_js_divergence`'s JSD) directly
    bounds Bayes classification error and never needs smoothing for
    zero bins (they just drop from the sum). Exactness: each bin's
    sqrt(p q) quantizes to integer micro BEFORE the aggregate, making
    the sum order-free; the single -ln assembles from that exact sum.
    Plan: one fact shuffle into a (segment, bin) histogram —
    cardinality-bounded regardless of tape size — then a self-join on
    bin over that tiny table; the quadratic term is segments^2 x bins,
    never rows^2 (the histogram-first discipline all drift metrics
    here share)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    spend = c.join(o, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.expr(f"CAST(round(o_totalprice * 100) AS BIGINT) div {_BH_BIN_CENTS}").alias("bin"),
    )
    hist = spend.groupBy("seg", "bin").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = hist.groupBy("seg").agg(F.sum("n").cast("long").alias("t"))
    a = (
        hist.join(tot, "seg")
        .select(
            F.col("seg").alias("seg_a"), "bin", F.col("n").alias("na"), F.col("t").alias("ta")
        )
    )
    b = (
        hist.join(tot, "seg")
        .select(
            F.col("seg").alias("seg_b"), "bin", F.col("n").alias("nb"), F.col("t").alias("tb")
        )
    )
    pairs = a.join(b, (a.bin == b.bin) & (F.col("seg_b") > F.col("seg_a"))).select(
        "seg_a",
        "seg_b",
        F.floor(
            F.sqrt(
                F.col("na").cast("double") / F.col("ta") * F.col("nb") / F.col("tb")
            )
            * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("term_micro"),
    )
    return (
        pairs.groupBy("seg_a", "seg_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("shared_bins"),
            F.sum("term_micro").cast("long").alias("bc_micro"),
            F.floor(
                -F.log(F.sum("term_micro").cast("double") / 1000000) * 1000000 + F.lit(0.5)
            )
            .cast("long")
            .alias("bhattacharyya_micro"),
        )
        .orderBy("seg_a", "seg_b")
    )
