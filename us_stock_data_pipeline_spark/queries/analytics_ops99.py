"""Round-109 analytics, part 99: NR7 range-contraction pattern and a
deterministic source-interleaved dataloader plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# NR7: narrowest range of the last 7 bars (volatility-contraction setup)
# --------------------------------------------------------------------------

_NR_N = 7

_NR7_ORACLE = f"""
WITH bars AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(max(value) * 100) AS BIGINT)
         - CAST(round(min(value) * 100) AS BIGINT) AS range_cents
  FROM events GROUP BY event_type, date_trunc('day', ts)
),
win AS (
  SELECT symbol, day, range_cents,
         min(range_cents) OVER f AS min_range,
         row_number() OVER (PARTITION BY symbol ORDER BY day) AS rn
  FROM bars
  WINDOW f AS (PARTITION BY symbol ORDER BY day
               ROWS BETWEEN {_NR_N - 1} PRECEDING AND CURRENT ROW)
),
flagged AS (
  SELECT symbol, day, range_cents,
         CASE WHEN range_cents = min_range THEN 1 ELSE 0 END AS is_nr7
  FROM win WHERE rn >= {_NR_N}
)
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(is_nr7) AS BIGINT) AS n_nr7_days,
       CAST(min(CASE WHEN is_nr7 = 1 THEN range_cents END) AS BIGINT)
         AS tightest_nr7_cents,
       CAST(max(CASE WHEN is_nr7 = 1 THEN day END) AS DATE) AS last_nr7_day
FROM flagged
GROUP BY symbol
ORDER BY symbol
"""


@register("bars_nr7_contraction", oracle=_NR7_ORACLE, tags=("stock", "pattern", "window"))
def bars_nr7_contraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NR7 volatility-contraction screen: a bar whose high-low range
    is the NARROWEST of the trailing {_NR_N} — the classic setup
    pattern (contraction precedes expansion) that breakout systems
    like `bars_donchian_breakout` use as an entry filter, and the
    mirror image of what ATR (`bars_atr`) smooths away. The current
    bar qualifies when its range equals the {_NR_N}-bar rolling min
    (a <= comparison, so ties with an earlier equal-range bar still
    flag — the standard screener convention). Exact integer cents
    throughout; output is the per-symbol NR7 frequency, the tightest
    flagged range, and the most recent setup day. One (symbol, day)
    sort carries the rolling min, the warmup gate, and the flag."""
    ev = load_table(spark, sf_dir, "events")
    bars = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        (F.round(F.max("value") * 100).cast("long") - F.round(F.min("value") * 100).cast("long")).alias(
            "range_cents"
        )
    )
    w = Window.partitionBy("symbol").orderBy("day")
    w_f = w.rowsBetween(-(_NR_N - 1), 0)
    flagged = (
        bars.select(
            "symbol",
            "day",
            "range_cents",
            F.min("range_cents").over(w_f).alias("min_range"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") >= _NR_N)
        .select(
            "symbol",
            "day",
            "range_cents",
            F.when(F.col("range_cents") == F.col("min_range"), 1).otherwise(0).alias("is_nr7"),
        )
    )
    return (
        flagged.groupBy("symbol")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("is_nr7").cast("long").alias("n_nr7_days"),
            F.min(F.when(F.col("is_nr7") == 1, F.col("range_cents")))
            .cast("long")
            .alias("tightest_nr7_cents"),
            F.max(F.when(F.col("is_nr7") == 1, F.col("day"))).alias("last_nr7_day"),
        )
        .orderBy("symbol")
    )


# --------------------------------------------------------------------------
# Deterministic dataloader plan: proportional source interleave
# --------------------------------------------------------------------------

_INTERLEAVE_ORACLE = """
WITH ranked AS (
  -- deterministic within-source order by content hash, then a
  -- progress fraction that interleaves sources proportionally:
  -- doc k of n reads at position (2k-1)/(2n) of its source's span
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id)
           AS k,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents
)
SELECT CAST(row_number() OVER (ORDER BY (2 * k - 1) * 1000000 // (2 * n),
                               source, k) AS BIGINT) AS read_pos,
       doc_id, source,
       CAST(k AS BIGINT) AS within_source_idx,
       CAST((2 * k - 1) * 1000000 // (2 * n) AS BIGINT) AS progress_micro
FROM ranked
QUALIFY read_pos <= 100
ORDER BY read_pos
"""


@register("data_loader_interleave_plan", oracle=_INTERLEAVE_ORACLE, tags=("llm", "assembly"))
def data_loader_interleave_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic proportional-interleave dataloader plan: order the
    whole corpus so that every source advances through its documents
    at the same RATE — doc k of n sits at progress (2k-1)/(2n), and
    the global read order sorts by that fraction — the stratified
    round-robin every multi-source trainer wants (a naive
    concatenation reads source A for an epoch then source B, wrecking
    the mixing that `corpus_mixture_sample` established; shuffling
    breaks reproducibility). Within-source order is content-hash
    ranked (deterministic, shuffle-like); ties on progress break by
    (source, k). First 100 read positions emit. All integer
    arithmetic (positive //). Plan: one per-source ranking window,
    one global sort of rank metadata — the documents' text never
    moves, only the plan rows."""
    d = load_table(spark, sf_dir, "documents")
    w_src = Window.partitionBy("source").orderBy(F.md5("text"), "doc_id")
    w_n = Window.partitionBy("source")
    ranked = d.select(
        "doc_id",
        "source",
        F.row_number().over(w_src).alias("k"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    ).select(
        "doc_id",
        "source",
        "k",
        F.expr("(2 * k - 1) * 1000000 div (2 * n)").alias("progress_micro"),
    )
    w_glob = Window.orderBy("progress_micro", "source", "k")
    return (
        ranked.select(
            F.row_number().over(w_glob).cast("long").alias("read_pos"),
            "doc_id",
            "source",
            F.col("k").cast("long").alias("within_source_idx"),
            F.col("progress_micro").cast("long").alias("progress_micro"),
        )
        .filter(F.col("read_pos") <= 100)
        .orderBy("read_pos")
    )
