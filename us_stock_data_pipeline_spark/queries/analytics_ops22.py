"""Round-9 stock additions, part 22: candlestick pattern flags,
overnight-gap follow-through, and SAX-style symbolic discretization.

Daily OHLC bars derive from events exactly as the rest of the bars_*
family (event_type = symbol, arg_min/arg_max by event_id for
open/close, exact integer cents) — the analytical layer the reference
pipeline's stored bars (1m-seesion-pipeline/ingest_1m_session.py:242-256)
exist to feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# Shared daily-OHLC CTE (cents; open/close = first/last by event_id).
_OHLC_SQL = """
ohlc AS (
  SELECT event_type AS symbol,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_min(value, event_id) * 100) AS BIGINT) AS o,
         CAST(max(round(value * 100)) AS BIGINT) AS h,
         CAST(min(round(value * 100)) AS BIGINT) AS l,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
)
"""


def _ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100)
    return ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.min_by("value", "event_id") * 100).cast("long").alias("o"),
        F.max(cents).cast("long").alias("h"),
        F.min(cents).cast("long").alias("l"),
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"),
    )


# --------------------------------------------------------------------------
# Candlestick pattern flags: doji / hammer / bullish engulfing
# --------------------------------------------------------------------------

_CANDLE_ORACLE = f"""
WITH {_OHLC_SQL},
flags AS (
  SELECT symbol, day, o, h, l, c,
         abs(c - o) AS body, h - l AS rng,
         h - greatest(o, c) AS upsh,
         least(o, c) - l AS losh,
         lag(o) OVER w AS po, lag(c) OVER w AS pc
  FROM ohlc
  WINDOW w AS (PARTITION BY symbol ORDER BY day)
)
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(CASE WHEN rng > 0 AND body * 10 <= rng THEN 1 ELSE 0 END)
            AS BIGINT) AS n_doji,
       CAST(sum(CASE WHEN rng > 0 AND losh >= 2 * body AND upsh <= body
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hammer,
       CAST(sum(CASE WHEN pc IS NOT NULL AND pc < po AND c > o
                     AND o <= pc AND c >= po THEN 1 ELSE 0 END)
            AS BIGINT) AS n_bull_engulf
FROM flags
GROUP BY symbol
ORDER BY symbol
"""


@register("bars_candlestick_patterns", oracle=_CANDLE_ORACLE, tags=("stock", "window"))
def bars_candlestick_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candlestick pattern screen over daily bars: doji (body <= 10%
    of range), hammer (lower shadow >= 2x body, upper shadow <= body)
    and bullish engulfing (green body that spans yesterday's red
    body) — the rule-based pattern vocabulary chartists run over
    exactly the OHLC bars the reference pipeline stores, and the
    discrete-flag cousin of `bars_pattern_vreversal`'s multi-day
    shape match. Every predicate is an exact integer-cent comparison
    (greatest/least/abs on BIGINT), so pattern counts cannot drift
    between engines. Plan: calendar-bounded daily rollup, one lag
    window sharing the (symbol, day) shuffle, tiny per-symbol
    rollup — pattern evaluation is embarrassingly parallel at any
    symbol count."""
    ohlc = _ohlc(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("day")
    flags = ohlc.select(
        "symbol",
        "day",
        "o",
        "c",
        (F.abs(F.col("c") - F.col("o"))).alias("body"),
        (F.col("h") - F.col("l")).alias("rng"),
        (F.col("h") - F.greatest("o", "c")).alias("upsh"),
        (F.least("o", "c") - F.col("l")).alias("losh"),
        F.lag("o").over(w).alias("po"),
        F.lag("c").over(w).alias("pc"),
    )
    return (
        flags.groupBy("symbol")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum(
                F.when((F.col("rng") > 0) & (F.col("body") * 10 <= F.col("rng")), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_doji"),
            F.sum(
                F.when(
                    (F.col("rng") > 0)
                    & (F.col("losh") >= 2 * F.col("body"))
                    & (F.col("upsh") <= F.col("body")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_hammer"),
            F.sum(
                F.when(
                    F.col("pc").isNotNull()
                    & (F.col("pc") < F.col("po"))
                    & (F.col("c") > F.col("o"))
                    & (F.col("o") <= F.col("pc"))
                    & (F.col("c") >= F.col("po")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_bull_engulf"),
        )
        .orderBy("symbol")
    )


# --------------------------------------------------------------------------
# Overnight gap classification + follow-through rate
# --------------------------------------------------------------------------

_GAP_BP = 20  # gap threshold in basis points of prior close

_GAP_ORACLE = f"""
WITH {_OHLC_SQL},
gaps AS (
  SELECT symbol, day, o, c,
         lag(c) OVER (PARTITION BY symbol ORDER BY day) AS pc
  FROM ohlc
),
cls AS (
  SELECT symbol,
         CASE WHEN o > pc AND (o - pc) * 10000 // pc >= {_GAP_BP} THEN 1 ELSE 0 END AS up,
         CASE WHEN o < pc AND (pc - o) * 10000 // pc >= {_GAP_BP} THEN 1 ELSE 0 END AS dn,
         CASE WHEN c >= o THEN 1 ELSE 0 END AS closed_up,
         CASE WHEN c <= o THEN 1 ELSE 0 END AS closed_dn
  FROM gaps WHERE pc IS NOT NULL AND pc > 0
)
SELECT symbol,
       CAST(sum(up) AS BIGINT) AS n_gap_up,
       CAST(sum(up * closed_up) AS BIGINT) AS n_up_follow,
       CAST(CASE WHEN sum(up) > 0
                 THEN sum(up * closed_up) * 1000 // sum(up) ELSE 0 END
            AS BIGINT) AS up_follow_permille,
       CAST(sum(dn) AS BIGINT) AS n_gap_dn,
       CAST(sum(dn * closed_dn) AS BIGINT) AS n_dn_follow,
       CAST(CASE WHEN sum(dn) > 0
                 THEN sum(dn * closed_dn) * 1000 // sum(dn) ELSE 0 END
            AS BIGINT) AS dn_follow_permille
FROM cls
GROUP BY symbol
ORDER BY symbol
"""


@register("bars_gap_followthrough", oracle=_GAP_ORACLE, tags=("stock", "window"))
def bars_gap_followthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overnight-gap study: classify each day as gap-up / gap-down
    when the open moves >= {_GAP_BP} bp away from the prior close,
    then measure follow-through — did the session close in the gap's
    direction? — the day-trader base-rate table ("do gap-ups fade?").
    Gap magnitude is an integer basis-point division kept on the
    positive axis (separate up/down branches), so classification is
    exact on both engines; follow-through rates are integer permille.
    Plan: daily rollup, one lag on the shared (symbol, day) shuffle,
    per-symbol conditional sums — same single-shuffle profile as
    every bars_* window query."""
    ohlc = _ohlc(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("day")
    gaps = ohlc.select(
        "symbol", "day", "o", "c", F.lag("c").over(w).alias("pc")
    ).filter(F.col("pc").isNotNull() & (F.col("pc") > 0))
    cls = gaps.select(
        "symbol",
        F.when(
            (F.col("o") > F.col("pc"))
            & (F.expr(f"(o - pc) * 10000 div pc") >= _GAP_BP),
            1,
        )
        .otherwise(0)
        .alias("up"),
        F.when(
            (F.col("o") < F.col("pc"))
            & (F.expr(f"(pc - o) * 10000 div pc") >= _GAP_BP),
            1,
        )
        .otherwise(0)
        .alias("dn"),
        F.when(F.col("c") >= F.col("o"), 1).otherwise(0).alias("closed_up"),
        F.when(F.col("c") <= F.col("o"), 1).otherwise(0).alias("closed_dn"),
    )
    return (
        cls.groupBy("symbol")
        .agg(
            F.sum("up").cast("long").alias("n_gap_up"),
            F.sum(F.col("up") * F.col("closed_up")).cast("long").alias("n_up_follow"),
            F.expr(
                "CAST(CASE WHEN sum(up) > 0"
                " THEN sum(up * closed_up) * 1000 div sum(up) ELSE 0 END AS BIGINT)"
            ).alias("up_follow_permille"),
            F.sum("dn").cast("long").alias("n_gap_dn"),
            F.sum(F.col("dn") * F.col("closed_dn")).cast("long").alias("n_dn_follow"),
            F.expr(
                "CAST(CASE WHEN sum(dn) > 0"
                " THEN sum(dn * closed_dn) * 1000 div sum(dn) ELSE 0 END AS BIGINT)"
            ).alias("dn_follow_permille"),
        )
        .orderBy("symbol")
    )


# --------------------------------------------------------------------------
# SAX-style symbolic discretization of the close series
# --------------------------------------------------------------------------

_SAX_ORACLE = f"""
WITH {_OHLC_SQL},
brk AS (
  SELECT symbol,
         CAST(quantile_disc(c, 0.25) AS BIGINT) AS q1,
         CAST(quantile_disc(c, 0.50) AS BIGINT) AS q2,
         CAST(quantile_disc(c, 0.75) AS BIGINT) AS q3
  FROM ohlc GROUP BY symbol
),
sym AS (
  SELECT o.symbol, o.day,
         CASE WHEN o.c <= b.q1 THEN 'a'
              WHEN o.c <= b.q2 THEN 'b'
              WHEN o.c <= b.q3 THEN 'c'
              ELSE 'd' END AS letter
  FROM ohlc o JOIN brk b ON b.symbol = o.symbol
)
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(CASE WHEN letter = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       CAST(sum(CASE WHEN letter = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       CAST(sum(CASE WHEN letter = 'c' THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
       CAST(sum(CASE WHEN letter = 'd' THEN 1 ELSE 0 END) AS BIGINT) AS n_d,
       substr(string_agg(letter, '' ORDER BY day), 1, 120) AS sax_prefix
FROM sym
GROUP BY symbol
ORDER BY symbol
"""


@register("timeseries_symbolic_sax", oracle=_SAX_ORACLE, tags=("timeseries", "text"))
def timeseries_symbolic_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX-style symbolic discretization: each daily close maps to a
    letter a-d by its position against the symbol's own quartile
    breakpoints (percentile_disc on exact cents — a value the data
    actually contains, so both engines pick the identical breakpoint
    with no interpolation), and the per-symbol letter sequence
    becomes a compact string — the representation that turns a
    numeric series into n-gram-able text, bridging the timeseries
    family into the corpus operators (motif mining on `sax_prefix`
    is `text_ngram_novelty` on a different alphabet). The ordered
    concat is deterministic (struct-sort by day, the
    `agg_string_concat` rule). Plan: daily rollup, tiny per-symbol
    breakpoint table broadcast back onto the daily rows, one
    per-symbol collect bounded by the calendar."""
    ohlc = _ohlc(spark, sf_dir)
    brk = ohlc.groupBy(F.col("symbol").alias("bsymbol")).agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY c)").cast("long").alias("q1"),
        F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY c)").cast("long").alias("q2"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY c)").cast("long").alias("q3"),
    )
    sym = ohlc.join(F.broadcast(brk), ohlc.symbol == brk.bsymbol).select(
        "symbol",
        "day",
        F.when(F.col("c") <= F.col("q1"), "a")
        .when(F.col("c") <= F.col("q2"), "b")
        .when(F.col("c") <= F.col("q3"), "c")
        .otherwise("d")
        .alias("letter"),
    )
    return (
        sym.groupBy("symbol")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum(F.when(F.col("letter") == "a", 1).otherwise(0)).cast("long").alias("n_a"),
            F.sum(F.when(F.col("letter") == "b", 1).otherwise(0)).cast("long").alias("n_b"),
            F.sum(F.when(F.col("letter") == "c", 1).otherwise(0)).cast("long").alias("n_c"),
            F.sum(F.when(F.col("letter") == "d", 1).otherwise(0)).cast("long").alias("n_d"),
            F.substring(
                F.array_join(
                    F.expr(
                        "transform(array_sort(collect_list(struct(day, letter))),"
                        " s -> s.letter)"
                    ),
                    "",
                ),
                1,
                120,
            ).alias("sax_prefix"),
        )
        .orderBy("symbol")
    )
