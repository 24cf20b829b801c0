"""Round-80 analytics, part 74: Money Flow Index and the McNemar
paired-proportions test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Money Flow Index (volume-weighted RSI, period 14)
# --------------------------------------------------------------------------

_MFI_N = 14

_MFI_ORACLE = f"""
WITH bars AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(max(value) * 100) AS BIGINT) AS h,
         CAST(round(min(value) * 100) AS BIGINT) AS l,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c,
         CAST(count(*) AS BIGINT) AS v
  FROM bars_src GROUP BY 1, 2
),
flows AS (
  -- typical price carried at 3x (h+l+c, exact int); raw flow = tp3 * v;
  -- sign by tp3 vs previous tp3, unchanged days drop out (standard MFI)
  SELECT symbol, day,
         CASE WHEN h + l + c > lag(h + l + c) OVER w
              THEN (h + l + c) * v ELSE 0 END AS pos3,
         CASE WHEN h + l + c < lag(h + l + c) OVER w
              THEN (h + l + c) * v ELSE 0 END AS neg3,
         row_number() OVER w AS rn
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY day)
),
winsum AS (
  SELECT symbol, day, rn,
         sum(pos3) OVER f AS pos, sum(neg3) OVER f AS neg
  FROM flows
  WINDOW f AS (PARTITION BY symbol ORDER BY day
               ROWS BETWEEN {_MFI_N - 1} PRECEDING AND CURRENT ROW)
)
SELECT symbol, day, CAST(pos AS BIGINT) AS pos_flow3, CAST(neg AS BIGINT) AS neg_flow3,
       CAST(CASE WHEN pos + neg = 0 THEN -1
                 ELSE pos * 10000 // (pos + neg) END AS BIGINT) AS mfi_bp
FROM winsum
WHERE rn > {_MFI_N}
ORDER BY symbol, day
""".replace("bars_src", "events")


@register("bars_money_flow_index", oracle=_MFI_ORACLE, tags=("stock", "window"))
def bars_money_flow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money Flow Index (period {_MFI_N}): the volume-weighted RSI —
    typical-price money flow (TP x volume) splits into positive/
    negative by TP direction and MFI = 100 x pos / (pos + neg) over
    the window. RSI (`bars_rsi_cutler`) sees only closes; MFI catches
    divergences where price rises on thin volume. Exactness: TP
    carries at 3x (h+l+c, exact cents), flows are exact BIGINT
    products, and the index quantizes to basis points with positive-
    only integer division; unchanged-TP days contribute to neither
    side, per the standard definition. One (symbol, day) sort carries
    the lag, both rolling sums, and the warmup gate — a single shuffle
    after the daily rollup, O({_MFI_N}) window state at any scale."""
    ev = load_table(spark, sf_dir, "events")
    bars = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.max("value") * 100).cast("long").alias("h"),
        F.round(F.min("value") * 100).cast("long").alias("l"),
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    w = Window.partitionBy("symbol").orderBy("day")
    tp3 = F.col("h") + F.col("l") + F.col("c")
    prev_tp3 = F.lag(tp3).over(w)
    flows = bars.select(
        "symbol",
        "day",
        F.when(tp3 > prev_tp3, tp3 * F.col("v")).otherwise(F.lit(0)).alias("pos3"),
        F.when(tp3 < prev_tp3, tp3 * F.col("v")).otherwise(F.lit(0)).alias("neg3"),
        F.row_number().over(w).alias("rn"),
    )
    w_f = Window.partitionBy("symbol").orderBy("day").rowsBetween(-(_MFI_N - 1), 0)
    winsum = flows.select(
        "symbol",
        "day",
        "rn",
        F.sum("pos3").over(w_f).alias("pos"),
        F.sum("neg3").over(w_f).alias("neg"),
    )
    den = F.col("pos") + F.col("neg")
    return (
        winsum.filter(F.col("rn") > _MFI_N)
        .select(
            "symbol",
            "day",
            F.col("pos").cast("long").alias("pos_flow3"),
            F.col("neg").cast("long").alias("neg_flow3"),
            F.when(den == 0, F.lit(-1))
            .otherwise(F.expr("pos * 10000 div (pos + neg)"))
            .cast("long")
            .alias("mfi_bp"),
        )
        .orderBy("symbol", "day")
    )


# --------------------------------------------------------------------------
# McNemar test: paired year-over-year customer activity
# --------------------------------------------------------------------------

_MCNEMAR_ORACLE = """
WITH yr AS (SELECT min(year(o_orderdate)) AS y0 FROM orders),
flags AS (
  SELECT c.c_custkey,
         max(CASE WHEN year(o.o_orderdate) = (SELECT y0 FROM yr)
                  THEN 1 ELSE 0 END) AS a1,
         max(CASE WHEN year(o.o_orderdate) = (SELECT y0 FROM yr) + 1
                  THEN 1 ELSE 0 END) AS a2
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
),
cells AS (
  SELECT CAST(sum(a1 * a2) AS BIGINT) AS both_active,
         CAST(sum(a1 * (1 - a2)) AS BIGINT) AS b_only_first,
         CAST(sum((1 - a1) * a2) AS BIGINT) AS c_only_second,
         CAST(sum((1 - a1) * (1 - a2)) AS BIGINT) AS neither
  FROM flags
)
SELECT both_active, b_only_first, c_only_second, neither,
       CAST(floor(CAST((b_only_first - c_only_second)
                       * (b_only_first - c_only_second) AS DOUBLE)
                  / (b_only_first + c_only_second) * 1000 + 0.5) AS BIGINT)
         AS chi2_milli,
       CAST(floor(CAST((abs(b_only_first - c_only_second) - 1)
                       * (abs(b_only_first - c_only_second) - 1) AS DOUBLE)
                  / (b_only_first + c_only_second) * 1000 + 0.5) AS BIGINT)
         AS chi2_corrected_milli
FROM cells
"""


@register("stats_mcnemar_paired", oracle=_MCNEMAR_ORACLE, tags=("stats", "analytics"))
def stats_mcnemar_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on paired customer activity: did the SAME
    customers who were active in the fixture's first order-year stay
    active in the next? The pairing makes this different from the
    two-proportion z-test (`events_ab_test_lift`) — concordant pairs
    (active-active, inactive-inactive) carry no information; only the
    discordant counts b (churned) and c (activated) enter chi2 =
    (b-c)^2/(b+c), with Edwards' continuity-corrected twin
    (|b-c|-1)^2/(b+c) alongside. Exactness: the 2x2 cells are exact
    integer sums off one left join + groupBy; the statistic is one
    double division quantized to milli. The base year pins to
    min(year) from the data itself so the query is fixture-agnostic.
    Plan: broadcast-size scalar for the year bound, one customer-
    orders shuffle, then a single-row aggregate."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    y0 = o.agg(F.min(F.year("o_orderdate")).alias("y0"))
    flags = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .crossJoin(F.broadcast(y0))
        .groupBy("c_custkey")
        .agg(
            F.max(
                F.when(F.year("o_orderdate") == F.col("y0"), 1).otherwise(0)
            ).alias("a1"),
            F.max(
                F.when(F.year("o_orderdate") == F.col("y0") + 1, 1).otherwise(0)
            ).alias("a2"),
        )
    )
    cells = flags.agg(
        F.sum(F.col("a1") * F.col("a2")).cast("long").alias("both_active"),
        F.sum(F.col("a1") * (1 - F.col("a2"))).cast("long").alias("b_only_first"),
        F.sum((1 - F.col("a1")) * F.col("a2")).cast("long").alias("c_only_second"),
        F.sum((1 - F.col("a1")) * (1 - F.col("a2"))).cast("long").alias("neither"),
    )
    b, cc = F.col("b_only_first"), F.col("c_only_second")
    return cells.select(
        "both_active",
        "b_only_first",
        "c_only_second",
        "neither",
        F.floor(((b - cc) * (b - cc)).cast("double") / (b + cc) * 1000 + F.lit(0.5))
        .cast("long")
        .alias("chi2_milli"),
        F.floor(
            ((F.abs(b - cc) - 1) * (F.abs(b - cc) - 1)).cast("double")
            / (b + cc)
            * 1000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("chi2_corrected_milli"),
    )
