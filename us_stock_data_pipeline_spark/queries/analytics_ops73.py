"""Round-79 analytics, part 73: Chow structural-break test and the
accumulation/distribution line with Chaikin money flow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Chow test: structural break in the daily-close linear trend at midpoint
# --------------------------------------------------------------------------

_CHOW_ORACLE = """
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT symbol, c,
         row_number() OVER (PARTITION BY symbol ORDER BY day) AS i,
         count(*) OVER (PARTITION BY symbol) AS n
  FROM closes
),
seg AS (SELECT symbol, c, i, CASE WHEN i * 2 <= n THEN 1 ELSE 2 END AS s FROM idx),
-- BIGINT power sums; SSE evaluates in DOUBLE with a pinned association
-- (identical IEEE ops both engines): sse = cyy - cxy*cxy/cxx
sums_seg AS (
  SELECT symbol, s, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(i) AS BIGINT) AS sx, CAST(sum(c) AS BIGINT) AS sy,
         CAST(sum(i * i) AS BIGINT) AS sxx, CAST(sum(i * c) AS BIGINT) AS sxy,
         CAST(sum(c * c) AS BIGINT) AS syy
  FROM seg GROUP BY symbol, s
),
sse_seg AS (
  SELECT symbol, s, n,
         (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)
         - (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
           * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
           / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) AS sse
  FROM sums_seg
),
sums_all AS (
  SELECT symbol, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(i) AS BIGINT) AS sx, CAST(sum(c) AS BIGINT) AS sy,
         CAST(sum(i * i) AS BIGINT) AS sxx, CAST(sum(i * c) AS BIGINT) AS sxy,
         CAST(sum(c * c) AS BIGINT) AS syy
  FROM seg GROUP BY symbol
),
sse_all AS (
  SELECT symbol, n,
         (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)
         - (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
           * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
           / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) AS sse
  FROM sums_all
),
split AS (
  SELECT symbol, CAST(sum(sse) AS DOUBLE) AS sse_split FROM (
    SELECT symbol, sse FROM sse_seg ORDER BY symbol, s
  ) GROUP BY symbol
)
SELECT a.symbol, CAST(a.n AS BIGINT) AS n_days,
       CAST(floor(a.sse + 0.5) AS BIGINT) AS sse_pooled,
       CAST(floor(p.sse_split + 0.5) AS BIGINT) AS sse_split,
       CAST(floor((a.sse - p.sse_split) / 2 / (p.sse_split / (a.n - 4)) * 1000
                  + 0.5) AS BIGINT) AS chow_f_milli
FROM sse_all a JOIN split p ON p.symbol = a.symbol
ORDER BY a.symbol
"""


@register("stats_chow_break_test", oracle=_CHOW_ORACLE, tags=("stats", "timeseries"))
def stats_chow_break_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chow test for a structural break in each symbol's linear price
    trend at the sample midpoint: F = ((SSE_pooled - SSE_1 - SSE_2)/k)
    / ((SSE_1 + SSE_2)/(n - 2k)), k=2 — the regime-shift test that says
    whether ONE trend line or TWO fits the series (CUSUM/binseg locate
    a mean shift; Chow tests a SLOPE+intercept shift at a hypothesized
    point). Each segment's OLS SSE comes from BIGINT power sums (sums
    of i, c, i*i, i*c, c*c are exact); the SSE assembly would overflow
    int64 (Sxy^2 terms), so it evaluates in DOUBLE with a pinned
    left-to-right association — bit-identical in both engines — and
    quantizes once at the end. The sum of the two segment SSEs is
    ordered by segment id so even that float addition has a pinned
    order. Plan: one groupBy per (symbol, segment) — two map-side-
    combinable aggregates over the daily rollup, no joins on facts."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
    w = Window.partitionBy("symbol").orderBy("day")
    w_n = Window.partitionBy("symbol")
    idx = closes.select(
        "symbol",
        "c",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    seg = idx.select(
        "symbol", "c", "i", F.when(F.col("i") * 2 <= F.col("n"), 1).otherwise(2).alias("s")
    )

    def power_sums(df: DataFrame, keys: list[str]) -> DataFrame:
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("i").cast("long").alias("sx"),
            F.sum("c").cast("long").alias("sy"),
            F.sum(F.col("i") * F.col("i")).cast("long").alias("sxx"),
            F.sum(F.col("i") * F.col("c")).cast("long").alias("sxy"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("syy"),
        )

    def sse_col() -> F.Column:
        cyy = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / F.col("n")
        cxy = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy") / F.col("n")
        cxx = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / F.col("n")
        return cyy - cxy * cxy / cxx

    sse_seg = power_sums(seg, ["symbol", "s"]).select("symbol", "s", "n", sse_col().alias("sse"))
    # pinned segment order for the float sum: collect as (s, sse) sorted list
    split = (
        sse_seg.groupBy("symbol")
        .agg(F.array_sort(F.collect_list(F.struct("s", "sse"))).alias("pairs"))
        .select(
            "symbol",
            F.aggregate(
                "pairs", F.lit(0.0), lambda acc, x: acc + x["sse"]
            ).alias("sse_split"),
        )
    )
    sse_all = power_sums(seg, ["symbol"]).select("symbol", "n", sse_col().alias("sse"))
    return (
        sse_all.join(split, "symbol")
        .select(
            "symbol",
            F.col("n").cast("long").alias("n_days"),
            F.floor(F.col("sse") + F.lit(0.5)).cast("long").alias("sse_pooled"),
            F.floor(F.col("sse_split") + F.lit(0.5)).cast("long").alias("sse_split"),
            F.floor(
                (F.col("sse") - F.col("sse_split"))
                / 2
                / (F.col("sse_split") / (F.col("n") - 4))
                * 1000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("chow_f_milli"),
        )
        .orderBy("symbol")
    )


# --------------------------------------------------------------------------
# Accumulation/Distribution line + Chaikin Money Flow (20-day)
# --------------------------------------------------------------------------

_CMF_N = 20

_ADL_ORACLE = f"""
WITH bars AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(max(value) * 100) AS BIGINT) AS h,
         CAST(round(min(value) * 100) AS BIGINT) AS l,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c,
         CAST(count(*) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
mf AS (
  -- money-flow volume quantized micro: mult = ((C-L)-(H-C))/(H-L);
  -- numerator can be negative, so // (DuckDB) pairs with div (Spark) —
  -- both truncate toward zero
  SELECT symbol, day, v,
         CASE WHEN h = l THEN 0
              ELSE (2 * c - h - l) * v * 1000000 // (h - l) END AS mfv_micro,
         row_number() OVER (PARTITION BY symbol ORDER BY day) AS rn
  FROM bars
),
winset AS (
  -- windows compute over ALL rows; the warmup gate filters afterwards
  SELECT symbol, day, rn,
         sum(mfv_micro) OVER (PARTITION BY symbol ORDER BY day
                              ROWS UNBOUNDED PRECEDING) AS adl_micro,
         sum(mfv_micro) OVER w AS num,
         sum(v) OVER w * 1000 AS den
  FROM mf
  WINDOW w AS (PARTITION BY symbol ORDER BY day
               ROWS BETWEEN {_CMF_N - 1} PRECEDING AND CURRENT ROW)
)
SELECT symbol, day, CAST(adl_micro AS BIGINT) AS adl_micro,
       CAST(num // den AS BIGINT) AS cmf_milli
FROM winset
WHERE rn >= {_CMF_N}
ORDER BY symbol, day
"""


@register("bars_adl_chaikin_cmf", oracle=_ADL_ORACLE, tags=("stock", "window"))
def bars_adl_chaikin_cmf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accumulation/Distribution line and {_CMF_N}-day Chaikin Money
    Flow: the close's position within the day's range signs the tick
    volume — mult = ((C-L)-(H-C))/(H-L) in [-1,1] — and ADL accumulates
    that money-flow volume while CMF normalizes it over a rolling
    window (OBV signs ALL volume by close direction; A/D weights it by
    WHERE in the range the close landed, catching distribution into
    strength). Exactness: mfv quantizes to integer micro-units with
    truncating division (Spark `div` == DuckDB `//`, valid for the
    negative numerators here), ADL is then an exact integer cumsum and
    CMF an exact integer ratio per row. One (symbol, day) sort carries
    the cumsum, the rolling frame, and the warmup gate. A cumulative
    sum per symbol is embarrassingly partition-parallel at 100 TB; the
    window state is O({_CMF_N})."""
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
    w_rn = Window.partitionBy("symbol").orderBy("day")
    mf = bars.select(
        "symbol",
        "day",
        "v",
        F.when(F.col("h") == F.col("l"), F.lit(0))
        .otherwise(F.expr("(2 * c - h - l) * v * 1000000 div (h - l)"))
        .alias("mfv_micro"),
        F.row_number().over(w_rn).alias("rn"),
    )
    w_cum = Window.partitionBy("symbol").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_frame = Window.partitionBy("symbol").orderBy("day").rowsBetween(-(_CMF_N - 1), 0)
    return (
        mf.select(
            "symbol",
            "day",
            "rn",
            F.sum("mfv_micro").over(w_cum).cast("long").alias("adl_micro"),
            (F.sum("mfv_micro").over(w_frame))
            .alias("num"),
            (F.sum("v").over(w_frame) * 1000).alias("den"),
        )
        .filter(F.col("rn") >= _CMF_N)
        .select(
            "symbol",
            "day",
            "adl_micro",
            F.expr("num div den").cast("long").alias("cmf_milli"),
        )
        .orderBy("symbol", "day")
    )
