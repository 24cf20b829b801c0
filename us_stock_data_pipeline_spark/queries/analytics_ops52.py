"""Round-53 analytics, part 52: lead-lag cross-correlation between
symbol return series and Yule's K lexical-diversity characteristic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Lead-lag cross-correlation function between symbol pairs
# --------------------------------------------------------------------------

_CCF_MAXLAG = 3

_CCF_ORACLE = f"""
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS close_cents
  FROM events GROUP BY 1, 2
),
rets AS (
  SELECT symbol,
         datediff('day', DATE '2024-01-01', day) AS dd,
         CAST(floor((close_cents - lag(close_cents) OVER w) * 10000.0
                    / lag(close_cents) OVER w + 0.5) AS BIGINT) AS ret_bp
  FROM closes WINDOW w AS (PARTITION BY symbol ORDER BY day)
  QUALIFY lag(close_cents) OVER w IS NOT NULL
),
lags AS (
  SELECT unnest(generate_series(-{_CCF_MAXLAG}, {_CCF_MAXLAG})) AS lag
),
aligned AS (
  -- y leads x by `lag` days: corr(x_t, y_(t+lag))
  SELECT a.symbol AS s1, b.symbol AS s2, l.lag,
         a.ret_bp AS x, b.ret_bp AS y
  FROM rets a
  JOIN lags l ON true
  JOIN rets b ON b.symbol > a.symbol AND b.dd = a.dd + l.lag
),
sums AS (
  SELECT s1, s2, lag, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(x * x) AS HUGEINT) AS sxx, CAST(sum(y * y) AS HUGEINT) AS syy,
         CAST(sum(x * y) AS HUGEINT) AS sxy
  FROM aligned GROUP BY 1, 2, 3
)
SELECT s1, s2, CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_days,
       CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                  / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                  * 1000000 + 0.5) AS BIGINT) AS ccf_e6
FROM sums
WHERE n * sxx > sx * sx AND n * syy > sy * sy
ORDER BY s1, s2, lag
"""


@register("timeseries_cross_correlation", oracle=_CCF_ORACLE, tags=("timeseries", "stats"))
def timeseries_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation function between every symbol pair
    at lags -{_CCF_MAXLAG}..+{_CCF_MAXLAG} — the pairs-trading /
    information-flow diagnostic ("does AAPL's move today predict
    MSFT's tomorrow?") that generalizes `bars_correlation_matrix`
    (lag 0 only) along the time axis. Determinism: every moment
    (n, Sx, Sy, Sxx, Syy, Sxy) is an exact integer sum of quantized
    basis-point returns, so the distributed aggregation is
    order-free and Pearson's r is assembled from exact integers with
    two sqrt + one division per output row. Alignment joins on an
    epoch-day index, so calendar gaps shrink n instead of silently
    misaligning rows. Plan: daily rollup, per-symbol lag window,
    then ONE equi-join on (day+lag) — the lag set rides a broadcast
    — and a (pair, lag)-keyed aggregate; nothing quadratic in days."""
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
        closes.select("symbol", "day", prev.alias("prev_c"), F.col("close_cents").alias("c"))
        .filter(F.col("prev_c").isNotNull())
        .select(
            "symbol",
            F.datediff(F.col("day"), F.lit("2024-01-01").cast("date")).alias("dd"),
            F.floor((F.col("c") - F.col("prev_c")) * 10000.0 / F.col("prev_c") + F.lit(0.5))
            .cast("long")
            .alias("ret_bp"),
        )
    )
    lags = spark.range(-_CCF_MAXLAG, _CCF_MAXLAG + 1).select(F.col("id").alias("lag"))
    a = rets.select(F.col("symbol").alias("s1"), "dd", F.col("ret_bp").alias("x"))
    b = rets.select(
        F.col("symbol").alias("s2"), F.col("dd").alias("dd_b"), F.col("ret_bp").alias("y")
    )
    aligned = a.crossJoin(F.broadcast(lags)).join(
        b, (F.col("s2") > F.col("s1")) & (F.col("dd_b") == F.col("dd") + F.col("lag"))
    )
    dec = "decimal(38,0)"
    sums = aligned.groupBy("s1", "s2", "lag").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast(dec).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast(dec).alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast(dec).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    varx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    vary = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    return (
        sums.filter((varx > 0) & (vary > 0))
        .select(
            "s1",
            "s2",
            F.col("lag").cast("long").alias("lag"),
            F.col("n").cast("long").alias("n_days"),
            F.floor(
                num / (F.sqrt(varx.cast("double")) * F.sqrt(vary.cast("double")))
                * 1_000_000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("ccf_e6"),
        )
        .orderBy("s1", "s2", "lag")
    )


# --------------------------------------------------------------------------
# Yule's K characteristic (repeat-rate lexical diversity)
# --------------------------------------------------------------------------

_YULE_ORACLE = """
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents
),
freq AS (
  SELECT lang, w, CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY lang, w
),
sums AS (
  SELECT lang, CAST(sum(f) AS HUGEINT) AS n,
         CAST(count(*) AS BIGINT) AS vocab,
         CAST(sum(f * f) AS HUGEINT) AS s2
  FROM freq GROUP BY lang
)
SELECT lang, CAST(n AS BIGINT) AS n_tokens, vocab,
       CAST(floor(10000.0 * CAST(s2 - n AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                  * 10000 + 0.5) AS BIGINT) AS yules_k_e4
FROM sums
ORDER BY lang
"""


@register("text_yules_k", oracle=_YULE_ORACLE, tags=("text", "llm"))
def text_yules_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's K characteristic per language — the length-invariant
    repeat-rate statistic K = 1e4*(sum f^2 - N)/N^2 that corpus
    curators use to screen for template/boilerplate-heavy slices
    (high K = few types dominate; `text_hapax_legomena` reads the
    OTHER tail of the same frequency spectrum). K is provably
    insensitive to corpus size where raw type-token ratio is not,
    which is why it survives as a dedup-quality signal at 100 TB
    when TTR collapses. All spectrum sums are exact integers
    (HUGEINT/long); K is one double expression quantized at 1e-4 x
    1e4. Plan: tokenize-explode, (lang, word) groupBy with map-side
    combine, then a lang-grain aggregate — the classic two-level
    wordcount tree, no window, no join."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("lang", F.explode(F.split("text", " ")).alias("w"))
    freq = tok.groupBy("lang", "w").agg(F.count(F.lit(1)).cast("long").alias("f"))
    sums = freq.groupBy("lang").agg(
        F.sum("f").cast("decimal(38,0)").alias("n"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(F.col("f") * F.col("f")).cast("decimal(38,0)").alias("s2"),
    )
    k = (
        10000.0
        * (F.col("s2") - F.col("n")).cast("double")
        / (F.col("n").cast("double") * F.col("n").cast("double"))
    )
    return sums.select(
        "lang",
        F.col("n").cast("long").alias("n_tokens"),
        "vocab",
        F.floor(k * 10_000 + F.lit(0.5)).cast("long").alias("yules_k_e4"),
    ).orderBy("lang")
