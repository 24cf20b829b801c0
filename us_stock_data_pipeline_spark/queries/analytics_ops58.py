"""Round-59 analytics, part 58: ulcer index / Martin ratio and
char-bigram conditional entropy per language.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Ulcer index + Martin ratio (drawdown depth-and-duration risk)
# --------------------------------------------------------------------------

_ULCER_ORACLE = """
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
dd AS (
  SELECT symbol, day, c,
         max(c) OVER (PARTITION BY symbol ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak,
         first_value(c) OVER (PARTITION BY symbol ORDER BY day) AS first_c,
         last_value(c) OVER (PARTITION BY symbol ORDER BY day
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND UNBOUNDED FOLLOWING) AS last_c
  FROM closes
),
scored AS (
  SELECT symbol, first_c, last_c,
         (peak - c) * 10000 // peak AS dd_bp
  FROM dd
),
sums AS (
  SELECT symbol, CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(CASE WHEN dd_bp > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_underwater_days,
         CAST(max(dd_bp) AS BIGINT) AS max_dd_bp,
         CAST(sum(dd_bp * dd_bp) AS HUGEINT) AS sdd2,
         any_value(first_c) AS first_c, any_value(last_c) AS last_c
  FROM scored GROUP BY symbol
)
SELECT symbol, n_days, n_underwater_days, max_dd_bp,
       CAST(floor(sqrt(CAST(sdd2 AS DOUBLE) / n_days) * 100 + 0.5) AS BIGINT)
         AS ulcer_bp_e2,
       CAST(floor(
         ((CAST(last_c AS DOUBLE) - first_c) * 10000 / first_c)
         / sqrt(CAST(sdd2 AS DOUBLE) / n_days)
         * 10000 + 0.5) AS BIGINT) AS martin_e4
FROM sums
WHERE sdd2 > 0
ORDER BY symbol
"""


@register("bars_ulcer_index", oracle=_ULCER_ORACLE, tags=("stock", "stats"))
def bars_ulcer_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ulcer index (root-mean-square drawdown) and Martin ratio per
    symbol — the drawdown-DEPTH-weighted risk pair that penalizes
    long, deep underwater stretches where plain volatility treats up
    and down alike (`bars_max_drawdown` reports only the single worst
    trough; `bars_losing_streaks` only duration; the ulcer integrates
    both, and Martin = return/ulcer is its Sharpe analogue).
    Exactness: drawdowns are integer basis points off the running
    peak (positive floor-divide, engine-identical), the squared sum
    is an exact HUGEINT/decimal, and both outputs are one fixed
    double expression quantized at the end. Plan: daily rollup, ONE
    per-symbol ordered window (running max + first/last ride the same
    sort), one symbol aggregate."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
    w_run = (
        Window.partitionBy("symbol")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = (
        Window.partitionBy("symbol")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    dd = closes.select(
        "symbol",
        F.col("c"),
        F.max("c").over(w_run).alias("peak"),
        F.first("c").over(w_run).alias("first_c"),
        F.last("c").over(w_all).alias("last_c"),
    )
    scored = dd.select(
        "symbol",
        "first_c",
        "last_c",
        F.floor((F.col("peak") - F.col("c")) * 10000 / F.col("peak")).cast("long").alias("dd_bp"),
    )
    dec = "decimal(38,0)"
    sums = scored.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.when(F.col("dd_bp") > 0, 1).otherwise(0)).cast("long").alias("n_underwater_days"),
        F.max("dd_bp").cast("long").alias("max_dd_bp"),
        F.sum(F.col("dd_bp") * F.col("dd_bp")).cast(dec).alias("sdd2"),
        F.first("first_c").alias("first_c"),
        F.first("last_c").alias("last_c"),
    )
    ulcer = F.sqrt(F.col("sdd2").cast("double") / F.col("n_days"))
    total_ret_bp = (F.col("last_c").cast("double") - F.col("first_c")) * 10000 / F.col("first_c")
    return (
        sums.filter(F.col("sdd2") > 0)
        .select(
            "symbol",
            "n_days",
            "n_underwater_days",
            "max_dd_bp",
            F.floor(ulcer * 100 + F.lit(0.5)).cast("long").alias("ulcer_bp_e2"),
            F.floor(total_ret_bp / ulcer * 10_000 + F.lit(0.5)).cast("long").alias("martin_e4"),
        )
        .orderBy("symbol")
    )


# --------------------------------------------------------------------------
# Char-bigram conditional entropy per language
# --------------------------------------------------------------------------

_BIGRAM_H_ORACLE = """
WITH grams AS (
  SELECT lang,
         unnest(list_transform(generate_series(1, length(text) - 1),
                               i -> substr(text, CAST(i AS INTEGER), 2))) AS bg
  FROM documents WHERE length(text) >= 2
),
cells AS (
  SELECT lang, bg, CAST(count(*) AS BIGINT) AS c FROM grams GROUP BY lang, bg
),
row_tot AS (
  SELECT lang, substr(bg, 1, 1) AS c1, CAST(sum(c) AS BIGINT) AS ci
  FROM cells GROUP BY 1, 2
),
tot AS (
  SELECT lang, CAST(sum(c) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS n_bigrams
  FROM cells GROUP BY lang
),
terms AS (
  SELECT t.lang,
         CAST(floor(
           CAST(t.c AS DOUBLE) / tt.n * ln(CAST(r.ci AS DOUBLE) / t.c) / ln(2.0)
           * 1000000000 + 0.5) AS BIGINT) AS term_e9
  FROM cells t
  JOIN row_tot r ON r.lang = t.lang AND r.c1 = substr(t.bg, 1, 1)
  JOIN tot tt ON tt.lang = t.lang
)
SELECT t.lang, tt.n AS n_grams, tt.n_bigrams,
       CAST(sum(t.term_e9) // 1000 AS BIGINT) AS cond_entropy_e6
FROM terms t JOIN tot tt ON tt.lang = t.lang
GROUP BY t.lang, tt.n, tt.n_bigrams
ORDER BY t.lang
"""


@register("text_bigram_entropy", oracle=_BIGRAM_H_ORACLE, tags=("text", "llm", "stats"))
def text_bigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-bigram conditional entropy H(c2|c1) per language — the
    sequential-structure upgrade of `text_char_entropy` (which scores
    the UNIGRAM distribution): natural language has high unigram but
    much lower conditional entropy, so the H(c2|c1) gap separates
    real text from shuffled/encrypted/random payloads better than
    either alone, and per-language it is a cheap fingerprint for the
    language-ID family. Same determinism discipline as
    `events_entropy_rate`: every (c1,c2) cell's contribution
    (c/N)·log2(ci/c) quantizes to integer e9 BEFORE the cross-cell
    sum; counts are exact. Bigrams come from a substring fan-out
    (sequence/generate_series), not a UDF. Plan: explode, two
    wordcount-shaped aggregates, a broadcast-sized cell join at
    alphabet^2 grain."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 2)
    grams = docs.select(
        "lang",
        F.explode(
            F.expr("transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))")
        ).alias("bg"),
    )
    cells = grams.groupBy("lang", "bg").agg(F.count(F.lit(1)).cast("long").alias("c"))
    row_tot = cells.groupBy("lang", F.substring("bg", 1, 1).alias("c1")).agg(
        F.sum("c").cast("long").alias("ci")
    )
    tot = cells.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
    )
    term = F.floor(
        F.col("c").cast("double")
        / F.col("n")
        * F.log(F.col("ci").cast("double") / F.col("c"))
        / F.log(F.lit(2.0))
        * 1_000_000_000
        + F.lit(0.5)
    ).cast("long")
    terms = (
        cells.withColumn("c1", F.substring("bg", 1, 1))
        .join(F.broadcast(row_tot), ["lang", "c1"])
        .join(F.broadcast(tot), "lang")
        .select("lang", term.alias("term_e9"), "n", "n_bigrams")
    )
    return (
        terms.groupBy("lang", "n", "n_bigrams")
        .agg(F.floor(F.sum("term_e9") / 1000).cast("long").alias("cond_entropy_e6"))
        .select(
            "lang",
            F.col("n").alias("n_grams"),
            "n_bigrams",
            "cond_entropy_e6",
        )
        .orderBy("lang")
    )
