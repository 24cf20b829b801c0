"""Round-91 analytics, part 85: two-pass exact median (histogram
pruning, no global sort) and spectral entropy of return series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Two-pass exact median of l_extendedprice: bucket-prune, then sort ONE bucket
# --------------------------------------------------------------------------

_MED_BUCKET_CENTS = 100_000  # $1k histogram buckets

_MED2P_ORACLE = f"""
WITH vals AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem
),
ranked AS (
  SELECT v, row_number() OVER (ORDER BY v) AS rn, count(*) OVER () AS n
  FROM vals
)
SELECT CAST(max(n) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN rn = (n + 1) // 2 OR rn = (n + 2) // 2 THEN v
                     ELSE 0 END)
            * (CASE WHEN (n + 2) // 2 = (n + 1) // 2 THEN 2 ELSE 1 END)
         AS BIGINT) AS median2_cents
FROM ranked
GROUP BY n
"""


@register("agg_median_two_pass", oracle=_MED2P_ORACLE, tags=("agg", "scale"))
def agg_median_two_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median without a global sort — the 100 TB plan for exact
    order statistics: pass 1 builds a fixed-width histogram (one
    map-side-combinable groupBy) and a prefix-sum over its few
    thousand buckets locates which bucket(s) hold the two middle order
    statistics; pass 2 re-scans ONLY those buckets (the filter pushes
    to the parquet scan) and ranks their handful of rows. A naive
    exact median sorts the whole tape on one key — O(N log N) through
    a single reducer's merge — while this touches every row twice
    with nothing wider than a bucket ever sorted (`agg_median_any`
    uses the single-sort form; `agg_percentiles`' approx sketch trades
    exactness away). The oracle IS the naive global-rank plan, so the
    hash proves the pruned plan selects the identical elements.
    Output carries the median DOUBLED (lo+hi) to stay integer-exact
    for even counts."""
    li = load_table(spark, sf_dir, "lineitem")
    vals = li.select(F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"))
    # pass 1: bucket histogram + the two target ranks
    hist = vals.groupBy(F.expr(f"v div {_MED_BUCKET_CENTS}").alias("b")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    tot = hist.agg(F.sum("cnt").cast("long").alias("n"))
    cum = (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "b",
            "cnt",
            "n",
            F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("before"),
            F.expr("(n + 1) div 2").alias("k1"),
            F.expr("(n + 2) div 2").alias("k2"),
        )
    )
    targets = cum.filter(
        (F.col("before") < F.col("k2")) & (F.col("before") + F.col("cnt") >= F.col("k1"))
    ).select("b", "before", "k1", "k2", "n")
    # pass 2: rescan only the bucket(s) holding ranks k1/k2
    picked = vals.join(
        F.broadcast(targets), F.expr(f"v div {_MED_BUCKET_CENTS}") == F.col("b")
    )
    w_in = Window.partitionBy("b").orderBy("v")
    in_rank = picked.select(
        "v", "n", "k1", "k2", (F.col("before") + F.row_number().over(w_in)).alias("rn")
    )
    hits = in_rank.filter((F.col("rn") == F.col("k1")) | (F.col("rn") == F.col("k2")))
    return hits.groupBy("n", "k1", "k2").agg(F.sum("v").alias("s")).select(
        F.col("n").alias("n_rows"),
        F.when(F.col("k1") == F.col("k2"), F.col("s") * 2)
        .otherwise(F.col("s"))
        .cast("long")
        .alias("median2_cents"),
    )


# --------------------------------------------------------------------------
# Spectral entropy of daily-return series (predictability screen)
# --------------------------------------------------------------------------

_SE_K = 10  # number of DFT frequencies

_SE_ORACLE = f"""
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
rets AS (
  SELECT symbol, row_number() OVER w - 1 AS t,
         CAST(floor((c - lag(c) OVER w) * 10000.0 / lag(c) OVER w + 0.5)
           AS BIGINT) AS r,
         count(*) OVER (PARTITION BY symbol) - 1 AS n
  FROM closes WINDOW w AS (PARTITION BY symbol ORDER BY day)
  QUALIFY lag(c) OVER w IS NOT NULL
),
freqs AS (SELECT unnest(range(1, {_SE_K} + 1)) AS k),
-- trig coefficients quantize to integer micro PER TERM, so the DFT sums
-- are exact BIGINT and order-free
terms AS (
  SELECT r.symbol, f.k,
         r.r * CAST(round(cos(2 * pi() * f.k * r.t / r.n) * 1000000) AS BIGINT) AS ca,
         r.r * CAST(round(sin(2 * pi() * f.k * r.t / r.n) * 1000000) AS BIGINT) AS cb
  FROM rets r, freqs f
),
amps AS (
  SELECT symbol, k, CAST(sum(ca) AS BIGINT) AS a, CAST(sum(cb) AS BIGINT) AS b
  FROM terms GROUP BY symbol, k
),
power AS (
  SELECT symbol, k,
         CAST(floor((CAST(a AS DOUBLE) / 1000000) * (CAST(a AS DOUBLE) / 1000000)
                    + (CAST(b AS DOUBLE) / 1000000) * (CAST(b AS DOUBLE) / 1000000)
                    + 0.5) AS BIGINT) AS pw
  FROM amps
),
tot AS (SELECT symbol, CAST(sum(pw) AS BIGINT) AS tp FROM power GROUP BY symbol),
ent AS (
  SELECT p.symbol,
         CAST(floor(-(CAST(p.pw AS DOUBLE) / t.tp) * ln(CAST(p.pw AS DOUBLE) / t.tp)
                    * 1000000 + 0.5) AS BIGINT) AS term_micro
  FROM power p JOIN tot t ON t.symbol = p.symbol
  WHERE p.pw > 0
)
SELECT symbol, CAST(count(*) AS BIGINT) AS n_freqs,
       CAST(sum(term_micro) AS BIGINT) AS spectral_entropy_micro,
       CAST(round(ln({_SE_K}.0) * 1000000) AS BIGINT) AS max_entropy_micro
FROM ent
GROUP BY symbol
ORDER BY symbol
"""


@register("timeseries_spectral_entropy", oracle=_SE_ORACLE, tags=("timeseries", "stats"))
def timeseries_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral entropy of each symbol's return series: Shannon
    entropy of the normalized periodogram over the first {_SE_K}
    DFT frequencies — near ln(K) means white-noise returns (power
    spread flat), low values mean one periodic component dominates
    (`timeseries_periodogram` reports the raw power; the entropy
    collapses it to a single predictability score, the standard
    feature in series-classification suites). Exactness: each trig
    coefficient quantizes to integer micro per (t, k) term so the DFT
    sums are exact order-free BIGINT; powers and the entropy terms
    assemble in pinned DOUBLE and re-quantize to integers before
    their (10-term) sums. Plan: returns once, a K-way literal
    fan-out, one (symbol, k) aggregate — the tape is read once and
    the quadratic term is K x days, calendar-bounded."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
    w = Window.partitionBy("symbol").orderBy("day")
    w_n = Window.partitionBy("symbol")
    prev = F.lag("c").over(w)
    rets = (
        closes.select(
            "symbol",
            (F.row_number().over(w) - 1).alias("t"),
            (F.count(F.lit(1)).over(w_n) - 1).alias("n"),
            prev.alias("p"),
            "c",
        )
        .filter(F.col("p").isNotNull())
        .select(
            "symbol",
            "t",
            "n",
            F.floor((F.col("c") - F.col("p")) * 10000.0 / F.col("p") + F.lit(0.5))
            .cast("long")
            .alias("r"),
        )
    )
    freqs = spark.range(1, _SE_K + 1).select(F.col("id").alias("k"))
    two_pi = 2 * 3.141592653589793
    terms = rets.crossJoin(F.broadcast(freqs)).select(
        "symbol",
        "k",
        (
            F.col("r")
            * F.round(F.cos(F.lit(two_pi) * F.col("k") * F.col("t") / F.col("n")) * 1000000)
            .cast("long")
        ).alias("ca"),
        (
            F.col("r")
            * F.round(F.sin(F.lit(two_pi) * F.col("k") * F.col("t") / F.col("n")) * 1000000)
            .cast("long")
        ).alias("cb"),
    )
    amps = terms.groupBy("symbol", "k").agg(
        F.sum("ca").cast("long").alias("a"), F.sum("cb").cast("long").alias("b")
    )
    aD = F.col("a").cast("double") / 1000000
    bD = F.col("b").cast("double") / 1000000
    power = amps.select(
        "symbol", "k", F.floor(aD * aD + bD * bD + F.lit(0.5)).cast("long").alias("pw")
    )
    tot = power.groupBy("symbol").agg(F.sum("pw").cast("long").alias("tp"))
    p = F.col("pw").cast("double") / F.col("tp")
    ent = (
        power.join(tot, "symbol")
        .filter(F.col("pw") > 0)
        .select(
            "symbol",
            F.floor(-p * F.log(p) * 1000000 + F.lit(0.5)).cast("long").alias("term_micro"),
        )
    )
    import math

    return (
        ent.groupBy("symbol")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_freqs"),
            F.sum("term_micro").cast("long").alias("spectral_entropy_micro"),
        )
        .select(
            "symbol",
            "n_freqs",
            "spectral_entropy_micro",
            F.lit(round(math.log(float(_SE_K)) * 1000000)).cast("long").alias("max_entropy_micro"),
        )
        .orderBy("symbol")
    )
