"""Round-11 stock analytics, part 25: pairs-trading spread monitor and
Kelly-criterion position sizing — both exact-integer derivations over
the daily bars the reference pipeline stores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Pairs-trading spread: median/MAD extreme-day counter per symbol pair
# --------------------------------------------------------------------------

_PAIRS_ORACLE = """
WITH daily AS (
  SELECT event_type AS symbol,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
paired AS (
  SELECT a.symbol AS sym_a, b.symbol AS sym_b, a.day,
         (a.c - b.c) * 10000 // b.c AS spread_bp
  FROM daily a JOIN daily b ON a.day = b.day AND a.symbol < b.symbol
  WHERE b.c > 0
),
stats AS (
  SELECT sym_a, sym_b,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(quantile_disc(spread_bp, 0.5) AS BIGINT) AS med_bp
  FROM paired GROUP BY sym_a, sym_b
),
dev AS (
  SELECT p.sym_a, p.sym_b, s.n_days, s.med_bp,
         abs(p.spread_bp - s.med_bp) AS adev
  FROM paired p JOIN stats s ON s.sym_a = p.sym_a AND s.sym_b = p.sym_b
),
mad AS (
  SELECT sym_a, sym_b, n_days, med_bp,
         CAST(quantile_disc(adev, 0.5) AS BIGINT) AS mad_bp
  FROM dev GROUP BY sym_a, sym_b, n_days, med_bp
)
SELECT d.sym_a, d.sym_b, d.n_days, d.med_bp, m.mad_bp,
       CAST(sum(CASE WHEN d.adev > 3 * m.mad_bp THEN 1 ELSE 0 END) AS BIGINT)
         AS n_extreme_days
FROM dev d JOIN mad m ON m.sym_a = d.sym_a AND m.sym_b = d.sym_b
GROUP BY d.sym_a, d.sym_b, d.n_days, d.med_bp, m.mad_bp
ORDER BY d.sym_a, d.sym_b
"""


@register("bars_pairs_spread", oracle=_PAIRS_ORACLE, tags=("stock", "stats"))
def bars_pairs_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs-trading spread monitor: for every symbol pair, the daily
    price spread in integer basis points, its MEDIAN and MAD (both
    exact percentile_disc on ints — the robust location/scale pair,
    immune to the fat tails that wreck mean/stddev z-scores on
    spreads), and the count of days the spread left the 3-MAD band —
    the entry-signal base rate a stat-arb desk tracks per pair. The
    pair join is day-aligned (symbol < symbol dedups orientations);
    pair count is symbols-choose-2, calendar-bounded rows each, so
    the quadratic term is in SYMBOLS, not days — at a 10k-symbol
    universe you shard this by pair-block, which the docstring of
    `bars_correlation_matrix` already prescribes for the same shape.
    Plan: daily rollup, one self-join on day, two bounded
    median/MAD aggregations joined back broadcast."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
    a = daily.select(
        F.col("symbol").alias("sym_a"), F.col("day").alias("day_a"), F.col("c").alias("ca")
    )
    b = daily.select(
        F.col("symbol").alias("sym_b"), F.col("day").alias("day_b"), F.col("c").alias("cb")
    )
    paired = a.join(
        b, (F.col("day_a") == F.col("day_b")) & (F.col("sym_a") < F.col("sym_b"))
    ).filter(F.col("cb") > 0).select(
        "sym_a",
        "sym_b",
        F.col("day_a").alias("day"),
        F.expr("(ca - cb) * 10000 div cb").alias("spread_bp"),
    )
    stats = paired.groupBy(
        F.col("sym_a").alias("ssa"), F.col("sym_b").alias("ssb")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.expr(
            "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY spread_bp) AS BIGINT)"
        ).alias("med_bp"),
    )
    dev = paired.join(
        F.broadcast(stats),
        (paired.sym_a == F.col("ssa")) & (paired.sym_b == F.col("ssb")),
    ).select(
        "sym_a",
        "sym_b",
        "n_days",
        "med_bp",
        F.abs(F.col("spread_bp") - F.col("med_bp")).alias("adev"),
    )
    mad = dev.groupBy(
        F.col("sym_a").alias("msa"), F.col("sym_b").alias("msb")
    ).agg(
        F.expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY adev) AS BIGINT)").alias(
            "mad_bp"
        )
    )
    return (
        dev.join(
            F.broadcast(mad), (dev.sym_a == F.col("msa")) & (dev.sym_b == F.col("msb"))
        )
        .groupBy("sym_a", "sym_b", "n_days", "med_bp", "mad_bp")
        .agg(
            F.sum(F.when(F.col("adev") > 3 * F.col("mad_bp"), 1).otherwise(0))
            .cast("long")
            .alias("n_extreme_days")
        )
        .orderBy("sym_a", "sym_b")
    )


# --------------------------------------------------------------------------
# Kelly-criterion position sizing from daily win/loss statistics
# --------------------------------------------------------------------------

_KELLY_ORACLE = """
WITH daily AS (
  SELECT event_type AS symbol,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
rets AS (
  SELECT symbol,
         (c - lag(c) OVER (PARTITION BY symbol ORDER BY day)) * 10000
           // lag(c) OVER (PARTITION BY symbol ORDER BY day) AS ret_bp
  FROM daily
),
sums AS (
  SELECT symbol,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN ret_bp > 0 THEN 1 ELSE 0 END) AS BIGINT) AS u,
         CAST(sum(CASE WHEN ret_bp < 0 THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(sum(CASE WHEN ret_bp > 0 THEN ret_bp ELSE 0 END) AS BIGINT) AS sw,
         CAST(sum(CASE WHEN ret_bp < 0 THEN -ret_bp ELSE 0 END) AS BIGINT) AS sl
  FROM rets WHERE ret_bp IS NOT NULL
  GROUP BY symbol
)
SELECT symbol, n AS n_days, u AS n_up, d AS n_down,
       floor(CAST(sw AS DOUBLE) / u * 100 + 0.5) / 100 AS avg_win_bp,
       floor(CAST(sl AS DOUBLE) / d * 100 + 0.5) / 100 AS avg_loss_bp,
       floor((CAST(u AS DOUBLE) / n - CAST(sl AS DOUBLE) * u / (CAST(n AS DOUBLE) * sw))
             * 1000 + 0.5) / 1000 AS kelly_fraction
FROM sums
WHERE u > 0 AND d > 0 AND sw > 0
ORDER BY symbol
"""


@register("bars_kelly_sizing", oracle=_KELLY_ORACLE, tags=("stock", "stats"))
def bars_kelly_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kelly-criterion position sizing per symbol: f* = p - q/b with
    win probability p = up-days/n and payoff ratio b = avg_win /
    avg_loss, algebraically rearranged to p - (sl*u)/(n*sw) so the
    whole fraction evaluates from four exact integer sums (up/down
    counts, summed win/loss basis points) in one identical terminal
    expression — the sizing table a systematic trader reads next to
    `bars_volatility` (how much to bet vs how much it moves). Days
    with zero return count in n but neither u nor d, exactly as Kelly
    treats pushes. Plan: daily rollup, one lag window, one
    map-side-combined groupBy — per-symbol state is five counters."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
    rets = daily.select(
        "symbol",
        F.expr(
            "(c - lag(c) OVER (PARTITION BY symbol ORDER BY day)) * 10000"
            " div lag(c) OVER (PARTITION BY symbol ORDER BY day)"
        ).alias("ret_bp"),
    ).filter(F.col("ret_bp").isNotNull())
    sums = rets.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("ret_bp") > 0, 1).otherwise(0)).cast("long").alias("u"),
        F.sum(F.when(F.col("ret_bp") < 0, 1).otherwise(0)).cast("long").alias("d"),
        F.sum(F.when(F.col("ret_bp") > 0, F.col("ret_bp")).otherwise(0))
        .cast("long")
        .alias("sw"),
        F.sum(F.when(F.col("ret_bp") < 0, -F.col("ret_bp")).otherwise(0))
        .cast("long")
        .alias("sl"),
    )
    return (
        sums.filter((F.col("u") > 0) & (F.col("d") > 0) & (F.col("sw") > 0))
        .select(
            "symbol",
            F.col("n").alias("n_days"),
            F.col("u").alias("n_up"),
            F.col("d").alias("n_down"),
            (F.floor(F.col("sw").cast("double") / F.col("u") * 100 + F.lit(0.5)) / 100).alias(
                "avg_win_bp"
            ),
            (F.floor(F.col("sl").cast("double") / F.col("d") * 100 + F.lit(0.5)) / 100).alias(
                "avg_loss_bp"
            ),
            (
                F.floor(
                    (
                        F.col("u").cast("double") / F.col("n")
                        - F.col("sl").cast("double")
                        * F.col("u")
                        / (F.col("n").cast("double") * F.col("sw"))
                    )
                    * 1000
                    + F.lit(0.5)
                )
                / 1000
            ).alias("kelly_fraction"),
        )
        .orderBy("symbol")
    )
