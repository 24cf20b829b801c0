"""Round-37 analytics, part 44: Mann-Kendall trend test and the
Wald-Wolfowitz runs test — the nonparametric significance pair for
time-series monotonicity and randomness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Mann-Kendall trend test
# --------------------------------------------------------------------------

_MK_ORACLE = """
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS close_cents
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.symbol,
         CASE WHEN b.close_cents > a.close_cents THEN 1
              WHEN b.close_cents < a.close_cents THEN -1 ELSE 0 END AS sgn
  FROM closes a JOIN closes b ON b.symbol = a.symbol AND b.day > a.day
),
s_stat AS (
  SELECT symbol, CAST(sum(sgn) AS BIGINT) AS s FROM pairs GROUP BY symbol
),
ties AS (  -- tie correction: sum t_j (t_j - 1) (2 t_j + 5) over tied values
  SELECT symbol, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT symbol, close_cents, CAST(count(*) AS BIGINT) AS t
        FROM closes GROUP BY symbol, close_cents)
  GROUP BY symbol
),
ns AS (
  SELECT symbol, CAST(count(*) AS BIGINT) AS n FROM closes GROUP BY symbol
)
SELECT s.symbol, n.n AS n_days, s.s AS mk_s,
       CAST(floor(
         (CASE WHEN s.s > 0 THEN s.s - 1.0
               WHEN s.s < 0 THEN s.s + 1.0 ELSE 0.0 END)
         / sqrt((CAST(n.n AS DOUBLE) * (n.n - 1) * (2 * n.n + 5) - t.tie_term) / 18.0)
         * 10000 + 0.5) AS BIGINT) AS mk_z_e4
FROM s_stat s JOIN ns n ON n.symbol = s.symbol JOIN ties t ON t.symbol = s.symbol
ORDER BY s.symbol
"""


@register("stats_mann_kendall", oracle=_MK_ORACLE, tags=("stats", "timeseries"))
def stats_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test — the nonparametric "is this series
    monotonically trending?" significance test that pairs with
    Theil-Sen (which gives the robust slope; MK gives the p-value):
    S = sum of sign(x_j - x_i) over all i<j pairs, variance
    (n(n-1)(2n+5) - tie term)/18 with the exact tie correction, and
    the continuity-corrected z. S, the tie term, and n are exact
    BIGINTs from the day-pair self-join (O(days^2) per symbol —
    bounded by the calendar, not the tape, so the quadratic term is
    fixed at any data scale); z quantizes once at 1e-4. Plan: daily
    rollup, a symbol-keyed self-join over the tiny daily table, three
    small aggregates."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("close_cents")
    )
    a = closes.select("symbol", F.col("day").alias("da"), F.col("close_cents").alias("ca"))
    b = closes.select(
        F.col("symbol").alias("symbol_b"),
        F.col("day").alias("db"),
        F.col("close_cents").alias("cb"),
    )
    pairs = a.join(
        b, (F.col("symbol") == F.col("symbol_b")) & (F.col("db") > F.col("da"))
    ).select(
        "symbol",
        F.when(F.col("cb") > F.col("ca"), 1)
        .when(F.col("cb") < F.col("ca"), -1)
        .otherwise(0)
        .alias("sgn"),
    )
    s_stat = pairs.groupBy("symbol").agg(F.sum("sgn").cast("long").alias("s"))
    ties = (
        closes.groupBy("symbol", "close_cents")
        .agg(F.count("*").cast("long").alias("t"))
        .groupBy("symbol")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
            .cast("long")
            .alias("tie_term")
        )
    )
    ns = closes.groupBy("symbol").agg(F.count("*").cast("long").alias("n"))
    joined = s_stat.join(ties, "symbol").join(ns, "symbol")
    corrected = (
        F.when(F.col("s") > 0, F.col("s") - 1.0)
        .when(F.col("s") < 0, F.col("s") + 1.0)
        .otherwise(F.lit(0.0))
    )
    var = (
        F.col("n").cast("double") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.col("tie_term")
    ) / 18.0
    z = F.floor(corrected / F.sqrt(var) * 10_000 + F.lit(0.5)).cast("long")
    return joined.select(
        "symbol", F.col("n").alias("n_days"), F.col("s").alias("mk_s"), z.alias("mk_z_e4")
    ).orderBy("symbol")


# --------------------------------------------------------------------------
# Wald-Wolfowitz runs test (randomness of up/down sequence)
# --------------------------------------------------------------------------

_RUNS_ORACLE = """
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS close_cents
  FROM events GROUP BY 1, 2
),
moves AS (
  SELECT symbol, day,
         CASE WHEN close_cents > lag(close_cents) OVER w THEN 1 ELSE 0 END AS up
  FROM closes
  WINDOW w AS (PARTITION BY symbol ORDER BY day)
  QUALIFY lag(close_cents) OVER w IS NOT NULL
),
runs AS (
  SELECT symbol, up,
         CASE WHEN up = lag(up) OVER (PARTITION BY symbol ORDER BY day)
              THEN 0 ELSE 1 END AS brk
  FROM moves
),
counts AS (
  SELECT symbol,
         CAST(sum(brk) AS BIGINT) AS n_runs,
         CAST(sum(up) AS BIGINT) AS n_up,
         CAST(count(*) - sum(up) AS BIGINT) AS n_down
  FROM runs GROUP BY symbol
)
SELECT symbol, n_runs, n_up, n_down,
       CAST(floor(
         (n_runs - (2.0 * n_up * n_down / (n_up + n_down) + 1.0))
         / sqrt(2.0 * n_up * n_down * (2.0 * n_up * n_down - n_up - n_down)
                / ((CAST(n_up + n_down AS DOUBLE)) * (n_up + n_down)
                   * (n_up + n_down - 1)))
         * 10000 + 0.5) AS BIGINT) AS runs_z_e4
FROM counts
ORDER BY symbol
"""


@register("stats_runs_test", oracle=_RUNS_ORACLE, tags=("stats", "timeseries"))
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the up/down move sequence: too FEW
    runs means momentum (moves cluster), too MANY means mean-reversion
    (moves alternate) — the classic randomness screen for whether a
    return series is exploitable at all. Runs count via the
    break-flag sum (first move counts as a break, so n_runs is exact),
    and the z-score against E[R] = 2 n1 n2/(n1+n2) + 1 with the
    standard variance — all inputs exact BIGINTs, one identical
    double expression per engine, quantized 1e-4. Shares the daily
    rollup + (symbol, day) sort every bars operator rides. The test
    and Mann-Kendall are complements: MK detects monotone DRIFT,
    runs detects serial DEPENDENCE."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("close_cents")
    )
    w = Window.partitionBy("symbol").orderBy("day")
    moves = (
        closes.select(
            "symbol",
            "day",
            F.when(F.col("close_cents") > F.lag("close_cents").over(w), 1)
            .otherwise(0)
            .alias("up"),
            F.lag("close_cents").over(w).alias("prev"),
        )
        .filter(F.col("prev").isNotNull())
        .drop("prev")
    )
    runs = moves.select(
        "symbol",
        "up",
        F.when(F.col("up") == F.lag("up").over(w), 0).otherwise(1).alias("brk"),
    )
    counts = runs.groupBy("symbol").agg(
        F.sum("brk").cast("long").alias("n_runs"),
        F.sum("up").cast("long").alias("n_up"),
        (F.count("*") - F.sum("up")).cast("long").alias("n_down"),
    )
    n1, n2 = F.col("n_up"), F.col("n_down")
    mean_r = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    var_r = (
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2).cast("double") * (n1 + n2) * (n1 + n2 - 1))
    )
    z = F.floor((F.col("n_runs") - mean_r) / F.sqrt(var_r) * 10_000 + F.lit(0.5)).cast(
        "long"
    )
    return counts.select(
        "symbol", "n_runs", "n_up", "n_down", z.alias("runs_z_e4")
    ).orderBy("symbol")
