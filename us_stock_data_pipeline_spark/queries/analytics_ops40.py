"""Round-30 analytics, part 40: cross-sectional momentum backtest,
difference-in-differences, and exact join-size estimation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Cross-sectional momentum backtest (weekly long-short)
# --------------------------------------------------------------------------

_MOM_ORACLE = """
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS close_cents
  FROM events GROUP BY 1, 2
),
weekly AS (  -- last close of each ISO week per symbol
  SELECT symbol, CAST(date_trunc('week', day) AS DATE) AS week,
         CAST(arg_max(close_cents, day) AS BIGINT) AS close_cents
  FROM closes GROUP BY 1, 2
),
rets AS (
  SELECT symbol, week,
         CAST(floor(ln(CAST(close_cents AS DOUBLE)
                       / CAST(lag(close_cents) OVER w AS DOUBLE))
                    * 1000000 + 0.5) AS BIGINT) AS r
  FROM weekly
  WINDOW w AS (PARTITION BY symbol ORDER BY week)
),
signal AS (  -- rank on LAST week's return, trade THIS week's
  SELECT symbol, week, r,
         lag(r) OVER (PARTITION BY symbol ORDER BY week) AS prev_r
  FROM rets
),
ranked AS (
  SELECT week, symbol, r, prev_r,
         row_number() OVER (PARTITION BY week ORDER BY prev_r DESC, symbol) AS rk,
         count(*) OVER (PARTITION BY week) AS n
  FROM signal WHERE prev_r IS NOT NULL AND r IS NOT NULL
)
SELECT week,
       CAST(max(CASE WHEN rk = 1 THEN r END) AS BIGINT) AS long_ret_e6,
       CAST(max(CASE WHEN rk = n THEN r END) AS BIGINT) AS short_ret_e6,
       CAST(max(CASE WHEN rk = 1 THEN r END)
            - max(CASE WHEN rk = n THEN r END) AS BIGINT) AS ls_ret_e6,
       max(CASE WHEN rk = 1 THEN symbol END) AS long_symbol,
       max(CASE WHEN rk = n THEN symbol END) AS short_symbol
FROM ranked
GROUP BY week
ORDER BY week
"""


@register("bars_momentum_backtest", oracle=_MOM_ORACLE, tags=("stock", "window"))
def bars_momentum_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-sectional momentum — the classic factor backtest: each
    week, rank symbols by LAST week's return, go long the winner and
    short the loser, and realize THIS week's returns. The lag between
    signal and trade week is the whole point (same-week ranking is
    look-ahead bias — the rookie backtest bug this operator's shape
    makes impossible by construction: the signal column is lag(r)).
    Unlike the per-symbol turtle walk, this strategy is CROSS-
    sectional — the rank window runs across symbols within a week —
    so the plan is a weekly rollup, one symbol-sorted lag, one
    week-partitioned rank, and a pivot-style conditional aggregate.
    Weekly log returns are 1e-6 BIGINTs; the long-short spread is
    integer subtraction."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("close_cents")
    )
    weekly = closes.groupBy(
        "symbol", F.date_trunc("week", "day").cast("date").alias("week")
    ).agg(F.max_by("close_cents", "day").cast("long").alias("close_cents"))
    w_sym = Window.partitionBy("symbol").orderBy("week")
    rets = weekly.select(
        "symbol",
        "week",
        F.floor(
            F.log(
                F.col("close_cents").cast("double")
                / F.lag("close_cents").over(w_sym).cast("double")
            )
            * 1_000_000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("r"),
    )
    signal = rets.withColumn("prev_r", F.lag("r").over(w_sym)).filter(
        F.col("prev_r").isNotNull() & F.col("r").isNotNull()
    )
    w_week = Window.partitionBy("week").orderBy(F.col("prev_r").desc(), "symbol")
    ranked = signal.select(
        "week",
        "symbol",
        "r",
        F.row_number().over(w_week).alias("rk"),
        F.count("*").over(Window.partitionBy("week")).alias("n"),
    )
    return (
        ranked.groupBy("week")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("r"))).cast("long").alias("long_ret_e6"),
            F.max(F.when(F.col("rk") == F.col("n"), F.col("r")))
            .cast("long")
            .alias("short_ret_e6"),
            (
                F.max(F.when(F.col("rk") == 1, F.col("r")))
                - F.max(F.when(F.col("rk") == F.col("n"), F.col("r")))
            )
            .cast("long")
            .alias("ls_ret_e6"),
            F.max(F.when(F.col("rk") == 1, F.col("symbol"))).alias("long_symbol"),
            F.max(F.when(F.col("rk") == F.col("n"), F.col("symbol"))).alias(
                "short_symbol"
            ),
        )
        .orderBy("week")
    )


# --------------------------------------------------------------------------
# Difference-in-differences
# --------------------------------------------------------------------------

_DID_CUTOVER = "2024-01-15"

_DID_ORACLE = f"""
WITH panel AS (
  SELECT user_id % 2 AS treated,
         CASE WHEN CAST(ts AS DATE) >= DATE '{_DID_CUTOVER}' THEN 1 ELSE 0 END
           AS post,
         CAST(round(value * 100) AS BIGINT) AS y
  FROM events
),
cells AS (
  SELECT treated, post,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS sy
  FROM panel GROUP BY treated, post
),
means AS (
  SELECT CAST(treated AS BIGINT) AS treated, CAST(post AS BIGINT) AS post, n,
         CAST(floor(CAST(sy AS DOUBLE) / n * 1000 + 0.5) AS BIGINT) AS mean_y_milli
  FROM cells
)
SELECT treated, post, n, mean_y_milli,
       (SELECT CAST(
           (max(CASE WHEN treated = 1 AND post = 1 THEN mean_y_milli END)
            - max(CASE WHEN treated = 1 AND post = 0 THEN mean_y_milli END))
         - (max(CASE WHEN treated = 0 AND post = 1 THEN mean_y_milli END)
            - max(CASE WHEN treated = 0 AND post = 0 THEN mean_y_milli END))
         AS BIGINT) FROM means) AS did_milli
FROM means
ORDER BY treated, post
"""


@register("causal_diff_in_diff", oracle=_DID_ORACLE, tags=("stats", "causal"))
def causal_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences — the natural-experiment estimator:
    subtract the control group's pre/post change from the treated
    group's, so any common time trend cancels and what remains is the
    treatment effect (under parallel trends). The 2x2 panel means are
    quantized once to milli-cents (an exact integer comparison after
    that), and the DiD contrast is pure integer arithmetic over the
    four cells. Treatment is the user-parity assignment, the cutover
    a fixed calendar date. Completes the causal family: IPW adjusts
    composition, CMH pools strata, DiD nets out time. Plan: ONE
    aggregate to the 4-cell panel; the estimator itself is free."""
    panel = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).alias("treated"),
        F.when(F.col("ts").cast("date") >= F.lit(_DID_CUTOVER).cast("date"), 1)
        .otherwise(0)
        .alias("post"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    cells = panel.groupBy("treated", "post").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
    )
    means = cells.select(
        F.col("treated").cast("long").alias("treated"),
        F.col("post").cast("long").alias("post"),
        "n",
        F.floor(F.col("sy").cast("double") / F.col("n") * 1000 + F.lit(0.5))
        .cast("long")
        .alias("mean_y_milli"),
    )
    did = means.agg(
        (
            (
                F.max(F.when((F.col("treated") == 1) & (F.col("post") == 1), F.col("mean_y_milli")))
                - F.max(F.when((F.col("treated") == 1) & (F.col("post") == 0), F.col("mean_y_milli")))
            )
            - (
                F.max(F.when((F.col("treated") == 0) & (F.col("post") == 1), F.col("mean_y_milli")))
                - F.max(F.when((F.col("treated") == 0) & (F.col("post") == 0), F.col("mean_y_milli")))
            )
        )
        .cast("long")
        .alias("did_milli")
    )
    return (
        means.crossJoin(F.broadcast(did))
        .select("treated", "post", "n", "mean_y_milli", "did_milli")
        .orderBy("treated", "post")
    )


# --------------------------------------------------------------------------
# Exact join-size estimation (planning diagnostic)
# --------------------------------------------------------------------------

_JSIZE_ORACLE = """
WITH lh AS (
  SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS cl
  FROM lineitem GROUP BY 1
),
oh AS (
  SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS co
  FROM orders GROUP BY 1
),
est AS (
  SELECT CAST(sum(lh.cl * oh.co) AS BIGINT) AS predicted
  FROM lh JOIN oh ON oh.k = lh.k
),
actual AS (
  SELECT CAST(count(*) AS BIGINT) AS actual
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT e.predicted, a.actual,
       CAST(e.predicted - a.actual AS BIGINT) AS estimation_error
FROM est e CROSS JOIN actual a
"""


@register("join_size_estimator", oracle=_JSIZE_ORACLE, tags=("join", "planning"))
def join_size_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation from per-key histograms: the output
    cardinality of an equi join is EXACTLY sum over shared keys of
    count_left(k) * count_right(k), so two cheap key-count aggregates
    predict the join before running it — the number a planner needs
    to choose broadcast vs sort-merge, size shuffle partitions, or
    refuse a runaway query (at 100 TB you run THIS before the join,
    not after the OOM). The query emits prediction, truth, and their
    difference — zero by the identity, which IS the verification
    (production replaces the exact histograms with HLL/count-min
    sketches and accepts bounded error; the identity is what those
    approximate). Plan: two key aggregates + one tiny key join for
    the estimate; the actual join runs only to audit it here."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lh = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count("*").cast("long").alias("cl")
    )
    oh = orders.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count("*").cast("long").alias("co")
    )
    est = lh.join(oh, "k").agg(
        F.sum(F.col("cl") * F.col("co")).cast("long").alias("predicted")
    )
    actual = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .agg(F.count("*").cast("long").alias("actual"))
    )
    return est.crossJoin(F.broadcast(actual)).select(
        "predicted",
        "actual",
        (F.col("predicted") - F.col("actual")).cast("long").alias("estimation_error"),
    )
