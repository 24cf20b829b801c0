"""Round-6 analytics additions, part 5: drawdown, Cutler RSI,
nonparametric + parametric two-sample tests, peak concurrency,
autocorrelation, and CUSUM changepoint detection.

House contract: Spark-first plans, identically-aliased DuckDB oracles.
Float determinism discipline (the round-2 lesson, hardened here):
every cross-row accumulation happens over EXACT integers (cents /
micro-units / counts), promoted through DECIMAL(38,0) on the Spark
side and HUGEINT on the DuckDB side when a sum can exceed int64, and
doubles appear only in single divisions / sqrt of already-exact
numerators — the one shape where IEEE arithmetic is bit-deterministic
across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register


def _round4(col):
    """floor(x*1e4+0.5)/1e4 — bit-identical round-half-up on both
    engines (Spark round() HALF_UPs the decimal repr, DuckDB the binary
    value; floor of a deterministic double is engine-neutral)."""
    return F.floor(col * 10000 + F.lit(0.5)) / 10000


# --------------------------------------------------------------------------
# Max drawdown per symbol
# --------------------------------------------------------------------------

_DRAWDOWN_ORACLE = """
WITH closes AS (
  SELECT event_type AS symbol,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS close_cents
  FROM events GROUP BY 1, 2
),
runs AS (
  SELECT symbol, day, close_cents,
         max(close_cents) OVER (PARTITION BY symbol ORDER BY day
                                ROWS UNBOUNDED PRECEDING) AS peak_cents
  FROM closes
),
dd AS (
  SELECT symbol, day, close_cents, peak_cents,
         floor(CAST(peak_cents - close_cents AS DOUBLE) / peak_cents * 1000000 + 0.5)
           / 1000000 AS drawdown,
         row_number() OVER (
           PARTITION BY symbol
           ORDER BY CAST(peak_cents - close_cents AS DOUBLE) / peak_cents DESC, day
         ) AS rn
  FROM runs
)
SELECT symbol, day AS trough_day, peak_cents, close_cents, drawdown AS max_drawdown
FROM dd WHERE rn = 1
ORDER BY symbol
"""


@register("bars_max_drawdown", oracle=_DRAWDOWN_ORACLE, tags=("stock", "window"))
def bars_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per symbol: running peak of the daily close,
    worst peak-to-trough percentage, and the trough date — the core
    risk statistic every portfolio/backtest readout leads with (the
    reference stores bars but computes no risk metrics; this is the
    first consumer of its `c` close column, `ingest_massive.py:70`).
    Plan shape: one groupBy to the per-(symbol, day) close (partial
    agg map-side), then two windows over the SAME (symbol)/(day)
    partitioning — running max and drawdown ranking share one shuffle.
    Day-grain rows are ~years x symbols, thousands per symbol at most,
    so the per-symbol window task is trivially bounded at any corpus
    scale. Closes are exact integer cents; the drawdown ratio is one
    double division of exact ints."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("close_cents")
    )
    w_run = Window.partitionBy("symbol").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    runs = closes.withColumn("peak_cents", F.max("close_cents").over(w_run))
    dd_raw = (F.col("peak_cents") - F.col("close_cents")).cast("double") / F.col(
        "peak_cents"
    )
    w_rank = Window.partitionBy("symbol").orderBy(dd_raw.desc(), F.col("day"))
    return (
        runs.withColumn(
            "drawdown", F.floor(dd_raw * 1000000 + F.lit(0.5)) / 1000000
        )
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select(
            "symbol",
            F.col("day").alias("trough_day"),
            "peak_cents",
            "close_cents",
            F.col("drawdown").alias("max_drawdown"),
        )
        .orderBy("symbol")
    )


# --------------------------------------------------------------------------
# Cutler RSI (SMA-based relative strength index)
# --------------------------------------------------------------------------

_RSI_N = 14

_RSI_ORACLE = f"""
WITH closes AS (
  SELECT event_type AS symbol,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS close_cents
  FROM events GROUP BY 1, 2
),
moves AS (
  SELECT symbol, day, close_cents,
         close_cents - lag(close_cents) OVER (PARTITION BY symbol ORDER BY day) AS diff,
         row_number() OVER (PARTITION BY symbol ORDER BY day) AS rn
  FROM closes
),
sums AS (
  SELECT symbol, day, rn,
         sum(CASE WHEN diff > 0 THEN diff ELSE 0 END) OVER (
           PARTITION BY symbol ORDER BY day ROWS BETWEEN {_RSI_N - 1} PRECEDING AND CURRENT ROW
         ) AS gains,
         sum(CASE WHEN diff < 0 THEN -diff ELSE 0 END) OVER (
           PARTITION BY symbol ORDER BY day ROWS BETWEEN {_RSI_N - 1} PRECEDING AND CURRENT ROW
         ) AS losses
  FROM moves
)
SELECT symbol, day,
       floor(100.0 * gains / (gains + losses) * 10000 + 0.5) / 10000 AS rsi
FROM sums
WHERE rn > {_RSI_N} AND gains + losses > 0
ORDER BY symbol, day
"""


@register("bars_rsi_cutler", oracle=_RSI_ORACLE, tags=("stock", "window"))
def bars_rsi_cutler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cutler's RSI-14 (SMA of gains vs losses over a 14-bar frame) on
    the daily close series — the momentum companion to
    `bars_technical_indicators`' SMA/Bollinger set. Cutler's SMA
    variant is chosen over Wilder's exponential smoothing precisely
    because it is frame-expressible: two ROWS-frame window sums over
    the SAME (symbol ORDER BY day) window spec — Spark plans lag, both
    rolling sums, and row_number in ONE Window exec after a single
    shuffle on symbol (the recursive Wilder form needs the
    `bars_ema`-style applyInPandas kernel instead). Gains/losses are
    exact integer cents; RSI is one double division."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("close_cents")
    )
    w = Window.partitionBy("symbol").orderBy("day")
    w_frame = w.rowsBetween(-(_RSI_N - 1), 0)
    diff = F.col("close_cents") - F.lag("close_cents").over(w)
    moves = closes.select(
        "symbol",
        "day",
        diff.alias("diff"),
        F.row_number().over(w).alias("rn"),
    )
    sums = moves.select(
        "symbol",
        "day",
        "rn",
        F.sum(F.when(F.col("diff") > 0, F.col("diff")).otherwise(F.lit(0)))
        .over(w_frame)
        .alias("gains"),
        F.sum(F.when(F.col("diff") < 0, -F.col("diff")).otherwise(F.lit(0)))
        .over(w_frame)
        .alias("losses"),
    )
    return (
        sums.filter((F.col("rn") > _RSI_N) & (F.col("gains") + F.col("losses") > 0))
        .select(
            "symbol",
            "day",
            _round4(F.lit(100.0) * F.col("gains") / (F.col("gains") + F.col("losses"))).alias(
                "rsi"
            ),
        )
        .orderBy("symbol", "day")
    )


# --------------------------------------------------------------------------
# Mann-Whitney U (rank-sum) two-sample test
# --------------------------------------------------------------------------

_MWU_ORACLE = """
WITH both_g AS (
  SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 2 END AS grp
  FROM events WHERE event_type IN ('click', 'purchase')
),
ranked AS (
  -- 2x the midrank is an exact integer: lo + hi rank of the tie run.
  SELECT grp,
         2 * rank() OVER (ORDER BY value)
           + count(*) OVER (PARTITION BY value) - 1 AS rank2
  FROM both_g
),
sums AS (
  SELECT
    CAST(sum(CASE WHEN grp = 1 THEN rank2 ELSE 0 END) AS BIGINT) AS r1x2,
    CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM ranked
),
ties AS (
  SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie3
  FROM (SELECT count(*) AS t FROM both_g GROUP BY value) tt
)
SELECT n1, n2,
       (r1x2 - n1 * (n1 + 1)) / 2.0 AS u_stat,
       floor(((r1x2 - n1 * (n1 + 1)) / 2.0 - CAST(n1 AS DOUBLE) * n2 / 2)
             / sqrt(CAST(n1 AS DOUBLE) * n2 / 12
                    * ((n1 + n2 + 1) - CAST(tie3 AS DOUBLE)
                       / ((n1 + n2) * (n1 + n2 - 1.0))))
             * 10000 + 0.5) / 10000 AS z_score
FROM sums, ties
"""


@register("stats_mannwhitney_u", oracle=_MWU_ORACLE, tags=("stats", "test"))
def stats_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test: are 'click' and 'purchase' event
    values drawn from the same distribution? The nonparametric sibling
    of `events_ab_test_lift` (proportions z) and `stats_welch_ttest`
    (means t) — the applied-stats trio every experimentation platform
    ships. Midranks with tie correction are carried as 2x-scaled EXACT
    integers (lo+hi of each tie run), so the rank-sum — the entire
    cross-row accumulation — never touches a float; U, the tie-adjusted
    variance, and z are single driver-free scalar expressions at the
    end. Plan: one global rank window (the two-group subset, already
    filtered; at 100 TB you'd pre-aggregate to (value, grp, count)
    first — same midrank math on run-lengths), one tie groupBy, one
    1-row cross join."""
    ev = load_table(spark, sf_dir, "events")
    both_g = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "value",
        F.when(F.col("event_type") == "click", F.lit(1)).otherwise(F.lit(2)).alias("grp"),
    )
    rank2 = (
        F.lit(2) * F.rank().over(Window.orderBy("value"))
        + F.count(F.lit(1)).over(Window.partitionBy("value"))
        - 1
    )
    ranked = both_g.select("grp", rank2.alias("rank2"))
    sums = ranked.agg(
        F.sum(F.when(F.col("grp") == 1, F.col("rank2")).otherwise(F.lit(0)))
        .cast("long")
        .alias("r1x2"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("grp") == 2, 1).otherwise(0)).cast("long").alias("n2"),
    )
    ties = (
        both_g.groupBy("value")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
            .cast("long")
            .alias("tie3")
        )
    )
    j = sums.crossJoin(F.broadcast(ties))
    u = (F.col("r1x2") - F.col("n1") * (F.col("n1") + 1)) / 2.0
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    n = F.col("n1") + F.col("n2")
    sigma = F.sqrt(
        n1d * n2d / 12
        * ((n + 1) - F.col("tie3").cast("double") / (n * (n - F.lit(1.0))))
    )
    return j.select(
        "n1",
        "n2",
        u.alias("u_stat"),
        _round4((u - n1d * n2d / 2) / sigma).alias("z_score"),
    )


# --------------------------------------------------------------------------
# Welch's t-test (unequal-variance two-sample means)
# --------------------------------------------------------------------------

_WELCH_ORACLE = """
WITH seg AS (
  SELECT c.c_mktsegment AS grp,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
),
m AS (
  SELECT
    CAST(sum(CASE WHEN grp = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN grp = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
    CAST(sum(CASE WHEN grp = 'BUILDING' THEN cents ELSE 0 END) AS HUGEINT) AS s1,
    CAST(sum(CASE WHEN grp = 'MACHINERY' THEN cents ELSE 0 END) AS HUGEINT) AS s2,
    CAST(sum(CASE WHEN grp = 'BUILDING' THEN cents * cents ELSE 0 END) AS HUGEINT) AS ss1,
    CAST(sum(CASE WHEN grp = 'MACHINERY' THEN cents * cents ELSE 0 END) AS HUGEINT) AS ss2
  FROM seg
)
SELECT n1, n2,
       floor(CAST(s1 AS DOUBLE) / n1 / 100 * 10000 + 0.5) / 10000 AS mean1,
       floor(CAST(s2 AS DOUBLE) / n2 / 100 * 10000 + 0.5) / 10000 AS mean2,
       floor((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
             / sqrt((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
                      / (n1 - 1) / n1
                    + (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2)
                      / (n2 - 1) / n2)
             * 10000 + 0.5) / 10000 AS t_stat,
       floor(
         ((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
            / (n1 - 1) / n1
          + (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2)
            / (n2 - 1) / n2)
         * ((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
              / (n1 - 1) / n1
            + (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2)
              / (n2 - 1) / n2)
         / (
           (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
             / (n1 - 1) / n1
           * ((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
                / (n1 - 1) / n1)
           / (n1 - 1)
           + (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2)
             / (n2 - 1) / n2
             * ((CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2)
                  / (n2 - 1) / n2)
             / (n2 - 1)
         ) * 100 + 0.5) / 100 AS welch_df
FROM m
"""


@register("stats_welch_ttest", oracle=_WELCH_ORACLE, tags=("stats", "test"))
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test: do BUILDING and MACHINERY
    customers differ in mean order value? One fact-dim join (customer
    side prunes to 2 segments and broadcasts under AQE) feeding a
    single-pass conditional aggregate — count/sum/sum-of-squares per
    group in ONE reduce, the map-side-combinable shape that holds at
    any scale. Sums of squared cents exceed int64 (~5e15 per order
    squared), so they ride DECIMAL(38,0) on the Spark side / HUGEINT
    in DuckDB — both exact — and every float (means, pooled standard
    error, t, Welch-Satterthwaite df) is a closed-form expression of
    those exact integers evaluated once."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    seg = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cents_sq = (F.col("cents") * F.col("cents")).cast("decimal(38,0)")
    is1 = F.col("grp") == "BUILDING"
    m = seg.agg(
        F.sum(F.when(is1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(~is1, 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(is1, F.col("cents")).otherwise(F.lit(0)))
        .cast("decimal(38,0)")
        .alias("s1"),
        F.sum(F.when(~is1, F.col("cents")).otherwise(F.lit(0)))
        .cast("decimal(38,0)")
        .alias("s2"),
        F.sum(F.when(is1, cents_sq).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("ss1"),
        F.sum(F.when(~is1, cents_sq).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("ss2"),
    )
    s1d, s2d = F.col("s1").cast("double"), F.col("s2").cast("double")
    ss1d, ss2d = F.col("ss1").cast("double"), F.col("ss2").cast("double")
    n1, n2 = F.col("n1"), F.col("n2")
    se1 = (ss1d - s1d * s1d / n1) / (n1 - 1) / n1  # var1/n1
    se2 = (ss2d - s2d * s2d / n2) / (n2 - 1) / n2
    t_stat = (s1d / n1 - s2d / n2) / F.sqrt(se1 + se2)
    welch_df = (se1 + se2) * (se1 + se2) / (
        se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)
    )
    return m.select(
        "n1",
        "n2",
        _round4(s1d / n1 / 100).alias("mean1"),
        _round4(s2d / n2 / 100).alias("mean2"),
        _round4(t_stat).alias("t_stat"),
        (F.floor(welch_df * 100 + F.lit(0.5)) / 100).alias("welch_df"),
    )


# --------------------------------------------------------------------------
# Peak concurrent sessions (sweep-line over interval endpoints)
# --------------------------------------------------------------------------

_CONCURRENCY_ORACLE = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > 1800000000 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
sess AS (
  SELECT user_id, sid, min(ts) AS s_start,
         max(ts) + INTERVAL 1 SECOND AS s_end
  FROM (
    SELECT user_id, ts,
           sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
    FROM marked
  ) numbered
  GROUP BY user_id, sid
),
deltas AS (
  SELECT s_start AS t, 1 AS delta, user_id FROM sess
  UNION ALL
  SELECT s_end AS t, -1 AS delta, user_id FROM sess
),
runs AS (
  SELECT t, sum(delta) OVER (ORDER BY t, delta, user_id
                             ROWS UNBOUNDED PRECEDING) AS live
  FROM deltas
),
daily AS (
  SELECT CAST(date_trunc('day', t) AS DATE) AS day, t, live,
         max(live) OVER (PARTITION BY CAST(date_trunc('day', t) AS DATE)) AS peak
  FROM runs
)
SELECT day, CAST(peak AS BIGINT) AS peak_concurrent,
       min(t) FILTER (WHERE live = peak) AS first_peak_ts
FROM daily
GROUP BY day, peak
ORDER BY day
"""


@register("events_concurrency_peak", oracle=_CONCURRENCY_ORACLE, tags=("analytics", "sessions"))
def events_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day via the classic sweep-line:
    sessionize (30-min gap rule, same islands logic as
    `etl_sessionization_gaps`), emit +1/-1 interval endpoints, running
    sum in endpoint order, take each day's max and its first hit time.
    Intervals are half-open [start, end+1s) — an end and a start at the
    same instant hand over without double-counting (delta sorts -1
    first). Scale: the sweep runs over SESSION ENDPOINTS, not raw
    events — sessionization already reduced the data by the per-user
    groupBy, and the global ordered sum over endpoints is the one
    genuinely sequential step (Spark executes it as a single-partition
    window; the distributed form is per-range partial sums + prefix
    offsets, the textbook two-pass scan, worth it only when endpoint
    count itself is cluster-sized)."""
    ev = load_table(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_s = (
        F.when(
            F.lag("ts").over(w_user).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w_user))
                > 1800 * 1000 * 1000
            ),
            1,
        )
        .otherwise(0)
    )
    numbered = ev.select(
        "user_id",
        "ts",
        F.sum(new_s).over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("sid"),
    )
    sess = numbered.groupBy("user_id", "sid").agg(
        F.min("ts").alias("s_start"),
        (F.max("ts") + F.expr("INTERVAL 1 SECOND")).alias("s_end"),
    )
    deltas = sess.select(
        F.col("s_start").alias("t"), F.lit(1).alias("delta"), "user_id"
    ).unionAll(
        sess.select(F.col("s_end").alias("t"), F.lit(-1).alias("delta"), "user_id")
    )
    runs = deltas.select(
        "t",
        F.sum("delta")
        .over(
            Window.orderBy("t", "delta", "user_id").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("live"),
    )
    day = F.date_trunc("day", F.col("t")).cast("date")
    daily = runs.select(
        day.alias("day"),
        "t",
        "live",
        F.max("live").over(Window.partitionBy(day)).alias("peak"),
    )
    return (
        daily.groupBy("day", "peak")
        .agg(F.min(F.when(F.col("live") == F.col("peak"), F.col("t"))).alias("first_peak_ts"))
        .select("day", F.col("peak").cast("long").alias("peak_concurrent"), "first_peak_ts")
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Autocorrelation function of daily revenue
# --------------------------------------------------------------------------

_ACF_MAXLAG = 7

_ACF_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS HUGEINT) AS cents
  FROM orders GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(cents) AS HUGEINT) AS s FROM daily
),
dev AS (
  -- n*x - S: the mean-centered series scaled by n, still an exact integer.
  SELECT row_number() OVER (ORDER BY day) AS i,
         tot.n * daily.cents - tot.s AS d
  FROM daily, tot
),
lagged AS (
  SELECT lag.lag_k AS lag,
         CAST(sum(a.d * b.d) AS HUGEINT) AS num
  FROM dev a
  JOIN (SELECT unnest(generate_series(1, {_ACF_MAXLAG})) AS lag_k) lag ON true
  JOIN dev b ON b.i = a.i - lag.lag_k
  GROUP BY 1
),
den AS (
  SELECT CAST(sum(d * d) AS HUGEINT) AS den FROM dev
)
SELECT CAST(lag AS BIGINT) AS lag,
       floor(CAST(num AS DOUBLE) / CAST(den.den AS DOUBLE) * 10000 + 0.5) / 10000
         AS autocorr
FROM lagged, den
ORDER BY lag
"""


@register("timeseries_acf", oracle=_ACF_ORACLE, tags=("timeseries", "stats"))
def timeseries_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily-revenue series at lags 1..7 — the
    first diagnostic of any forecasting pipeline (seasonality shows up
    as lag-7 mass; `events_seasonality_chisq` is the categorical
    sibling). Determinism: the series is mean-centered WITHOUT a float
    mean by multiplying through by n (d_t = n*x_t - S, exact ints that
    outgrow int64 → DECIMAL(38,0)/HUGEINT), so numerator and
    denominator are exact and each r_k is one double division. Plan:
    the day-grain series is years-of-days small; the lag join is a
    self-join on a dense row index (Spark: one window for the index,
    then a lag-offset equi-join — broadcast-sized at day grain; at
    minute grain the same plan shuffles on the index range, still one
    equi-join per lag set, never quadratic)."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("decimal(38,0)")
        .alias("cents")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("cents").cast("decimal(38,0)").alias("s"),
    )
    dev = daily.crossJoin(F.broadcast(tot)).select(
        F.row_number().over(Window.orderBy("day")).alias("i"),
        (F.col("n") * F.col("cents") - F.col("s")).alias("d"),
    )
    lags = spark.range(1, _ACF_MAXLAG + 1).select(F.col("id").alias("lag"))
    a = dev.alias("a")
    b = dev.alias("b")
    lagged = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("b.i") == F.col("a.i") - F.col("lag"))
        .groupBy("lag")
        .agg(F.sum(F.col("a.d") * F.col("b.d")).cast("decimal(38,0)").alias("num"))
    )
    den = dev.agg(F.sum(F.col("d") * F.col("d")).cast("decimal(38,0)").alias("den"))
    return (
        lagged.crossJoin(F.broadcast(den))
        .select(
            F.col("lag").cast("long").alias("lag"),
            _round4(F.col("num").cast("double") / F.col("den").cast("double")).alias(
                "autocorr"
            ),
        )
        .orderBy("lag")
    )


# --------------------------------------------------------------------------
# CUSUM changepoint detection
# --------------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s
  FROM daily GROUP BY 1
),
cusum AS (
  SELECT d.event_type, d.day, d.n,
         sum(d.n * d.x - d.s) OVER (PARTITION BY d.event_type ORDER BY d.day
                                    ROWS UNBOUNDED PRECEDING) AS c
  FROM (SELECT daily.*, tot.n, tot.s FROM daily JOIN tot USING (event_type)) d
),
ranked AS (
  SELECT event_type, day, n, c,
         row_number() OVER (PARTITION BY event_type ORDER BY abs(c) DESC, day) AS rn
  FROM cusum
)
SELECT event_type, day AS change_day,
       floor(CAST(abs(c) AS DOUBLE) / n * 10000 + 0.5) / 10000 AS max_cusum
FROM ranked WHERE rn = 1
ORDER BY event_type
"""


@register("timeseries_changepoint_cusum", oracle=_CUSUM_ORACLE, tags=("timeseries", "anomaly"))
def timeseries_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on the per-type daily event-count
    series: the day where the cumulative deviation from the series mean
    peaks is the most likely level-shift point (Page's statistic with
    the known-mean reference). Mean-centering again multiplies through
    by n (c_t = sum of n*x_i - S, exact ints), so the running sum —
    the accumulation that decides the argmax — is exact, and the only
    float is the final /n normalization of the winner. Plan: two
    groupBys to day grain, a broadcast join of the per-type totals, one
    (event_type ORDER BY day) window for the running sum, one ranking
    window over the SAME partitioning — a single shuffle on event_type
    end to end."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    d = daily.join(F.broadcast(tot), "event_type")
    w_run = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cusum = d.select(
        "event_type",
        "day",
        "n",
        F.sum(F.col("n") * F.col("x") - F.col("s")).over(w_run).alias("c"),
    )
    w_rank = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("c")).desc(), F.col("day")
    )
    return (
        cusum.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("change_day"),
            _round4(F.abs(F.col("c")).cast("double") / F.col("n")).alias("max_cusum"),
        )
        .orderBy("event_type")
    )
