"""Round-7 relational additions, part 15: stochastic oscillator,
on-balance volume, co-purchase degree distribution, and weekday
seasonality indices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Stochastic oscillator %K / %D
# --------------------------------------------------------------------------

_STOCH_N = 14  # lookback for %K
_STOCH_D = 3  # smoothing for %D

_STOCH_ORACLE = f"""
WITH closes AS (
  SELECT event_type AS symbol,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS close_cents
  FROM events GROUP BY 1, 2
),
ranged AS (
  SELECT symbol, day, close_cents,
         min(close_cents) OVER (PARTITION BY symbol ORDER BY day
           ROWS BETWEEN {_STOCH_N - 1} PRECEDING AND CURRENT ROW) AS lo,
         max(close_cents) OVER (PARTITION BY symbol ORDER BY day
           ROWS BETWEEN {_STOCH_N - 1} PRECEDING AND CURRENT ROW) AS hi,
         row_number() OVER (PARTITION BY symbol ORDER BY day) AS rn
  FROM closes
),
k AS (
  SELECT symbol, day, rn,
         (close_cents - lo) * 1000000 // (hi - lo) AS k_bp
  FROM ranged
  WHERE rn >= {_STOCH_N} AND hi > lo
)
SELECT symbol, day,
       floor(CAST(k_bp AS DOUBLE) / 100 + 0.5) / 100 AS pct_k,
       floor(avg(CAST(k_bp AS DOUBLE)) OVER (PARTITION BY symbol ORDER BY day
               ROWS BETWEEN {_STOCH_D - 1} PRECEDING AND CURRENT ROW) / 100 + 0.5) / 100
         AS pct_d
FROM k
ORDER BY symbol, day
"""


@register("bars_stochastic_oscillator", oracle=_STOCH_ORACLE, tags=("stock", "window"))
def bars_stochastic_oscillator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic oscillator: %K locates today's close inside the
    {_STOCH_N}-day range ((close-low)/(high-low)), %D smooths %K over
    {_STOCH_D} days — the momentum pair traders read next to RSI
    (`bars_rsi_cutler`), answering "where in its recent range is the
    price" rather than "how one-sided were the moves". %K is EXACT:
    an integer floor-division of cent spreads at basis-point
    resolution, so the engines can't drift; %D averages those exact
    integers (sum is exact in double far below 2^53). All three
    windows — range min/max, row_number, %D — share one (symbol, day)
    sort: a single shuffle over the daily table, which is
    calendar-bounded regardless of tick volume."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("close_cents"))
    w_ord = Window.partitionBy("symbol").orderBy("day")
    w_rng = w_ord.rowsBetween(-(_STOCH_N - 1), 0)
    ranged = closes.select(
        "symbol",
        "day",
        "close_cents",
        F.min("close_cents").over(w_rng).alias("lo"),
        F.max("close_cents").over(w_rng).alias("hi"),
        F.row_number().over(w_ord).alias("rn"),
    )
    k = ranged.filter(
        (F.col("rn") >= _STOCH_N) & (F.col("hi") > F.col("lo"))
    ).select(
        "symbol",
        "day",
        F.expr("(close_cents - lo) * 1000000 div (hi - lo)").alias("k_bp"),
    )
    w_d = Window.partitionBy("symbol").orderBy("day").rowsBetween(-(_STOCH_D - 1), 0)
    return k.select(
        "symbol",
        "day",
        (F.floor(F.col("k_bp").cast("double") / 100 + F.lit(0.5)) / 100).alias("pct_k"),
        (
            F.floor(F.avg(F.col("k_bp").cast("double")).over(w_d) / 100 + F.lit(0.5))
            / 100
        ).alias("pct_d"),
    ).orderBy("symbol", "day")


# --------------------------------------------------------------------------
# On-balance volume (OBV)
# --------------------------------------------------------------------------

_OBV_ORACLE = """
WITH daily AS (
  SELECT event_type AS symbol,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS close_cents,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS vol_cents
  FROM events GROUP BY 1, 2
),
signed AS (
  SELECT symbol, day, close_cents, vol_cents,
         CASE WHEN close_cents > lag(close_cents) OVER w THEN vol_cents
              WHEN close_cents < lag(close_cents) OVER w THEN -vol_cents
              ELSE 0 END AS delta
  FROM daily
  WINDOW w AS (PARTITION BY symbol ORDER BY day)
)
SELECT symbol, day, close_cents,
       CAST(sum(delta) OVER (PARTITION BY symbol ORDER BY day
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS obv_cents
FROM signed
ORDER BY symbol, day
"""


@register("bars_obv", oracle=_OBV_ORACLE, tags=("stock", "window"))
def bars_obv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-balance volume: volume flows INTO the running total on up
    days and OUT on down days — the classic volume-confirmation line
    read against price (`bars_vwap_twap` weights price by volume;
    OBV accumulates volume by price DIRECTION). First bar contributes
    0 (lag is null). Everything is exact integer cents: daily closes
    by arg_max, signed deltas, and the cumulative sum, so the
    indicator is bit-identical however partials merge. The lag and the
    cumsum share one (symbol, day) sort after the daily rollup — one
    fact shuffle, one calendar-bounded window pass."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("close_cents"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("vol_cents"),
    )
    w = Window.partitionBy("symbol").orderBy("day")
    prev = F.lag("close_cents").over(w)
    signed = daily.select(
        "symbol",
        "day",
        "close_cents",
        F.when(F.col("close_cents") > prev, F.col("vol_cents"))
        .when(F.col("close_cents") < prev, -F.col("vol_cents"))
        .otherwise(0)
        .alias("delta"),
    )
    w_cum = w.rowsBetween(Window.unboundedPreceding, 0)
    return signed.select(
        "symbol",
        "day",
        "close_cents",
        F.sum("delta").over(w_cum).cast("long").alias("obv_cents"),
    ).orderBy("symbol", "day")


# --------------------------------------------------------------------------
# Co-purchase graph degree distribution
# --------------------------------------------------------------------------

_DEGREE_ORACLE = """
WITH lines AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lines a JOIN lines b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
  ) GROUP BY node
)
SELECT CAST(length(bin(degree)) - 1 AS BIGINT) AS degree_bucket,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(min(degree) AS BIGINT) AS min_degree,
       CAST(max(degree) AS BIGINT) AS max_degree,
       floor(avg(CAST(degree AS DOUBLE)) * 10000 + 0.5) / 10000 AS mean_degree
FROM deg
GROUP BY 1
ORDER BY degree_bucket
"""


@register("graph_degree_distribution", oracle=_DEGREE_ORACLE, tags=("graph", "analytics"))
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the part co-purchase graph on log2
    buckets — the first diagnostic run on any graph before heavier
    algorithms (`graph_triangle_count`, `graph_pagerank_trade`),
    because a heavy-tailed degree histogram predicts exactly where
    those algorithms will skew. Edge generation is the bounded
    within-order self-join (orders have a handful of lines, so the
    per-key blowup is a small constant — never |parts|^2), distinct
    dedups multi-order pairs, and degrees come from one groupBy over
    the doubled edge list. The log2 bucket is the integer BIT LENGTH
    (length(bin(degree)) - 1), not floor(log2(degree)): at exact
    powers of two a libm whose log2 lands a hair under 2^k flips the
    bucket, while bit-length is exact integer arithmetic in both
    engines (transcendental audit r9 tier-1 fix). Everything else is
    exact integers."""
    li = load_table(spark, sf_dir, "lineitem")
    lines = li.select("l_orderkey", "l_partkey").distinct()
    a, b = lines.alias("a"), lines.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    return (
        deg.groupBy((F.length(F.bin("degree")) - 1).cast("long").alias("degree_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("degree").cast("long").alias("min_degree"),
            F.max("degree").cast("long").alias("max_degree"),
            (
                F.floor(F.avg(F.col("degree").cast("double")) * 10000 + F.lit(0.5))
                / 10000
            ).alias("mean_degree"),
        )
        .orderBy("degree_bucket")
    )


# --------------------------------------------------------------------------
# Weekday seasonality index
# --------------------------------------------------------------------------

_SEASON_IDX_ORACLE = """
WITH daily AS (
  SELECT event_type AS symbol,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
per_dow AS (
  SELECT symbol, CAST(date_part('isodow', day) AS BIGINT) AS dow,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(cents) AS BIGINT) AS dow_cents
  FROM daily GROUP BY 1, 2
),
overall AS (
  SELECT symbol, CAST(sum(cents) AS BIGINT) AS all_cents,
         CAST(count(*) AS BIGINT) AS all_days
  FROM daily GROUP BY symbol
)
SELECT p.symbol, p.dow, p.n_days,
       floor((CAST(p.dow_cents AS DOUBLE) / p.n_days)
             / (CAST(o.all_cents AS DOUBLE) / o.all_days) * 10000 + 0.5) / 10000
         AS seasonal_index
FROM per_dow p JOIN overall o ON o.symbol = p.symbol
ORDER BY p.symbol, p.dow
"""


@register("timeseries_weekday_index", oracle=_SEASON_IDX_ORACLE, tags=("timeseries", "analytics"))
def timeseries_weekday_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicative weekday seasonality index per symbol: mean daily
    revenue on each ISO weekday divided by the overall mean daily
    revenue — index 1.2 means "Mondays run 20% hot", the
    classical-decomposition seasonal factor a forecaster divides out
    before trend fitting (`events_seasonality_chisq` TESTS whether
    weekday structure exists; this QUANTIFIES it as reusable
    factors). Both means are ratios of exact integer sums, divided
    once at the end. One fact groupBy to days, two tiny rollups, one
    broadcast join — the weekday table is 7 rows per symbol
    forever."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents"))
    per_dow = daily.groupBy(
        "symbol", (F.weekday("day") + 1).cast("long").alias("dow")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("cents").cast("long").alias("dow_cents"),
    )
    overall = daily.groupBy("symbol").agg(
        F.sum("cents").cast("long").alias("all_cents"),
        F.count(F.lit(1)).cast("long").alias("all_days"),
    )
    return (
        per_dow.join(F.broadcast(overall), "symbol")
        .select(
            "symbol",
            "dow",
            "n_days",
            (
                F.floor(
                    (F.col("dow_cents").cast("double") / F.col("n_days"))
                    / (F.col("all_cents").cast("double") / F.col("all_days"))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("seasonal_index"),
        )
        .orderBy("symbol", "dow")
    )
