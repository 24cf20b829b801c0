"""Round-18 analytics, part 29: market-microstructure operators over the
tick stream — Lee-Ready tick-rule trade signing, information-driven
volume bars, Roll's implied spread, and the Amihud illiquidity measure.

The reference pipeline stops at time bars (ingest_massive.py:120-141
builds 1-minute OHLCV); these four are the microstructure layer a
stock-data platform adds on top of the same tick stream, re-expressed
as single-shuffle window/groupBy plans with exact-integer cents so the
DuckDB oracle hash-matches bit for bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Tick-rule trade signing (Lee-Ready without quotes)
# --------------------------------------------------------------------------

_TICK_ORACLE = """
WITH trades AS (
  SELECT event_type AS symbol, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS price_cents
  FROM events
),
ticks AS (
  SELECT symbol, ts, event_id, price_cents,
         CASE WHEN price_cents > lag(price_cents) OVER w THEN 1
              WHEN price_cents < lag(price_cents) OVER w THEN -1
              ELSE NULL END AS tick
  FROM trades
  WINDOW w AS (PARTITION BY symbol ORDER BY event_id)
),
signed AS (
  SELECT symbol, ts, event_id, price_cents,
         last_value(tick IGNORE NULLS) OVER (
           PARTITION BY symbol ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sgn
  FROM ticks
)
SELECT symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
       CAST(count(*) FILTER (WHERE sgn = 1) AS BIGINT) AS n_buys,
       CAST(count(*) FILTER (WHERE sgn = -1) AS BIGINT) AS n_sells,
       CAST(count(*) FILTER (WHERE sgn IS NULL) AS BIGINT) AS n_unsigned,
       CAST(coalesce(sum(sgn * price_cents), 0) AS BIGINT) AS signed_flow_cents
FROM signed
GROUP BY symbol, day
ORDER BY symbol, day
"""


@register("bars_tick_rule_signing", oracle=_TICK_ORACLE, tags=("stock", "window"))
def bars_tick_rule_signing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tick-rule trade classification (the quote-free half of
    Lee-Ready): an uptick signs a trade +1 (buyer-initiated), a
    downtick -1, and a zero-tick inherits the last non-zero sign — a
    carry-forward expressed as `last(..., ignorenulls=True)` over an
    unbounded-preceding frame, so the whole per-symbol pass is two
    stacked window functions on ONE (symbol, event_id) sort: lag for
    the tick, last-ignore-nulls for the carry. Leading trades with no
    prior tick stay unsigned and are reported, not silently dropped.
    Daily buy/sell counts and the signed cent flow (order-flow
    imbalance) aggregate exactly in BIGINT. At 100 TB the single
    shuffle is keyed on symbol — the natural partitioner for every
    per-symbol microstructure pass, so adjacent operators reuse it.

    Reference provenance: the reference's session labeling
    (1m-seesion-pipeline/utils.py:7-19) buckets the same stream by
    time; this is the trade-direction bucketing the literature adds.
    """
    trades = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("symbol"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("price_cents"),
    )
    w = Window.partitionBy("symbol").orderBy("event_id")
    w_carry = w.rowsBetween(Window.unboundedPreceding, 0)
    ticks = trades.withColumn(
        "tick",
        F.when(F.col("price_cents") > F.lag("price_cents").over(w), 1)
        .when(F.col("price_cents") < F.lag("price_cents").over(w), -1)
        .otherwise(F.lit(None).cast("int")),
    )
    signed = ticks.withColumn(
        "sgn", F.last("tick", ignorenulls=True).over(w_carry)
    )
    return (
        signed.groupBy("symbol", F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(
            F.count(F.when(F.col("sgn") == 1, 1)).cast("long").alias("n_buys"),
            F.count(F.when(F.col("sgn") == -1, 1)).cast("long").alias("n_sells"),
            F.count(F.when(F.col("sgn").isNull(), 1)).cast("long").alias("n_unsigned"),
            F.coalesce(F.sum(F.col("sgn") * F.col("price_cents")), F.lit(0))
            .cast("long")
            .alias("signed_flow_cents"),
        )
        .orderBy("symbol", "day")
    )


# --------------------------------------------------------------------------
# Information-driven volume bars (de Prado)
# --------------------------------------------------------------------------

_VBAR_THRESH = 100_000  # cents of traded value per bar

_VBAR_ORACLE = f"""
WITH trades AS (
  SELECT event_type AS symbol, event_id,
         CAST(round(value * 100) AS BIGINT) AS price_cents
  FROM events
),
cum AS (
  SELECT symbol, event_id, price_cents,
         coalesce(sum(price_cents) OVER (
           PARTITION BY symbol ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM trades
)
SELECT symbol, CAST(cum_before // {_VBAR_THRESH} AS BIGINT) AS bar_id,
       CAST(count(*) AS BIGINT) AS n_trades,
       CAST(arg_min(price_cents, event_id) AS BIGINT) AS open_cents,
       CAST(max(price_cents) AS BIGINT) AS high_cents,
       CAST(min(price_cents) AS BIGINT) AS low_cents,
       CAST(arg_max(price_cents, event_id) AS BIGINT) AS close_cents,
       CAST(sum(price_cents) AS BIGINT) AS bar_value_cents
FROM cum
GROUP BY symbol, bar_id
ORDER BY symbol, bar_id
"""


@register("bars_volume_bars", oracle=_VBAR_ORACLE, tags=("stock", "window"))
def bars_volume_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information-driven VOLUME bars (Lopez de Prado): instead of
    slicing the tape by wall clock (the reference's 1-minute bars,
    ingest_massive.py:120-141), close a bar every time ~${_VBAR_THRESH}
    cents of value trades — so bar density tracks activity and each
    bar carries comparable information. The bar id is a running-cents
    prefix sum (exclusive frame, so a trade that crosses the threshold
    OPENS the next bar) floor-divided by the threshold — one window
    over the (symbol, event_id) sort, then one hash aggregate for
    OHLC; open/close are arg_min/arg_max on the same monotone
    event_id the house time bars use. Exact BIGINT end to end. At
    100 TB both stages share the symbol-keyed shuffle and the prefix
    sum is the only stateful pass — no iteration, no driver loop."""
    trades = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("symbol"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("price_cents"),
    )
    w_cum = (
        Window.partitionBy("symbol")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = trades.withColumn(
        "cum_before", F.coalesce(F.sum("price_cents").over(w_cum), F.lit(0))
    )
    return (
        cum.groupBy(
            "symbol",
            F.expr(f"cum_before div {_VBAR_THRESH}").cast("long").alias("bar_id"),
        )
        .agg(
            F.count("*").cast("long").alias("n_trades"),
            F.min_by("price_cents", "event_id").cast("long").alias("open_cents"),
            F.max("price_cents").cast("long").alias("high_cents"),
            F.min("price_cents").cast("long").alias("low_cents"),
            F.max_by("price_cents", "event_id").cast("long").alias("close_cents"),
            F.sum("price_cents").cast("long").alias("bar_value_cents"),
        )
        .orderBy("symbol", "bar_id")
    )


# --------------------------------------------------------------------------
# Roll's implied bid-ask spread
# --------------------------------------------------------------------------

_ROLL_ORACLE = """
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS close_cents
  FROM events GROUP BY 1, 2
),
deltas AS (
  SELECT symbol,
         close_cents - lag(close_cents) OVER w AS dp,
         lag(close_cents) OVER w - lag(close_cents, 2) OVER w AS dp_prev
  FROM closes
  WINDOW w AS (PARTITION BY symbol ORDER BY day)
),
sums AS (
  SELECT symbol,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(dp) AS BIGINT) AS sy,
         CAST(sum(dp_prev) AS BIGINT) AS sx,
         CAST(sum(dp * dp_prev) AS BIGINT) AS sxy
  FROM deltas WHERE dp IS NOT NULL AND dp_prev IS NOT NULL
  GROUP BY symbol
)
SELECT symbol, n AS n_pairs,
       CASE WHEN n * sxy - sx * sy < 0 THEN
         CAST(floor(2 * sqrt(-(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * n AS DOUBLE)))
                    * 1000 + 0.5) AS BIGINT)
       ELSE NULL END AS roll_spread_millicents
FROM sums
ORDER BY symbol
"""


@register("bars_roll_spread", oracle=_ROLL_ORACLE, tags=("stock", "stats"))
def bars_roll_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roll (1984) implied bid-ask spread: bid-ask bounce makes
    successive price CHANGES negatively autocorrelated, and the spread
    is recoverable as 2*sqrt(-cov(dp_t, dp_{t-1})) without ever seeing
    a quote. Daily close deltas are exact BIGINT; the population
    covariance is assembled from integer power sums
    (n*Sxy - Sx*Sy)/n^2 — one double division at the very end, so
    both engines see bit-identical doubles into the IEEE-exact sqrt,
    then the spread is quantized to milli-cents. A non-negative
    covariance means the model is undefined for that symbol (reported
    NULL, not dropped). Plan: daily rollup (one shuffle), two lags on
    the same symbol sort, one hash agg — the power-sum trick means no
    second pass over the deltas and no engine-specific covar_pop."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("close_cents")
    )
    w = Window.partitionBy("symbol").orderBy("day")
    deltas = closes.select(
        "symbol",
        (F.col("close_cents") - F.lag("close_cents").over(w)).alias("dp"),
        (F.lag("close_cents").over(w) - F.lag("close_cents", 2).over(w)).alias(
            "dp_prev"
        ),
    ).filter(F.col("dp").isNotNull() & F.col("dp_prev").isNotNull())
    sums = deltas.groupBy("symbol").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("dp").cast("long").alias("sy"),
        F.sum("dp_prev").cast("long").alias("sx"),
        F.sum(F.col("dp") * F.col("dp_prev")).cast("long").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    spread = F.floor(
        2 * F.sqrt(-(num.cast("double") / (F.col("n") * F.col("n")).cast("double")))
        * 1000
        + F.lit(0.5)
    ).cast("long")
    return sums.select(
        "symbol",
        F.col("n").alias("n_pairs"),
        F.when(num < 0, spread).alias("roll_spread_millicents"),
    ).orderBy("symbol")


# --------------------------------------------------------------------------
# Amihud illiquidity
# --------------------------------------------------------------------------

_AMIHUD_SCALE = 1_000_000_000_000_000  # 1e15: |ret|/dollar-cents is ~1e-7

_AMIHUD_ORACLE = f"""
WITH daily AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS close_cents,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS dollar_cents
  FROM events GROUP BY 1, 2
),
terms AS (
  SELECT symbol,
         CAST(floor(
           (abs(CAST(close_cents - lag(close_cents) OVER w AS DOUBLE))
              / CAST(lag(close_cents) OVER w AS DOUBLE))
             / CAST(dollar_cents AS DOUBLE) * {_AMIHUD_SCALE} + 0.5
         ) AS BIGINT) AS term_q
  FROM daily
  WINDOW w AS (PARTITION BY symbol ORDER BY day)
)
SELECT symbol,
       CAST(count(term_q) AS BIGINT) AS n_days,
       CAST(sum(term_q) // count(term_q) AS BIGINT) AS amihud_e15
FROM terms
WHERE term_q IS NOT NULL
GROUP BY symbol
ORDER BY symbol
"""


@register("bars_amihud_illiquidity", oracle=_AMIHUD_ORACLE, tags=("stock", "stats"))
def bars_amihud_illiquidity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Amihud (2002) illiquidity: the average of |daily return| per
    unit of dollar volume — the standard price-impact proxy when the
    order book is unobservable. Each day's term is computed from
    exact integers (BIGINT close deltas, BIGINT cent volume) through
    an identical double expression in both engines, then
    MICRO-QUANTIZED to a BIGINT at 1e15 before summation — the
    house pattern that makes the cross-day sum order-independent (a
    raw double sum would hash-diverge between Spark's and DuckDB's
    reduction orders). The final mean is integer floor-division.
    Plan: one daily rollup shuffle, one lag on the symbol sort, one
    hash agg; nothing data-proportional crosses the driver."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("close_cents"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("dollar_cents"),
    )
    w = Window.partitionBy("symbol").orderBy("day")
    prev = F.lag("close_cents").over(w)
    term_q = F.floor(
        (F.abs((F.col("close_cents") - prev).cast("double")) / prev.cast("double"))
        / F.col("dollar_cents").cast("double")
        * _AMIHUD_SCALE
        + F.lit(0.5)
    ).cast("long")
    terms = daily.select("symbol", term_q.alias("term_q")).filter(
        F.col("term_q").isNotNull()
    )
    return (
        terms.groupBy("symbol")
        .agg(
            F.count("term_q").cast("long").alias("n_days"),
            F.floor(F.sum("term_q") / F.count("term_q")).cast("long").alias("amihud_e15"),
        )
        .orderBy("symbol")
    )
