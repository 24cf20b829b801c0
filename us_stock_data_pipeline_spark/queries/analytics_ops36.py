"""Round-26 analytics, part 36: microstructure price impact (Kyle's
lambda, VPIN) and a closed-form quadratic trend fit — deeper cuts of
the market-microstructure and trend families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Kyle's lambda (price impact per unit of signed flow)
# --------------------------------------------------------------------------

_KYLE_ORACLE = """
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
),
daily AS (
  SELECT symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(coalesce(sum(sgn * price_cents), 0) AS BIGINT) AS flow,
         CAST(arg_max(price_cents, event_id) AS BIGINT) AS close_cents
  FROM signed GROUP BY 1, 2
),
obs AS (
  SELECT symbol,
         close_cents - lag(close_cents) OVER (PARTITION BY symbol ORDER BY day) AS dp,
         flow
  FROM daily
),
sums AS (
  SELECT symbol, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(flow) AS BIGINT) AS sx, CAST(sum(dp) AS BIGINT) AS sy,
         CAST(sum(flow * flow) AS BIGINT) AS sxx,
         CAST(sum(flow * dp) AS BIGINT) AS sxy
  FROM obs WHERE dp IS NOT NULL GROUP BY symbol
)
SELECT symbol, n AS n_days,
       CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                  / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                  * 1000000000 + 0.5) AS BIGINT) AS kyle_lambda_e9
FROM sums
ORDER BY symbol
"""


@register("bars_kyle_lambda", oracle=_KYLE_ORACLE, tags=("stock", "stats"))
def bars_kyle_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kyle (1985) lambda — the price-impact coefficient: regress daily
    price change on daily SIGNED order flow (tick-rule signed cent
    flow, the `bars_tick_rule_signing` machinery), so lambda measures
    how many cents the price moves per cent of net buying pressure —
    the standard adverse-selection / liquidity gauge when quote data
    is absent. The OLS slope comes from BIGINT power sums with
    per-factor double casts in the final expression (flow^2 sums can
    exceed what a pre-cast BIGINT product allows at larger tapes —
    the cast-then-multiply discipline keeps the expression exact-in,
    deterministic-out). Plan: the tick-sign window stack shares the
    symbol sort, one daily rollup, one lag, one power-sum aggregate."""
    trades = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("symbol"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("price_cents"),
    )
    w = Window.partitionBy("symbol").orderBy("event_id")
    ticks = trades.withColumn(
        "tick",
        F.when(F.col("price_cents") > F.lag("price_cents").over(w), 1)
        .when(F.col("price_cents") < F.lag("price_cents").over(w), -1)
        .otherwise(F.lit(None).cast("int")),
    )
    signed = ticks.withColumn(
        "sgn",
        F.last("tick", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    daily = signed.groupBy(
        "symbol", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.coalesce(F.sum(F.col("sgn") * F.col("price_cents")), F.lit(0))
        .cast("long")
        .alias("flow"),
        F.max_by("price_cents", "event_id").cast("long").alias("close_cents"),
    )
    w_day = Window.partitionBy("symbol").orderBy("day")
    obs = daily.select(
        "symbol",
        (F.col("close_cents") - F.lag("close_cents").over(w_day)).alias("dp"),
        "flow",
    ).filter(F.col("dp").isNotNull())
    sums = obs.groupBy("symbol").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("flow").cast("long").alias("sx"),
        F.sum("dp").cast("long").alias("sy"),
        F.sum(F.col("flow") * F.col("flow")).cast("long").alias("sxx"),
        F.sum(F.col("flow") * F.col("dp")).cast("long").alias("sxy"),
    )
    lam = F.floor(
        (F.col("n").cast("double") * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
        / (F.col("n").cast("double") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * 1_000_000_000
        + F.lit(0.5)
    ).cast("long")
    return sums.select(
        "symbol", F.col("n").alias("n_days"), lam.alias("kyle_lambda_e9")
    ).orderBy("symbol")


# --------------------------------------------------------------------------
# VPIN (volume-synchronized probability of informed trading)
# --------------------------------------------------------------------------

_VPIN_THRESH = 100_000  # cents of traded value per volume bucket

_VPIN_ORACLE = f"""
WITH trades AS (
  SELECT event_type AS symbol, event_id,
         CAST(round(value * 100) AS BIGINT) AS price_cents
  FROM events
),
ticks AS (
  SELECT symbol, event_id, price_cents,
         CASE WHEN price_cents > lag(price_cents) OVER w THEN 1
              WHEN price_cents < lag(price_cents) OVER w THEN -1
              ELSE NULL END AS tick
  FROM trades
  WINDOW w AS (PARTITION BY symbol ORDER BY event_id)
),
signed AS (
  SELECT symbol, event_id, price_cents,
         coalesce(last_value(tick IGNORE NULLS) OVER (
           PARTITION BY symbol ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS sgn
  FROM ticks
),
bucketed AS (
  SELECT symbol, sgn, price_cents,
         coalesce(sum(price_cents) OVER (
           PARTITION BY symbol ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           // {_VPIN_THRESH} AS bucket
  FROM signed
),
per_bucket AS (
  SELECT symbol, bucket,
         CAST(abs(sum(sgn * price_cents)) AS BIGINT) AS imbalance_cents,
         CAST(sum(price_cents) AS BIGINT) AS bucket_cents
  FROM bucketed GROUP BY symbol, bucket
),
scored AS (
  SELECT symbol,
         CAST(imbalance_cents * 1000000 // bucket_cents AS BIGINT) AS vpin_e6
  FROM per_bucket
)
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(vpin_e6) // count(*) AS BIGINT) AS vpin_mean_e6,
       CAST(max(vpin_e6) AS BIGINT) AS vpin_max_e6
FROM scored
GROUP BY symbol
ORDER BY symbol
"""


@register("bars_vpin", oracle=_VPIN_ORACLE, tags=("stock", "stats"))
def bars_vpin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VPIN (Easley/Lopez de Prado/O'Hara) — toxicity of order flow:
    slice the tape into equal-VALUE buckets (the `bars_volume_bars`
    prefix-sum machinery), sign each trade with the tick rule
    (unsigned leading trades count 0), and score each bucket by
    |signed flow| / bucket value; the per-symbol mean is the VPIN
    estimate that spiked hours before the 2010 flash crash. Every
    step is exact BIGINT — imbalance, bucket value, and the 1e-6
    ratio are integer arithmetic end to end — so the oracle hash is
    trivially stable. Plan: the tick-sign and prefix-sum windows
    share one (symbol, event_id) sort, then two hash aggregates;
    identical shuffle inventory to volume bars."""
    trades = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("symbol"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("price_cents"),
    )
    w = Window.partitionBy("symbol").orderBy("event_id")
    ticks = trades.withColumn(
        "tick",
        F.when(F.col("price_cents") > F.lag("price_cents").over(w), 1)
        .when(F.col("price_cents") < F.lag("price_cents").over(w), -1)
        .otherwise(F.lit(None).cast("int")),
    )
    signed = ticks.withColumn(
        "sgn",
        F.coalesce(
            F.last("tick", ignorenulls=True).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
            F.lit(0),
        ),
    )
    bucketed = signed.withColumn(
        "bucket",
        F.expr(
            f"coalesce(sum(price_cents) OVER (PARTITION BY symbol ORDER BY event_id"
            f" ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
            f" div {_VPIN_THRESH}"
        ),
    )
    per_bucket = bucketed.groupBy("symbol", "bucket").agg(
        F.abs(F.sum(F.col("sgn") * F.col("price_cents"))).cast("long").alias(
            "imbalance_cents"
        ),
        F.sum("price_cents").cast("long").alias("bucket_cents"),
    )
    scored = per_bucket.select(
        "symbol",
        F.expr("CAST(imbalance_cents * 1000000 div bucket_cents AS BIGINT)").alias(
            "vpin_e6"
        ),
    )
    return (
        scored.groupBy("symbol")
        .agg(
            F.count("*").cast("long").alias("n_buckets"),
            F.expr("CAST(sum(vpin_e6) div count(*) AS BIGINT)").alias("vpin_mean_e6"),
            F.max("vpin_e6").cast("long").alias("vpin_max_e6"),
        )
        .orderBy("symbol")
    )


# --------------------------------------------------------------------------
# Quadratic trend fit (closed-form normal equations, centered basis)
# --------------------------------------------------------------------------

_QUAD_ORACLE = """
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
centered AS (  -- t = 2*i - (n-1): symmetric integer basis kills odd sums
  SELECT symbol, y,
         2 * (row_number() OVER (PARTITION BY symbol ORDER BY day) - 1)
           - (count(*) OVER (PARTITION BY symbol) - 1) AS t
  FROM closes
),
sums AS (
  SELECT symbol, CAST(count(*) AS BIGINT) AS s0,
         CAST(sum(t * t) AS BIGINT) AS s2,
         CAST(sum(t * t * t * t) AS BIGINT) AS s4,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(t * y) AS BIGINT) AS sty,
         CAST(sum(t * t * y) AS BIGINT) AS st2y
  FROM centered GROUP BY symbol
)
SELECT symbol, s0 AS n_days,
       CAST(floor((CAST(s4 AS DOUBLE) * sy - CAST(s2 AS DOUBLE) * st2y)
                  / (CAST(s0 AS DOUBLE) * s4 - CAST(s2 AS DOUBLE) * s2)
                  * 1000 + 0.5) AS BIGINT) AS a_milli,
       CAST(floor(CAST(sty AS DOUBLE) / CAST(s2 AS DOUBLE) * 1000000 + 0.5)
         AS BIGINT) AS b_e6,
       CAST(floor((CAST(s0 AS DOUBLE) * st2y - CAST(s2 AS DOUBLE) * sy)
                  / (CAST(s0 AS DOUBLE) * s4 - CAST(s2 AS DOUBLE) * s2)
                  * 1000000 + 0.5) AS BIGINT) AS c_e6
FROM sums
ORDER BY symbol
"""


@register("timeseries_quadratic_trend", oracle=_QUAD_ORACLE, tags=("timeseries", "stats"))
def timeseries_quadratic_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form quadratic trend y = a + b*t + c*t^2 per symbol — the
    curvature detector (is momentum accelerating or rolling over?)
    that a linear slope cannot see. The CENTERED integer basis
    t = 2i-(n-1) zeroes every odd power sum, so the 3x3 normal
    equations decouple: b = Sty/S2 exactly, and (a, c) solve a 2x2
    system whose determinant S0*S4 - S2^2 is evaluated with
    per-factor double casts (the raw BIGINT product would overflow
    at ~150 days x 4th powers). All inputs to the double expressions
    are exact integers and the expressions are textually identical in
    both engines. Plan: one daily rollup, one window pass for the
    centered index, one power-sum aggregate — the regression itself
    is free."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("y"))
    w = Window.partitionBy("symbol").orderBy("day")
    w_all = Window.partitionBy("symbol")
    centered = closes.select(
        "symbol",
        "y",
        (
            2 * (F.row_number().over(w) - 1) - (F.count("*").over(w_all) - 1)
        ).alias("t"),
    )
    t, y = F.col("t"), F.col("y")
    sums = centered.groupBy("symbol").agg(
        F.count("*").cast("long").alias("s0"),
        F.sum(t * t).cast("long").alias("s2"),
        F.sum(t * t * t * t).cast("long").alias("s4"),
        F.sum(y).cast("long").alias("sy"),
        F.sum(t * y).cast("long").alias("sty"),
        F.sum(t * t * y).cast("long").alias("st2y"),
    )
    d = F.col("s0").cast("double") * F.col("s4") - F.col("s2").cast("double") * F.col("s2")
    a = F.floor(
        (F.col("s4").cast("double") * F.col("sy") - F.col("s2").cast("double") * F.col("st2y"))
        / d * 1000 + F.lit(0.5)
    ).cast("long")
    b = F.floor(
        F.col("sty").cast("double") / F.col("s2").cast("double") * 1_000_000 + F.lit(0.5)
    ).cast("long")
    c = F.floor(
        (F.col("s0").cast("double") * F.col("st2y") - F.col("s2").cast("double") * F.col("sy"))
        / d * 1_000_000 + F.lit(0.5)
    ).cast("long")
    return sums.select(
        "symbol",
        F.col("s0").alias("n_days"),
        a.alias("a_milli"),
        b.alias("b_e6"),
        c.alias("c_e6"),
    ).orderBy("symbol")
