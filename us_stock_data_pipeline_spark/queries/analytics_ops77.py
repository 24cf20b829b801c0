"""Round-83 analytics, part 77: grid-cell 2-D box-containment join and
RiskMetrics EWMA variance (integer-exact recursion).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# 2-D grid-cell spatial join: orders inside (date-range x price-band) boxes
# --------------------------------------------------------------------------

_GRID_DAYS = 90
_GRID_CENTS = 2_000_000

_GRID_ORACLE = f"""
WITH campaigns AS (
  -- deterministic 2-D boxes derived from the nation dimension:
  -- 180-day date window x $30k price band, staggered per key
  SELECT n_nationkey AS campaign_id,
         DATE '1992-01-01' + INTERVAL (n_nationkey * 90) DAY AS d_lo,
         DATE '1992-01-01' + INTERVAL (n_nationkey * 90 + 180) DAY AS d_hi,
         n_nationkey * 2000000 AS p_lo,
         n_nationkey * 2000000 + 3000000 AS p_hi
  FROM nation
)
SELECT c.campaign_id,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders o JOIN campaigns c
  ON o.o_orderdate >= c.d_lo AND o.o_orderdate < c.d_hi
 AND CAST(round(o.o_totalprice * 100) AS BIGINT) >= c.p_lo
 AND CAST(round(o.o_totalprice * 100) AS BIGINT) < c.p_hi
GROUP BY c.campaign_id
ORDER BY c.campaign_id
"""


@register("join_grid_box_containment", oracle=_GRID_ORACLE, tags=("join", "spatial"))
def join_grid_box_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D box-containment join via grid-cell bucketing: orders (a
    point in date x price space) match campaigns (a rectangle), the
    spatial-join shape behind geo tiles, calendar x amount rules, and
    feature-crossing audits. A naive plan is a cartesian theta join —
    quadratic at scale. Instead, space buckets into a fixed grid
    ({_GRID_DAYS} days x ${_GRID_CENTS // 100} cents): each rectangle
    EXPLODES to the cells it covers (bounded fan-out ~3x2 here), each
    point maps to exactly one cell, and the match becomes an EQUI-join
    on cell id with an exact residual predicate — one hash shuffle,
    never a cartesian (the 2-D generalization of
    `join_range_banded`'s 1-D binning). The oracle runs the naive
    theta join, so the bucketing's correctness — no lost or duplicate
    matches across cell borders — is what the hash pins. Plan note:
    the exploded campaign side is dimension-sized and broadcasts."""
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    campaigns = n.select(
        F.col("n_nationkey").alias("campaign_id"),
        F.date_add(F.lit("1992-01-01").cast("date"), F.col("n_nationkey") * 90).alias("d_lo"),
        F.date_add(F.lit("1992-01-01").cast("date"), F.col("n_nationkey") * 90 + 180).alias(
            "d_hi"
        ),
        (F.col("n_nationkey").cast("long") * 2000000).alias("p_lo"),
        (F.col("n_nationkey").cast("long") * 2000000 + 3000000).alias("p_hi"),
    )
    epoch = F.lit("1970-01-01").cast("date")
    cells = campaigns.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.datediff("d_lo", epoch) / _GRID_DAYS),
                F.floor((F.datediff("d_hi", epoch) - 1) / _GRID_DAYS),
            )
        ).alias("dc"),
    ).select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col("p_lo") / _GRID_CENTS),
                F.floor((F.col("p_hi") - 1) / _GRID_CENTS),
            )
        ).alias("pc"),
    )
    pts = o.select(
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).select(
        "o_orderdate",
        "cents",
        F.floor(F.datediff("o_orderdate", epoch) / _GRID_DAYS).alias("dc"),
        F.floor(F.col("cents") / _GRID_CENTS).alias("pc"),
    )
    joined = pts.join(F.broadcast(cells), ["dc", "pc"]).filter(
        (F.col("o_orderdate") >= F.col("d_lo"))
        & (F.col("o_orderdate") < F.col("d_hi"))
        & (F.col("cents") >= F.col("p_lo"))
        & (F.col("cents") < F.col("p_hi"))
    )
    return (
        joined.groupBy("campaign_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .orderBy("campaign_id")
    )


# --------------------------------------------------------------------------
# RiskMetrics EWMA variance (lambda = 0.94), integer-exact recursion
# --------------------------------------------------------------------------

_EWMA_ORACLE = """
WITH RECURSIVE closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
rets AS (
  SELECT symbol, day, row_number() OVER w - 1 AS rn,
         CAST(floor((c - lag(c) OVER w) * 10000.0 / lag(c) OVER w + 0.5)
           AS BIGINT) AS r
  FROM closes WINDOW w AS (PARTITION BY symbol ORDER BY day)
  QUALIFY lag(c) OVER w IS NOT NULL
),
-- v_t = (94 v_{t-1} + 6 r_t^2) // 100, carried in qbp^2 so the whole
-- recursion is exact BIGINT (no float decay drift at any horizon); the
-- synthetic tape's returns reach 1e7 qbp, so r^2 alone is ~1e14 and any
-- finer carry would overflow int64
ewma(symbol, day, rn, r, v) AS (
  SELECT symbol, day, rn, r, r * r FROM rets WHERE rn = 1
  UNION ALL
  SELECT b.symbol, b.day, b.rn, b.r,
         (94 * e.v + 6 * b.r * b.r) // 100
  FROM rets b JOIN ewma e ON b.symbol = e.symbol AND b.rn = e.rn + 1
)
SELECT symbol, day, r AS ret_qbp, CAST(v AS BIGINT) AS ewma_var_qbp2
FROM ewma
ORDER BY symbol, day
"""


@register(
    "bars_riskmetrics_ewma_var",
    oracle=_EWMA_ORACLE,
    tags=("stock", "udf", "recursive"),
)
def bars_riskmetrics_ewma_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RiskMetrics EWMA variance (lambda = 0.94) of daily returns:
    v_t = 0.94 v_{t-1} + 0.06 r_t^2 — the decay-weighted volatility
    every VaR desk quotes, reacting to shocks where the rolling-window
    stddev of `bars_volatility` holds them for N days then drops them
    off a cliff. Like `bars_ema` the recursion is inexpressible in
    window frames, so it runs as an applyInPandas kernel per symbol —
    but one step further on exactness: the state is INTEGER qbp^2
    with the decay as (94 v + 6 r^2) div 100, so kernel and
    recursive-CTE oracle agree bit-for-bit at ANY horizon (a float
    recursion drifts ulps after thousands of steps; exact integers
    cannot). Per-symbol history is one Arrow batch; longer tapes chunk
    by date with carried-in state, same kernel."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
    w = Window.partitionBy("symbol").orderBy("day")
    prev = F.lag("c").over(w)
    rets = (
        closes.select("symbol", "day", prev.alias("p"), "c")
        .filter(F.col("p").isNotNull())
        .select(
            "symbol",
            "day",
            F.floor((F.col("c") - F.col("p")) * 10000.0 / F.col("p") + F.lit(0.5))
            .cast("long")
            .alias("r"),
        )
    )

    def ewma_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        v = 0
        out = []
        for i, r in enumerate(pdf["r"]):
            r = int(r)
            v = r * r if i == 0 else (94 * v + 6 * r * r) // 100
            out.append(v)
        pdf["ewma_var_qbp2"] = out
        return pdf[["symbol", "day", "r", "ewma_var_qbp2"]]

    out_schema = "symbol string, day date, r long, ewma_var_qbp2 long"
    return (
        rets.groupBy("symbol")
        .applyInPandas(ewma_kernel, out_schema)
        .select("symbol", "day", F.col("r").alias("ret_qbp"), "ewma_var_qbp2")
        .orderBy("symbol", "day")
    )
