"""Round-111 analytics, part 101: 1-D Kalman local-level filter with
integer-quantized gain recursion, and the Treynor ratio.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Kalman local-level filter (random-walk + noise), integer state
# --------------------------------------------------------------------------

# process/observation noise in cents^2: Q/R ratio sets responsiveness
_KF_Q = 400      # process variance (20-cent/day level drift)
_KF_R = 10_000   # observation variance (100-cent measurement noise)

_KALMAN_ORACLE = f"""
WITH RECURSIVE closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT symbol, day, y,
         row_number() OVER (PARTITION BY symbol ORDER BY day) AS t
  FROM closes
),
-- state: level L (cents), error variance P (cents^2); the gain
-- quantizes to integer micro each step, and BOTH updates use
-- truncating integer division -> fully integer recursion
kf(symbol, t, lvl, p) AS (
  -- seeds cast to BIGINT: integer literals type the recursion INT32 in
  -- DuckDB and the gain arithmetic overflows (same trap as the IRR op)
  SELECT symbol, 1, CAST(y AS BIGINT), CAST({_KF_R} AS BIGINT)
  FROM idx WHERE t = 1
  UNION ALL
  SELECT s.symbol, s.t,
         s.lvl + (s.k_micro * (s.y - s.lvl)) // 1000000,
         ((1000000 - s.k_micro) * (s.p + {_KF_Q})) // 1000000
  FROM (
    SELECT i.symbol, i.t, i.y, f.lvl, f.p,
           ((f.p + {_KF_Q}) * 1000000) // (f.p + {_KF_Q} + {_KF_R}) AS k_micro
    FROM kf f JOIN idx i ON i.symbol = f.symbol AND i.t = f.t + 1
  ) s
)
SELECT kf.symbol, i.day, CAST(i.y AS BIGINT) AS close_cents,
       CAST(kf.lvl AS BIGINT) AS level_cents, CAST(kf.p AS BIGINT) AS p_cents2,
       CAST(i.y - kf.lvl AS BIGINT) AS innovation_cents
FROM kf JOIN idx i ON i.symbol = kf.symbol AND i.t = kf.t
ORDER BY kf.symbol, i.day
"""


@register("timeseries_kalman_local_level", oracle=_KALMAN_ORACLE, tags=("timeseries", "udf", "recursive"))
def timeseries_kalman_local_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Kalman filter (local-level model: random-walk level + white
    observation noise) over daily closes: gain K = (P+Q)/(P+Q+R),
    level <- level + K x innovation, P <- (1-K)(P+Q) — the state-space
    smoother whose gain ADAPTS (large while uncertain, converging to
    the steady state), which fixed-alpha smoothers (`bars_ema`,
    RiskMetrics) structurally cannot do: after the warm-up the two
    agree, but the Kalman start-up weighting is the statistically
    right one. Exactness: the gain quantizes to integer micro each
    step and both state updates are truncating integer division
    (positive operands), so level and variance stay exact BIGINT
    forever and the applyInPandas kernel matches the recursive-CTE
    oracle bit-for-bit — including the P-convergence path. One symbol
    shuffle; O(1) state per step."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("y"))

    def tdiv(a: int, b: int) -> int:
        # DuckDB // truncates toward zero; Python // floors — pin truncation
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    def kalman_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        # plain-array recursion, not iterrows: the per-row pandas Series
        # construction dominated the kernel (same rewrite as the r8
        # Croston fix, ~1s for the day-count-bounded series).
        pdf = pdf.sort_values("day").reset_index(drop=True)
        ys = [int(v) for v in pdf["y"].to_list()]
        levels: list[int] = []
        ps: list[int] = []
        lvl = p = 0
        for i, y in enumerate(ys):
            if i == 0:
                lvl, p = y, _KF_R
            else:
                k = ((p + _KF_Q) * 1_000_000) // (p + _KF_Q + _KF_R)
                lvl = lvl + tdiv(k * (y - lvl), 1_000_000)
                p = ((1_000_000 - k) * (p + _KF_Q)) // 1_000_000
            levels.append(lvl)
            ps.append(p)
        res = pd.DataFrame(
            {
                "day": pdf["day"],
                "close_cents": ys,
                "level_cents": levels,
                "p_cents2": ps,
                "innovation_cents": [y - l for y, l in zip(ys, levels)],
            }
        )
        res.insert(0, "symbol", pdf["symbol"].iloc[0])
        return res

    out_schema = (
        "symbol string, day date, close_cents long, level_cents long, "
        "p_cents2 long, innovation_cents long"
    )
    return (
        closes.groupBy("symbol")
        .applyInPandas(kalman_kernel, out_schema)
        .orderBy("symbol", "day")
    )


# --------------------------------------------------------------------------
# Treynor ratio: mean excess return per unit of market beta
# --------------------------------------------------------------------------

_TREYNOR_ORACLE = """
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
rets AS (
  SELECT symbol, day,
         CAST(floor((c - lag(c) OVER w) * 10000.0 / lag(c) OVER w + 0.5)
           AS BIGINT) AS r
  FROM closes WINDOW w AS (PARTITION BY symbol ORDER BY day)
  QUALIFY lag(c) OVER w IS NOT NULL
),
mkt AS (
  SELECT day, CAST(sum(r) AS BIGINT) AS mr_k, CAST(count(*) AS BIGINT) AS k
  FROM rets GROUP BY day
),
pairs AS (
  SELECT r.symbol, r.r * m.k AS x, m.mr_k AS y
  FROM rets r JOIN mkt m ON m.day = r.day
),
sums AS (
  SELECT symbol, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY symbol
)
SELECT symbol, n AS n_days,
       -- beta = cov(own, mkt)/var(mkt), both at k-scale so it cancels
       CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                  / (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
                  * 1000000 + 0.5) AS BIGINT) AS beta_micro,
       -- Treynor = mean own return / beta, in qbp per unit beta
       CAST(floor(CAST(sx AS DOUBLE) / n
                  / ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
                  / (SELECT max(k) FROM mkt)
                  * 1000 + 0.5) AS BIGINT) AS treynor_milli_qbp
FROM sums
ORDER BY symbol
"""


@register("bars_treynor_ratio", oracle=_TREYNOR_ORACLE, tags=("stock", "risk"))
def bars_treynor_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Treynor ratio per symbol: mean return per unit of MARKET beta —
    the reward-to-systematic-risk measure for assets held inside a
    diversified portfolio, where Sharpe (`bars_sharpe_sortino`,
    which divides by TOTAL volatility) double-counts the
    diversifiable part. Beta comes from the same exact k-scaled power
    sums as `bars_capm_beta`; the ratio assembles once in pinned
    DOUBLE and rescales by the panel width so the output is
    milli-qbp per unit beta. Plan: returns once, one per-day market
    aggregate, one join back, one grouped reduce plus a broadcast
    scalar for the width."""
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
    mkt = rets.groupBy("day").agg(
        F.sum("r").cast("long").alias("mr_k"), F.count(F.lit(1)).cast("long").alias("k")
    )
    kmax = mkt.agg(F.max("k").alias("kmax"))
    pairs = rets.join(mkt, "day").select(
        "symbol", (F.col("r") * F.col("k")).alias("x"), F.col("mr_k").alias("y")
    )
    sums = pairs.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    nD = F.col("n").cast("double")
    beta = (nD * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        nD * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    )
    return (
        sums.crossJoin(F.broadcast(kmax))
        .select(
            "symbol",
            F.col("n").alias("n_days"),
            F.floor(beta * 1000000 + F.lit(0.5)).cast("long").alias("beta_micro"),
            F.floor(
                F.col("sx").cast("double") / F.col("n") / beta / F.col("kmax") * 1000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("treynor_milli_qbp"),
        )
        .orderBy("symbol")
    )
