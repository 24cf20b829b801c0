"""Round-8 analytics additions, part 19: Bollinger bands, CAPM beta,
and Ornstein-Uhlenbeck mean-reversion half-life — three quant-desk
staples over the daily-close series the events stream rolls up to.

All three follow the corpus's exact-integer discipline: window/group
accumulation happens on integer cents (and their squares/products),
and floats appear only in the final scalar expression, written with
the identical operation tree on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# Shared CTE: one close per (symbol, day), exact integer cents.
_DAILY_CLOSE_SQL = """
daily AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
)
"""


def _daily_close(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("cents"))


# --------------------------------------------------------------------------
# Bollinger bands (20-day, 2 sigma) with %B and bandwidth
# --------------------------------------------------------------------------

_BOLL_N = 20

_BOLL_ORACLE = f"""
WITH {_DAILY_CLOSE_SQL},
framed AS (
  SELECT symbol, day, cents,
         row_number() OVER w AS rn,
         sum(cents) OVER (w ROWS BETWEEN {_BOLL_N - 1} PRECEDING AND CURRENT ROW) AS s1,
         sum(cents * cents) OVER (w ROWS BETWEEN {_BOLL_N - 1} PRECEDING AND CURRENT ROW) AS s2
  FROM daily
  WINDOW w AS (PARTITION BY symbol ORDER BY day)
),
bands AS (
  SELECT symbol, day, cents,
         CAST(s1 AS DOUBLE) / {_BOLL_N} AS ma,
         sqrt((CAST({_BOLL_N} AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
              / ({_BOLL_N} * {_BOLL_N - 1})) AS sd
  FROM framed WHERE rn >= {_BOLL_N}
)
SELECT symbol, day, cents,
       floor(ma * 100 + 0.5) / 100 AS ma_cents,
       floor((ma + 2.0 * sd) * 100 + 0.5) / 100 AS upper_cents,
       floor((ma - 2.0 * sd) * 100 + 0.5) / 100 AS lower_cents,
       CASE WHEN sd > 0
            THEN floor((cents - (ma - 2.0 * sd)) / (4.0 * sd) * 10000 + 0.5) / 10000
       END AS pct_b,
       CASE WHEN ma > 0
            THEN floor(4.0 * sd / ma * 10000 + 0.5) / 10000
       END AS bandwidth
FROM bands
ORDER BY symbol, day
"""


@register("bars_bollinger_bands", oracle=_BOLL_ORACLE, tags=("stock", "window"))
def bars_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands: a {_BOLL_N}-day moving average with +/-2
    sample-stdev envelopes, plus the two derived signals traders
    actually chart — %B (where today's close sits inside the band,
    0 = lower, 1 = upper) and bandwidth (band width relative to the
    mean, the squeeze detector). The window accumulates exact integer
    cents and squared cents, so the variance comes from the textbook
    (n*s2 - s1^2)/(n(n-1)) identity on exact BIGINTs — no streaming
    float variance whose accumulation order could differ between
    engines — and sqrt/divisions happen once per row in an identical
    expression tree. Plan: one groupBy to daily grain, then ONE
    (symbol, day) sort shared by row_number and both frame sums."""
    daily = _daily_close(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("day")
    wf = w.rowsBetween(-(_BOLL_N - 1), 0)
    framed = daily.select(
        "symbol",
        "day",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.sum("cents").over(wf).alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).over(wf).alias("s2"),
    ).filter(F.col("rn") >= _BOLL_N)
    ma = F.col("s1").cast("double") / _BOLL_N
    sd = F.sqrt(
        (F.lit(float(_BOLL_N)) * F.col("s2") - F.col("s1").cast("double") * F.col("s1"))
        / (_BOLL_N * (_BOLL_N - 1))
    )
    bands = framed.select("symbol", "day", "cents", ma.alias("ma"), sd.alias("sd"))
    return bands.select(
        "symbol",
        "day",
        "cents",
        (F.floor(F.col("ma") * 100 + F.lit(0.5)) / 100).alias("ma_cents"),
        (F.floor((F.col("ma") + 2.0 * F.col("sd")) * 100 + F.lit(0.5)) / 100).alias(
            "upper_cents"
        ),
        (F.floor((F.col("ma") - 2.0 * F.col("sd")) * 100 + F.lit(0.5)) / 100).alias(
            "lower_cents"
        ),
        F.when(
            F.col("sd") > 0,
            F.floor(
                (F.col("cents") - (F.col("ma") - 2.0 * F.col("sd")))
                / (4.0 * F.col("sd"))
                * 10000
                + F.lit(0.5)
            )
            / 10000,
        ).alias("pct_b"),
        F.when(
            F.col("ma") > 0,
            F.floor(4.0 * F.col("sd") / F.col("ma") * 10000 + F.lit(0.5)) / 10000,
        ).alias("bandwidth"),
    ).orderBy("symbol", "day")


# --------------------------------------------------------------------------
# CAPM beta vs the equal-weight market return
# --------------------------------------------------------------------------

_BETA_ORACLE = f"""
WITH {_DAILY_CLOSE_SQL},
rets AS (
  SELECT symbol, day,
         CAST(floor(10000.0 * (cents - lag(cents) OVER w)
                    / lag(cents) OVER w + 0.5) AS BIGINT) AS rb
  FROM daily
  WINDOW w AS (PARTITION BY symbol ORDER BY day)
),
rets2 AS (SELECT * FROM rets WHERE rb IS NOT NULL),
nsym AS (SELECT CAST(count(DISTINCT symbol) AS BIGINT) AS k FROM rets2),
mkt AS (
  SELECT day, CAST(sum(rb) AS BIGINT) AS m, CAST(count(*) AS BIGINT) AS c
  FROM rets2 GROUP BY day
),
joined AS (
  SELECT r.symbol, r.rb AS x, k.m AS m
  FROM rets2 r
  JOIN (SELECT mkt.day, mkt.m FROM mkt, nsym WHERE mkt.c = nsym.k) k
    ON k.day = r.day
),
sums AS (
  SELECT symbol,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(m) AS BIGINT) AS sm,
         CAST(sum(x * m) AS BIGINT) AS sxm,
         CAST(sum(m * m) AS BIGINT) AS smm,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM joined GROUP BY symbol
)
SELECT s.symbol, s.n AS n_days,
       floor(k.k * (CAST(s.n AS DOUBLE) * s.sxm - CAST(s.sx AS DOUBLE) * s.sm)
             / (CAST(s.n AS DOUBLE) * s.smm - CAST(s.sm AS DOUBLE) * s.sm)
             * 10000 + 0.5) / 10000 AS beta,
       floor((CAST(s.n AS DOUBLE) * s.sxm - CAST(s.sx AS DOUBLE) * s.sm)
             * (CAST(s.n AS DOUBLE) * s.sxm - CAST(s.sx AS DOUBLE) * s.sm)
             / ((CAST(s.n AS DOUBLE) * s.sxx - CAST(s.sx AS DOUBLE) * s.sx)
                * (CAST(s.n AS DOUBLE) * s.smm - CAST(s.sm AS DOUBLE) * s.sm))
             * 10000 + 0.5) / 10000 AS r2
FROM sums s, nsym k
ORDER BY s.symbol
"""


@register("bars_beta_capm", oracle=_BETA_ORACLE, tags=("stock", "stats"))
def bars_beta_capm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPM beta of each symbol against the equal-weight market —
    cov(r_i, r_mkt)/var(r_mkt), the sizing number every portfolio and
    risk system carries next to the volatilities of
    `bars_volatility`. Daily returns quantize to integer basis points
    (floor(1e4 * dc/c + .5) — two exact ints divided identically on
    both engines, then floored), the market factor is the exact
    integer SUM of all symbols' bps on full-coverage days, and beta
    rescales by n_symbols so it is beta against the mean. Every
    accumulation (sums of x, m, xm, mm, xx) is exact BIGINT; the
    covariance/variance ratio and the regression r^2 are single
    identical double expressions at the end. Plan: daily rollup, one
    lag window per symbol, a tiny per-day market agg broadcast back,
    one groupBy of exact products."""
    daily = _daily_close(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("day")
    prev = F.lag("cents").over(w)
    rets = daily.select(
        "symbol",
        "day",
        F.floor(10000.0 * (F.col("cents") - prev) / prev + F.lit(0.5))
        .cast("long")
        .alias("rb"),
    ).filter(F.col("rb").isNotNull())
    nsym = rets.agg(F.countDistinct("symbol").cast("long").alias("k"))
    mkt = rets.groupBy("day").agg(
        F.sum("rb").cast("long").alias("m"), F.count(F.lit(1)).cast("long").alias("c")
    )
    full_days = mkt.crossJoin(F.broadcast(nsym)).filter(F.col("c") == F.col("k")).select(
        "day", "m"
    )
    joined = rets.join(F.broadcast(full_days), "day").select(
        "symbol", F.col("rb").alias("x"), "m"
    )
    sums = joined.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("m").cast("long").alias("sm"),
        F.sum(F.col("x") * F.col("m")).cast("long").alias("sxm"),
        F.sum(F.col("m") * F.col("m")).cast("long").alias("smm"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    nd = lambda c: F.col(c).cast("double")  # noqa: E731
    cov_num = nd("n") * F.col("sxm") - nd("sx") * F.col("sm")
    varm_num = nd("n") * F.col("smm") - nd("sm") * F.col("sm")
    varx_num = nd("n") * F.col("sxx") - nd("sx") * F.col("sx")
    return (
        sums.crossJoin(F.broadcast(nsym))
        .select(
            "symbol",
            F.col("n").alias("n_days"),
            (F.floor(F.col("k") * cov_num / varm_num * 10000 + F.lit(0.5)) / 10000).alias(
                "beta"
            ),
            (
                F.floor(cov_num * cov_num / (varx_num * varm_num) * 10000 + F.lit(0.5))
                / 10000
            ).alias("r2"),
        )
        .orderBy("symbol")
    )


# --------------------------------------------------------------------------
# Ornstein-Uhlenbeck mean-reversion half-life via AR(1)
# --------------------------------------------------------------------------

_OU_ORACLE = f"""
WITH {_DAILY_CLOSE_SQL},
lagged AS (
  SELECT symbol, cents AS y, lag(cents) OVER (PARTITION BY symbol ORDER BY day) AS x
  FROM daily
),
pairs AS (SELECT symbol, x, y FROM lagged WHERE x IS NOT NULL),
sums AS (
  SELECT symbol,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM pairs GROUP BY symbol
),
fit AS (
  SELECT symbol, n,
         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS rho
  FROM sums
)
SELECT symbol, n AS n_days,
       floor(rho * 1000000 + 0.5) / 1000000 AS ar1_rho,
       CASE WHEN rho > 0 AND rho < 1
            THEN floor(-ln(2.0) / ln(rho) * 10000 + 0.5) / 10000
       END AS half_life_days
FROM fit
ORDER BY symbol
"""


@register("timeseries_ou_half_life", oracle=_OU_ORACLE, tags=("timeseries", "stats"))
def timeseries_ou_half_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-reversion half-life from a per-symbol AR(1) fit — the
    Ornstein-Uhlenbeck discretization pairs-trading desks use to size
    holding periods: regress today's close on yesterday's, and if the
    slope rho is in (0,1) the deviation half-life is -ln2/ln(rho)
    days (rho >= 1 means no reversion, emitted NULL). The regression
    slope comes from the exact-BIGINT power sums (n, Sx, Sy, Sxy,
    Sxx) of integer-cents pairs — the engine-neutral raw-sums
    discipline of `agg_higher_moments` — with one identical double
    expression at the end. Plan: daily rollup, one lag window, one
    tiny per-symbol groupBy; everything after the first agg is
    symbol-count sized."""
    daily = _daily_close(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("day")
    lagged = daily.select(
        "symbol", F.col("cents").alias("y"), F.lag("cents").over(w).alias("x")
    ).filter(F.col("x").isNotNull())
    sums = lagged.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    nd = lambda c: F.col(c).cast("double")  # noqa: E731
    rho = (nd("n") * F.col("sxy") - nd("sx") * F.col("sy")) / (
        nd("n") * F.col("sxx") - nd("sx") * F.col("sx")
    )
    fit = sums.select("symbol", F.col("n").alias("n_days"), rho.alias("rho"))
    return fit.select(
        "symbol",
        "n_days",
        (F.floor(F.col("rho") * 1000000 + F.lit(0.5)) / 1000000).alias("ar1_rho"),
        F.when(
            (F.col("rho") > 0) & (F.col("rho") < 1),
            F.floor(-F.log(F.lit(2.0)) / F.log(F.col("rho")) * 10000 + F.lit(0.5))
            / 10000,
        ).alias("half_life_days"),
    ).orderBy("symbol")
