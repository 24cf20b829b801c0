"""Round-55 analytics, part 54: ridge regression by distributed
normal equations, intraday hour-of-day seasonality, and losing-streak
detection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Ridge regression via distributed Gram matrix + closed-form 3x3 solve
# --------------------------------------------------------------------------

_RIDGE_LAMBDA = 1000

_RIDGE_ORACLE = f"""
WITH obs AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(round(l_discount * 100) AS BIGINT) AS d,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
),
gram AS (  -- X = [q, d, 1]; every Gram/moment entry is an exact integer sum
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(q) AS HUGEINT) AS sq, CAST(sum(d) AS HUGEINT) AS sd,
         CAST(sum(q * q) AS HUGEINT) AS sqq, CAST(sum(q * d) AS HUGEINT) AS sqd,
         CAST(sum(d * d) AS HUGEINT) AS sdd,
         CAST(sum(q * y) AS HUGEINT) AS sqy, CAST(sum(d * y) AS HUGEINT) AS sdy,
         CAST(sum(y) AS HUGEINT) AS sy
  FROM obs
),
mat AS (  -- A = X'X + lambda*I (double), b = X'y
  SELECT CAST(sqq + {_RIDGE_LAMBDA} AS DOUBLE) AS a11, CAST(sqd AS DOUBLE) AS a12,
         CAST(sq AS DOUBLE) AS a13,
         CAST(sqd AS DOUBLE) AS a21, CAST(sdd + {_RIDGE_LAMBDA} AS DOUBLE) AS a22,
         CAST(sd AS DOUBLE) AS a23,
         CAST(sq AS DOUBLE) AS a31, CAST(sd AS DOUBLE) AS a32,
         CAST(n + {_RIDGE_LAMBDA} AS DOUBLE) AS a33,
         CAST(sqy AS DOUBLE) AS b1, CAST(sdy AS DOUBLE) AS b2,
         CAST(sy AS DOUBLE) AS b3, CAST(n AS BIGINT) AS n_obs
  FROM gram
),
solved AS (  -- Cramer's rule: fixed expression tree, identical FP both engines
  SELECT n_obs,
         a11 * (a22 * a33 - a23 * a32) - a12 * (a21 * a33 - a23 * a31)
           + a13 * (a21 * a32 - a22 * a31) AS det,
         b1 * (a22 * a33 - a23 * a32) - a12 * (b2 * a33 - a23 * b3)
           + a13 * (b2 * a32 - a22 * b3) AS det1,
         a11 * (b2 * a33 - a23 * b3) - b1 * (a21 * a33 - a23 * a31)
           + a13 * (a21 * b3 - b2 * a31) AS det2,
         a11 * (a22 * b3 - b2 * a32) - a12 * (a21 * b3 - b2 * a31)
           + b1 * (a21 * a32 - a22 * a31) AS det3
  FROM mat
)
SELECT n_obs,
       CAST(floor(det1 / det * 10000 + 0.5) AS BIGINT) AS beta_qty_e4,
       CAST(floor(det2 / det * 10000 + 0.5) AS BIGINT) AS beta_disc_e4,
       CAST(floor(det3 / det * 10000 + 0.5) AS BIGINT) AS intercept_e4
FROM solved
"""


@register("ml_ridge_normal_equations", oracle=_RIDGE_ORACLE, tags=("ml", "agg"))
def ml_ridge_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regression (price-cents ~ quantity + discount + 1) solved
    by DISTRIBUTED normal equations: one aggregate pass accumulates
    the full Gram matrix X'X and moment vector X'y as exact integer
    sums (the map-side-combine tree a 1000-executor cluster runs at
    line rate over 100 TB — this is how MLlib's closed-form solvers
    reduce), then the 3x3 ridge system (X'X + lambda*I) beta = X'y
    solves on the driver-sized row via Cramer's rule. Because every
    matrix entry is exact and the determinant expressions are a fixed
    tree of ~20 double ops, both engines produce bit-identical
    coefficients — no iterative SGD nondeterminism
    (`agg_regression` is the 1-feature regr_* battery; this is the
    multi-feature generalization). Quantizes at 1e-4."""
    li = load_table(spark, sf_dir, "lineitem")
    obs = li.select(
        F.col("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_discount") * 100).cast("long").alias("d"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    dec = "decimal(38,0)"
    gram = obs.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("q").cast(dec).alias("sq"),
        F.sum("d").cast(dec).alias("sd"),
        F.sum(F.col("q") * F.col("q")).cast(dec).alias("sqq"),
        F.sum(F.col("q") * F.col("d")).cast(dec).alias("sqd"),
        F.sum(F.col("d") * F.col("d")).cast(dec).alias("sdd"),
        F.sum(F.col("q") * F.col("y")).cast(dec).alias("sqy"),
        F.sum(F.col("d") * F.col("y")).cast(dec).alias("sdy"),
        F.sum("y").cast(dec).alias("sy"),
    )
    lam = F.lit(float(_RIDGE_LAMBDA))
    mat = gram.select(
        (F.col("sqq").cast("double") + lam).alias("a11"),
        F.col("sqd").cast("double").alias("a12"),
        F.col("sq").cast("double").alias("a13"),
        F.col("sqd").cast("double").alias("a21"),
        (F.col("sdd").cast("double") + lam).alias("a22"),
        F.col("sd").cast("double").alias("a23"),
        F.col("sq").cast("double").alias("a31"),
        F.col("sd").cast("double").alias("a32"),
        (F.col("n").cast("double") + lam).alias("a33"),
        F.col("sqy").cast("double").alias("b1"),
        F.col("sdy").cast("double").alias("b2"),
        F.col("sy").cast("double").alias("b3"),
        F.col("n").cast("long").alias("n_obs"),
    )
    c = F.col
    det = (
        c("a11") * (c("a22") * c("a33") - c("a23") * c("a32"))
        - c("a12") * (c("a21") * c("a33") - c("a23") * c("a31"))
        + c("a13") * (c("a21") * c("a32") - c("a22") * c("a31"))
    )
    det1 = (
        c("b1") * (c("a22") * c("a33") - c("a23") * c("a32"))
        - c("a12") * (c("b2") * c("a33") - c("a23") * c("b3"))
        + c("a13") * (c("b2") * c("a32") - c("a22") * c("b3"))
    )
    det2 = (
        c("a11") * (c("b2") * c("a33") - c("a23") * c("b3"))
        - c("b1") * (c("a21") * c("a33") - c("a23") * c("a31"))
        + c("a13") * (c("a21") * c("b3") - c("b2") * c("a31"))
    )
    det3 = (
        c("a11") * (c("a22") * c("b3") - c("b2") * c("a32"))
        - c("a12") * (c("a21") * c("b3") - c("b2") * c("a31"))
        + c("b1") * (c("a21") * c("a32") - c("a22") * c("a31"))
    )
    solved = mat.select(
        "n_obs", det.alias("det"), det1.alias("det1"), det2.alias("det2"), det3.alias("det3")
    )
    return solved.select(
        "n_obs",
        F.floor(c("det1") / c("det") * 10_000 + F.lit(0.5)).cast("long").alias("beta_qty_e4"),
        F.floor(c("det2") / c("det") * 10_000 + F.lit(0.5)).cast("long").alias("beta_disc_e4"),
        F.floor(c("det3") / c("det") * 10_000 + F.lit(0.5)).cast("long").alias("intercept_e4"),
    )


# --------------------------------------------------------------------------
# Intraday hour-of-day seasonality (tick intensity + absolute moves)
# --------------------------------------------------------------------------

_SEASON_ORACLE = """
WITH ticks AS (
  SELECT event_type AS symbol, ts, CAST(hour(ts) AS BIGINT) AS hr,
         CAST(round(value * 100) AS BIGINT) AS cents,
         lag(CAST(round(value * 100) AS BIGINT))
           OVER (PARTITION BY event_type ORDER BY ts, event_id) AS prev_cents
  FROM events
),
moves AS (
  SELECT symbol, hr, abs(cents - prev_cents) AS mv
  FROM ticks WHERE prev_cents IS NOT NULL
),
per_hr AS (
  SELECT symbol, hr, CAST(count(*) AS BIGINT) AS n_moves,
         CAST(sum(mv) AS BIGINT) AS abs_move_cents
  FROM moves GROUP BY 1, 2
)
SELECT symbol, hr, n_moves, abs_move_cents,
       CAST(n_moves * 1000000 // sum(n_moves) OVER (PARTITION BY symbol)
         AS BIGINT) AS tick_share_e6,
       CAST(abs_move_cents // n_moves AS BIGINT) AS mean_abs_move_cents
FROM per_hr
ORDER BY symbol, hr
"""


@register("bars_intraday_seasonality", oracle=_SEASON_ORACLE, tags=("stock", "timeseries"))
def bars_intraday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intraday hour-of-day seasonality profile — tick intensity and
    mean absolute tick-to-tick move per (symbol, hour), the U-shape
    diagnostic every execution desk builds before scheduling a VWAP
    order (`bars_vwap_twap` consumes liquidity; this says WHEN the
    liquidity is). Determinism: moves are exact integer cents off
    one (ts, event_id)-ordered lag window; shares and means are
    integer FLOOR divisions (never a float division crossing
    engines). Plan: one per-symbol tape-ordered window, one
    (symbol, hour) aggregate with map-side combine, one broadcast
    window over the 24-rows-per-symbol aggregate for the share
    denominator (a join back would recompute the tape window) — at
    100 TB the tape window range-partitions by (symbol, ts) and
    everything downstream is 24 rows per symbol."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    cents = F.round(F.col("value") * 100).cast("long")
    ticks = ev.select(
        F.col("event_type").alias("symbol"),
        F.hour("ts").cast("long").alias("hr"),
        cents.alias("cents"),
        F.lag(cents).over(w).alias("prev_cents"),
    )
    moves = ticks.filter(F.col("prev_cents").isNotNull()).select(
        "symbol", "hr", F.abs(F.col("cents") - F.col("prev_cents")).alias("mv")
    )
    per_hr = moves.groupBy("symbol", "hr").agg(
        F.count(F.lit(1)).cast("long").alias("n_moves"),
        F.sum("mv").cast("long").alias("abs_move_cents"),
    )
    # per-symbol total as a window over the 24-rows-per-symbol aggregate:
    # avoids a self-referencing join that would recompute the tape window
    w_tot = Window.partitionBy("symbol")
    return (
        per_hr.withColumn("n_all", F.sum("n_moves").over(w_tot))
        .select(
            "symbol",
            "hr",
            "n_moves",
            "abs_move_cents",
            F.floor(F.col("n_moves") * 1_000_000 / F.col("n_all")).cast("long").alias("tick_share_e6"),
            F.floor(F.col("abs_move_cents") / F.col("n_moves")).cast("long").alias("mean_abs_move_cents"),
        )
        .orderBy("symbol", "hr")
    )


# --------------------------------------------------------------------------
# Losing-streak detection (gaps-and-islands on return sign)
# --------------------------------------------------------------------------

_STREAK_ORACLE = """
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS close_cents
  FROM events GROUP BY 1, 2
),
rets AS (
  SELECT symbol, row_number() OVER w AS i,
         CAST(floor((close_cents - lag(close_cents) OVER w) * 10000.0
                    / lag(close_cents) OVER w + 0.5) AS BIGINT) AS ret_bp
  FROM closes WINDOW w AS (PARTITION BY symbol ORDER BY day)
  QUALIFY lag(close_cents) OVER w IS NOT NULL
),
isl AS (  -- island id: i minus the running count of losing days (ordered by i)
  SELECT symbol, i, ret_bp,
         i - row_number() OVER (PARTITION BY symbol ORDER BY i) AS grp
  FROM rets WHERE ret_bp < 0
),
streaks AS (
  SELECT symbol, grp, CAST(count(*) AS BIGINT) AS len,
         CAST(sum(ret_bp) AS BIGINT) AS loss_bp
  FROM isl GROUP BY 1, 2
)
SELECT symbol,
       CAST(max(len) AS BIGINT) AS longest_loss_streak,
       CAST(sum(len) AS BIGINT) AS n_loss_days,
       CAST(min(loss_bp) AS BIGINT) AS worst_streak_loss_bp
FROM streaks
GROUP BY symbol
ORDER BY symbol
"""


@register("bars_losing_streaks", oracle=_STREAK_ORACLE, tags=("stock", "window"))
def bars_losing_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Losing-streak profile per symbol — longest run of consecutive
    down days, total down days, and the most damaging single streak's
    cumulative loss, via gaps-and-islands on the return sign (the
    drawdown DURATION view that complements `bars_max_drawdown`'s
    depth view; `events_activity_streaks` runs the same shape on user
    activity). Both windows order by the SAME unique per-symbol day
    index i, honoring the two-window tiebreak rule, and the island id
    i - rank is exact integer arithmetic. Plan: daily rollup, two
    per-symbol windows sharing one sort, two small aggregates —
    linear in days at any scale."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("close_cents")
    )
    w = Window.partitionBy("symbol").orderBy("day")
    prev = F.lag("close_cents").over(w)
    rets = (
        closes.select(
            "symbol",
            F.row_number().over(w).alias("i"),
            prev.alias("prev_c"),
            F.col("close_cents").alias("c"),
        )
        .filter(F.col("prev_c").isNotNull())
        .select(
            "symbol",
            "i",
            F.floor((F.col("c") - F.col("prev_c")) * 10000.0 / F.col("prev_c") + F.lit(0.5))
            .cast("long")
            .alias("ret_bp"),
        )
    )
    losers = rets.filter(F.col("ret_bp") < 0)
    w_isl = Window.partitionBy("symbol").orderBy("i")
    isl = losers.select(
        "symbol", "ret_bp", (F.col("i") - F.row_number().over(w_isl)).alias("grp")
    )
    streaks = isl.groupBy("symbol", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.sum("ret_bp").cast("long").alias("loss_bp"),
    )
    return (
        streaks.groupBy("symbol")
        .agg(
            F.max("len").cast("long").alias("longest_loss_streak"),
            F.sum("len").cast("long").alias("n_loss_days"),
            F.min("loss_bp").cast("long").alias("worst_streak_loss_bp"),
        )
        .orderBy("symbol")
    )
