"""Round-89 analytics, part 83: regression-discontinuity jump estimate
and instrumental-variables (Wald/2SLS) slope — completing the causal
ladder next to DiD, IPW, and PSM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Regression discontinuity: jump in lines-per-order at a price cutoff
# --------------------------------------------------------------------------

_RD_CUTOFF_CENTS = 15_000_000  # $150k running-variable cutoff
_RD_BANDWIDTH = 5_000_000      # +-$50k local window

_RD_ORACLE = f"""
WITH pts AS (
  SELECT CAST(round(o.o_totalprice * 100) AS BIGINT) - {_RD_CUTOFF_CENTS} AS x,
         CAST(count(l.l_orderkey) AS BIGINT) AS y
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_totalprice
),
local AS (
  SELECT CASE WHEN x >= 0 THEN 1 ELSE 0 END AS side, x, y
  FROM pts WHERE x >= -{_RD_BANDWIDTH} AND x < {_RD_BANDWIDTH}
),
sums AS (
  SELECT side, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy
  FROM local GROUP BY side
),
-- local-linear intercept AT the cutoff per side: a = (sy - b*sx)/n with
-- b = (n*sxy - sx*sy)/(n*sxx - sx^2); assembled in DOUBLE with pinned
-- association from exact BIGINT sums (sxx ~ 1e16 stays in range)
fits AS (
  SELECT side, n,
         (CAST(sy AS DOUBLE)
          - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
            / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * sx) / n
           AS a0
  FROM sums
)
SELECT lo.n AS n_below, hi.n AS n_above,
       CAST(floor(lo.a0 * 1000000 + 0.5) AS BIGINT) AS intercept_below_micro,
       CAST(floor(hi.a0 * 1000000 + 0.5) AS BIGINT) AS intercept_above_micro,
       CAST(floor((hi.a0 - lo.a0) * 1000000 + 0.5) AS BIGINT) AS rd_jump_micro
FROM (SELECT * FROM fits WHERE side = 0) lo, (SELECT * FROM fits WHERE side = 1) hi
"""


@register("causal_regression_discontinuity", oracle=_RD_ORACLE, tags=("stats", "causal"))
def causal_regression_discontinuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp regression-discontinuity estimate: fit a local linear
    trend of lines-per-order on each side of a ${_RD_CUTOFF_CENTS //
    100 // 100}k order-value cutoff and read the JUMP between the two
    intercepts at the cutoff — the quasi-experimental design for
    threshold-assigned treatments (free shipping over $X, priority
    review over $Y), where naive above-vs-below means (`events_ab_
    test_lift`) conflate the treatment with the running variable's own
    slope; the local-linear fit removes that trend on each side.
    Exactness: the running variable centers at the cutoff so power
    sums stay mid-range BIGINT; each side's intercept assembles in
    DOUBLE with pinned association and quantizes micro. Plan: one
    fact-fact rollup to per-order points, bandwidth filter pushed to
    the scan, one two-group aggregate — map-side combinable, two rows
    of state."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pts = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count("l_orderkey").cast("long").alias("y"))
        .select(
            (F.round(F.col("o_totalprice") * 100).cast("long") - _RD_CUTOFF_CENTS).alias("x"),
            "y",
        )
    )
    local = pts.filter((F.col("x") >= -_RD_BANDWIDTH) & (F.col("x") < _RD_BANDWIDTH)).select(
        F.when(F.col("x") >= 0, 1).otherwise(0).alias("side"), "x", "y"
    )
    sums = local.groupBy("side").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    nD = F.col("n").cast("double")
    b = (nD * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        nD * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    a0 = (F.col("sy").cast("double") - b * F.col("sx")) / F.col("n")
    fits = sums.select("side", "n", a0.alias("a0"))
    lo = fits.filter(F.col("side") == 0).select(
        F.col("n").alias("n_below"), F.col("a0").alias("a_lo")
    )
    hi = fits.filter(F.col("side") == 1).select(
        F.col("n").alias("n_above"), F.col("a0").alias("a_hi")
    )
    return lo.crossJoin(F.broadcast(hi)).select(
        "n_below",
        "n_above",
        F.floor(F.col("a_lo") * 1000000 + F.lit(0.5)).cast("long").alias("intercept_below_micro"),
        F.floor(F.col("a_hi") * 1000000 + F.lit(0.5)).cast("long").alias("intercept_above_micro"),
        F.floor((F.col("a_hi") - F.col("a_lo")) * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("rd_jump_micro"),
    )


# --------------------------------------------------------------------------
# Instrumental variables: Wald estimator with exact covariance sums
# --------------------------------------------------------------------------

_IV_ORACLE = """
WITH pts AS (
  -- z: binary instrument (part-key parity — a synthetic instrument that
  -- exercises the full 2SLS arithmetic on fixture data);
  -- x: endogenous regressor (discount bp); y: outcome (quantity)
  SELECT CAST(l_partkey % 2 AS BIGINT) AS z,
         CAST(round(l_discount * 10000) AS BIGINT) AS x,
         CAST(l_quantity AS BIGINT) AS y
  FROM lineitem
),
sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(z) AS BIGINT) AS sz, CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(z * x) AS BIGINT) AS szx, CAST(sum(z * y) AS BIGINT) AS szy
  FROM pts
)
SELECT n AS n_rows,
       -- first stage: E[x|z=1] - E[x|z=0] scaled by n, exact integers
       CAST(n * szx - sz * sx AS BIGINT) AS cov_zx_n2,
       CAST(n * szy - sz * sy AS BIGINT) AS cov_zy_n2,
       -- Wald/IV slope = cov(z,y)/cov(z,x), one double division
       CAST(floor(CAST(n * szy - sz * sy AS DOUBLE)
                  / (n * szx - sz * sx) * 1000000 + 0.5) AS BIGINT)
         AS beta_iv_micro,
       -- naive OLS-free contrast for comparison: weak-instrument screen
       CAST(floor(CAST(n * szx - sz * sx AS DOUBLE) / n / n * 1000000 + 0.5)
         AS BIGINT) AS first_stage_cov_micro
FROM sums
"""


@register("causal_instrumental_wald", oracle=_IV_ORACLE, tags=("stats", "causal"))
def causal_instrumental_wald(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instrumental-variables slope via the Wald estimator: beta_IV =
    cov(z, y) / cov(z, x) for a binary instrument z — the one-
    instrument special case of 2SLS, the tool for endogenous
    regressors where OLS (`agg_regression`) is biased by reverse
    causation or omitted confounders. The fixture has no natural
    experiment, so the instrument is part-key parity — deliberately
    synthetic and documented as such: what this operator pins is the
    full IV arithmetic (both covariances from one pass, the ratio, a
    first-stage strength readout for weak-instrument screening).
    Exactness: all sums are exact BIGINT; n*szy - sz*sy stays well
    inside int64 at sf0.1; one double division quantizes the slope.
    Plan: a single map-side-combinable aggregate over the fact scan —
    no shuffle beyond the final 1-row reduce."""
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        (F.col("l_partkey") % 2).cast("long").alias("z"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("x"),
        F.col("l_quantity").cast("long").alias("y"),
    )
    sums = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("z").cast("long").alias("sz"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("z") * F.col("x")).cast("long").alias("szx"),
        F.sum(F.col("z") * F.col("y")).cast("long").alias("szy"),
    )
    cov_zx = (F.col("n") * F.col("szx") - F.col("sz") * F.col("sx")).cast("long")
    cov_zy = (F.col("n") * F.col("szy") - F.col("sz") * F.col("sy")).cast("long")
    return sums.select(
        F.col("n").alias("n_rows"),
        cov_zx.alias("cov_zx_n2"),
        cov_zy.alias("cov_zy_n2"),
        F.floor(cov_zy.cast("double") / cov_zx * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("beta_iv_micro"),
        F.floor(cov_zx.cast("double") / F.col("n") / F.col("n") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("first_stage_cov_micro"),
    )
