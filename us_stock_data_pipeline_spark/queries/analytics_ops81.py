"""Round-87 analytics, part 81: Fisher-z confidence interval for
correlations and safety-stock / reorder-point planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Fisher-z 95% CI for per-returnflag (quantity, discount) correlation
# --------------------------------------------------------------------------

_FISHER_ORACLE = """
WITH pts AS (
  SELECT l_returnflag AS grp,
         CAST(l_quantity AS BIGINT) AS x,
         CAST(round(l_discount * 10000) AS BIGINT) AS y
  FROM lineitem
),
sums AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM pts GROUP BY grp
),
r AS (
  SELECT grp, n,
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
           / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
                  * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)) AS rv
  FROM sums
),
z AS (
  -- Fisher z = atanh(r) written as 0.5*ln((1+r)/(1-r)) so both engines
  -- run the identical primitive; z-width = 1.96/sqrt(n-3)
  SELECT grp, n, rv, 0.5 * ln((1 + rv) / (1 - rv)) AS zv,
         1.96 / sqrt(CAST(n - 3 AS DOUBLE)) AS halfw
  FROM r
)
SELECT grp, n AS n_rows,
       CAST(floor(rv * 1000000 + 0.5) AS BIGINT) AS r_micro,
       -- back-transform tanh(z +- w) via exp, pinned association
       CAST(floor((exp(2 * (zv - halfw)) - 1) / (exp(2 * (zv - halfw)) + 1)
                  * 1000000 + 0.5) AS BIGINT) AS ci_lo_micro,
       CAST(floor((exp(2 * (zv + halfw)) - 1) / (exp(2 * (zv + halfw)) + 1)
                  * 1000000 + 0.5) AS BIGINT) AS ci_hi_micro
FROM z
ORDER BY grp
"""


@register("stats_fisher_z_corr_ci", oracle=_FISHER_ORACLE, tags=("stats",))
def stats_fisher_z_corr_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher-z 95% confidence interval for the per-returnflag
    correlation between quantity and discount: z = atanh(r) is
    approximately normal with sd 1/sqrt(n-3), so the CI back-
    transforms tanh(z +- 1.96/sqrt(n-3)) — the standard way to put
    error bars on a correlation (a raw r has a skewed, bounded
    sampling distribution; the z-space interval is the one that's
    actually symmetric). Point estimates alone (`agg_stats_moments`,
    `stats_partial_correlation`) can't say whether r = 0.02 is signal.
    Exactness: power sums are exact BIGINT (quantity and discount-bp
    are small ints); atanh/tanh are spelled as ln/exp compositions so
    both engines execute identical primitives with pinned association,
    quantized micro. Plan: one groupBy over the fact table, map-side
    combinable, constant output per flag."""
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("y"),
    )
    sums = pts.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    n = F.col("n")
    cov = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy") / n
    vx = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / n
    vy = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / n
    r = sums.select("grp", "n", (cov / F.sqrt(vx * vy)).alias("rv"))
    z = r.select(
        "grp",
        "n",
        "rv",
        (F.lit(0.5) * F.log((1 + F.col("rv")) / (1 - F.col("rv")))).alias("zv"),
        (F.lit(1.96) / F.sqrt((F.col("n") - 3).cast("double"))).alias("halfw"),
    )

    def tanh_of(col: F.Column) -> F.Column:
        e = F.exp(2 * col)
        return (e - 1) / (e + 1)

    return z.select(
        "grp",
        F.col("n").alias("n_rows"),
        F.floor(F.col("rv") * 1000000 + F.lit(0.5)).cast("long").alias("r_micro"),
        F.floor(tanh_of(F.col("zv") - F.col("halfw")) * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("ci_lo_micro"),
        F.floor(tanh_of(F.col("zv") + F.col("halfw")) * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("ci_hi_micro"),
    ).orderBy("grp")


# --------------------------------------------------------------------------
# Safety stock + reorder point per nation (service level 95%)
# --------------------------------------------------------------------------

_SS_LEAD_DAYS = 7
_SS_Z95 = 1.645  # one-sided 95% service level

_SS_ORACLE = f"""
WITH daily AS (
  SELECT n.n_name AS nation, l.l_shipdate AS day,
         CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  GROUP BY n.n_name, l.l_shipdate
),
sums AS (
  SELECT nation, CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(qty) AS BIGINT) AS sq, CAST(sum(qty * qty) AS BIGINT) AS sqq
  FROM daily GROUP BY nation
)
SELECT nation, n_days, sq AS total_qty,
       -- population sigma over ACTIVE days; mean/sigma assemble in DOUBLE
       -- with pinned association from the exact power sums
       CAST(floor(CAST(sq AS DOUBLE) / n_days * {_SS_LEAD_DAYS} + 0.5) AS BIGINT)
         AS lead_demand,
       CAST(floor({_SS_Z95} * sqrt({_SS_LEAD_DAYS}.0)
                  * sqrt(CAST(n_days * sqq - sq * sq AS DOUBLE)) / n_days + 0.5)
         AS BIGINT) AS safety_stock,
       CAST(floor(CAST(sq AS DOUBLE) / n_days * {_SS_LEAD_DAYS} + 0.5) AS BIGINT)
       + CAST(floor({_SS_Z95} * sqrt({_SS_LEAD_DAYS}.0)
                    * sqrt(CAST(n_days * sqq - sq * sq AS DOUBLE)) / n_days + 0.5)
           AS BIGINT) AS reorder_point
FROM sums
ORDER BY nation
"""


@register("orders_safety_stock_rop", oracle=_SS_ORACLE, tags=("analytics", "inventory"))
def orders_safety_stock_rop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safety stock and reorder point per supplying nation at a 95%
    service level: ROP = mean daily demand x lead time + z x
    sqrt(lead) x sigma_daily — the textbook continuous-review (s, Q)
    policy, completing the inventory-planning ladder next to EOQ
    (`orders_economic_order_quantity` sizes the ORDER; this sizes the
    TRIGGER) and the newsvendor fractile (single-period). Demand first
    rolls up to exact per-day quantities; mean and population sigma
    assemble from BIGINT power sums in DOUBLE with pinned association,
    and both components quantize to whole units before the sum so the
    reorder point is reproducible integer arithmetic. Plan: one
    two-dim-broadcast fact rollup to (nation, day) — calendar-bounded
    — then a per-nation aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    daily = (
        li.join(F.broadcast(s.select("s_suppkey", "s_nationkey")), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("l_shipdate").alias("day"))
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"))
    )
    sums = daily.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("qty").cast("long").alias("sq"),
        F.sum(F.col("qty") * F.col("qty")).cast("long").alias("sqq"),
    )
    nd = F.col("n_days")
    lead_demand = F.floor(
        F.col("sq").cast("double") / nd * _SS_LEAD_DAYS + F.lit(0.5)
    ).cast("long")
    sigma_part = F.floor(
        F.lit(_SS_Z95)
        * F.sqrt(F.lit(float(_SS_LEAD_DAYS)))
        * F.sqrt((nd * F.col("sqq") - F.col("sq") * F.col("sq")).cast("double"))
        / nd
        + F.lit(0.5)
    ).cast("long")
    return sums.select(
        "nation",
        "n_days",
        F.col("sq").alias("total_qty"),
        lead_demand.alias("lead_demand"),
        sigma_part.alias("safety_stock"),
        (lead_demand + sigma_part).alias("reorder_point"),
    ).orderBy("nation")
