"""Round-81 analytics, part 75: partial correlation (controlling for a
confounder) and a Little's-law L = lambda x W audit over order flow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Partial correlation: acctbal vs order count, controlling for spend
# --------------------------------------------------------------------------

_PCORR_ORACLE = """
WITH per_cust AS (
  SELECT c.c_custkey,
         CAST(round(c.c_acctbal * 100) AS BIGINT) AS x,
         CAST(count(o.o_orderkey) AS BIGINT) AS y,
         -- spend in whole dollars (exact cents sum, then integer div)
         -- keeps every cross-product inside BIGINT at sf0.1
         coalesce(CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT),
                  0) // 100 AS z
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_acctbal
),
sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(z) AS BIGINT) AS sz,
         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(z * z) AS BIGINT) AS szz,
         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * z) AS BIGINT) AS sxz,
         CAST(sum(y * z) AS BIGINT) AS syz
  FROM per_cust
),
r AS (
  SELECT n,
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
           / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
                  * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)) AS rxy,
         (CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * sz / n)
           / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
                  * (CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * sz / n)) AS rxz,
         (CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE) * sz / n)
           / sqrt((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)
                  * (CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * sz / n)) AS ryz
  FROM sums
)
SELECT CAST(n AS BIGINT) AS n_customers,
       CAST(floor(rxy * 1000000 + 0.5) AS BIGINT) AS r_xy_micro,
       CAST(floor(rxz * 1000000 + 0.5) AS BIGINT) AS r_xz_micro,
       CAST(floor(ryz * 1000000 + 0.5) AS BIGINT) AS r_yz_micro,
       CAST(floor((rxy - rxz * ryz)
                  / sqrt((1 - rxz * rxz) * (1 - ryz * ryz)) * 1000000 + 0.5)
         AS BIGINT) AS r_xy_given_z_micro
FROM r
"""


@register("stats_partial_correlation", oracle=_PCORR_ORACLE, tags=("stats",))
def stats_partial_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order partial correlation r_xy.z = (r_xy - r_xz r_yz) /
    sqrt((1-r_xz^2)(1-r_yz^2)): does account balance correlate with
    order count once total spend is controlled for? The raw r_xy
    (`agg_stats_moments` territory) conflates the confounder; the
    partial is the regression-residual correlation and the first
    rung of causal-graph screening. Exactness: all ten power sums are
    exact BIGINT (spend deliberately rescales to whole dollars so
    sum(z*z) stays inside int64 at sf0.1 and beyond); the three
    Pearson r's and the partial assemble in DOUBLE with pinned
    association, quantized to micro. Plan: one customer-orders
    shuffle, then a single-row aggregate — every sum is map-side
    combinable, nothing collects."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.count("o_orderkey").cast("long").alias("y"),
            F.coalesce(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")), F.lit(0)
            ).alias("spend_cents"),
        )
        .select(
            F.round(F.col("c_acctbal") * 100).cast("long").alias("x"),
            "y",
            F.expr("spend_cents div 100").alias("z"),
        )
    )
    sums = per_cust.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("z").cast("long").alias("sz"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("szz"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("z")).cast("long").alias("sxz"),
        F.sum(F.col("y") * F.col("z")).cast("long").alias("syz"),
    )

    def pearson(sab: str, sa: str, sb: str, saa: str, sbb: str) -> F.Column:
        n = F.col("n")
        cov = F.col(sab).cast("double") - F.col(sa).cast("double") * F.col(sb) / n
        va = F.col(saa).cast("double") - F.col(sa).cast("double") * F.col(sa) / n
        vb = F.col(sbb).cast("double") - F.col(sb).cast("double") * F.col(sb) / n
        return cov / F.sqrt(va * vb)

    r = sums.select(
        "n",
        pearson("sxy", "sx", "sy", "sxx", "syy").alias("rxy"),
        pearson("sxz", "sx", "sz", "sxx", "szz").alias("rxz"),
        pearson("syz", "sy", "sz", "syy", "szz").alias("ryz"),
    )
    partial = (F.col("rxy") - F.col("rxz") * F.col("ryz")) / F.sqrt(
        (1 - F.col("rxz") * F.col("rxz")) * (1 - F.col("ryz") * F.col("ryz"))
    )
    return r.select(
        F.col("n").cast("long").alias("n_customers"),
        F.floor(F.col("rxy") * 1000000 + F.lit(0.5)).cast("long").alias("r_xy_micro"),
        F.floor(F.col("rxz") * 1000000 + F.lit(0.5)).cast("long").alias("r_xz_micro"),
        F.floor(F.col("ryz") * 1000000 + F.lit(0.5)).cast("long").alias("r_yz_micro"),
        F.floor(partial * 1000000 + F.lit(0.5)).cast("long").alias("r_xy_given_z_micro"),
    )


# --------------------------------------------------------------------------
# Little's law audit: L = lambda x W over order fulfillment flow
# --------------------------------------------------------------------------

_LITTLE_ORACLE = """
WITH jobs AS (
  -- a job is an order in the system from placement to its LAST ship
  SELECT o.o_orderkey, o.o_orderdate AS arr, max(l.l_shipdate) AS dep
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate >= o.o_orderdate
  GROUP BY o.o_orderkey, o.o_orderdate
),
span AS (
  SELECT CAST(date_diff('day', min(arr), max(dep)) AS BIGINT) AS t_days,
         CAST(count(*) AS BIGINT) AS n_jobs,
         CAST(sum(date_diff('day', arr, dep)) AS BIGINT) AS dur_sum
  FROM jobs
),
-- independent path: sweep-line occupancy integral from +1/-1 deltas
deltas AS (
  SELECT arr AS d, CAST(count(*) AS BIGINT) AS delta FROM jobs GROUP BY arr
  UNION ALL
  SELECT dep AS d, CAST(-count(*) AS BIGINT) AS delta FROM jobs GROUP BY dep
),
merged AS (SELECT d, CAST(sum(delta) AS BIGINT) AS delta FROM deltas GROUP BY d),
sweep AS (
  SELECT d,
         sum(delta) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS in_system,
         date_diff('day', d,
                   lead(d) OVER (ORDER BY d)) AS gap_days
  FROM merged
),
occ AS (
  SELECT CAST(sum(in_system * gap_days) AS BIGINT) AS occupancy_day_sum
  FROM sweep WHERE gap_days IS NOT NULL
)
SELECT span.n_jobs, span.t_days, span.dur_sum, occ.occupancy_day_sum,
       -- L from the sweep; lambda x W assembled from direct sums
       span.dur_sum * 1000000 // span.t_days AS l_direct_micro,
       occ.occupancy_day_sum * 1000000 // span.t_days AS l_sweep_micro,
       CAST(occ.occupancy_day_sum - span.dur_sum AS BIGINT) AS identity_delta
FROM span, occ
"""


@register("events_littles_law_audit", oracle=_LITTLE_ORACLE, tags=("analytics", "queueing"))
def events_littles_law_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law audit on order fulfillment: L (time-average orders
    in flight) must equal lambda x W (arrival rate x mean time in
    system). Both sides compute from INDEPENDENT plans — L via the
    sweep-line occupancy integral (+1 at placement, -1 at last ship,
    cumsum x calendar-gap weights, the `events_concurrency_peak`
    machinery) and lambda W via direct duration sums (lambda W =
    (n/T)(sum_dur/n) = sum_dur/T) — and the audit pins their exact
    integer equality (identity_delta = 0). This is the queueing-theory
    invariant every ops dashboard quotes, and a genuine cross-plan
    consistency check: a bug in either the sweep or the duration join
    breaks the zero. Exactness: day-granular BIGINT throughout;
    the only division quantizes both L readouts to micro with the
    same positive integer division. Plan: one fact-fact join to build
    jobs, one tiny delta table (distinct dates), one ordered cumsum."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    jobs = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("dep"))
        .select(F.col("o_orderdate").alias("arr"), "dep")
    )
    registry.track_persist(jobs)
    span = jobs.agg(
        F.datediff(F.max("dep"), F.min("arr")).cast("long").alias("t_days"),
        F.count(F.lit(1)).cast("long").alias("n_jobs"),
        F.sum(F.datediff("dep", "arr")).cast("long").alias("dur_sum"),
    )
    deltas = (
        jobs.groupBy(F.col("arr").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("delta"))
        .unionAll(
            jobs.groupBy(F.col("dep").alias("d")).agg(
                (-F.count(F.lit(1))).cast("long").alias("delta")
            )
        )
        .groupBy("d")
        .agg(F.sum("delta").cast("long").alias("delta"))
    )
    w_cum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_lead = Window.orderBy("d")
    sweep = deltas.select(
        F.sum("delta").over(w_cum).alias("in_system"),
        F.datediff(F.lead("d").over(w_lead), F.col("d")).alias("gap_days"),
    )
    occ = sweep.filter(F.col("gap_days").isNotNull()).agg(
        F.sum(F.col("in_system") * F.col("gap_days")).cast("long").alias("occupancy_day_sum")
    )
    return span.crossJoin(F.broadcast(occ)).select(
        "n_jobs",
        "t_days",
        "dur_sum",
        "occupancy_day_sum",
        F.expr("dur_sum * 1000000 div t_days").alias("l_direct_micro"),
        F.expr("occupancy_day_sum * 1000000 div t_days").alias("l_sweep_micro"),
        (F.col("occupancy_day_sum") - F.col("dur_sum")).cast("long").alias("identity_delta"),
    )
