"""Round-104 analytics, part 96: Croston's intermittent-demand
forecast and a USING-vs-ON outer-join semantics pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Croston's method: smoothed size & interval for sparse part demand
# --------------------------------------------------------------------------

_CROSTON_PARTS = 40  # every partkey % N == 0 -> sparse per-part series

_CROSTON_ORACLE = f"""
WITH RECURSIVE demand AS (
  -- non-zero demand events for a deterministic sparse part subset:
  -- Croston only updates ON demand occurrences
  SELECT l.l_partkey AS part, o.o_orderdate AS day,
         CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_partkey % {_CROSTON_PARTS} = 0
  GROUP BY l.l_partkey, o.o_orderdate
),
seq AS (
  SELECT part, day, q,
         row_number() OVER w AS t,
         CAST(coalesce(date_diff('day', lag(day) OVER w, day), 0) AS BIGINT) AS gap
  FROM demand WINDOW w AS (PARTITION BY part ORDER BY day)
),
-- z (size) and p (interval) smooth with alpha = 1/5 in exact integer
-- milli units; truncating division pairs Spark div with DuckDB //
cro(part, t, z_m, p_m) AS (
  SELECT part, 1, q * 1000, 1000 FROM seq WHERE t = 1
  UNION ALL
  SELECT s.part, s.t,
         (s.q * 1000 + 4 * c.z_m) // 5,
         (s.gap * 1000 + 4 * c.p_m) // 5
  FROM seq s JOIN cro c ON s.part = c.part AND s.t = c.t + 1
),
final AS (
  SELECT part, max(t) AS n_events FROM cro GROUP BY part
)
SELECT f.part AS partkey, CAST(f.n_events AS BIGINT) AS n_demand_events,
       CAST(c.z_m AS BIGINT) AS size_milli,
       CAST(c.p_m AS BIGINT) AS interval_milli,
       -- forecast per day = z/p, micro-quantized
       CAST(c.z_m * 1000000 // c.p_m AS BIGINT) AS rate_micro
FROM final f JOIN cro c ON c.part = f.part AND c.t = f.n_events
WHERE f.n_events >= 3
ORDER BY partkey
"""


@register("forecast_croston_intermittent", oracle=_CROSTON_ORACLE, tags=("forecast", "udf", "recursive"))
def forecast_croston_intermittent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method for intermittent demand: smooth the demand
    SIZE and the inter-demand INTERVAL as two separate exponential
    recursions that update only when demand occurs, then forecast
    rate = size/interval — the standard for spare-parts-style series
    that are mostly zeros, where ordinary smoothing
    (`timeseries_holt_linear`, Holt-Winters) decays toward zero
    between demands and systematically under-forecasts. Exactness:
    both recursions carry integer milli-units with alpha = 1/5 as
    multiply-then-truncating-divide (Spark div == DuckDB //), so the
    kernel and the recursive-CTE oracle agree bit-for-bit; the first
    interval seeds at 1.0 per Croston's convention. Plan: one
    fact-fact rollup to per-(part, day) demand with the partkey
    filter pushed to the scan, then an in-row collect_list +
    aggregate() recursion over each part's day-sorted event array
    (the r13 rewrite of the former applyInPandas kernel — no Python
    boundary)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    demand = (
        li.filter(F.col("l_partkey") % _CROSTON_PARTS == 0)
        .join(o, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("l_partkey").alias("part"), F.col("o_orderdate").alias("day"))
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"))
    )

    # The smoothing recursion is sequential per part but the series are
    # short — run it as an in-row array aggregate() over the day-sorted
    # event list instead of an applyInPandas kernel: the JVM<->Python
    # group-at-a-time boundary cost ~5s for ~375 tiny groups at sf0.1
    # (guide §4.1 — prefer built-ins; the arithmetic is the identical
    # integer multiply-then-truncating-div, so the hash is unchanged).
    ev = demand.groupBy("part").agg(
        F.sort_array(F.collect_list(F.struct("day", "q"))).alias("ev")
    )
    return (
        ev.filter(F.size("ev") >= 3)
        .select(
            F.col("part").alias("partkey"),
            F.size("ev").cast("long").alias("n_demand_events"),
            F.expr(
                """aggregate(
  sequence(2, size(ev)),
  named_struct('z', ev[0].q * CAST(1000 AS BIGINT), 'p', CAST(1000 AS BIGINT)),
  (acc, t) -> named_struct(
    'z', (ev[t-1].q * 1000 + 4 * acc.z) div 5,
    'p', (CAST(datediff(ev[t-1].day, ev[t-2].day) AS BIGINT) * 1000 + 4 * acc.p)
         div 5))"""
            ).alias("zp"),
        )
        .select(
            "partkey",
            "n_demand_events",
            F.col("zp.z").cast("long").alias("size_milli"),
            F.col("zp.p").cast("long").alias("interval_milli"),
            F.expr("zp.z * 1000000 div zp.p").cast("long").alias("rate_micro"),
        )
        .orderBy("partkey")
    )


# --------------------------------------------------------------------------
# USING vs ON: full-outer join key semantics pin
# --------------------------------------------------------------------------

_USING_ORACLE = """
WITH a AS (
  SELECT n_nationkey AS k, count(*) AS n_cust
  FROM customer JOIN nation ON n_nationkey = c_nationkey
  WHERE n_nationkey % 2 = 0
  GROUP BY n_nationkey
),
b AS (
  SELECT s_nationkey AS k, count(*) AS n_supp
  FROM supplier WHERE s_nationkey % 3 = 0 GROUP BY s_nationkey
)
-- USING semantics: ONE coalesced key column that is never null on
-- either side's exclusive rows (the ON-style a.k/b.k would be null)
SELECT k,
       CAST(coalesce(n_cust, 0) AS BIGINT) AS n_cust,
       CAST(coalesce(n_supp, 0) AS BIGINT) AS n_supp,
       CAST(CASE WHEN n_cust IS NULL THEN 'supp_only'
                 WHEN n_supp IS NULL THEN 'cust_only'
                 ELSE 'both' END AS VARCHAR) AS side
FROM a FULL OUTER JOIN b USING (k)
ORDER BY k
"""


@register("join_using_coalesced_keys", oracle=_USING_ORACLE, tags=("join", "semantics"))
def join_using_coalesced_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER JOIN ... USING(k) semantics pin: USING merges the
    two key columns into ONE output column that is COALESCED — never
    null even for rows that exist on only one side — where the
    ON-form's a.k / b.k are null on the opposite side's exclusive
    rows. This is the single most common full-outer-join bug (GROUP
    BY a.k after a full outer silently folds all right-exclusive rows
    into the NULL group; `join_full_outer` pins the ON-form, this
    pins the USING-form that fixes it). The two sides deliberately
    have non-overlapping keys (even vs multiple-of-3 nations) so all
    three row classes appear. Spark's join(on=[colname]) implements
    exactly USING semantics — that equivalence is what the hash
    verifies."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    a = (
        c.join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .filter(F.col("n_nationkey") % 2 == 0)
        .groupBy(F.col("n_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust_raw"))
    )
    b = (
        s.filter(F.col("s_nationkey") % 3 == 0)
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp_raw"))
    )
    joined = a.join(b, ["k"], "full_outer")
    return joined.select(
        "k",
        F.coalesce(F.col("n_cust_raw"), F.lit(0)).cast("long").alias("n_cust"),
        F.coalesce(F.col("n_supp_raw"), F.lit(0)).cast("long").alias("n_supp"),
        F.when(F.col("n_cust_raw").isNull(), "supp_only")
        .when(F.col("n_supp_raw").isNull(), "cust_only")
        .otherwise("both")
        .alias("side"),
    ).orderBy("k")
