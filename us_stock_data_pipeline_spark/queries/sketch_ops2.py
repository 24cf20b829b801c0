"""Sketch operators, part 2: Spark 3.5+ NATIVE Apache DataSketches
HLL functions — the built-in counterpart of the from-scratch
`agg_hll_sketch`, including the mergeable two-level rollup that is
the whole point of sketches at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# DuckDB cannot reproduce DataSketches' exact estimates, so the
# oracle-checkable contract is: the EXACT distinct count (both engines
# compute it) plus a boolean "estimate within 5%" that must be true —
# HLL at the default lgK=12 has ~1.6% standard error, so the 5% band
# holds deterministically for this data (sketches are deterministic
# functions of their input; there is no RNG to flake).
_HLL_NATIVE_ORACLE = """
WITH per_prio AS (
  SELECT o_orderpriority AS grp,
         CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact
  FROM orders GROUP BY o_orderpriority
),
total AS (
  SELECT 'ALL' AS grp, CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact
  FROM orders
)
SELECT grp, n_exact, CAST(1 AS BIGINT) AS est_within_5pct
FROM (SELECT * FROM per_prio UNION ALL SELECT * FROM total)
ORDER BY grp
"""


@register("agg_hll_native_sketch", oracle=_HLL_NATIVE_ORACLE, tags=("agg", "sketch"))
def agg_hll_native_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native DataSketches HLL (Spark 3.5+ ``hll_sketch_agg`` /
    ``hll_union_agg`` / ``hll_sketch_estimate``): per-priority
    customer sketches, PLUS the 'ALL' row produced by UNIONING the
    per-group sketch binaries — never rescanning the data — which is
    the property that matters at 100 TB: per-partition/day/tenant
    sketches are KB-sized mergeable state, and any rollup
    (all-priorities, all-time) is a sketch union, not a second pass.
    The from-scratch twin `agg_hll_sketch` shows the algorithm; this
    shows the production API. Since DuckDB can't replay DataSketches'
    exact register estimates, the checked contract is exact-count
    equality plus a deterministic within-5% accuracy flag (lgK=12
    ~1.6% standard error; sketches have no RNG)."""
    orders = load_table(spark, sf_dir, "orders")
    sketches = orders.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.expr("hll_sketch_agg(o_custkey)").alias("sk"),
        F.countDistinct("o_custkey").cast("long").alias("n_exact"),
    )
    per_prio = sketches.select(
        "grp",
        "n_exact",
        F.expr("hll_sketch_estimate(sk)").alias("est"),
    )
    total = sketches.agg(
        F.expr("hll_union_agg(sk)").alias("sk_all"),
        F.sum(F.lit(0)).alias("_z"),
    ).crossJoin(
        F.broadcast(
            orders.agg(F.countDistinct("o_custkey").cast("long").alias("n_exact"))
        )
    ).select(
        F.lit("ALL").alias("grp"),
        "n_exact",
        F.expr("hll_sketch_estimate(sk_all)").alias("est"),
    )
    unioned = per_prio.unionByName(total)
    return unioned.select(
        "grp",
        "n_exact",
        F.when(
            F.abs(F.col("est") - F.col("n_exact")) * 20 <= F.col("n_exact"), 1
        )
        .otherwise(0)
        .cast("long")
        .alias("est_within_5pct"),
    ).orderBy("grp")
