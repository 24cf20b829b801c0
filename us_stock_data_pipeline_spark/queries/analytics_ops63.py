"""Round-64 analytics, part 63: Newman modularity of the supplier
co-purchase graph under the nation partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

_MOD_ORACLE = """
WITH edges AS (
  SELECT DISTINCT a.l_suppkey AS s1, b.l_suppkey AS s2
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
),
labeled AS (
  SELECT e.s1, e.s2, sa.s_nationkey AS c1, sb.s_nationkey AS c2
  FROM edges e
  JOIN supplier sa ON sa.s_suppkey = e.s1
  JOIN supplier sb ON sb.s_suppkey = e.s2
),
m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM labeled),
within AS (
  SELECT c1 AS community, CAST(count(*) AS BIGINT) AS e_within
  FROM labeled WHERE c1 = c2 GROUP BY c1
),
-- degree mass per community: each edge endpoint contributes 1 to its
-- community's degree sum
deg AS (
  SELECT community, CAST(sum(d) AS BIGINT) AS d_sum FROM (
    SELECT c1 AS community, CAST(count(*) AS BIGINT) AS d FROM labeled GROUP BY c1
    UNION ALL
    SELECT c2 AS community, CAST(count(*) AS BIGINT) AS d FROM labeled GROUP BY c2
  ) GROUP BY community
)
SELECT d.community, CAST(coalesce(w.e_within, 0) AS BIGINT) AS e_within,
       d.d_sum,
       CAST(floor(
         (CAST(coalesce(w.e_within, 0) AS DOUBLE) / t.m
          - (CAST(d.d_sum AS DOUBLE) / (2.0 * t.m))
            * (CAST(d.d_sum AS DOUBLE) / (2.0 * t.m)))
         * 1000000000 + 0.5) AS BIGINT) AS q_contrib_e9
FROM deg d LEFT JOIN within w ON w.community = d.community CROSS JOIN m t
ORDER BY d.community
"""


@register("graph_modularity", oracle=_MOD_ORACLE, tags=("graph",))
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity contributions of the nation partition on the
    supplier co-purchase graph (suppliers joined by appearing in the
    same order): per community Q_c = e_c/m - (d_c/2m)^2; the sum over
    rows is the modularity that says whether nations form real
    procurement communities or the co-purchase graph ignores
    geography (`graph_assortativity` asks the same of DEGREES; this
    asks it of an exogenous label, which is the validation step
    before trusting any community-detection output). Edge set, m,
    within counts, and degree masses are exact integers off one
    order-key self-join (distinct pairs, fan-out bounded by order
    width); each community's contribution is one fixed double
    expression quantized at e9, so the final sum is reader-side
    exact. Plan: self-join + distinct (one shuffle), two broadcast
    supplier-dimension joins, nation-grain aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s1"))
    b = li.select(F.col("l_orderkey").alias("okb"), F.col("l_suppkey").alias("s2"))
    edges = (
        a.join(b, (F.col("okb") == F.col("ok")) & (F.col("s1") < F.col("s2")))
        .select("s1", "s2")
        .distinct()
    )
    labeled = (
        edges.join(
            F.broadcast(sup.select(F.col("s_suppkey").alias("s1"), F.col("s_nationkey").alias("c1"))),
            "s1",
        )
        .join(
            F.broadcast(sup.select(F.col("s_suppkey").alias("s2"), F.col("s_nationkey").alias("c2"))),
            "s2",
        )
    )
    m = labeled.agg(F.count(F.lit(1)).cast("long").alias("m"))
    within = (
        labeled.filter(F.col("c1") == F.col("c2"))
        .groupBy(F.col("c1").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("e_within"))
    )
    deg = (
        labeled.groupBy(F.col("c1").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .unionAll(
            labeled.groupBy(F.col("c2").alias("community")).agg(
                F.count(F.lit(1)).cast("long").alias("d")
            )
        )
        .groupBy("community")
        .agg(F.sum("d").cast("long").alias("d_sum"))
    )
    ew = F.coalesce(F.col("e_within"), F.lit(0)).cast("double")
    half_share = F.col("d_sum").cast("double") / (2.0 * F.col("m"))
    return (
        deg.join(within, "community", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "community",
            F.coalesce(F.col("e_within"), F.lit(0)).cast("long").alias("e_within"),
            "d_sum",
            F.floor((ew / F.col("m") - half_share * half_share) * 1_000_000_000 + F.lit(0.5))
            .cast("long")
            .alias("q_contrib_e9"),
        )
        .orderBy("community")
    )
