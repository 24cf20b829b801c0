"""Round-38 relational, part 30: degree assortativity and the SQL
PIVOT clause syntax pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Degree assortativity of the supplier-part graph
# --------------------------------------------------------------------------

_ASSORT_ORACLE = """
WITH edges AS (
  SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
),
sdeg AS (SELECT s, CAST(count(*) AS BIGINT) AS ds FROM edges GROUP BY s),
pdeg AS (SELECT p, CAST(count(*) AS BIGINT) AS dp FROM edges GROUP BY p),
joined AS (
  SELECT sd.ds AS x, pd.dp AS y
  FROM edges e JOIN sdeg sd ON sd.s = e.s JOIN pdeg pd ON pd.p = e.p
),
sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM joined
)
SELECT n AS n_edges,
       CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                  / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                     * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
                  * 1000000 + 0.5) AS BIGINT) AS assortativity_e6
FROM sums
"""


@register("graph_assortativity", oracle=_ASSORT_ORACLE, tags=("graph", "stats"))
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity — the Pearson correlation of endpoint
    degrees across edges: positive means hubs attach to hubs (social
    networks), negative means hubs attach to leaves (supply chains,
    the internet) — the one-number summary of a graph's mixing
    pattern, and a key input to failure-cascade and dedup-blocking
    analyses. Endpoint degrees come from two count aggregates joined
    back onto the edge list (the degrees are dimension-sized —
    broadcast); the correlation is assembled from exact BIGINT power
    sums with per-factor double casts, quantized once. Plan: one
    distinct on the edge key, two degree aggregates, one edge-list
    join, one global power-sum reduce."""
    edges = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    sdeg = edges.groupBy("s").agg(F.count("*").cast("long").alias("ds"))
    pdeg = edges.groupBy("p").agg(F.count("*").cast("long").alias("dp"))
    joined = (
        edges.join(F.broadcast(sdeg), "s")
        .join(F.broadcast(pdeg), "p")
        .select(F.col("ds").alias("x"), F.col("dp").alias("y"))
    )
    sums = joined.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    r = F.floor(
        (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
        / (
            F.sqrt(nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
            * F.sqrt(nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
        )
        * 1_000_000
        + F.lit(0.5)
    ).cast("long")
    return sums.select(F.col("n").alias("n_edges"), r.alias("assortativity_e6"))


# --------------------------------------------------------------------------
# SQL PIVOT clause
# --------------------------------------------------------------------------

_PIVOT_ORACLE = """
SELECT o_orderpriority,
       CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS f_orders,
       CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS o_orders,
       CAST(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS p_orders
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("sql_pivot_clause", oracle=_PIVOT_ORACLE, tags=("sql", "reshape"))
def sql_pivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL PIVOT clause (FROM ... PIVOT (agg FOR col IN (...))) —
    the syntax twin of DataFrame .pivot() already covered by
    pivot_counts/pivot_multi_agg, pinned against the conditional-
    aggregation rewrite every engine lowers PIVOT into. The IN list
    is explicit and closed — the property that keeps the output
    schema static (a dynamic pivot would make the schema
    data-dependent, which breaks both Catalyst planning and any
    downstream contract)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_pv")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(coalesce(`F`, 0) AS BIGINT) AS f_orders,
               CAST(coalesce(`O`, 0) AS BIGINT) AS o_orders,
               CAST(coalesce(`P`, 0) AS BIGINT) AS p_orders
        FROM (
          SELECT o_orderpriority, o_orderstatus FROM orders_pv
        )
        PIVOT (count(*) FOR o_orderstatus IN ('F' AS `F`, 'O' AS `O`, 'P' AS `P`))
        ORDER BY o_orderpriority
        """
    )
