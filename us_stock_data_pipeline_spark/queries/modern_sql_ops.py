"""Round-5 modern-SQL surface: recursive CTEs and the VARIANT
semi-structured type — both new in Spark 4, both with exact DuckDB
twins, closing the last SQL-dialect gaps a DuckDB user would miss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table, register_views
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Recursive CTE: implicit binary-tree hierarchy walk
# --------------------------------------------------------------------------

_RECURSIVE_ORACLE = """
WITH RECURSIVE tree AS (
  SELECT doc_id AS node, CAST(0 AS BIGINT) AS depth
  FROM documents WHERE doc_id = 0
  UNION ALL
  SELECT d.doc_id, t.depth + 1
  FROM documents d JOIN tree t ON (d.doc_id - 1) // 2 = t.node
  WHERE d.doc_id > 0
)
SELECT depth,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(min(node) AS BIGINT) AS first_node,
       CAST(max(node) AS BIGINT) AS last_node
FROM tree
GROUP BY depth
ORDER BY depth
"""

_RECURSIVE_SPARK_SQL = """
WITH RECURSIVE tree AS (
  SELECT doc_id AS node, CAST(0 AS BIGINT) AS depth
  FROM documents WHERE doc_id = 0
  UNION ALL
  SELECT d.doc_id, t.depth + 1
  FROM documents d JOIN tree t ON (d.doc_id - 1) div 2 = t.node
  WHERE d.doc_id > 0
)
SELECT depth,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(min(node) AS BIGINT) AS first_node,
       CAST(max(node) AS BIGINT) AS last_node
FROM tree
GROUP BY depth
ORDER BY depth
"""


@register("sql_recursive_hierarchy", oracle=_RECURSIVE_ORACLE, tags=("sql", "recursive"))
def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE, new in Spark 4): walk the
    implicit binary-tree hierarchy parent(n) = (n-1)/2 over doc_ids
    from the root and report the per-depth census — the org-chart /
    bill-of-materials traversal pattern SQL engines are asked for
    daily, previously only expressible here as the hand-rolled
    iterative join loops (`dedup_cluster_connected`, PageRank). The
    engine executes each recursion level as a join against the prior
    frontier — same physical shape as the manual loop, now planned by
    the engine with the termination check built in. Depth is
    O(log n) for this topology, so the plan is a short join chain, and
    each level's join key is the parent id (shuffle on ids, frontier
    shrinks as leaves exhaust)."""
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_RECURSIVE_SPARK_SQL)


# --------------------------------------------------------------------------
# VARIANT semi-structured extraction
# --------------------------------------------------------------------------

_VARIANT_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
       CAST(count(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS n_distinct_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("scalar_variant_props", oracle=_VARIANT_ORACLE, tags=("scalar", "variant"))
def scalar_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured extraction (new in Spark 4): the events
    `props` JSON strings parse ONCE into the binary VARIANT encoding
    and fields extract with `variant_get` path expressions — unlike
    per-expression get_json_object (which re-parses the string for
    every extraction, cf. scalar_json), VARIANT parses once and
    extracts many times from the binary form, and when stored to
    parquet the encoding is shredded columnar so extraction can prune
    like a real column. At 100 TB this is the difference between
    string-parsing the corpus per field and a columnar read; the query
    itself is one map-side parse + a standard grouped rollup."""
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").cast("long").alias("max_k"),
            F.countDistinct("k").alias("n_distinct_k"),
        )
        .orderBy("event_type")
    )
