"""Modern SQL surface, part 5: IDENTIFIER() parameterized names,
lateral column aliases, and case-insensitive collations (Spark 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table, register_views
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# IDENTIFIER(): SQL-injection-safe dynamic table/column names
# --------------------------------------------------------------------------

_IDENT_ORACLE = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("sql_identifier_clause", oracle=_IDENT_ORACLE, tags=("sql", "modern"))
def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTIFIER() clause (Spark 3.5+/4): table and column names
    arrive as session-variable STRINGS and resolve through
    IDENTIFIER(...) — names stay data until the analyzer validates
    them as identifiers, which is the injection-safe way to write
    templated jobs ("run this rollup over <table>.<measure>") that
    orchestration otherwise string-formats together (the same
    f-string risk `sql_execute_immediate` addresses for VALUES, here
    for NAMES — the two compose). The oracle is the statically-named
    query, proving resolution lands on the same plan."""
    register_views(spark, sf_dir, ["orders"])
    spark.sql("DECLARE OR REPLACE VARIABLE tbl_name STRING DEFAULT 'orders'")
    spark.sql("DECLARE OR REPLACE VARIABLE measure_col STRING DEFAULT 'o_totalprice'")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(IDENTIFIER(measure_col) * 100) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM IDENTIFIER(tbl_name)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


# --------------------------------------------------------------------------
# Lateral column aliases
# --------------------------------------------------------------------------

_LCA_ORACLE = """
SELECT l_returnflag,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
            AS BIGINT) AS net_cents,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) // 100
            AS BIGINT) AS net_dollars,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) // 100
            // count(*) AS BIGINT) AS dollars_per_line
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("sql_lateral_column_alias", oracle=_LCA_ORACLE, tags=("sql", "modern"))
def sql_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases (Spark 3.4+): later select-list items
    reference earlier ALIASES in the same SELECT (net_cents ->
    net_dollars -> dollars_per_line) instead of re-expanding the
    whole expression at each step — the readability feature that
    kills copy-paste drift in wide metric queries (change the base
    expression once, every derived column follows). The oracle
    spells out the full expansion, proving the analyzer's rewrite is
    exactly that expansion."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                    AS BIGINT) AS net_cents,
               CAST(net_cents div 100 AS BIGINT) AS net_dollars,
               CAST(net_dollars div count(*) AS BIGINT) AS dollars_per_line
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


# --------------------------------------------------------------------------
# Collations: case-insensitive distinct via UTF8_LCASE
# --------------------------------------------------------------------------

_COLLATION_ORACLE = """
WITH variants AS (
  SELECT c_mktsegment, c_name AS v FROM customer
  UNION ALL
  SELECT c_mktsegment, lower(c_name) AS v FROM customer
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_variants,
       CAST(count(DISTINCT v) AS BIGINT) AS n_cs_distinct,
       CAST(count(DISTINCT lower(v)) AS BIGINT) AS n_ci_distinct
FROM variants
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("scalar_collation", oracle=_COLLATION_ORACLE, tags=("scalar", "modern", "string"))
def scalar_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4): counting DISTINCT over a
    ``UTF8_LCASE``-collated column is case-insensitive at the TYPE
    level — equality, grouping, and joins all follow the collation
    with no lower() wrapped around every reference (and, at scale,
    no lower() materialized into the shuffle key; the collation-aware
    hash does it). The fixture's names are upper-cased, so a union
    with their lowercased twins makes the case-sensitive and
    case-insensitive distinct counts genuinely differ (2x vs 1x);
    the oracle reproduces the semantics with explicit lower()."""
    cust = load_table(spark, sf_dir, "customer")
    variants = cust.select("c_mktsegment", F.col("c_name").alias("v")).unionAll(
        cust.select("c_mktsegment", F.lower("c_name").alias("v"))
    )
    return (
        variants.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_variants"),
            F.countDistinct("v").cast("long").alias("n_cs_distinct"),
            F.countDistinct(F.expr("collate(v, 'UTF8_LCASE')"))
            .cast("long")
            .alias("n_ci_distinct"),
        )
        .orderBy("c_mktsegment")
    )
