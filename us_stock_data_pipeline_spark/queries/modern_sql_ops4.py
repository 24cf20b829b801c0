"""Modern SQL surface, part 4: GROUP BY ALL / ORDER BY ALL sugar and
EXECUTE IMMEDIATE parameterized execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from us_stock_data_pipeline_spark.catalog import register_views
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# GROUP BY ALL / ORDER BY ALL
# --------------------------------------------------------------------------

_GBA_ORACLE = """
SELECT l_returnflag, l_linestatus,
       date_part('year', l_shipdate) AS ship_year,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem
GROUP BY l_returnflag, l_linestatus, ship_year
ORDER BY l_returnflag, l_linestatus, ship_year
"""


@register("sql_group_by_all", oracle=_GBA_ORACLE, tags=("sql", "modern"))
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL (Spark 3.4+/4): the analyzer
    derives the grouping set from the select list's non-aggregate
    expressions — no more keeping a 3-key GROUP BY clause in sync
    with the projection by hand (the classic copy-paste bug when a
    dimension is added to a report query). The oracle spells the
    keys explicitly, proving the inference picks exactly the
    non-aggregate columns including the computed ship_year. Pure
    analyzer sugar: same pushed scan, same partial aggregate."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(year(l_shipdate) AS BIGINT) AS ship_year,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        FROM lineitem
        GROUP BY ALL
        ORDER BY ALL
        """
    )


# --------------------------------------------------------------------------
# EXECUTE IMMEDIATE with variable binding
# --------------------------------------------------------------------------

_EI_ORACLE = """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS balance_cents
FROM customer
WHERE c_acctbal > (SELECT quantile_disc(c_acctbal, 0.75) FROM customer)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("sql_execute_immediate", oracle=_EI_ORACLE, tags=("sql", "modern", "extensibility"))
def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE IMMEDIATE with a ``?`` parameter bound from a session
    variable (Spark 4): the SQL-injection-safe way to run dynamically
    assembled statements — the parameter travels as a typed value,
    never spliced into the string (the jobs-orchestration idiom for
    templated maintenance SQL; the reference formats its REST query
    strings with f-strings, polygon_client.py, which is exactly the
    pattern parameter binding replaces at the SQL layer). The
    threshold is the balance p75 computed with percentile_disc — a
    value the data contains, so both engines bind the identical
    constant; the oracle uses an inline scalar subquery."""
    register_views(spark, sf_dir, ["customer"])
    spark.sql("DECLARE OR REPLACE VARIABLE bal_threshold DOUBLE")
    spark.sql(
        "SET VAR bal_threshold = (SELECT percentile_disc(0.75)"
        " WITHIN GROUP (ORDER BY c_acctbal) FROM customer)"
    )
    return spark.sql(
        """
        EXECUTE IMMEDIATE
        'SELECT c_mktsegment,
                CAST(count(*) AS BIGINT) AS n_customers,
                CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                  AS balance_cents
         FROM customer
         WHERE c_acctbal > ?
         GROUP BY c_mktsegment
         ORDER BY c_mktsegment'
        USING bal_threshold
        """
    )
