"""Modern SQL surface, part 3: Spark 4 pipe syntax and SQL session
variables.

Both are analyzer-level features — they change how a query is WRITTEN,
not how it executes — so each query's oracle is the equivalent ANSI
form, proving the sugar desugars to the same plan semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from us_stock_data_pipeline_spark.catalog import register_views
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# SQL pipe syntax (|>)
# --------------------------------------------------------------------------

_PIPE_ORACLE = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("sql_pipe_syntax", oracle=_PIPE_ORACLE, tags=("sql", "modern"))
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 ``|>``): the same scan -> filter ->
    extend -> aggregate -> order pipeline written top-to-bottom in
    dataflow order instead of inside-out ANSI nesting — the SQL
    dialect feature that matches how the DataFrame API already reads,
    and how analysts actually reason about a query. Each ``|>`` stage
    desugars in the analyzer; the physical plan is identical to the
    ANSI oracle's (same pushed filter, same partial aggregate), which
    is exactly what the oracle comparison proves. No runtime cost,
    no new operator — syntax only."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |> EXTEND CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                  AS rev_cents
        |> AGGREGATE CAST(count(*) AS BIGINT) AS n_lines,
                     CAST(sum(rev_cents) AS BIGINT) AS revenue_cents
           GROUP BY l_returnflag
        |> ORDER BY l_returnflag
        """
    )


# --------------------------------------------------------------------------
# SQL session variables (DECLARE / SET VAR)
# --------------------------------------------------------------------------

_VARS_ORACLE = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders
WHERE o_orderdate > (SELECT max(o_orderdate) - INTERVAL 90 DAY FROM orders)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("sql_session_variables", oracle=_VARS_ORACLE, tags=("sql", "modern"))
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (Spark 4 ``DECLARE VARIABLE`` /
    ``SET VAR``): compute a data-driven cutoff once — the corpus's
    max order date minus 90 days — bind it to a session variable, and
    reuse it as a constant in the analysis query. This is the SQL-
    scripting idiom for parameterized jobs (the reference hardcodes
    its date windows in Python driver code, symbols(historical)/
    utils.py:25-58; variables move that into the SQL layer where the
    value is visible to the optimizer as a literal: the cutoff
    constant-folds into the scan's pushed filter rather than riding
    as an uncorrelated scalar subquery). The oracle inlines the same
    subquery, proving the two-step binding changes nothing
    semantically."""
    register_views(spark, sf_dir, ["orders"])
    spark.sql("DECLARE OR REPLACE VARIABLE recent_cutoff TIMESTAMP")
    spark.sql(
        "SET VAR recent_cutoff ="
        " (SELECT max(o_orderdate) - INTERVAL 90 DAY FROM orders)"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS revenue_cents
        FROM orders
        WHERE o_orderdate > recent_cutoff
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )
