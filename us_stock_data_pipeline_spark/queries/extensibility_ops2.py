"""Round-9 extensibility additions, part 2: SQL-defined scalar UDFs.

Spark 4 supports ``CREATE [TEMPORARY] FUNCTION ... RETURNS ... RETURN
<expr>`` — a function defined IN SQL, inlined by Catalyst at plan time.
Unlike a Python UDF (`udf_zscore_by_group`) or a pandas UDF, a SQL UDF
has zero serialization boundary: the body is substituted into the plan
and participates in whole-stage codegen, predicate pushdown, and
constant folding like any built-in. It is the right extensibility tier
for pure-expression business logic (pricing formulas, bucketing rules)
that teams want to name once and reuse — the reference hardcodes its
net-price arithmetic inline (ingest pipelines have no function
registry at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from us_stock_data_pipeline_spark.catalog import register_views
from us_stock_data_pipeline_spark.registry import register

# The UDF body, shared verbatim by the Spark function definition and the
# DuckDB oracle (which inlines it — DuckDB macros would also work; the
# point is the SPARK side runs through a named SQL function).
_NET_BODY = "CAST(round({p} * (1 - {d}) * (1 + {t}) * 100) AS BIGINT)"

_SQL_UDF_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum({_NET_BODY.format(p='l_extendedprice', d='l_discount', t='l_tax')})
            AS BIGINT) AS net_revenue_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("sql_udf_scalar", oracle=_SQL_UDF_ORACLE, tags=("extensibility", "sql"))
def sql_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar UDF (Spark 4 ``CREATE TEMPORARY FUNCTION ...
    RETURN expr``): register ``net_price_cents`` once, then use it in
    an aggregate over lineitem. Catalyst INLINES the body at analysis
    time — ``.explain`` shows the same whole-stage-codegen aggregate
    as writing the expression by hand, with zero Python boundary —
    which is why this tier beats a Python/pandas UDF for any logic
    expressible as one SQL expression (compare
    `pandas_udf_vowel_stats`, which pays an Arrow round trip for
    semantics SQL can't write). The oracle inlines the identical
    expression text, so values are exact integer cents on both
    engines. Plan: one scan with the shipdate filter pushed down, one
    map-side-combined groupBy on two low-cardinality keys."""
    register_views(spark, sf_dir, ["lineitem"])
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_price_cents("
        "p DOUBLE, d DOUBLE, t DOUBLE) RETURNS BIGINT "
        f"RETURN {_NET_BODY.format(p='p', d='d', t='t')}"
    )
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(net_price_cents(l_extendedprice, l_discount, l_tax))
                    AS BIGINT) AS net_revenue_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1994-01-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    )
