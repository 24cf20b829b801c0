"""Modern SQL surface, part 6: named parameter markers.

Spark >= 3.4 supports `spark.sql(query, args={...})` with `:name`
parameter markers — the injection-safe templating surface an analytics
service exposes instead of f-string SQL. The marker binds as a typed
literal in the plan (so Catalyst constant-folds and pushes it down
exactly like a hand-written constant).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with sibling modules)

from us_stock_data_pipeline_spark.catalog import register_views
from us_stock_data_pipeline_spark.registry import register

_CUTOFF_DATE = "1997-01-01"
_STATUS = "F"

_PARAM_ORACLE = f"""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_shipdate >= DATE '{_CUTOFF_DATE}' AND l_linestatus = '{_STATUS}'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("sql_named_parameters", oracle=_PARAM_ORACLE, tags=("sql", "modern"))
def sql_named_parameters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named parameter markers (`:cutoff`, `:status`) bound through
    `spark.sql(query, args=...)` — the injection-safe way to
    parameterize a query service (string-formatted SQL is the
    reference's approach in its REST query layer; markers bind as
    TYPED literals, so predicate pushdown and partition pruning see
    a real constant, verified by the pushed-filter plan tests).
    The oracle is the identical query with the constants inlined —
    proving marker binding is semantically a literal."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS revenue_cents
        FROM lineitem
        WHERE l_shipdate >= :cutoff AND l_linestatus = :status
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """,
        args={"cutoff": datetime.date.fromisoformat(_CUTOFF_DATE), "status": _STATUS},
    )
