"""Round-47 relational, part 32: the SQL UNPIVOT clause syntax pin."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

_UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT c_nationkey AS nation,
         CAST(count(*) AS BIGINT) AS n_customers,
         CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS total_bal_cents,
         CAST(max(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS max_bal_cents
  FROM customer GROUP BY 1
)
SELECT nation, metric, value FROM (
  SELECT nation, 'n_customers' AS metric, n_customers AS value FROM wide
  UNION ALL
  SELECT nation, 'total_bal_cents', total_bal_cents FROM wide
  UNION ALL
  SELECT nation, 'max_bal_cents', max_bal_cents FROM wide
)
ORDER BY nation, metric
"""


@register("sql_unpivot_clause", oracle=_UNPIVOT_ORACLE, tags=("sql", "reshape"))
def sql_unpivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL UNPIVOT clause (FROM ... UNPIVOT (value FOR metric IN
    (...))) — PIVOT's inverse and the syntax twin of the DataFrame
    `unpivot_long` op: a wide per-nation metric row melts into
    (nation, metric, value) triples, pinned against the UNION ALL
    lowering every engine implements it as. Unpivot is the reshape a
    metrics store runs before generic per-metric processing
    (alerting, retention policies, downsampling) — columns become
    data, so new metrics stop being schema changes. The melt itself
    is projection-only: zero shuffle beyond the source aggregate."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_upv")
    return spark.sql(
        """
        WITH wide AS (
          SELECT c_nationkey AS nation,
                 CAST(count(*) AS BIGINT) AS n_customers,
                 CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                   AS total_bal_cents,
                 CAST(max(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                   AS max_bal_cents
          FROM customer_upv GROUP BY 1
        )
        SELECT nation, metric, value
        FROM wide
        UNPIVOT (value FOR metric IN (n_customers, total_bal_cents, max_bal_cents))
        ORDER BY nation, metric
        """
    )
