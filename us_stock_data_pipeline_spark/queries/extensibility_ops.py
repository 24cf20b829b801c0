"""Round-5 extensibility surface: Python UDTF (table function) and the
Spark 4 Python DataSource API — completing the engine's extension-point
coverage (scalar UDF / pandas UDF / applyInPandas / mapInPandas /
cogrouped pandas are in udf_ops; this adds row->table functions and
custom connectors).

Both are deterministic so they carry full DuckDB value-hash oracles
that reconstruct the same rows from pure SQL arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Python UDTF: installment-plan expansion
# --------------------------------------------------------------------------

_UDTF_ORACLE = """
WITH plans AS (
  SELECT o.o_orderkey,
         CAST(i.i AS INTEGER) AS installment_idx,
         CAST(round(o.o_totalprice * 100) AS BIGINT) // 3
           + CASE WHEN i.i = 1
                  THEN CAST(round(o.o_totalprice * 100) AS BIGINT) % 3
                  ELSE 0 END AS installment_cents
  FROM orders o, generate_series(1, 3) i(i)
)
SELECT installment_idx,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(installment_cents) AS BIGINT) AS total_cents
FROM plans
GROUP BY installment_idx
ORDER BY installment_idx
"""


@register("udtf_installment_expand", oracle=_UDTF_ORACLE, tags=("udf", "udtf"))
def udtf_installment_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (user-defined TABLE function, Spark 4): each order
    expands into a 3-installment payment plan — integer-cent split with
    the remainder on the first installment, so the expansion conserves
    money exactly (asserted downstream by the oracle's total). UDTFs
    are the row->rows extension point the scalar UDF surface can't
    express; like row-at-a-time UDFs they are the SLOW PATH (per-row
    Python dispatch — the repo's built-in explode/sequence formulation
    of the same expansion is the fast path, cf. doc_chunking), so the
    operator exists to cover the API with an honest cost label: use a
    UDTF when the expansion logic is genuinely imperative Python, and
    keep the output aggregated (as here) so the Python boundary crosses
    aggregate state, not the corpus."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="o_orderkey bigint, installment_idx int, installment_cents bigint")
    class InstallmentPlan:
        def eval(self, o_orderkey, total_cents):
            base = total_cents // 3
            rem = total_cents - 3 * base
            for i in range(1, 4):
                yield (o_orderkey, i, base + (rem if i == 1 else 0))

    spark.udtf.register("installment_plan_udtf", InstallmentPlan)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_for_udtf")
    plans = spark.sql(
        """
        SELECT i.*
        FROM orders_for_udtf o,
             LATERAL installment_plan_udtf(
               o.o_orderkey,
               CAST(round(o.o_totalprice * 100) AS BIGINT)
             ) i
        """
    )
    return (
        plans.groupBy("installment_idx")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("installment_cents").cast("long").alias("total_cents"),
        )
        .orderBy("installment_idx")
    )


# --------------------------------------------------------------------------
# Python DataSource API: synthetic paged REST connector
# --------------------------------------------------------------------------

_N_PAGES = 8
_ROWS_PER_PAGE = 100

_DATASOURCE_ORACLE = f"""
WITH rows AS (
  SELECT p.i AS page, r.j AS row_in_page
  FROM generate_series(0, {_N_PAGES - 1}) p(i),
       generate_series(0, {_ROWS_PER_PAGE - 1}) r(j)
)
SELECT 'SYM' || CAST((page * {_ROWS_PER_PAGE} + row_in_page) % 7 AS VARCHAR)
         AS symbol,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum((page * 1315423911 + row_in_page * 2654435761) % 100000)
            AS BIGINT) AS price_cents_sum
FROM rows
GROUP BY 1
ORDER BY 1
"""


@register("source_python_datasource", oracle=_DATASOURCE_ORACLE, tags=("source", "extensibility"))
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom connector via the Spark 4 Python DataSource API — the
    modern, engine-integrated answer to the reference's hand-rolled
    REST pagination loop (`polygon_client.py:73-94`): the source
    declares its schema, plans one InputPartition PER PAGE, and Spark
    schedules the page fetches across executors — pagination becomes
    PARALLEL and fault-isolated (a failed page retries alone) instead
    of the reference's sequential driver-side while-loop. The page
    payload here is deterministic arithmetic (the sandbox has no
    network) so the oracle can replay it in SQL; a real deployment
    swaps the generator body for the HTTP call and keeps the exact
    same partition-planning skeleton (etl/sources.py holds the
    retry/backoff contract)."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class SyntheticPagesReader(DataSourceReader):
        def __init__(self, options):
            self.n_pages = int(options.get("pages", str(_N_PAGES)))
            self.rows_per_page = int(
                options.get("rowsperpage", str(_ROWS_PER_PAGE))
            )

        def partitions(self):
            return [InputPartition(i) for i in range(self.n_pages)]

        def read(self, partition):
            p = partition.value
            for r in range(self.rows_per_page):
                yield (
                    p,
                    r,
                    f"SYM{(p * self.rows_per_page + r) % 7}",
                    (p * 1315423911 + r * 2654435761) % 100000,
                )

    class SyntheticPagesDataSource(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_pages"

        def schema(self):
            return (
                "page int, row_in_page int, symbol string, price_cents bigint"
            )

        def reader(self, schema):
            return SyntheticPagesReader(self.options)

    spark.dataSource.register(SyntheticPagesDataSource)
    pages = (
        spark.read.format("synthetic_pages")
        .option("pages", str(_N_PAGES))
        .option("rowsperpage", str(_ROWS_PER_PAGE))
        .load()
    )
    return (
        pages.groupBy("symbol")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price_cents").cast("long").alias("price_cents_sum"),
        )
        .orderBy("symbol")
    )
