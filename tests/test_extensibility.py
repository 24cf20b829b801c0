"""Round-5 extensibility-surface tests (UDTF + Python DataSource)."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.catalog import load_table

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    return registry.queries()[name](spark, SF).collect()


def test_udtf_conserves_money_exactly(spark):
    """3 installments per order; summed cents must equal the exact
    total order cents — the integer-split contract."""
    rows = _rows(spark, "udtf_installment_expand")
    assert [r["installment_idx"] for r in rows] == [1, 2, 3]
    n_orders = load_table(spark, SF, "orders").count()
    assert all(r["n_orders"] == n_orders for r in rows)
    total_cents = (
        load_table(spark, SF, "orders")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")))
        .first()[0]
    )
    assert sum(r["total_cents"] for r in rows) == total_cents
    # remainder lands on installment 1 only: idx1 >= idx2 == idx3
    assert rows[0]["total_cents"] >= rows[1]["total_cents"] == rows[2]["total_cents"]


def test_python_datasource_parallel_partitions(spark):
    """The custom source must plan one partition per page — the scan
    RDD's partition count equals the page count (parallel pagination,
    not a single driver loop)."""
    rows = _rows(spark, "source_python_datasource")
    assert len(rows) == 7  # SYM0..SYM6
    assert sum(r["n_rows"] for r in rows) == 800  # 8 pages x 100 rows
    # re-read the raw source and check physical parallelism
    df = (
        spark.read.format("synthetic_pages")
        .option("pages", "8")
        .option("rowsperpage", "100")
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
