"""Round-59 tests: named parameters, XYZ classes, lead-time scorecard."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_named_parameters_equal_inlined_constants(spark):
    rows = registry.queries()["sql_named_parameters"](spark, SF).collect()
    inlined = spark.sql(
        """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS revenue_cents
        FROM lineitem
        WHERE l_shipdate >= DATE '1997-01-01' AND l_linestatus = 'F'
        GROUP BY l_returnflag ORDER BY l_returnflag
        """
    ).collect()
    assert rows == inlined


def test_xyz_partition_of_qualifying_parts(spark):
    rows = registry.queries()["orders_xyz_variability"](spark, SF).collect()
    assert {r.xyz_class for r in rows} <= {"X", "Y", "Z"}
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    qualifying = (
        li.groupBy(
            "l_partkey",
            F.floor(
                F.datediff(F.col("l_shipdate"), F.lit("1992-01-01").cast("date")) / 7
            ).alias("wk"),
        )
        .count()
        .groupBy("l_partkey")
        .count()
        .filter(F.col("count") >= 3)
        .count()
    )
    assert sum(r.n_parts for r in rows) == qualifying


def test_lead_time_p90_is_order_statistic(spark):
    rows = registry.queries()["supplier_lead_time_scorecard"](spark, SF).collect()
    assert rows
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    od = spark.read.parquet(f"{SF}/orders.parquet")
    leads = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .select(
            F.col("l_suppkey").alias("supp"),
            F.datediff("l_shipdate", "o_orderdate").alias("d"),
        )
        .collect()
    )
    by_supp: dict[int, list[int]] = {}
    for r in leads:
        by_supp.setdefault(r.supp, []).append(r.d)
    for row in rows[:10]:
        ds = sorted(by_supp[row.supp])
        k = max(1, math.ceil(len(ds) * 0.9))
        assert row.p90_lead_d == ds[k - 1]
        assert row.n_lines == len(ds)
        assert row.mean_lead_d == math.floor(sum(ds) / len(ds))
