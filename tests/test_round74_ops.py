"""Round-74 tests: label propagation, growth contribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_label_propagation_grows_labeled_set(spark):
    rows = registry.queries()["graph_label_propagation"](spark, SF).collect()
    assert rows
    n_labeled = sum(r.n_suppliers for r in rows)
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    sup_in_graph = (
        li.select("l_orderkey", "l_suppkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_suppkey").alias("ss"))
        .select(F.explode("ss").alias("s"))
        .distinct()
        .count()
    )
    seeds_possible = (
        li.select("l_suppkey").distinct().filter(F.col("l_suppkey") % 5 == 0).count()
    )
    # propagation must label at least the connected seeds, and labels
    # never exceed the vertex universe
    assert seeds_possible // 2 <= n_labeled <= sup_in_graph
    # nation labels are valid nation keys
    nations = {
        r.s_nationkey
        for r in spark.read.parquet(f"{SF}/supplier.parquet").select("s_nationkey").collect()
    }
    assert all(r.label in nations for r in rows)


def test_growth_contributions_sum_to_total(spark):
    rows = registry.queries()["orders_growth_contribution"](spark, SF).collect()
    assert rows
    total = rows[0].total_growth_e6
    assert all(r.total_growth_e6 == total for r in rows)
    # contributions sum to the headline growth (quantization slack per row)
    assert abs(sum(r.growth_contrib_e6 for r in rows) - total) <= len(rows)
    t1 = sum(r.rev_y1_cents for r in rows)
    t2 = sum(r.rev_y2_cents for r in rows)
    assert abs(total / 1e6 - (t2 - t1) / t1) < 1e-5
