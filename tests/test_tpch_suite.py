"""Tests for the relational6 TPC-H-adapted suite: plan-shape assertions
(decorrelation produced the join strategy the docstrings promise) and
semantic invariants the DuckDB hash check can't see on 1-row results."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _q(name):
    return registry.queries()[name]


def _plan(spark, name):
    return _q(name)(spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_q4_exists_becomes_semi_join(spark):
    plan = _plan(spark, "q4_order_priority")
    assert "LeftSemi" in plan


def test_q22_not_exists_becomes_anti_join(spark):
    plan = _plan(spark, "q22_global_sales_opportunity")
    assert "LeftAnti" in plan


def test_q6_predicates_push_to_scan(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_q18_having_rows_recompute(spark):
    """Every surviving order really has >300 total quantity, and sum_qty
    matches an independent recompute."""
    rows = _q("q18_large_volume_customer")(spark, SF).collect()
    assert rows
    truth = {
        r.l_orderkey: r.s
        for r in spark.read.parquet(f"{SF}/lineitem.parquet")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .collect()
    }
    for r in rows:
        assert r.sum_qty > 300
        assert truth[r.o_orderkey] == r.sum_qty


def test_q13_distribution_accounts_for_every_customer(spark):
    """custdist must partition the customer universe (including the
    zero-order bucket the outer join preserves)."""
    rows = _q("q13_customer_distribution")(spark, SF).collect()
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert sum(r.custdist for r in rows) == n_cust


def test_q14_ratio_bounded(spark):
    rows = _q("q14_promo_revenue")(spark, SF).collect()
    assert len(rows) == 1
    assert 0.0 <= rows[0].promo_revenue <= 100.0


def test_q15_winner_is_true_max(spark):
    """The reported supplier's revenue equals the max over an independent
    per-supplier recompute."""
    rows = _q("q15_top_supplier")(spark, SF).collect()
    assert rows
    rev = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("r"))
        .collect()
    )
    best = max(r.r for r in rev)
    for row in rows:
        assert row.total_revenue == best
