"""Round-51 tests: price dispersion, order-frequency histogram."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_price_dispersion_ordering_and_support(spark):
    rows = registry.queries()["part_price_dispersion"](spark, SF).collect()
    assert rows
    spreads = [r.spread_cents for r in rows]
    assert spreads == sorted(spreads, reverse=True)
    for r in rows:
        assert r.n_sales >= 5
        assert r.spread_cents == r.max_cents - r.min_cents
        assert 0 <= r.stddev_cents <= r.spread_cents


def test_order_histogram_includes_zero_bucket_and_conserves(spark):
    rows = registry.queries()["orders_per_customer_histogram"](spark, SF).collect()
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    n_orders_with_known_cust = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF}/customer.parquet"),
            F.col("o_custkey") == F.col("c_custkey"),
            "semi",
        )
        .count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    assert sum(r.n_orders * r.n_customers for r in rows) == n_orders_with_known_cust
