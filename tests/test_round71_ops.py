"""Round-71 tests: CUPED A/B, vendor switching."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_cuped_reduces_variance_and_preserves_arms(spark):
    (row,) = registry.queries()["events_ab_cuped"](spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    assert row.n_treat + row.n_control == n_users
    # variance ratio = 1 - rho^2 lives in [0, 1]
    assert 0 <= row.var_ratio_e4 <= 10_000
    # parity split on a null experiment: adjusted and raw lifts should be
    # same order of magnitude (no sign flip beyond noise scale)
    assert abs(row.cuped_lift_cents_e2) <= abs(row.raw_lift_cents_e2) + 10_000_00


def test_vendor_switching_partition(spark):
    (row,) = registry.queries()["customer_vendor_switching"](spark, SF).collect()
    assert row.n_both == row.n_retained + row.n_switched
    assert row.retained_e4 == row.n_retained * 10_000 // row.n_both
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    od = spark.read.parquet(f"{SF}/orders.parquet")
    for yr, col in ((1997, "n_churned"), (1998, "n_new")):
        n_cust = (
            li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
            .filter(F.year("o_orderdate") == yr)
            .select("o_custkey")
            .distinct()
            .count()
        )
        # customers active that year = both + year-exclusive
        assert row.n_both + getattr(row, col) == n_cust
