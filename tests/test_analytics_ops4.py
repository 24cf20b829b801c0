"""Round-5 batch-12 tests (cohort LTV + lead-time) and the generalized
timestamp normalization contract."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.catalog import TABLES, load_table

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    return registry.queries()[name](spark, SF).collect()


def test_all_tables_expose_only_timestamp_type(spark):
    """No table may leak TIMESTAMP_NTZ through the catalog — the
    round-4/round-5 regression class (epoch functions reject NTZ)."""
    for t in TABLES:
        df = load_table(spark, SF, t)
        for f in df.schema.fields:
            assert f.dataType.typeName() != "timestamp_ntz", (t, f.name)
        for f in df.schema.fields:
            if isinstance(f.dataType, TimestampType):
                # the exact call class that broke: must analyze
                df.select(F.unix_micros(f.name)).schema


def test_ltv_triangle_conserves_revenue(spark):
    rows = _rows(spark, "customer_ltv_cohort")
    total_cents = (
        load_table(spark, SF, "orders")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")))
        .first()[0]
    )
    assert sum(r["revenue_cents"] for r in rows) == total_cents
    for r in rows:
        assert r["months_since"] >= 0
        assert r["active_customers"] > 0


def test_ltv_month_zero_covers_every_customer(spark):
    """Every cohort's month-0 row must count every customer acquired
    that month (first order is by definition at months_since=0)."""
    rows = _rows(spark, "customer_ltv_cohort")
    m0 = {r["cohort_month"]: r["active_customers"] for r in rows if r["months_since"] == 0}
    o = load_table(spark, SF, "orders")
    firsts = (
        o.groupBy("o_custkey")
        .agg(F.min(F.date_trunc("month", "o_orderdate")).alias("cm"))
        .groupBy("cm")
        .count()
        .collect()
    )
    for r in firsts:
        assert m0[r["cm"]] == r["count"]


def test_leadtime_ordering_and_bounds(spark):
    rows = _rows(spark, "orders_fulfillment_leadtime")
    assert len(rows) == 5  # five priority classes
    for r in rows:
        assert 0 <= r["p50_days"] <= r["p90_days"] <= r["max_days"]
        assert r["avg_days"] >= 0
        assert r["n_lines"] > 0
