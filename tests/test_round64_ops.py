"""Round-64 tests: bitmap distinct, Kupiec backtest."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_bitmap_distinct_equals_count_distinct(spark):
    rows = registry.queries()["agg_bitmap_distinct"](spark, SF).collect()
    want = {
        (r.event_type): (r.nu, r.ne)
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("nu"),
            F.count(F.lit(1)).alias("ne"),
        )
        .collect()
    }
    assert len(rows) == len(want)
    for r in rows:
        assert (r.n_users, r.n_events) == want[r.etype]


def test_kupiec_violations_consistent_with_var(spark):
    kup = {r.symbol: r for r in registry.queries()["stats_kupiec_var_backtest"](spark, SF).collect()}
    var = {r.symbol: r for r in registry.queries()["bars_var_expected_shortfall"](spark, SF).collect()}
    assert set(kup) == set(var)
    for sym, k in kup.items():
        v = var[sym]
        assert k.var_bp == v.var_bp
        # strict breaches are below the k-th order statistic, so fewer
        # than k_tail of them exist
        assert 0 <= k.n_violations < v.k_tail
        assert k.kupiec_lr_e4 >= 0
