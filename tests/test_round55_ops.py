"""Round-55 tests: Hurst exponent, Brown-Forsythe."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_hurst_present_for_all_symbols_and_plausible(spark):
    rows = registry.queries()["timeseries_hurst_exponent"](spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_sym = ev.select("event_type").distinct().count()
    assert len(rows) == n_sym
    for r in rows:
        # R/S slopes live in (0, 1.5) for any real series; far outside
        # means the block fan-out or the log-log fit broke
        assert 0 < r.hurst_e6 < 1_500_000


def test_brown_forsythe_stat_nonnegative_and_support(spark):
    (row,) = registry.queries()["stats_brown_forsythe"](spark, SF).collect()
    assert row.bf_stat_e4 >= 0
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_sym = ev.select("event_type").distinct().count()
    assert row.n_groups == n_sym
    # one return per symbol-day minus the first day
    n_days = ev.select(F.date_trunc("day", "ts")).distinct().count()
    assert row.n_obs == n_sym * (n_days - 1)
