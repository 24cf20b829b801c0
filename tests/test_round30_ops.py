"""Round-30 tests: momentum backtest, DiD, join-size estimator."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_momentum_no_lookahead_and_spread_identity(spark):
    rows = registry.queries()["bars_momentum_backtest"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.ls_ret_e6 == r.long_ret_e6 - r.short_ret_e6
        assert r.long_symbol != r.short_symbol


def test_did_contrast_identity(spark):
    rows = registry.queries()["causal_diff_in_diff"](spark, SF).collect()
    assert len(rows) == 4
    m = {(r.treated, r.post): r.mean_y_milli for r in rows}
    want = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
    assert len({r.did_milli for r in rows}) == 1
    assert rows[0].did_milli == want


def test_join_size_identity_holds(spark):
    r = registry.queries()["join_size_estimator"](spark, SF).collect()[0]
    assert r.estimation_error == 0
    assert r.predicted == r.actual > 0
