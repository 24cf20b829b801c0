"""Round-13 operator tests."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _rows(spark, name, sf=SF):
    return registry.queries()[name](spark, sf).collect()


def test_anova_bounds_and_dof(spark):
    (r,) = _rows(spark, "stats_anova_oneway")
    assert r.f_stat >= 0
    assert 0 <= r.eta_squared <= 1
    assert r.df_between == r.n_groups - 1
    assert r.df_within == r.n_rows - r.n_groups


def test_ensemble_vote_is_subset_of_signals(spark):
    for r in _rows(spark, "anomaly_ensemble_vote"):
        # 2-of-3 can't exceed the sum of individual flags / 2
        assert r.n_anomalies * 2 <= r.n_flag_return + r.n_flag_level + r.n_flag_volume
        # MAD-based 3-sigma flags are rare by construction
        assert r.n_flag_return * 4 <= r.n_days
        if r.n_anomalies > 0:
            assert r.first_anomaly_day is not None


def test_boosting_reduces_mse(spark):
    (r,) = _rows(spark, "ml_boosting_round")
    assert r.mse_after_stage2 <= r.mse_after_stage1 + 1e-9
    assert 0 <= r.mse_after_stage1 <= 0.25  # label variance bound
    assert 0 <= r.leaf_left_milli <= 1000
    assert 0 <= r.leaf_right_milli <= 1000
    # stage-2 deltas are residual means: bounded by the milli scale
    assert abs(r.delta_left_milli) <= 1000
    assert abs(r.delta_right_milli) <= 1000


def test_boosting_stage1_matches_stump(spark):
    (stump,) = _rows(spark, "ml_decision_stump")
    (boost,) = _rows(spark, "ml_boosting_round")
    assert boost.threshold_stage1 == stump.threshold_milli


def test_ddww_matches_batch_distinct(spark):
    rows = {(r.user_id, r.event_type) for r in _rows(spark, "stream_dedup_within_watermark")}
    batch = {
        (r.user_id, r.event_type)
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert rows == batch
