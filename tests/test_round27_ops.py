"""Round-27 tests: HMM regime, k-fold CV, feature hashing."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_hmm_forward_matches_python_reference(spark):
    from us_stock_data_pipeline_spark.queries.analytics_ops37 import (
        _HMM_A,
        _HMM_B_DOWN,
        _HMM_B_UP,
        _SCALE,
    )

    rows = registry.queries()["bars_hmm_regime"](spark, SF).collect()
    assert rows
    from collections import defaultdict

    by_sym = defaultdict(list)
    for r in rows:
        by_sym[r.symbol].append(r)
    for sym, rs in by_sym.items():
        rs.sort(key=lambda r: r.day)
        a1 = 500_000
        for r in rs:
            b0 = _HMM_B_UP[0] if r.obs_up == 1 else _HMM_B_DOWN[0]
            b1 = _HMM_B_UP[1] if r.obs_up == 1 else _HMM_B_DOWN[1]
            p1 = (a1 * _HMM_A[0][0] + (_SCALE - a1) * _HMM_A[1][0]) // _SCALE
            p2 = (a1 * _HMM_A[0][1] + (_SCALE - a1) * _HMM_A[1][1]) // _SCALE
            w1, w2 = b0 * p1, b1 * p2
            a1 = w1 * _SCALE // (w1 + w2)
            assert r.p_bull_e6 == a1, (sym, r.day)
            assert r.regime == ("bull" if a1 > 500_000 else "bear")
        assert 0 < a1 < _SCALE


def test_hmm_regime_responds_to_observations(spark):
    """An up observation must never DECREASE bull probability relative
    to the same prior with a down observation (monotone emission)."""
    rows = registry.queries()["bars_hmm_regime"](spark, SF).collect()
    ups = [r.p_bull_e6 for r in rows if r.obs_up == 1]
    downs = [r.p_bull_e6 for r in rows if r.obs_up == 0]
    assert ups and downs
    assert sum(ups) / len(ups) > sum(downs) / len(downs)


def test_kfold_partitions_cover_everything(spark):
    rows = registry.queries()["ml_kfold_cv"](spark, SF).collect()
    assert [r.fold for r in rows] == [0, 1, 2, 3, 4]
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert sum(r.n_test for r in rows) == n_orders
    for r in rows:
        assert r.mae_cents > 0


def test_feature_hashing_collisions_shrink_with_bits(spark):
    rows = registry.queries()["feature_hashing_collisions"](spark, SF).collect()
    assert [r.bits for r in rows] == [8, 12, 16]
    assert len({r.n_features for r in rows}) == 1
    coll = [r.n_collided_features for r in rows]
    assert coll == sorted(coll, reverse=True)
    for r in rows:
        assert r.n_buckets_used + r.n_collided_features == r.n_features
        assert r.n_buckets_used <= 2**r.bits
