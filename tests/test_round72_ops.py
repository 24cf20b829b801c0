"""Round-72 tests: Shapley R^2, Heaps' law."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_shapley_efficiency_axiom(spark):
    rows = registry.queries()["ml_shapley_r2_features"](spark, SF).collect()
    assert {r.feature for r in rows} == {"quantity", "discount"}
    full = rows[0].r2_full_e6
    assert all(r.r2_full_e6 == full for r in rows)
    # efficiency: shapley values sum to the full-model R^2 (quantization slack)
    assert abs(sum(r.shapley_e6 for r in rows) - full) <= 2
    for r in rows:
        assert 0 <= r.r2_solo_e6 <= full + 2
        assert 0 <= full <= 1_000_000


def test_heaps_beta_in_sublinear_range(spark):
    (row,) = registry.queries()["corpus_heaps_law"](spark, SF).collect()
    # vocabulary grows sublinearly: 0 <= beta < 1. The synthetic fixture
    # draws from a CLOSED vocabulary (~31 types, ln K ~= 3.43), so the
    # curve saturates at the first checkpoint and beta is exactly 0 —
    # which is itself the signal the operator exists to surface.
    assert 0 <= row.heaps_beta_e6 < 1_000_000
    assert row.n_points >= 4
    assert row.ln_k_e6 > 0  # K >= 1 vocabulary scale
    import math

    vocab_at_saturation = math.exp(row.ln_k_e6 / 1e6)
    assert 2 <= vocab_at_saturation <= 10_000
