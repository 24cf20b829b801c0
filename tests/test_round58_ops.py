"""Round-58 tests: burstiness/Fano, cost-threshold sweep."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_burstiness_in_range_and_gap_conservation(spark):
    rows = registry.queries()["events_burstiness"](spark, SF).collect()
    assert rows
    for r in rows:
        assert -1_000_000 <= r.burstiness_e6 <= 1_000_000
        assert r.fano_e4 >= 0
        assert r.mean_gap_ms > 0
        assert r.n_gaps > 0


def test_cost_sweep_exactly_one_best_and_cost_formula(spark):
    rows = registry.queries()["ml_cost_threshold_sweep"](spark, SF).collect()
    assert rows
    assert sum(r.is_best for r in rows) == 1
    n_pos = rows[0].tp + rows[0].fn  # any row: tp + fn = total positives
    for r in rows:
        assert r.tp + r.fn == n_pos
        assert r.cost == 5 * r.fn + r.fp
    best = min(rows, key=lambda r: (r.cost, r.threshold_milli))
    flagged = next(r for r in rows if r.is_best)
    assert flagged.threshold_milli == best.threshold_milli
    # thresholds ascend, cumulative tp/fp descend with threshold
    ts = [r.threshold_milli for r in rows]
    assert ts == sorted(ts)
    tps = [r.tp for r in rows]
    assert tps == sorted(tps, reverse=True)
