"""Round-65 tests: power-law MLE, DeLong AUC CI."""

from __future__ import annotations

import math

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_power_law_alpha_manual(spark):
    (row,) = registry.queries()["stats_power_law_mle"](spark, SF).collect()
    vals = [
        round(r.value * 100)
        for r in spark.read.parquet(f"{SF}/events.parquet").select("value").collect()
    ]
    tail = [v for v in vals if v >= 5000]
    slnx = sum(math.floor(math.log(v / 5000.0) * 1e9 + 0.5) for v in tail)
    alpha = 1.0 + len(tail) * 1e9 / slnx
    assert row.n_tail == len(tail)
    assert row.alpha_e6 == math.floor(alpha * 1e6 + 0.5)
    assert row.alpha_e6 > 1_000_000  # alpha > 1 by construction
    assert row.mean_excess_cents == sum(tail) // len(tail) - 5000


def test_delong_ci_brackets_auc_and_matches_point_estimate(spark):
    (row,) = registry.queries()["ml_auc_delong_ci"](spark, SF).collect()
    assert row.ci_lo_e6 <= row.auc_e6 <= row.ci_hi_e6
    assert row.se_e6 > 0
    # CI is symmetric around AUC to rounding
    assert abs((row.auc_e6 - row.ci_lo_e6) - (row.ci_hi_e6 - row.auc_e6)) <= 2
    # cross-check the point AUC against the registered ml_auc_roc query
    (auc_row,) = registry.queries()["ml_auc_roc"](spark, SF).collect()
    assert abs(row.auc_e6 / 1e6 - float(auc_row.auc)) < 2e-6
