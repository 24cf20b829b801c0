"""Round-22 tests: Fellegi-Sunter, IPW ATE, k-anonymity, DP counts."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_fellegi_sunter_histogram_counts_all_blocked_pairs(spark):
    rows = registry.queries()["dedup_fellegi_sunter"](spark, SF).collect()
    assert rows
    cust = spark.read.parquet(f"{SF}/customer.parquet").collect()
    from collections import Counter

    blocks = Counter((c.c_nationkey, c.c_mktsegment) for c in cust)
    want_pairs = sum(v * (v - 1) // 2 for v in blocks.values())
    assert sum(r.n_pairs for r in rows) == want_pairs
    # agreement on every field must outscore disagreement on every field
    assert rows[-1].score_bucket > rows[0].score_bucket or len(rows) == 1


def test_ipw_ate_exact_weighting_identity(spark):
    rows = registry.queries()["causal_ipw_ate"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 < r.n_treated < r.n_customers
        # IPW means are plausibly sized vs raw spend (non-negative here)
        assert r.mean_treated_cents >= 0 and r.mean_control_cents >= 0
        assert r.ate_cents == r.mean_treated_cents - r.mean_control_cents


def test_k_anonymity_monotone_in_k(spark):
    rows = registry.queries()["privacy_k_anonymity"](spark, SF).collect()
    assert [r.k for r in rows] == [2, 5, 10]
    viol = [r.n_violating_classes for r in rows]
    risk = [r.n_rows_at_risk for r in rows]
    assert viol == sorted(viol)  # larger k can only add violations
    assert risk == sorted(risk)
    assert len({r.n_classes for r in rows}) == 1
    assert len({r.n_rows_total for r in rows}) == 1


def test_dp_counts_noise_matches_inverse_cdf(spark):
    rows = registry.queries()["privacy_dp_counts"](spark, SF).collect()
    assert len(rows) == 5
    import hashlib

    for r in rows:
        h = int(hashlib.md5(r.seg.encode()).hexdigest()[:12], 16)
        u = (h + 0.5) / 2**48
        sign = 1.0 if u < 0.5 else -1.0
        noise = math.floor(sign * math.log(1.0 - 2.0 * abs(u - 0.5)) * 1e6 + 0.5)
        assert r.noise_e6 == noise, r.seg
        assert r.dp_count_e6 == r.true_count * 1_000_000 + noise
