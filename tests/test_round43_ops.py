"""Round-43 tests: population stability index."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_psi_bins_and_shares(spark):
    from us_stock_data_pipeline_spark.queries.ml_eval_ops8 import _PSI_BINS

    rows = registry.queries()["ml_population_stability_index"](spark, SF).collect()
    assert 1 <= len(rows) <= _PSI_BINS
    base_total = sum(r.p_base_e6 for r in rows if r.p_base_e6 is not None)
    new_total = sum(r.p_new_e6 for r in rows if r.p_new_e6 is not None)
    # shares sum to ~1 (integer floor remainders)
    assert 1_000_000 - _PSI_BINS <= base_total <= 1_000_000
    assert 1_000_000 - _PSI_BINS <= new_total <= 1_000_000
    # baseline deciles put ~10% in each bin by construction
    for r in rows:
        if r.p_base_e6 is not None:
            assert abs(r.p_base_e6 - 100_000) < 25_000, r


def test_psi_zero_for_identical_halves(spark):
    """Sanity on the estimator itself: identical distributions give
    PSI ~ 0 (computed in python on a synthetic example)."""
    import math

    base = list(range(1000))
    new = list(range(1000))
    edges = [sorted(base)[(k * len(base) + 9) // 10 - 1] for k in range(1, 10)]

    def shares(xs):
        bins = [sum(1 for e in edges if x > e) for x in xs]
        from collections import Counter

        c = Counter(bins)
        return {b: n * 1_000_000 // len(xs) for b, n in c.items()}

    pb, pn = shares(base), shares(new)
    psi = sum(
        (pn[b] - pb[b]) / 1e6 * math.log(pn[b] / pb[b])
        for b in pb
        if b in pn
    )
    assert abs(psi) < 1e-9
