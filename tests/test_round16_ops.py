"""Round-16 operator tests: isotonic monotonicity/pooling, bitemporal
axis semantics, capacity conservation."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _rows(spark, name, sf=SF):
    return registry.queries()[name](spark, sf).collect()


def test_isotonic_fit_is_monotone_and_mean_preserving(spark):
    rows = sorted(_rows(spark, "ml_isotonic_calibration"), key=lambda r: r.bin)
    fitted = [r.fitted_ppm for r in rows]
    assert fitted == sorted(fitted)  # non-decreasing by construction
    # PAV preserves the weighted mean up to the ppm quantization
    n = sum(r.n for r in rows)
    raw_mean = sum(r.pos for r in rows) / n
    fit_mean = sum(r.fitted_ppm * r.n for r in rows) / n / 1_000_000
    assert abs(raw_mean - fit_mean) < 0.001
    for r in rows:
        assert 0 <= r.fitted_ppm <= 1_000_000


def test_isotonic_matches_sklearn_style_pav(spark):
    """Brute-force PAV pooling in python must equal the minimax fit."""
    rows = sorted(_rows(spark, "ml_isotonic_calibration"), key=lambda r: r.bin)
    blocks = [[r.pos, r.n] for r in rows]  # [sum_y, weight]
    i = 0
    merged = []
    for b in blocks:
        merged.append(list(b))
        while len(merged) > 1 and (
            merged[-2][0] * merged[-1][1] >= merged[-1][0] * merged[-2][1]
        ):
            p2, n2 = merged.pop()
            merged[-1][0] += p2
            merged[-1][1] += n2
    # expand: each pooled block's rate repeated for its member bins
    out = []
    for p, n in merged:
        rate = p * 1_000_000 // n
        # count how many original bins this block absorbed by weight
        out.append((rate, n))
    # reconstruct per-bin fitted by walking blocks against bin weights
    fitted = []
    bi = 0
    for rate, wn in out:
        acc = 0
        while acc < wn:
            acc += rows[bi].n
            fitted.append(rate)
            bi += 1
    assert fitted == [r.fitted_ppm for r in rows]


def test_bitemporal_revisions_bounded(spark):
    rows = _rows(spark, "etl_bitemporal_pit")
    for r in rows:
        assert 0 <= r.n_revised_late <= r.n_parts_known
        assert r.pit_price_total_cents > 0
    assert sum(r.n_revised_late for r in rows) >= 0


def test_capacity_allocation_conserves_quantity(spark):
    from pyspark.sql import functions as F

    rows = _rows(spark, "orders_capacity_allocation")
    for r in rows:
        assert r.n_filled + r.n_partial + r.n_backordered == r.n_lines
        assert 0 <= r.fill_permille <= 1000
    # at most one partial line per part overall
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    n_parts = li.select("l_partkey").distinct().count()
    assert sum(r.n_partial for r in rows) <= n_parts
    # half-capacity => aggregate fill rate close to but not above ~capacity+1-per-part
    total_qty = li.agg(F.sum(F.col("l_quantity").cast("long"))).collect()[0][0]
    filled = sum(r.qty_filled for r in rows)
    assert filled <= total_qty // 2 + n_parts  # per-part div-2 floor slack
