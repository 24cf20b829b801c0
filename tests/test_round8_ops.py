"""Round-8 operator tests: semantic invariants the DuckDB oracle hash
can't express (bounds, algebraic identities, cross-query consistency).
"""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _rows(spark, name, sf=SF):
    return registry.queries()[name](spark, sf).collect()


def test_bollinger_band_geometry(spark):
    for r in _rows(spark, "bars_bollinger_bands"):
        assert r.upper_cents >= r.ma_cents >= r.lower_cents
        # %B is (close - lower) / (4 sd): inside the band iff in [0, 1]
        if r.pct_b is not None:
            inside = r.lower_cents <= r.cents <= r.upper_cents
            # allow the 1e-4 quantization at the boundary
            assert inside == (-0.0001 <= r.pct_b <= 1.0001) or abs(r.pct_b) < 0.01 or abs(r.pct_b - 1) < 0.01
        if r.bandwidth is not None:
            assert r.bandwidth >= 0


def test_beta_equal_weight_market_averages_to_one(spark):
    rows = _rows(spark, "bars_beta_capm")
    betas = [r.beta for r in rows]
    assert betas, "no symbols"
    # cov is linear: the equal-weight mean of betas against the
    # equal-weight market is exactly 1 (up to 1e-4 quantization)
    assert abs(sum(betas) / len(betas) - 1.0) < 0.01
    for r in rows:
        assert 0.0 <= r.r2 <= 1.0


def test_ou_half_life_gating(spark):
    for r in _rows(spark, "timeseries_ou_half_life"):
        if 0 < r.ar1_rho < 1:
            assert r.half_life_days is not None and r.half_life_days > 0
        else:
            assert r.half_life_days is None


def test_kendall_tau_bounds(spark):
    for r in _rows(spark, "stats_kendall_tau"):
        assert -1.0 <= r.tau_b <= 1.0
        assert r.concordant + r.discordant <= r.n_pairs


def test_kruskal_wallis_bounds(spark):
    (r,) = _rows(spark, "stats_kruskal_wallis")
    assert r.h_statistic >= 0
    assert 0 < r.tie_correction <= 1
    assert r.df == r.n_groups - 1


def test_bullwhip_ratio_is_variance_quotient(spark):
    for r in _rows(spark, "supply_chain_bullwhip"):
        assert r.var_demand > 0 and r.var_supply > 0
        assert abs(r.bullwhip_ratio - r.var_supply / r.var_demand) < 0.01


def test_pr_auc_bounds(spark):
    (r,) = _rows(spark, "ml_pr_auc")
    assert 0.0 <= r.prevalence <= 1.0
    # AP of any classifier is within [~prevalence-ish, 1]
    assert 0.0 <= r.avg_precision <= 1.0


def test_ndcg_bounds_and_hits(spark):
    rows = _rows(spark, "ml_ndcg_quantized")
    assert len(rows) == 10
    for r in rows:
        assert 0.0 <= r.ndcg <= 1.000001
        assert 0 <= r.n_hits <= 3


def test_hard_negatives_cross_label_and_shape(spark):
    rows = _rows(spark, "knn_hard_negatives")
    per_q = {}
    for r in rows:
        assert r.neighbor_label != r.query_label
        per_q.setdefault(r.query_id, []).append(r.rnk)
    for q, rnks in per_q.items():
        assert sorted(rnks) == [1, 2, 3, 4, 5]


def test_jl_distortion_summary_consistent(spark):
    (r,) = _rows(spark, "embedding_random_projection_jl")
    assert r.n_pairs > 0
    assert r.min_ppm <= r.mean_ppm <= r.max_ppm
    assert 0 <= r.n_within_50pct <= r.n_pairs


def test_kneser_ney_probability_bounds(spark):
    for r in _rows(spark, "text_kneser_ney_bigram"):
        assert 0 < r.p_kn <= 1.0
        assert r.c12 <= r.c1
        assert r.nfw >= 1 and r.nbw >= 1


def test_compaction_bins_partition_totals(spark):
    import duckdb

    rows = _rows(spark, "etl_compaction_bins")
    per_source = {}
    for r in rows:
        per_source[r.source] = per_source.get(r.source, 0) + r.total_bytes
        assert r.first_doc <= r.last_doc
        assert r.n_files >= 1
    con = duckdb.connect()
    truth = dict(
        con.execute(
            f"SELECT source, sum(n_chars) FROM read_parquet('{SF}/documents.parquet') GROUP BY source"
        ).fetchall()
    )
    assert per_source == {k: int(v) for k, v in truth.items()}


def test_discount_elasticity_r2_bounds(spark):
    for r in _rows(spark, "lineitem_discount_elasticity"):
        assert 0.0 <= r.r2 <= 1.0
        assert r.n_lines > 0
