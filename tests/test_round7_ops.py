"""Round-7 operator tests: statistical identities, allocation/credit
conservation, monotonicity, and plan-shape assertions the DuckDB
value-hash gate can't express."""

from __future__ import annotations

import math

from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.queries.ml_eval_ops2 import _NEYMAN_BUDGET

SF = "/root/testdata/sf0.001"


def _q(name):
    return registry.queries()[name]


def _executed(spark, name):
    df = _q(name)(spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE prints "== Final Plan ==" then "== Initial Plan ==" — count
    # operators in the final (executed) section only.
    return plan.split("== Initial Plan ==")[0]


# --------------------------------------------------------------------------
# analytics_ops12
# --------------------------------------------------------------------------


def test_spearman_rho_matches_d2_formula_and_bounds(spark):
    for r in _q("stats_spearman_corr")(spark, SF).collect():
        assert -1.0 <= r.spearman_rho <= 1.0
        n = r.n_days
        expect = 1.0 - 6.0 * r.sum_d2 / (n * (n * n - 1))
        assert abs(r.spearman_rho - expect) < 1e-3


def test_wilson_interval_brackets_p_hat(spark):
    for r in _q("stats_wilson_ci")(spark, SF).collect():
        assert 0.0 <= r.ci_low <= r.p_hat <= r.ci_high <= 1.0
        assert r.x <= r.n


def test_benford_shares_sum_to_one(spark):
    rows = _q("agg_benford_digits")(spark, SF).collect()
    assert sorted(r.digit for r in rows) == sorted({r.digit for r in rows})
    assert all(1 <= r.digit <= 9 for r in rows)
    assert abs(sum(r.observed_share for r in rows) - 1.0) < 0.01
    # Benford expectation is a fixed distribution summing to 1
    assert abs(sum(math.log10(1 + 1 / d) for d in range(1, 10)) - 1.0) < 1e-12


def test_hhi_bounds_and_monopoly_limit(spark):
    rows = _q("agg_herfindahl_index")(spark, SF).collect()
    for r in rows:
        assert 0 < r.hhi <= 10000.0
        # n equal-share suppliers bound HHI below by 10000/n
        assert r.hhi >= 10000.0 / r.n_suppliers - 1e-6
        if r.n_suppliers == 1:
            assert r.hhi == 10000.0


# --------------------------------------------------------------------------
# relational14
# --------------------------------------------------------------------------


def test_interval_coverage_positive_and_bounded(spark):
    rows = _q("interval_union_coverage")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_islands >= 1
        assert r.covered_seconds >= 0


def test_interval_coverage_single_shuffle(spark):
    """Flag window, island cumsum, and the island groupBy must all ride
    ONE user_id exchange (hash partitioning on user_id satisfies the
    (user_id, island_id) clustering)."""
    plan = _executed(spark, "interval_union_coverage")
    assert plan.count("Exchange hashpartitioning") == 1


def test_theil_sen_pair_count_is_triangular(spark):
    for r in _q("timeseries_theil_sen")(spark, SF).collect():
        # n_pairs = C(d, 2) for some integer day count d
        d = (1 + math.isqrt(1 + 8 * r.n_pairs)) // 2
        assert d * (d - 1) // 2 == r.n_pairs


def test_backlog_aging_shares_sum_to_one(spark):
    rows = _q("orders_backlog_aging")(spark, SF).collect()
    assert {r.age_bucket for r in rows} <= {"0-30", "31-60", "61-90", "90+"}
    assert abs(sum(r.value_share for r in rows) - 1.0) < 0.01


def test_freshness_sla_has_zero_lag_leader(spark):
    rows = _q("etl_freshness_sla")(spark, SF).collect()
    assert min(r.minutes_behind for r in rows) == 0
    for r in rows:
        assert r.rows_7d <= r.rows_total
        assert r.sla_breach == (r.minutes_behind > 1440)


# --------------------------------------------------------------------------
# ml_eval_ops2
# --------------------------------------------------------------------------


def test_lift_gains_monotone_and_complete(spark):
    rows = sorted(_q("ml_lift_deciles")(spark, SF).collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    gains = [r.cum_gain for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(gains, gains[1:]))
    assert abs(gains[-1] - 1.0) < 1e-9


def test_loo_encoding_bounds(spark):
    for r in _q("feature_target_encoding_loo")(spark, SF).collect():
        assert 0.0 <= r.enc_min <= r.enc_mean <= r.enc_max <= 1.0


def test_neyman_allocation_conserves_budget(spark):
    rows = _q("sample_stratified_neyman")(spark, SF).collect()
    assert sum(r.n_alloc for r in rows) == _NEYMAN_BUDGET
    for r in rows:
        assert r.n_alloc >= 0 and r.s_h >= 0


def test_quantile_normalize_monotone_curve(spark):
    rows = sorted(_q("quantile_normalize")(spark, SF).collect(), key=lambda r: r.rn)
    vals = [r.norm_value for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(vals, vals[1:]))
    for r in rows:
        assert r.min_cents <= round(r.norm_value * 100) <= r.max_cents


# --------------------------------------------------------------------------
# llm_ops14
# --------------------------------------------------------------------------


def test_hapax_counts_nested_in_vocab(spark):
    for r in _q("text_hapax_legomena")(spark, SF).collect():
        assert r.hapax + r.dis <= r.vocab <= r.n_tokens
        assert abs(r.hapax_ratio - r.hapax / r.vocab) < 1e-3


def test_ngram_novelty_grows_with_n(spark):
    rows = sorted(
        _q("corpus_ngram_saturation")(spark, SF).collect(), key=lambda r: r.n
    )
    assert [r.n for r in rows] == [1, 2, 3]
    ratios = [r.novelty_ratio for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(ratios, ratios[1:]))
    for r in rows:
        assert r.distinct_ngrams <= r.total_ngrams


def test_ushape_attribution_conserves_credit(spark, duckdb_con=None):
    """Each converting user with >=1 pre-purchase touch distributes
    ~1.0 credit (quantization slack <= 2 micro per user)."""
    import duckdb

    rows = _q("events_attribution_ushape")(spark, SF).collect()
    total_micro = sum(r.credit_micro for r in rows)
    con = duckdb.connect()
    n_users = con.execute(
        f"""
        WITH fp AS (SELECT user_id, min(ts) AS p FROM
          read_parquet('{SF}/events.parquet') WHERE event_type='purchase'
          GROUP BY user_id)
        SELECT count(DISTINCT e.user_id) FROM
          read_parquet('{SF}/events.parquet') e JOIN fp USING (user_id)
        WHERE e.event_type <> 'purchase' AND e.ts < fp.p
        """
    ).fetchone()[0]
    con.close()
    assert abs(total_micro - n_users * 1_000_000) <= 2 * n_users


def test_centroid_distance_matrix_shape(spark):
    rows = _q("embedding_centroid_distance")(spark, SF).collect()
    labels = {r.label_a for r in rows} | {r.label_b for r in rows}
    k = len(labels)
    assert len(rows) == k * (k - 1) // 2
    for r in rows:
        assert r.label_a < r.label_b
        assert r.centroid_dist >= 0.0


# --------------------------------------------------------------------------
# relational15
# --------------------------------------------------------------------------


def test_stochastic_oscillator_bounds(spark):
    rows = _q("bars_stochastic_oscillator")(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.pct_k <= 100.0
        assert 0.0 <= r.pct_d <= 100.0


def test_stochastic_single_shuffle_for_all_windows(spark):
    """Range min/max, row_number, and the %D smoother share one
    (symbol, day) sort after the daily rollup."""
    plan = _executed(spark, "bars_stochastic_oscillator")
    # one exchange for the daily groupBy, one for the symbol windows
    assert plan.count("Exchange hashpartitioning") <= 2


def test_obv_bounded_by_total_volume(spark):
    rows = _q("bars_obv")(spark, SF).collect()
    by_symbol = {}
    for r in rows:
        by_symbol.setdefault(r.symbol, []).append(r)
    for sym, rs in by_symbol.items():
        rs.sort(key=lambda r: r.day)
        assert rs[0].obv_cents == 0  # first day has no prior close


def test_degree_distribution_bucket_consistency(spark):
    for r in _q("graph_degree_distribution")(spark, SF).collect():
        assert r.min_degree <= r.mean_degree <= r.max_degree
        assert math.floor(math.log2(r.min_degree)) == r.degree_bucket
        assert math.floor(math.log2(r.max_degree)) == r.degree_bucket


def test_weekday_index_weighted_mean_is_one(spark):
    rows = _q("timeseries_weekday_index")(spark, SF).collect()
    by_symbol = {}
    for r in rows:
        by_symbol.setdefault(r.symbol, []).append(r)
    for sym, rs in by_symbol.items():
        total_days = sum(r.n_days for r in rs)
        weighted = sum(r.seasonal_index * r.n_days for r in rs) / total_days
        assert abs(weighted - 1.0) < 0.01, sym
