"""Round-7 operator tests, part 2: survivor-pick/corpus-profile
invariants, DQ scorecard consistency, and the adapted TPC-H variants'
structural guarantees."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _q(name):
    return registry.queries()[name]


# --------------------------------------------------------------------------
# llm_ops15
# --------------------------------------------------------------------------


def test_survivor_keeps_longest(spark):
    rows = _q("dedup_survivor_pick")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.cluster_size > 1
        # the keeper is the longest doc, so it holds at least the mean share
        assert r.kept_chars * r.cluster_size >= r.total_chars


def test_length_histogram_bucket_bounds(spark):
    for r in _q("corpus_length_histogram")(spark, SF).collect():
        assert 2**r.len_bucket <= r.min_chars <= r.max_chars < 2 ** (r.len_bucket + 1)


def test_js_divergence_bounded(spark):
    rows = _q("corpus_js_divergence")(spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert -1e-9 <= r.js_divergence <= 1.0


def test_bucket_balance_accounting(spark):
    r = _q("embedding_bucket_balance")(spark, SF).collect()[0]
    assert r.n_vecs == 500
    assert r.min_bucket <= r.avg_bucket <= r.max_bucket
    assert r.imbalance >= 1.0
    assert r.n_buckets <= 256  # 8-bit bucket space


# --------------------------------------------------------------------------
# relational16
# --------------------------------------------------------------------------


def test_dq_scorecard_rates_consistent(spark):
    rows = _q("etl_dq_rule_scorecard")(spark, SF).collect()
    assert len(rows) == 5
    n_rows = {r.n_rows for r in rows}
    assert len(n_rows) == 1  # every rule scored over the same pass
    for r in rows:
        assert 0.0 <= r.pass_rate <= 1.0
        assert abs(r.pass_rate - (1 - r.n_violations / r.n_rows)) < 1e-3


def test_nearest_gap_ordering(spark):
    for r in _q("join_nearest_numeric_1d")(spark, SF).collect():
        assert r.min_gap_cents <= r.avg_gap_cents <= r.max_gap_cents
        assert r.min_gap_cents >= 0


def test_pivot_multi_agg_row_conservation(spark):
    from us_stock_data_pipeline_spark.catalog import load_table

    rows = _q("pivot_multi_agg")(spark, SF).collect()
    total = sum(r.f_rows + r.o_rows for r in rows)
    assert total == load_table(spark, SF, "lineitem").count()


def test_observe_metrics_match_direct_agg(spark):
    from pyspark.sql import functions as F

    from us_stock_data_pipeline_spark.catalog import load_table

    r = _q("etl_observe_inflight_metrics")(spark, SF).collect()[0]
    direct = (
        load_table(spark, SF, "orders")
        .filter(F.col("o_orderstatus") != "X")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("c"),
        )
        .collect()[0]
    )
    assert r.n_rows == direct.n
    assert r.total_cents == direct.c


# --------------------------------------------------------------------------
# relational17 — adapted TPC-H
# --------------------------------------------------------------------------


def test_q2_top20_and_positive_costs(spark):
    rows = _q("q2_min_cost_supplier")(spark, SF).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r.unit_cents > 0


def test_q9_profit_positive_under_cost_model(spark):
    # cost = 60% of price, discount <= 10% -> every line nets positive
    rows = _q("q9_product_profit")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.profit_cents > 0


def test_q11_head_sorted_descending(spark):
    rows = _q("q11_important_stock")(spark, SF).collect()
    vals = [r.value_cents for r in rows]
    assert vals == sorted(vals, reverse=True)
    assert all(v > 0 for v in vals)


def test_q20_sorted_supplier_names(spark):
    rows = _q("q20_excess_shippers")(spark, SF).collect()
    names = [r.s_name for r in rows]
    assert names == sorted(names)


def test_q21_sole_blame_counts(spark):
    rows = _q("q21_sole_late_shipper")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.numwait >= 1


def test_q21_no_cartesian_in_plan(spark):
    df = _q("q21_sole_late_shipper")(spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------------
# analytics_ops13 + streaming_ops3
# --------------------------------------------------------------------------


def test_bot_detection_cv_nonnegative(spark):
    rows = _q("events_bot_detection")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.gap_cv >= 0.0
        assert r.mean_gap_sec >= 0
        if r.bot_flag:
            assert r.n_gaps + 1 >= 20 and r.gap_cv < 0.5


def test_seasonal_naive_errors_bounded(spark):
    rows = _q("forecast_eval_seasonal_naive")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.mape >= 0.0
        assert 0.0 <= r.smape <= 2.0  # sMAPE is bounded by construction


def test_backfill_ranges_disjoint_and_positive(spark):
    rows = _q("etl_backfill_plan")(spark, SF).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r.gap_start)
        for r in rs:
            assert r.n_hours >= 1
            assert r.gap_start < r.gap_end
        for a, b in zip(rs, rs[1:]):
            assert a.gap_end < b.gap_start  # collapsed runs never touch


def test_error_alert_threshold_is_exact(spark):
    rows = _q("stream_error_rate_alert")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_errors * 10000 > 1500 * r.n_total
        assert r.n_errors <= r.n_total
