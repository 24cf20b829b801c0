"""Round-9 operator tests: semantic invariants the DuckDB oracle hash
can't express (bounds, algebraic identities, cross-query consistency).
"""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _rows(spark, name, sf=SF):
    return registry.queries()[name](spark, sf).collect()


def test_k_anonymity_partition_accounting(spark):
    rows = _rows(spark, "compliance_k_anonymity")
    # every customer sits in exactly one equivalence class
    total = sum(r.n_customers for r in rows)
    assert total == spark.read.parquet(f"{SF}/customer.parquet").count()
    for r in rows:
        assert r.n_customers == r.class_size * r.n_classes
        # at most 5 distinct order priorities exist
        assert 0 <= r.min_l_diversity <= r.max_l_diversity <= 5


def test_jarque_bera_rejects_iff_above_critical(spark):
    for r in _rows(spark, "stats_jarque_bera"):
        assert r.jb_stat >= 0
        assert r.reject_normality == (1 if r.jb_stat > 5.991 else 0)


def test_benjamini_hochberg_rejection_is_prefix(spark):
    rows = sorted(_rows(spark, "stats_benjamini_hochberg"), key=lambda r: r.p_rank)
    # BH step-up: the rejected set is exactly ranks 1..k
    flags = [r.rejected for r in rows]
    assert all(f in (0, 1) for f in flags)
    if 1 in flags:
        k = max(i for i, f in enumerate(flags) if f == 1)
        assert all(f == 1 for f in flags[: k + 1])
        assert all(f == 0 for f in flags[k + 1 :])
    for r in rows:
        assert 0.0 <= r.p_value <= 1.0


def test_zonemap_full_year_probe_covers_quarters(spark):
    rows = {r.probe_id: r for r in _rows(spark, "layout_zonemap_skipping")}
    # probe 5 (all of 1994) can never skip more files than any quarter
    for q in (1, 2, 3, 4):
        assert rows[5].n_skipped <= rows[q].n_skipped
        assert rows[5].rows_scanned >= rows[q].rows_scanned
    # probe 6 (2005, beyond the data) must skip everything
    assert rows[6].n_skipped == rows[6].n_files
    assert rows[6].rows_scanned == 0
    assert rows[6].skip_permille == 1000


def test_drift_monitor_bounds(spark):
    for r in _rows(spark, "etl_row_drift_monitor"):
        assert r.n_alerts <= r.n_days
        # a drop can never exceed -100%
        assert r.max_drop_pm >= -1000
        if r.n_alerts > 0:
            assert r.first_alert_day is not None
            assert max(r.max_spike_pm, -r.max_drop_pm) >= 300


def test_candlestick_counts_bounded_by_days(spark):
    for r in _rows(spark, "bars_candlestick_patterns"):
        assert 0 <= r.n_doji <= r.n_days
        assert 0 <= r.n_hammer <= r.n_days
        # engulfing needs a prior day
        assert 0 <= r.n_bull_engulf <= max(r.n_days - 1, 0)


def test_gap_followthrough_accounting(spark):
    for r in _rows(spark, "bars_gap_followthrough"):
        assert 0 <= r.n_up_follow <= r.n_gap_up
        assert 0 <= r.n_dn_follow <= r.n_gap_dn
        if r.n_gap_up > 0:
            assert r.up_follow_permille == r.n_up_follow * 1000 // r.n_gap_up
        else:
            assert r.up_follow_permille == 0


def test_sax_letters_partition_days_near_quartiles(spark):
    for r in _rows(spark, "timeseries_symbolic_sax"):
        assert r.n_a + r.n_b + r.n_c + r.n_d == r.n_days
        assert len(r.sax_prefix) == min(r.n_days, 120)
        assert set(r.sax_prefix) <= set("abcd")
        # percentile_disc(0.25) guarantees >= 25% of days at or below q1
        assert r.n_a * 4 >= r.n_days


def test_truncation_loss_consistency(spark):
    for r in _rows(spark, "corpus_truncation_loss"):
        assert 0 <= r.n_truncated <= r.n_docs
        assert 0 <= r.tokens_lost < r.tokens_total
        if r.n_truncated == 0:
            assert r.tokens_lost == 0
        assert r.lost_permille == r.tokens_lost * 1000 // r.tokens_total


def test_lexicon_hit_rate_bounds(spark):
    for r in _rows(spark, "text_lexicon_hit_rate"):
        assert 0 <= r.n_hits <= r.n_tokens
        assert 0 <= r.n_distinct_hits <= 16  # lexicon size
        assert r.hit_ppm == r.n_hits * 1000000 // r.n_tokens


def test_brier_decomposition_identity(spark):
    (r,) = _rows(spark, "ml_brier_decomposition")
    assert 0 <= r.brier <= 1
    assert r.reliability >= 0
    assert r.resolution >= 0
    assert 0 <= r.uncertainty <= 0.25
    # Murphy: brier = reliability - resolution + uncertainty + within-bin
    # variance of the forecasts; with 10 bins the residual is small
    assert abs(r.brier - (r.reliability - r.resolution + r.uncertainty)) < 0.02
    # resolution can never exceed uncertainty
    assert r.resolution <= r.uncertainty + 1e-9


def test_sql_udf_matches_inline_expression(spark):
    rows = _rows(spark, "sql_udf_scalar")
    assert rows, "no groups"
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF}/lineitem.parquet").filter(
        F.col("l_shipdate") >= "1994-01-01"
    )
    inline = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(
                "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)"
                " * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT)"
            ).alias("net")
        )
        .collect()
    )
    expect = {(r.l_returnflag, r.l_linestatus): r.net for r in inline}
    for r in rows:
        assert expect[(r.l_returnflag, r.l_linestatus)] == r.net_revenue_cents


def test_transform_with_state_matches_batch(spark):
    rows = _rows(spark, "stream_transform_with_state")
    from pyspark.sql import functions as F

    batch = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.round(F.col("value") * 100).cast("long")).alias("mn"),
            F.max(F.round(F.col("value") * 100).cast("long")).alias("mx"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"),
        )
        .collect()
    )
    expect = {r.user_id: (r.n, r.mn, r.mx, r.s) for r in batch}
    assert len(rows) == len(expect)
    for r in rows:
        assert expect[r.user_id] == (r.n_events, r.min_cents, r.max_cents, r.sum_cents)
