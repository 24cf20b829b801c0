"""Property tests for the round-2 operators: cluster resolution, TF-IDF,
deterministic sampling, funnel, retention, VWAP, z-score, entropy.
(Value correctness is separately enforced by each query's DuckDB oracle;
these assert the structural invariants the oracle can't express.)"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _q(name):
    return registry.queries()[name]


def test_cluster_partition_invariants(spark):
    rows = _q("dedup_cluster_connected")(spark, SF).collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    # Clusters partition the corpus; sizes agree; canonical is the min id.
    assert sum(len(v) for v in by_cluster.values()) == len(rows)
    for cid, members in by_cluster.items():
        assert all(m.cluster_size == len(members) for m in members)
        assert min(m.doc_id for m in members) == cid
        canon = [m for m in members if m.is_canonical]
        assert len(canon) == 1 and canon[0].doc_id == cid
    # The planted edge relation is respected: doc i-1 and i share a
    # cluster iff md5(i-1) starts below '8'.
    label = {r.doc_id: r.cluster_id for r in rows}
    import hashlib

    for i in sorted(label):
        if i - 1 in label:
            edge = hashlib.md5(str(i - 1).encode()).hexdigest()[0] < "8"
            assert (label[i] == label[i - 1]) == edge


def test_tfidf_ranked_and_descending(spark):
    rows = _q("text_tfidf")(spark, SF).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in per_doc.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert all(a.score >= b.score for a, b in zip(rs, rs[1:]))


def test_sample_deterministic_is_deterministic_and_stratified(spark):
    a = {r.event_id for r in _q("sample_deterministic")(spark, SF).collect()}
    b = {r.event_id for r in _q("sample_deterministic")(spark, SF).collect()}
    assert a == b  # same rows every run — no rand(), no seed plumbing
    from us_stock_data_pipeline_spark.catalog import load_table

    ev = load_table(spark, SF, "events")
    n_purchase = ev.filter(F.col("event_type") == "purchase").count()
    sampled = _q("sample_deterministic")(spark, SF)
    assert sampled.filter(F.col("event_type") == "purchase").count() == n_purchase
    # the ~8% strata really subsample
    n_view = ev.filter(F.col("event_type") == "view").count()
    assert sampled.filter(F.col("event_type") == "view").count() < n_view / 2


def test_funnel_counts_monotone(spark):
    r = _q("events_funnel")(spark, SF).collect()[0]
    assert r.n_signup >= r.n_view_after >= r.n_purchase_after >= 0
    assert 0.0 <= r.purchase_rate <= r.view_rate <= 1.0


def test_retention_offset_zero_covers_cohort(spark):
    rows = _q("events_retention")(spark, SF).collect()
    assert rows and all(r.week_offset >= 0 for r in rows)
    # every cohort has an offset-0 cell at least as big as any later cell
    zero = {r.cohort_week: r.n_users for r in rows if r.week_offset == 0}
    for r in rows:
        assert r.cohort_week in zero
        assert r.n_users <= zero[r.cohort_week]


def test_vwap_bounded_by_price_range(spark):
    from us_stock_data_pipeline_spark.catalog import load_table

    ev = load_table(spark, SF, "events")
    bounds = {
        (r.day, r.symbol): (r.lo, r.hi)
        for r in ev.groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day"),
            F.col("event_type").alias("symbol"),
        )
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in _q("bars_vwap_twap")(spark, SF).collect():
        lo, hi = bounds[(r.day, r.symbol)]
        assert lo - 1e-4 <= r.vwap <= hi + 1e-4
        assert lo - 1e-4 <= r.twap <= hi + 1e-4


def test_zscore_finite(spark):
    for r in _q("anomaly_rolling_zscore")(spark, SF).collect():
        assert r.zscore is not None and math.isfinite(r.zscore)


def test_entropy_bounds(spark):
    rows = _q("agg_entropy")(spark, SF).collect()
    assert rows
    for r in rows:
        # 5 event types -> entropy in [0, ln 5]
        assert -1e-9 <= r.entropy <= math.log(5) + 1e-9
        assert 1 <= r.n_types <= 5


def test_contamination_flags_real_overlap(spark):
    """The decontamination gate must fire on the fixture's genuine
    benchmark overlap (verified present in the data), not just produce
    zeros that would make the oracle row vacuous."""
    rows = _q("text_contamination_check")(spark, "/root/testdata/sf0.01").collect()
    assert any(r.contaminated for r in rows)
    assert all(r.doc_id >= 10 for r in rows)  # benchmark docs excluded


def test_unigram_cross_entropy_positive_and_finite(spark):
    rows = _q("text_unigram_logprob")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.cross_entropy > 0 and math.isfinite(r.cross_entropy)


def test_repetition_share_bounds(spark):
    rows = _q("text_repetition_ratio")(spark, SF).collect()
    for r in rows:
        assert 0 < r.top_trigram_share <= 1


def test_k_per_group_exact_and_deterministic(spark):
    rows = _q("sample_k_per_group")(spark, "/root/testdata/sf0.01").collect()
    per_group: dict[str, int] = {}
    for r in rows:
        per_group[r.event_type] = per_group.get(r.event_type, 0) + 1
    assert all(n == 50 for n in per_group.values())
    again = _q("sample_k_per_group")(spark, "/root/testdata/sf0.01").collect()
    assert {(r.event_type, r.event_id) for r in rows} == {
        (r.event_type, r.event_id) for r in again
    }


def test_mad_robust_bounds(spark):
    for r in _q("agg_mad_robust")(spark, SF).collect():
        assert r.mad >= 0 and r.n_outliers >= 0


def test_streaks_bounded_by_active_days(spark):
    from us_stock_data_pipeline_spark.catalog import load_table

    ev = load_table(spark, SF, "events")
    active = {
        r.user_id: r.n
        for r in ev.select("user_id", F.date_trunc("day", "ts").cast("date").alias("d"))
        .dropDuplicates()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in _q("events_activity_streaks")(spark, SF).collect():
        assert 1 <= r.longest_streak <= active[r.user_id]
        assert r.n_streaks >= 1


def test_volatility_consistency(spark):
    for r in _q("bars_volatility")(spark, SF).collect():
        assert r.daily_vol >= 0
        assert abs(r.annualized_vol - round(r.daily_vol * (252 ** 0.5), 1)) < 0.3
