"""Round-24 tests: BM25, Stupid Backoff, negative sampling, Shapley,
conformal prediction."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_bm25_top_docs_contain_query_terms(spark):
    from us_stock_data_pipeline_spark.queries.llm_ops27 import _BM25_QUERY

    rows = registry.queries()["text_bm25_scoring"](spark, SF).collect()
    assert rows
    scores = [r.bm25_e6 for r in rows]
    assert scores == sorted(scores, reverse=True)
    docs = {
        d.doc_id: d.text
        for d in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    for r in rows[:10]:
        assert any(q in docs[r.doc_id].split() for q in _BM25_QUERY)


def test_stupid_backoff_score_bounds(spark):
    rows = registry.queries()["text_stupid_backoff"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r.seen_score_e6 <= 1_000_000  # c2/c1 <= 1
        assert 0 <= r.backoff_score_e6 < 400_000  # alpha * unigram prob


def test_negative_samples_cross_source_and_k_per_anchor(spark):
    from us_stock_data_pipeline_spark.queries.llm_ops27 import _NEG_K

    rows = registry.queries()["contrastive_negative_sampling"](spark, SF).collect()
    docs = {
        d.doc_id: d.source
        for d in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    from collections import Counter

    per_anchor = Counter(r.anchor_id for r in rows)
    assert set(per_anchor.values()) == {_NEG_K}
    for r in rows:
        assert docs[r.negative_id] != docs[r.anchor_id]
        assert r.neg_source == docs[r.negative_id]


def test_shapley_efficiency_axiom(spark):
    """Sum of Shapley values == v(grand coalition) - v(empty) exactly
    (in numerator units: sum of numerators == 24 * total)."""
    rows = registry.queries()["events_shapley_attribution"](spark, SF).collect()
    assert len(rows) == 4
    ev = spark.read.parquet(f"{SF}/events.parquet")
    users = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("c")
    )
    total_conversions = users.agg(F.sum("c")).collect()[0][0]
    # v(empty) = conversions of users with NO channel touches
    touched = ev.filter(F.col("event_type") != "purchase").select("user_id").distinct()
    untouched_conv = (
        users.join(touched, "user_id", "anti").agg(F.sum("c")).collect()[0][0] or 0
    )
    assert sum(r.shapley_num for r in rows) == 24 * (total_conversions - untouched_conv)


def test_conformal_coverage_at_least_nominal(spark):
    rows = registry.queries()["ml_conformal_prediction"](spark, SF).collect()
    assert rows
    n = sum(r.n_test for r in rows)
    cov = sum(r.n_covered for r in rows)
    # finite-sample guarantee is >= 1 - alpha in expectation; allow
    # slack for the small fixture but demand it is clearly high
    assert cov / n >= 0.8, (cov, n)
    assert len({r.qhat_cents for r in rows}) == 1  # global quantile
