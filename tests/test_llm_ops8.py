"""Round-5 batch-2 operator tests (llm_ops8): plan-shape and semantic
properties beyond the value-hash oracles."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.catalog import load_table

SF = "/root/testdata/sf0.001"


def _executed(spark, name):
    df = registry.queries()[name](spark, SF)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def _rows(spark, name):
    return registry.queries()[name](spark, SF).collect()


# --------------------------------------------------------------------------
# PageRank
# --------------------------------------------------------------------------


def test_pagerank_is_probability_like(spark):
    """Ranks positive, total mass <= 1 (dangling mass is dropped, never
    created), ranks exactly cover 25 nations with ranks 1..25."""
    rows = _rows(spark, "graph_pagerank_trade")
    assert len(rows) == 25
    assert sorted(r["rnk"] for r in rows) == list(range(1, 26))
    total = sum(r["pagerank"] for r in rows)
    # each rank rounds to 6 decimals, so the sum carries up to 25*5e-7
    assert 0.14 < total <= 1.0 + 25 * 5e-7  # >= teleport floor, <= full mass
    assert all(r["pagerank"] >= 0.15 / 25 - 1e-9 for r in rows)


def test_pagerank_no_cartesian_and_iterations_leave_facts_alone(spark):
    """The fact join happens once; iteration joins are broadcast-sized.
    No cartesian products anywhere in the executed plan."""
    plan = _executed(spark, "graph_pagerank_trade")
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------------
# Quality classifier
# --------------------------------------------------------------------------


def test_quality_classifier_is_map_side_scan(spark):
    """Inference must be pure expression work: no joins, only the
    groupBy-source exchange (plus the orderBy range exchange)."""
    plan = _executed(spark, "pipeline_quality_classifier")
    assert "Join" not in plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"source"}, keys


def test_quality_classifier_counts_consistent(spark):
    rows = _rows(spark, "pipeline_quality_classifier")
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert 0 <= r["n_pass"] <= r["n_docs"]
        assert 0.0 < r["avg_score"] < 1.0


# --------------------------------------------------------------------------
# Containment dedup
# --------------------------------------------------------------------------


def test_containment_bounds_and_asymmetry(spark):
    """0 < containment <= 1; n_shared can't exceed either side's shingle
    count (containment_a and _b both valid probabilities)."""
    rows = _rows(spark, "dedup_containment_ngram")
    assert rows, "rare-shingle blocking found no candidate pairs"
    for r in rows[:500]:
        assert 0.0 < r["containment_a"] <= 1.0
        assert 0.0 < r["containment_b"] <= 1.0
        assert r["doc_id_a"] < r["doc_id_b"]


def test_containment_no_cartesian(spark):
    plan = _executed(spark, "dedup_containment_ngram")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --------------------------------------------------------------------------
# A/B lift
# --------------------------------------------------------------------------


def test_ab_lift_partitions_users(spark):
    rows = _rows(spark, "events_ab_test_lift")
    assert len(rows) == 1
    r = rows[0]
    n_users = load_table(spark, SF, "events").select("user_id").distinct().count()
    assert r["n_a"] + r["n_b"] == n_users
    assert 0 <= r["conv_a"] <= r["n_a"]
    assert 0 <= r["conv_b"] <= r["n_b"]
    if r["z_score"] is not None:
        assert math.isfinite(r["z_score"])


# --------------------------------------------------------------------------
# Bigram LM
# --------------------------------------------------------------------------


def test_bigram_lm_logprobs_negative_and_counts_match(spark):
    """Smoothed log-probs are strictly negative; each doc contributes
    exactly len(words)-1 bigrams."""
    rows = {r["doc_id"]: r for r in _rows(spark, "text_bigram_lm")}
    docs = load_table(spark, SF, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("nw")
    )
    for d in docs.collect():
        r = rows[d["doc_id"]]
        assert r["n_bigrams"] == d["nw"] - 1
        assert r["avg_logp"] < 0


def test_bigram_lm_scoring_join_not_cartesian(spark):
    plan = _executed(spark, "text_bigram_lm")
    assert "CartesianProduct" not in plan
    # the 1-row vocab scalar may broadcast-nest; the count joins must not.
    # AQE prints Final + Initial trees — only count the final one.
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("BroadcastNestedLoopJoin") <= 1
