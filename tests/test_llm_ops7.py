"""Round-5 operator tests (llm_ops7): plan-shape assertions for the
100 TB design claims plus semantic properties the oracle hash can't
express (sketch overcount bounds, weighted-sample bias direction,
quantization error bounds, PQ code validity)."""

from __future__ import annotations

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
# weighted reservoir
# --------------------------------------------------------------------------


def test_weighted_reservoir_is_take_ordered_not_full_sort(spark):
    """A-ES top-k must compile to TakeOrderedAndProject (per-partition
    heaps), never a global Sort — that's the whole distributed-sampler
    claim."""
    plan = _executed(spark, "sample_weighted_reservoir")
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan


def test_weighted_reservoir_biases_toward_heavy_weights(spark):
    """The selected 100 must have a higher mean weight than the corpus:
    P(select) increases with w under A-ES."""
    sel = _rows(spark, "sample_weighted_reservoir")
    sel_mean = sum(r["w"] for r in sel) / len(sel)
    corpus_mean = (
        load_table(spark, SF, "events").agg(F.avg("value")).first()[0]
    )
    assert sel_mean > corpus_mean


# --------------------------------------------------------------------------
# count-min sketch
# --------------------------------------------------------------------------


def test_cms_never_undercounts(spark):
    """CMS point estimates are one-sided: est >= true for every item."""
    for r in _rows(spark, "agg_count_min_sketch"):
        assert r["overcount"] >= 0, r
        assert r["est_cnt"] >= r["true_cnt"], r


def test_cms_probe_join_is_broadcast(spark):
    """The sketch (<= d*w cells) must broadcast to the probe side; the
    corpus aggregate must be a partial (two-phase) hash aggregate so
    only counter state crosses the exchange."""
    plan = _executed(spark, "agg_count_min_sketch")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------------
# last-touch attribution
# --------------------------------------------------------------------------


def test_attribution_single_user_shuffle(spark):
    """One hash exchange on user_id serves the window; the purchase
    filter happens above it map-side."""
    plan = _executed(spark, "events_attribution_last_touch")
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys == {"user_id"}, keys
    assert plan.count("Scan parquet") <= 2  # AQE may print the tree twice


def test_attribution_click_precedes_purchase(spark):
    for r in _rows(spark, "events_attribution_last_touch"):
        assert r["last_click_ts"] is not None
        assert r["mins_since_click"] >= 0


# --------------------------------------------------------------------------
# weighted median
# --------------------------------------------------------------------------


def test_weighted_median_single_shuffle_for_both_windows(spark):
    """Running weight and total weight share one l_returnflag exchange
    (same reuse contract as test_scd2_single_shuffle_for_both_windows)."""
    plan = _executed(spark, "agg_weighted_median")
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys == {"l_returnflag"}, keys


def test_weighted_median_between_min_max(spark):
    li = load_table(spark, SF, "lineitem")
    bounds = {
        r["l_returnflag"]: (r["lo"], r["hi"])
        for r in li.groupBy("l_returnflag")
        .agg(F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi"))
        .collect()
    }
    for r in _rows(spark, "agg_weighted_median"):
        lo, hi = bounds[r["l_returnflag"]]
        assert lo <= r["weighted_median"] <= hi


# --------------------------------------------------------------------------
# int8 quantization
# --------------------------------------------------------------------------


def test_quantize_stats_broadcast_back(spark):
    """The 64-row per-dim scale table must broadcast into the quantize
    pass — a shuffle of the exploded corpus against 64 rows would be the
    100 TB anti-plan."""
    plan = _executed(spark, "embedding_quantize_int8")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_quantize_error_bounded_by_half_step(spark):
    """Round-to-nearest: max abs reconstruction error <= scale/2 per
    dim, so max_abs_err_e3 <= 1000 * max_dim_range / 255 / 2."""
    emb = load_table(spark, SF, "embeddings")
    flat = emb.select(F.explode("embedding").alias("v"))
    vmin, vmax = flat.agg(F.min("v"), F.max("v")).first()
    half_step_e3 = 1000.0 * (float(vmax) - float(vmin)) / 255.0 / 2.0
    for r in _rows(spark, "embedding_quantize_int8"):
        assert r["max_abs_err_e3"] <= half_step_e3 + 1e-6, r


# --------------------------------------------------------------------------
# PQ ANN
# --------------------------------------------------------------------------


def test_pq_joins_all_broadcast_no_cartesian(spark):
    """Codebook and LUT are broadcast-sized at any corpus scale; the
    encode and score joins must both be broadcast hash joins."""
    plan = _executed(spark, "ann_pq_adc")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_pq_self_match_is_exact_zero_distance(spark):
    """A codebook vector's code must reconstruct itself exactly: vec 0
    is centroid 0 in every subspace, so querying with vec 0 (qid=0) must
    rank ONLY other vectors (self excluded) and every adist >= 0."""
    rows = _rows(spark, "ann_pq_adc")
    assert all(r["adist"] >= 0 for r in rows)
    qids = {r["qid"] for r in rows}
    assert all(r["vec_id"] != r["qid"] for r in rows)
    # 5 ranked neighbors per query, ranks exactly 1..5
    for q in qids:
        ranks = sorted(r["rnk"] for r in rows if r["qid"] == q)
        assert ranks == [1, 2, 3, 4, 5]


# --------------------------------------------------------------------------
# curriculum staging
# --------------------------------------------------------------------------


def test_curriculum_stages_partition_corpus(spark):
    """ntile(4) must cover every doc exactly once with near-equal stage
    sizes (|max - min| <= 1)."""
    rows = _rows(spark, "curriculum_difficulty_stages")
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    assert [r["stage"] for r in rows] == [1, 2, 3, 4]
