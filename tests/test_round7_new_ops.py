"""Property tests for the round-7 operators: planted-recall for
exact-substring dedup, BLEU precision monotonicity, b-bit estimator
bias bounds, DPO margin readout sanity."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return registry.queries()[name](spark, SF).collect()


def test_exact_substring_finds_planted_reposts(spark):
    rows = {r["source"]: r for r in _run(spark, "dedup_exact_substring")}
    # every planted repost is a 120-char verbatim slice => all of its
    # 40-char windows are duplicated spans; the repost source must be hit
    assert "repost" in rows
    r = rows["repost"]
    assert r["n_docs_hit"] >= 1
    # a repost of a doc with >= 130 chars contributes 120-40+1 = 81
    # duplicated spans; shorter docs yield a shorter slice, so bound by
    # a conservative per-doc floor instead of the full 81
    assert r["n_dup_spans"] >= 40 * r["n_docs_hit"]


def test_bleu_precision_monotone_and_clipped(spark):
    rows = sorted(_run(spark, "ml_bleu_ngram_precision"), key=lambda r: r["n"])
    assert [r["n"] for r in rows] == [1, 2, 3, 4]
    # masking every 7th token: higher n intersects more masked positions,
    # so modified precision strictly decreases with n
    ps = [r["p_n"] for r in rows]
    assert ps[0] > ps[1] > ps[2] > ps[3] > 0
    for r in rows:
        assert 0 < r["num"] <= r["den"]
        assert r["cand_len"] == r["ref_len"]  # same tokenization, masked in place


def test_bbit_estimator_tracks_exact_jaccard(spark):
    rows = _run(spark, "dedup_minhash_b_bit")
    assert rows, "planted pairs must exist"
    for r in rows:
        assert 0 <= r["n_coll"] <= 30
        assert 0.0 <= r["jaccard_bbit"] <= 1.0
        assert 0.0 < r["jaccard_exact"] <= 1.0
    # estimator is unbiased in expectation; on 30 lanes per pair the
    # mean absolute error across planted pairs stays bounded
    errs = [abs(r["jaccard_bbit"] - r["jaccard_exact"]) for r in rows]
    assert sum(errs) / len(errs) < 0.35


def test_dpo_margin_readout_shapes(spark):
    rows = _run(spark, "rlhf_dpo_implicit_reward")
    assert rows
    for r in rows:
        assert r["n_pairs"] >= 1
        assert 0.0 <= r["dpo_accuracy"] <= 1.0
