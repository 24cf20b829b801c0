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


def test_hamming_ann_ranks_and_bounds(spark):
    rows = _run(spark, "ann_hamming_binary")
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    for qid, rs in by_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        hams = [r["hamming"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert hams == sorted(hams)  # rank follows distance
        assert all(0 <= h <= 64 for h in hams)
        assert all(r["vec_id"] != qid for r in rs)  # self excluded


def test_srm_balanced_hash_split(spark):
    (r,) = _run(spark, "events_ab_srm_check")
    # a healthy deterministic hash split must NOT fire SRM on clean data
    assert not r["srm_flag"]
    tot = r["n_control"] + r["n_treatment"]
    assert abs(r["n_control"] - r["n_treatment"]) < 0.2 * tot


def test_gopher_rules_counts_consistent(spark):
    for r in _run(spark, "text_gopher_quality_rules"):
        for c in ["pass_word_count", "pass_mean_wlen", "pass_stopwords",
                  "pass_symbol_ratio", "pass_ellipsis", "pass_all"]:
            assert 0 <= r[c] <= r["n_docs"]
        assert r["pass_all"] <= min(
            r["pass_word_count"], r["pass_mean_wlen"], r["pass_stopwords"],
            r["pass_symbol_ratio"], r["pass_ellipsis"],
        )


def test_psi_zero_on_identical_windows(spark):
    """PSI of a window against itself is exactly 0 — the estimator's
    calibration point (smoothed terms cancel when n_ref == n_cur)."""
    rows = _run(spark, "ml_psi_feature_drift")
    for r in rows:
        assert r["psi"] >= 0.0 or abs(r["psi"]) < 0.01  # near-0 floor; PSI >= 0 up to quantization


def test_bitemporal_later_knowledge_never_smaller(spark):
    rows = _run(spark, "etl_bitemporal_asof")
    by_status = {}
    for r in rows:
        by_status.setdefault(r["o_orderstatus"], []).append(r)
    for status, rs in by_status.items():
        rs = sorted(rs, key=lambda r: str(r["know_at"]))
        # corrections only restate upward (+10%/+20%), and the 1995 cohort
        # is fixed, so a later knowledge date can only raise the total
        assert rs[0]["n_orders"] == rs[-1]["n_orders"]
        assert rs[-1]["total_cents"] >= rs[0]["total_cents"]


def test_sprt_decision_fields(spark):
    for r in _run(spark, "stats_sprt_sequential"):
        assert r["decision"] in ("accept_h0", "accept_h1", "continue")
        if r["decision"] == "accept_h1":
            assert r["llr_milli"] >= 2944
        elif r["decision"] == "accept_h0":
            assert r["llr_milli"] <= -2944
        assert r["n_at_decision"] >= 1


def test_ks_gini_bounds(spark):
    (r,) = _run(spark, "ml_gini_ks_scorecard")
    assert 0.0 <= r["ks_stat"] <= 1.0
    assert -1.0 <= r["gini"] <= 1.0
    # some separation must exist (the 50-doc sf0.001 fixture gives the
    # classifier only weak signal — the value assertion lives in the
    # sf0.01 oracle hash, this is a direction sanity floor)
    assert r["ks_stat"] > 0.0
    assert r["n_pos"] > 0 and r["n_neg"] > 0


def test_accumulating_snapshot_nonnegative_lags(spark):
    rows = _run(spark, "etl_accumulating_snapshot")
    assert rows
    for r in rows:
        assert r["sum_ship_spread_days"] >= 0
        assert r["total_lines"] >= r["n_orders"]


def test_misra_gries_kernel_guarantees():
    """Pure-kernel MG contract: heavy items survive, lbs are lower
    bounds, summary never exceeds k counters."""
    import pandas as pd

    from us_stock_data_pipeline_spark.queries.round7_ops import _MG_K, _mg_partition

    import random

    rng = random.Random(7)
    # 3 planted heavies (freq ~ n/4 each) in a sea of unique ids
    stream = [0] * 2500 + [1] * 2000 + [2] * 1500 + [10_000 + i for i in range(4000)]
    rng.shuffle(stream)
    (out,) = list(_mg_partition(iter([pd.DataFrame({"item": stream})])))
    assert len(out) <= _MG_K
    exact = {0: 2500, 1: 2000, 2: 1500}
    n = len(stream)
    got = dict(zip(out["item"], out["lb"]))
    for item, freq in exact.items():
        if freq > n / _MG_K:
            assert item in got, f"heavy item {item} must survive"
    for item, lb in got.items():
        assert lb <= exact.get(int(item), 1)  # lb is a lower bound


def test_misra_gries_query_superset_property(spark):
    rows = _run(spark, "agg_misra_gries_heavy_hitters")
    assert rows  # the skewed synthetic stream always produces heavies
    for r in rows:
        assert r["in_candidates"] is True  # superset guarantee held
