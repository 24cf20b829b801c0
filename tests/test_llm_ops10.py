"""Round-5 batch-10 tests (llm_ops10)."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _executed(spark, name):
    df = registry.queries()[name](spark, SF)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def _rows(spark, name):
    return registry.queries()[name](spark, SF).collect()


def test_audio_chunks_tile_duration_with_overlap(spark):
    """Chunks must start every 25s, end at min(start+30, duration), and
    cover the whole duration (last chunk reaches the end)."""
    rows = _rows(spark, "multimodal_audio_chunk_plan")
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            assert c["start_s"] == c["chunk_idx"] * 25
            assert c["end_s"] > c["start_s"]
            assert c["n_samples"] > 0
        # consecutive chunks overlap by 5s except possibly the tail
        for a, b in zip(chunks, chunks[1:]):
            assert b["start_s"] == a["start_s"] + 25


def test_audio_chunk_planning_is_metadata_only(spark):
    """The plan must never touch a payload column — only doc_id and
    n_chars reach the scan."""
    plan = _executed(spark, "multimodal_audio_chunk_plan")
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in read


def test_rake_scores_favor_connected_words(spark):
    rows = _rows(spark, "text_keyword_rake")
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r["w"] not in ("the", "a", "of", "and")
        assert r["rake_score"] >= 1.0  # (freq + deg)/freq >= 1
        assert r["degree"] >= 0
    scores = [r["rake_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_matryoshka_recall_bounds(spark):
    rows = _rows(spark, "embedding_matryoshka_recall")
    assert rows
    for r in rows:
        assert r["k"] == 5
        assert 0 <= r["overlap"] <= r["k"]
        assert 0.0 <= r["recall_at_k"] <= 1.0


def test_matryoshka_corpus_scored_once_broadcast_queries(spark):
    """The query set broadcasts; no cartesian of corpus x corpus."""
    plan = _executed(spark, "embedding_matryoshka_recall")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
