"""Round-5 batch-11 tests (SFT masks + RLHF pairs)."""

from __future__ import annotations

import re

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _executed(spark, name):
    df = registry.queries()[name](spark, SF)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def _rows(spark, name):
    return registry.queries()[name](spark, SF).collect()


def test_sft_spans_well_formed(spark):
    for r in _rows(spark, "sft_loss_mask_spans"):
        assert 0 < r["mask_start_token"] < r["mask_end_token"]
        assert 0.0 < r["loss_fraction"] < 1.0
        assert r["prompt_chars"] > 0 and r["completion_chars"] > 0


def test_sft_is_map_side_only(spark):
    plan = _executed(spark, "sft_loss_mask_spans")
    assert "Join" not in plan
    keys = re.findall(r"Exchange hashpartitioning", plan)
    assert not keys  # only the orderBy range exchange


def test_rlhf_pairs_have_positive_margin_and_distinct_docs(spark):
    rows = _rows(spark, "rlhf_preference_pairs")
    assert rows
    per_source = {}
    for r in rows:
        assert r["chosen_doc_id"] != r["rejected_doc_id"]
        assert r["margin"] >= 0  # chosen quality >= rejected by construction
        assert r["chosen_quality"] >= r["rejected_quality"]
        per_source.setdefault(r["source"], 0)
        per_source[r["source"]] += 1
    assert all(n <= 3 for n in per_source.values())


def test_rlhf_rankings_share_one_source_exchange(spark):
    plan = _executed(spark, "rlhf_preference_pairs")
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys == {"source"}, keys
    assert "WindowGroupLimit" in plan  # top/bottom-k pruned below shuffle
