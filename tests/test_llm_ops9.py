"""Round-5 batch-6 tests (llm_ops9)."""

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


def test_url_canonical_is_map_side_groupby(spark):
    plan = _executed(spark, "dedup_url_canonical")
    assert "Join" not in plan
    for r in _rows(spark, "dedup_url_canonical"):
        assert r["canonical_url"] == r["canonical_url"].lower()
        assert "?" not in r["canonical_url"]
        assert r["n_docs"] >= 2


def test_vocab_coverage_rates_partition_tokens(spark):
    rows = _rows(spark, "tokenizer_vocab_coverage")
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert 0.0 <= r["oov_rate"] <= 1.0
    # top-20 vocab over a ~30-term corpus: OOV must be partial, not all
    assert any(r["n_oov"] < r["n_tokens"] for r in rows)


def test_vocab_broadcast_into_token_stream(spark):
    plan = _executed(spark, "tokenizer_vocab_coverage")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_effective_dim_bounds(spark):
    """1 <= participation ratio <= n_dims, by Cauchy-Schwarz."""
    r = _rows(spark, "embedding_effective_dim")[0]
    assert r["n_dims"] == 64
    assert 1.0 <= r["effective_dim"] <= 64.0
    assert 0.0 < r["top_dim_share"] <= 1.0
    assert r["total_var"] > 0


def test_cdc_apply_partitions_keys(spark):
    r = _rows(spark, "etl_cdc_changelog_apply")[0]
    n_users = load_table(spark, SF, "events").select("user_id").distinct().count()
    assert r["n_keys"] == n_users
    assert r["n_live"] + r["n_tombstoned"] == r["n_keys"]


def test_cdc_single_key_shuffle(spark):
    plan = _executed(spark, "etl_cdc_changelog_apply")
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys == {"key"}, keys


def test_shard_manifest_conserves_docs_and_respects_budget(spark):
    rows = _rows(spark, "data_shard_manifest")
    docs = load_table(spark, SF, "documents")
    n_docs = docs.count()
    total_chars = docs.agg(F.sum("n_chars")).first()[0]
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["shard_chars"] for r in rows) == total_chars
    max_doc = docs.agg(F.max("n_chars")).first()[0]
    for r in rows:
        # first-fit-at-start: a shard exceeds budget by at most one doc
        assert r["shard_chars"] < 20_000 + max_doc
        assert r["shard_idx"] >= 0


def test_shard_window_is_source_partitioned_not_global(spark):
    """The running sum must partition by source — no SinglePartition
    exchange feeding the cumsum window."""
    plan = _executed(spark, "data_shard_manifest")
    final = plan.split("== Initial Plan ==")[0]
    assert "hashpartitioning(source" in final
