"""Property tests for the llm_ops6 operators (round 3): invariants the
DuckDB value-hash check can't express — redaction completeness, packing
feasibility, Bloom guarantees, batch-shape bounds."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.queries.llm_ops6 import _BATCH_SIZE, _PACK_BUDGET

SF = "/root/testdata/sf0.001"


def _q(name):
    return registry.queries()[name]


def test_pii_redact_counts_and_masks(spark):
    """Planted docs (doc_id % 5 == 0) must detect >=1 email and >=1 phone;
    unplanted word-salad docs must detect none, and their redacted hash
    must equal the plain text hash (redaction is a no-op without PII)."""
    rows = _q("pii_redact")(spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        if r.doc_id % 5 == 0:
            assert r.n_emails >= 1 and r.n_phones >= 1
        else:
            assert r.n_emails == 0 and r.n_phones == 0


def test_bpe_pairs_ranked_and_wellformed(spark):
    rows = _q("bpe_pair_counts")(spark, SF).collect()
    assert [r.rnk for r in rows] == list(range(1, 41))
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    assert all(len(r.pair) == 2 and r.pair.islower() for r in rows)
    assert all(r.cnt > 0 for r in rows)


def test_mixture_sample_respects_rates(spark):
    """Kept counts must be <= available, rates in (0, 1], and the realized
    keep fraction within a loose band of the target rate (the Weyl
    uniform is equidistributed, not exact)."""
    rows = _q("corpus_mixture_sample")(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r.rate <= 1.0
        assert 0 <= r.n_kept <= r.n_docs
        expected = r.rate * r.n_docs
        assert abs(r.n_kept - expected) <= max(5, 0.5 * expected)


def test_greedy_pack_never_overflows(spark):
    """Greedy first-fit guarantee: a bin only exceeds the budget when a
    single oversized doc occupies it alone."""
    rows = _q("pack_greedy_exact")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.bin_tokens <= _PACK_BUDGET or r.n_docs == 1
    # bin ids contiguous from 0 within each (source, shard) pack group
    by_grp = {}
    for r in rows:
        by_grp.setdefault((r.source, r.shard), []).append(r.bin_id)
    for ids in by_grp.values():
        assert sorted(ids) == list(range(len(ids)))


def test_pack_shard_key_bounds_group_size(spark):
    """The 100 TB claim behind the (source, shard) pack key: no
    applyInPandas group — hence no single Arrow batch — ever exceeds
    ceil(|source| / _PACK_SHARDS) rows, for every source in the fixture
    (each source is one forced multi-shard population)."""
    from pyspark.sql import functions as F

    from us_stock_data_pipeline_spark.catalog import load_table
    from us_stock_data_pipeline_spark.queries.llm_ops6 import _PACK_SHARDS, _SHARD_EXPR

    docs = load_table(spark, SF, "documents")
    src_sizes = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    grp_sizes = (
        docs.groupBy("source", F.expr(_SHARD_EXPR).alias("shard"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len({r.shard for r in grp_sizes}) == _PACK_SHARDS  # all shards hit
    for r in grp_sizes:
        bound = -(-src_sizes[r.source] // _PACK_SHARDS)  # ceil
        # the multiplicative hash is near-uniform, not exact; small slack
        assert r.n <= bound + 2, (r.source, r.shard, r.n, bound)
    # and the packed output must carry the same shard fan-out
    packed = _q("pack_greedy_exact")(spark, SF).collect()
    assert {r.shard for r in packed} == set(range(_PACK_SHARDS))


def test_bloom_witnesses_hold(spark):
    row = _q("bloom_semijoin")(spark, SF).collect()[0]
    assert row.no_false_negatives is True
    assert row.fp_rate_ok is True
    assert 0 < row.n_member_exact < row.n_probed


def test_batch_padding_shapes(spark):
    rows = _q("batch_padding_builder")(spark, SF).collect()
    assert rows
    by_grp = {}
    for r in rows:
        assert 1 <= r.n_docs <= _BATCH_SIZE
        assert r.pad_tokens >= 0
        assert r.max_tok >= 1
        by_grp.setdefault((r.source, r.shard), []).append(r)
    for batches in by_grp.values():
        # only the final (remainder) batch of each sort shard may be short
        assert all(b.n_docs == _BATCH_SIZE for b in batches[:-1])


def test_heavy_hitters_ranked(spark):
    rows = _q("skew_heavy_hitters")(spark, SF).collect()
    assert [r.rnk for r in rows] == list(range(1, 16))
    counts = [r.n_events for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(0 < r.share < 1 for r in rows)
