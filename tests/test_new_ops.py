"""Tests for the relational3 / llm_ops2 / source_formats operators:
properties the DuckDB hash check can't see (recall on planted positives,
plan shape, format-connector interchangeability)."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _q(name):
    return registry.queries()[name]


def test_embedding_dedup_finds_planted_pairs(spark):
    """Every emitted pair must be a planted (vec_id, vec_id+1e6) couple —
    the fixture has no natural near-dups — and recall on planted pairs
    must be high (a shifted copy only escapes its bucket when the shift
    flips a hyperplane sign)."""
    rows = _q("dedup_embedding_cosine")(spark, SF).collect()
    assert rows, "no near-duplicate pairs found at all"
    for r in rows:
        assert r.vec_id_b == r.vec_id_a + 1_000_000
        assert r.cos_sim >= 0.98
    emb_n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    n_planted = len(range(0, emb_n, 20))
    assert len(rows) >= 0.7 * n_planted


def test_ivf_results_are_true_cosines(spark):
    """IVF neighbors must carry the exact cosine a brute-force pass would
    compute for the same (query, neighbor) pair."""
    ivf = {(r.query_id, r.neighbor_id): r.cos_sim for r in _q("ann_ivf_cosine")(spark, SF).collect()}
    assert ivf
    emb = {r.vec_id: r.embedding for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()}
    import math

    for (q, n), cs in ivf.items():
        a, b = emb[q], emb[n]
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        assert abs(cs - dot / (na * nb)) < 1e-3


def test_frame_sample_covers_every_doc_with_stride(spark):
    out = _q("multimodal_frame_sample")(spark, SF)
    rows = out.collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", F.length("text").alias("n")).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == len(docs)
    for d in docs:
        frames = sorted(by_doc[d.doc_id], key=lambda r: r.frame_idx)
        assert [f.frame_idx for f in frames] == list(range(0, -(-d.n // 16), 4))
        assert all(f.frame_len == 16 for f in frames[:-1])
        assert 1 <= frames[-1].frame_len <= 16


def test_source_formats_agree(spark):
    """JSON and CSV connectors must produce byte-identical rollups — the
    landing format is an implementation detail."""
    j = {tuple(r) for r in _q("source_json_scan")(spark, SF).collect()}
    c = {tuple(r) for r in _q("source_csv_scan")(spark, SF).collect()}
    assert j == c and len(j) > 0


def test_q3_broadcasts_filtered_customer(spark):
    plan = _q("q3_shipping_priority")(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_minmax_by_consistent_with_window(spark):
    """max_by answers must equal the row_number-window formulation."""
    from pyspark.sql import Window as W

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    agg = {r.o_custkey: (r.biggest_order, r.smallest_order) for r in _q("agg_minmax_by")(spark, SF).collect()}
    w_hi = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    hi = {
        r.o_custkey: r.o_orderkey
        for r in orders.withColumn("rn", F.row_number().over(w_hi)).filter("rn = 1").collect()
    }
    for ck, (big, _small) in agg.items():
        assert hi[ck] == big


def test_bucketed_join_has_no_shuffle(spark):
    """The whole point of join_bucketed_colocated: both exchanges elided."""
    df = _q("join_bucketed_colocated")(spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    # the join itself must read bucketed scans directly; the only allowed
    # exchange is the final single-partition sort/agg on 3 status rows
    joins = re.findall(r"SortMergeJoin|ShuffledHashJoin", plan)
    assert joins, "expected a shuffle-family join operator reading bucketed scans"
    pre_join = plan.split(joins[0])[-1]  # text BELOW the join node = its inputs
    assert "Exchange hashpartitioning" not in pre_join


def test_multigrain_rollup_consistent(spark):
    """day rows must equal the sum of their hour rows (cascade correctness)."""
    rows = _q("rollup_time_multigrain")(spark, SF).collect()
    import collections

    day_from_hours = collections.Counter()
    for r in rows:
        if r.grain == "hour":
            day_from_hours[(r.g_ts.date(), r.event_type)] += r.n_events
    for r in rows:
        if r.grain == "day":
            assert day_from_hours[(r.g_ts.date(), r.event_type)] == r.n_events
