"""Streaming change-data-feed SOURCE (etl/cdf_stream.py): readStream
over the versioned table's commit log, with BATCH EQUIVALENCE as the
oracle — for every commit v, the stream's rows at _commit_version == v
must equal `read_changes(v-1, v)` exactly."""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.etl import versioned as V
from us_stock_data_pipeline_spark.etl.cdf_stream import register_cdf_source

DDL = "k long, band long, val long"


def _mk_table(spark, root):
    df = spark.createDataFrame(
        [(i, i % 2, i * 10) for i in range(8)], DDL
    )
    V.versioned_merge_upsert(spark, df, root, key_cols=("k",), partition_cols=("band",))
    # v2: rewrite band 0 (updates k=0,2,4,6) + insert a new key 100
    upd = spark.createDataFrame(
        [(0, 0, 1), (2, 0, 21), (100, 0, 900)], DDL
    ).union(spark.createDataFrame([(4, 0, 40), (6, 0, 60)], DDL))
    V.versioned_merge_upsert(spark, upd, root, key_cols=("k",), partition_cols=("band",))
    # v3: new partition band=7 (pure inserts)
    ins = spark.createDataFrame([(200, 7, 5), (201, 7, 6)], DDL)
    V.versioned_merge_upsert(spark, ins, root, key_cols=("k",), partition_cols=("band",))
    # v4: deletion-vector delete of two keys
    V.versioned_delete(
        spark, spark.createDataFrame([(1,), (200,)], "k long"), root, key_cols=("k",)
    )


def _run_stream(spark, root, starting=0):
    register_cdf_source(spark)
    sdf = (
        spark.readStream.format("versioned_cdf")
        .option("path", root)
        .option("keycols", "k")
        .option("tableschema", DDL)
        .option("startingversion", str(starting))
        .load()
    )
    name = f"cdf_sink_{uuid.uuid4().hex[:8]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


@pytest.fixture(scope="module")
def cdf(spark):
    root = tempfile.mkdtemp(prefix=f"us_sdps_cdf_{uuid.uuid4().hex[:8]}_")
    _mk_table(spark, root)
    out = _run_stream(spark, root).cache()
    out.count()
    yield root, out
    out.unpersist()
    shutil.rmtree(root, ignore_errors=True)


def _norm(df):
    return sorted(
        tuple(r) for r in df.select("k", "band", "val", "_change_type").collect()
    )


def test_batch_equivalence_per_commit(spark, cdf):
    root, out = cdf
    for v in (2, 3, 4):
        batch = V.read_changes(spark, root, v - 1, v, key_cols=("k",))
        stream_v = out.filter(F.col("_commit_version") == v)
        assert _norm(stream_v) == _norm(batch), f"commit {v} diverges"


def test_change_types_and_counts(spark, cdf):
    _, out = cdf
    counts = {
        (r._commit_version, r._change_type): r.n
        for r in out.groupBy("_commit_version", "_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # v2: k=0 updated (10->1), k=2 (20->21); k=4,6 rewritten UNCHANGED
    # (no change row); k=100 inserted
    assert counts[(2, "update_postimage")] == 2
    assert counts[(2, "insert")] == 1
    # v3: two inserts in the brand-new partition
    assert counts[(3, "insert")] == 2
    # v4: DV delete of k=1 and k=200
    assert counts[(4, "delete")] == 2
    # v1 (startingversion=0): the initial snapshot streams as inserts
    assert counts[(1, "insert")] == 8
    assert set(counts) == {
        (1, "insert"),
        (2, "update_postimage"),
        (2, "insert"),
        (3, "insert"),
        (4, "delete"),
    }


def test_starting_version_skips_earlier_commits(spark, cdf):
    root, _ = cdf
    out = _run_stream(spark, root, starting=2)
    vs = {r._commit_version for r in out.select("_commit_version").collect()}
    assert vs == {3, 4}


def test_initial_batch_streams_v1_as_inserts(spark, cdf):
    root, _ = cdf
    out = _run_stream(spark, root, starting=0)
    v1 = out.filter(F.col("_commit_version") == 1)
    assert v1.count() == 8
    assert {r._change_type for r in v1.collect()} == {"insert"}


def test_max_versions_per_trigger_paces_microbatches(spark):
    """maxversionspertrigger=1 must split the backlog into one
    microbatch per commit (Delta's maxFilesPerTrigger analog), with
    identical total output."""
    root = tempfile.mkdtemp(prefix=f"us_sdps_cdfpace_{uuid.uuid4().hex[:8]}_")
    try:
        _mk_table(spark, root)
        register_cdf_source(spark)
        sdf = (
            spark.readStream.format("versioned_cdf")
            .option("path", root)
            .option("keycols", "k")
            .option("tableschema", DDL)
            .option("startingversion", "1")
            .option("maxversionspertrigger", "1")
            .load()
        )
        name = f"cdf_paced_{uuid.uuid4().hex[:8]}"
        batches = []
        q = (
            sdf.writeStream.foreachBatch(
                lambda df, eid: batches.append(
                    {r._commit_version for r in df.select("_commit_version").collect()}
                )
            )
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            deadline = 120
            import time as _t

            t0 = _t.time()
            while _t.time() - t0 < deadline:
                if sum(len(b) for b in batches if b) >= 3:
                    break
                _t.sleep(1)
        finally:
            q.stop()
        nonempty = [b for b in batches if b]
        assert all(len(b) == 1 for b in nonempty), nonempty
        assert set().union(*nonempty) == {2, 3, 4}
        # versions arrive in order
        flat = [next(iter(b)) for b in nonempty]
        assert flat == sorted(flat)
    finally:
        shutil.rmtree(root, ignore_errors=True)
