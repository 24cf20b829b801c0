"""Per-file Bloom key index for the versioned table (versioned.py
round 13): harvest at merge (Spark md5/conv SQL), manifest storage
inside the per-file stats entries, point-lookup pruning via
read_versioned(key_filter=...) / plan_snapshot_files, carry across
other commit types, and the no-false-negative guarantee."""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.etl import versioned as V


@pytest.fixture()
def table(spark):
    root = tempfile.mkdtemp(prefix=f"us_sdps_bloom_{uuid.uuid4().hex[:8]}_")
    df = spark.createDataFrame(
        [(i, i % 8, i * 10, f"n{i}") for i in range(4000)],
        "k long, band long, val long, name string",
    )
    V.versioned_merge_upsert(
        spark, df, root, key_cols=("k",), partition_cols=("band",),
        bloom_cols=("k", "name"),
    )
    yield root
    shutil.rmtree(root, ignore_errors=True)


def test_point_lookup_prunes_files(spark, table):
    kept, skipped = V.plan_snapshot_files(spark, table, key_filter={"k": [5]})
    assert sum(len(v) for v in kept.values()) <= 2
    assert len(skipped) >= 6  # 8 per-band files, only k=5's band survives
    snap = V.read_versioned(spark, table, key_filter={"k": [5]})
    rows = snap.filter(F.col("k") == 5).collect()
    assert len(rows) == 1 and rows[0].val == 50


def test_string_column_bloom(spark, table):
    kept, skipped = V.plan_snapshot_files(
        spark, table, key_filter={"name": ["n77"]}
    )
    assert len(skipped) >= 6
    snap = V.read_versioned(spark, table, key_filter={"name": ["n77"]})
    assert snap.filter(F.col("name") == "n77").first().k == 77


def test_no_false_negatives_exhaustive(spark, table):
    """The correctness contract: a file CONTAINING the key is never
    pruned — every key must remain findable through its own filter."""
    import random

    random.seed(3)
    for k in random.sample(range(4000), 40):
        snap = V.read_versioned(spark, table, key_filter={"k": [k]})
        assert snap.filter(F.col("k") == k).count() == 1, k


def test_multi_value_probe_keeps_union(spark, table):
    snap = V.read_versioned(spark, table, key_filter={"k": [5, 1000, 3999]})
    got = {r.k: r.val for r in snap.filter(F.col("k").isin(5, 1000, 3999)).collect()}
    assert got == {5: 50, 1000: 10000, 3999: 39990}


def test_carries_across_dv_and_later_merges(spark, table):
    V.versioned_delete(
        spark, spark.createDataFrame([(7,)], "k long"), table, key_cols=("k",)
    )
    _k, skipped = V.plan_snapshot_files(spark, table, key_filter={"k": [5]})
    assert len(skipped) >= 6
    # a later merge WITHOUT bloom_cols re-harvests (cols ride the manifest)
    upd = spark.createDataFrame([(2, 2, 999, "n2")], "k long, band long, val long, name string")
    V.versioned_merge_upsert(
        spark, upd, table, key_cols=("k",), partition_cols=("band",)
    )
    snap = V.read_versioned(spark, table, key_filter={"k": [2]})
    assert snap.filter(F.col("k") == 2).first().val == 999
    _k2, skipped2 = V.plan_snapshot_files(spark, table, key_filter={"k": [2]})
    assert len(skipped2) >= 6


def test_filters_compose_with_zone_maps(spark):
    root = tempfile.mkdtemp(prefix=f"us_sdps_bloomzm_{uuid.uuid4().hex[:8]}_")
    try:
        df = spark.createDataFrame(
            [(i, i % 4, i) for i in range(1000)], "k long, band long, day long"
        )
        V.versioned_merge_upsert(
            spark, df, root, key_cols=("k",), partition_cols=("band",),
            stats_cols=("day",), bloom_cols=("k",),
        )
        # zone map alone prunes nothing (every band spans all days %4);
        # bloom + range together still return the right row
        snap = V.read_versioned(
            spark, root, stat_filter={"day": (100, 200)}, key_filter={"k": [150]}
        )
        assert snap.filter(F.col("k") == 150).first().day == 150
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_missing_bloom_keeps_file(spark):
    root = tempfile.mkdtemp(prefix=f"us_sdps_bloomnone_{uuid.uuid4().hex[:8]}_")
    try:
        df = spark.createDataFrame([(1, 0, 10)], "k long, band long, val long")
        V.versioned_merge_upsert(
            spark, df, root, key_cols=("k",), partition_cols=("band",),
            stats_cols=("val",),  # stats but NO bloom
        )
        snap = V.read_versioned(spark, root, key_filter={"k": [1]})
        assert snap.count() == 1  # no bloom recorded -> never pruned
    finally:
        shutil.rmtree(root, ignore_errors=True)
