"""SHALLOW CLONE (etl/versioned.py shallow_clone + vcatalog SQL form):
zero-copy fork, time-travel pinning, two-way write isolation, carried
deletion vectors, vacuum protection of the source, and guards."""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.etl import versioned as V


def _mkroot():
    return tempfile.mkdtemp(prefix=f"us_sdps_clone_t_{uuid.uuid4().hex[:8]}_")


def _dst():
    return os.path.join(tempfile.gettempdir(), f"us_sdps_clone_d_{uuid.uuid4().hex[:8]}")


def _seed(spark, root, n=12):
    df = spark.createDataFrame(
        [(k, k % 3, k * 10) for k in range(n)], "k long, part long, val long"
    )
    return V.versioned_merge_upsert(
        spark, df, root, key_cols=("k",), partition_cols=("part",)
    )


def _n_parquet(root):
    return sum(
        1
        for _d, _dd, files in os.walk(root)
        for f in files
        if f.endswith(".parquet")
    )


def test_zero_copy_and_isolation(spark):
    src, dst = _mkroot(), _dst()
    try:
        _seed(spark, src)
        ver = V.shallow_clone(spark, src, dst)
        assert ver == 1
        assert _n_parquet(dst) == 0  # metadata only
        assert V.read_versioned(spark, dst).count() == 12
        # diverge: clone write invisible to source and vice versa
        V.versioned_merge_upsert(
            spark,
            spark.createDataFrame([(1, 1, 11111)], "k long, part long, val long"),
            dst,
            key_cols=("k",),
            partition_cols=("part",),
        )
        V.versioned_merge_upsert(
            spark,
            spark.createDataFrame([(2, 2, 22222)], "k long, part long, val long"),
            src,
            key_cols=("k",),
            partition_cols=("part",),
        )
        s = {r.k: r.val for r in V.read_versioned(spark, src).collect()}
        c = {r.k: r.val for r in V.read_versioned(spark, dst).collect()}
        assert s[1] == 10 and s[2] == 22222
        assert c[1] == 11111 and c[2] == 20
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(dst, ignore_errors=True)


def test_version_as_of_and_carried_dvs(spark):
    src, dst = _mkroot(), _dst()
    try:
        _seed(spark, src)
        # v2: DV-delete k in {0, 3}
        V.versioned_delete(
            spark,
            spark.createDataFrame([(0,), (3,)], "k long"),
            src,
            key_cols=("k",),
        )
        # v3: new row
        V.versioned_merge_upsert(
            spark,
            spark.createDataFrame([(99, 0, 990)], "k long, part long, val long"),
            src,
            key_cols=("k",),
            partition_cols=("part",),
        )
        as_of_2 = V.shallow_clone(spark, src, dst, version=2)
        assert as_of_2 == 2
        keys = {r.k for r in V.read_versioned(spark, dst).collect()}
        assert 99 not in keys  # post-clone commit invisible
        assert 0 not in keys and 3 not in keys  # carried DVs apply
        assert len(keys) == 10
        # a clone write re-inserting a tombstoned key must survive the
        # carried DV (the clone's dirs are numbered above its horizon)
        V.versioned_merge_upsert(
            spark,
            spark.createDataFrame([(0, 0, 7)], "k long, part long, val long"),
            dst,
            key_cols=("k",),
            partition_cols=("part",),
        )
        vals = {r.k: r.val for r in V.read_versioned(spark, dst).collect()}
        assert vals[0] == 7
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(dst, ignore_errors=True)


def test_vacuum_on_source_keeps_clone_alive(spark):
    src, dst = _mkroot(), _dst()
    try:
        _seed(spark, src)
        V.shallow_clone(spark, src, dst)
        # churn the source well past the clone version, then vacuum
        for i in range(3):
            V.versioned_merge_upsert(
                spark,
                spark.createDataFrame(
                    [(k, k % 3, 1000 + i) for k in range(12)],
                    "k long, part long, val long",
                ),
                src,
                key_cols=("k",),
                partition_cols=("part",),
            )
        V.vacuum_versions(spark, src, keep_last=1)
        assert V.read_versioned(spark, dst).count() == 12
        assert {r.val for r in V.read_versioned(spark, dst).collect()} == {
            k * 10 for k in range(12)
        }
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(dst, ignore_errors=True)


def test_clone_into_existing_table_rejected(spark):
    src, dst = _mkroot(), _mkroot()
    try:
        _seed(spark, src)
        _seed(spark, dst)
        with pytest.raises(FileExistsError, match="already has commits"):
            V.shallow_clone(spark, src, dst)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(dst, ignore_errors=True)
