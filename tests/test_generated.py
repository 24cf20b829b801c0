"""Generated columns (etl/generated.py + vcatalog integration):
computation on omitted columns, validation on supplied ones, rejection
of direct assignment, base-column UPDATE recompute with atomic
partition move, MERGE gate, and partition-filter derivation shapes."""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.etl import versioned as V
from us_stock_data_pipeline_spark.etl.generated import (
    apply_generated,
    derive_partition_filter,
    generation_bases,
    parse_generation_expr,
)
from us_stock_data_pipeline_spark.etl.vcatalog import (
    register_versioned,
    versioned_sql,
)


def _fresh_table(spark, name):
    root = tempfile.mkdtemp(prefix=f"us_sdps_gentest_{uuid.uuid4().hex[:8]}_")
    df = spark.createDataFrame(
        [(1, "2021-03-05 10:00:00", 100), (2, "2022-07-01 09:30:00", 200)],
        "k long, ts_s string, v long",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v")
    seeded = df.withColumn("ty", F.expr("YEAR(ts)"))
    V.versioned_merge_upsert(
        spark, seeded, root, key_cols=("k",), partition_cols=("ty",)
    )
    register_versioned(
        spark,
        name,
        root,
        key_cols=("k",),
        partition_cols=("ty",),
        generated_cols={"ty": "YEAR(ts)"},
    )
    return root


def test_parse_and_bases():
    assert parse_generation_expr("YEAR(ts)") == ("year", "ts")
    assert parse_generation_expr("month( ts )") == ("month", "ts")
    assert parse_generation_expr("CAST(ts AS DATE)") == ("date", "ts")
    with pytest.raises(ValueError, match="unsupported"):
        parse_generation_expr("ts + 1")
    assert generation_bases({"a": "YEAR(ts)", "b": "MONTH(t2)"}) == {
        "a": "ts",
        "b": "t2",
    }


def test_insert_computes_generated(spark):
    root = _fresh_table(spark, "gt_ins")
    try:
        spark.createDataFrame(
            [(3, "2023-01-02 00:00:00", 300)], "k long, ts_s string, v long"
        ).select(
            "k", F.col("ts_s").cast("timestamp").alias("ts"), "v"
        ).createOrReplaceTempView("gt_new")
        versioned_sql(spark, "INSERT INTO gt_ins SELECT * FROM gt_new")
        rows = {r.k: r for r in spark.table("gt_ins").collect()}
        assert rows[3].ty == 2023
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_supplied_value_validated(spark):
    df = spark.createDataFrame(
        [(1, "2021-03-05 10:00:00", 9999)], "k long, ts_s string, ty long"
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "ty")
    with pytest.raises(ValueError, match="violates"):
        apply_generated(df, {"ty": "YEAR(ts)"}, validate=True)
    ok = df.withColumn("ty", F.lit(2021))
    out = apply_generated(ok, {"ty": "YEAR(ts)"}, validate=True)
    assert out.collect()[0].ty == 2021


def test_update_base_recomputes_and_moves_partition(spark):
    root = _fresh_table(spark, "gt_upd")
    try:
        versioned_sql(
            spark,
            "UPDATE gt_upd SET ts = TIMESTAMP '2024-12-31 23:00:00' WHERE k = 1",
        )
        rows = {r.k: r for r in spark.table("gt_upd").collect()}
        assert rows[1].ty == 2024  # recomputed from the new base value
        assert len(rows) == 2  # no duplicate pre-image in ty=2021
        # the old partition is gone from the manifest (atomic move)
        ver = V.current_version(spark, root)
        parts = set(V.read_manifest(spark, root, ver))
        assert "ty=2021" not in parts and "ty=2024" in parts
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_update_generated_column_rejected(spark):
    root = _fresh_table(spark, "gt_rej")
    try:
        with pytest.raises(ValueError, match="generated column"):
            versioned_sql(spark, "UPDATE gt_rej SET ty = 1999 WHERE k = 1")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_merge_gate(spark):
    root = _fresh_table(spark, "gt_mrg")
    try:
        spark.table("gt_mrg").createOrReplaceTempView("gt_mrg_src")
        with pytest.raises(NotImplementedError, match="generated"):
            versioned_sql(
                spark,
                "MERGE INTO gt_mrg AS t USING gt_mrg_src AS s ON t.k = s.k "
                "WHEN MATCHED THEN UPDATE SET *",
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_derive_partition_filter_shapes():
    keep = derive_partition_filter(
        {"ty": "YEAR(ts)"}, "ts", "1997-01-01", "1999-01-01"
    )
    assert keep({"ty": "1997"}) and keep({"ty": "1999"})
    assert not keep({"ty": "1996"}) and not keep({"ty": "2000"})
    keep = derive_partition_filter(
        {"d": "CAST(ts AS DATE)"}, "ts", "2021-02-01", "2021-02-03"
    )
    assert keep({"d": "2021-02-01"}) and keep({"d": "2021-02-03"})
    assert not keep({"d": "2021-01-31"}) and not keep({"d": "2021-02-04"})
    keep = derive_partition_filter(
        {"m": "MONTH(ts)"}, "ts", "2021-11-15", "2022-02-10"
    )
    assert keep({"m": "11"}) and keep({"m": "1"}) and keep({"m": "2"})
    assert not keep({"m": "5"})
    # >= 1-year span covers every month value -> no month filter
    assert (
        derive_partition_filter({"m": "MONTH(ts)"}, "ts", "2021-01-01", "2022-06-01")
        is None
    )
    # unrelated base column -> no filter
    assert (
        derive_partition_filter({"ty": "YEAR(other)"}, "ts", "2021-01-01", "2022-01-01")
        is None
    )
