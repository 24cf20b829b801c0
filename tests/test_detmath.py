"""Bit-identity and accuracy tests for the libm-free detmath kernels.

The whole point of detmath is that Spark SQL and DuckDB produce the SAME
DOUBLE BITS for the same expression text — so quantized (hashed) outputs
built on it can never flip on a driver host with a different libm/DuckDB.
These tests assert bit identity via float.hex(), not approximate equality.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from us_stock_data_pipeline_spark.functions import detmath


def _duck(stages, src, out_col):
    con = duckdb.connect()
    sql = detmath.stages_to_select(stages, src)
    return sorted(con.execute(f"SELECT x, {out_col} FROM {sql}").fetchall())


def _spark(spark, stages, df, out_col):
    sdf = detmath.apply_stages(df, stages)
    return sorted((r["x"], r[out_col]) for r in sdf.select("x", out_col).collect())


@pytest.mark.parametrize(
    "name,stages,ref",
    [
        ("ln_int", detmath.det_ln_int_stages("x", "o"), math.log),
    ],
)
def test_ln_int_bit_identity_and_accuracy(spark, name, stages, ref):
    duck = _duck(stages, "(SELECT unnest(range(1, 4001)) AS x)", "o")
    sp = _spark(spark, stages, spark.range(1, 4001).selectExpr("id AS x"), "o")
    assert [(x, v.hex()) for x, v in duck] == [(x, v.hex()) for x, v in sp]
    assert max(abs(v - ref(x)) for x, v in duck) < 1e-10


@pytest.mark.parametrize(
    "stages,ref,lo,hi,scale",
    [
        (detmath.det_exp_stages("x", "o"), math.exp, -410, 411, 10.0),
        (detmath.det_sin_stages("x", "o"), math.sin, -6283, 6284, 1000.0),
        (detmath.det_cos_stages("x", "o"), math.cos, -6283, 6284, 1000.0),
        (detmath.det_atan_stages("x", "o"), math.atan, -5000, 5001, 100.0),
        (detmath.det_ln_pos_stages("x", "o"), math.log, 1, 20000, 1000.0),
    ],
)
def test_double_kernels_bit_identity(spark, stages, ref, lo, hi, scale):
    duck = _duck(stages, f"(SELECT unnest(range({lo}, {hi})) / {scale} AS x)", "o")
    df = spark.range(lo, hi).selectExpr(f"id / {scale} AS x")
    sp = _spark(spark, stages, df, "o")
    assert len(duck) == len(sp)
    for (xd, vd), (xs, vs) in zip(duck, sp):
        assert vd.hex() == vs.hex(), f"x={xd}: duck={vd!r} spark={vs!r}"
    # semantic accuracy: absolute for bounded outputs, relative for exp
    for x, v in duck:
        expect = ref(x)
        tol = max(1e-12, abs(expect) * 1e-12)
        assert abs(v - expect) <= tol, f"x={x}: {v} vs {expect}"


def test_atan2_quadrants(spark):
    pts = [(-2.0, -0.5), (-0.5, 0.0), (0.0, 0.0), (0.5, 2.0), (3.0, -1.0), (-3.0, -1.0)]
    stages = detmath.det_atan2_stages("y", "x", "o")
    con = duckdb.connect()
    vals = ", ".join(f"({y}, {x})" for y, x in pts)
    sql = detmath.stages_to_select(stages, f"(SELECT * FROM (VALUES {vals}) AS t(y, x))")
    duck = con.execute(f"SELECT y, x, o FROM {sql}").fetchall()
    df = spark.createDataFrame(pts, "y double, x double")
    sp = {(r["y"], r["x"]): r["o"] for r in detmath.apply_stages(df, stages).collect()}
    for y, x, v in duck:
        assert abs(v - math.atan2(y, x)) < 1e-12
        assert sp[(y, x)].hex() == v.hex()


def test_ln_pos_wide_domain():
    con = duckdb.connect()
    stages = detmath.det_ln_pos_stages("x", "o")
    sql = detmath.stages_to_select(
        stages, "(SELECT power(10.0, unnest(range(-15, 18))) AS x)"
    )
    for x, v in con.execute(f"SELECT x, o FROM {sql}").fetchall():
        if x != 1.0:
            assert abs(v - math.log(x)) / abs(math.log(x)) < 1e-12
