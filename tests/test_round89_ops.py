"""Round-89 tests: regression discontinuity, instrumental variables."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"

CUTOFF = 15_000_000
BAND = 5_000_000


def test_rd_matches_bruteforce(spark):
    (row,) = registry.queries()["causal_regression_discontinuity"](spark, SF).collect()
    o = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    pts = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count("l_orderkey").alias("y"))
        .select(
            (F.round(F.col("o_totalprice") * 100).cast("long") - CUTOFF).alias("x"), "y"
        )
        .collect()
    )
    sides = {0: [], 1: []}
    for r in pts:
        if -BAND <= r.x < BAND:
            sides[1 if r.x >= 0 else 0].append((r.x, r.y))

    def intercept(pp):
        n = len(pp)
        sx = sum(x for x, _ in pp)
        sy = sum(y for _, y in pp)
        sxx = sum(x * x for x, _ in pp)
        sxy = sum(x * y for x, y in pp)
        b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        return (sy - b * sx) / n

    a_lo, a_hi = intercept(sides[0]), intercept(sides[1])
    assert (row.n_below, row.n_above) == (len(sides[0]), len(sides[1]))
    assert row.intercept_below_micro == math.floor(a_lo * 1e6 + 0.5)
    assert row.intercept_above_micro == math.floor(a_hi * 1e6 + 0.5)
    assert row.rd_jump_micro == math.floor((a_hi - a_lo) * 1e6 + 0.5)
    # intercepts should be near the plausible lines-per-order range
    assert 0 < row.intercept_below_micro < 10_000_000
    assert 0 < row.intercept_above_micro < 10_000_000


def test_iv_matches_bruteforce(spark):
    (row,) = registry.queries()["causal_instrumental_wald"](spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        (F.col("l_partkey") % 2).cast("long").alias("z"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("x"),
        F.col("l_quantity").cast("long").alias("y"),
    ).collect()
    n = len(li)
    sz = sum(r.z for r in li)
    sx = sum(r.x for r in li)
    sy = sum(r.y for r in li)
    szx = sum(r.z * r.x for r in li)
    szy = sum(r.z * r.y for r in li)
    cov_zx = n * szx - sz * sx
    cov_zy = n * szy - sz * sy
    assert (row.n_rows, row.cov_zx_n2, row.cov_zy_n2) == (n, cov_zx, cov_zy)
    assert row.beta_iv_micro == math.floor(cov_zy / cov_zx * 1e6 + 0.5)
    # the Wald ratio also equals the group-mean difference ratio
    n1, n0 = sz, n - sz
    ex1 = sum(r.x for r in li if r.z) / n1
    ex0 = sum(r.x for r in li if not r.z) / n0
    ey1 = sum(r.y for r in li if r.z) / n1
    ey0 = sum(r.y for r in li if not r.z) / n0
    wald = (ey1 - ey0) / (ex1 - ex0)
    assert abs(row.beta_iv_micro - wald * 1e6) < 2  # same estimator, fp path differs
