"""Round-87 tests: Fisher-z correlation CI, safety stock / ROP."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_fisher_z_matches_bruteforce(spark):
    rows = registry.queries()["stats_fisher_z_corr_ci"](spark, SF).collect()
    assert rows
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("y"),
    ).collect()
    per = defaultdict(list)
    for r in li:
        per[r.grp].append((r.x, r.y))
    for r in rows:
        pts = per[r.grp]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        syy = sum(y * y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        rv = (sxy - sx * sy / n) / math.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
        zv = 0.5 * math.log((1 + rv) / (1 - rv))
        hw = 1.96 / math.sqrt(n - 3)

        def tanh_like(z):
            e = math.exp(2 * z)
            return (e - 1) / (e + 1)

        assert r.n_rows == n
        assert r.r_micro == math.floor(rv * 1e6 + 0.5)
        assert r.ci_lo_micro == math.floor(tanh_like(zv - hw) * 1e6 + 0.5)
        assert r.ci_hi_micro == math.floor(tanh_like(zv + hw) * 1e6 + 0.5)
        # interval brackets the point estimate and stays in (-1, 1)
        assert -1_000_000 < r.ci_lo_micro <= r.r_micro <= r.ci_hi_micro < 1_000_000


def test_safety_stock_matches_bruteforce(spark):
    rows = registry.queries()["orders_safety_stock_rop"](spark, SF).collect()
    assert rows
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    s = spark.read.parquet(f"{SF}/supplier.parquet")
    n = spark.read.parquet(f"{SF}/nation.parquet")
    daily = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("l_shipdate").alias("day"))
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
        .collect()
    )
    per = defaultdict(list)
    for r in daily:
        per[r.nation].append(r.qty)
    for r in rows:
        qs = per[r.nation]
        nd, sq, sqq = len(qs), sum(qs), sum(q * q for q in qs)
        lead = math.floor(sq / nd * 7 + 0.5)
        ss = math.floor(1.645 * math.sqrt(7.0) * math.sqrt(nd * sqq - sq * sq) / nd + 0.5)
        assert (r.n_days, r.total_qty) == (nd, sq)
        assert r.lead_demand == lead
        assert r.safety_stock == ss
        assert r.reorder_point == lead + ss
        assert r.safety_stock >= 0
