"""Round-81 tests: partial correlation, Little's law audit."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_partial_correlation_matches_bruteforce(spark):
    (row,) = registry.queries()["stats_partial_correlation"](spark, SF).collect()
    c = spark.read.parquet(f"{SF}/customer.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    per = {
        r.c_custkey: [round(r.c_acctbal * 100), 0, 0]
        for r in c.select("c_custkey", "c_acctbal").collect()
    }
    for r in o.select("o_custkey", "o_totalprice").collect():
        if r.o_custkey in per:
            per[r.o_custkey][1] += 1
            per[r.o_custkey][2] += round(r.o_totalprice * 100)
    pts = [(x, y, cents // 100) for x, y, cents in per.values()]
    n = len(pts)
    assert row.n_customers == n

    def pearson(ai, bi):
        sa = sum(p[ai] for p in pts)
        sb = sum(p[bi] for p in pts)
        sab = sum(p[ai] * p[bi] for p in pts)
        saa = sum(p[ai] * p[ai] for p in pts)
        sbb = sum(p[bi] * p[bi] for p in pts)
        return (sab - sa * sb / n) / math.sqrt(
            (saa - sa * sa / n) * (sbb - sb * sb / n)
        )

    rxy, rxz, ryz = pearson(0, 1), pearson(0, 2), pearson(1, 2)
    assert row.r_xy_micro == math.floor(rxy * 1e6 + 0.5)
    assert row.r_xz_micro == math.floor(rxz * 1e6 + 0.5)
    assert row.r_yz_micro == math.floor(ryz * 1e6 + 0.5)
    part = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
    assert row.r_xy_given_z_micro == math.floor(part * 1e6 + 0.5)
    # controlling for spend should weaken the balance-orders link
    assert abs(row.r_xy_given_z_micro) <= 1_000_000


def test_littles_law_identity_holds(spark):
    (row,) = registry.queries()["events_littles_law_audit"](spark, SF).collect()
    # the whole point: sweep-line occupancy == direct duration sum
    assert row.identity_delta == 0
    assert row.l_sweep_micro == row.l_direct_micro
    assert row.n_jobs > 0 and row.t_days > 0


def test_littles_law_matches_bruteforce(spark):
    (row,) = registry.queries()["events_littles_law_audit"](spark, SF).collect()
    o = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    jobs = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("dep"))
        .select(F.col("o_orderdate").alias("arr"), "dep")
        .collect()
    )
    durs = [(r.dep - r.arr).days for r in jobs]
    t = (max(r.dep for r in jobs) - min(r.arr for r in jobs)).days
    assert row.n_jobs == len(jobs)
    assert row.t_days == t
    assert row.dur_sum == sum(durs)
    assert row.l_direct_micro == sum(durs) * 1_000_000 // t
