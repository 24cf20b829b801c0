"""Round-104 tests: Croston intermittent forecast, USING-join pin."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_croston_matches_bruteforce(spark):
    rows = registry.queries()["forecast_croston_intermittent"](spark, SF).collect()
    assert rows
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    demand = (
        li.filter(F.col("l_partkey") % 40 == 0)
        .join(o, o.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("l_partkey").alias("part"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
        .orderBy("part", "day")
        .collect()
    )
    per = defaultdict(list)
    for r in demand:
        per[r.part].append((r.day, r.q))
    expected = {}
    for part, seq in per.items():
        if len(seq) < 3:
            continue
        z = p = None
        prev = None
        for day, q in seq:
            gap = 0 if prev is None else (day - prev).days
            if z is None:
                z, p = q * 1000, 1000
            else:
                z = (q * 1000 + 4 * z) // 5
                p = (gap * 1000 + 4 * p) // 5
            prev = day
        expected[part] = (len(seq), z, p, z * 1_000_000 // p)
    assert len(rows) == len(expected)
    for r in rows:
        assert expected[r.partkey] == (
            r.n_demand_events, r.size_milli, r.interval_milli, r.rate_micro
        )
        assert r.interval_milli >= 1000  # intervals are >= 1 day on average... scaled
        assert r.rate_micro > 0


def test_using_join_key_never_null(spark):
    rows = registry.queries()["join_using_coalesced_keys"](spark, SF).collect()
    assert rows
    sides = {r.side for r in rows}
    # all three row classes must be present for the pin to bite
    assert sides == {"both", "cust_only", "supp_only"}
    for r in rows:
        assert r.k is not None  # the USING key coalesces
        if r.side == "cust_only":
            assert r.n_supp == 0 and r.n_cust > 0
        elif r.side == "supp_only":
            assert r.n_cust == 0 and r.n_supp > 0
        else:
            assert r.n_cust > 0 and r.n_supp > 0
        # key classes match the construction filters
        if r.side in ("both", "cust_only"):
            assert r.k % 2 == 0
        if r.side in ("both", "supp_only"):
            assert r.k % 3 == 0
