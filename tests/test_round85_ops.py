"""Round-85 tests: Vortex indicator, Bhattacharyya distance."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_vortex_matches_bruteforce(spark):
    rows = registry.queries()["bars_vortex_indicator"](spark, SF).collect()
    assert rows
    ev = spark.read.parquet(f"{SF}/events.parquet")
    bars = (
        ev.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(
            F.round(F.max("value") * 100).cast("long").alias("h"),
            F.round(F.min("value") * 100).cast("long").alias("l"),
            F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"),
        )
        .orderBy("symbol", "day")
        .collect()
    )
    seqs = defaultdict(list)
    for r in bars:
        seqs[r.symbol].append((r.day, r.h, r.l, r.c))
    N = 14
    expected = {}
    for sym, seq in seqs.items():
        vp, vm, tr = [], [], []
        for (d0, h0, l0, c0), (d1, h1, l1, c1) in zip(seq, seq[1:]):
            vp.append(abs(h1 - l0))
            vm.append(abs(l1 - h0))
            tr.append(max(h1 - l1, abs(h1 - c0), abs(l1 - c0)))
        # bar index i (0-based in seq) corresponds to vp[i-1]
        for i in range(N, len(seq)):
            svp = sum(vp[max(0, i - N): i])
            svm = sum(vm[max(0, i - N): i])
            st = sum(tr[max(0, i - N): i])
            expected[(sym, seq[i][0])] = (
                svp, svm, st, svp * 10000 // st, svm * 10000 // st
            )
    assert len(rows) == len(expected)
    for r in rows:
        assert expected[(r.symbol, r.day)] == (
            r.vm_plus_sum, r.vm_minus_sum, r.tr_sum, r.vi_plus_bp, r.vi_minus_bp
        )


def test_bhattacharyya_matches_bruteforce(spark):
    rows = registry.queries()["stats_bhattacharyya_distance"](spark, SF).collect()
    assert len(rows) == 10  # C(5,2) segment pairs
    c = spark.read.parquet(f"{SF}/customer.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    joined = (
        c.join(o, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("seg"),
            (F.round(F.col("o_totalprice") * 100).cast("long") / 5_000_000)
            .cast("long")
            .alias("bin"),
        )
        .collect()
    )
    hist = defaultdict(lambda: defaultdict(int))
    for r in joined:
        hist[r.seg][r.bin] += 1
    tot = {s: sum(b.values()) for s, b in hist.items()}
    for r in rows:
        ha, hb = hist[r.seg_a], hist[r.seg_b]
        shared = sorted(set(ha) & set(hb))
        assert r.shared_bins == len(shared)
        bc = sum(
            math.floor(
                math.sqrt(ha[b] / tot[r.seg_a] * hb[b] / tot[r.seg_b]) * 1e6 + 0.5
            )
            for b in shared
        )
        assert r.bc_micro == bc
        assert r.bhattacharyya_micro == math.floor(-math.log(bc / 1e6) * 1e6 + 0.5)
        # BC in (0, 1]; distance >= 0
        assert 0 < r.bc_micro <= 1_000_000 + len(shared)  # +rounding slack
        assert r.bhattacharyya_micro >= -len(shared)
