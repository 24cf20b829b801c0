"""Round-107 tests: canary scan, forecast blend weight."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"

CANARIES = ("spark shuffle", "join small", "value table")


def test_canary_scan_matches_bruteforce(spark):
    rows = registry.queries()["corpus_canary_scan"](spark, SF).collect()
    assert rows
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("source", "text").collect()
    per = defaultdict(lambda: [0, 0, 0])
    for r in docs:
        kinds = sum(1 for c in CANARIES if c in r.text)
        e = per[r.source]
        e[0] += 1
        e[1] += 1 if kinds else 0
        e[2] += kinds
    assert len(rows) == len(per)
    for r in rows:
        n, dwc, hits = per[r.source]
        assert (r.n_docs, r.docs_with_canary, r.canary_kind_hits) == (n, dwc, hits)
        assert r.hit_rate_micro == dwc * 1_000_000 // n
    # the fixture vocabulary must actually trip some canaries
    assert sum(r.docs_with_canary for r in rows) > 0


def test_blend_weight_matches_bruteforce(spark):
    rows = registry.queries()["ml_forecast_blend_weight"](spark, SF).collect()
    assert rows
    ev = spark.read.parquet(f"{SF}/events.parquet")
    closes = (
        ev.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
        .orderBy("symbol", "day")
        .collect()
    )
    seqs = defaultdict(list)
    for r in closes:
        seqs[r.symbol].append((r.day, r.c))
    rets = {}
    for sym, seq in seqs.items():
        for (d0, p), (d1, c) in zip(seq, seq[1:]):
            rets[(sym, d1)] = math.floor((c - p) * 10000.0 / p + 0.5)
    by_day = defaultdict(dict)
    for (sym, d), r in rets.items():
        by_day[d][sym] = r
    for row in rows:
        days = sorted(d for (s, d) in rets if s == row.symbol)
        pts = []
        for prev_d, d in zip(days, days[1:]):
            k = len(by_day[d])
            kp = len(by_day[prev_d])
            y = rets[(row.symbol, d)] * k
            p1 = rets[(row.symbol, prev_d)] * kp
            p2 = sum(by_day[prev_d].values())
            pts.append((y - p2, p1 - p2))
        n = len(pts)
        su = sum(u for u, _ in pts)
        sv = sum(v for _, v in pts)
        suv = sum(u * v for u, v in pts)
        svv = sum(v * v for _, v in pts)
        w = (n * suv - su * sv) / (n * svv - sv * sv)
        assert row.n_obs == n
        assert row.blend_w_micro == math.floor(w * 1e6 + 0.5)
