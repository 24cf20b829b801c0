"""Round-103 tests: Durbin-Watson, rich-club coefficient."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_durbin_watson_matches_bruteforce(spark):
    rows = registry.queries()["stats_durbin_watson"](spark, SF).collect()
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
        seqs[r.symbol].append(r.c)
    for r in rows:
        cs = seqs[r.symbol]
        n = len(cs)
        xs = list(range(1, n + 1))
        sx, sy = sum(xs), sum(cs)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, cs))
        b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        a = (sy - b * sx) / n
        es = [math.floor((y - (a + b * x)) * 1000 + 0.5) for x, y in zip(xs, cs)]
        num = sum((e1 - e0) ** 2 for e0, e1 in zip(es, es[1:]))
        den = sum(e * e for e in es)
        assert (r.n_days, r.num_sq, r.den_sq) == (n, num, den)
        assert r.dw_milli == math.floor(num / den * 1000 + 0.5)
        # DW lives in [0, 4]
        assert 0 <= r.dw_milli <= 4000


def test_rich_club_matches_bruteforce(spark):
    rows = registry.queries()["graph_rich_club"](spark, SF).collect()
    assert len(rows) == 3
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    ).collect()
    per_order = defaultdict(set)
    for r in li:
        per_order[r.l_orderkey].add(r.l_suppkey)
    edges = set()
    for ss in per_order.values():
        ss = sorted(ss)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                edges.add((ss[i], ss[j]))
    deg = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    for r in rows:
        club = {v for v, d in deg.items() if d > r.degree_k}
        e_k = sum(1 for a, b in edges if a in club and b in club)
        assert r.club_size == len(club)
        assert r.club_edges == e_k
        if len(club) > 1:
            assert r.phi_micro == 2 * e_k * 1_000_000 // (len(club) * (len(club) - 1))
            assert 0 <= r.phi_micro <= 1_000_000
        else:
            assert r.phi_micro == -1
