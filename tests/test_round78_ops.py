"""Round-78 tests: HITS hubs/authorities, Aroon indicator."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_hits_matches_bruteforce(spark):
    rows = registry.queries()["graph_hits_hubs_authorities"](spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    er = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .agg(F.count(F.lit(1)).alias("w"))
        .collect()
    )
    edges = [(r.c, r.p, r.w) for r in er]

    def norm(d):
        mx = max(d.values())
        return {k: v * 1_000_000 // mx for k, v in d.items()}

    a1 = defaultdict(int)
    for c, p, w in edges:
        a1[p] += w
    a1 = norm(a1)
    h1 = defaultdict(int)
    for c, p, w in edges:
        h1[c] += w * a1[p]
    h1 = norm(h1)
    a2 = defaultdict(int)
    for c, p, w in edges:
        a2[p] += w * h1[c]
    a2 = norm(a2)
    h2 = defaultdict(int)
    for c, p, w in edges:
        h2[c] += w * a2[p]
    h2 = norm(h2)

    top_a = sorted(a2.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    top_h = sorted(h2.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got_a = [(r.node_key, r.score_ppm) for r in rows if r.role == "authority"]
    got_h = [(r.node_key, r.score_ppm) for r in rows if r.role == "hub"]
    assert got_a == top_a
    assert got_h == top_h


def test_hits_scores_normalized(spark):
    rows = registry.queries()["graph_hits_hubs_authorities"](spark, SF).collect()
    for role in ("authority", "hub"):
        scores = [r.score_ppm for r in rows if r.role == role]
        assert scores[0] == 1_000_000  # rank-1 is the normalizer
        assert all(0 < s <= 1_000_000 for s in scores)
        assert scores == sorted(scores, reverse=True)


def _daily_hl(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    rows = (
        ev.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(
            F.round(F.max("value") * 100).cast("long").alias("hi"),
            F.round(F.min("value") * 100).cast("long").alias("lo"),
        )
        .orderBy("symbol", "day")
        .collect()
    )
    out = defaultdict(list)
    for r in rows:
        out[r.symbol].append((r.day, r.hi, r.lo))
    return out


def test_aroon_matches_bruteforce(spark):
    rows = registry.queries()["bars_aroon"](spark, SF).collect()
    assert rows
    bars = _daily_hl(spark)
    N = 14
    expected = {}
    for sym, seq in bars.items():
        for i in range(N, len(seq)):
            win = seq[max(0, i - N): i + 1]
            # most-recent extreme (max j among ties)
            hi_j = max(range(len(win)), key=lambda j: (win[j][1], j))
            lo_j = max(range(len(win)), key=lambda j: (-win[j][2], j))
            dsh = len(win) - 1 - hi_j
            dsl = len(win) - 1 - lo_j
            expected[(sym, seq[i][0])] = (
                dsh, dsl, (N - dsh) * 10000 // N, (N - dsl) * 10000 // N
            )
    assert len(rows) == len(expected)
    for r in rows:
        assert expected[(r.symbol, r.day)] == (
            r.days_since_high, r.days_since_low, r.aroon_up_bp, r.aroon_down_bp
        )


def test_aroon_bounds_and_fresh_high(spark):
    rows = registry.queries()["bars_aroon"](spark, SF).collect()
    for r in rows:
        assert 0 <= r.days_since_high <= 14
        assert 0 <= r.aroon_up_bp <= 10000
        assert 0 <= r.aroon_down_bp <= 10000
        if r.days_since_high == 0:
            assert r.aroon_up_bp == 10000
