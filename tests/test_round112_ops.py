"""Round-111 tests: Kalman local-level filter, Treynor ratio."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"

Q, R = 400, 10_000


def _tdiv(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_kalman_matches_bruteforce(spark):
    rows = registry.queries()["timeseries_kalman_local_level"](spark, SF).collect()
    assert rows
    ev = spark.read.parquet(f"{SF}/events.parquet")
    closes = (
        ev.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("y"))
        .orderBy("symbol", "day")
        .collect()
    )
    seqs = defaultdict(list)
    for r in closes:
        seqs[r.symbol].append((r.day, r.y))
    expected = {}
    for sym, seq in seqs.items():
        lvl = p = None
        for day, y in seq:
            if lvl is None:
                lvl, p = y, R
            else:
                k = ((p + Q) * 1_000_000) // (p + Q + R)
                lvl = lvl + _tdiv(k * (y - lvl), 1_000_000)
                p = ((1_000_000 - k) * (p + Q)) // 1_000_000
            expected[(sym, day)] = (y, lvl, p, y - lvl)
    assert len(rows) == len(expected)
    for r in rows:
        assert expected[(r.symbol, r.day)] == (
            r.close_cents, r.level_cents, r.p_cents2, r.innovation_cents
        )
    # the error variance converges downward to its steady state
    per_sym = defaultdict(list)
    for r in rows:
        per_sym[r.symbol].append((r.day, r.p_cents2))
    for sym, seq in per_sym.items():
        ps = [p for _, p in sorted(seq)]
        assert ps[0] == R
        assert ps[-1] < R  # strictly tightened after observations
        # steady state: P* solves P = (1-K)(P+Q); bracketed sanity
        assert 0 < ps[-1] < R


def test_treynor_matches_bruteforce(spark):
    rows = registry.queries()["bars_treynor_ratio"](spark, SF).collect()
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
    kmax = max(len(m) for m in by_day.values())
    for row in rows:
        pts = []
        for d, m in by_day.items():
            if row.symbol in m:
                pts.append((m[row.symbol] * len(m), sum(m.values())))
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        syy = sum(y * y for _, y in pts)
        beta = (n * sxy - sx * sy) / (n * syy - sy * sy)
        assert row.n_days == n
        assert row.beta_micro == math.floor(beta * 1e6 + 0.5)
        assert row.treynor_milli_qbp == math.floor(sx / n / beta / kmax * 1000 + 0.5)
