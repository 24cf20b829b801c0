"""Round-108 tests: dedup ladder waterfall, sign test."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_ladder_matches_bruteforce(spark):
    rows = registry.queries()["dedup_ladder_waterfall"](spark, SF).collect()
    assert [r.rung for r in rows] == ["1_exact", "2_normalized", "3_blocked"]
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text", "n_chars")
        .collect()
    )

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    base = [
        (
            r.doc_id,
            md5(r.text),
            md5(r.text.lower().strip()),
            md5(
                f"{r.n_chars // 20}|{r.text.split(' ')[0]}|{r.text.split(' ')[1]}"
            ),
        )
        for r in docs
    ]

    def survive(rows_, key_idx):
        best = {}
        for t in rows_:
            k = t[key_idx]
            if k not in best or t[0] < best[k][0]:
                best[k] = t
        return sorted(best.values())

    s1 = survive(base, 1)
    s2 = survive(s1, 2)
    s3 = survive(s2, 3)
    ns = [len(base), len(s1), len(s2), len(s3)]
    expected = [
        ("1_exact", ns[0] - ns[1], ns[1], (ns[0] - ns[1]) * 1_000_000 // ns[0]),
        ("2_normalized", ns[1] - ns[2], ns[2], (ns[1] - ns[2]) * 1_000_000 // ns[1]),
        ("3_blocked", ns[2] - ns[3], ns[3], (ns[2] - ns[3]) * 1_000_000 // ns[2]),
    ]
    got = [(r.rung, r.docs_removed, r.docs_remaining, r.removal_rate_micro) for r in rows]
    assert got == expected
    # the waterfall is monotone: remaining never grows
    assert ns == sorted(ns, reverse=True)


def test_sign_test_matches_bruteforce(spark):
    rows = registry.queries()["stats_sign_test"](spark, SF).collect()
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
        wins = losses = ties = 0
        for d, m in by_day.items():
            if row.symbol not in m:
                continue
            lhs = m[row.symbol] * len(m)
            rhs = sum(m.values())
            if lhs > rhs:
                wins += 1
            elif lhs < rhs:
                losses += 1
            else:
                ties += 1
        nt = wins + losses
        assert (row.n_wins, row.n_losses, row.n_ties) == (wins, losses, ties)
        if nt:
            z = (abs(wins - nt / 2) - 0.5) / math.sqrt(nt / 4)
            z *= 1 if 2 * wins >= nt else -1
            assert row.sign_z_milli == math.floor(z * 1000 + 0.5)
