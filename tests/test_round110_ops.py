"""Round-109 tests: NR7 contraction, dataloader interleave plan."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_nr7_matches_bruteforce(spark):
    rows = registry.queries()["bars_nr7_contraction"](spark, SF).collect()
    assert rows
    ev = spark.read.parquet(f"{SF}/events.parquet")
    bars = (
        ev.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(
            (
                F.round(F.max("value") * 100).cast("long")
                - F.round(F.min("value") * 100).cast("long")
            ).alias("rng")
        )
        .orderBy("symbol", "day")
        .collect()
    )
    seqs = defaultdict(list)
    for r in bars:
        seqs[r.symbol].append((r.day, r.rng))
    for r in rows:
        seq = seqs[r.symbol]
        flags = []
        for i in range(6, len(seq)):
            win = [x for _, x in seq[i - 6: i + 1]]
            flags.append((seq[i][0], seq[i][1], seq[i][1] == min(win)))
        n_days = len(flags)
        nr7 = [(d, rng) for d, rng, f in flags if f]
        assert r.n_days == n_days
        assert r.n_nr7_days == len(nr7)
        assert r.tightest_nr7_cents == min(rng for _, rng in nr7)
        assert r.last_nr7_day == max(d for d, _ in nr7)
        # sanity: NR7 days are a minority but exist on noisy data
        assert 0 < r.n_nr7_days < r.n_days


def test_interleave_plan_properties(spark):
    rows = registry.queries()["data_loader_interleave_plan"](spark, SF).collect()
    assert len(rows) == 100
    # brute-force the full expected plan
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text"
    ).collect()
    per = defaultdict(list)
    for r in docs:
        per[r.source].append((hashlib.md5(r.text.encode()).hexdigest(), r.doc_id))
    plan = []
    for src, lst in per.items():
        lst.sort()
        n = len(lst)
        for k, (_, doc_id) in enumerate(lst, start=1):
            plan.append(((2 * k - 1) * 1_000_000 // (2 * n), src, k, doc_id))
    plan.sort()
    expected = [
        (i + 1, doc_id, src, k, prog)
        for i, (prog, src, k, doc_id) in enumerate(plan[:100])
    ]
    got = [
        (r.read_pos, r.doc_id, r.source, r.within_source_idx, r.progress_micro)
        for r in rows
    ]
    assert got == expected
    # proportional interleave: within the first 100 reads every source
    # appears, and within-source indices are contiguous prefixes
    by_src = defaultdict(list)
    for r in rows:
        by_src[r.source].append(r.within_source_idx)
    assert len(by_src) == len(per)
    for idxs in by_src.values():
        assert idxs == list(range(1, len(idxs) + 1))
