"""Round-115 tests: HDR log2 histogram, resettable watermark."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_hdr_histogram_matches_bruteforce(spark):
    (row,) = registry.queries()["agg_hdr_log2_histogram"](spark, SF).collect()
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    per = defaultdict(list)
    for r in ev:
        per[r.user_id].append((r.ts, r.event_id))
    buckets = defaultdict(int)
    n_gaps = 0
    for u, seq in per.items():
        seq.sort()
        for (t0, _), (t1, _) in zip(seq, seq[1:]):
            td = t1 - t0
            us = (td.days * 86400 + td.seconds) * 1_000_000 + td.microseconds
            b = 0 if us <= 1 else us.bit_length() - 1
            buckets[b] += 1
            n_gaps += 1
    assert row.n_gaps == n_gaps
    assert row.n_buckets == len(buckets)
    assert row.max_bucket == max(buckets)
    cum = 0
    p50 = p95 = p99 = None
    for b in sorted(buckets):
        cum += buckets[b]
        if p50 is None and cum * 2 >= n_gaps:
            p50 = b
        if p95 is None and cum * 20 >= 19 * n_gaps:
            p95 = b
        if p99 is None and cum * 100 >= 99 * n_gaps:
            p99 = b
    assert (row.p50_bucket, row.p95_bucket, row.p99_bucket) == (p50, p95, p99)
    assert row.p50_bucket <= row.p95_bucket <= row.p99_bucket <= row.max_bucket


def test_resettable_watermark_matches_bruteforce(spark):
    (row,) = registry.queries()["window_resettable_watermark"](spark, SF).collect()
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect()
    )
    per = defaultdict(list)
    for r in ev:
        per[r.user_id].append((r.ts, r.event_id, r.event_type, round(r.value * 100)))
    n_events = n_highs = 0
    max_epoch = 0
    drawdown = 0
    for u, seq in per.items():
        seq.sort()
        epoch = 0
        hwm = None
        for ts, eid, etype, cents in seq:
            if etype == "purchase":
                epoch += 1
                hwm = None
            hwm = cents if hwm is None else max(hwm, cents)
            n_events += 1
            if cents == hwm:
                n_highs += 1
            drawdown += hwm - cents
        max_epoch = max(max_epoch, epoch)
    assert (row.n_events, row.n_new_highs) == (n_events, n_highs)
    assert row.max_epochs_per_user == max_epoch
    assert row.total_drawdown_cents == drawdown
