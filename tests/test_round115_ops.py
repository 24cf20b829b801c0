"""Round-114 tests: mix-surprise days, session bounce/depth."""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import timedelta

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_mix_surprise_matches_bruteforce(spark):
    rows = registry.queries()["events_mix_surprise_days"](spark, SF).collect()
    assert len(rows) == 10
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
    ).collect()
    daily = defaultdict(lambda: defaultdict(int))
    glob = defaultdict(int)
    for r in ev:
        daily[r.day][r.event_type] += 1
        glob[r.event_type] += 1
    gn = sum(glob.values())
    scored = {}
    for d, m in daily.items():
        dn = sum(m.values())
        scored[d] = sum(
            math.floor(n / dn * math.log((n / dn) / (glob[t] / gn)) * 1e6 + 0.5)
            for t, n in m.items()
        )
    top = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [(r.day, r.surprise_micro) for r in rows]
    assert got == top
    # KL >= 0 per day (up to per-term quantization slack)
    for _, s in got:
        assert s >= -10


def test_bounce_depth_matches_bruteforce(spark):
    (row,) = registry.queries()["events_session_bounce_depth"](spark, SF).collect()
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    per = defaultdict(list)
    for r in ev:
        per[r.user_id].append((r.ts, r.event_id))
    depths = []
    for u, seq in per.items():
        seq.sort()
        cur = 0
        prev = None
        for ts, _ in seq:
            if prev is None or (ts - prev) > timedelta(minutes=30):
                if cur:
                    depths.append(cur)
                cur = 1
            else:
                cur += 1
            prev = ts
        depths.append(cur)
    n = len(depths)
    bounces = sum(1 for d in depths if d == 1)
    assert (row.n_sessions, row.n_bounces) == (n, bounces)
    assert row.bounce_rate_bp == bounces * 10000 // n
    assert row.max_depth == max(depths)
    assert row.total_events == sum(depths) == len(ev)
    assert row.mean_depth_milli == sum(depths) * 1000 // n
