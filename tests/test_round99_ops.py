"""Round-99 tests: drawdown duration, IPv4/CIDR battery."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_drawdown_duration_matches_bruteforce(spark):
    rows = registry.queries()["bars_drawdown_duration"](spark, SF).collect()
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
        peak = -1
        runs = []
        cur = 0
        for c in cs:
            peak = max(peak, c)
            if c < peak:
                cur += 1
            else:
                if cur:
                    runs.append(cur)
                cur = 0
        trailing = cur
        if cur:
            runs.append(cur)
        assert r.n_days == len(cs)
        assert r.max_underwater_days == (max(runs) if runs else 0)
        assert r.current_underwater_days == trailing
        assert r.total_underwater_days == sum(runs)
        assert r.total_underwater_days <= r.n_days - 1  # first day is a peak


def test_ipv4_cidr_matches_bruteforce(spark):
    (row,) = registry.queries()["scalar_ipv4_cidr"](spark, SF).collect()
    users = sorted(
        r.user_id
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id")
        .distinct()
        .collect()
    )
    ips = [
        10 * 16777216 + (u % 200) * 65536 + ((u * 7) % 250) * 256 + ((u * 13) % 250)
        for u in users
    ]
    def dotted(ip):
        return f"{ip >> 24}.{(ip >> 16) & 255}.{(ip >> 8) & 255}.{ip & 255}"

    assert row.n_ips == len(ips)
    assert row.n_nets20 == len({ip // 4096 for ip in ips})
    assert row.n_in_low_block == sum(1 for ip in ips if (ip >> 16) & 255 < 100)
    assert row.slack_sum == sum(ip // 4096 * 4096 + 4095 - ip for ip in ips)
    ds = sorted(dotted(ip) for ip in ips)
    assert (row.min_dotted, row.max_dotted) == (ds[0], ds[-1])
