"""Round-42 tests: volume profile."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_volume_profile_conserves_value_and_has_one_poc(spark):
    rows = registry.queries()["bars_volume_profile"](spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    totals = {
        r.event_type: r.c
        for r in ev.groupBy("event_type")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"))
        .collect()
    }
    from collections import defaultdict

    by_sym = defaultdict(list)
    for r in rows:
        by_sym[r.symbol].append(r)
    assert set(by_sym) == set(totals)
    for sym, buckets in by_sym.items():
        assert sum(b.traded_cents for b in buckets) == totals[sym]
        pocs = [b for b in buckets if b.is_poc == 1]
        assert len(pocs) == 1
        assert pocs[0].traded_cents == max(b.traded_cents for b in buckets)
        share_sum = sum(b.share_e6 for b in buckets)
        assert 1_000_000 - len(buckets) <= share_sum <= 1_000_000
