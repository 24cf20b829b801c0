"""Round-88 tests: Damerau-Levenshtein kernel, Kleinberg burst filter."""

from __future__ import annotations

from collections import defaultdict

import pandas as pd
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.queries.analytics_ops82 import (
    _B_GAMMA,
    _B_LOGR0,
    _B_LOGR1,
    _B_RATE0,
    _B_RATE1,
    _dl_distance,
)

SF = "/root/testdata/sf0.001"


def test_dl_kernel_known_cases():
    cases = [
        ("ca", "abc", 2),        # full DL beats OSA's 3: transpose then edit between
        ("ab", "ba", 1),         # plain transposition
        ("kitten", "sitting", 3),
        ("abcdef", "abdcef", 1),
        ("same", "same", 0),
        ("", "abc", 3),
        ("form", "from", 1),
    ]
    got = _dl_distance(
        pd.Series([a for a, _, _ in cases]), pd.Series([b for _, b, _ in cases])
    )
    assert list(got) == [d for _, _, d in cases]


def test_dl_query_consistent_with_kernel(spark):
    rows = registry.queries()["text_damerau_levenshtein"](spark, SF).collect()
    assert rows
    got = _dl_distance(
        pd.Series([r.name_a for r in rows]), pd.Series([r.name_b for r in rows])
    )
    assert list(got) == [r.dl_distance for r in rows]
    for r in rows:
        # distance bounded by longer-string length; identical names -> 0
        assert 0 <= r.dl_distance <= max(len(r.name_a), len(r.name_b))
        if r.name_a == r.name_b:
            assert r.dl_distance == 0


def test_burst_matches_bruteforce(spark):
    rows = registry.queries()["events_kleinberg_burst"](spark, SF).collect()
    assert rows
    ev = spark.read.parquet(f"{SF}/events.parquet")
    days = (
        ev.select("event_type", F.date_trunc("day", "ts").cast("date").alias("day"))
        .distinct()
        .orderBy("event_type", "day")
        .collect()
    )
    per = defaultdict(list)
    for r in days:
        per[r.event_type].append(r.day)
    for r in rows:
        ds = per[r.symbol]
        gaps = [(b - a).days for a, b in zip(ds, ds[1:])]
        assert r.n_gaps == len(gaps)
        c0 = c1 = None
        bursts = 0
        for g in gaps:
            e0 = _B_RATE0 * g - _B_LOGR0
            e1 = _B_RATE1 * g - _B_LOGR1
            if c0 is None:
                c0, c1 = e0, e1 + _B_GAMMA
            else:
                c0, c1 = min(c0, c1 + _B_GAMMA) + e0, min(c1, c0 + _B_GAMMA) + e1
            if c1 < c0:
                bursts += 1
        assert (r.cost_low_micro, r.cost_high_micro, r.burst_steps) == (c0, c1, bursts)
        # a daily-regular series (gap=1) should strongly prefer the
        # high-rate state: sanity on the emission design
        assert 0 <= r.burst_steps <= r.n_gaps
