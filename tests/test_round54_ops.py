"""Round-54 tests: lead-lag cross-correlation, Yule's K."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_ccf_symmetry_and_bounds(spark):
    rows = registry.queries()["timeseries_cross_correlation"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.s1 < r.s2
        assert -3 <= r.lag <= 3
        assert -1_000_000 <= r.ccf_e6 <= 1_000_000
        assert r.n_days > 2
    # lag 0 rows must agree with plain Pearson on the aligned series:
    # ccf(s1, s2, 0) is symmetric so each unordered pair appears once
    pairs = {(r.s1, r.s2) for r in rows}
    lag0 = [(r.s1, r.s2) for r in rows if r.lag == 0]
    assert set(lag0) == pairs
    # shorter overlap at the lag extremes: n is maximal at lag 0
    by_pair = {}
    for r in rows:
        by_pair.setdefault((r.s1, r.s2), {})[r.lag] = r.n_days
    for laps in by_pair.values():
        assert laps[0] == max(laps.values())


def test_yules_k_matches_manual(spark):
    rows = registry.queries()["text_yules_k"](spark, SF).collect()
    assert rows
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    by_lang: dict[str, dict[str, int]] = {}
    for d in docs:
        freq = by_lang.setdefault(d.lang, {})
        for w in d.text.split(" "):
            freq[w] = freq.get(w, 0) + 1
    import math

    for r in rows:
        freq = by_lang[r.lang]
        n = sum(freq.values())
        s2 = sum(f * f for f in freq.values())
        assert r.n_tokens == n
        assert r.vocab == len(freq)
        assert r.yules_k_e4 == math.floor(10000.0 * (s2 - n) / (n * n) * 10000 + 0.5)
