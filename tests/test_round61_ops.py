"""Round-61 tests: ulcer index, char-bigram conditional entropy."""

from __future__ import annotations

import math

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_ulcer_invariants(spark):
    rows = registry.queries()["bars_ulcer_index"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r.ulcer_bp_e2
        # RMS drawdown can never exceed the max drawdown
        assert r.ulcer_bp_e2 <= r.max_dd_bp * 100
        assert 0 <= r.n_underwater_days <= r.n_days
        # Martin ratio shares sign with the total return


def test_bigram_entropy_below_unigram_log_bound(spark):
    rows = registry.queries()["text_bigram_entropy"](spark, SF).collect()
    assert rows
    for r in rows:
        # conditional entropy is bounded by log2 of the bigram support
        assert 0 <= r.cond_entropy_e6 <= math.log2(r.n_bigrams) * 1_000_000 + 1
        assert r.n_grams > r.n_bigrams  # repeats exist in natural text


def test_bigram_entropy_manual_one_lang(spark):
    (row, *_) = registry.queries()["text_bigram_entropy"](spark, SF).collect()
    docs = [
        d.text
        for d in spark.read.parquet(f"{SF}/documents.parquet")
        .filter(f"lang = '{row.lang}' AND length(text) >= 2")
        .collect()
    ]
    from collections import Counter

    cells: Counter = Counter()
    for t in docs:
        for i in range(len(t) - 1):
            cells[t[i : i + 2]] += 1
    n = sum(cells.values())
    row_tot: Counter = Counter()
    for bg, c in cells.items():
        row_tot[bg[0]] += c
    total_e9 = sum(
        math.floor(c / n * math.log2(row_tot[bg[0]] / c) * 1e9 + 0.5)
        for bg, c in cells.items()
    )
    assert row.n_grams == n
    assert row.n_bigrams == len(cells)
    assert row.cond_entropy_e6 == total_e9 // 1000
