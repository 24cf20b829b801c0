"""Round-33 tests: content-defined chunking, temperature mixing."""

from __future__ import annotations

import hashlib

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_cdc_matches_python_reference_for_one_doc(spark):
    from us_stock_data_pipeline_spark.queries.llm_ops29 import _CDC_GRAM, _CDC_MASK

    rows = {r.doc_id: r for r in registry.queries()["dedup_content_defined_chunking"](spark, SF).collect()}
    doc = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter("doc_id = 0")
        .collect()[0]
    )
    text = doc.text
    bounds = [
        p
        for p in range(1, len(text) - _CDC_GRAM + 2)
        if int(
            hashlib.md5(text[p - 1 : p - 1 + _CDC_GRAM].encode()).hexdigest()[:10], 16
        )
        % (_CDC_MASK + 1)
        == 0
    ]
    # boundaries after the last position add no chunk; count = runs
    n_positions = len(text) - _CDC_GRAM + 1
    effective = [b for b in bounds if b < n_positions]
    assert rows[0].n_chunks == len(effective) + 1


def test_cdc_insertion_realigns_chunks(spark):
    """The defining CDC property: prepending bytes to a doc changes at
    most the first chunk's hash — downstream chunks re-align."""
    from pyspark.sql import functions as F

    from us_stock_data_pipeline_spark.queries import llm_ops29
    from us_stock_data_pipeline_spark.queries.llm_ops29 import _CDC_GRAM, _CDC_MASK

    base = "the quick brown fox jumps over the lazy dog and keeps running far away " * 4

    def chunks(text: str) -> list[str]:
        n = len(text) - _CDC_GRAM + 1
        bounds = [
            p
            for p in range(1, n + 1)
            if int(
                hashlib.md5(text[p - 1 : p - 1 + _CDC_GRAM].encode()).hexdigest()[:10],
                16,
            )
            % (_CDC_MASK + 1)
            == 0
        ]
        spans, start = [], 1
        for b in bounds:
            spans.append((start, b))
            start = b + 1
        if start <= n:
            spans.append((start, n))
        return [text[s - 1 : e - 1 + _CDC_GRAM] for s, e in spans]

    c1 = chunks(base)
    c2 = chunks("XYZPREFIX " + base)
    # all chunks after the spliced region re-align EXACTLY: the two
    # chunkings share an identical suffix covering all but the first
    # chunk of the original (the repeated corpus makes chunk strings
    # recur, so compare sequences, not sets)
    k = len(c1) - 1
    assert c2[-k:] == c1[-k:]


def test_temperature_mixing_flattens(spark):
    rows = registry.queries()["corpus_temperature_mixing"](spark, SF).collect()
    by_alpha = {}
    for r in rows:
        by_alpha.setdefault(r.alpha_e2, []).append(r.mix_share_e6)
    # lower alpha => flatter distribution => smaller max share
    maxes = {a: max(v) for a, v in by_alpha.items()}
    assert maxes[30] <= maxes[70] <= maxes[100]
    for a, shares in by_alpha.items():
        assert abs(sum(shares) - 1_000_000) < len(shares) + 1
