"""Round-35 tests: amortization schedule, char entropy."""

from __future__ import annotations

import math

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_amortization_closed_form_consistency(spark):
    from us_stock_data_pipeline_spark.queries.analytics_ops43 import (
        _AMORT_MONTHS,
        _AMORT_RATE_BP,
    )

    rows = registry.queries()["finance_amortization_schedule"](spark, SF).collect()
    assert rows
    r = _AMORT_RATE_BP / 10000.0
    from collections import defaultdict

    by_loan = defaultdict(list)
    for row in rows:
        by_loan[row.loan_id].append(row)
    for loan_id, sched in by_loan.items():
        sched.sort(key=lambda x: x.month)
        assert len(sched) == _AMORT_MONTHS
        # the same payment every month
        assert len({s.payment_cents for s in sched}) == 1
        # final balance ~ 0 (quantization leaves < one cent-per-month drift)
        assert abs(sched[-1].balance_cents) <= _AMORT_MONTHS, loan_id
        # balance decreases monotonically
        bals = [s.balance_cents for s in sched]
        assert bals == sorted(bals, reverse=True)
        # the recursive identity holds within rounding: B_m ~ B_{m-1}*(1+r) - pmt
        prev = None
        for s in sched:
            if prev is not None:
                want = prev * (1 + r) - s.payment_cents
                assert abs(s.balance_cents - want) <= 2, (loan_id, s.month)
            prev = s.balance_cents


def test_char_entropy_bounds(spark):
    rows = registry.queries()["text_char_entropy"](spark, SF).collect()
    docs = {d.doc_id: d.text for d in spark.read.parquet(f"{SF}/documents.parquet").collect()}
    assert len(rows) == len(docs)
    for r in rows:
        distinct_chars = len(set(docs[r.doc_id]))
        assert 0 < r.entropy_bits_e6 <= math.log2(distinct_chars) * 1e6 + len(set(docs[r.doc_id]))
        assert 0 <= r.est_compressed_pct <= 100
        assert r.n_chars == len(docs[r.doc_id])
