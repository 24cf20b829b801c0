"""Round-10 hardening pins: the lambda-fold oracle lint, the dynamic
verify rotation, and the thread-local persist tracking (advisor r9
medium).
"""

from __future__ import annotations

import json
import threading

import us_stock_data_pipeline_spark  # noqa: F401 — populates the registry
from us_stock_data_pipeline_spark import registry

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from dtype_audit import lint_lambda_folds  # noqa: E402


# --------------------------------------------------------------------------
# lambda-fold lint (VERDICT r9 #1)
# --------------------------------------------------------------------------


def test_fold_lint_flags_the_r9_km_shape():
    """The exact fold that made survival_kaplan_meier driver-red for two
    rounds (non-commutative integer-division lambda) must flag."""
    bad = (
        "SELECT list_reduce(list_prepend(CAST(1000000000 AS BIGINT), pre),"
        " (acc, s) -> (acc * (s // 2147483648)) // (s % 2147483648)) AS x"
        " FROM t"
    )
    findings = lint_lambda_folds("km", bad)
    assert any("non-commutative" in f for f in findings)


def test_fold_lint_flags_uncast_seed():
    findings = lint_lambda_folds("ns", "SELECT list_reduce(pre, (acc, x) -> acc + x) FROM t")
    assert any("CAST" in f for f in findings)


def test_fold_lint_accepts_strict_left_double_sum():
    good = (
        "SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        " list_transform(list_zip(a, b),"
        " z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))),"
        " (acc, x) -> acc + x) AS dot FROM t"
    )
    assert lint_lambda_folds("dot", good) == []


def test_fold_lint_ignores_sql_comments():
    sql = "-- prose mentioning list_reduce(...) here\nSELECT 1 AS one"
    assert lint_lambda_folds("c", sql) == []


def test_fold_lint_clean_corpus_wide():
    """Every registered oracle obeys the fold discipline: CAST seed,
    addition-only lambda body (VERDICT r9 #1 'lint committed clean')."""
    findings = []
    for name, q in registry.all_queries().items():
        if q.oracle is not None:
            findings.extend(lint_lambda_folds(name, q.oracle))
    assert findings == [], findings


# --------------------------------------------------------------------------
# dynamic verify rotation (VERDICT r9 #2)
# --------------------------------------------------------------------------


def test_verify_rotation_prioritizes_never_sampled():
    """The first 50 names queries() yields must be ≥90% never-driver-
    sampled (plus red rechecks) — r9 burned 34/50 slots re-sampling
    green queries off a stale static list."""
    sampled = registry._driver_sampled_names()
    order = registry._ordered_names()
    assert order, "registry is empty"
    first50 = order[:50]
    first_time = [n for n in first50 if n not in sampled]
    rechecks = set(registry._red_recheck_names())
    recheck_hits = [n for n in first50 if n in rechecks]
    assert len(first_time) + len(recheck_hits) >= 45, (
        f"only {len(first_time)} first-time + {len(recheck_hits)} rechecks "
        f"in the first 50: {first50}"
    )
    # no duplicates, full coverage
    assert len(order) == len(set(order)) == len(registry.all_queries())


_ROUND12_QUERIES = (
    "etl_versioned_sql_timetravel",
    "etl_versioned_sql_history",
    "etl_versioned_sql_dml",
    "etl_versioned_sql_merge_into",
    "stream_versioned_cdf_source",
    "stream_versioned_cdf_to_mart",
    "scale_window_spill_external",
    "tokenizer_unigram_em_step",
    "storage_parquet_raw_scan",
)


def test_round_tagged_never_sampled_lead_the_order():
    """VERDICT r12 #1: the static new-this-round tuple rotted and r12's 9
    queries were never driver-sampled. The fix keys priority off the
    ``round=`` metadata committed WITH each registration: every tagged
    query the driver has never sampled must lead the order, oldest round
    first, so the 9 round-12 queries outrank round-13 additions until
    CORRECTNESS_r13.json lands."""
    sampled = registry._driver_sampled_names()
    order = registry._ordered_names()
    all_q = registry.all_queries()
    tagged_never = [
        n for n in all_q if all_q[n].round > 0 and n not in sampled
    ]
    head = order[: len(tagged_never)]
    assert set(head) == set(tagged_never), (head, tagged_never)
    # tagged block is sorted oldest-round-first
    rounds = [all_q[n].round for n in head]
    assert rounds == sorted(rounds), rounds
    # until driver-sampled, the 9 round-12 queries lead everything
    for n in _ROUND12_QUERIES:
        assert all_q[n].round == 12, n
        if n not in sampled:
            assert n in head, n


# --------------------------------------------------------------------------
# thread-local persist tracking (advisor r9 medium)
# --------------------------------------------------------------------------


class _FakeDF:
    def __init__(self):
        self.persisted = False

    def persist(self):
        self.persisted = True
        return self

    def unpersist(self):
        self.persisted = False
        return self


def test_release_is_thread_local():
    """A release on one thread must NOT unpersist frames tracked by a
    concurrently running query on another thread (the bench.py
    concurrent-phase skew the r9 advisor flagged)."""
    main_df = _FakeDF()
    registry.release_tracked_caches()  # start clean on this thread
    registry.track_persist(main_df)
    assert main_df.persisted

    other_df = _FakeDF()
    done = threading.Event()

    def other_thread():
        registry.track_persist(other_df)
        # releasing on THIS thread drops only this thread's frames
        registry.release_tracked_caches()
        done.set()

    t = threading.Thread(target=other_thread)
    t.start()
    t.join(10)
    assert done.is_set()
    assert not other_df.persisted, "other thread's release must drop its own frame"
    assert main_df.persisted, "other thread's release must NOT touch this thread's frame"
    registry.release_tracked_caches()
    assert not main_df.persisted
