"""Hypothesis property tests for round-7 operators: the sweep-line
interval coverage and the trimmed mean must agree with independent
pure-Python references on arbitrary generated inputs, not just the
fixture."""

from __future__ import annotations

import datetime as dt
import os
import shutil

from hypothesis import HealthCheck, given, settings, strategies as st

from us_stock_data_pipeline_spark import registry

_UTC = dt.timezone.utc
_BASE = dt.datetime(2024, 1, 1, tzinfo=_UTC)

_EVENT = st.tuples(
    st.integers(min_value=0, max_value=5),  # user_id
    st.integers(min_value=0, max_value=3_600_000),  # offset seconds
    st.floats(min_value=0.0, max_value=500.0, allow_nan=False, width=32),  # value
)


def _stage_events(spark, rows, tmpdir):
    """Write a synthetic events.parquet with the fixture schema."""
    data = [
        (
            i,
            (_BASE + dt.timedelta(seconds=off)).replace(tzinfo=None),
            uid,
            "click",
            float(val),
            "{}",
        )
        for i, (uid, off, val) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmpdir, "events.parquet"))
    return tmpdir


def _py_interval_coverage(rows):
    """Reference sweep-line: merge [s, s + round(value)] per user."""
    import math

    by_user = {}
    for i, (uid, off, val) in enumerate(rows):
        s = off * 1_000_000
        # Spark's round() is HALF_UP; Python's round() is banker's —
        # floor(v + 0.5) reproduces Spark for non-negative durations
        e = s + int(math.floor(val + 0.5)) * 1_000_000
        by_user.setdefault(uid, []).append((s, e, i))
    out = {}
    for uid, ivs in by_user.items():
        ivs.sort(key=lambda t: (t[0], t[2]))
        islands = 0
        covered = 0
        cur_s = cur_e = None
        for s, e, _ in ivs:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                islands += 1
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        covered += cur_e - cur_s
        out[uid] = (islands, covered // 1_000_000)
    return out


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_EVENT, min_size=1, max_size=60))
def test_interval_coverage_matches_python_sweepline(spark, tmp_path_factory, rows):
    tmpdir = str(tmp_path_factory.mktemp("iv"))
    try:
        _stage_events(spark, rows, tmpdir)
        got = {
            r.user_id: (r.n_islands, r.covered_seconds)
            for r in registry.queries()["interval_union_coverage"](
                spark, tmpdir
            ).collect()
        }
        assert got == _py_interval_coverage(rows)
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def _py_trimmed_mean(rows):
    """Reference 10%-two-tail trimmed mean over cents, per the op's
    deterministic (value, event_id) ordering."""
    vals = [
        (val, i, int(round(val * 100)))
        for i, (_uid, _off, val) in enumerate(rows)
    ]
    vals.sort(key=lambda t: (t[0], t[1]))
    n = len(vals)
    k = n * 10 // 100
    kept = vals[k: n - k]
    cents = [c for _, _, c in kept]
    mean = sum(cents) / len(cents) / 100
    import math

    return len(cents), math.floor(mean * 10000 + 0.5) / 10000


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_EVENT, min_size=3, max_size=80))
def test_trimmed_mean_matches_python_reference(spark, tmp_path_factory, rows):
    tmpdir = str(tmp_path_factory.mktemp("tm"))
    try:
        _stage_events(spark, rows, tmpdir)
        res = registry.queries()["agg_trimmed_mean"](spark, tmpdir).collect()
        assert len(res) == 1  # single event_type staged
        n_kept, mean = _py_trimmed_mean(rows)
        assert res[0].n_kept == n_kept
        assert abs(res[0].trimmed_mean - mean) < 1e-9
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)
