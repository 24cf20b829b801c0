"""Hypothesis property tests for the reference-parity core: the session
labeler and the curate projection must agree with independent pure-Python
reference implementations on arbitrary inputs, not just the fixture."""

from __future__ import annotations

import datetime as dt
from zoneinfo import ZoneInfo

from hypothesis import given, settings, strategies as st

from us_stock_data_pipeline_spark.etl.bars import curate, raw_rows_to_df, with_session

ET = ZoneInfo("America/New_York")
UTC = dt.timezone.utc


def _expected_session(ts_utc: dt.datetime) -> str:
    """Independent reimplementation of the reference's band logic
    (`1m-seesion-pipeline/utils.py:3-19`): ET wall clock, inclusive hhmm
    bands, premarket 400-929 / regular 930-1600 / afterhours 1601-2000."""
    et = ts_utc.replace(tzinfo=UTC).astimezone(ET)
    hhmm = et.hour * 100 + et.minute
    if 400 <= hhmm <= 929:
        return "premarket"
    if 930 <= hhmm <= 1600:
        return "regular"
    if 1601 <= hhmm <= 2000:
        return "afterhours"
    return "closed"


# epoch-millis across 2023-2024 (covers both DST transitions twice)
_TS_MS = st.integers(
    min_value=int(dt.datetime(2023, 1, 1, tzinfo=UTC).timestamp() * 1000),
    max_value=int(dt.datetime(2024, 12, 31, tzinfo=UTC).timestamp() * 1000),
)
_PRICE = st.one_of(st.none(), st.floats(min_value=0.01, max_value=1e6, allow_nan=False))


@settings(max_examples=10, deadline=None)  # each example is a Spark job
@given(st.lists(st.tuples(_TS_MS, _PRICE, _PRICE), min_size=1, max_size=40))
def test_session_label_matches_reference_semantics(spark, rows):
    raw = [
        {"t": t, "o": o, "h": o, "l": o, "c": o, "v": v, "vw": o, "n": 1.0}
        for (t, o, v) in rows
    ]
    df = with_session(curate(raw_rows_to_df(spark, raw), symbol="X"))
    got = {r.ts: r.session for r in df.collect()}
    for t, _, _ in rows:
        ts = dt.datetime.fromtimestamp(t / 1000, tz=UTC).replace(tzinfo=None)
        # sub-second part truncated by timestamp_millis is preserved in ts;
        # compare through the same key the engine produced
        matching = [s for k, s in got.items() if abs((k - ts).total_seconds()) < 0.001]
        assert matching and matching[0] == _expected_session(
            dt.datetime.fromtimestamp(t / 1000, tz=UTC).replace(tzinfo=None)
        )


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(_TS_MS, _PRICE, _PRICE), min_size=1, max_size=40))
def test_curate_null_preservation_and_long_casts(spark, rows):
    """Parity U1/U2 (`polygon_client.py:100-120`): nulls pass through
    untouched; volume/trades land as long (AGG_SCHEMA enforced)."""
    raw = [
        {"t": t, "o": o, "h": None, "l": o, "c": o, "v": v, "vw": o, "n": v}
        for (t, o, v) in rows
    ]
    out = curate(raw_rows_to_df(spark, raw), symbol="X")
    dtypes = dict(out.dtypes)
    assert dtypes["volume"] == "bigint" and dtypes["trades"] == "bigint"
    collected = out.collect()
    assert len(collected) == len(rows)
    for r in collected:
        assert r.high is None  # null preserved through the cast chain
    n_null_v = sum(1 for (_, _, v) in rows if v is None)
    assert sum(1 for r in collected if r.volume is None) == n_null_v
