"""Reference-parity unit tests for the bar ETL (SURVEY §5 strategy #3):
session band edges (including DST), epoch-millis cast, incremental
strict-> semantics, null preservation, AGG-schema enforcement."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.etl.bars import (
    curate,
    filter_session,
    incremental_filter,
    incremental_per_symbol,
    raw_rows_to_df,
    with_session,
)
from us_stock_data_pipeline_spark.etl.schemas import CURATED_SCHEMA


def _bars_at_utc(spark, ts_list):
    rows = [
        {"t": int(datetime.fromisoformat(ts).timestamp() * 1000), "o": 1.0, "h": 2.0,
         "l": 0.5, "c": 1.5, "v": 100.0, "vw": 1.2, "n": 3.0}
        for ts in ts_list
    ]
    return curate(raw_rows_to_df(spark, rows), symbol="TEST")


def test_epoch_millis_cast(spark):
    df = _bars_at_utc(spark, ["2024-01-05T14:30:00+00:00"])
    row = df.first()
    assert row.ts == datetime(2024, 1, 5, 14, 30)  # session tz pinned UTC
    assert row.symbol == "TEST"


def test_curated_schema_enforced(spark):
    """volume/trades must land as long — the contract the reference
    declares (`1m-seesion-pipeline/schemas.py:29-41`) but never applies."""
    df = _bars_at_utc(spark, ["2024-01-05T14:30:00+00:00"])
    got = {f.name: f.dataType for f in df.schema.fields}
    want = {f.name: f.dataType for f in CURATED_SCHEMA.fields}
    assert got == want


def test_null_preservation(spark):
    """Parity U1: missing wire fields stay null through curation
    (`polygon_client.py:100-120`)."""
    rows = [{"t": 1704463800000, "o": None, "h": 2.0, "l": None, "c": 1.5,
             "v": None, "vw": None, "n": None}]
    row = curate(raw_rows_to_df(spark, rows), symbol="X").first()
    assert row.open is None and row.low is None
    assert row.volume is None and row.trades is None
    assert row.high == 2.0


# ET wall-clock edges from FIXTURES.md §B: 04:00 / 09:29 / 09:30 / 16:00 /
# 16:01 / 20:00, expressed in UTC for a January (EST, UTC-5) date.
EDGE_CASES = [
    ("2024-01-05T08:59:00+00:00", "closed"),      # 03:59 ET
    ("2024-01-05T09:00:00+00:00", "premarket"),   # 04:00 ET inclusive
    ("2024-01-05T14:29:00+00:00", "premarket"),   # 09:29 ET inclusive
    ("2024-01-05T14:30:00+00:00", "regular"),     # 09:30 ET inclusive
    ("2024-01-05T21:00:00+00:00", "regular"),     # 16:00 ET inclusive
    ("2024-01-05T21:01:00+00:00", "afterhours"),  # 16:01 ET inclusive
    ("2024-01-06T01:00:00+00:00", "afterhours"),  # 20:00 ET inclusive
    ("2024-01-06T01:01:00+00:00", "closed"),      # 20:01 ET
]


def test_session_band_edges(spark):
    df = with_session(_bars_at_utc(spark, [ts for ts, _ in EDGE_CASES]))
    got = [r.session for r in df.orderBy("ts").collect()]
    # collect order: rows sorted by UTC ts == EDGE_CASES order
    assert got == [s for _, s in EDGE_CASES]


def test_session_dst_transition(spark):
    """2024-03-10: US spring-forward. 06:30 UTC is 01:30 EST (closed);
    12:00 UTC is 08:00 EDT (premarket) — with a fixed UTC-5 shift it
    would misread as 07:00. from_utc_timestamp must get this right."""
    df = with_session(_bars_at_utc(spark, ["2024-03-10T06:30:00+00:00",
                                           "2024-03-10T12:00:00+00:00",
                                           "2024-03-10T13:30:00+00:00"]))
    rows = df.orderBy("ts").collect()
    assert [r.hhmm for r in rows] == [130, 800, 930]
    assert [r.session for r in rows] == ["closed", "premarket", "regular"]


def test_filter_session_matches_label_and_passthrough(spark):
    df = _bars_at_utc(spark, [ts for ts, _ in EDGE_CASES])
    labeled = with_session(df)
    for name in ("premarket", "regular", "afterhours"):
        want = labeled.filter(F.col("session") == name).count()
        assert filter_session(df, name).count() == want
    # Reference quirk preserved: unknown session name = passthrough
    # (`1m-seesion-pipeline/utils.py:18-19`).
    assert filter_session(df, "lunch").count() == df.count()


def test_incremental_strict_greater(spark):
    """`ts > max_ts` is strict (`ingest_massive.py:140-141`): the bar at
    exactly max_ts must NOT be re-ingested."""
    df = _bars_at_utc(spark, ["2024-01-05T14:30:00+00:00",
                              "2024-01-05T14:31:00+00:00",
                              "2024-01-05T14:32:00+00:00"])
    kept = incremental_filter(df, datetime(2024, 1, 5, 14, 31)).collect()
    assert [r.ts.minute for r in kept] == [32]


def test_incremental_per_symbol_fixes_global_max_bug(spark):
    """Two symbols with different progress: a global max would drop AAA's
    backlog; per-symbol watermarks keep it (SURVEY §3 EP3)."""
    existing = spark.createDataFrame(
        [("AAA", datetime(2024, 1, 5, 14, 30)), ("BBB", datetime(2024, 1, 5, 16, 0))],
        "symbol string, ts timestamp",
    )
    new = spark.createDataFrame(
        [
            ("AAA", datetime(2024, 1, 5, 15, 0)),   # newer than AAA's max -> keep
            ("BBB", datetime(2024, 1, 5, 15, 0)),   # older than BBB's max -> drop
            ("CCC", datetime(2024, 1, 5, 10, 0)),   # unseen symbol -> keep
        ],
        "symbol string, ts timestamp",
    )
    got = sorted(r.symbol for r in incremental_per_symbol(new, existing).collect())
    assert got == ["AAA", "CCC"]
