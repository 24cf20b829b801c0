"""End-to-end test of the CLI ingest driver: land NDJSON pages, run full
then incremental loads, assert layout, idempotency, and per-symbol
watermark semantics."""

from __future__ import annotations

import json
import os

from us_stock_data_pipeline_spark.etl.run import build_parser, run


def _land(dirpath, rows):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, "page-000.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _bar(t_ms, symbol, px=10.0, vol=100.0):
    return {"t": t_ms, "o": px, "h": px + 1, "l": px - 1, "c": px, "v": vol, "vw": px, "n": 5.0}


def test_cli_full_then_incremental(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "silver")
    # 2024-01-02 15:00 UTC = 10:00 ET (regular session)
    t0 = 1704207600000
    _land(landing, [dict(_bar(t0 + i * 60_000, "AAPL"), symbol="AAPL") for i in range(3)]
          + [dict(_bar(t0, "MSFT"), symbol="MSFT")])

    args = build_parser().parse_args(["--landing", landing, "--out", out])
    res = run(spark, args)
    assert res["rows_written"] == 4
    # hive layout: session=regular/symbol=AAPL
    assert os.path.isdir(os.path.join(out, "session=regular", "symbol=AAPL"))

    first = spark.read.parquet(out)
    assert first.count() == 4
    assert dict(first.dtypes)["volume"] == "bigint"  # AGG_SCHEMA enforced

    # incremental re-run over the SAME landing: everything filtered by the
    # per-symbol watermark -> no new rows, no duplicate rows
    args2 = build_parser().parse_args(
        ["--landing", landing, "--out", out, "--load-type", "incremental"]
    )
    res2 = run(spark, args2)
    assert res2["rows_written"] == 0
    assert spark.read.parquet(out).count() == 4

    # land one newer AAPL bar and one stale MSFT bar: only the newer one
    # survives incremental (per-symbol, strict >)
    landing2 = str(tmp_path / "landing2")
    _land(
        landing2,
        [
            dict(_bar(t0 + 10 * 60_000, "AAPL"), symbol="AAPL"),
            dict(_bar(t0, "MSFT"), symbol="MSFT"),
        ],
    )
    args3 = build_parser().parse_args(
        ["--landing", landing2, "--out", out, "--load-type", "incremental"]
    )
    res3 = run(spark, args3)
    assert res3["rows_written"] == 1
    final = spark.read.parquet(out)
    assert final.count() == 5
    assert final.filter("symbol = 'MSFT'").count() == 1


def test_cli_new_symbol_passes_watermark(spark, tmp_path):
    landing = str(tmp_path / "l1")
    out = str(tmp_path / "s1")
    t0 = 1704207600000
    _land(landing, [dict(_bar(t0, "AAPL"), symbol="AAPL")])
    run(spark, build_parser().parse_args(["--landing", landing, "--out", out]))

    landing2 = str(tmp_path / "l2")
    _land(landing2, [dict(_bar(t0 - 86_400_000, "NVDA"), symbol="NVDA")])
    res = run(
        spark,
        build_parser().parse_args(
            ["--landing", landing2, "--out", out, "--load-type", "incremental"]
        ),
    )
    # NVDA has no watermark: its (older-than-AAPL) rows still load — the
    # reference's global max would have dropped them (SURVEY §3 EP3)
    assert res["rows_written"] == 1


def test_corrupt_json_rows_isolated(spark, tmp_path):
    """Malformed landing rows must not fail the load NOR silently vanish:
    PERMISSIVE mode + a corrupt-record column isolates them for a
    quarantine sink while clean rows proceed — the 100 TB posture, where
    one bad page out of millions must not kill the nightly load."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    with open(os.path.join(landing, "page.json"), "w") as f:
        f.write('{"t": 1704207600000, "o": 10.0, "symbol": "AAPL"}\n')
        f.write('{"t": "not-a-number", "o": 10.0, "symbol": "AAPL"}\n')
        f.write("this is not json at all\n")

    schema = T.StructType(
        [
            T.StructField("t", T.LongType()),
            T.StructField("o", T.DoubleType()),
            T.StructField("symbol", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(landing)
        .cache()  # SPARK-21610: corrupt-record column needs materialization
    )
    clean = df.filter(F.col("_corrupt_record").isNull())
    quarantine = df.filter(F.col("_corrupt_record").isNotNull())
    assert clean.count() == 1
    assert quarantine.count() == 2
    df.unpersist()


def test_determine_window_branches():
    """Parity C1 (`symbols(historical)/utils.py:25-58`): explicit window,
    timeframe-dependent default backfill, incremental overlap-by-one-day,
    and the three error branches."""
    import datetime as dt

    import pytest

    from us_stock_data_pipeline_spark.etl.run import determine_window

    today = dt.date(2026, 8, 13)
    # full + explicit window -> verbatim
    assert determine_window("full", "1m", "2024-01-01", "2024-02-01", today=today) == (
        "2024-01-01",
        "2024-02-01",
    )
    # full defaults: minute bars from 2015, daily bars from 2000
    assert determine_window("full", "1m", today=today) == ("2015-01-01", "2026-08-13")
    assert determine_window("full", "1d", today=today) == ("2000-01-01", "2026-08-13")
    with pytest.raises(ValueError, match="Unsupported timeframe"):
        determine_window("full", "5s", today=today)
    # incremental: one-day overlap before the stored max (the per-symbol
    # watermark filter dedups the overlap downstream)
    mx = dt.datetime(2026, 8, 10, 19, 59)
    assert determine_window("incremental", "1m", existing_max_ts=mx, today=today) == (
        "2026-08-09",
        "2026-08-13",
    )
    with pytest.raises(ValueError, match="No existing data"):
        determine_window("incremental", "1m", today=today)
    with pytest.raises(ValueError, match="Invalid load_type"):
        determine_window("refresh", "1m", today=today)


def test_ingest_metrics_are_single_pass(spark, tmp_path, monkeypatch):
    """rows_written must come from an Observation on the write job, not a
    separate count() scan: a count() anywhere in the ingest path fails
    the run (at 100 TB the old count-then-write was a full extra pass)."""
    from pyspark.sql import DataFrame

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "silver")
    t0 = 1704207600000
    _land(landing, [dict(_bar(t0 + i * 60_000, "AAPL"), symbol="AAPL") for i in range(5)])

    def _no_count(self):
        raise AssertionError("count() called in the ingest path")

    monkeypatch.setattr(DataFrame, "count", _no_count)
    res = run(spark, build_parser().parse_args(["--landing", landing, "--out", out]))
    assert res["rows_written"] == 5
