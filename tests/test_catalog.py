"""Catalog schema-normalization tests — the regression net for fixture
timestamp-encoding drift (the round-4 breakage class).

The events fixture has shipped as BOTH parquet ``timestamp[ns]`` (read as
long under ``nanosAsLong``) and ``timestamp[us]`` no-timezone (read as
TIMESTAMP_NTZ). ``catalog.fix_nanos_ts`` is the single choke point that
must normalize every encoding to TimestampType so `F.unix_micros` et al.
resolve; these tests pin that contract for all three encodings plus the
live fixture, so the next regeneration can't silently break 7 queries
again.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from us_stock_data_pipeline_spark.catalog import fix_nanos_ts, load_table

SF_DIR = "/root/testdata/sf0.001"

# One microsecond-aligned instant, expressed in each fixture encoding.
_EPOCH_US = 1_700_000_000_123_456  # 2023-11-14T22:13:20.123456Z


def test_live_fixture_ts_is_timestamp(spark):
    """Whatever encoding the current fixture uses, the catalog must hand
    queries a plain TIMESTAMP ts — and unix_micros must resolve on it."""
    ev = load_table(spark, SF_DIR, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType), (
        f"events.ts loaded as {ev.schema['ts'].dataType}; catalog must "
        "normalize to TimestampType"
    )
    # The exact call that broke in round 4 — must analyze and execute.
    row = ev.select(F.unix_micros("ts").alias("us")).agg(F.min("us")).first()
    assert row[0] is not None


def test_fix_nanos_ts_long_nanos_branch(spark):
    """timestamp[ns]-as-long encoding: exact ns->us truncation."""
    df = spark.createDataFrame(
        [(_EPOCH_US * 1000,)],
        StructType([StructField("ts", LongType())]),
    )
    out = fix_nanos_ts(df)
    assert isinstance(out.schema["ts"].dataType, TimestampType)
    assert out.select(F.unix_micros("ts")).first()[0] == _EPOCH_US


def test_fix_nanos_ts_ntz_branch(spark):
    """TIMESTAMP_NTZ encoding: instant-preserving cast under UTC session
    timezone (the round-4 regression case)."""
    naive = datetime.datetime(2023, 11, 14, 22, 13, 20, 123456)
    df = spark.createDataFrame(
        [(naive,)],
        StructType([StructField("ts", TimestampNTZType())]),
    )
    assert isinstance(df.schema["ts"].dataType, TimestampNTZType)
    out = fix_nanos_ts(df)
    assert isinstance(out.schema["ts"].dataType, TimestampType)
    # Session TZ is pinned UTC, so the NTZ wall-clock becomes the same
    # UTC instant — identical micros to the long-nanos encoding.
    assert out.select(F.unix_micros("ts")).first()[0] == _EPOCH_US


def test_fix_nanos_ts_timestamp_passthrough(spark):
    """A fixture already encoded as plain TIMESTAMP passes through."""
    aware = datetime.datetime(
        2023, 11, 14, 22, 13, 20, 123456, tzinfo=datetime.timezone.utc
    )
    df = spark.createDataFrame(
        [(aware,)],
        StructType([StructField("ts", TimestampType())]),
    )
    out = fix_nanos_ts(df)
    assert out is df  # no-op, not a rewritten plan
    assert out.select(F.unix_micros("ts")).first()[0] == _EPOCH_US


@pytest.mark.parametrize(
    "queryname",
    [
        "window_range_frame",
        "bars_ohlcv_resample",
        "bars_technical_indicators",
        "etl_sessionization_gaps",
    ],
)
def test_ntz_casualty_queries_analyze(spark, queryname):
    """The four pure-query round-4 casualties must at least pass analysis
    and produce a schema against the live fixture (execution correctness
    is the oracle gate's job; this pins the analysis-time regression)."""
    from us_stock_data_pipeline_spark import registry

    fn = registry.queries()[queryname]
    df = fn(spark, SF_DIR)
    assert len(df.schema.fields) > 0
    assert df.limit(1).count() >= 0


def test_ntz_cast_does_not_block_pushdown(spark):
    """The catalog's blanket NTZ->TIMESTAMP cast must stay transparent
    to predicate pushdown: a timestamp filter on orders must still
    reach the parquet scan as a PushedFilter (Catalyst pushes the
    instant-preserving cast onto the literal side)."""
    import pyspark.sql.functions as F

    df = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_orderdate") >= "2024-01-01"
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    assert "o_orderdate" in pushed, pushed
