"""Table loading for the engine's test catalog.

One parquet file per table under an ``sf_dir`` (see TESTDATA.md). Reads go
through ``spark.read.parquet`` so Catalyst gets vectorized parquet scans
with predicate pushdown, column pruning, and (for partitioned layouts)
partition pruning for free — mirroring the reference's read path
(`symbols(historical)/utils.py:7,17`) without its driver-side loops.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.session import ensure_session_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (their
# cardinality is fixed or near-fixed: 5 regions, 25 nations, ...). At 100 TB
# these are still KBs; broadcasting them removes shuffles from every join.
BROADCASTABLE = frozenset({"region", "nation", "supplier", "part"})


def fix_nanos_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the fixture's ``ts`` column to TimestampType, whatever
    parquet encoding the generator used. This is the ONE choke point for
    raw-timestamp schema drift — every query reads events through
    ``load_table``, so a regenerated fixture can change encodings without
    touching any query code. Handled encodings:

    - ``timestamp[ns]`` read as LongType under
      ``spark.sql.legacy.parquet.nanosAsLong`` (SPARK-40819): exact
      ns->us truncation via integral ``div`` (fixture values are
      microsecond-aligned, see FIXTURES.md).
    - ``timestamp[us]`` with no timezone, which Spark loads as
      TIMESTAMP_NTZ (``inferTimestampNTZ``): cast to TimestampType.
      The session timezone is pinned UTC (session.py), so the wall-clock
      fields are reinterpreted as UTC instants — identical values to the
      old encoding, and identical to what DuckDB's oracle sees.
    - plain TIMESTAMP: passes through untouched.
    """
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    if col in df.columns:
        dt = df.schema[col].dataType
        if isinstance(dt, LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
        elif isinstance(dt, TimestampNTZType):
            df = df.withColumn(col, F.col(col).cast(TimestampType()))
    return df


def normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast EVERY TimestampNTZ column to TimestampType. The fixture's
    parquet timestamps carry no timezone, so Spark loads them all as
    TIMESTAMP_NTZ (events.ts, lineitem.l_shipdate, orders.o_orderdate)
    — and epoch functions (unix_micros & co.) reject NTZ. The session
    timezone is pinned UTC, so the cast reinterprets the wall-clock
    fields as UTC instants: identical displayed values, identical
    DuckDB comparisons, and the full epoch-function surface works on
    every table — not just the events.ts special case the round-4
    regression first exposed."""
    from pyspark.sql.types import TimestampNTZType, TimestampType

    for f in df.schema.fields:
        if isinstance(f.dataType, TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast(TimestampType()))
    return df


# DataFrame handles memoized per (SESSION, file): building one costs
# ~90 ms of driver-side footer/schema reads, paid by EVERY query for
# EVERY table it touches (a 6-table join re-read 6 footers per call).
# DataFrames are immutable lazy plans, so reuse is safe; the cache is
# the engine's catalog — at cluster scale this is exactly what a
# metastore-backed table lookup amortizes. The OUTER key is the
# SparkSession itself (weakly referenced, so stopped/discarded sessions
# drop their entries): a DataFrame is BOUND to the session that created
# it and plans under that session's SQLConf, so serving one session's
# handle to another silently applies the wrong conf — round 7 hit
# exactly this when the AQE demos moved to isolated newSession()s and
# kept receiving main-session DataFrames whose planner ignored the
# bracket confs. The inner key carries the file's size + mtime, so a
# regenerated fixture self-heals instead of serving a stale listing.
from weakref import WeakKeyDictionary

_TABLE_CACHE: WeakKeyDictionary = WeakKeyDictionary()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; valid: {TABLES}")
    ensure_session_confs(spark)
    path = os.path.join(os.path.abspath(sf_dir), f"{name}.parquet")
    st = os.stat(path)
    per_session = _TABLE_CACHE.setdefault(spark, {})
    key = (path, st.st_size, st.st_mtime_ns)
    df = per_session.get(key)
    if df is None:
        df = spark.read.parquet(path)
        if name == "events":
            df = fix_nanos_ts(df)
        df = normalize_timestamps(df)
        per_session[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register temp views so queries can be expressed through spark.sql.

    Re-registration replaces the prior view, so switching ``sf_dir``
    mid-session (the driver does: sf0.001 smoke then sf0.01 correctness)
    is safe as long as every SQL-path query re-registers before querying.
    """
    ensure_session_confs(spark)
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
