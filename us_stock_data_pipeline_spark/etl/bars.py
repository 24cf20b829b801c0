"""Bronze -> silver bar transforms, session semantics, incremental loads.

Every function here is the Spark-native re-expression of a reference
behavior (file:line cited per function); differences are deliberate fixes
noted inline (long casts enforced, per-symbol watermarks, one-pass
session labeling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.etl.schemas import RAW_SCHEMA, SESSION_BANDS


def raw_rows_to_df(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """list-of-dicts -> typed DataFrame under the explicit RAW_SCHEMA
    (parity S4: `ingest_massive.py:121`, `ingest_1m_session.py:240`).

    The reference pre-coerces each row in driver Python
    (`polygon_client.py:100-120` "so Spark doesn't explode on type
    mismatch"); with an explicit schema Spark's conversion already
    null-preserves and int/float-coerces, so the driver-side loop is
    unnecessary — and at scale rows should land as files, not driver
    memory (see sources.py).
    """
    return spark.createDataFrame(rows, schema=RAW_SCHEMA)


def curate(df: DataFrame, symbol: str | None = None) -> DataFrame:
    """Raw wire bars -> curated silver bars (parity P1-P3:
    `ingest_massive.py:125-138` / `ingest_1m_session.py:242-256`).

    - `timestamp_millis(t)` replaces the reference's
      `(col("t")/1000).cast("timestamp")` (`ingest_massive.py:127`) —
      same UTC instant, no double round-trip.
    - volume/trades are cast to long, ENFORCING the AGG_SCHEMA contract
      the reference declares but never applies
      (`1m-seesion-pipeline/schemas.py:23-41`).
    - symbol arrives as a literal per ingest batch (P1) or as an existing
      column for file-landed multi-symbol input.
    """
    sym = F.lit(symbol) if symbol is not None else F.col("symbol")
    return df.select(
        F.timestamp_millis("t").alias("ts"),
        sym.cast("string").alias("symbol"),
        F.col("o").cast("double").alias("open"),
        F.col("h").cast("double").alias("high"),
        F.col("l").cast("double").alias("low"),
        F.col("c").cast("double").alias("close"),
        F.col("v").cast("long").alias("volume"),
        F.col("vw").cast("double").alias("vwap"),
        F.col("n").cast("long").alias("trades"),
    )


def add_et_columns(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """UTC -> America/New_York wall clock + hhmm encoding (parity P4/P5:
    `1m-seesion-pipeline/utils.py:3-5`). DST-correct by construction —
    `from_utc_timestamp` consults the tz database."""
    ts_et = F.from_utc_timestamp(F.col(ts_col), "America/New_York")
    return df.withColumn("ts_et", ts_et).withColumn(
        "hhmm", F.hour("ts_et") * 100 + F.minute("ts_et")
    )


def session_label(hhmm: F.Column) -> F.Column:
    """Session as ONE when/otherwise expression over the inclusive hhmm
    bands (parity F1: `1m-seesion-pipeline/utils.py:7-19`). The reference
    filters the same data once per session into three tables; labeling in
    a single pass makes session a partition column instead — one scan,
    and readers still prune by session."""
    expr = F.lit("closed")
    for name in ("afterhours", "regular", "premarket"):
        lo, hi = SESSION_BANDS[name]
        expr = F.when(hhmm.between(lo, hi), name).otherwise(expr)
    return expr


def with_session(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    out = add_et_columns(df, ts_col)
    return out.withColumn("session", session_label(F.col("hhmm")))


def filter_session(df: DataFrame, session_name: str, ts_col: str = "ts") -> DataFrame:
    """Band filter with the reference's exact quirk preserved: an unknown
    session name is a PASSTHROUGH, not an error
    (`1m-seesion-pipeline/utils.py:18-19` falls through to `return df`)."""
    if session_name not in SESSION_BANDS:
        return df
    lo, hi = SESSION_BANDS[session_name]
    out = add_et_columns(df, ts_col)
    return out.filter(F.col("hhmm").between(lo, hi)).drop("ts_et", "hhmm")


def incremental_filter(df: DataFrame, max_ts, ts_col: str = "ts") -> DataFrame:
    """Strictly-newer-than-watermark filter (parity F2:
    `ingest_massive.py:140-141`): at-least-once refetch (overlap window)
    + strict `>` = exactly-once append."""
    return df.filter(F.col(ts_col) > F.lit(max_ts))


def per_symbol_watermarks(existing: DataFrame, ts_col: str = "ts") -> DataFrame:
    """(symbol, max ts) per symbol — the fix for the reference's
    global-max incremental bug (SURVEY §3 EP3: `utils.py:13-19` takes one
    global max, so a crash mid-backfill silently loses the gap for
    lagging symbols). One small aggregate, broadcastable at any scale."""
    return existing.groupBy("symbol").agg(F.max(ts_col).alias("max_ts"))


def incremental_per_symbol(new_data: DataFrame, existing: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Keep rows strictly newer than THEIR symbol's watermark; symbols
    never seen before pass entirely (left join -> null watermark)."""
    wm = per_symbol_watermarks(existing, ts_col)
    return (
        new_data.join(F.broadcast(wm), "symbol", "left")
        .filter(F.col("max_ts").isNull() | (F.col(ts_col) > F.col("max_ts")))
        .drop("max_ts")
    )
