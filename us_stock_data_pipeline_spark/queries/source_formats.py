"""Source-format connectors exercised end-to-end: newline-JSON and CSV
landing zones (the reference's REST pages, landed as files — SURVEY §2A
S1/S2 and etl/sources.py's RestLanding contract).

Each query STAGES the events fixture into a temp landing directory in the
format under test (once per sf_dir, Spark-written so it parallelizes),
then reads it back with an EXPLICIT schema — never inference — and
aggregates. The oracle runs the same aggregate on the original parquet,
so the check proves the full write->read roundtrip is lossless.

Timestamps are staged as epoch-micros longs: textual formats truncate
sub-millisecond precision (JSON/CSV timestamp formatting is
millisecond-default in Spark), and an integer column roundtrips exactly.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

_LANDED_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _stage_dir(sf_dir: str, fmt: str) -> str:
    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), "us_sdps_landing", key, fmt)


def _stage_events(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    """Land events as newline-JSON or headered CSV files, once per sf."""
    path = _stage_dir(sf_dir, fmt)
    marker = os.path.join(path, "_SUCCESS")
    src = os.path.join(sf_dir, "events.parquet")
    # Self-healing: restage when the fixture is newer than the marker, so
    # regenerated testdata can't be shadowed by a stale landing copy.
    if os.path.exists(marker) and os.stat(marker).st_mtime < os.stat(src).st_mtime:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
    if not os.path.exists(marker):
        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            "event_type",
            "value",
        )
        writer = ev.repartition(4).write.mode("overwrite")
        if fmt == "json":
            writer.json(path)
        else:
            writer.option("header", "true").csv(path)
    return path


_ROLLUP_ORACLE = """
SELECT
  event_type,
  count(*)                                   AS n_events,
  count(DISTINCT user_id)                    AS n_users,
  round(sum(value), 2)                       AS total_value,
  min(ts)                                    AS first_ts,
  max(ts)                                    AS last_ts
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def _landed_rollup(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    if fmt == "json":
        landed = spark.read.schema(_LANDED_SCHEMA).json(path)
    else:
        landed = spark.read.schema(_LANDED_SCHEMA).option("header", "true").csv(path)
    return (
        landed.withColumn("ts", F.timestamp_micros("ts_us"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("event_type")
    )


@register("source_json_scan", oracle=_ROLLUP_ORACLE, tags=("source", "json"))
def source_json_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newline-JSON landing-zone scan: page files land verbatim, Spark
    reads them with a declared schema (inference would need an extra full
    pass at 100 TB and can mistype sparse columns) and aggregates. The
    oracle aggregates the original parquet — a hash match proves the JSON
    write->read roundtrip lost nothing."""
    path = _stage_events(spark, sf_dir, "json")
    return _landed_rollup(spark, path, "json")


@register("source_csv_scan", oracle=_ROLLUP_ORACLE, tags=("source", "csv"))
def source_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headered-CSV landing-zone scan with explicit schema. Doubles
    roundtrip exactly (Spark writes shortest-round-trip decimal repr);
    timestamps travel as epoch-micros. Same oracle as the JSON path:
    format connectors must be interchangeable."""
    path = _stage_events(spark, sf_dir, "csv")
    return _landed_rollup(spark, path, "csv")


@register("source_orc_scan", oracle=_ROLLUP_ORACLE, tags=("source", "orc"))
def source_orc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC landing-zone scan — the third columnar-capable landing format
    (native Spark support, vectorized reader, predicate pushdown like
    parquet). Same rollup oracle: the format is an implementation
    detail, the result is not."""
    path = _stage_dir(sf_dir, "orc")
    marker = os.path.join(path, "_SUCCESS")
    src = os.path.join(sf_dir, "events.parquet")
    if os.path.exists(marker) and os.stat(marker).st_mtime < os.stat(src).st_mtime:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
    if not os.path.exists(marker):
        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            "event_type",
            "value",
        )
        ev.repartition(4).write.mode("overwrite").orc(path)
    landed = spark.read.schema(_LANDED_SCHEMA).orc(path)
    return (
        landed.withColumn("ts", F.timestamp_micros("ts_us"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("event_type")
    )
