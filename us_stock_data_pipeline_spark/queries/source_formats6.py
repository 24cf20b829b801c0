"""Round-31 sources, part 6: parser-level corrupt-record handling and a
snapshot-retention GC plan — the unglamorous ingest-operations surface
a production landing zone cannot run without.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register
from us_stock_data_pipeline_spark.session import ensure_session_confs

# --------------------------------------------------------------------------
# Corrupt-record CSV ingest (PERMISSIVE mode)
# --------------------------------------------------------------------------

# Planted corruption: every event_id % 13 == 0 line loses its value
# column's digits ("#bad#"), every % 17 == 0 line mangles its id into
# a non-numeric token (a typed-parse failure — Spark's CSV reader
# IGNORES extra trailing columns in permissive mode, so ragged lines
# alone would not trip the rescue column). Both engines derive
# expectations from the same rules.
_CORRUPT_ORACLE = """
WITH flags AS (
  SELECT event_id,
         CASE WHEN event_id % 13 = 0 OR event_id % 17 = 0 THEN 1 ELSE 0 END
           AS is_bad
  FROM events
)
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(1 - is_bad) AS BIGINT) AS n_parsed,
       CAST(sum(is_bad) AS BIGINT) AS n_corrupt,
       (SELECT CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        FROM events e JOIN flags f ON f.event_id = e.event_id
        WHERE f.is_bad = 0) AS clean_total_cents
FROM flags
"""


@register("source_csv_corrupt_records", oracle=_CORRUPT_ORACLE, tags=("source", "etl"))
def source_csv_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE-mode ingest of a CSV landing file with PLANTED
    corruption (non-numeric values on the %13 lines, non-numeric ids
    on the %17 lines): the parser keeps every line, nulls the unparsable
    columns (typed-field failures), and reserves the `_corrupt_record`
    rescue column for structurally malformed lines — the production alternative to FAILFAST (one bad vendor
    line kills a 10-hour backfill) and to DROPMALFORMED (silently
    losing data with no audit trail). The output reconciles: parsed +
    corrupt == total lines, and the clean-line value total matches the
    oracle's expectation from the same planting rules. Scale note: the
    rescue column is per-ROW overhead only on bad rows; the quarantine
    write (bad rows -> a review location) is the same partitioned sink
    every other landing uses."""
    ensure_session_confs(spark)
    src = os.path.join(sf_dir, "events.parquet")
    stage = os.path.join(
        tempfile.gettempdir(),
        "us_sdps_corrupt_csv",
        hashlib.sha1(sf_dir.encode()).hexdigest()[:12],
    )
    csv_dir = os.path.join(stage, "landing")
    src_stat = os.stat(src)
    marker = os.path.join(stage, "_staged_ok")
    if not (
        os.path.exists(marker) and os.stat(marker).st_mtime >= src_stat.st_mtime
    ):
        # stage the raw lines DISTRIBUTED (write.text): corruption is a
        # per-line CASE, so no driver loop touches the data — the
        # parser-breaking extra column can't come from a CSV writer,
        # which is exactly why landing zones see it from vendors
        lines = load_table(spark, sf_dir, "events").select(
            F.expr(
                "CASE WHEN event_id % 13 = 0 THEN"
                "   concat(event_id, ',', event_type, ',#bad#')"
                " WHEN event_id % 17 = 0 THEN"
                "   concat('E', event_id, ',', event_type, ',',"
                "          CAST(value AS STRING))"
                " ELSE concat(event_id, ',', event_type, ',', CAST(value AS STRING))"
                " END"
            ).alias("value")
        )
        lines.write.mode("overwrite").text(csv_dir)
        os.makedirs(stage, exist_ok=True)
        with open(marker, "w") as fh:
            fh.write("ok")
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    landed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(csv_dir)
    )
    # PERMISSIVE nulls a typed field that fails conversion WITHOUT
    # setting _corrupt_record (the rescue column fires on structurally
    # malformed lines), so the audit combines all three signals:
    # rescue column, unparseable id, unparseable value
    flagged = landed.select(
        "event_id",
        F.expr("try_cast(value AS DOUBLE)").alias("value_d"),
        (
            F.col("_corrupt_record").isNotNull()
            | F.col("event_id").isNull()
            | F.expr("try_cast(value AS DOUBLE)").isNull()
        ).alias("is_bad"),
    )
    return flagged.agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.when(~F.col("is_bad"), 1).otherwise(0)).cast("long").alias("n_parsed"),
        F.sum(F.when(F.col("is_bad"), 1).otherwise(0)).cast("long").alias("n_corrupt"),
        F.sum(F.when(~F.col("is_bad"), F.round(F.col("value_d") * 100).cast("long")))
        .cast("long")
        .alias("clean_total_cents"),
    )


# --------------------------------------------------------------------------
# Snapshot-retention GC plan
# --------------------------------------------------------------------------

_KEEP_DAILY = 7
_KEEP_WEEKLY = 4

_GC_ORACLE = f"""
WITH snaps AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS snap_day FROM events
),
latest AS (SELECT max(snap_day) AS head FROM snaps),
classified AS (
  SELECT s.snap_day,
         row_number() OVER (ORDER BY s.snap_day DESC) AS recency_rank,
         CASE WHEN date_part('dow', s.snap_day) = 0 THEN 1 ELSE 0 END AS is_sunday,
         CASE WHEN date_part('dow', s.snap_day) = 0 THEN
           row_number() OVER (PARTITION BY (CASE WHEN date_part('dow', s.snap_day) = 0
                                            THEN 1 ELSE 0 END)
                              ORDER BY s.snap_day DESC)
         END AS sunday_rank
  FROM snaps s
)
SELECT snap_day,
       CASE
         WHEN recency_rank <= {_KEEP_DAILY} THEN 'keep-daily'
         WHEN is_sunday = 1 AND sunday_rank <= {_KEEP_WEEKLY} THEN 'keep-weekly'
         ELSE 'delete'
       END AS action,
       CAST(recency_rank AS BIGINT) AS recency_rank
FROM classified
ORDER BY snap_day
"""


@register("etl_snapshot_retention_gc", oracle=_GC_ORACLE, tags=("etl", "ops"))
def etl_snapshot_retention_gc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-retention garbage collection plan — the Delta/Iceberg
    VACUUM policy expressed as a query: keep the last {_KEEP_DAILY}
    daily snapshots, keep the last {_KEEP_WEEKLY} Sunday snapshots
    beyond that, delete the rest, with each snapshot labeled by the
    rule that saved it (the audit column a retention review needs —
    "why does this snapshot still exist?"). The snapshot manifest
    derives from the event calendar; the classification is two rank
    windows over an O(snapshots) table. A real deployment feeds the
    'delete' rows to the storage reaper — the same manifest-driven
    pattern as etl_deletion_manifest, applied to table versions
    instead of subjects."""
    snaps = (
        load_table(spark, sf_dir, "events")
        .select(F.date_trunc("day", "ts").cast("date").alias("snap_day"))
        .distinct()
    )
    from pyspark.sql import Window

    w_rec = Window.orderBy(F.col("snap_day").desc())
    is_sunday = F.when(F.dayofweek("snap_day") == 1, 1).otherwise(0)
    classified = snaps.select(
        "snap_day",
        F.row_number().over(w_rec).alias("recency_rank"),
        is_sunday.alias("is_sunday"),
    ).withColumn(
        "sunday_rank",
        F.when(
            F.col("is_sunday") == 1,
            F.row_number().over(
                Window.partitionBy("is_sunday").orderBy(F.col("snap_day").desc())
            ),
        ),
    )
    return classified.select(
        "snap_day",
        F.when(F.col("recency_rank") <= _KEEP_DAILY, "keep-daily")
        .when(
            (F.col("is_sunday") == 1) & (F.col("sunday_rank") <= _KEEP_WEEKLY),
            "keep-weekly",
        )
        .otherwise("delete")
        .alias("action"),
        F.col("recency_rank").cast("long").alias("recency_rank"),
    ).orderBy("snap_day")
