"""Source/ETL connectors, part 2 (round 5): parquet schema evolution
(mergeSchema), hive-partitioned landing zones with partition pruning,
and a data-quality quarantine gate.

Staging follows source_formats.py's contract: derived deterministically
from the events fixture, written once per sf_dir with a marker, and
self-healing when the fixture is newer than the staged copy. Oracles
never read the staged files — they reconstruct the same result from the
original parquet, so a hash match proves the staged roundtrip lossless.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register


def _stage_dir(sf_dir: str, kind: str) -> str:
    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), "us_sdps_landing2", key, kind)


def _fresh(path: str, sf_dir: str) -> bool:
    marker = os.path.join(path, "_STAGED")
    src = os.path.join(sf_dir, "events.parquet")
    if os.path.exists(marker) and os.stat(marker).st_mtime >= os.stat(src).st_mtime:
        return True
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    return False


def _mark(path: str) -> None:
    open(os.path.join(path, "_STAGED"), "w").close()


# --------------------------------------------------------------------------
# Parquet schema evolution (mergeSchema)
# --------------------------------------------------------------------------

_EVOLUTION_ORACLE = """
SELECT
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_evolved,
  CAST(count(CASE WHEN event_id % 2 = 1 THEN event_type END) AS BIGINT)
    AS n_with_type,
  round(sum(value), 2) AS total_value,
  CAST(count(DISTINCT CASE WHEN event_id % 2 = 1 THEN event_type END) AS BIGINT)
    AS n_types
FROM events
"""


@register("etl_schema_evolution", oracle=_EVOLUTION_ORACLE, tags=("etl", "source"))
def etl_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across parquet file generations: a v1 landing
    (event_id, ts_us, value) and a widened v2 (+event_type) live in the
    SAME dataset directory; ``mergeSchema=true`` reconciles them into
    one superset schema with nulls for pre-evolution rows — the
    standard additive-column migration every long-lived lake table goes
    through. At 100 TB the merge cost is footer-only (schema union over
    file footers, data never rewritten); the alternative — rewriting
    history to the new schema — is a full-corpus pass, which is exactly
    what this pattern exists to avoid. The oracle recomputes the same
    rollup from the original fixture: a hash match proves old rows
    surface with NULL evolved columns and new rows roundtrip intact."""
    path = _stage_dir(sf_dir, "evolution")
    if not _fresh(path, sf_dir):
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", F.unix_micros("ts").alias("ts_us"), "value", "event_type"
        )
        v1 = ev.filter(F.col("event_id") % 2 == 0).drop("event_type")
        v2 = ev.filter(F.col("event_id") % 2 == 1)
        v1.repartition(2).write.mode("overwrite").parquet(os.path.join(path, "gen=v1"))
        v2.repartition(2).write.mode("overwrite").parquet(os.path.join(path, "gen=v2"))
        _mark(path)
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(path, "gen=v1"), os.path.join(path, "gen=v2")
    )
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("event_id") % 2 == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_evolved"),
        F.count("event_type").cast("long").alias("n_with_type"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.countDistinct("event_type").alias("n_types"),
    )


# --------------------------------------------------------------------------
# Hive-partitioned landing with partition pruning
# --------------------------------------------------------------------------

_PARTITIONED_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
WHERE event_type IN ('click', 'purchase')
GROUP BY event_type
ORDER BY event_type
"""


@register("source_partitioned_scan", oracle=_PARTITIONED_ORACLE, tags=("source", "partitioning"))
def source_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned landing zone (``event_type=<v>/`` directories)
    read back with a partition-key filter. The filter prunes at the
    FILE LISTING level — `PartitionFilters` in the scan node, asserted
    in tests/test_source_formats2.py — so the 3 excluded partitions are
    never listed, opened, or scanned. At 100 TB partition pruning is
    the difference between touching 2/5 of the corpus and all of it
    before a single row filter runs; this is the reference's
    symbol-partitioned layout pattern (SURVEY §1.4) expressed through
    Spark's catalog-free hive layout discovery."""
    path = _stage_dir(sf_dir, "hive")
    if not _fresh(path, sf_dir):
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", F.unix_micros("ts").alias("ts_us"), "user_id", "value", "event_type"
        )
        ev.repartition(4).write.mode("overwrite").partitionBy("event_type").parquet(path)
        _mark(path)
    landed = spark.read.parquet(path)
    return (
        landed.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Data-quality quarantine gate
# --------------------------------------------------------------------------

_QUARANTINE_ORACLE = """
WITH planted AS (
  SELECT event_id,
         CASE WHEN event_id % 11 = 0 THEN -value ELSE value END AS value,
         CASE WHEN event_id % 13 = 0 THEN NULL ELSE user_id END AS user_id,
         CASE WHEN event_id % 17 = 0 THEN 'zzz_invalid' ELSE event_type END
           AS event_type
  FROM events
),
flagged AS (
  SELECT
    CASE WHEN value < 0 THEN 1 ELSE 0 END AS v_value,
    CASE WHEN user_id IS NULL THEN 1 ELSE 0 END AS v_user,
    CASE WHEN event_type NOT IN ('click', 'error', 'purchase', 'signup', 'view')
         THEN 1 ELSE 0 END AS v_type
  FROM planted
)
SELECT
  CAST(count(*) AS BIGINT) AS n_total,
  CAST(sum(CASE WHEN v_value + v_user + v_type = 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_clean,
  CAST(sum(v_value) AS BIGINT) AS n_value_viol,
  CAST(sum(v_user) AS BIGINT) AS n_user_viol,
  CAST(sum(v_type) AS BIGINT) AS n_type_viol,
  CAST(sum(CASE WHEN v_value + v_user + v_type >= 2 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_multi_viol
FROM flagged
"""


@register("etl_quarantine_validation", oracle=_QUARANTINE_ORACLE, tags=("etl", "quality"))
def etl_quarantine_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality quarantine gate: every row is scored against a rule
    set (value sign, key null-ness, domain membership) in ONE pass and
    the gate report counts clean rows, per-rule violations, and
    multi-rule rows. The fixture is clean, so violations are PLANTED
    deterministically in-query (the pii_redact trick) with identical
    expressions in the oracle. All rules are codegen CASE arithmetic —
    at 100 TB validation runs at scan bandwidth map-side and only the
    1-row report shuffles; the same flag columns would route rows to
    clean/quarantine sinks via partitionBy without a second scan."""
    ev = load_table(spark, sf_dir, "events")
    planted = ev.select(
        "event_id",
        F.when(F.col("event_id") % 11 == 0, -F.col("value"))
        .otherwise(F.col("value"))
        .alias("value"),
        F.when(F.col("event_id") % 13 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("user_id"))
        .alias("user_id"),
        F.when(F.col("event_id") % 17 == 0, F.lit("zzz_invalid"))
        .otherwise(F.col("event_type"))
        .alias("event_type"),
    )
    v_value = F.when(F.col("value") < 0, 1).otherwise(0)
    v_user = F.when(F.col("user_id").isNull(), 1).otherwise(0)
    v_type = F.when(
        ~F.col("event_type").isin("click", "error", "purchase", "signup", "view"), 1
    ).otherwise(0)
    flagged = planted.select(
        v_value.alias("v_value"), v_user.alias("v_user"), v_type.alias("v_type")
    )
    n_viol = F.col("v_value") + F.col("v_user") + F.col("v_type")
    return flagged.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(n_viol == 0, 1).otherwise(0)).cast("long").alias("n_clean"),
        F.sum("v_value").cast("long").alias("n_value_viol"),
        F.sum("v_user").cast("long").alias("n_user_viol"),
        F.sum("v_type").cast("long").alias("n_type_viol"),
        F.sum(F.when(n_viol >= 2, 1).otherwise(0)).cast("long").alias("n_multi_viol"),
    )
