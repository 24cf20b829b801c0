"""Round-46 relational, part 31: partition row-hash integrity
checksums for cross-system replication verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

_INTEGRITY_ORACLE = """
WITH hashed AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(('0x' || substring(md5(
           CAST(event_id AS VARCHAR) || '|' || event_type || '|'
           || CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR) || '|'
           || CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT) AS row_hash
  FROM events
)
SELECT day,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(row_hash) AS BIGINT) AS checksum_sum,
       CAST(bit_xor(row_hash) AS BIGINT) AS checksum_xor
FROM hashed
GROUP BY day
ORDER BY day
"""


@register("etl_row_hash_integrity", oracle=_INTEGRITY_ORACLE, tags=("etl", "ops"))
def etl_row_hash_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition integrity checksums — the cross-system reconciliation
    primitive: hash each row's canonical serialization (typed columns
    joined with a delimiter, money pre-quantized to cents so float
    formatting can't diverge), then reduce per day-partition with BOTH
    a sum and an xor — order-independent, mergeable reductions, so a
    replica on any engine recomputes them without coordinating row
    order, and a single changed/missing/duplicated row flips them
    (sum catches duplicates that xor cancels; xor catches pairs that
    sum cancels — together they are the cheap two-sided check). This
    is how a 100 TB table is compared across a migration WITHOUT
    moving it: ship per-partition (n_rows, sum, xor) triples — bytes,
    not data — and drill only into partitions that disagree
    (`etl_table_diff` is the row-level drill-down this screen
    schedules). One scan, one day-keyed aggregate."""
    ev = load_table(spark, sf_dir, "events")
    hashed = ev.select(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("event_id").cast("string"),
                        F.col("event_type"),
                        F.round(F.col("value") * 100).cast("long").cast("string"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("row_hash"),
    )
    return (
        hashed.groupBy("day")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("row_hash").cast("long").alias("checksum_sum"),
            F.expr("CAST(bit_xor(row_hash) AS BIGINT)").alias("checksum_xor"),
        )
        .orderBy("day")
    )
