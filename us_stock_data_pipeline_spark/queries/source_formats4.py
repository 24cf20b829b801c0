"""Source/ETL connectors, part 4: dynamic partition pruning.

`source_partitioned_scan` pins STATIC pruning (a literal partition-key
filter prunes at file listing). This module pins the DYNAMIC case: the
partition filter is not known until a dimension table is filtered at
runtime — Spark's DPP rewrites the scan to prune with the dim's
build-side values, the single most important join optimization for a
partitioned 100 TB fact table.

Staging follows source_formats2.py's contract (marker-gated, derived
from the fixture, self-healing on fixture change); oracles reconstruct
the result from the original parquet, never reading the staged copy.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register


def _stage_dir(sf_dir: str) -> str:
    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), "us_sdps_landing4", key, "dpp")


def _fresh(path: str, sf_dir: str) -> bool:
    marker = os.path.join(path, "_STAGED")
    src = os.path.join(sf_dir, "events.parquet")
    if os.path.exists(marker) and os.stat(marker).st_mtime >= os.stat(src).st_mtime:
        return True
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    return False


# The dim rows: every event type with a conversion flag and an integer
# revenue weight. Only the flagged types survive the dim filter — at
# plan time Spark cannot know which partitions that means; DPP injects
# the filtered dim's key values into the fact scan's PartitionFilters.
_DIM_ROWS = [
    ("click", 0, 1),
    ("view", 0, 1),
    ("purchase", 1, 5),
    ("signup", 1, 3),
    ("share", 0, 2),
]

_DPP_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT))
            * CASE event_type WHEN 'purchase' THEN 5 WHEN 'signup' THEN 3 ELSE 1 END
            AS BIGINT) AS weighted_cents
FROM events
WHERE event_type IN ('purchase', 'signup')
GROUP BY event_type
ORDER BY event_type
"""


@register("join_dynamic_partition_pruning", oracle=_DPP_ORACLE, tags=("join", "source", "partitioning"))
def join_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact table is laid out
    ``event_type=<v>/`` (the reference's symbol-partitioned layout,
    SURVEY §1.4), and the query filters it through a DIMENSION
    predicate (``is_conversion = 1``) — so which partitions survive
    is unknowable at plan time. Spark's DPP rule reuses the broadcast
    dim as a runtime IN-filter on the fact scan's partition column
    (`dynamicpruningexpression` inside PartitionFilters — asserted in
    tests/test_round10_plans.py), so the 3 non-conversion partitions
    are never listed or opened. On a 100 TB fact table behind a
    star-schema filter this is the optimization: static pruning can't
    fire (no literal), and without DPP the scan reads every
    partition to throw 60% of it away post-join. The staged layout is
    marker-gated and derived from the fixture; the oracle reconstructs
    the same result from the original parquet, proving the partitioned
    roundtrip + dim-filtered join lossless."""
    path = _stage_dir(sf_dir)
    if not _fresh(path, sf_dir):
        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            "value",
            "event_type",
        )
        ev.repartition(4).write.mode("overwrite").partitionBy("event_type").parquet(path)
        open(os.path.join(path, "_STAGED"), "w").close()
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        _DIM_ROWS, "d_event_type string, is_conversion int, revenue_weight long"
    )
    joined = fact.join(
        F.broadcast(dim.filter(F.col("is_conversion") == 1)),
        fact.event_type == F.col("d_event_type"),
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (
                F.sum(F.round(F.col("value") * 100).cast("long"))
                * F.first("revenue_weight")
            )
            .cast("long")
            .alias("weighted_cents"),
        )
        .orderBy("event_type")
    )
