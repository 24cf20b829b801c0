"""SparkSession factory tuned for the target execution model.

Local mode here is only the test bed; every knob is chosen so the same
logical plans survive a 1000-executor cluster at ~100 TB:

- AQE on (runtime partition coalescing, skew-join splitting, dynamic
  join-strategy downgrade to broadcast when a shuffle side turns out small),
- shuffle partitions sized to the local core count (on a real cluster this
  is left to AQE's coalescing from a high initial number),
- session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle and are cluster-invariant,
- Arrow enabled so any Pandas-UDF path is vectorized batch transfer,
  never row-at-a-time pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def default_shuffle_partitions() -> int:
    """Shuffle partition count for the LOCAL test bed.

    Measured at sf0.1: with per-partition data in the low-MB range, task
    scheduling overhead dominates past ~8 reduce tasks (headline set:
    21.1 s at 32 partitions -> 16.2 s at 8; concurrent wall 6.7 s -> 3.3 s).
    On a real cluster this knob instead starts HIGH (e.g. 2000) and AQE
    coalesces down per stage — the local value only right-sizes the test
    bed, the plans themselves are partition-count-agnostic.
    """
    cpus = default_parallelism()
    return int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", max(8, cpus // 4)))


def get_spark(app_name: str = "us-stock-data-pipeline-spark", profile: str = "local") -> SparkSession:
    """Build (or fetch) a SparkSession for the given deployment profile.

    ``local`` (default) right-sizes shuffle width and scheduling for the
    single-JVM test bed. ``cluster`` leaves shuffle width high (2000)
    for AQE to coalesce per stage and keeps FIFO scheduling — the knobs
    a real deployment sets via spark-submit; the profile arg exists so
    the local-bench tuning is an explicit choice, not a baked-in
    assumption (plans themselves are identical under both profiles)."""
    cpus = default_parallelism()
    shuffle = default_shuffle_partitions() if profile == "local" else 2000
    scheduler = "FAIR" if profile == "local" else "FIFO"
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.scheduler.mode", scheduler)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Favor the advisory partition size over max parallelism when
        # coalescing (the setting Spark's own docs recommend for real
        # clusters): tiny post-shuffle stages collapse to few tasks
        # instead of fanning out scheduler overhead.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        # Advisory post-shuffle partition size. The 64m Spark default
        # collapses the sf0.1 window/join stages (10-30 MB) to a single
        # task, serializing the heaviest queries; 8m keeps them 2-4-way
        # parallel while trivial stages still coalesce to one task.
        # Env-tunable so the bench can A/B it without a code change.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PART", "8m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.selfDestruct.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def ensure_session_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to a session we did not build.

    The correctness driver hands us its own SparkSession; timezone and
    Arrow are runtime-configurable, so pin them here for oracle parity.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    # A driver-provided session defaults to 200 shuffle partitions —
    # oversized for local test scale; AQE still re-splits if data demands.
    spark.conf.set("spark.sql.shuffle.partitions", str(default_shuffle_partitions()))
    # The events fixture stores TIMESTAMP(NANOS) which Spark's parquet
    # reader rejects by default (SPARK-40819); read nanos as long and
    # convert in catalog.load_table (values are microsecond-aligned).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark
