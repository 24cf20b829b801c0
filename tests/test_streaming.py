"""Streaming semantics that need a multi-batch harness: watermark
late-data dropping and dropDuplicatesWithinWatermark (SURVEY §2B
streaming rows; the single-batch driver queries can't observe these)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def _write_batch(spark, src_dir, rows, n):
    spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long").coalesce(
        1
    ).write.mode("append").parquet(f"{src_dir}")
    # parquet append adds files; the file stream source picks up new ones.


def test_watermark_drops_late_rows(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    b1 = [(1, datetime(2024, 1, 1, 10, 0), 1),
          (2, datetime(2024, 1, 1, 12, 0), 1)]  # watermark after b1: 11:50
    spark.createDataFrame(b1, "event_id long, ts timestamp, user_id long").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = spark.readStream.schema("event_id long, ts timestamp, user_id long").parquet(src)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # Batch 2: one late row in the already-closed 10:00 window (must be
        # dropped) and one fresh row advancing the clock.
        b2 = [(3, datetime(2024, 1, 1, 10, 30), 1),   # LATE: < watermark 11:50
              (4, datetime(2024, 1, 1, 14, 0), 1)]
        spark.createDataFrame(b2, "event_id long, ts timestamp, user_id long").coalesce(
            1
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
        # one more empty-ish nudge so the 12:00 window can finalize
        b3 = [(5, datetime(2024, 1, 1, 16, 0), 1)]
        spark.createDataFrame(b3, "event_id long, ts timestamp, user_id long").coalesce(
            1
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["window"]["start"]: r["n"] for r in spark.table("wm_test").collect()
    }
    # The 10:00 window finalized with ONLY event 1 — the late row (event 3)
    # was dropped by the watermark, not merged.
    assert got.get(datetime(2024, 1, 1, 10, 0)) == 1, got


def test_drop_duplicates_within_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    rows = [(1, datetime(2024, 1, 1, 10, 0), 7),
            (1, datetime(2024, 1, 1, 10, 1), 7),   # dup id within watermark
            (2, datetime(2024, 1, 1, 10, 2), 7)]
    spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long").coalesce(
        1
    ).write.mode("append").parquet(src)
    stream = spark.readStream.schema("event_id long, ts timestamp, user_id long").parquet(src)
    dedup = stream.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(["event_id"])
    q = (
        dedup.writeStream.format("memory")
        .queryName("ddww_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    ids = sorted(r.event_id for r in spark.table("ddww_test").collect())
    assert ids == [1, 2]
