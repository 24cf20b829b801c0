"""Structured Streaming operators, driven to completion over the events
parquet so each returns a plain (checkable) batch DataFrame.

Pattern: ``readStream`` (file source, explicit schema) -> streaming
transform -> memory sink with ``availableNow`` trigger -> return the sink
table. In production the same plans run unchanged against Kafka/file
streams with checkpointed state; the parquet fixture stands in as the
source (the reference's REST-poll loop is exactly this file-landing
pattern at scale — SURVEY §2A S1/S2).

Watermark semantics note: with a single availableNow batch, watermarks
only advance AFTER the batch, so append-mode operators emit nothing for
in-batch data by design. We therefore check append-mode watermark
behavior (late-row dropping across batches) in tests/test_streaming.py
with a two-batch harness, and keep the oracle-checked queries in
complete/update-compatible shapes.
"""

from __future__ import annotations

import hashlib
import itertools
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.registry import register

_SINK_IDS = itertools.count()

# staged-path -> parquet schema: the footer-read job that resolved the
# stream schema used to run on EVERY query invocation, paying one extra
# Spark job inside each bench rep's timed region (part of the
# stream_tumbling_window volatility VERDICT r10 #8 flagged). The staged
# file is content-keyed by (size, mtime) below, so invalidate on either.
_SCHEMA_CACHE: dict[tuple[str, int, float], object] = {}


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_stock_data_pipeline_spark.catalog import fix_nanos_ts
    from us_stock_data_pipeline_spark.session import ensure_session_confs

    ensure_session_confs(spark)
    path = os.path.join(sf_dir, "events.parquet")
    # The file stream source requires a directory; stage the fixture file
    # into a per-sf_dir temp dir (this mirrors production, where a landing
    # DIRECTORY accumulates files and the source tails it).
    if os.path.isdir(path):
        # already a directory of part files (e.g. the scale tool's
        # inflated fixture): stream straight from it, no staging copy
        skey = (path, 0, 0.0)
        schema = _SCHEMA_CACHE.get(skey)
        if schema is None:
            schema = spark.read.parquet(path).schema
            _SCHEMA_CACHE[skey] = schema
        return fix_nanos_ts(spark.readStream.schema(schema).parquet(path))
    stage = os.path.join(
        tempfile.gettempdir(), "us_sdps_stream", hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    )
    staged = os.path.join(stage, "events.parquet")
    # Self-healing: restage when the source file changed (size or mtime) so
    # regenerated testdata can't be shadowed by a stale copy.
    src_stat = os.stat(path)
    if (
        not os.path.exists(staged)
        or os.stat(staged).st_size != src_stat.st_size
        or os.stat(staged).st_mtime < src_stat.st_mtime
    ):
        os.makedirs(stage, exist_ok=True)
        shutil.copyfile(path, staged)
    skey = (staged, os.stat(staged).st_size, os.stat(staged).st_mtime)
    schema = _SCHEMA_CACHE.get(skey)
    if schema is None:
        schema = spark.read.parquet(staged).schema
        _SCHEMA_CACHE[skey] = schema
    return fix_nanos_ts(spark.readStream.schema(schema).parquet(stage))


def _run_to_table(sdf: DataFrame, spark: SparkSession, mode: str) -> DataFrame:
    name = f"stream_sink_{next(_SINK_IDS)}"
    # Stateful streaming creates one state store per shuffle partition; at
    # this fixture's state cardinality (thousands of keys) store
    # open/commit overhead dominates past a few stores (measured at
    # sf0.1: 1.7s @ 8 stores, 1.4s @ 4, 1.3s @ 2 — 4 balances overhead
    # against keeping real parallel state machinery exercised). On a
    # real cluster this is sized to executor count x a small factor —
    # state store count is a fixed choice per checkpoint, so it's set
    # before the query starts.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


@register(
    "stream_tumbling_window",
    oracle="""
SELECT
  make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS window_start,
  make_timestamp((epoch_us(ts) // 3600000000) * 3600000000 + 3600000000) AS window_end,
  event_type,
  count(*)             AS n_events,
  round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2, 3
ORDER BY window_start, event_type
""",
    tags=("streaming",),
    bench=True,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window per event type (streaming
    groupBy(window(...)) — SURVEY §2B streaming:tumbling). State is keyed
    by (window, type): bounded by time range, not input size; at scale the
    same query runs continuously with a watermark to expire state."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    out = _run_to_table(agg, spark, "complete")
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "event_type",
        "n_events",
        "total_value",
    ).orderBy("window_start", "event_type")


@register(
    "stream_sliding_window",
    oracle="""
WITH anchored AS (
  SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000) AS slot, value FROM events
  UNION ALL
  SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000 - 1800000000), value FROM events
)
SELECT
  slot                        AS window_start,
  slot + INTERVAL 1 HOUR      AS window_end,
  count(*)                    AS n_events,
  round(sum(value), 2)        AS total_value
FROM anchored
GROUP BY 1, 2
ORDER BY window_start
""",
    tags=("streaming",),
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h length, 30 min slide): every event lands in two
    overlapping windows. The oracle expands the two anchor buckets
    explicitly — same semantics, pure SQL."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    out = _run_to_table(agg, spark, "complete")
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "n_events",
        "total_value",
    ).orderBy("window_start")


@register(
    "stream_session_window",
    oracle="""
WITH flagged AS (
  SELECT
    user_id, ts, event_id, value,
    CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT *,
    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
      AS sid
  FROM flagged
)
SELECT
  user_id,
  min(ts)                     AS session_start,
  max(ts) + INTERVAL 30 MINUTE AS session_end,
  count(*)                    AS n_events,
  round(sum(value), 2)        AS session_value
FROM numbered
GROUP BY user_id, sid
ORDER BY user_id, session_start
""",
    tags=("streaming", "session"),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (30 min inactivity gap) via the native
    session_window operator. Spark defines session end = last event + gap;
    the oracle is the batch gaps-and-islands formulation with the same
    end semantics — streaming state machine vs batch window functions,
    identical results."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
    )
    out = _run_to_table(agg, spark, "complete")
    return out.select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_events",
        "session_value",
    ).orderBy("user_id", "session_start")


@register(
    "stream_dedup",
    oracle="""
SELECT DISTINCT user_id, event_type
FROM events
ORDER BY user_id, event_type
""",
    tags=("streaming", "dedup"),
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup: dropDuplicates on the key columns keeps
    the first arrival per key across the whole stream (state = one entry
    per distinct key; production bounds it with
    dropDuplicatesWithinWatermark — exercised in tests)."""
    ev = _events_stream(spark, sf_dir)
    dedup = ev.select("user_id", "event_type").dropDuplicates(["user_id", "event_type"])
    out = _run_to_table(dedup, spark, "append")
    return out.orderBy("user_id", "event_type")


@register(
    "stream_stateful_running_totals",
    oracle="""
SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events
GROUP BY user_id
ORDER BY user_id
""",
    tags=("streaming", "stateful"),
)
def stream_stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-key running (count, sum) state updated batch-by-batch in an
    Arrow-vectorized kernel — the escape hatch for stateful logic the
    built-in streaming aggregates can't express (the reference's
    incremental bookkeeping, per-key EMA, dedup-with-TTL all take this
    shape). State lives in the state store keyed by user_id; with one
    availableNow batch the emitted running totals equal the batch
    aggregate, which is exactly what the oracle checks."""
    import pandas as pd

    def running_totals(key, pdfs, state):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(s, 2)]}
        )

    ev = _events_stream(spark, sf_dir)
    out_stream = (
        ev.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            running_totals,
            outputStructType="user_id long, n_events long, total_value double",
            stateStructType="n long, s double",
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )
    out = _run_to_table(out_stream, spark, "append")
    return out.orderBy("user_id")


def _events_stream_multibatch(spark: SparkSession, sf_dir: str, n_files: int = 3) -> DataFrame:
    """File-source stream over the events fixture split into ``n_files``
    time-ordered files, so ``maxFilesPerTrigger=1`` + availableNow drives
    one micro-batch per file and the event-time watermark genuinely
    advances between batches — the production shape (a landing directory
    accumulating time-ordered files) rather than the one-batch degenerate
    case where append mode can never emit."""
    from us_stock_data_pipeline_spark.catalog import fix_nanos_ts, load_table
    from us_stock_data_pipeline_spark.session import ensure_session_confs

    ensure_session_confs(spark)
    src = os.path.join(sf_dir, "events.parquet")
    src_stat = os.stat(src)
    stage = os.path.join(
        tempfile.gettempdir(),
        "us_sdps_stream_mb",
        hashlib.sha1(f"{sf_dir}:{n_files}".encode()).hexdigest()[:12],
    )
    marker = os.path.join(stage, "_staged")
    want = f"{src_stat.st_size}:{src_stat.st_mtime_ns}"
    have = None
    if os.path.exists(marker):
        with open(marker) as fh:
            have = fh.read()
    if have != want:
        shutil.rmtree(stage, ignore_errors=True)
        os.makedirs(stage)
        ev = load_table(spark, sf_dir, "events")
        # Deterministic time-ordered thirds: ntile over (ts, event_id).
        from pyspark.sql import Window as W

        tiled = ev.withColumn(
            "__tile", F.ntile(n_files).over(W.orderBy("ts", "event_id"))
        )
        for i in range(1, n_files + 1):
            part_dir = os.path.join(stage, f"__tmp{i}")
            tiled.filter(F.col("__tile") == i).drop("__tile").coalesce(1).write.parquet(part_dir)
            part = next(
                p for p in os.listdir(part_dir) if p.endswith(".parquet")
            )
            # Sequential rename => strictly increasing mtimes, so the file
            # source replays batches in event-time order.
            os.replace(os.path.join(part_dir, part), os.path.join(stage, f"e{i:02d}.parquet"))
            shutil.rmtree(part_dir)
        with open(marker, "w") as fh:
            fh.write(want)
    schema = spark.read.parquet(os.path.join(stage, "e01.parquet")).schema
    return fix_nanos_ts(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(stage, "e*.parquet"))
    )


@register(
    "stream_watermarked_append",
    oracle="""
SELECT true AS stream_subset_of_batch,
       true AS finalized_windows_emitted,
       true AS no_unfinalized_emitted,
       true AS emitted_nonempty
""",
    tags=("streaming", "watermark"),
)
def stream_watermarked_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-mode windowed aggregate with a 10-minute event-time
    watermark — the late-data-tolerant production shape. The fixture is
    replayed as three time-ordered files with one micro-batch each
    (maxFilesPerTrigger=1), so the watermark advances between batches and
    finalized windows are emitted exactly once; Spark's no-data final
    batch then flushes everything below the last watermark.

    Watermark semantics have no batch-SQL twin, so the oracle is the
    boolean-witness pattern (same as agg_theta_sketch): this query
    computes the streamed result AND its batch-mode equivalent and emits
    one row of invariants that must all be true —

    - stream_subset_of_batch: every emitted (window, type, count) row is
      byte-identical to the batch aggregate (no partial/duplicate emits);
    - finalized_windows_emitted: every window whose end precedes the
      second-to-last batch's watermark was emitted (finalization is not
      lost);
    - no_unfinalized_emitted: no window still open at the final watermark
      was emitted (append mode never leaks unfinalized state);
    - emitted_nonempty: the stream emitted at least one window (the
      harness genuinely advanced the watermark).
    """
    ev = _events_stream_multibatch(spark, sf_dir, n_files=3)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = _run_to_table(agg, spark, "append")
    streamed = out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "event_type",
        "n_events",
    )

    from us_stock_data_pipeline_spark.catalog import load_table
    from pyspark.sql import Window as W

    ev_batch = load_table(spark, sf_dir, "events")
    tiled = ev_batch.withColumn("__tile", F.ntile(3).over(W.orderBy("ts", "event_id")))
    # Watermark after batch k = max event time of files 1..k minus delay.
    wm = tiled.agg(
        (F.max(F.when(F.col("__tile") <= 2, F.col("ts"))) - F.expr("INTERVAL 10 MINUTES")).alias(
            "wm_penultimate"
        ),
        (F.max("ts") - F.expr("INTERVAL 10 MINUTES")).alias("wm_final"),
    )
    batch_agg = (
        ev_batch.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )
    mismatched = streamed.join(
        batch_agg, ["window_start", "window_end", "event_type", "n_events"], "left_anti"
    )
    finalized = batch_agg.crossJoin(F.broadcast(wm)).filter(
        F.col("window_end") <= F.col("wm_penultimate")
    )
    missing_finalized = finalized.join(
        streamed, ["window_start", "window_end", "event_type", "n_events"], "left_anti"
    )
    leaked_open = streamed.crossJoin(F.broadcast(wm)).filter(
        F.col("window_end") > F.col("wm_final")
    )
    counts = (
        streamed.agg(F.count(F.lit(1)).alias("n_streamed"))
        .crossJoin(mismatched.agg(F.count(F.lit(1)).alias("n_mismatch")))
        .crossJoin(missing_finalized.agg(F.count(F.lit(1)).alias("n_missing")))
        .crossJoin(leaked_open.agg(F.count(F.lit(1)).alias("n_leaked")))
    )
    return counts.select(
        (F.col("n_mismatch") == 0).alias("stream_subset_of_batch"),
        (F.col("n_missing") == 0).alias("finalized_windows_emitted"),
        (F.col("n_leaked") == 0).alias("no_unfinalized_emitted"),
        (F.col("n_streamed") > 0).alias("emitted_nonempty"),
    )


@register(
    "stream_stream_join",
    oracle="""
SELECT
  c.event_id AS click_id,
  p.event_id AS purchase_id,
  c.user_id,
  round(p.value, 4) AS purchase_value
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
ORDER BY click_id, purchase_id
""",
    tags=("streaming", "join"),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: clicks joined to the purchases that
    follow them within an hour, BOTH sides unbounded streams. Watermarks
    plus the time-range join condition are what make this feasible — they
    bound each side's join state to [watermark, now] instead of the whole
    history, the canonical funnel/attribution shape. Inner-join matches
    emit as soon as both rows arrive; the oracle is the identical interval
    join in batch SQL (same fixture, same rows)."""
    ev = _events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
            F.col("value"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("click_id", "purchase_id", "user_id", F.round("value", 4).alias("purchase_value"))
    out = _run_to_table(joined, spark, "append")
    return out.orderBy("click_id", "purchase_id")


# --------------------------------------------------------------------------
# foreachBatch -> MERGE upsert sink
# --------------------------------------------------------------------------

_FOREACH_UPSERT_ORACLE = """
SELECT user_id, event_id AS last_event_id, event_type AS last_type,
       round(value, 4) AS last_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
ORDER BY user_id
"""


@register(
    "stream_foreachbatch_upsert",
    oracle=_FOREACH_UPSERT_ORACLE,
    tags=("streaming", "sink", "merge"),
)
def stream_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MERGE: foreachBatch bridges Structured Streaming to the
    batch upsert sink — per micro-batch, compact the batch to its latest
    row per key (max_by), then merge_upsert into the serving table keyed
    on user_id. This is THE production pattern for streaming into a
    keyed table (Delta/Iceberg MERGE inside foreachBatch); the final
    table state equals the latest-row-per-key snapshot of everything
    streamed, which is exactly what the oracle computes from the batch
    fixture — so the streaming path gets a full value-hash check, not a
    rows-only one. Batch-ordering note: within one batch max_by picks
    the (ts, event_id) max; across batches the merge is CONDITIONAL on
    the stored (ts, event_id) — a later batch carrying an older row (a
    late replay, an out-of-order landing file) cannot overwrite a newer
    stored row, so the final state is order-independent, not
    last-writer-wins."""
    import tempfile

    from us_stock_data_pipeline_spark.etl.sinks import merge_upsert
    from us_stock_data_pipeline_spark.etl.sources import parquet_exists

    out = tempfile.mkdtemp(prefix="us_sdps_upsert_")
    # multibatch source (one time-ordered file per micro-batch) so the
    # stored-key conditional-merge branch genuinely executes: batch 2+
    # sees parquet_exists(out) true and merges against stored state.
    sdf = _events_stream_multibatch(spark, sf_dir, n_files=3).select(
        "user_id", "event_id", "event_type", "ts", "value",
        F.pmod("user_id", F.lit(8)).cast("int").alias("bucket"),
    )

    def upsert_batch(batch: DataFrame, batch_id: int) -> None:
        key = F.struct(F.col("ts"), F.col("event_id"))
        compact = batch.groupBy("user_id").agg(
            F.max(key).alias("last_key"),
            F.max_by("event_id", key).alias("last_event_id"),
            F.max_by("event_type", key).alias("last_type"),
            F.max_by("value", key).alias("last_value"),
            F.max_by("bucket", key).alias("bucket"),
        )
        sess = batch.sparkSession
        if parquet_exists(sess, out):
            # Scale shape: the serving table is the big side — semi-join
            # it down to this batch's keys (broadcasting the small batch
            # key set), and only then broadcast the bounded result back
            # against the batch. Never broadcast the serving table.
            stored = (
                sess.read.parquet(out)
                .join(F.broadcast(compact.select("user_id")), "user_id", "left_semi")
                .select("user_id", F.col("last_key").alias("stored_key"))
            )
            compact = (
                compact.join(F.broadcast(stored), "user_id", "left")
                .filter(
                    F.col("stored_key").isNull()
                    | (F.col("last_key") > F.col("stored_key"))
                )
                .drop("stored_key")
            )
            # every batch row older than stored state -> nothing to merge;
            # writing an empty staging dir would make the follow-up read
            # fail with 'Unable to infer schema'.
            if not compact.take(1):
                return
        merge_upsert(
            sess, compact, out, key_cols=("user_id",),
            partition_cols=("bucket",),
        )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            sdf.writeStream.foreachBatch(upsert_batch)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return (
        spark.read.parquet(out)
        .select(
            "user_id", "last_event_id", "last_type",
            F.round("last_value", 4).alias("last_value"),
        )
        .orderBy("user_id")
    )
