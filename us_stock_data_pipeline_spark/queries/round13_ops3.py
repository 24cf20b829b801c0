"""Round-13 operators, part 3 — streaming state backends and
versioned-table writer concurrency.

- `stream_rocksdb_state_store` — the same stateful streaming
  aggregation the engine runs everywhere else, executed on the
  RocksDB state store provider (Spark's production state backend for
  large state), with the provider's engagement PROVEN from the
  query's own state-operator metrics, not assumed from the conf.
- `etl_versioned_concurrent_writers` — optimistic-concurrency proof
  for the versioned table: two interleaved writers race the same
  base version; the CAS commit protocol forces a deterministic
  serialization (retry on conflict), and the final table equals the
  serial application of both writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

_ROCKSDB_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(min(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS min_cents,
       CAST(max(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS max_cents
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "stream_rocksdb_state_store",
    oracle=_ROCKSDB_ORACLE,
    tags=("streaming", "scale"),
    round=13,
)
def stream_rocksdb_state_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming aggregation on the RocksDB state store
    provider — the backend a 100 TB stream actually runs on (HDFS-backed
    in-memory stores OOM once keyed state outgrows executor heap;
    RocksDB spills state to local SSD and checkpoints changelogs). The
    aggregation itself is the engine's standard shape (per-type counts,
    exact per-row cents quantization before the sum/min/max); what this query adds is the backend
    swap under `spark.sql.streaming.stateStore.providerClass` AND a
    hard in-query assertion that the finished run's state-operator
    metrics are RocksDB's (`rocksdb*` custom metrics present, memory
    provider's absent) — the conf alone proves nothing if the query
    falls back. State store count is pinned to 4 like every other
    streaming query (store open/commit overhead dominates at fixture
    scale; sized to executors on a cluster)."""
    from us_stock_data_pipeline_spark.queries.streaming_ops import _events_stream

    sdf = _events_stream(spark, sf_dir)
    agg = (
        sdf.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("sum_cents"),
            F.min(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("min_cents"),
            F.max(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("max_cents"),
        )
    )
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        None,
    )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB_PROVIDER)
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    name = "stream_sink_rocksdb"
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progress = q.lastProgress
        ops = (progress or {}).get("stateOperators") or []
        rocks_metrics = [
            k
            for op in ops
            for k in (op.get("customMetrics") or {})
            if k.startswith("rocksdb")
        ]
        if not ops or not rocks_metrics:
            raise RuntimeError(
                "RocksDB state store provider did not engage: "
                f"stateOperators={ops!r}"
            )
    finally:
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(name).orderBy("event_type")


_CONCURRENT_ORACLE = """
WITH base AS (
  SELECT CAST(n_nationkey AS BIGINT) AS k,
         CAST(n_regionkey AS BIGINT) AS part,
         CAST(n_nationkey * 10 AS BIGINT) AS val
  FROM nation
)
SELECT k, part,
       CAST(CASE WHEN k % 2 = 0 THEN val + 1
                 WHEN k % 3 = 0 THEN val + 100
                 ELSE val END AS BIGINT) AS val,
       CAST(3 AS BIGINT) AS final_version
FROM base
ORDER BY k
"""


@register(
    "etl_versioned_concurrent_writers",
    oracle=_CONCURRENT_ORACLE,
    tags=("etl", "versioned"),
    round=13,
)
def etl_versioned_concurrent_writers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimistic concurrency for the versioned table, raced FOR REAL:
    two driver threads plan their upserts against the SAME base
    snapshot (version 1) and publish concurrently. The commit protocol
    is an atomic compare-and-swap on the manifest name (versioned.py
    step 4): exactly one thread claims v2; the other's CAS loses, and
    its internal retry recomputes against the winner's manifest before
    landing v3 — the lost-update anomaly Delta's OCC exists to prevent.
    The two writers touch DISJOINT key sets (evens +1; odd multiples of
    3 +100), so the final table is deterministic whichever thread wins
    the race, while the version trail is not optional: if CAS were
    broken and both writers claimed v2, one write would vanish and the
    final_version/val hash would miss. Run under an interpreter barrier
    (both threads released together) to make the collision real, not
    theoretical. At 100 TB this is the multi-job reality: ingest and
    compaction race the same table and must serialize without losing
    either write."""
    import shutil
    import tempfile
    import threading
    import uuid as _uuid

    from us_stock_data_pipeline_spark.etl import versioned as V

    nation = load_table(spark, sf_dir, "nation").selectExpr(
        "CAST(n_nationkey AS BIGINT) AS k",
        "CAST(n_regionkey AS BIGINT) AS part",
        "CAST(n_nationkey * 10 AS BIGINT) AS val",
    )
    root = tempfile.mkdtemp(prefix=f"us_sdps_occ_{_uuid.uuid4().hex[:8]}_")
    try:
        V.versioned_merge_upsert(
            spark, nation, root, key_cols=("k",), partition_cols=("part",)
        )
        base = V.read_versioned(spark, root, 1)
        # both writers' plans pin the SAME base snapshot; materialize the
        # update rows up front so each thread's commit is pure publish
        w1_rows = (
            base.filter(F.col("k") % 2 == 0)
            .withColumn("val", F.col("val") + F.lit(1))
            .collect()
        )
        w2_rows = (
            base.filter((F.col("k") % 2 == 1) & (F.col("k") % 3 == 0))
            .withColumn("val", F.col("val") + F.lit(100))
            .collect()
        )
        barrier = threading.Barrier(2)
        errors: list[BaseException] = []

        def write(rows):
            try:
                df = spark.createDataFrame(rows, base.schema)
                barrier.wait(timeout=60)
                V.versioned_merge_upsert(
                    spark, df, root, key_cols=("k",), partition_cols=("part",)
                )
            except BaseException as e:  # surfaced after join
                errors.append(e)

        t1 = threading.Thread(target=write, args=(w1_rows,))
        t2 = threading.Thread(target=write, args=(w2_rows,))
        t1.start()
        t2.start()
        t1.join()
        t2.join()
        if errors:
            raise errors[0]
        head = V.current_version(spark, root)
        if head != 3:
            raise AssertionError(
                f"OCC serialization broken: expected head version 3, got {head}"
            )
        final = V.read_versioned(spark, root, head).select(
            "k",
            "part",
            F.col("val").cast("long").alias("val"),
            F.lit(int(head)).cast("long").alias("final_version"),
        )
        rows = final.orderBy("k").collect()
        return spark.createDataFrame(rows, final.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------------------------------------
# multimodal: FLAC lossless audio — distributed encode -> decode roundtrip
# --------------------------------------------------------------------------

_FLAC_N = 2048  # samples per channel per document

# Lossless codec => the decoded samples EQUAL the synthesis formula, so
# the oracle evaluates the formula directly (the JPEG-card scheme, but
# with zero tolerance anywhere: FLAC has no "survives exactly" subset —
# everything survives exactly, or the codec is broken).
_FLAC_ORACLE = f"""
WITH ids AS (
  SELECT doc_id, source FROM documents WHERE doc_id % 23 = 0
),
t AS (SELECT unnest(generate_series(0, {_FLAC_N - 1})) AS t),
pcm AS (
  SELECT i.doc_id, i.source, t.t,
         ((i.doc_id * 37 + t.t * t.t * 13) % 4001) - 2000 AS s0,
         ((i.doc_id * 11 + t.t * 29) % 3001) - 1500 AS s1
  FROM ids i CROSS JOIN t
)
SELECT source,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) * 2 AS BIGINT) AS n_samples,
       CAST(sum(s0) + sum(s1) AS BIGINT) AS sum_pcm,
       CAST(sum(abs(s0)) + sum(abs(s1)) AS BIGINT) AS sum_abs,
       CAST(min(least(s0, s1)) AS BIGINT) AS min_s,
       CAST(max(greatest(s0, s1)) AS BIGINT) AS max_s,
       CAST(sum((t + 1) * (s0 - s1)) AS BIGINT) AS weighted_diff
FROM pcm
GROUP BY source
ORDER BY source
"""


@register(
    "multimodal_flac_roundtrip",
    oracle=_FLAC_ORACLE,
    tags=("llm", "multimodal", "udf"),
    round=13,
)
def multimodal_flac_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL FLAC lossless audio codec, distributed (round 13): every
    23rd document synthesizes a deterministic 2-channel 16-bit PCM clip
    ({_FLAC_N} samples/channel), encodes it to a genuine FLAC stream
    with `functions/flac.py` (STREAMINFO, fixed-blocksize frames, UTF-8
    frame numbers, CRC-8/CRC-16, CONSTANT/FIXED/VERBATIM subframes by
    exact cost, Rice residuals, mid/side decorrelation by exact cost),
    then DECODES the bytes back in the same Arrow batch and aggregates
    the decoded samples. FLAC is lossless, so the oracle evaluates the
    synthesis formula in closed form — one flipped sample anywhere in
    ~4M decoded values misses the hash. The decoder also verifies both
    CRCs on every frame, so the bitstream structure itself is checked,
    not just the sample values. Plan: one scan, one Arrow codec stage,
    one rollup; audio bytes never visit the driver — the 100 TB shape
    for bulk audio validation/transcode."""
    import pandas as pd

    from us_stock_data_pipeline_spark.functions.flac import (
        flac_decode,
        flac_encode,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 23 == 0)
        .select("doc_id", "source")
        # the filtered id list collapses into one input split; spread
        # the Python codec work across the executor pool (at 100 TB the
        # per-file split does this naturally)
        .repartition(32)
    )

    def codec(batches):
        for pdf in batches:
            rows = []
            for d, src in zip(pdf["doc_id"], pdf["source"]):
                d = int(d)
                c0 = [((d * 37 + t * t * 13) % 4001) - 2000 for t in range(_FLAC_N)]
                c1 = [((d * 11 + t * 29) % 3001) - 1500 for t in range(_FLAC_N)]
                enc = flac_encode([c0, c1], sample_rate=16000, bps=16, block_size=512)
                dec = flac_decode(enc)
                d0, d1 = dec["channels"]
                if len(d0) != _FLAC_N or len(d1) != _FLAC_N:
                    raise ValueError("FLAC roundtrip length mismatch")
                rows.append(
                    {
                        "doc_id": d,
                        "source": src,
                        "n_samples": len(d0) + len(d1),
                        "sum_pcm": sum(d0) + sum(d1),
                        "sum_abs": sum(abs(v) for v in d0)
                        + sum(abs(v) for v in d1),
                        "min_s": min(min(d0), min(d1)),
                        "max_s": max(max(d0), max(d1)),
                        "weighted_diff": sum(
                            (t + 1) * (a - b) for t, (a, b) in enumerate(zip(d0, d1))
                        ),
                        "enc_bytes": len(enc),
                    }
                )
            yield pd.DataFrame(rows)

    decoded = docs.mapInPandas(
        codec,
        schema=(
            "doc_id long, source string, n_samples long, sum_pcm long,"
            " sum_abs long, min_s long, max_s long, weighted_diff long,"
            " enc_bytes long"
        ),
    )
    return (
        decoded.groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.sum("n_samples").cast("long").alias("n_samples"),
            F.sum("sum_pcm").cast("long").alias("sum_pcm"),
            F.sum("sum_abs").cast("long").alias("sum_abs"),
            F.min("min_s").cast("long").alias("min_s"),
            F.max("max_s").cast("long").alias("max_s"),
            F.sum("weighted_diff").cast("long").alias("weighted_diff"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# multimodal: baseline color JPEG with RESTART MARKERS (DRI/RSTn)
# --------------------------------------------------------------------------

_JPGR_MX = 3
_JPGR_MY = 2
_JPGR_RI = 2  # restart every 2 MCUs -> multiple RSTn per image

# Same closed-form constant-MCU oracle scheme as multimodal_jpeg_color
# _decode (the restart markers are pure entropy-stream framing: they
# change the bytes, not the pixels — which is exactly what the shared
# oracle proves).
_JPEG_RESTART_ORACLE = f"""
WITH ids AS (
  SELECT doc_id, source FROM documents WHERE doc_id % 29 = 0
),
mcus AS (
  SELECT i.doc_id, i.source,
         CAST((i.doc_id * 5 + mx.g * 11 + my.g * 3) % 256 AS BIGINT) AS r,
         CAST((i.doc_id * 9 + mx.g * 7 + my.g * 13) % 256 AS BIGINT) AS g,
         CAST((i.doc_id * 3 + mx.g * 17 + my.g * 5) % 256 AS BIGINT) AS b
  FROM ids i,
       LATERAL (SELECT unnest(range(0, {_JPGR_MX})) AS g) mx,
       LATERAL (SELECT unnest(range(0, {_JPGR_MY})) AS g) my
),
ycc AS (
  SELECT doc_id, source,
         least(greatest((299000*r + 587000*g + 114000*b + 500000) // 1000000, 0), 255) AS y,
         least(greatest((128000000 - 168736*r - 331264*g + 500000*b + 500000) // 1000000, 0), 255) AS cb,
         least(greatest((128000000 + 500000*r - 418688*g - 81312*b + 500000) // 1000000, 0), 255) AS cr
  FROM mcus
),
rgb AS (
  SELECT doc_id, source,
         least(greatest((1000000*y + 1402000*(cr - 128) + 500000 + 512000000) // 1000000 - 512, 0), 255) AS er,
         least(greatest((1000000*y - 344136*(cb - 128) - 714136*(cr - 128) + 500000 + 512000000) // 1000000 - 512, 0), 255) AS eg,
         least(greatest((1000000*y + 1772000*(cb - 128) + 500000 + 512000000) // 1000000 - 512, 0), 255) AS eb
  FROM ycc
)
SELECT source,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_imgs,
       CAST(count(*) * 256 AS BIGINT) AS n_pixels,
       CAST(sum(er) * 256 AS BIGINT) AS sum_r,
       CAST(sum(eg) * 256 AS BIGINT) AS sum_g,
       CAST(sum(eb) * 256 AS BIGINT) AS sum_b,
       CAST(max(eb) AS BIGINT) AS max_b
FROM rgb
GROUP BY source
ORDER BY source
"""


@register(
    "multimodal_jpeg_restart_decode",
    oracle=_JPEG_RESTART_ORACLE,
    tags=("llm", "multimodal", "udf"),
    round=13,
)
def multimodal_jpeg_restart_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline 4:2:0 color JPEG with RESTART MARKERS (round 13): every
    29th document's test card is encoded with DRI={_JPGR_RI} — the
    entropy stream is split by RSTn markers every {_JPGR_RI} MCUs
    (1-padding to the byte, modulo-8 marker sequence, DC predictors
    reset at each boundary, T.81 E.2.4) — the error-resilience framing
    cameras and crawl payloads commonly carry, and which a decoder that
    silently skips DRI turns into garbage pixels. `decode_jpeg_color`
    verifies the marker SEQUENCE as it resynchronizes (an out-of-order
    RSTn raises). Same constant-MCU closed-form oracle as
    `multimodal_jpeg_color_decode`: the markers change the bytes, never
    the pixels. At 100 TB, restart intervals are also the parallel
    entry points a segmented JPEG decoder shards on."""
    import pandas as pd

    from us_stock_data_pipeline_spark.functions.multimodal import (
        encode_jpeg_color_card,
        jpeg_color_decode_batch,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 29 == 0)
        .select("doc_id", "source")
    )

    def encode_batch(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "source": pdf["source"],
                    "payload": [
                        encode_jpeg_color_card(
                            int(d), _JPGR_MX, _JPGR_MY, restart_interval=_JPGR_RI
                        )
                        for d in pdf["doc_id"]
                    ],
                }
            )

    def decode_with_source(batches):
        import numpy as np

        from us_stock_data_pipeline_spark.functions.multimodal import (
            decode_jpeg_color,
        )

        for pdf in batches:
            rows = []
            for d, src, payload in zip(
                pdf["doc_id"], pdf["source"], pdf["payload"]
            ):
                buf = bytes(payload)
                if b"\xff\xd0" not in buf and b"\xff\xd1" not in buf:
                    raise ValueError("expected RST markers in the payload")
                img = decode_jpeg_color(buf).astype(np.int64)
                rows.append(
                    {
                        "doc_id": int(d),
                        "source": src,
                        "n_pixels": img.shape[0] * img.shape[1],
                        "sum_r": int(img[:, :, 0].sum()),
                        "sum_g": int(img[:, :, 1].sum()),
                        "sum_b": int(img[:, :, 2].sum()),
                        "max_b": int(img[:, :, 2].max()),
                    }
                )
            yield pd.DataFrame(rows)

    encoded = docs.mapInPandas(
        encode_batch,
        schema="doc_id long, source string, payload binary",
    )
    decoded = encoded.mapInPandas(
        decode_with_source,
        schema=(
            "doc_id long, source string, n_pixels long, sum_r long,"
            " sum_g long, sum_b long, max_b long"
        ),
    )
    return (
        decoded.groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_imgs"),
            F.sum("n_pixels").cast("long").alias("n_pixels"),
            F.sum("sum_r").cast("long").alias("sum_r"),
            F.sum("sum_g").cast("long").alias("sum_g"),
            F.sum("sum_b").cast("long").alias("sum_b"),
            F.max("max_b").cast("long").alias("max_b"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# extensibility: STREAMING Python DataSource (Spark 4 simpleStreamReader)
# --------------------------------------------------------------------------

_PYDS_PAGES = 8
_PYDS_ROWS = 50

_PYDS_STREAM_ORACLE = f"""
WITH pages AS (SELECT unnest(generate_series(0, {_PYDS_PAGES - 1})) AS page),
rows_ AS (SELECT unnest(generate_series(0, {_PYDS_ROWS - 1})) AS i),
feed AS (
  SELECT p.page, r.i,
         CAST((p.page * 7919 + r.i * 104729) % 100000 AS BIGINT) AS v
  FROM pages p CROSS JOIN rows_ r
)
SELECT CAST(page AS BIGINT) AS page,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(v) AS BIGINT) AS sum_v,
       CAST(min(v) AS BIGINT) AS min_v,
       CAST(max(v) AS BIGINT) AS max_v
FROM feed
GROUP BY page
ORDER BY page
"""


@register(
    "source_python_datasource_stream",
    oracle=_PYDS_STREAM_ORACLE,
    tags=("extensibility", "streaming"),
    round=13,
)
def source_python_datasource_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING Python DataSource (round 13) — the Spark 4 extension
    tier the batch `source_python_datasource` connector left open: a
    `SimpleDataSourceStreamReader` whose OFFSETS are page numbers (the
    paged-REST-API shape of the reference's polygon_client.py:19-94,
    re-expressed as a replayable streaming source). `read(start)`
    serves the next page and advances the offset; `readBetweenOffsets`
    replays any committed range deterministically (the exactly-once
    replay contract a crash recovery needs — same pages, same rows);
    the source parks at the final offset so `processAllAvailable`
    drains cleanly. Microbatch boundaries are an engine choice, so the
    aggregate is batching-invariant and the closed-form oracle pins
    every page's contents. At 100 TB the same reader shape tails any
    cursored API/changefeed with offsets checkpointed by the engine."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    pages, rows = _PYDS_PAGES, _PYDS_ROWS

    class PagedFeedReader(SimpleDataSourceStreamReader):
        def initialOffset(self):
            return {"page": 0}

        def read(self, start):
            p = start["page"]
            if p >= pages:
                return (iter([]), start)  # parked: no progress, no rows
            return (
                iter(
                    [
                        (p, i, (p * 7919 + i * 104729) % 100000)
                        for i in range(rows)
                    ]
                ),
                {"page": p + 1},
            )

        def readBetweenOffsets(self, start, end):
            return iter(
                [
                    (p, i, (p * 7919 + i * 104729) % 100000)
                    for p in range(start["page"], end["page"])
                    for i in range(rows)
                ]
            )

    class PagedFeedSource(DataSource):
        @classmethod
        def name(cls):
            return "us_sdps_paged_feed"

        def schema(self):
            return "page int, i int, v bigint"

        def simpleStreamReader(self, schema):
            return PagedFeedReader()

    spark.dataSource.register(PagedFeedSource)
    sdf = spark.readStream.format("us_sdps_paged_feed").load()
    name = "sink_pyds_stream"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy(F.col("page").cast("long").alias("page"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("v").cast("long").alias("sum_v"),
            F.min("v").cast("long").alias("min_v"),
            F.max("v").cast("long").alias("max_v"),
        )
        .orderBy("page")
    )


# --------------------------------------------------------------------------
# catalog: GENERATED ALWAYS AS columns + derived partition pruning
# --------------------------------------------------------------------------

_GENCOL_ORACLE = """
WITH in_range AS (
  SELECT year(o_orderdate) AS oyear,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
),
span AS (
  SELECT CAST(count(DISTINCT year(o_orderdate)) AS BIGINT) AS n_parts_total
  FROM orders
)
SELECT CAST(i.oyear AS BIGINT) AS oyear,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(i.cents) AS BIGINT) AS sum_cents,
       s.n_parts_total,
       CAST(3 AS BIGINT) AS n_parts_kept
FROM in_range i CROSS JOIN span s
GROUP BY i.oyear, s.n_parts_total
ORDER BY oyear
"""


@register(
    "etl_versioned_generated_columns",
    oracle=_GENCOL_ORACLE,
    tags=("etl", "versioned", "catalog"),
    round=13,
)
def etl_versioned_generated_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERATED ALWAYS AS columns (round 13, Delta parity): the table
    partitions on `oyear` GENERATED AS YEAR(o_orderdate); the INSERT
    never mentions it (the write path computes it, `etl/generated.py`),
    and the time-range read never filters on it — the engine DERIVES
    the partition filter from the base-column predicate
    (o_orderdate in [1997, 1999)) and prunes AT THE MANIFEST: 3 of the
    table's year-partitions are planned (1997, 1998 + the 1999 boundary
    partition the safe-superset contract keeps), the other years are
    never listed or scanned. The query output pins BOTH the data (the
    pruned read still returns exactly the predicate's rows) and the
    pruning itself (n_parts_kept=3 counted from the manifest plan vs
    n_parts_total from the data). At 100 TB this is the table layout
    for every time-series fact: queries write and filter the timestamp,
    the layout maintains itself."""
    import shutil
    import tempfile
    import uuid as _uuid

    from us_stock_data_pipeline_spark.etl import versioned as V
    from us_stock_data_pipeline_spark.etl.generated import derive_partition_filter
    from us_stock_data_pipeline_spark.etl.vcatalog import (
        register_versioned,
        versioned_sql,
    )

    orders = load_table(spark, sf_dir, "orders")
    orders.select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        "o_orderdate",
    ).createOrReplaceTempView("gen_orders_src")
    gen = {"oyear": "YEAR(o_orderdate)"}
    root = tempfile.mkdtemp(prefix=f"us_sdps_gencol_{_uuid.uuid4().hex[:8]}_")
    try:
        # seed v1 with one row (a versioned table needs a first commit
        # before it can be registered), then the INSERT upserts the full
        # set WITHOUT mentioning oyear — the write path computes it
        V.versioned_merge_upsert(
            spark,
            spark.table("gen_orders_src")
            .limit(1)
            .withColumn("oyear", F.expr("YEAR(o_orderdate)")),
            root,
            key_cols=("o_orderkey",),
            partition_cols=("oyear",),
        )
        register_versioned(
            spark,
            "gen_orders",
            root,
            key_cols=("o_orderkey",),
            partition_cols=("oyear",),
            generated_cols=gen,
        )
        versioned_sql(
            spark, "INSERT INTO gen_orders SELECT * FROM gen_orders_src"
        )
        lo, hi = "1997-01-01", "1999-01-01"
        keep = derive_partition_filter(gen, "o_orderdate", lo, hi)
        ver = V.current_version(spark, root)
        manifest = V.read_manifest(spark, root, ver)
        parts = [V._parse_partition_values(p) for p in manifest]
        n_total = len(parts)
        n_kept = sum(1 for p in parts if keep(p))
        pruned = V.read_versioned(spark, root, partition_filter=keep)
        agg = (
            pruned.filter(
                (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
            )
            .groupBy(F.col("oyear").cast("long").alias("oyear"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_orders"),
                F.sum("cents").cast("long").alias("sum_cents"),
            )
            .withColumn("n_parts_total", F.lit(n_total).cast("long"))
            .withColumn("n_parts_kept", F.lit(n_kept).cast("long"))
            .orderBy("oyear")
        )
        rows = agg.collect()
        return spark.createDataFrame(rows, agg.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------------------------------------
# catalog: SHALLOW CLONE — zero-copy independent table fork
# --------------------------------------------------------------------------

_CLONE_ORACLE = """
WITH base AS (
  SELECT CAST(n_nationkey AS BIGINT) AS k,
         CAST(n_regionkey AS BIGINT) AS part,
         CAST(n_nationkey * 10 AS BIGINT) AS val
  FROM nation
)
SELECT k,
       -- source diverged after the clone: evens got +7 at v3
       CAST(CASE WHEN k % 2 = 0 THEN val + 7 ELSE val END AS BIGINT) AS src_val,
       -- clone was taken AS OF v1 and diverged independently: k<10 got +1000
       CAST(CASE WHEN k < 10 THEN val + 1000 ELSE val END AS BIGINT) AS clone_val,
       CAST(1 AS BIGINT) AS clone_version,
       CAST(0 AS BIGINT) AS clone_datafiles_at_fork
FROM base
ORDER BY k
"""


@register(
    "etl_versioned_shallow_clone",
    oracle=_CLONE_ORACLE,
    tags=("etl", "versioned", "catalog"),
    round=13,
)
def etl_versioned_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHALLOW CLONE (round 13, Delta parity): `CREATE TABLE c SHALLOW
    CLONE s VERSION AS OF 1 LOCATION ...` forks an INDEPENDENT table
    whose first manifest points at the source's data directories by
    absolute path — zero data bytes copied (the query PROVES it:
    clone_datafiles_at_fork counts parquet files under the clone root
    at fork time, pinned at 0). Both tables then diverge: the source
    upserts +7 on even keys (v3 invisible to the clone — it was cut AS
    OF v1, before the source's v2 tombstones), the clone upserts +1000
    on k<10 (invisible to the source). The output joins both final
    states per key, so a clone that leaked writes in either direction
    misses the hash. The source snapshot is vacuum-pinned by an
    internal clone tag — the footgun Delta documents ("vacuum on the
    source breaks clones") is closed, not inherited. At 100 TB this is
    the instant dev/test copy of a petabyte table: metadata-priced,
    write-isolated."""
    import os
    import shutil
    import tempfile
    import uuid as _uuid

    from us_stock_data_pipeline_spark.etl import versioned as V
    from us_stock_data_pipeline_spark.etl.vcatalog import (
        register_versioned,
        versioned_sql,
    )

    nation = load_table(spark, sf_dir, "nation").selectExpr(
        "CAST(n_nationkey AS BIGINT) AS k",
        "CAST(n_regionkey AS BIGINT) AS part",
        "CAST(n_nationkey * 10 AS BIGINT) AS val",
    )
    src_root = tempfile.mkdtemp(prefix=f"us_sdps_clsrc_{_uuid.uuid4().hex[:8]}_")
    dst_root = os.path.join(
        tempfile.gettempdir(), f"us_sdps_cldst_{_uuid.uuid4().hex[:8]}"
    )
    try:
        V.versioned_merge_upsert(
            spark, nation, src_root, key_cols=("k",), partition_cols=("part",)
        )
        # v2 on the source BEFORE the clone decision point: a NEW row
        # (k=99) the v1 clone must never see — proof the clone pins a
        # real historical snapshot, not the head
        V.versioned_merge_upsert(
            spark,
            spark.createDataFrame([(99, 0, 990)], "k long, part long, val long"),
            src_root,
            key_cols=("k",),
            partition_cols=("part",),
        )
        register_versioned(
            spark, "clone_src", src_root, key_cols=("k",), partition_cols=("part",)
        )
        versioned_sql(
            spark,
            f"CREATE TABLE clone_dst SHALLOW CLONE clone_src "
            f"VERSION AS OF 1 LOCATION '{dst_root}'",
        )
        n_files = sum(
            1
            for dirpath, _dirs, files in os.walk(dst_root)
            for f in files
            if f.endswith(".parquet")
        )
        # diverge AFTER the fork: source +7 on evens, clone +1000 on k<10
        versioned_sql(
            spark, "UPDATE clone_src SET val = val + 7 WHERE k % 2 = 0"
        )
        versioned_sql(spark, "UPDATE clone_dst SET val = val + 1000 WHERE k < 10")
        src = spark.table("clone_src").select("k", F.col("val").alias("src_val"))
        clone = spark.table("clone_dst").select(
            "k", F.col("val").alias("clone_val")
        )
        if clone.filter(F.col("k") == 99).count() != 0:
            raise AssertionError("clone leaked the post-fork source row k=99")
        # the inner join drops the source's post-fork k=99 row; every
        # nation key must pair up (the hash pins 25 rows)
        out = (
            src.join(clone, "k")
            .withColumn("clone_version", F.lit(1).cast("long"))
            .withColumn("clone_datafiles_at_fork", F.lit(n_files).cast("long"))
            .orderBy("k")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(src_root, ignore_errors=True)
        shutil.rmtree(dst_root, ignore_errors=True)


# --------------------------------------------------------------------------
# etl: COPY INTO — file-level idempotent bulk loading
# --------------------------------------------------------------------------

_COPY_INTO_ORACLE = """
WITH base AS (
  SELECT CAST(c_custkey AS BIGINT) AS ck,
         CAST(c_nationkey % 5 AS BIGINT) AS band,
         CAST(c_custkey * 3 AS BIGINT) AS val
  FROM customer
),
final AS (
  SELECT ck, band,
         CAST(CASE WHEN ck % 10 = 0 THEN val + 5 ELSE val END AS BIGINT) AS val
  FROM base
)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS run, CAST(3 AS BIGINT) AS n_loaded,
         CAST(0 AS BIGINT) AS n_skipped,
         (SELECT CAST(count(*) AS BIGINT) FROM base) AS table_rows,
         (SELECT CAST(sum(val) AS BIGINT) FROM base) AS table_sum
  UNION ALL
  SELECT 2, 0, 3,
         (SELECT CAST(count(*) AS BIGINT) FROM base),
         (SELECT CAST(sum(val) AS BIGINT) FROM base)
  UNION ALL
  SELECT 3, 1, 3,
         (SELECT CAST(count(*) AS BIGINT) FROM final),
         (SELECT CAST(sum(val) AS BIGINT) FROM final)
)
ORDER BY run
"""


@register(
    "etl_versioned_copy_into",
    oracle=_COPY_INTO_ORACLE,
    tags=("etl", "versioned"),
    round=13,
)
def etl_versioned_copy_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY INTO (round 13, Delta parity): file-level idempotent bulk
    loading. Run 1 lands 3 staged parquet files in one distributed scan
    and ONE merge commit, logging their fingerprints; run 2 re-executes
    the exact same statement and loads ZERO files (the copy log skips
    them — the no-op re-run every orchestrator retry needs); a late
    backfill file then lands and run 3 loads ONLY it. This replaces the
    reference's timestamp watermark (ingest_massive.py:140-141) with
    file-landing semantics: the backfill file carries data whose keys
    already exist (older than any watermark) and STILL loads correctly
    as an upsert — the EP3 data-loss mode in SURVEY.md SS3 can't
    happen. Each run's (files loaded, files skipped, table state) is
    hash-pinned. At 100 TB, COPY INTO is the nightly bulk-land loop:
    fingerprint checks are metadata-priced, the load is one scan of
    only the new bytes."""
    import shutil
    import tempfile
    import uuid as _uuid

    from us_stock_data_pipeline_spark.etl import versioned as V

    cust = load_table(spark, sf_dir, "customer").selectExpr(
        "CAST(c_custkey AS BIGINT) AS ck",
        "CAST(c_nationkey % 5 AS BIGINT) AS band",
        "CAST(c_custkey * 3 AS BIGINT) AS val",
    )
    base = tempfile.mkdtemp(prefix=f"us_sdps_copyinto_{_uuid.uuid4().hex[:8]}_")
    stage = f"{base}/landing"
    root = f"{base}/table"
    try:
        cust.repartition(3).write.mode("overwrite").parquet(stage)
        results = []
        for run in (1, 2):
            r = V.copy_into(
                spark,
                root,
                stage,
                key_cols=("ck",),
                partition_cols=("band",),
            )
            results.append((run, r["n_files_loaded"], r["n_files_skipped"]))
        # late backfill: keys that already exist, with bumped values
        bump = cust.filter(F.col("ck") % 10 == 0).withColumn(
            "val", F.col("val") + F.lit(5)
        )
        bump.toPandas().to_parquet(f"{stage}/backfill-0001.parquet", index=False)
        r = V.copy_into(
            spark, root, stage, key_cols=("ck",), partition_cols=("band",)
        )
        results.append((3, r["n_files_loaded"], r["n_files_skipped"]))
        # table state after runs 1/2 is identical; after run 3 it has
        # the backfill applied — compute both snapshots once
        after12 = V.read_versioned(spark, root, version=1)
        after3 = V.read_versioned(spark, root)
        s12 = after12.agg(
            F.count(F.lit(1)).cast("long").alias("rows"),
            F.sum("val").cast("long").alias("sum"),
        ).collect()[0]
        s3 = after3.agg(
            F.count(F.lit(1)).cast("long").alias("rows"),
            F.sum("val").cast("long").alias("sum"),
        ).collect()[0]
        out_rows = [
            (1, results[0][1], results[0][2], s12["rows"], s12["sum"]),
            (2, results[1][1], results[1][2], s12["rows"], s12["sum"]),
            (3, results[2][1], results[2][2], s3["rows"], s3["sum"]),
        ]
        return spark.createDataFrame(
            out_rows,
            "run long, n_loaded long, n_skipped long, table_rows long,"
            " table_sum long",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
