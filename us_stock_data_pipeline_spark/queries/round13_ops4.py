"""Round-13 operators, part 4 — Python DataSource V2 surface: filter
pushdown into a Python reader, and a Python writer whose files are
produced by the in-repo pure-Python parquet writer.

Reference scope note: the reference's connectors are driver-side REST
pagers (polygon_client.py / massive_client.py); these re-express the
connector tier on Spark 4's Python DataSource API with the planner
integration (pushdown) and commit protocol (writer) a real connector
needs at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# extensibility: filter PUSHDOWN into a Python DataSource reader
# --------------------------------------------------------------------------

_PDP_PAGES = 16
_PDP_ROWS = 40
_PDP_LO, _PDP_HI = 3, 7  # inclusive page range the query filters to

_PUSHDOWN_ORACLE = f"""
WITH pages AS (
  SELECT unnest(generate_series({_PDP_LO}, {_PDP_HI})) AS page
),
rows_ AS (SELECT unnest(generate_series(0, {_PDP_ROWS - 1})) AS i),
feed AS (
  SELECT p.page, r.i,
         CAST((p.page * 131 + r.i * 17) % 1000 AS BIGINT) AS v
  FROM pages p CROSS JOIN rows_ r
)
SELECT CAST(page AS BIGINT) AS page,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(v) AS BIGINT) AS sum_v,
       CAST({_PDP_HI - _PDP_LO + 1} AS BIGINT) AS n_pages_planned
FROM feed
GROUP BY page
ORDER BY page
"""


@register(
    "source_python_datasource_pushdown",
    oracle=_PUSHDOWN_ORACLE,
    tags=("extensibility",),
    round=13,
)
def source_python_datasource_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter PUSHDOWN into a Python DataSource (round 13): the reader
    implements `pushFilters`, accepts >=/<= bounds on the page column
    (returning every other filter back to Spark), and `partitions()`
    then plans ONE input partition per page INSIDE the pushed bounds —
    {_PDP_HI - _PDP_LO + 1} of {_PDP_PAGES} pages. The proof rides in
    the data: every row carries the planned-partition count, and the
    oracle pins it at the pruned number — if pushdown silently failed,
    the reader would plan all {_PDP_PAGES} pages and every row would
    carry the wrong count (Spark's re-applied residual filter cannot
    hide that). This is the planner contract a 100 TB REST/changefeed
    connector needs: predicates reach the source, pages that can't
    match are never fetched."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        GreaterThanOrEqual,
        InputPartition,
        LessThanOrEqual,
    )

    pages, rows = _PDP_PAGES, _PDP_ROWS

    class PageRangeReader(DataSourceReader):
        def __init__(self):
            self.lo, self.hi = 0, pages - 1

        def pushFilters(self, filters):
            for f in filters:
                if (
                    isinstance(f, GreaterThanOrEqual)
                    and f.attribute == ("page",)
                ):
                    self.lo = max(self.lo, int(f.value))
                elif isinstance(f, LessThanOrEqual) and f.attribute == ("page",):
                    self.hi = min(self.hi, int(f.value))
                else:
                    yield f  # unsupported: Spark re-applies it

        def partitions(self):
            planned = max(0, self.hi - self.lo + 1)
            return [
                InputPartition((p, planned)) for p in range(self.lo, self.hi + 1)
            ]

        def read(self, partition):
            p, planned = partition.value
            for i in range(rows):
                yield (p, i, (p * 131 + i * 17) % 1000, planned)

    class PageRangeSource(DataSource):
        @classmethod
        def name(cls):
            return "us_sdps_page_range"

        def schema(self):
            return "page int, i int, v bigint, n_pages_planned int"

        def reader(self, schema):
            return PageRangeReader()

    spark.dataSource.register(PageRangeSource)
    prev = spark.conf.get("spark.sql.python.filterPushdown.enabled", None)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        df = (
            spark.read.format("us_sdps_page_range")
            .load()
            .filter((F.col("page") >= _PDP_LO) & (F.col("page") <= _PDP_HI))
        )
        out = (
            df.groupBy(F.col("page").cast("long").alias("page"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("v").cast("long").alias("sum_v"),
                F.max("n_pages_planned").cast("long").alias("n_pages_planned"),
            )
            .orderBy("page")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.python.filterPushdown.enabled")
        else:
            spark.conf.set("spark.sql.python.filterPushdown.enabled", prev)


# --------------------------------------------------------------------------
# extensibility: Python DataSource WRITER backed by the in-repo parquet
# writer (functions/parquet_write.py)
# --------------------------------------------------------------------------

_SINK_ORACLE = """
SELECT CAST(n_nationkey % 4 AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(n_nationkey) AS BIGINT) AS sum_key,
       CAST(sum(length(n_name)) AS BIGINT) AS sum_name_len
FROM nation
GROUP BY 1
ORDER BY 1
"""


@register(
    "sink_python_datasource_writer",
    oracle=_SINK_ORACLE,
    tags=("extensibility", "storage"),
    round=13,
)
def sink_python_datasource_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python DataSource WRITER (round 13) — the commit-protocol tier:
    `df.write.format(...)` drives a Python `DataSourceWriter` whose
    per-task `write()` serializes its partition to a REAL parquet file
    using the engine's own pure-Python writer (thrift footer, v1
    pages, dictionary encoding, in-repo Snappy), staged under a task-
    unique name; `commit()` then publishes a manifest naming exactly
    the committed tasks' files — the two-phase rename-free commit every
    distributed sink needs (a failed/speculative task's orphan file is
    never named, so readers can't see it). The round trip is closed by
    Spark's JVM vectorized reader scanning the manifest-listed files
    back and the oracle hashing the result. Connector tier complete:
    Python batch reader (+pushdown), streaming reader (+offsets),
    and now writer (+commit protocol)."""
    import os
    import shutil
    import tempfile
    import uuid as _uuid

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    target = tempfile.mkdtemp(prefix=f"us_sdps_pyw_{_uuid.uuid4().hex[:8]}_")

    class FileMessage(WriterCommitMessage):
        def __init__(self, path):
            self.path = path

    class ParquetTaskWriter(DataSourceWriter):
        def __init__(self, options):
            self.dir = options["path"]

        def write(self, rows):
            import uuid as _u

            from us_stock_data_pipeline_spark.functions.parquet_write import (
                CODEC_SNAPPY,
                PQ_BYTE_ARRAY,
                PQ_INT64,
                write_parquet,
            )

            ks, names = [], []
            for r in rows:
                ks.append(int(r[0]))
                names.append(str(r[1]))
            path = os.path.join(self.dir, f"task-{_u.uuid4().hex}.parquet")
            if ks:
                buf = write_parquet(
                    [
                        ("n_nationkey", PQ_INT64, False, ks),
                        ("n_name", PQ_BYTE_ARRAY, False, names),
                    ],
                    codec=CODEC_SNAPPY,
                    use_dictionary=True,
                )
                with open(path, "wb") as f:
                    f.write(buf)
            else:
                path = ""
            return FileMessage(path)

        def commit(self, messages):
            paths = sorted(m.path for m in messages if m and m.path)
            with open(os.path.join(self.dir, "_committed.txt"), "w") as f:
                f.write("\n".join(paths))

        def abort(self, messages):
            for m in messages:
                if m and m.path and os.path.exists(m.path):
                    os.remove(m.path)

    class ParquetSink(DataSource):
        @classmethod
        def name(cls):
            return "us_sdps_pyparquet_sink"

        def writer(self, schema, overwrite):
            return ParquetTaskWriter(self.options)

    spark.dataSource.register(ParquetSink)
    try:
        nation = load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").cast("long"), "n_name"
        )
        nation.repartition(4).write.format("us_sdps_pyparquet_sink").option(
            "path", target
        ).mode("append").save()
        with open(os.path.join(target, "_committed.txt")) as f:
            committed = [p for p in f.read().splitlines() if p]
        if not committed:
            raise ValueError("Python writer committed no files")
        back = spark.read.parquet(*committed)
        out = (
            back.groupBy((F.col("n_nationkey") % 4).cast("long").alias("band"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("n_nationkey").cast("long").alias("sum_key"),
                F.sum(F.length("n_name")).cast("long").alias("sum_name_len"),
            )
            .orderBy("band")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(target, ignore_errors=True)


# --------------------------------------------------------------------------
# storage: page reader on the DELTA_* encodings (v2 writers' defaults)
# --------------------------------------------------------------------------

_PQRAW_DELTA_ORACLE = """
SELECT CAST(c_nationkey AS BIGINT) AS nk,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(c_custkey) AS BIGINT) AS sum_key,
       CAST(sum(length(c_name)) AS BIGINT) AS sum_name_len,
       CAST(count(*) FILTER (WHERE c_custkey % 9 = 0) AS BIGINT) AS n_nulled
FROM customer
GROUP BY 1
ORDER BY 1
"""


@register(
    "storage_parquet_raw_scan_delta",
    oracle=_PQRAW_DELTA_ORACLE,
    tags=("storage", "multimodal"),
    round=13,
)
def storage_parquet_raw_scan_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-Python parquet page reader on the DELTA_* encodings (round
    13): DELTA_BINARY_PACKED for the int columns (zigzag header,
    per-block min_delta, LSB-first bit-packed miniblocks) and
    DELTA_BYTE_ARRAY front coding for the string column (two
    back-to-back DBP streams + suffix bytes) — the encodings v2-era
    writers emit BY DEFAULT, i.e. what foreign files actually contain.
    Same distributed shape as the v1/v2 scan queries: Spark's JVM
    writer lands customer, each binaryFile->mapInPandas task re-encodes
    ITS file with pyarrow `column_encoding=DELTA_*` (512-byte pages so
    multi-page delta streams are load-bearing) and parses the bytes
    with `functions/parquet_raw.py` — no pyarrow on the DECODE side."""
    import glob
    import shutil
    import tempfile
    import uuid as _uuid

    cust = load_table(spark, sf_dir, "customer").selectExpr(
        "CAST(c_custkey AS BIGINT) AS ck",
        "CAST(c_nationkey AS BIGINT) AS nk",
        "c_name AS nm",
        "CASE WHEN c_custkey % 9 = 0 THEN NULL ELSE CAST(c_custkey AS BIGINT) END"
        " AS ck_nullable",
    )
    stage = tempfile.mkdtemp(prefix=f"us_sdps_pqdelta_{_uuid.uuid4().hex[:8]}_")
    try:
        out_dir = f"{stage}/t"
        cust.coalesce(1).write.mode("overwrite").parquet(out_dir)
        assert glob.glob(f"{out_dir}/*.parquet")

        def decode(batches):
            import io

            import pandas as pd
            import pyarrow.parquet as pq

            from us_stock_data_pipeline_spark.functions.parquet_raw import (
                read_column,
            )

            for b in batches:
                for _, row in b.iterrows():
                    t = pq.read_table(io.BytesIO(bytes(row["content"])))
                    sink = io.BytesIO()
                    pq.write_table(
                        t,
                        sink,
                        use_dictionary=False,
                        data_page_version="2.0",
                        data_page_size=512,
                        write_statistics=False,
                        column_encoding={
                            "ck": "DELTA_BINARY_PACKED",
                            "nk": "DELTA_BINARY_PACKED",
                            "nm": "DELTA_BYTE_ARRAY",
                            "ck_nullable": "DELTA_BINARY_PACKED",
                        },
                    )
                    buf = sink.getvalue()
                    yield pd.DataFrame(
                        {
                            "ck": read_column(buf, "ck"),
                            "nk": read_column(buf, "nk"),
                            "nm_len": [
                                None if v is None else len(v)
                                for v in read_column(buf, "nm")
                            ],
                            "ck_nullable": read_column(buf, "ck_nullable"),
                        }
                    )

        files = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.parquet")
            .load(out_dir)
            .select("content")
        )
        decoded = files.mapInPandas(
            decode, "ck long, nk long, nm_len long, ck_nullable long"
        )
        agg = (
            decoded.groupBy("nk")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("ck").cast("long").alias("sum_key"),
                F.sum("nm_len").cast("long").alias("sum_name_len"),
                F.sum(F.when(F.col("ck_nullable").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_nulled"),
            )
            .orderBy("nk")
        )
        rows = agg.collect()
        return spark.createDataFrame(rows, agg.schema)
    finally:
        shutil.rmtree(stage, ignore_errors=True)


# --------------------------------------------------------------------------
# source: Avro Object Container Files without the spark-avro jar
# --------------------------------------------------------------------------

_AVRO_ORACLE = """
SELECT CAST(c_nationkey AS BIGINT) AS nk,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(c_custkey) AS BIGINT) AS sum_key,
       CAST(sum(length(c_name)) FILTER (WHERE c_custkey % 6 <> 0) AS BIGINT)
         AS sum_name_len,
       CAST(count(*) FILTER (WHERE c_custkey % 6 = 0) AS BIGINT) AS n_nulled,
       CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_bal_cents
FROM customer
GROUP BY 1
ORDER BY 1
"""


@register(
    "source_avro_scan",
    oracle=_AVRO_ORACLE,
    tags=("source", "storage"),
    round=13,
)
def source_avro_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro Object Container Files WITHOUT the spark-avro jar (round
    13): the environment prohibits installing Spark's Avro module, so
    the format sat env-gated since round 1 — `functions/avro_io.py`
    retires the gate with a byte-level pure-Python OCF reader+writer
    (zigzag varints, union-coded nulls, deflate/snappy blocks with the
    spec's CRC32, sync markers verified per block). Each mapInPandas
    task serializes ITS customer batch to a real deflate-coded OCF,
    reads the bytes back, and the DECODED rows (with per-row cents
    quantization of the double field) feed the hash-checked aggregate —
    write and read paths both load-bearing. At 100 TB the same reader
    runs over `binaryFile`-listed Avro landing files one task per file,
    with block sync markers as intra-file split points."""
    import pandas as pd

    from us_stock_data_pipeline_spark.functions.avro_io import (
        avro_read,
        avro_write,
    )

    cust = load_table(spark, sf_dir, "customer").selectExpr(
        "CAST(c_custkey AS BIGINT) AS ck",
        "CAST(c_nationkey AS BIGINT) AS nk",
        "CASE WHEN c_custkey % 6 = 0 THEN NULL ELSE c_name END AS nm",
        "CAST(c_acctbal AS DOUBLE) AS bal",
    )
    schema = {
        "type": "record",
        "name": "cust",
        "fields": [
            {"name": "ck", "type": "long"},
            {"name": "nk", "type": "long"},
            {"name": "nm", "type": ["null", "string"]},
            {"name": "bal", "type": "double"},
        ],
    }

    def roundtrip(batches):
        for b in batches:
            if b.empty:
                continue
            rows = [
                {
                    "ck": int(r.ck),
                    "nk": int(r.nk),
                    "nm": None if pd.isna(r.nm) else str(r.nm),
                    "bal": float(r.bal),
                }
                for r in b.itertuples()
            ]
            buf = avro_write(schema, rows, codec="deflate", block_rows=256)
            sch, got = avro_read(buf)
            if got != rows:
                raise ValueError("Avro roundtrip mismatch")
            yield pd.DataFrame(
                {
                    "ck": [g["ck"] for g in got],
                    "nk": [g["nk"] for g in got],
                    "nm_len": [
                        None if g["nm"] is None else len(g["nm"]) for g in got
                    ],
                    "bal_cents": [
                        int((g["bal"] * 100 + 0.5) // 1) for g in got
                    ],
                }
            )

    decoded = cust.mapInPandas(
        roundtrip, "ck long, nk long, nm_len long, bal_cents long"
    )
    return (
        decoded.groupBy("nk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("ck").cast("long").alias("sum_key"),
            F.sum("nm_len").cast("long").alias("sum_name_len"),
            F.sum(F.when(F.col("nm_len").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_nulled"),
            F.sum("bal_cents").cast("long").alias("sum_bal_cents"),
        )
        .orderBy("nk")
    )


# --------------------------------------------------------------------------
# multimodal: AVI/MJPEG video decode — container + frame codec, both real
# --------------------------------------------------------------------------

_AVI_MX, _AVI_MY, _AVI_FRAMES = 3, 2, 4

_AVI_ORACLE = f"""
WITH ids AS (
  SELECT doc_id, source FROM documents WHERE doc_id % 31 = 0
),
cards AS (
  SELECT i.doc_id, i.source, fr.g AS frame,
         i.doc_id + fr.g * 131 AS card
  FROM ids i, LATERAL (SELECT unnest(range(0, {_AVI_FRAMES})) AS g) fr
),
mcus AS (
  SELECT c.doc_id, c.source, c.frame,
         CAST((c.card * 5 + mx.g * 11 + my.g * 3) % 256 AS BIGINT) AS r,
         CAST((c.card * 9 + mx.g * 7 + my.g * 13) % 256 AS BIGINT) AS g,
         CAST((c.card * 3 + mx.g * 17 + my.g * 5) % 256 AS BIGINT) AS b
  FROM cards c,
       LATERAL (SELECT unnest(range(0, {_AVI_MX})) AS g) mx,
       LATERAL (SELECT unnest(range(0, {_AVI_MY})) AS g) my
),
ycc AS (
  SELECT doc_id, source, frame,
         least(greatest((299000*r + 587000*g + 114000*b + 500000) // 1000000, 0), 255) AS y,
         least(greatest((128000000 - 168736*r - 331264*g + 500000*b + 500000) // 1000000, 0), 255) AS cb,
         least(greatest((128000000 + 500000*r - 418688*g - 81312*b + 500000) // 1000000, 0), 255) AS cr
  FROM mcus
),
rgb AS (
  SELECT doc_id, source, frame,
         least(greatest((1000000*y + 1402000*(cr - 128) + 500000 + 512000000) // 1000000 - 512, 0), 255) AS er,
         least(greatest((1000000*y - 344136*(cb - 128) - 714136*(cr - 128) + 500000 + 512000000) // 1000000 - 512, 0), 255) AS eg,
         least(greatest((1000000*y + 1772000*(cb - 128) + 500000 + 512000000) // 1000000 - 512, 0), 255) AS eb
  FROM ycc
)
SELECT source,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_videos,
       CAST(count(DISTINCT (doc_id, frame)) AS BIGINT) AS n_frames,
       CAST(count(*) * 256 AS BIGINT) AS n_pixels,
       CAST(sum(er) * 256 AS BIGINT) AS sum_r,
       CAST(sum(eg) * 256 AS BIGINT) AS sum_g,
       CAST(sum(eb) * 256 AS BIGINT) AS sum_b
FROM rgb
GROUP BY source
ORDER BY source
"""


@register(
    "multimodal_avi_mjpeg_decode",
    oracle=_AVI_ORACLE,
    tags=("llm", "multimodal", "udf"),
    round=13,
)
def multimodal_avi_mjpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL VIDEO decode (round 13): every 31st document carries a
    4-frame MJPEG AVI — RIFF container (hdrl/strl/movi lists, idx1
    index, word alignment) assembled by `functions/avi.py`, each frame
    a genuine baseline 4:2:0 color JPEG test card whose id folds in the
    frame number. The decode stage walks the container (frame count
    cross-checked against the avih header, MJPG fourcc enforced), then
    runs the engine's own `decode_jpeg_color` on every frame — both
    layers real, no media libraries. Constant-MCU cards survive the
    JPEG transit bit-exactly, so the oracle enumerates all frames'
    channel sums in closed form. Plan: one scan, one Arrow
    encode stage, one Arrow decode stage, one rollup; video bytes never
    visit the driver. At 100 TB this is the frame-sampling shape of a
    video-corpus pipeline: one task per video, frames decoded where
    the bytes are."""
    import pandas as pd

    from us_stock_data_pipeline_spark.functions.avi import (
        avi_mjpeg_read,
        avi_mjpeg_write,
    )
    from us_stock_data_pipeline_spark.functions.multimodal import (
        encode_jpeg_color_card,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 31 == 0)
        .select("doc_id", "source")
    )

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "source": pdf["source"],
                    "payload": [
                        avi_mjpeg_write(
                            [
                                encode_jpeg_color_card(
                                    int(d) + fr * 131, _AVI_MX, _AVI_MY
                                )
                                for fr in range(_AVI_FRAMES)
                            ],
                            _AVI_MX * 16,
                            _AVI_MY * 16,
                            fps=8,
                        )
                        for d in pdf["doc_id"]
                    ],
                }
            )

    def decode(batches):
        import numpy as np

        from us_stock_data_pipeline_spark.functions.multimodal import (
            decode_jpeg_color,
        )

        for pdf in batches:
            rows = []
            for d, src, payload in zip(pdf["doc_id"], pdf["source"], pdf["payload"]):
                video = avi_mjpeg_read(bytes(payload))
                if video["width"] != _AVI_MX * 16 or len(video["frames"]) != _AVI_FRAMES:
                    raise ValueError("AVI geometry mismatch")
                sr = sg = sb = px = 0
                for fjpg in video["frames"]:
                    img = decode_jpeg_color(fjpg).astype(np.int64)
                    px += img.shape[0] * img.shape[1]
                    sr += int(img[:, :, 0].sum())
                    sg += int(img[:, :, 1].sum())
                    sb += int(img[:, :, 2].sum())
                rows.append(
                    {
                        "doc_id": int(d),
                        "source": src,
                        "n_frames": len(video["frames"]),
                        "n_pixels": px,
                        "sum_r": sr,
                        "sum_g": sg,
                        "sum_b": sb,
                    }
                )
            yield pd.DataFrame(rows)

    encoded = docs.mapInPandas(
        encode, "doc_id long, source string, payload binary"
    )
    decoded = encoded.mapInPandas(
        decode,
        "doc_id long, source string, n_frames long, n_pixels long,"
        " sum_r long, sum_g long, sum_b long",
    )
    return (
        decoded.groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_videos"),
            F.sum("n_frames").cast("long").alias("n_frames"),
            F.sum("n_pixels").cast("long").alias("n_pixels"),
            F.sum("sum_r").cast("long").alias("sum_r"),
            F.sum("sum_g").cast("long").alias("sum_g"),
            F.sum("sum_b").cast("long").alias("sum_b"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# catalog: DESCRIBE DETAIL — metadata-only table summary
# --------------------------------------------------------------------------

_DETAIL_ORACLE = """
SELECT 'dd_nation' AS table_name,
       'versioned-parquet' AS format,
       CAST(4 AS BIGINT) AS version,  -- seed, UPDATE, DV delete, ADD CONSTRAINT
       CAST(count(DISTINCT n_regionkey) AS BIGINT) AS num_partitions,
       CAST(count(DISTINCT n_regionkey) AS BIGINT) AS num_files,
       'part' AS partition_columns,
       CAST(1 AS BIGINT) AS num_deletion_vectors,
       CAST(1 AS BIGINT) AS num_constraints,
       CAST(1 AS BIGINT) AS num_branches
FROM nation
"""


@register(
    "etl_versioned_sql_describe_detail",
    oracle=_DETAIL_ORACLE,
    tags=("etl", "versioned", "catalog"),
    round=13,
)
def etl_versioned_sql_describe_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta's `DESCRIBE DETAIL` (round 13): one metadata-only row
    summarizing the current snapshot — version, partition/file counts,
    partition columns, live deletion vectors, CHECK constraints,
    branches. Resolution is one manifest read plus the refs listing:
    driver-side, bounded by metadata, NO data scan at any table size
    (the same property DESCRIBE HISTORY has). The staged lifecycle
    (upsert -> UPDATE commit -> DV delete -> ADD CONSTRAINT -> CREATE
    BRANCH) makes every reported count non-trivial and the oracle pins
    them all; `location` is projected out (a temp path)."""
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
        "CAST(n_nationkey * 2 AS BIGINT) AS val",
    )
    root = tempfile.mkdtemp(prefix=f"us_sdps_detail_{_uuid.uuid4().hex[:8]}_")
    try:
        V.versioned_merge_upsert(
            spark, nation, root, key_cols=("k",), partition_cols=("part",)
        )
        register_versioned(
            spark, "dd_nation", root, key_cols=("k",), partition_cols=("part",)
        )
        versioned_sql(spark, "UPDATE dd_nation SET val = val + 1 WHERE k < 5")
        versioned_sql(spark, "DELETE FROM dd_nation WHERE k = 7")
        versioned_sql(
            spark, "ALTER TABLE dd_nation ADD CONSTRAINT val_pos CHECK (val >= 0)"
        )
        versioned_sql(spark, "ALTER TABLE dd_nation CREATE BRANCH audit")
        out = versioned_sql(spark, "DESCRIBE DETAIL dd_nation").select(
            "table_name",
            "format",
            "version",
            "num_partitions",
            "num_files",
            "partition_columns",
            "num_deletion_vectors",
            "num_constraints",
            "num_branches",
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)
