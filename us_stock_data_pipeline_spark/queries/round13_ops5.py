"""Round-13 operators, part 5 — NESTED columns through the pure-Python
parquet page reader: Dremel repetition/definition-level record assembly
(`functions/parquet_raw.py`), proven on the REAL Spark-written
`embeddings.parquet` fixture with its `array<float>` column.

Reference scope note: the reference (sanantachat/us-stock-data-pipeline)
stores flat OHLCV rows only (`ingest_massive.py:121-137`); nested
list columns are where a training-data pipeline lives (embeddings,
token arrays, span offsets), so the storage tier must read them at the
byte level too.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# storage: page reader over a LIST column (repetition levels + Dremel
# assembly) — reads the fixture file AS WRITTEN, no staging rewrite
# --------------------------------------------------------------------------

_PQRAW_NESTED_ORACLE = """
SELECT CAST(label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(vec_id) AS BIGINT) AS sum_vec_id,
       CAST(sum(len(embedding)) AS BIGINT) AS sum_dim,
       CAST(sum(CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000)
                     AS BIGINT)) AS BIGINT) AS sum_q0,
       CAST(sum(CAST(list_sum(list_transform(
                embedding,
                e -> CAST(floor(CAST(e AS DOUBLE) * 1000000) AS BIGINT)))
            AS BIGINT)) AS BIGINT) AS sum_qall
FROM embeddings
GROUP BY 1
ORDER BY 1
"""


@register(
    "storage_parquet_raw_scan_nested",
    oracle=_PQRAW_NESTED_ORACLE,
    tags=("storage", "multimodal"),
    round=13,
)
def storage_parquet_raw_scan_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-Python parquet page reader over a NESTED column (round 13):
    the `embeddings.parquet` fixture's `array<float>` column is Spark's
    3-level LIST encoding (optional group (LIST) -> repeated group list
    -> element), so decoding it exercises the full Dremel path —
    repetition levels at their true bit width, definition levels > 1,
    and single-leaf record assembly rebuilding null/empty lists and
    per-element values (`functions/parquet_raw.py:_assemble_nested`).
    Unlike the staged v1/v2/delta scan queries, this reads the fixture
    file AS WRITTEN by Spark's JVM writer — a genuine foreign-file
    check. Distribution shape: binaryFile -> one mapInPandas task per
    file (the 100 TB bulk-decode split); all comparisons are exact
    integers (per-element e6 fixed-point floor BEFORE the sums, double
    math identical in both engines)."""

    def decode(batches):
        import math

        import pandas as pd

        from us_stock_data_pipeline_spark.functions.parquet_raw import (
            read_column,
        )

        for b in batches:
            for _, row in b.iterrows():
                buf = bytes(row["content"])
                vec_id = read_column(buf, "vec_id")
                # resolves the embedding.list.element leaf by its
                # top-level name; one nested Python list per record
                emb = read_column(buf, "embedding")
                label = read_column(buf, "label")
                q = [
                    None
                    if v is None
                    else [
                        None if e is None else math.floor(float(e) * 1000000)
                        for e in v
                    ]
                    for v in emb
                ]
                yield pd.DataFrame(
                    {
                        "vec_id": vec_id,
                        "label": label,
                        "dim": [None if v is None else len(v) for v in emb],
                        "q0": [
                            None if (v is None or not v) else v[0] for v in q
                        ],
                        "qall": [
                            None
                            if v is None
                            else sum(e for e in v if e is not None)
                            for v in q
                        ],
                    }
                )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(f"{sf_dir}/embeddings.parquet")
        .select("content")
    )
    decoded = files.mapInPandas(
        decode, "vec_id long, label long, dim long, q0 long, qall long"
    )
    return (
        decoded.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("vec_id").cast("long").alias("sum_vec_id"),
            F.sum("dim").cast("long").alias("sum_dim"),
            F.sum("q0").cast("long").alias("sum_q0"),
            F.sum("qall").cast("long").alias("sum_qall"),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# storage: pure-Python parquet WRITER on a LIST column (write->read loop)
# --------------------------------------------------------------------------

_PQ_WRITE_NESTED_ORACLE = """
SELECT CAST(label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE vec_id % 17 = 0) AS BIGINT) AS n_null_emb,
       CAST(sum(len(embedding)) FILTER (WHERE vec_id % 17 <> 0) AS BIGINT)
         AS sum_dim,
       CAST(sum(
         CASE WHEN vec_id % 17 = 0 THEN NULL ELSE
           CAST(list_sum(list_transform(
                  embedding[2:],
                  e -> CAST(floor(CAST(e AS DOUBLE) * 1000000) AS BIGINT)))
             AS BIGINT)
           + CASE WHEN vec_id % 13 = 0 THEN 0 ELSE
               CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)
             END
         END) AS BIGINT) AS sum_qall
FROM embeddings
GROUP BY 1
ORDER BY 1
"""


@register(
    "storage_parquet_raw_write_nested",
    oracle=_PQ_WRITE_NESTED_ORACLE,
    tags=("storage", "multimodal"),
    round=13,
)
def storage_parquet_raw_write_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-Python parquet WRITER on a LIST column (round 13): each
    mapInPandas task serializes its embeddings batch — vec_id, an
    `array<double>` with crafted null rows (vec_id % 17) and null
    elements (vec_id % 13 nulls element 0), label — through
    `parquet_write.list_type` (3-level LIST schema, repetition levels
    bit-width 1, definition levels bit-width 2, tiny pages so records
    split across page boundaries), reads the bytes back through
    pyarrow's C++ reader AND the in-repo Dremel reader, raises on any
    disagreement, and feeds the DECODED values to the aggregate. The
    hash-match vs DuckDB (which reads the ORIGINAL fixture) proves the
    nested write->read loop preserved every list, null row, null
    element, and double bit. Per-task in-memory files = the 100 TB
    bulk-export shape."""
    from us_stock_data_pipeline_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings").selectExpr(
        "CAST(vec_id AS BIGINT) AS vec_id",
        "embedding",
        "CAST(label AS BIGINT) AS label",
    )

    def roundtrip(batches):
        import io as _io
        import math

        import pandas as pd
        import pyarrow.parquet as pq

        from us_stock_data_pipeline_spark.functions.parquet_raw import (
            read_column,
        )
        from us_stock_data_pipeline_spark.functions.parquet_write import (
            CODEC_SNAPPY,
            PQ_DOUBLE,
            PQ_INT64,
            list_type,
            write_parquet,
        )

        for b in batches:
            if b.empty:
                continue
            vec_id = [int(v) for v in b["vec_id"]]
            label = [int(v) for v in b["label"]]
            rows = []
            for vid, arr in zip(vec_id, b["embedding"]):
                if vid % 17 == 0:
                    rows.append(None)
                else:
                    vals = [float(x) for x in arr]
                    if vid % 13 == 0 and vals:
                        vals[0] = None
                    rows.append(vals)
            buf = write_parquet(
                [
                    ("vec_id", PQ_INT64, False, vec_id),
                    ("emb", list_type(PQ_DOUBLE), True, rows),
                    ("label", PQ_INT64, False, label),
                ],
                codec=CODEC_SNAPPY,
                page_rows=7,  # forces many pages; rows never straddle
                use_dictionary=True,  # label dict-encodes, emb falls back
            )
            t = pq.read_table(_io.BytesIO(buf))
            if (
                t.column("vec_id").to_pylist() != vec_id
                or t.column("emb").to_pylist() != rows
                or t.column("label").to_pylist() != label
            ):
                raise ValueError("pyarrow nested read-back mismatch")
            if (
                read_column(buf, "vec_id") != vec_id
                or read_column(buf, "emb") != rows
                or read_column(buf, "label") != label
            ):
                raise ValueError("raw-reader nested read-back mismatch")
            dec = t.column("emb").to_pylist()
            yield pd.DataFrame(
                {
                    "vec_id": vec_id,
                    "label": label,
                    "dim": [None if v is None else len(v) for v in dec],
                    "qall": [
                        None
                        if v is None
                        else sum(
                            math.floor(e * 1000000)
                            for e in v
                            if e is not None
                        )
                        for v in dec
                    ],
                }
            )

    decoded = emb.mapInPandas(
        roundtrip, "vec_id long, label long, dim long, qall long"
    )
    return (
        decoded.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.when(F.col("dim").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_null_emb"),
            F.sum("dim").cast("long").alias("sum_dim"),
            F.sum("qall").cast("long").alias("sum_qall"),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# multimodal: REAL baseline TIFF decode (PackBits + TIFF-LZW + predictor)
# --------------------------------------------------------------------------

_TIFF_W = 20
_TIFF_H = 12

_TIFF_ORACLE = f"""
WITH ids AS (
  SELECT doc_id, source FROM documents WHERE doc_id % 31 = 0
),
xs AS (SELECT unnest(range(0, {_TIFF_W})) AS x),
ys AS (SELECT unnest(range(0, {_TIFF_H})) AS y),
px AS (
  SELECT i.doc_id, i.source,
         (i.doc_id * 5 + xs.x * 3 + ys.y * 13) % 256 AS r,
         (i.doc_id * 7 + xs.x * 11 + ys.y * 5) % 256 AS g,
         (i.doc_id * 13 + xs.x * 2 + ys.y * 17) % 256 AS b
  FROM ids i CROSS JOIN xs CROSS JOIN ys
)
SELECT source,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_imgs,
       CAST(count(*) AS BIGINT) AS n_pixels,
       CAST(sum(r) AS BIGINT) AS sum_r,
       CAST(sum(g) AS BIGINT) AS sum_g,
       CAST(sum(b) AS BIGINT) AS sum_b
FROM px
GROUP BY source
ORDER BY source
"""


@register(
    "multimodal_tiff_decode",
    oracle=_TIFF_ORACLE,
    tags=("llm", "multimodal", "udf"),
    round=13,
)
def multimodal_tiff_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END REAL baseline **TIFF** decode (round 13) — the
    dominant scanned-document format in web crawls: every 31st document
    gets a 20x12 RGB test card serialized as a genuine TIFF
    (`functions/tiff.py`: header, IFD with sorted tags and
    offset-area values, multi-strip layout with RowsPerStrip 5), with
    the compression scheme cycling per image through all three baseline
    options — none, PackBits (validated against the TIFF 6.0 spec's own
    worked example), and TIFF-variant LZW (MSB-first codes, EARLY
    width change at 510/1022/2046, 4094-entry table reset) with
    predictor-2 horizontal differencing — and the byte order flipping
    to big-endian (MM) for every 5th image. `decode_tiff` parses all of
    it back. Every scheme is lossless, so the oracle enumerates the
    closed-form pixels in SQL and checks per-channel sums bit-exactly.
    Plan shape: one scan, one Arrow encode stage, one Arrow decode
    stage, one rollup; payload bytes never visit the driver."""
    import numpy as np
    import pandas as pd

    from us_stock_data_pipeline_spark.functions.tiff import (
        decode_tiff,
        encode_tiff,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 31 == 0)
        .select("doc_id", "source")
    )

    def encode_batch(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                y, x = np.mgrid[0:_TIFF_H, 0:_TIFF_W]
                img = np.stack(
                    [
                        (d * 5 + x * 3 + y * 13) % 256,
                        (d * 7 + x * 11 + y * 5) % 256,
                        (d * 13 + x * 2 + y * 17) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                comp = (1, 32773, 5)[d % 3]
                payloads.append(
                    encode_tiff(
                        img,
                        compression=comp,
                        predictor=2 if comp == 5 else 1,
                        rows_per_strip=5,
                        big_endian=(d % 5 == 0),
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "source": pdf["source"],
                    "payload": payloads,
                }
            )

    def decode_batch(batches):
        for pdf in batches:
            rows = {"doc_id": [], "source": [], "width": [], "height": [],
                    "sum_r": [], "sum_g": [], "sum_b": []}
            for did, src, payload in zip(
                pdf["doc_id"], pdf["source"], pdf["payload"]
            ):
                img = decode_tiff(bytes(payload)).astype(np.int64)
                rows["doc_id"].append(int(did))
                rows["source"].append(src)
                rows["height"].append(img.shape[0])
                rows["width"].append(img.shape[1])
                rows["sum_r"].append(int(img[:, :, 0].sum()))
                rows["sum_g"].append(int(img[:, :, 1].sum()))
                rows["sum_b"].append(int(img[:, :, 2].sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "source": rows["source"],
                    "width": pd.Series(rows["width"], dtype="int64"),
                    "height": pd.Series(rows["height"], dtype="int64"),
                    "sum_r": pd.Series(rows["sum_r"], dtype="int64"),
                    "sum_g": pd.Series(rows["sum_g"], dtype="int64"),
                    "sum_b": pd.Series(rows["sum_b"], dtype="int64"),
                }
            )

    blobs = docs.mapInPandas(
        encode_batch, "doc_id long, source string, payload binary"
    )
    decoded = blobs.mapInPandas(
        decode_batch,
        "doc_id long, source string, width long, height long,"
        " sum_r long, sum_g long, sum_b long",
    )
    return (
        decoded.groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_imgs"),
            F.sum(F.col("width") * F.col("height")).cast("long").alias("n_pixels"),
            F.sum("sum_r").cast("long").alias("sum_r"),
            F.sum("sum_g").cast("long").alias("sum_g"),
            F.sum("sum_b").cast("long").alias("sum_b"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# catalog: ALTER TABLE ADD/DROP COLUMN — metadata-only schema evolution
# --------------------------------------------------------------------------

_SQL_SCHEMA_EVO_ORACLE = """
WITH base AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nk,
         CAST(c_nationkey % 5 AS BIGINT) AS band,
         CAST(count(*) AS BIGINT) AS val
  FROM customer GROUP BY 1, 2
),
cur AS (
  SELECT nk, band, CAST(NULL AS BIGINT) AS score FROM base
  UNION ALL
  SELECT nk + 1000, CAST(9 AS BIGINT), val * 2 FROM base
),
agg AS (
  SELECT band,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(*) FILTER (WHERE score IS NULL) AS BIGINT) AS n_score_null,
         CAST(sum(score) AS BIGINT) AS sum_score
  FROM cur GROUP BY 1
),
v1 AS (SELECT band, CAST(sum(val) AS BIGINT) AS sum_val_v1 FROM base GROUP BY 1)
SELECT a.band, a.n_rows, a.n_score_null, a.sum_score, v.sum_val_v1
FROM agg a LEFT JOIN v1 v USING (band)
ORDER BY a.band
"""


@register(
    "etl_versioned_sql_schema_evolution",
    oracle=_SQL_SCHEMA_EVO_ORACLE,
    tags=("etl", "versioned", "sql"),
    round=13,
)
def etl_versioned_sql_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`ALTER TABLE ADD COLUMN` / `DROP COLUMN` / `RENAME COLUMN`
    through the SQL front-end (round 13, etl/vcatalog.py +
    versioned.add_column/drop_column/rename_column): all
    METADATA-ONLY commits — kilobytes of
    manifest, zero data rewrite, which at 100 TB is the difference
    between an instant DDL and a day-long table rewrite (Delta's
    add-column and column-mapping drop semantics). The script: build
    per-nation counts, ADD COLUMN score (reads project typed NULL with
    no write), INSERT shifted rows that MATERIALIZE score, DROP COLUMN
    val (data files keep the bytes; reads at/after this version project
    it away, while `VERSION AS OF 1` still serves it — schema evolution
    is itself versioned). RENAME COLUMN then maps score->quality
    (visible->physical indirection: the following INSERT arrives under
    the NEW name and is translated back before staging; a DV DELETE
    removes the probe row so the oracle is unaffected). The final
    aggregate joins the post-evolution
    table against the time-traveled v1 sums, and the oracle recomputes
    both from the base fixture."""
    import shutil
    import tempfile
    import uuid as _uuid

    from us_stock_data_pipeline_spark.etl.vcatalog import (
        register_versioned,
        unregister_versioned,
        versioned_sql,
    )
    from us_stock_data_pipeline_spark.etl.versioned import versioned_merge_upsert

    base = (
        load_table(spark, sf_dir, "customer")
        .groupBy(
            F.col("c_nationkey").cast("long").alias("nk"),
            (F.col("c_nationkey") % 5).cast("long").alias("band"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("val"))
    )
    root = tempfile.mkdtemp(prefix=f"us_sdps_vevo_{_uuid.uuid4().hex[:8]}_")
    name = f"vevo_{_uuid.uuid4().hex[:8]}"
    try:
        versioned_merge_upsert(
            spark, base, root, key_cols=("nk",), partition_cols=("band",)
        )
        register_versioned(
            spark, name, root, key_cols=("nk",), partition_cols=("band",)
        )
        versioned_sql(spark, f"ALTER TABLE {name} ADD COLUMN score BIGINT")
        assert (
            spark.table(name).filter(F.col("score").isNotNull()).count() == 0
        ), "metadata-only ADD COLUMN must read as NULL"
        versioned_sql(
            spark,
            f"INSERT INTO {name} (nk, band, val, score) "
            f"SELECT nk + 1000, CAST(9 AS BIGINT), val, val * 2 FROM {name}",
        )
        versioned_sql(spark, f"ALTER TABLE {name} DROP COLUMN val")
        # RENAME COLUMN: metadata-only visible->physical mapping; the
        # INSERT below arrives under the NEW name and is translated
        # back to the physical column before staging
        versioned_sql(
            spark, f"ALTER TABLE {name} RENAME COLUMN score TO quality"
        )
        versioned_sql(
            spark,
            f"INSERT INTO {name} (nk, band, quality) "
            f"VALUES (9999, CAST(9 AS BIGINT), CAST(1 AS BIGINT))",
        )
        versioned_sql(spark, f"DELETE FROM {name} WHERE nk = 9999")
        cur = spark.table(name)
        assert "val" not in cur.columns, "DROP COLUMN must hide the column"
        assert "quality" in cur.columns and "score" not in cur.columns
        agg = (
            cur.groupBy("band")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.when(F.col("quality").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_score_null"),
                F.sum("quality").cast("long").alias("sum_score"),
            )
        )
        v1 = versioned_sql(
            spark,
            f"SELECT band, CAST(sum(val) AS BIGINT) AS sum_val_v1 "
            f"FROM {name} VERSION AS OF 1 GROUP BY band",
        )
        out = agg.join(v1, "band", "left").orderBy("band")
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        unregister_versioned(spark, name)
        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------------------------------------
# storage: page reader on BOOLEAN / DECIMAL-FLBA / BYTE_STREAM_SPLIT
# --------------------------------------------------------------------------

_PQRAW_TYPES_ORACLE = """
SELECT CAST(c_nationkey AS BIGINT) AS nk,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE c_custkey % 2 = 0) AS BIGINT) AS n_even,
       CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_bal_cents,
       CAST(sum(CAST(floor(CAST(c_custkey AS DOUBLE) / 4 * 1000000)
                     AS BIGINT)) AS BIGINT) AS sum_qratio
FROM customer
GROUP BY 1
ORDER BY 1
"""


@register(
    "storage_parquet_raw_scan_types",
    oracle=_PQRAW_TYPES_ORACLE,
    tags=("storage", "multimodal"),
    round=13,
)
def storage_parquet_raw_scan_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-Python parquet page reader on the REMAINING physical types
    and value encodings (round 13): BOOLEAN (bit-packed PLAIN in v1
    pages AND the RLE value encoding v2 writers emit by default),
    DECIMAL as FIXED_LEN_BYTE_ARRAY (big-endian two's-complement at
    the declared width — the reader returns raw bytes and this query
    does the e2-scale integer conversion, the same physical/logical
    split as timestamps), and BYTE_STREAM_SPLIT byte-transposed
    doubles. Same distributed shape as the delta-encoding scan: each
    binaryFile->mapInPandas task re-encodes ITS file with pyarrow
    (decimal128, BSS on the double, v2 pages with 512-byte pages) and
    parses the bytes with `functions/parquet_raw.py` — no pyarrow on
    the DECODE side. Exact integers end to end: cents for the decimal,
    e6 fixed-point floor for the double."""
    import glob
    import shutil
    import tempfile
    import uuid as _uuid

    cust = load_table(spark, sf_dir, "customer").selectExpr(
        "CAST(c_custkey AS BIGINT) AS ck",
        "CAST(c_nationkey AS BIGINT) AS nk",
        "c_custkey % 2 = 0 AS is_even",
        "CAST(c_acctbal AS DECIMAL(20, 2)) AS bal",
        "CAST(c_custkey AS DOUBLE) / 4 AS ratio",
    )
    stage = tempfile.mkdtemp(prefix=f"us_sdps_pqtypes_{_uuid.uuid4().hex[:8]}_")
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
                        use_byte_stream_split=["ratio"],
                    )
                    buf = sink.getvalue()
                    bal_raw = read_column(buf, "bal")
                    yield pd.DataFrame(
                        {
                            "nk": read_column(buf, "nk"),
                            "is_even": read_column(buf, "is_even"),
                            "bal_cents": [
                                None
                                if v is None
                                else int.from_bytes(v, "big", signed=True)
                                for v in bal_raw
                            ],
                            "ratio": read_column(buf, "ratio"),
                        }
                    )

        files = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.parquet")
            .load(out_dir)
            .select("content")
        )
        decoded = files.mapInPandas(
            decode, "nk long, is_even boolean, bal_cents long, ratio double"
        )
        agg = (
            decoded.groupBy("nk")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.when(F.col("is_even"), 1).otherwise(0))
                .cast("long")
                .alias("n_even"),
                F.sum("bal_cents").cast("long").alias("sum_bal_cents"),
                F.sum(F.floor(F.col("ratio") * 1000000))
                .cast("long")
                .alias("sum_qratio"),
            )
            .orderBy("nk")
        )
        rows = agg.collect()
        return spark.createDataFrame(rows, agg.schema)
    finally:
        shutil.rmtree(stage, ignore_errors=True)


# --------------------------------------------------------------------------
# tokenizer: WordPiece pair-likelihood scoring step
# --------------------------------------------------------------------------

# WordPiece picks the merge maximizing count(ab) / (count(a)*count(b))
# (the likelihood-gain criterion, vs BPE's raw count(ab)). The score is
# computed in e9 fixed point with pure BIGINT arithmetic — `div` in
# Spark pairs with `//` in DuckDB (both truncate) — so the ranking is
# cross-engine exact with no float in sight.
_WORDPIECE_ORACLE = """
WITH words AS (
  SELECT w AS word, CAST(count(*) AS BIGINT) AS wcnt
  FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
    FROM documents
  )
  GROUP BY 1
),
sym AS (
  SELECT s, CAST(sum(wcnt) AS BIGINT) AS scnt
  FROM (
    SELECT unnest(list_transform(range(1, length(word) + 1),
                                 i -> substr(word, CAST(i AS INTEGER), 1))) AS s,
           wcnt
    FROM words
  )
  GROUP BY 1
),
pairs AS (
  SELECT p, CAST(sum(wcnt) AS BIGINT) AS pcnt
  FROM (
    SELECT unnest(list_transform(range(1, length(word)),
                                 i -> substr(word, CAST(i AS INTEGER), 2))) AS p,
           wcnt
    FROM words
    WHERE length(word) >= 2
  )
  GROUP BY 1
),
scored AS (
  SELECT p AS pair, pcnt,
         l.scnt AS lcnt, r.scnt AS rcnt,
         CAST(pcnt * 1000000000 // (l.scnt * r.scnt) AS BIGINT) AS score_e9
  FROM pairs
  JOIN sym l ON l.s = substr(p, 1, 1)
  JOIN sym r ON r.s = substr(p, 2, 1)
),
ranked AS (
  SELECT pair, pcnt, lcnt, rcnt, score_e9,
         row_number() OVER (ORDER BY score_e9 DESC, pair) AS rnk
  FROM scored
)
SELECT CAST(rnk AS BIGINT) AS rnk, pair, pcnt, lcnt, rcnt, score_e9
FROM ranked WHERE rnk <= 30
ORDER BY rnk
"""


@register(
    "tokenizer_wordpiece_score_step",
    oracle=_WORDPIECE_ORACLE,
    tags=("llm", "text", "tokenizer"),
    round=13,
)
def tokenizer_wordpiece_score_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece trainer selection step (round 13) — the THIRD
    tokenizer-training algorithm alongside BPE (`bpe_merge_step`) and
    unigram-LM (`tokenizer_unigram_em_step`): where BPE merges the most
    FREQUENT adjacent pair, WordPiece merges the pair maximizing the
    LIKELIHOOD GAIN count(ab)/(count(a))*count(b)) — frequent-but-
    expected pairs lose to rarer-but-informative ones (Schuster & Nakajima
    2012; the scheme behind BERT's vocabulary). Corpus counts are
    word-scoped (pairs never straddle word boundaries): words explode
    in-stage, symbol and pair counts are two-stage partial aggregates
    over tiny key spaces (26 symbols, <= 676 pairs), the score is e9
    fixed point in pure BIGINT (`div` <-> `//`, both truncate), and the
    final rank sorts only the aggregated candidates. At 100 TB: one
    scan + kilobyte shuffles — aggregate state moves, never the
    corpus."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wcnt"))
    )
    sym = (
        words.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word)),"
                    " i -> substring(word, i, 1))"
                )
            ).alias("s"),
            "wcnt",
        )
        .groupBy("s")
        .agg(F.sum("wcnt").cast("long").alias("scnt"))
    )
    pairs = (
        words.filter(F.length("word") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word) - 1),"
                    " i -> substring(word, i, 2))"
                )
            ).alias("p"),
            "wcnt",
        )
        .groupBy("p")
        .agg(F.sum("wcnt").cast("long").alias("pcnt"))
    )
    left = sym.select(F.col("s").alias("ls"), F.col("scnt").alias("lcnt"))
    right = sym.select(F.col("s").alias("rs"), F.col("scnt").alias("rcnt"))
    scored = (
        pairs.join(F.broadcast(left), F.expr("substring(p, 1, 1) = ls"))
        .join(F.broadcast(right), F.expr("substring(p, 2, 1) = rs"))
        .select(
            F.col("p").alias("pair"),
            "pcnt",
            "lcnt",
            "rcnt",
            F.expr("CAST(pcnt * 1000000000 div (lcnt * rcnt) AS BIGINT)").alias(
                "score_e9"
            ),
        )
    )
    w = W.orderBy(F.desc("score_e9"), F.asc("pair"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 30)
        .select("rnk", "pair", "pcnt", "lcnt", "rcnt", "score_e9")
        .orderBy("rnk")
    )


# --------------------------------------------------------------------------
# source: Arrow IPC / Feather v2 without pyarrow on the decode side
# --------------------------------------------------------------------------

_ARROW_IPC_ORACLE = """
SELECT CAST(c_nationkey AS BIGINT) AS nk,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(c_custkey) AS BIGINT) AS sum_key,
       CAST(count(*) FILTER (WHERE c_custkey % 2 = 0) AS BIGINT) AS n_even,
       CAST(sum(length(c_name)) FILTER (WHERE c_custkey % 6 <> 0) AS BIGINT)
         AS sum_name_len,
       CAST(count(*) FILTER (WHERE c_custkey % 6 = 0) AS BIGINT) AS n_nulled,
       CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_bal_cents,
       CAST(sum(c_custkey % 5 + 1) AS BIGINT) AS sum_tags
FROM customer
GROUP BY 1
ORDER BY 1
"""


@register(
    "source_arrow_ipc_scan",
    oracle=_ARROW_IPC_ORACLE,
    tags=("source", "storage"),
    round=13,
)
def source_arrow_ipc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow IPC / Feather v2 ingested WITHOUT pyarrow on the decode
    side (round 13, `functions/arrow_ipc.py`): each mapInPandas task
    serializes its customer batch to a genuine ARROW1 file (pyarrow
    writer, 512-row record batches so multi-batch concatenation is
    load-bearing) carrying int64/bool/utf8/float64 AND a list<int64>
    column with nulls — then the in-repo reader parses it from raw
    bytes: hand-rolled flatbuffers (vtables, unions, struct vectors),
    encapsulated-message framing, and validity-bitmap array assembly.
    The decoded (not original) values feed the aggregate, so the
    hash-match vs DuckDB proves the full encode->decode loop down to
    the list elements (sum_tags sums per-row list contents). Arrow IPC
    is the wire format a modern data service hands back; speaking it
    byte-level from any executor, dependency-free, is the connector
    property that matters at fleet scale."""
    cust = load_table(spark, sf_dir, "customer").selectExpr(
        "CAST(c_custkey AS BIGINT) AS ck",
        "CAST(c_nationkey AS BIGINT) AS nk",
        "c_custkey % 2 = 0 AS is_even",
        "CASE WHEN c_custkey % 6 = 0 THEN NULL ELSE c_name END AS nm",
        "CAST(c_acctbal AS DOUBLE) AS bal",
        "transform(sequence(1, CAST(c_custkey % 5 AS INT) + 1), i -> CAST(i AS BIGINT))"
        " AS tags",
    )

    def roundtrip(batches):
        import io as _io
        import math

        import pandas as pd
        import pyarrow as pa

        from us_stock_data_pipeline_spark.functions.arrow_ipc import (
            read_arrow_ipc,
        )

        for b in batches:
            if b.empty:
                continue
            t = pa.table(
                {
                    "ck": pa.array([int(v) for v in b["ck"]], pa.int64()),
                    "nk": pa.array([int(v) for v in b["nk"]], pa.int64()),
                    "is_even": pa.array([bool(v) for v in b["is_even"]]),
                    "nm": pa.array(
                        [
                            None if v is None else str(v)
                            for v in b["nm"].astype(object).where(
                                b["nm"].notna(), None
                            )
                        ],
                        pa.string(),
                    ),
                    "bal": pa.array([float(v) for v in b["bal"]], pa.float64()),
                    "tags": pa.array(
                        [[int(x) for x in v] for v in b["tags"]],
                        pa.list_(pa.int64()),
                    ),
                }
            )
            sink = _io.BytesIO()
            with pa.ipc.new_file(sink, t.schema) as w:
                for batch in t.to_batches(max_chunksize=512):
                    w.write_batch(batch)
            names, cols = read_arrow_ipc(sink.getvalue())
            d = dict(zip(names, cols))
            if d["ck"] != t["ck"].to_pylist() or d["tags"] != t["tags"].to_pylist():
                raise ValueError("Arrow IPC read-back mismatch")
            yield pd.DataFrame(
                {
                    "nk": d["nk"],
                    "ck": d["ck"],
                    "is_even": d["is_even"],
                    "nm_len": [None if v is None else len(v) for v in d["nm"]],
                    "bal_cents": [
                        math.floor(v * 100 + 0.5) for v in d["bal"]
                    ],
                    "n_tags": [len(v) for v in d["tags"]],
                }
            )

    decoded = cust.mapInPandas(
        roundtrip,
        "nk long, ck long, is_even boolean, nm_len long, bal_cents long,"
        " n_tags long",
    )
    return (
        decoded.groupBy("nk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("ck").cast("long").alias("sum_key"),
            F.sum(F.when(F.col("is_even"), 1).otherwise(0))
            .cast("long")
            .alias("n_even"),
            F.sum("nm_len").cast("long").alias("sum_name_len"),
            F.sum(F.when(F.col("nm_len").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_nulled"),
            F.sum("bal_cents").cast("long").alias("sum_bal_cents"),
            F.sum("n_tags").cast("long").alias("sum_tags"),
        )
        .orderBy("nk")
    )


# --------------------------------------------------------------------------
# sink: Arrow IPC WRITER — flatbuffers emitted by the engine itself
# --------------------------------------------------------------------------

_ARROW_IPC_WRITE_ORACLE = """
SELECT CAST(c_nationkey AS BIGINT) AS nk,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(c_custkey) AS BIGINT) AS sum_key,
       CAST(sum(length(c_name)) FILTER (WHERE c_custkey % 9 <> 0) AS BIGINT)
         AS sum_name_len,
       CAST(count(*) FILTER (WHERE c_custkey % 9 = 0) AS BIGINT) AS n_nulled,
       CAST(sum(c_custkey % 4 + 1) AS BIGINT) AS sum_tags
FROM customer
GROUP BY 1
ORDER BY 1
"""


@register(
    "sink_arrow_ipc_writer",
    oracle=_ARROW_IPC_WRITE_ORACLE,
    tags=("sink", "storage"),
    round=13,
)
def sink_arrow_ipc_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow IPC WRITER with every flatbuffer byte emitted by the
    engine itself (round 13, `arrow_ipc.write_arrow_ipc`): each
    mapInPandas task serializes its customer batch — int64s, nullable
    strings, a list<int64> column — into an IPC STREAM (schema message
    with hand-built vtables/unions, 128-row record batches, validity
    bitmaps, end-of-stream marker), then reads it back through TWO
    independent decoders — pyarrow's C++ reader (which runs its
    flatbuffers VERIFIER on untrusted bytes, so alignment and vtable
    shape are checked, not just parseable-by-us) and the in-repo
    `read_arrow_ipc` — raising on any disagreement. Decoded values
    feed the aggregate. With the parquet writer this completes the
    dependency-free export matrix: an executor can hand Arrow IPC to
    a downstream service with no pyarrow at all."""
    cust = load_table(spark, sf_dir, "customer").selectExpr(
        "CAST(c_custkey AS BIGINT) AS ck",
        "CAST(c_nationkey AS BIGINT) AS nk",
        "CASE WHEN c_custkey % 9 = 0 THEN NULL ELSE c_name END AS nm",
        "transform(sequence(1, CAST(c_custkey % 4 AS INT) + 1), i -> CAST(i AS BIGINT))"
        " AS tags",
    )

    def roundtrip(batches):
        import io as _io

        import pandas as pd
        import pyarrow as pa

        from us_stock_data_pipeline_spark.functions.arrow_ipc import (
            read_arrow_ipc,
            write_arrow_ipc,
        )

        for b in batches:
            if b.empty:
                continue
            ck = [int(v) for v in b["ck"]]
            nk = [int(v) for v in b["nk"]]
            nm = [
                None if v is None else str(v)
                for v in b["nm"].astype(object).where(b["nm"].notna(), None)
            ]
            tags = [[int(x) for x in v] for v in b["tags"]]
            buf = write_arrow_ipc(
                ["ck", "nk", "nm", "tags"],
                ["int64", "int64", "utf8", "list<int64>"],
                [ck, nk, nm, tags],
                batch_rows=128,
            )
            t = pa.ipc.open_stream(_io.BytesIO(buf)).read_all()
            if (
                t["ck"].to_pylist() != ck
                or t["nm"].to_pylist() != nm
                or t["tags"].to_pylist() != tags
            ):
                raise ValueError("pyarrow IPC read-back mismatch")
            _names, cols = read_arrow_ipc(buf)
            if cols != [ck, nk, nm, tags]:
                raise ValueError("own-reader IPC read-back mismatch")
            yield pd.DataFrame(
                {
                    "nk": nk,
                    "ck": ck,
                    "nm_len": [None if v is None else len(v) for v in nm],
                    "n_tags": [len(v) for v in tags],
                }
            )

    decoded = cust.mapInPandas(
        roundtrip, "nk long, ck long, nm_len long, n_tags long"
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
            F.sum("n_tags").cast("long").alias("sum_tags"),
        )
        .orderBy("nk")
    )


# --------------------------------------------------------------------------
# storage: ORC decoded from raw bytes (protobuf + RLEv2, no JVM reader)
# --------------------------------------------------------------------------

_ORC_RAW_ORACLE = """
SELECT CAST(c_nationkey AS BIGINT) AS nk,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(c_custkey) AS BIGINT) AS sum_key,
       CAST(count(*) FILTER (WHERE c_custkey % 3 = 0) AS BIGINT) AS n_flagged,
       CAST(sum(length(c_name)) FILTER (WHERE c_custkey % 9 <> 0) AS BIGINT)
         AS sum_name_len,
       CAST(count(*) FILTER (WHERE c_custkey % 9 = 0) AS BIGINT) AS n_nulled,
       CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_bal_cents
FROM customer
GROUP BY 1
ORDER BY 1
"""


@register(
    "storage_orc_raw_scan",
    oracle=_ORC_RAW_ORACLE,
    tags=("storage", "source"),
    round=13,
)
def storage_orc_raw_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC decoded from RAW BYTES (round 13, `functions/orc_raw.py`) —
    the storage matrix's fourth format next to parquet, Avro OCF, and
    Arrow IPC: Spark's own Java ORC writer lands customer (zlib
    chunked streams, dictionary + direct strings, RLEv2 integers,
    PRESENT bit-streams), and each binaryFile->mapInPandas task parses
    ITS file with the pure-Python reader — protobuf postscript/footer/
    stripe-footer walk, DEFLATE chunk framing, byte-RLE, and all four
    RLEv2 sub-encodings (short-repeat, direct, patched-base with the
    closest-fixed-bits patch-entry rounding, delta) — no JVM reader,
    no pyarrow on the decode side. The decoded values feed the
    aggregate; the oracle recomputes from the fixture. Per-FILE task
    split = the 100 TB bulk re-decode shape; production scans stay on
    Spark's vectorized reader."""
    import glob
    import shutil
    import tempfile
    import uuid as _uuid

    cust = load_table(spark, sf_dir, "customer").selectExpr(
        "CAST(c_custkey AS BIGINT) AS ck",
        "CAST(c_nationkey AS BIGINT) AS nk",
        "c_custkey % 3 = 0 AS flag",
        "CASE WHEN c_custkey % 9 = 0 THEN NULL ELSE c_name END AS nm",
        "CAST(c_acctbal AS DOUBLE) AS bal",
    )
    stage = tempfile.mkdtemp(prefix=f"us_sdps_orcraw_{_uuid.uuid4().hex[:8]}_")
    try:
        out_dir = f"{stage}/t"
        cust.coalesce(1).write.mode("overwrite").option(
            "compression", "zlib"
        ).orc(out_dir)
        assert glob.glob(f"{out_dir}/*.orc")

        def decode(batches):
            import math

            import pandas as pd

            from us_stock_data_pipeline_spark.functions.orc_raw import read_orc

            for b in batches:
                for _, row in b.iterrows():
                    names, cols = read_orc(bytes(row["content"]))
                    d = dict(zip(names, cols))
                    yield pd.DataFrame(
                        {
                            "nk": d["nk"],
                            "ck": d["ck"],
                            "flag": d["flag"],
                            "nm_len": [
                                None if v is None else len(v) for v in d["nm"]
                            ],
                            "bal_cents": [
                                math.floor(v * 100 + 0.5) for v in d["bal"]
                            ],
                        }
                    )

        files = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.orc")
            .load(out_dir)
            .select("content")
        )
        decoded = files.mapInPandas(
            decode, "nk long, ck long, flag boolean, nm_len long, bal_cents long"
        )
        agg = (
            decoded.groupBy("nk")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("ck").cast("long").alias("sum_key"),
                F.sum(F.when(F.col("flag"), 1).otherwise(0))
                .cast("long")
                .alias("n_flagged"),
                F.sum("nm_len").cast("long").alias("sum_name_len"),
                F.sum(F.when(F.col("nm_len").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_nulled"),
                F.sum("bal_cents").cast("long").alias("sum_bal_cents"),
            )
            .orderBy("nk")
        )
        rows = agg.collect()
        return spark.createDataFrame(rows, agg.schema)
    finally:
        shutil.rmtree(stage, ignore_errors=True)


# --------------------------------------------------------------------------
# sink: ORC WRITER — every protobuf/RLEv2 byte emitted by the engine
# --------------------------------------------------------------------------

_ORC_WRITE_ORACLE = """
SELECT CAST(c_nationkey AS BIGINT) AS nk,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(c_custkey) AS BIGINT) AS sum_key,
       CAST(count(*) FILTER (WHERE c_custkey % 4 = 0) AS BIGINT) AS n_flagged,
       CAST(sum(length(c_name)) FILTER (WHERE c_custkey % 7 <> 0) AS BIGINT)
         AS sum_name_len,
       CAST(count(*) FILTER (WHERE c_custkey % 7 = 0) AS BIGINT) AS n_nulled,
       CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_bal_cents
FROM customer
GROUP BY 1
ORDER BY 1
"""


@register(
    "sink_orc_raw_writer",
    oracle=_ORC_WRITE_ORACLE,
    tags=("sink", "storage"),
    round=13,
)
def sink_orc_raw_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC WRITER with every byte emitted by the engine itself (round
    13, `orc_raw.write_orc`): each mapInPandas task serializes its
    customer batch — longs, doubles, booleans, nullable strings — into
    a complete ORC file (protobuf PostScript/Footer/StripeFooter,
    chunked-DEFLATE stream framing, PRESENT byte-RLE bit-streams,
    RLEv2 integers with SHORT_REPEAT + DIRECT runs, DIRECT_V2
    strings, 512-row stripes so multi-stripe assembly is
    load-bearing), then reads it back through TWO independent
    decoders — pyarrow's C++ ORC reader and the in-repo `read_orc` —
    raising on any disagreement (Spark's Java reader accepts the same
    files, pinned in tests/test_orc_raw.py). Decoded values feed the
    aggregate. With parquet, Avro, and Arrow IPC writers this closes
    the dependency-free export matrix across all four formats."""
    cust = load_table(spark, sf_dir, "customer").selectExpr(
        "CAST(c_custkey AS BIGINT) AS ck",
        "CAST(c_nationkey AS BIGINT) AS nk",
        "c_custkey % 4 = 0 AS flag",
        "CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_name END AS nm",
        "CAST(c_acctbal AS DOUBLE) AS bal",
    )

    def roundtrip(batches):
        import io as _io
        import math

        import pandas as pd
        import pyarrow.orc as po

        from us_stock_data_pipeline_spark.functions.orc_raw import (
            read_orc,
            write_orc,
        )

        for b in batches:
            if b.empty:
                continue
            ck = [int(v) for v in b["ck"]]
            nk = [int(v) for v in b["nk"]]
            flag = [bool(v) for v in b["flag"]]
            nm = [
                None if v is None else str(v)
                for v in b["nm"].astype(object).where(b["nm"].notna(), None)
            ]
            bal = [float(v) for v in b["bal"]]
            buf = write_orc(
                ["ck", "nk", "flag", "nm", "bal"],
                ["long", "long", "boolean", "string", "double"],
                [ck, nk, flag, nm, bal],
                compression="zlib",
                stripe_rows=512,
            )
            t = po.read_table(_io.BytesIO(buf))
            if (
                t["ck"].to_pylist() != ck
                or t["nm"].to_pylist() != nm
                or t["flag"].to_pylist() != flag
                or t["bal"].to_pylist() != bal
            ):
                raise ValueError("pyarrow ORC read-back mismatch")
            _names, cols = read_orc(buf)
            if cols != [ck, nk, flag, nm, bal]:
                raise ValueError("own-reader ORC read-back mismatch")
            yield pd.DataFrame(
                {
                    "nk": nk,
                    "ck": ck,
                    "flag": flag,
                    "nm_len": [None if v is None else len(v) for v in nm],
                    "bal_cents": [math.floor(v * 100 + 0.5) for v in bal],
                }
            )

    decoded = cust.mapInPandas(
        roundtrip, "nk long, ck long, flag boolean, nm_len long, bal_cents long"
    )
    return (
        decoded.groupBy("nk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("ck").cast("long").alias("sum_key"),
            F.sum(F.when(F.col("flag"), 1).otherwise(0))
            .cast("long")
            .alias("n_flagged"),
            F.sum("nm_len").cast("long").alias("sum_name_len"),
            F.sum(F.when(F.col("nm_len").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_nulled"),
            F.sum("bal_cents").cast("long").alias("sum_bal_cents"),
        )
        .orderBy("nk")
    )


# --------------------------------------------------------------------------
# ETL: per-file BLOOM KEY INDEX — point-lookup file skipping
# --------------------------------------------------------------------------

_BLOOM_IDS = (3, 57, 911)

_BLOOM_ORACLE = f"""
SELECT CAST(event_id AS BIGINT) AS event_id,
       event_type,
       CAST(date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT)
         AS day,
       CAST(round(value * 100) AS BIGINT) AS cents,
       TRUE AS files_pruned
FROM events
WHERE event_id IN {_BLOOM_IDS}
ORDER BY event_id
"""


@register(
    "etl_versioned_bloom_index_skipping",
    oracle=_BLOOM_ORACLE,
    tags=("etl", "layout", "scale", "versioned"),
    round=13,
)
def etl_versioned_bloom_index_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file BLOOM KEY INDEX on the versioned table (round 13) —
    Hudi's bloom index / parquet bloom filters re-expressed on the
    manifest protocol, the POINT-LOOKUP complement to the zone maps'
    range pruning: a bloom-enabled merge records a 1 KiB bitset per
    (file, key column) in the manifest (positions from md5 over the
    value's string form, computed by Spark SQL at harvest and plain
    Python at probe — engine-neutral), and
    `read_versioned(key_filter=...)` drops files that provably lack
    every probed key before any listing or scan is planned. The
    fixture partitions events by (event_type, week), so a 3-id fetch
    must keep at most a handful of files and SKIP the rest —
    `plan_snapshot_files` is consulted and the hashed `files_pruned`
    column pins that skipping actually happened. At 100 TB this is
    what makes "fetch these 3 records" (GDPR lookups, MERGE probes)
    cost a manifest walk plus a few file reads instead of a table
    scan. False positives only cost an extra file read; false
    negatives are impossible (tests/test_bloom_index.py probes
    exhaustively)."""
    from us_stock_data_pipeline_spark.etl.versioned import (
        plan_snapshot_files,
        read_versioned,
        versioned_merge_upsert,
    )

    src_stat = os.stat(os.path.join(sf_dir, "events.parquet"))
    root = os.path.join(
        tempfile.gettempdir(),
        "us_sdps_bloomidx",
        hashlib.sha1(sf_dir.encode()).hexdigest()[:12],
    )
    marker = os.path.join(root, "_staged.json")
    want = {"size": src_stat.st_size, "mtime": src_stat.st_mtime,
            "bloom_bits": 65536}
    have = None
    if os.path.exists(marker):
        try:
            with open(marker, encoding="utf-8") as fh:
                have = json.load(fh)
        except Exception:  # noqa: BLE001 — corrupt marker: restage
            have = None
    if have != want:
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            "event_type",
            (F.datediff(F.col("ts"), F.lit("2024-01-01").cast("timestamp")) / 7)
            .cast("long")
            .alias("wk"),
            F.datediff(F.col("ts"), F.lit("2024-01-01").cast("timestamp"))
            .cast("long")
            .alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        versioned_merge_upsert(
            spark,
            ev,
            root,
            key_cols=("event_id",),
            partition_cols=("event_type", "wk"),
            bloom_cols=("event_id",),
        )
        with open(marker, "w", encoding="utf-8") as fh:
            json.dump(want, fh)
    probe = list(_BLOOM_IDS)
    kept, skipped = plan_snapshot_files(
        spark, root, key_filter={"event_id": probe}
    )
    n_kept = sum(len(v) for v in kept.values())
    snap = read_versioned(spark, root, key_filter={"event_id": probe})
    return (
        snap.filter(F.col("event_id").isin(probe))
        .select(
            F.col("event_id").cast("long"),
            "event_type",
            F.col("day").cast("long"),
            F.col("cents").cast("long"),
        )
        .withColumn("files_pruned", F.lit(len(skipped) > n_kept))
        .orderBy("event_id")
    )
