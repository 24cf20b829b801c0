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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
