"""Round-13 operators.

- `storage_parquet_raw_scan_v2` — the pure-Python parquet page reader
  over DATA PAGE V2 + GZIP files (VERDICT r12 #2): each task re-encodes
  one Spark-written file to pyarrow's `data_page_version='2.0'` with
  512-byte gzip pages in memory, then parses those bytes with
  `functions/parquet_raw.py` — v2 layout (levels uncompressed ahead of
  the values section, per-page is_compressed) exercised distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# storage: page reader on DATA PAGE V2 + GZIP (VERDICT r12 #2)
# --------------------------------------------------------------------------

_PQRAW_V2_ORACLE = """
SELECT CAST(c_nationkey AS BIGINT) AS nk,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(c_custkey) AS BIGINT) AS sum_key,
       CAST(count(*) FILTER (WHERE c_custkey % 9 = 0) AS BIGINT) AS n_nulled
FROM customer
GROUP BY 1
ORDER BY 1
"""


@register(
    "storage_parquet_raw_scan_v2",
    oracle=_PQRAW_V2_ORACLE,
    tags=("storage", "multimodal"),
    round=13,
)
def storage_parquet_raw_scan_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-Python parquet page reader on DATA PAGE V2 + GZIP (round 13,
    VERDICT r12 #2 — the r12 reader spoke only what Spark writes: v1 +
    snappy). Stage: Spark's JVM writer lands customer keys as v1/snappy;
    each `binaryFile`->mapInPandas task then re-encodes ITS file to
    pyarrow `data_page_version='2.0'` with gzip 512-byte pages in
    memory and parses the result with `functions/parquet_raw.py`
    (`read_column`): v2 page layout — def levels UNCOMPRESSED and
    un-prefixed ahead of the values section, only the values gzip'd,
    per-page is_compressed honored — plus stdlib-zlib gzip members.
    The tiny page size forces many pages per chunk so page-boundary
    handling is load-bearing, and the per-FILE task split is the shape
    a 100 TB bulk re-encode/validate job would use (no driver-side
    bytes, one task per file)."""
    import glob
    import shutil
    import tempfile
    import uuid as _uuid

    cust = load_table(spark, sf_dir, "customer").selectExpr(
        "CAST(c_custkey AS BIGINT) AS ck",
        "CAST(c_nationkey AS BIGINT) AS nk",
        "CASE WHEN c_custkey % 9 = 0 THEN NULL ELSE CAST(c_custkey AS BIGINT) END"
        " AS ck_nullable",
    )
    stage = tempfile.mkdtemp(prefix=f"us_sdps_pqv2_{_uuid.uuid4().hex[:8]}_")
    try:
        out_dir = f"{stage}/t"
        cust.coalesce(1).write.mode("overwrite").option(
            "compression", "snappy"
        ).parquet(out_dir)
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
                        compression="gzip",
                        data_page_version="2.0",
                        data_page_size=512,
                        write_statistics=False,
                    )
                    buf = sink.getvalue()
                    yield pd.DataFrame(
                        {
                            "ck": read_column(buf, "ck"),
                            "nk": read_column(buf, "nk"),
                            "ck_nullable": read_column(buf, "ck_nullable"),
                        }
                    )

        files = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.parquet")
            .load(out_dir)
            .select("content")
        )
        decoded = files.mapInPandas(decode, "ck long, nk long, ck_nullable long")
        agg = (
            decoded.groupBy("nk")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("ck").cast("long").alias("sum_key"),
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
