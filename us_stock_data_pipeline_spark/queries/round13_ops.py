"""Round-13 operators.

- `storage_parquet_raw_scan_v2` — the pure-Python parquet page reader
  over DATA PAGE V2 + GZIP files (VERDICT r12 #2): each task re-encodes
  one Spark-written file to pyarrow's `data_page_version='2.0'` with
  512-byte gzip pages in memory, then parses those bytes with
  `functions/parquet_raw.py` — v2 layout (levels uncompressed ahead of
  the values section, per-page is_compressed) exercised distributed.
- `stream_versioned_cdf_compaction` — CDF stream across an OPTIMIZE
  commit (VERDICT r12 #6): a data-identical rewrite emits ZERO change
  rows while surrounding commits stream normally.
- `etl_versioned_sql_merge_clauses` — widened MERGE INTO (VERDICT r12
  #5): UPDATE SET assignment lists, stacked WHEN MATCHED AND clauses,
  INSERT (cols) VALUES (exprs) with NULL fill, one atomic commit.
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


# --------------------------------------------------------------------------
# streaming CDF across an OPTIMIZE commit (VERDICT r12 #6)
# --------------------------------------------------------------------------

# Lifecycle: v1 base (per-nation counts, band = nk % 5), v2 upserts
# bands 0-1 with val+1, v3 DV-deletes keys {0,1}, v4 = OPTIMIZE
# (compact_table: full data-identical rewrite that materializes the DVs
# and clears them), v5 upserts band 2 with val+5. The stream reads
# (1, v5]; the compaction commit must contribute ZERO rows (its
# pre-image-minus-DV equals its post-image) while v2/v3/v5 stream
# normally — the 'compaction' row pins that count at 0.
_CDF_COMPACT_ORACLE = """
WITH base AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nk,
         CAST(c_nationkey % 5 AS BIGINT) AS band,
         CAST(count(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2
)
SELECT * FROM (
  SELECT CAST(2 AS BIGINT) AS commit_version,
         'update_postimage' AS change_type,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(n + 1) AS BIGINT) AS sum_val
  FROM base WHERE band IN (0, 1)
  UNION ALL
  SELECT CAST(3 AS BIGINT), 'delete',
         CAST(count(*) AS BIGINT), CAST(NULL AS BIGINT)
  FROM base WHERE nk IN (0, 1)
  UNION ALL
  SELECT CAST(4 AS BIGINT), 'compaction',
         CAST(0 AS BIGINT), CAST(NULL AS BIGINT)
  UNION ALL
  SELECT CAST(5 AS BIGINT), 'update_postimage',
         CAST(count(*) AS BIGINT), CAST(sum(n + 5) AS BIGINT)
  FROM base WHERE band = 2
) t
ORDER BY commit_version, change_type
"""


@register(
    "stream_versioned_cdf_compaction",
    oracle=_CDF_COMPACT_ORACLE,
    tags=("streaming", "versioned"),
    round=13,
)
def stream_versioned_cdf_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDF stream across an OPTIMIZE commit (round 13, VERDICT r12 #6).
    compact_table rewrites every partition data-identically while
    materializing deletion vectors; the stream's repoint tasks filter
    the pre-image through the DVs the commit drops, so old-minus-DV
    equals new and the commit emits NOTHING — no phantom inserts for
    DV-materialized rows, no spurious deletes. Commits before and after
    the compaction stream normally; the 'compaction' output row pins
    the phantom count at zero (a regression would also surface as extra
    groupBy rows and break the hash)."""
    import shutil
    import tempfile
    import uuid as _uuid

    from us_stock_data_pipeline_spark.etl.cdf_stream import register_cdf_source
    from us_stock_data_pipeline_spark.etl.versioned import (
        compact_table,
        versioned_delete,
        versioned_merge_upsert,
    )

    base = (
        load_table(spark, sf_dir, "customer")
        .groupBy(
            F.col("c_nationkey").cast("long").alias("nk"),
            (F.col("c_nationkey") % 5).cast("long").alias("band"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("val"))
    )
    root = tempfile.mkdtemp(prefix=f"us_sdps_cdfcmp_{_uuid.uuid4().hex[:8]}_")
    sink = f"cdf_cmp_{_uuid.uuid4().hex[:8]}"
    try:
        versioned_merge_upsert(
            spark, base, root, key_cols=("nk",), partition_cols=("band",)
        )
        v2 = base.filter(F.col("band").isin(0, 1)).withColumn(
            "val", F.col("val") + 1
        )
        versioned_merge_upsert(
            spark, v2, root, key_cols=("nk",), partition_cols=("band",)
        )
        versioned_delete(
            spark,
            spark.createDataFrame([(0,), (1,)], "nk long"),
            root,
            key_cols=("nk",),
        )
        v_opt = compact_table(spark, root)  # v4: OPTIMIZE
        assert v_opt == 4
        v5 = base.filter(F.col("band") == 2).withColumn(
            "val", F.col("val") + 5
        )
        versioned_merge_upsert(
            spark, v5, root, key_cols=("nk",), partition_cols=("band",)
        )
        register_cdf_source(spark)
        feed = (
            spark.readStream.format("versioned_cdf")
            .option("path", root)
            .option("keycols", "nk")
            .option("tableschema", "nk long, band long, val long")
            .option("startingversion", "1")
            .load()
        )
        q = (
            feed.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        raw = spark.table(sink)
        agg = raw.groupBy(
            F.col("_commit_version").alias("commit_version"),
            F.col("_change_type").alias("change_type"),
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("val").cast("long").alias("sum_val"),
        )
        phantom = raw.filter(F.col("_commit_version") == v_opt).count()
        compaction_row = spark.createDataFrame(
            [(v_opt, "compaction", phantom, None)],
            "commit_version long, change_type string, n_rows long, sum_val long",
        )
        out = agg.unionByName(compaction_row).orderBy(
            "commit_version", "change_type"
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------------------------------------
# widened MERGE INTO: assignment lists, clause stacks, INSERT (cols) VALUES
# --------------------------------------------------------------------------

# Target: per-nation (nk key, band = nk % 5 partition, val = count,
# flag = 0). Source: every nation with val = count + (1 - nk % 2)
# (even nk -> count+1, odd nk -> count), plus shifted new keys
# (nk + 100, band 9, val = count). MERGE:
#   WHEN MATCHED AND s.val > t.val  -> UPDATE SET val = s.val,
#                                      flag = t.flag + 1   (even nk)
#   WHEN MATCHED                    -> UPDATE SET val = t.val + s.val
#                                      (odd nk -> 2*count, flag stays 0)
#   WHEN NOT MATCHED -> INSERT (nk, band, val)
#                       VALUES (s.nk, s.band, s.val * 10)  (flag NULL)
_SQL_MERGE_CLAUSES_ORACLE = """
WITH base AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nk,
         CAST(c_nationkey % 5 AS BIGINT) AS band,
         CAST(count(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2
),
final AS (
  SELECT band, n + 1 AS val, 1 AS flag FROM base WHERE nk % 2 = 0
  UNION ALL
  SELECT band, 2 * n AS val, 0 AS flag FROM base WHERE nk % 2 = 1
  UNION ALL
  SELECT CAST(9 AS BIGINT) AS band, 10 * n AS val, NULL AS flag FROM base
)
SELECT band,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(val) AS BIGINT) AS sum_val,
       CAST(sum(flag) AS BIGINT) AS sum_flag,
       CAST(count(*) FILTER (WHERE flag IS NULL) AS BIGINT) AS n_null_flag
FROM final
GROUP BY band
ORDER BY band
"""


@register(
    "etl_versioned_sql_merge_clauses",
    oracle=_SQL_MERGE_CLAUSES_ORACLE,
    tags=("etl", "versioned", "sql"),
    round=13,
)
def etl_versioned_sql_merge_clauses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Widened MERGE INTO (round 13, VERDICT r12 #5 — 'the first thing
    any Delta/Iceberg user types'): UPDATE SET col = expr assignment
    lists referencing both aliases, TWO stacked WHEN MATCHED AND
    clauses with first-applicable-wins precedence, and WHEN NOT MATCHED
    INSERT (cols) VALUES (exprs) with NULL fill for unlisted columns —
    all in ONE atomic merge commit (etl/vcatalog.py `_merge_into`).
    The oracle recomputes every clause's effect from `customer`."""
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
        .withColumn("flag", F.lit(0).cast("long"))
    )
    root = tempfile.mkdtemp(prefix=f"us_sdps_mrgcl_{_uuid.uuid4().hex[:8]}_")
    name = f"mrgcl_{_uuid.uuid4().hex[:8]}"
    src_view = f"mrgcl_src_{_uuid.uuid4().hex[:8]}"
    try:
        versioned_merge_upsert(
            spark, base, root, key_cols=("nk",), partition_cols=("band",)
        )
        register_versioned(
            spark, name, root, key_cols=("nk",), partition_cols=("band",)
        )
        matched_src = base.select(
            "nk",
            "band",
            (F.col("val") + 1 - F.col("nk") % 2).alias("val"),
        )
        new_src = base.select(
            (F.col("nk") + 100).alias("nk"),
            F.lit(9).cast("long").alias("band"),
            F.col("val"),
        )
        matched_src.unionByName(new_src).createOrReplaceTempView(src_view)
        out = versioned_sql(
            spark,
            f"""
            MERGE INTO {name} AS t USING {src_view} AS s ON t.nk = s.nk
            WHEN MATCHED AND s.val > t.val
              THEN UPDATE SET val = s.val, flag = t.flag + 1
            WHEN MATCHED THEN UPDATE SET val = t.val + s.val
            WHEN NOT MATCHED
              THEN INSERT (nk, band, val) VALUES (s.nk, s.band, s.val * 10)
            """,
        ).first()
        assert out.n_deleted == 0
        agg = versioned_sql(
            spark,
            f"""
            SELECT band,
                   CAST(count(*) AS BIGINT) AS n_keys,
                   CAST(sum(val) AS BIGINT) AS sum_val,
                   CAST(sum(flag) AS BIGINT) AS sum_flag,
                   CAST(count(CASE WHEN flag IS NULL THEN 1 END) AS BIGINT)
                     AS n_null_flag
            FROM {name}
            GROUP BY band
            ORDER BY band
            """,
        )
        rows = agg.collect()
        return spark.createDataFrame(rows, agg.schema)
    finally:
        unregister_versioned(spark, name)
        spark.catalog.dropTempView(src_view)
        shutil.rmtree(root, ignore_errors=True)
