"""Round-14 extensibility, part 3: the remaining Python-boundary
tiers — Arrow-optimized scalar UDFs and raw-RecordBatch mapInArrow.

With these, the repo demonstrates every rung of the UDF ladder and
when to step down it: SQL expression (free, codegen) > SQL UDF
(named, still codegen) > pandas_udf / applyInPandas (vectorized
Arrow) > Arrow Python UDF (scalar logic, Arrow transport) >
mapInArrow (zero-copy RecordBatch) > row Python UDF (never in a hot
path; none exist in this repo).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Arrow-optimized Python scalar UDF
# --------------------------------------------------------------------------

_ARROW_UDF_ORACLE = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100
                           + 0.5) AS BIGINT)) AS BIGINT) AS net_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("udf_arrow_optimized", oracle=_ARROW_UDF_ORACLE, tags=("udf", "extensibility"))
def udf_arrow_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python scalar UDF (``udf(..., useArrow=True)``,
    Spark 3.5+/4): row-logic Python with Arrow-batch transport —
    ~an order of magnitude over pickled row UDFs while keeping the
    write-a-plain-function ergonomics (pandas_udf requires thinking
    in Series). The kernel evaluates the IDENTICAL IEEE expression
    the oracle inlines (p*(1-d)*(1+t)*100 + 0.5, floored — half-up
    on the positive axis, never Python's banker's round()), so the
    Python boundary changes transport, not values. This tier is for
    logic that genuinely needs per-value Python (external libraries,
    complex branching); anything expressible as one SQL expression
    should stay at the `sql_udf_scalar` tier — compare the plans."""
    import math

    from pyspark.sql.functions import udf

    @udf("long", useArrow=True)
    def net_cents(p, d, t):
        return math.floor(p * (1 - d) * (1 + t) * 100 + 0.5)

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= "1996-01-01"
    )
    return (
        li.select(
            "l_returnflag",
            net_cents("l_extendedprice", "l_discount", "l_tax").alias("nc"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("nc").cast("long").alias("net_cents"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# mapInArrow: zero-copy RecordBatch processing
# --------------------------------------------------------------------------

_MAP_ARROW_ORACLE = """
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(len(text) - len(replace(text, 'e', '')) AS BIGINT) AS n_e
FROM documents
ORDER BY doc_id
"""


@register("udf_map_in_arrow", oracle=_MAP_ARROW_ORACLE, tags=("udf", "extensibility", "multimodal"))
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the partition iterator yields raw
    ``pyarrow.RecordBatch``es — no pandas materialization at all —
    and the kernel answers with pyarrow.compute calls that stay in
    Arrow's columnar memory end to end. This is the tier below
    mapInPandas for byte-level work (media payload slicing, custom
    codecs, tensor reshaping) where pandas' object boxing is pure
    overhead; `multimodal_frame_sample` would move here the day the
    real decoders land. Kernel work (utf-8 byte length, substring
    occurrence count) mirrors the oracle's string arithmetic
    exactly. Plan: one scan, one Python->Arrow stage, no shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def batch_stats(batches):
        for b in batches:
            text = b.column(b.schema.get_field_index("text"))
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index("doc_id")),
                    pc.cast(pc.binary_length(text), pa.int64()),
                    pc.cast(pc.count_substring(text, "e"), pa.int64()),
                ],
                names=["doc_id", "n_bytes", "n_e"],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(
        batch_stats, "doc_id long, n_bytes long, n_e long"
    ).orderBy("doc_id")
