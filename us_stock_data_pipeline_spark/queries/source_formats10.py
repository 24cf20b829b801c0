"""Source formats, part 10: the XML landing zone — Spark 4's BUILT-IN
XML data source (the former spark-xml package, merged in SPARK-44265),
round-tripped write -> read with attribute and nested-element handling.
DuckDB has no XML reader, so the oracle recomputes the aggregate from
the source-of-truth table the staging derives from — divergence in
either the XML writer or the reader breaks the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.etl.sinks import _layout_for_write
from us_stock_data_pipeline_spark.registry import register

_XML_CAP = 200_000  # deterministic lowest-key staging prefix, bounded

_XML_ORACLE = f"""
WITH src AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT {_XML_CAP})
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(o_custkey) AS BIGINT) AS sum_custkey,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM src
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("source_xml_scan", oracle=_XML_ORACLE, tags=("source", "xml"))
def source_xml_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML landing-zone ingest via Spark 4's built-in `xml` source
    (SPARK-44265 folded spark-xml into core): orders staged as real
    XML documents — one <order> element per row with an ATTRIBUTE key
    (`_orderkey`) and nested child elements — then read back with an
    explicit rowTag and aggregated. XML is the B2B/finance landing
    format (FIXML, ISO 20022, vendor feeds), and the attribute-vs-
    element distinction (`_`-prefixed columns) is the part naive
    flatteners get wrong. Staging is a distributed write -> read
    (executor-side both ways, bounded by the same deterministic
    lowest-key cap as the other landing zones); the oracle recomputes
    from the orders table, so writer and reader must BOTH be faithful
    for the hash to match. At 100 TB the XML scan parallelizes per
    file like any text source; schema is declared (inference reads
    the data twice)."""
    import hashlib
    import os
    import tempfile

    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), "us_sdps_landing", key, "orders_xml")
    marker = os.path.join(path, "_SUCCESS")
    src_file = os.path.join(sf_dir, "orders.parquet")
    if os.path.exists(marker) and os.stat(marker).st_mtime < os.stat(src_file).st_mtime:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
    if not os.path.exists(marker):
        staged = (
            load_table(spark, sf_dir, "orders")
            .orderBy("o_orderkey")
            .limit(_XML_CAP)
            .select(
                # `_`-prefix marks XML ATTRIBUTES for the writer
                F.col("o_orderkey").alias("_orderkey"),
                F.col("o_custkey").alias("custkey"),
                F.col("o_orderstatus").alias("status"),
                F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            )
        )
        (
            _layout_for_write(staged, ())
            .write.mode("overwrite")
            .format("xml")
            .option("rootTag", "orders")
            .option("rowTag", "order")
            .save(path)
        )
    xml = (
        spark.read.format("xml")
        .option("rowTag", "order")
        .schema("_orderkey long, custkey long, status string, cents long")
        .load(path)
    )
    return (
        xml.groupBy(F.col("status").alias("o_orderstatus"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("custkey").cast("long").alias("sum_custkey"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
        .orderBy("o_orderstatus")
    )
