"""Source/ETL connectors, part 5: native XML (Spark 4 from_xml/to_xml)
roundtrip over an events-derived payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

_XML_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS parsed_cents,
       CAST(0 AS BIGINT) AS n_roundtrip_mismatch
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("source_xml_roundtrip", oracle=_XML_ORACLE, tags=("source", "modern"))
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native XML (Spark 4 ``to_xml``/``from_xml``): serialize each
    event to an XML fragment, parse it back with an explicit schema,
    and prove the roundtrip lossless — the same staged-landing
    discipline as the JSON/CSV/ORC scans (source_formats.py), for
    the one wire format enterprise feeds still ship everywhere
    (FIXML, ISO 20022, vendor exports). Pre-Spark-4 this needed the
    external spark-xml package; now the parser is a Catalyst
    expression, so schema projection happens inside codegen and a
    malformed fragment turns into nulls the mismatch counter would
    catch (here: structurally clean by construction, count pinned 0
    and oracle-checked). The parsed aggregate must equal the raw
    columns' aggregate exactly — integer cents end to end."""
    ev = load_table(spark, sf_dir, "events")
    xml = ev.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents_orig"),
        F.to_xml(
            F.struct(
                F.col("event_id").alias("id"),
                F.round(F.col("value") * 100).cast("long").alias("cents"),
            )
        ).alias("payload"),
    )
    parsed = xml.select(
        "event_type",
        "cents_orig",
        F.from_xml("payload", "id BIGINT, cents BIGINT").alias("rec"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("rec.cents").cast("long").alias("parsed_cents"),
            F.sum(
                F.when(
                    F.col("rec.cents").isNull()
                    | (F.col("rec.cents") != F.col("cents_orig")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_roundtrip_mismatch"),
        )
        .orderBy("event_type")
    )
