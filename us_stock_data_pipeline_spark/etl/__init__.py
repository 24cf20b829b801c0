"""Reference-parity stock-bar ETL: schemas, bronze->silver transforms,
session semantics, incremental watermarks, and partitioned sinks."""

from us_stock_data_pipeline_spark.etl.schemas import CURATED_SCHEMA, RAW_SCHEMA  # noqa: F401
