"""us_stock_data_pipeline_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the capabilities of
``sanantachat/us-stock-data-pipeline`` (an OHLCV stock-bar ingestion ETL,
see /root/reference), widened into a full analytics engine:

- reference-parity stock ETL (bronze->silver projection, session labeling,
  incremental watermarks, partitioned idempotent sinks),
- a relational operator surface (joins of every flavor, aggregations,
  window functions, set ops, scalar function batteries),
- LLM-data-pipeline operators (exact/MinHash/SimHash dedup, embedding
  similarity search, text analysis, multimodal columns),
- Structured Streaming operators (tumbling/sliding/session windows,
  watermarks, streaming dedup).

Everything is declared through the DataFrame/SQL API so Catalyst owns the
physical plan; Python only touches data through Arrow-vectorized Pandas
UDFs where the built-ins genuinely can't express the semantics.

Every operator is registered in :mod:`.registry` as a (Spark callable,
DuckDB oracle SQL) pair; ``__spark_entry__.py`` at the repo root exposes
them to the correctness driver.
"""

from us_stock_data_pipeline_spark import registry as registry  # noqa: F401
from us_stock_data_pipeline_spark.catalog import TABLES, load_table, register_views  # noqa: F401
from us_stock_data_pipeline_spark.session import get_spark  # noqa: F401

# Importing the query packages registers every query.
from us_stock_data_pipeline_spark.queries import (  # noqa: F401
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    relational6,
    relational7,
    scalars,
    stock_etl,
    llm_ops,
    llm_ops2,
    llm_ops3,
    llm_ops4,
    llm_ops5,
    llm_ops6,
    llm_ops7,
    llm_ops8,
    llm_ops9,
    llm_ops10,
    llm_ops11,
    llm_ops12,
    llm_ops13,
    llm_ops14,
    llm_ops15,
    llm_ops16,
    llm_ops17,
    llm_ops18,
    llm_ops19,
    llm_ops20,
    llm_ops21,
    llm_ops22,
    llm_ops23,
    analytics_ops,
    analytics_ops2,
    analytics_ops3,
    analytics_ops4,
    analytics_ops5,
    analytics_ops6,
    analytics_ops7,
    analytics_ops8,
    analytics_ops9,
    analytics_ops10,
    analytics_ops11,
    analytics_ops12,
    analytics_ops13,
    analytics_ops14,
    analytics_ops15,
    analytics_ops16,
    analytics_ops17,
    analytics_ops18,
    analytics_ops19,
    analytics_ops20,
    analytics_ops21,
    analytics_ops22,
    analytics_ops23,
    analytics_ops24,
    analytics_ops25,
    analytics_ops26,
    aqe_ops,
    etl_quality,
    etl_compliance_ops,
    ml_eval_ops,
    ml_eval_ops2,
    ml_eval_ops3,
    ml_eval_ops4,
    sketch_ops,
    udf_ops,
    relational8,
    relational9,
    relational10,
    relational11,
    relational12,
    relational13,
    relational14,
    relational15,
    relational16,
    relational17,
    relational18,
    relational19,
    relational20,
    relational21,
    relational22,
    relational23,
    relational24,
    streaming_ops,
    streaming_ops2,
    streaming_ops3,
    streaming_ops4,
    source_formats,
    source_formats2,
    source_formats3,
    source_formats4,
    extensibility_ops,
    extensibility_ops2,
    modern_sql_ops,
    modern_sql_ops2,
    modern_sql_ops3,
    modern_sql_ops4,
)

__all__ = ["registry", "get_spark", "TABLES", "load_table", "register_views"]
__version__ = "0.1.0"
