"""Sources: file-format readers, existence probes, and the REST-landing
pattern.

The reference ingests by paging REST APIs on the driver
(`polygon_client.py:73-94`, `massive_client.py:45-60`) — a 12 s/page,
250k-bars/min ceiling (BASELINE.md) that no cluster can parallelize.
The 100 TB design inverts it: fetchers land raw pages as files
(newline-JSON/parquet) in object storage, and Spark reads the landing
directory with an explicit schema — scans parallelize per file, and the
rate-limited network hop is outside the query engine. RestLanding below
documents that contract; the retry/backoff policy constants mirror the
reference's (`polygon_client.py:14-16`).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def parquet_exists(spark: SparkSession, path: str) -> bool:
    """Existence probe (parity S6: `symbols(historical)/utils.py:5-10`),
    without the reference's `limit(1)` read — listing the path is enough
    and touches no data."""
    try:
        spark.read.parquet(path).schema
        return True
    except Exception:  # noqa: BLE001 — any unreadable/missing path counts as absent
        return False


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan (parity S5) — vectorized reader, pushdown, pruning."""
    return spark.read.parquet(path)


def read_json_landing(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Newline-JSON landing-zone scan with an EXPLICIT schema — never
    inference (the reference's driver-side normalizers exist only because
    it let types float until createDataFrame; a declared schema makes
    coercion columnar and free)."""
    return spark.read.schema(schema).json(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).option("header", "true").csv(path)


@dataclass(frozen=True)
class RetryPolicy:
    """Parity C4 (`polygon_client.py:14-16,19-53`): 5 attempts,
    2 * 2^attempt backoff, Retry-After honored on 429."""

    max_retries: int = 5
    backoff_factor: float = 2.0
    base_wait: float = 2.0

    def wait_seconds(self, attempt: int) -> float:
        return self.base_wait * (self.backoff_factor**attempt)


@dataclass(frozen=True)
class RestLanding:
    """Contract for the fetcher fleet that feeds the engine.

    Fetchers (outside Spark — serverless workers or a thin driver loop at
    small scale) page the REST source under `retry` policy and write each
    page verbatim as one newline-JSON file under
    `{landing_path}/source={source}/ingest_date=YYYY-MM-DD/part-*.json`.
    The engine then reads the landing dir via read_json_landing with
    RAW_SCHEMA and runs curate() -> write_partitioned(). No live HTTP
    happens inside this repo (no network in the test environment, and at
    scale it would serialize ingest through the driver — the reference's
    bottleneck)."""

    landing_path: str
    source: str
    retry: RetryPolicy = RetryPolicy()

    def read(self, spark: SparkSession, schema: T.StructType) -> DataFrame:
        return read_json_landing(spark, f"{self.landing_path}/source={self.source}", schema)
