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

import json
import os
import time
import urllib.error
import urllib.request
from collections.abc import Callable
from dataclasses import dataclass, field

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
    # Injectable for tests; production uses time.sleep.
    sleep: Callable[[float], None] = field(default=time.sleep, compare=False)

    def wait_seconds(self, attempt: int) -> float:
        return self.base_wait * (self.backoff_factor**attempt)


class FetchError(RuntimeError):
    """Raised when a page is still failing after max_retries attempts."""


@dataclass
class _HttpResponse:
    status: int
    headers: dict[str, str]
    body: bytes


def _urllib_get(url: str) -> _HttpResponse:
    """Minimal stdlib GET returning status/headers/body without raising
    on HTTP error status (the retry loop decides what is retryable)."""
    try:
        with urllib.request.urlopen(url, timeout=30) as resp:  # noqa: S310 — landing fetcher, caller controls URL
            return _HttpResponse(resp.status, dict(resp.headers), resp.read())
    except urllib.error.HTTPError as e:
        return _HttpResponse(e.code, dict(e.headers or {}), e.read() or b"")


def _parse_retry_after(value: str | None, default: float) -> float:
    """Retry-After per RFC 9110 §10.2.3: either delta-seconds or an
    HTTP-date. An unparseable or past-dated value falls back to
    ``default`` instead of escaping the retry loop with ValueError."""
    if value is None:
        return default
    try:
        return max(0.0, float(value))
    except ValueError:
        pass
    try:
        from email.utils import parsedate_to_datetime

        dt = parsedate_to_datetime(value)
        return max(0.0, dt.timestamp() - time.time())
    except (ValueError, TypeError, OverflowError):
        return default


def get_with_retry(
    url: str,
    policy: RetryPolicy = RetryPolicy(),
    http_get: Callable[[str], _HttpResponse] = _urllib_get,
) -> dict:
    """GET a JSON page under the reference's retry contract
    (`polygon_client.py:19-53`): 429 sleeps Retry-After (default
    base_wait) and retries; 5xx and transport errors sleep
    base_wait * backoff^attempt and retry; anything else parses as JSON.
    After max_retries failed attempts raises FetchError."""
    last = "no attempt made"
    for attempt in range(policy.max_retries):
        try:
            resp = http_get(url)
        except OSError as e:  # transport-level failure
            policy.sleep(policy.wait_seconds(attempt))
            last = f"transport error: {e}"
            continue
        if resp.status == 429:
            policy.sleep(_parse_retry_after(resp.headers.get("Retry-After"), policy.base_wait))
            last = "rate limited (429)"
            continue
        if resp.status >= 500:
            policy.sleep(policy.wait_seconds(attempt))
            last = f"server error {resp.status}"
            continue
        if resp.status >= 400:
            raise FetchError(f"client error {resp.status} for {url}")
        return json.loads(resp.body)
    raise FetchError(f"fetch failed after {policy.max_retries} retries ({last}): {url}")


def fetch_pages_to_landing(
    url: str,
    out_dir: str,
    policy: RetryPolicy = RetryPolicy(),
    http_get: Callable[[str], _HttpResponse] = _urllib_get,
    max_pages: int = 100_000,
) -> int:
    """Drive a paginated JSON API to a newline-JSON landing directory —
    the runnable half of the RestLanding contract (parity S1-S3,
    `polygon_client.py:73-94`, `ingest_massive.py:23-59`).

    Each page's ``results`` array lands verbatim as one
    ``part-NNNNN.json`` file (one JSON object per line — exactly what
    ``read_json_landing`` scans in parallel); pagination follows
    ``next_url`` until absent. Returns the number of pages landed.

    This loop is intentionally OUTSIDE the query engine: one fetcher
    process per symbol/day shard runs it against object storage, and the
    rate-limited network hop never serializes a Spark job. The driver
    loop in the reference is the same loop — but feeding createDataFrame
    on the Spark driver, which is the 250k-bars/min ceiling this design
    removes."""
    os.makedirs(out_dir, exist_ok=True)
    pages = 0
    next_url: str | None = url
    while next_url and pages < max_pages:
        data = get_with_retry(next_url, policy, http_get)
        rows = data.get("results", [])
        tmp = os.path.join(out_dir, f".part-{pages:05d}.json.tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
        # rename so readers never see a half-written page
        os.replace(tmp, os.path.join(out_dir, f"part-{pages:05d}.json"))
        pages += 1
        next_url = data.get("next_url")
    return pages


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
