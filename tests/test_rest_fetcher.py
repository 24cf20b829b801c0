"""REST landing fetcher, end-to-end against an in-process HTTP fixture:
pagination via next_url, 429 Retry-After honored, 5xx exponential
backoff, exhaustion raising, and the landed files feeding the real
ingest pipeline (parity S1-S3/C3-C4, `polygon_client.py:19-94`)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from us_stock_data_pipeline_spark.etl.run import build_parser, run
from us_stock_data_pipeline_spark.etl.sources import (
    FetchError,
    RetryPolicy,
    _HttpResponse,
    fetch_pages_to_landing,
    get_with_retry,
)


def _bar(t_ms, px=10.0):
    return {
        "t": t_ms,
        "o": px,
        "h": px + 1,
        "l": px - 1,
        "c": px,
        "v": 100.0,
        "vw": px,
        "n": 5.0,
        "symbol": "AAPL",
    }


# 2024-01-02 15:00 UTC = 10:00 ET (regular session)
_T0 = 1704207600000


class _Fixture(BaseHTTPRequestHandler):
    """Two pages; /page2 replies 429 (Retry-After: 0) on its first hit."""

    hits: dict[str, int] = {}

    def do_GET(self):  # noqa: N802 — stdlib handler contract
        path = self.path
        self.hits[path] = self.hits.get(path, 0) + 1
        if path == "/page1":
            body = {
                "results": [_bar(_T0), _bar(_T0 + 60_000)],
                "next_url": f"http://127.0.0.1:{self.server.server_port}/page2",
            }
            code, headers = 200, {}
        elif path == "/page2":
            if self.hits[path] == 1:
                code, headers, body = 429, {"Retry-After": "0"}, {}
            else:
                body = {"results": [_bar(_T0 + 120_000)]}
                code, headers = 200, {}
        else:
            code, headers, body = 404, {}, {}
        payload = json.dumps(body).encode()
        self.send_response(code)
        for k, v in headers.items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):  # silence per-request stderr noise
        pass


@pytest.fixture()
def fixture_server():
    _Fixture.hits = {}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Fixture)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_fetch_paginates_and_honors_retry_after(fixture_server, tmp_path, spark):
    sleeps: list[float] = []
    policy = RetryPolicy(sleep=sleeps.append)
    landing = str(tmp_path / "landing")

    pages = fetch_pages_to_landing(f"{fixture_server}/page1", landing, policy)

    assert pages == 2
    assert _Fixture.hits["/page2"] == 2  # 429 then success
    assert sleeps == [0.0]  # Retry-After honored verbatim
    files = sorted(p.name for p in (tmp_path / "landing").iterdir())
    assert files == ["part-00000.json", "part-00001.json"]

    # The landed files ARE the ingest input: run the real pipeline on them.
    out = str(tmp_path / "silver")
    res = run(spark, build_parser().parse_args(["--landing", landing, "--out", out]))
    assert res["rows_written"] == 3
    assert spark.read.parquet(out).count() == 3


def test_get_with_retry_backs_off_on_5xx():
    sleeps: list[float] = []
    policy = RetryPolicy(sleep=sleeps.append, base_wait=2.0, backoff_factor=2.0)
    calls = {"n": 0}

    def flaky(url):
        calls["n"] += 1
        if calls["n"] <= 2:
            return _HttpResponse(503, {}, b"")
        return _HttpResponse(200, {}, b'{"results": []}')

    assert get_with_retry("http://x/", policy, flaky) == {"results": []}
    assert sleeps == [2.0, 4.0]  # base_wait * backoff^attempt


def test_get_with_retry_exhausts_and_raises():
    policy = RetryPolicy(sleep=lambda s: None, max_retries=3)
    with pytest.raises(FetchError, match="after 3 retries"):
        get_with_retry("http://x/", policy, lambda url: _HttpResponse(503, {}, b""))


def test_get_with_retry_client_error_is_fatal():
    policy = RetryPolicy(sleep=lambda s: None)
    with pytest.raises(FetchError, match="client error 404"):
        get_with_retry("http://x/", policy, lambda url: _HttpResponse(404, {}, b""))
