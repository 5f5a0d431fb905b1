"""S2 real fetch path against a live loopback HTTP server: statuses,
bodies, gzip Content-Encoding (decoded by functions.http — the C6/C7
pipeline), un-followed redirects with Location, connection errors as
rows, per-slot concurrency cap enforcement, and link extraction over the
fetched bytes — the full fetch→decode→extract path end-to-end."""

from __future__ import annotations

import gzip
import http.server
import threading

import pytest
from pyspark.sql import functions as F

from scrapy_spark.functions.http import decode_response_text
from scrapy_spark.functions.linkextract import extract_links_from_html
from scrapy_spark.operators.netfetch import http_fetch


class _Handler(http.server.BaseHTTPRequestHandler):
    server_version = "t/0"
    # track concurrent in-flight requests per top path segment
    _active: dict[str, int] = {}
    _peak: dict[str, int] = {}
    _lock = threading.Lock()

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        seg = self.path.split("/")[1] if "/" in self.path else ""
        with self._lock:
            self._active[seg] = self._active.get(seg, 0) + 1
            self._peak[seg] = max(self._peak.get(seg, 0), self._active[seg])
        try:
            self._respond()
        finally:
            with self._lock:
                self._active[seg] -= 1

    def _respond(self):
        import time

        if self.path.startswith("/missing"):
            body = b"not here"
            self.send_response(404)
        elif self.path.startswith("/moved"):
            self.send_response(301)
            self.send_header("Location", "/landed")
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        elif self.path.startswith("/slow"):
            time.sleep(0.2)
            body = b"<html>slow</html>"
            self.send_response(200)
        elif self.path.startswith("/gz"):
            raw = (
                "<html><meta charset='utf-8'>"
                f"<a href='{self.path}/child'>é</a></html>"
            ).encode()
            body = gzip.compress(raw)
            self.send_response(200)
            self.send_header("Content-Encoding", "gzip")
        else:
            body = f"<html><a href='{self.path}/child'>x</a></html>".encode()
            self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _reqs(spark, urls):
    return spark.createDataFrame(
        [(bytes([i % 256]) * 20, u, u.split("/")[3]) for i, u in enumerate(urls)],
        "fp binary, url string, slot string",
    )


def test_fetch_statuses_bodies_and_errors(spark, server):
    urls = [
        f"{server}/page/1",
        f"{server}/gz/2",
        f"{server}/missing/3",
        f"{server}/moved/4",
        "http://127.0.0.1:9/never",  # closed port → error row
    ]
    rows = {r.url: r for r in http_fetch(_reqs(spark, urls), timeout_s=5).collect()}
    assert len(rows) == 5
    ok = rows[urls[0]]
    assert ok.status == 200 and b"/page/1/child" in bytes(ok.body)
    assert ok.error is None and ok.latency_ms >= 0 and not ok.truncated
    gz = rows[urls[1]]
    assert gz.status == 200 and gz.content_encoding == "gzip"
    text = decode_response_text(bytes(gz.body), gz.content_type, gz.content_encoding)
    assert "é" in text and "/gz/2/child" in text
    assert rows[urls[2]].status == 404
    moved = rows[urls[3]]
    assert moved.status == 301 and moved.location == "/landed"  # NOT followed
    err = rows[urls[4]]
    assert err.status == 0 and err.error
    assert "URLError" in err.error or "ConnectionRefused" in err.error or "OSError" in err.error


def test_per_slot_concurrency_cap(spark, server):
    # 12 slow requests in ONE slot, cap 2: server-observed peak ≤ 2
    _Handler._peak.clear()
    urls = [f"{server}/slow/{i}" for i in range(12)]
    df = _reqs(spark, urls).withColumn("slot", F.lit("slow"))
    out = http_fetch(
        df.coalesce(1), concurrent_per_slot=2, pool_size=16, timeout_s=10
    ).collect()
    assert len(out) == 12 and all(r.status == 200 for r in out)
    assert _Handler._peak.get("slow", 0) <= 2
    # sanity: with the cap lifted the pool does overlap
    _Handler._peak.clear()
    http_fetch(
        df.coalesce(1), concurrent_per_slot=16, pool_size=16, timeout_s=10
    ).collect()
    assert _Handler._peak.get("slow", 0) > 2


def test_fetch_then_extract_links_end_to_end(spark, server):
    urls = [f"{server}/page/{i}" for i in range(5)]
    fetched = http_fetch(_reqs(spark, urls), timeout_s=5)
    pdf = fetched.filter(F.col("status") == 200).toPandas()
    links = []
    for _, r in pdf.iterrows():
        text = decode_response_text(
            bytes(r.body), r.content_type, r.content_encoding
        )
        links += extract_links_from_html(text, r.url)
    assert sorted(links) == sorted(f"{u}/child" for u in urls)
