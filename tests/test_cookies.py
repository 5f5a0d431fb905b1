"""Cookies middleware (ref: downloadermiddlewares/cookies.py ≈L30;
upstream tests/test_downloadermiddleware_cookies.py is the behavioral
model): unit coverage for the jar operators, then a live loopback e2e —
Set-Cookie round-trips within a slot, is isolated across slots (the same
server reached as 127.0.0.1 vs localhost = two politeness slots), and a
Max-Age=0 tombstone stops the cookie from being sent."""

from __future__ import annotations

import http.server
import threading

import pandas as pd
import pytest
from pyspark.sql import functions as F

from scrapy_spark.config import CrawlConfig
from scrapy_spark.operators.cookies import (
    COOKIE_LOG,
    parse_set_cookies,
    resolve_jar,
    with_cookie_header,
)
from scrapy_spark.sources.store import MemoryStore
from scrapy_spark.streaming.engine import CrawlEngine

# ------------------------------------------------------------------ unit


def _jar(spark, rows):
    return spark.createDataFrame(rows, COOKIE_LOG)


def test_parse_set_cookies_attrs_and_default_path(spark):
    fetched = spark.createDataFrame(
        [
            ("a.com", "http://a.com/dir/page", ["sid=abc; Path=/app; Secure"]),
            ("a.com", "http://a.com/dir/page", ["plain=1"]),  # default path
            ("b.com", "http://b.com/", ["gone=x; Max-Age=0"]),
            ("b.com", "http://b.com/", None),  # no Set-Cookie at all
        ],
        "slot string, url string, set_cookie array<string>",
    )
    rows = {r.name: r for r in parse_set_cookies(fetched, epoch=3).collect()}
    assert rows["sid"].path == "/app" and rows["sid"].secure
    assert not rows["sid"].deleted and rows["sid"].epoch == 3
    # RFC 6265 §5.1.4 default-path = request-URI directory
    assert rows["plain"].path == "/dir" and not rows["plain"].secure
    assert rows["gone"].deleted  # Max-Age=0 tombstone


def test_resolve_jar_latest_wins_and_tombstone(spark):
    log = _jar(
        spark,
        [
            ("a.com", "sid", "/", "old", False, False, 1, "http://a.com/x"),
            ("a.com", "sid", "/", "new", False, False, 2, "http://a.com/y"),
            ("a.com", "tmp", "/", "v", False, False, 1, "http://a.com/x"),
            ("a.com", "tmp", "/", "", False, True, 2, "http://a.com/y"),
        ],
    )
    live = {r.name: r.value for r in resolve_jar(log).collect()}
    assert live == {"sid": "new"}  # latest value wins; tombstone removed


def test_cookie_header_path_secure_and_order(spark):
    log = _jar(
        spark,
        [
            ("a.com", "root", "/", "r", False, False, 1, "u"),
            ("a.com", "scoped", "/app", "s", False, False, 1, "u"),
            ("a.com", "sec", "/", "https-only", True, False, 1, "u"),
            ("b.com", "other", "/", "x", False, False, 1, "u"),
        ],
    )
    reqs = spark.createDataFrame(
        [
            (1, "a.com", "http://a.com/app/x"),
            (2, "a.com", "http://a.com/apple"),  # /app must NOT match /apple
            (3, "a.com", "https://a.com/"),
            (4, "c.com", "http://c.com/"),
        ],
        "seq long, slot string, url string",
    )
    got = {
        r.seq: r.cookie_header
        for r in with_cookie_header(reqs, log).collect()
    }
    assert got[1] == "scoped=s; root=r"  # longer path first (RFC 6265 §5.4)
    assert got[2] == "root=r"
    assert got[3] == "root=r; sec=https-only"  # Secure sent over https only
    assert got[4] is None  # no jar for the slot


# ------------------------------------------------------------------- e2e

HITS: dict[tuple[str, str], str | None] = {}


class _CookieSite(http.server.BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_GET(self):
        host = self.headers.get("Host", "").rsplit(":", 1)[0]
        HITS[(host, self.path)] = self.headers.get("Cookie")
        body, extra = b"<html></html>", []
        if self.path == "/start":
            extra = [f"sid={host}; Path=/", "t=1; Path=/"]
            body = b'<html><a href="/next">n</a><a href="/del">d</a></html>'
        elif self.path == "/del":
            extra = ["sid=; Max-Age=0; Path=/"]
            body = b'<html><a href="/after">a</a></html>'
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        for line in extra:
            self.send_header("Set-Cookie", line)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def site():
    HITS.clear()
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _CookieSite)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv.server_address[1]
    srv.shutdown()


def test_cookie_roundtrip_isolation_and_deletion(spark, site):
    store = MemoryStore(spark)
    cfg = CrawlConfig(
        fetch_backend="http",
        robotstxt_obey=False,
        epoch_budget=64,
        max_epochs=6,
        depth_limit=4,
        depth_priority=1,
        queue_order="fifo",
        download_timeout_s=10.0,
    )
    assert cfg.cookies_enabled  # upstream default COOKIES_ENABLED=True
    eng = CrawlEngine(
        spark,
        cfg,
        store,
        url_map=spark.createDataFrame([], "url_canon string, image_id string"),
        graph=spark.createDataFrame([], "src_canon string, dst_url string"),
        robots=spark.createDataFrame([], "domain string, rules string"),
    )
    eng.bootstrap(
        pd.DataFrame(
            {
                "url": [
                    f"http://127.0.0.1:{site}/start",
                    f"http://localhost:{site}/start",
                ],
                "priority": [0, 0],
            }
        ),
        pd.DataFrame(
            {
                "slot": ["127.0.0.1", "localhost"],
                "delay_ms": [0, 0],
                "concurrency": [8, 8],
            }
        ),
    )
    eng.run()

    # the seed request carried no cookies
    assert HITS[("127.0.0.1", "/start")] is None
    # round-trip within each slot; two cookies, longer-path-first then
    # name-ordered fold; values prove per-slot isolation (each jar holds
    # ITS host's sid, never the other's)
    assert HITS[("127.0.0.1", "/next")] == "sid=127.0.0.1; t=1"
    assert HITS[("localhost", "/next")] == "sid=localhost; t=1"
    # /del still saw the cookie, then its Max-Age=0 tombstone landed:
    # /after (discovered on /del, fetched a later epoch) gets only t
    assert HITS[("127.0.0.1", "/del")] == "sid=127.0.0.1; t=1"
    assert HITS[("127.0.0.1", "/after")] == "t=1"
    assert HITS[("localhost", "/after")] == "t=1"

    # jar state table: latest-wins leaves t everywhere, sid tombstoned
    live = resolve_jar(store.read("cookies"))
    names = {
        (r.slot, r.name) for r in live.collect()
    }
    assert names == {("127.0.0.1", "t"), ("localhost", "t")}
    m = store.read("metrics").toPandas()
    assert m[(m.partition_id == -1) & (m.key == "cookies/received")]["value"].sum() > 0
