"""RFC2616 cache policy end-to-end over the real http backend (S6 × S2;
ref: extensions/httpcache.py::RFC2616Policy — upstream's
HTTPCACHE_POLICY that replaces DummyPolicy's replay-everything with HTTP
freshness + conditional-GET revalidation).

A counting loopback server with per-path cache headers proves every
branch of the policy in one warm crawl:

- fresh (max-age ahead of the clock)     → replayed, ZERO requests
- stale + ETag                           → If-None-Match → 304 → stored
                                           body served, refreshed
- stale + Last-Modified                  → If-Modified-Since → 304
- no-store                               → never cached, full refetch
- no cache info at all                   → stale without validators,
                                           full UNconditional refetch
- stale + ETag, content since changed    → conditional GET answers 200,
                                           the new body wins everywhere
"""

from __future__ import annotations

import email.utils
import http.server
import threading
import time
from collections import Counter

import pandas as pd
import pytest

from scrapy_spark.config import CrawlConfig
from scrapy_spark.functions.imaging import encode_image, synth_image
from scrapy_spark.sources.store import MemoryStore
from scrapy_spark.streaming.engine import CrawlEngine

LM_DATE = email.utils.formatdate(time.time() - 10_000, usegmt=True)

# decodable payloads (ImagesPipeline drops corrupt downloads)
BODIES = {
    n: encode_image(synth_image(f"rfc-{n}"), "rawrgb")
    for n in ("fresh", "etag", "lm", "nostore", "plain")
}
ETAG_V2_BODY = encode_image(synth_image("rfc-etag-v2"), "rawrgb")


class _PolicySite(http.server.BaseHTTPRequestHandler):
    hits: Counter = Counter()  # path → request count
    conditional: Counter = Counter()  # path → conditional-GET count
    etag_version = "v1"  # bumped by the changed-content test
    _lock = threading.Lock()

    def log_message(self, *a):
        pass

    def _serve(self, body: bytes, ctype: str, extra: dict):
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        for k, v in extra.items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def _not_modified(self, extra: dict):
        self.send_response(304)
        for k, v in extra.items():
            self.send_header(k, v)
        self.end_headers()

    def do_GET(self):
        cls = type(self)
        name = self.path.rsplit("/", 1)[1] or "root"
        inm = self.headers.get("If-None-Match")
        ims = self.headers.get("If-Modified-Since")
        with cls._lock:
            cls.hits[name] += 1
            if inm or ims:
                cls.conditional[name] += 1
        if self.path == "/p/0":
            links = "".join(
                f'<a href="/img/{n}">x</a>' for n in sorted(BODIES)
            )
            self._serve(
                f"<html><body>{links}</body></html>".encode(),
                "text/html; charset=utf-8",
                {"Cache-Control": "max-age=3600"},
            )
        elif name == "fresh":
            self._serve(BODIES[name], "image/x-raw", {"Cache-Control": "max-age=3600"})
        elif name == "etag":
            cur = f'"{cls.etag_version}"'
            hdrs = {"Cache-Control": "max-age=0", "ETag": cur}
            if inm == cur:
                self._not_modified(hdrs)
            else:
                body = BODIES["etag"] if cls.etag_version == "v1" else ETAG_V2_BODY
                self._serve(body, "image/x-raw", hdrs)
        elif name == "lm":
            hdrs = {"Cache-Control": "max-age=0", "Last-Modified": LM_DATE}
            if ims == LM_DATE:
                self._not_modified(hdrs)
            else:
                self._serve(BODIES["lm"], "image/x-raw", hdrs)
        elif name == "nostore":
            self._serve(BODIES["nostore"], "image/x-raw", {"Cache-Control": "no-store"})
        elif name == "plain":
            self._serve(BODIES["plain"], "image/x-raw", {})
        else:
            self.send_response(404)
            self.end_headers()


@pytest.fixture()
def site():
    _PolicySite.hits = Counter()
    _PolicySite.conditional = Counter()
    _PolicySite.etag_version = "v1"
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _PolicySite)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _crawl(spark, site, http_cache=None):
    store = MemoryStore(spark)
    eng = CrawlEngine(
        spark,
        CrawlConfig(
            fetch_backend="http",
            httpcache_enabled=True,
            httpcache_policy="rfc2616",
            robotstxt_obey=False,
            epoch_budget=64,
            max_epochs=10,
            depth_limit=4,
            queue_order="fifo",
            download_timeout_s=10.0,
        ),
        store,
        url_map=spark.createDataFrame([], "url_canon string, image_id string"),
        graph=spark.createDataFrame([], "src_canon string, dst_url string"),
        robots=spark.createDataFrame([], "domain string, rules string"),
        http_cache=http_cache,
    )
    eng.bootstrap(
        pd.DataFrame({"url": [f"{site}/p/0"], "priority": [0]}),
        pd.DataFrame({"slot": ["127.0.0.1"], "delay_ms": [0], "concurrency": [8]}),
    )
    eng.run()
    return store


def _metric(store, key):
    m = store.read("metrics").toPandas()
    return m[(m.partition_id == -1) & (m.key == key)]["value"].sum()


def _items(store):
    return {
        r.image_id.rsplit("/", 1)[1]: bytes(r.bytes)
        for r in store.read("items").collect()
    }


def test_rfc2616_policy_full_matrix(spark, site):
    # ---- cold crawl: every URL hits the network, nothing conditional
    s1 = _crawl(spark, site)
    assert dict(_PolicySite.hits) == {
        "0": 1, "fresh": 1, "etag": 1, "lm": 1, "nostore": 1, "plain": 1
    }
    assert sum(_PolicySite.conditional.values()) == 0
    assert _metric(s1, "httpcache/hit") == 0
    assert _items(s1) == BODIES
    cache1 = s1.read("http_cache")
    # no-store was never written; everything else (incl. the page) was
    rows1 = cache1.collect()
    assert len(rows1) == 5
    assert all(r.fresh_until != -1 for r in rows1)
    assert any(r.etag == '"v1"' for r in rows1)
    assert any(r.last_modified == LM_DATE for r in rows1)

    # ---- warm crawl: fresh replays, stale revalidates, the rest refetch
    _PolicySite.hits = Counter()
    _PolicySite.conditional = Counter()
    s2 = _crawl(spark, site, http_cache=cache1)
    assert dict(_PolicySite.hits) == {"etag": 1, "lm": 1, "nostore": 1, "plain": 1}
    # ONLY the validator-carrying paths went conditional
    assert dict(_PolicySite.conditional) == {"etag": 1, "lm": 1}
    assert _metric(s2, "httpcache/hit") == 2  # /p/0 + fresh
    assert _metric(s2, "httpcache/revalidated") == 2  # etag + lm via 304
    assert _metric(s2, "downloader/request_count") == 4
    # 304-merged rows serve the STORED bodies byte-exact
    assert _items(s2) == BODIES
    # revalidated + refetched rows were re-appended (refreshed); replays
    # and no-store were not
    assert s2.read("http_cache").count() == 3  # etag, lm, plain


def test_changed_content_wins_over_stale_validator(spark, site):
    s1 = _crawl(spark, site)
    cache1 = s1.read("http_cache")
    # content changes server-side: the stored ETag no longer matches
    _PolicySite.etag_version = "v2"
    _PolicySite.hits = Counter()
    s2 = _crawl(spark, site, http_cache=cache1)
    # the conditional GET answered 200 with the new body — not a 304
    assert _metric(s2, "httpcache/revalidated") == 1  # only lm now 304s
    items = _items(s2)
    assert items["etag"] == ETAG_V2_BODY
    # and the refreshed cache row carries the new validator + body
    row = [
        r for r in s2.read("http_cache").collect()
        if bytes(r.body) == ETAG_V2_BODY
    ]
    assert len(row) == 1 and row[0].etag == '"v2"'


class _Bare304Site(http.server.BaseHTTPRequestHandler):
    """Stores with max-age=1 + ETag; revalidations get a MINIMAL 304
    (ETag only, no Cache-Control) — the common real-server shape that
    must NOT demote the entry to revalidate-every-epoch."""

    hits: Counter = Counter()
    _lock = threading.Lock()
    BODY = encode_image(synth_image("bare-304"), "rawrgb")

    def log_message(self, *a):
        pass

    def do_GET(self):
        cls = type(self)
        with cls._lock:
            cls.hits[self.path] += 1
        if self.path == "/p/0":
            body = b'<html><body><a href="/img/bare">x</a></body></html>'
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Cache-Control", "max-age=0")
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/img/bare":
            if self.headers.get("If-None-Match") == '"b1"':
                self.send_response(304)
                self.send_header("ETag", '"b1"')  # minimal 304: no CC
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "image/x-raw")
            self.send_header("Content-Length", str(len(cls.BODY)))
            self.send_header("Cache-Control", "max-age=1")
            self.send_header("ETag", '"b1"')
            self.end_headers()
            self.wfile.write(cls.BODY)
        else:
            self.send_response(404)
            self.end_headers()


def test_bare_304_inherits_stored_lifetime(spark):
    _Bare304Site.hits = Counter()
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Bare304Site)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        s1 = _crawl(spark, base)
        row1 = [
            r for r in s1.read("http_cache").collect() if r.etag == '"b1"'
        ][0]
        assert row1.fresh_until - row1.fetched_wall == 1  # stored max-age=1
        time.sleep(1.5)  # let the stored entry go stale

        s2 = _crawl(spark, base, http_cache=s1.read("http_cache"))
        # the image revalidated via conditional GET and 304'd
        assert _Bare304Site.hits["/img/bare"] == 2
        assert _metric(s2, "httpcache/revalidated") >= 1
        # RFC 9111 4.3.4: the bare 304 must INHERIT the stored 1s
        # lifetime re-anchored at revalidation time, not demote to 0
        row2 = [
            r for r in s2.read("http_cache").collect() if r.etag == '"b1"'
        ][0]
        assert row2.fresh_until - row2.fetched_wall == 1
        assert row2.fetched_wall > row1.fetched_wall
        # and the merged row still served the stored body byte-exact
        items = _items(s2)
        assert items["bare"] == _Bare304Site.BODY
    finally:
        srv.shutdown()
