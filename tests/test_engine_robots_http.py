"""Live robots.txt over the real http backend (F2 × S2; ref:
downloadermiddlewares/robotstxt.py ≈L60 — RobotsTxtMiddleware issues a
real ``Request(scheme://netloc/robots.txt)`` per first-seen netloc and
defers the domain's requests until the rules arrive).

Our analog: with ``robots_source="http"`` the engine fetches
``/robots.txt`` for each newly discovered domain during its one-epoch
robots wait, persists the rules in the store's ``robots_http`` table,
and gates the next epoch's pops against them — no fixture table needed.
"""

from __future__ import annotations

import http.server
import threading
from collections import Counter

import pandas as pd
import pytest

from scrapy_spark.config import CrawlConfig
from scrapy_spark.sources.store import MemoryStore
from scrapy_spark.streaming.engine import CrawlEngine

N_PAGES = 8  # /p/0 .. /p/7, binary-tree links: i → 2i+1, 2i+2

ROBOTS_BODY = b"User-agent: *\nDisallow: /blocked\n"


class _Site(http.server.BaseHTTPRequestHandler):
    hits: Counter  # class attr, set per fixture
    robots_status = 200

    def log_message(self, *a):
        pass

    def do_GET(self):
        type(self).hits[self.path] += 1
        if self.path == "/robots.txt":
            if type(self).robots_status != 200:
                self.send_response(type(self).robots_status)
                self.end_headers()
                return
            body, ctype = ROBOTS_BODY, "text/plain"
        elif self.path.startswith("/p/"):
            i = int(self.path.rsplit("/", 1)[1])
            kids = [c for c in (2 * i + 1, 2 * i + 2) if c < N_PAGES]
            links = "".join(f'<a href="/p/{c}">c</a>' for c in kids)
            body = (
                f"<html><body>{links}"
                f'<a href="/blocked/{i}">secret</a>'
                "</body></html>"
            ).encode()
            ctype = "text/html; charset=utf-8"
        elif self.path.startswith("/blocked/"):
            body, ctype = b"should never be fetched", "text/plain"
        else:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def site():
    class Handler(_Site):
        hits = Counter()
        robots_status = 200

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", Handler
    srv.shutdown()


def _crawl(spark, site_url, robots_status_ok=True, **cfg_kw):
    cfg = CrawlConfig(
        fetch_backend="http",
        robots_source="http",
        epoch_budget=64,
        max_epochs=30,
        depth_limit=8,
        depth_priority=1,
        queue_order="fifo",
        download_timeout_s=10.0,
        **cfg_kw,
    )
    store = MemoryStore(spark)
    eng = CrawlEngine(
        spark, cfg, store,
        url_map=spark.createDataFrame([], "url_canon string, image_id string"),
        graph=spark.createDataFrame([], "src_canon string, dst_url string"),
        # NO fixture rules — everything must come from the live fetch
        robots=spark.createDataFrame([], "domain string, rules string"),
    )
    eng.bootstrap(
        pd.DataFrame({"url": [f"{site_url}/p/0"], "priority": [0]}),
        pd.DataFrame({"slot": ["127.0.0.1"], "delay_ms": [0], "concurrency": [8]}),
    )
    eng.run()
    return store


def test_live_robots_gate_enforced(spark, site):
    site_url, handler = site
    store = _crawl(spark, site_url)

    # robots.txt was fetched over the network EXACTLY once (one domain)
    assert handler.hits["/robots.txt"] == 1

    # the rules landed in the persistent robots_http table, decoded
    rows = store.read("robots_http").collect()
    assert len(rows) == 1
    assert rows[0]["domain"] == "127.0.0.1"
    assert rows[0]["rules"] == ROBOTS_BODY.decode()

    # /blocked/* never reached the server; all pages did
    assert not any(p.startswith("/blocked/") for p in handler.hits)
    assert all(handler.hits[f"/p/{i}"] == 1 for i in range(N_PAGES))

    # metrics: every /blocked link denied at pop time, one robots request
    m = store.read("metrics").toPandas()
    agg = m[m.partition_id == -1].groupby("key")["value"].sum().to_dict()
    assert agg.get("robotstxt/forbidden", 0) == N_PAGES
    assert agg.get("robotstxt/request_count", 0) == 1


def test_live_robots_fetch_error_allows_all(spark, site):
    """robots.txt 404 → NULL rules stored → allow-all, matching the
    reference's fetch-error behavior (robotstxt.py _robots_error path)."""
    site_url, handler = site
    handler.robots_status = 404
    store = _crawl(spark, site_url)

    assert handler.hits["/robots.txt"] == 1
    rows = store.read("robots_http").collect()
    assert len(rows) == 1 and rows[0]["rules"] is None

    # with no rules everything is allowed — /blocked/* WAS fetched
    assert all(handler.hits[f"/blocked/{i}"] == 1 for i in range(N_PAGES))
    m = store.read("metrics").toPandas()
    agg = m[m.partition_id == -1].groupby("key")["value"].sum().to_dict()
    assert agg.get("robotstxt/forbidden", 0) == 0


def test_live_robots_requires_http_backend(spark):
    with pytest.raises(ValueError, match="robots_source"):
        CrawlEngine(
            spark,
            CrawlConfig(robots_source="http"),  # synthetic backend
            MemoryStore(spark),
            url_map=spark.createDataFrame([], "url_canon string, image_id string"),
            graph=spark.createDataFrame([], "src_canon string, dst_url string"),
            robots=spark.createDataFrame([], "domain string, rules string"),
        )
