"""Engine-level SitemapSpider analog over the live http backend (S5;
ref: spiders/sitemap.py::SitemapSpider ≈L15 — robots.txt ``Sitemap:``
lines seed sitemap requests, <sitemapindex> recurses, <urlset> locs
become page requests, all deduped by the dupefilter and gated by
robots like any other request)."""

from __future__ import annotations

import http.server
import threading
from collections import Counter

import pandas as pd
import pytest

from scrapy_spark.config import CrawlConfig
from scrapy_spark.sources.store import MemoryStore
from scrapy_spark.streaming.engine import CrawlEngine

N_PAGES = 8


class _Site(http.server.BaseHTTPRequestHandler):
    hits: Counter

    def log_message(self, *a):
        pass

    def _base(self) -> str:
        return f"http://{self.headers['Host']}"

    def do_GET(self):
        type(self).hits[self.path] += 1
        base = self._base()
        if self.path == "/robots.txt":
            body = (
                "User-agent: *\nDisallow: /blocked\n"
                f"Sitemap: {base}/sitemap-index.xml\n"
            ).encode()
            ctype = "text/plain"
        elif self.path == "/sitemap-index.xml":
            body = (
                '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                f"<sitemap><loc>{base}/sm/a.xml</loc></sitemap>"
                f"<sitemap><loc>{base}/sm/b.xml</loc></sitemap>"
                "</sitemapindex>"
            ).encode()
            ctype = "application/xml"
        elif self.path == "/sm/a.xml":
            locs = "".join(f"<url><loc>{base}/p/{i}</loc></url>" for i in range(1, 5))
            body = f"<urlset>{locs}</urlset>".encode()
            ctype = "application/xml"
        elif self.path == "/sm/b.xml":
            # /p/4 also in a.xml (cross-sitemap dupefilter), /p/0 is the
            # crawl seed (upstream seed-refetch semantics), /blocked (gate)
            locs = "".join(
                f"<url><loc>{base}/p/{i}</loc></url>" for i in range(4, N_PAGES)
            )
            body = (
                f"<urlset>{locs}<url><loc>{base}/p/0</loc></url>"
                f"<url><loc>{base}/blocked/1</loc></url></urlset>"
            ).encode()
            ctype = "application/xml"
        elif self.path.startswith("/p/"):
            body = b"<html><body>page</body></html>"
            ctype = "text/html; charset=utf-8"
        elif self.path.startswith("/blocked/"):
            body, ctype = b"never", "text/plain"
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

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", Handler
    srv.shutdown()


def _crawl(spark, site_url, **cfg_kw):
    cfg = CrawlConfig(
        fetch_backend="http",
        robots_source="http",
        sitemap_follow=True,
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
        robots=spark.createDataFrame([], "domain string, rules string"),
    )
    # seed is a plain page — EVERYTHING else must arrive via robots→sitemaps
    eng.bootstrap(
        pd.DataFrame({"url": [f"{site_url}/p/0"], "priority": [0]}),
        pd.DataFrame({"slot": ["127.0.0.1"], "delay_ms": [0], "concurrency": [8]}),
    )
    eng.run()
    return store


def test_sitemaps_discovered_from_robots(spark, site):
    site_url, handler = site
    _crawl(spark, site_url)

    # robots → index → both children, each fetched exactly once
    assert handler.hits["/robots.txt"] == 1
    assert handler.hits["/sitemap-index.xml"] == 1
    assert handler.hits["/sm/a.xml"] == 1
    assert handler.hits["/sm/b.xml"] == 1

    # every sitemap-listed page fetched exactly once; /p/4 appears in
    # BOTH a.xml and b.xml and must be deduped across sitemaps
    assert all(handler.hits[f"/p/{i}"] == 1 for i in range(1, N_PAGES))

    # upstream parity: start requests carry dont_filter=True, so the
    # dupefilter never RECORDS the seed fp (scheduler ≈L230 skips
    # request_seen entirely) — a sitemap loc naming the seed URL is
    # therefore fetched again, exactly as upstream Scrapy would
    assert handler.hits["/p/0"] == 2

    # the robots-blocked loc was gated, never fetched
    assert not any(p.startswith("/blocked/") for p in handler.hits)


def test_sitemap_follow_patterns_gate_children(spark, site):
    site_url, handler = site
    _crawl(spark, site_url, sitemap_follow_patterns=(r"/sm/a\.xml$",))

    assert handler.hits["/sitemap-index.xml"] == 1
    assert handler.hits["/sm/a.xml"] == 1
    assert handler.hits["/sm/b.xml"] == 0  # filtered by follow pattern
    assert handler.hits["/p/0"] == 1  # seed only; b.xml's dup loc never seen
    assert all(handler.hits[f"/p/{i}"] == 1 for i in range(1, 5))
    # b.xml's exclusive pages never discovered
    assert all(handler.hits[f"/p/{i}"] == 0 for i in range(5, N_PAGES))
