"""Engine-level wiring tests for U3 (referrer policy) and J4/C4 (per-IP
slots) — the round-2 verdict's top item: both operators existed and were
unit-tested but the ENGINE never called them. These tests drive the full
CrawlEngine with fetch_backend="http" against a live loopback server that
RECORDS request headers, proving (a) the Referer header actually arrives
at the server under ≥2 policies, and (b) two hostnames resolving to one
IP share a single politeness slot under slot_key_mode="ip"."""

from __future__ import annotations

import http.server
import threading

import pandas as pd
import pytest

from scrapy_spark.config import CrawlConfig
from scrapy_spark.sources.store import MemoryStore
from scrapy_spark.streaming.engine import CrawlEngine

N_PAGES = 6  # /p/0 → /p/1 → … chain


class _RecordingSite(http.server.BaseHTTPRequestHandler):
    # class-level: (host_header, path) → dict of request headers
    seen: dict[tuple[str, str], dict] = {}

    def log_message(self, *a):
        pass

    def do_GET(self):
        type(self).seen[(self.headers.get("Host", ""), self.path)] = dict(
            self.headers
        )
        if self.path.startswith("/p/"):
            i = int(self.path.rsplit("/", 1)[1])
            nxt = (
                f'<a href="/p/{i + 1}">next</a>' if i + 1 < N_PAGES else ""
            )
            body = f"<html><body>{nxt}</body></html>".encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_response(404)
            self.end_headers()


@pytest.fixture()
def site():
    _RecordingSite.seen = {}
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _RecordingSite)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", srv.server_address[1]
    srv.shutdown()


def _engine(spark, cfg, **kw):
    return CrawlEngine(
        spark,
        cfg,
        MemoryStore(spark),
        url_map=spark.createDataFrame([], "url_canon string, image_id string"),
        graph=spark.createDataFrame([], "src_canon string, dst_url string"),
        robots=spark.createDataFrame([], "domain string, rules string"),
        **kw,
    )


def _crawl(spark, cfg, seeds, politeness, **kw):
    eng = _engine(spark, cfg, **kw)
    eng.bootstrap(
        pd.DataFrame({"url": seeds, "priority": [0] * len(seeds)}),
        politeness,
    )
    eng.run()
    return eng


def test_referer_scrapy_default_arrives_at_server(spark, site):
    base, _port = site
    cfg = CrawlConfig(
        fetch_backend="http",
        robotstxt_obey=False,
        queue_order="fifo",
        max_epochs=2 * N_PAGES + 2,
        download_timeout_s=10.0,
    )
    _crawl(
        spark,
        cfg,
        [f"{base}/p/0"],
        pd.DataFrame({"slot": ["127.0.0.1"], "delay_ms": [0], "concurrency": [8]}),
    )
    host = base.split("//", 1)[1]
    # the seed request carries NO Referer
    assert "Referer" not in _RecordingSite.seen[(host, "/p/0")]
    # every followed link carries the PARENT page URL (scrapy-default ⇒
    # no-referrer-when-downgrade; http→http keeps the stripped referrer)
    for i in range(1, N_PAGES):
        hdrs = _RecordingSite.seen[(host, f"/p/{i}")]
        assert hdrs.get("Referer") == f"{base}/p/{i - 1}", (i, hdrs)


def test_referer_no_referrer_policy_sends_nothing(spark, site):
    base, _port = site
    cfg = CrawlConfig(
        fetch_backend="http",
        robotstxt_obey=False,
        referrer_policy="no-referrer",
        queue_order="fifo",
        max_epochs=2 * N_PAGES + 2,
        download_timeout_s=10.0,
    )
    _crawl(
        spark,
        cfg,
        [f"{base}/p/0"],
        pd.DataFrame({"slot": ["127.0.0.1"], "delay_ms": [0], "concurrency": [8]}),
    )
    assert _RecordingSite.seen, "site was crawled"
    for (h, path), hdrs in _RecordingSite.seen.items():
        assert "Referer" not in hdrs, (path, hdrs)


def test_referer_origin_policy(spark, site):
    base, _port = site
    cfg = CrawlConfig(
        fetch_backend="http",
        robotstxt_obey=False,
        referrer_policy="origin",
        queue_order="fifo",
        max_epochs=2 * N_PAGES + 2,
        download_timeout_s=10.0,
    )
    _crawl(
        spark,
        cfg,
        [f"{base}/p/0"],
        pd.DataFrame({"slot": ["127.0.0.1"], "delay_ms": [0], "concurrency": [8]}),
    )
    host = base.split("//", 1)[1]
    for i in range(1, N_PAGES):
        hdrs = _RecordingSite.seen[(host, f"/p/{i}")]
        # origin policy: scheme://host:port/ only, no path
        assert hdrs.get("Referer") == f"{base}/", (i, hdrs)


def test_ip_slot_mode_shares_politeness_slot(spark, site):
    """Two hostnames (localhost, 127.0.0.1) resolving to one IP must share
    ONE politeness slot under slot_key_mode="ip": with concurrency 1 and a
    nonzero delay the two seeds pop in DIFFERENT epochs (domain mode would
    pop both in epoch 0 — separate slots)."""
    base, port = site
    cfg = CrawlConfig(
        fetch_backend="http",
        robotstxt_obey=False,
        slot_key_mode="ip",
        queue_order="fifo",
        depth_limit=1,  # seeds only matter; stop link growth quickly
        max_epochs=8,
        download_timeout_s=10.0,
    )
    resolver = {"localhost": "127.0.0.1", "127.0.0.1": "127.0.0.1"}.get
    eng = _crawl(
        spark,
        cfg,
        [f"http://127.0.0.1:{port}/p/0", f"http://localhost:{port}/p/0"],
        # politeness keyed by the SHARED slot (the resolved IP)
        pd.DataFrame({"slot": ["127.0.0.1"], "delay_ms": [1000], "concurrency": [1]}),
        resolver=resolver,
    )
    pops = eng.store.read("pop_log").toPandas()
    # every pop (both hostnames) ran through the single IP slot
    assert set(pops.slot) == {"127.0.0.1"}
    seed_pops = pops[pops.url_canon.str.contains("/p/0")]
    assert len(seed_pops) == 2
    # shared slot + concurrency 1 ⇒ the seeds were serialized across epochs
    assert seed_pops.epoch.nunique() == 2, seed_pops
    # both hostnames actually got fetched
    hosts = {h for (h, p) in _RecordingSite.seen if p == "/p/0"}
    assert hosts == {f"127.0.0.1:{port}", f"localhost:{port}"}


def test_ip_slot_mode_download_slot_meta_override_wins(spark, site):
    """Upstream get_slot_key returns meta['download_slot'] FIRST, before
    the IP branch (downloader/__init__.py ≈L100) — so under
    slot_key_mode="ip" a seed carrying the override must keep it, not get
    clobbered by the resolved IP (ADVICE r3, ipslots.py)."""
    import json

    base, port = site
    cfg = CrawlConfig(
        fetch_backend="http",
        robotstxt_obey=False,
        slot_key_mode="ip",
        queue_order="fifo",
        depth_limit=1,
        max_epochs=3,
        download_timeout_s=10.0,
    )
    resolver = {"localhost": "127.0.0.1", "127.0.0.1": "127.0.0.1"}.get
    eng = _engine(spark, cfg, resolver=resolver)
    eng.bootstrap(
        pd.DataFrame(
            {
                "url": [
                    f"http://127.0.0.1:{port}/p/0",  # IP slot
                    f"http://localhost:{port}/p/1",  # explicit override
                ],
                "priority": [0, 0],
                "meta_json": [None, json.dumps({"download_slot": "vip"})],
            }
        ),
        pd.DataFrame(
            {"slot": ["127.0.0.1", "vip"], "delay_ms": [0, 0],
             "concurrency": [8, 8]}
        ),
    )
    frontier = eng.store.read("frontier").toPandas().set_index("url")
    assert frontier.loc[f"http://127.0.0.1:{port}/p/0", "slot"] == "127.0.0.1"
    assert frontier.loc[f"http://localhost:{port}/p/1", "slot"] == "vip"
    eng.run()
    pops = eng.store.read("pop_log").toPandas()
    by_url = dict(zip(pops.url_canon, pops.slot))
    assert by_url[f"http://localhost:{port}/p/1"] == "vip"
    assert by_url[f"http://127.0.0.1:{port}/p/0"] == "127.0.0.1"


def test_ip_slot_mode_frontier_rows_keyed_by_ip(spark, site):
    """Link candidates discovered mid-crawl also get the IP slot (not just
    seeds): frontier rows committed for /p/1 carry slot 127.0.0.1 even when
    the parent hostname was localhost."""
    base, port = site
    cfg = CrawlConfig(
        fetch_backend="http",
        robotstxt_obey=False,
        slot_key_mode="ip",
        queue_order="fifo",
        max_epochs=2,  # enough to discover /p/1 but not crawl it
        download_timeout_s=10.0,
    )
    resolver = {"localhost": "127.0.0.1", "127.0.0.1": "127.0.0.1"}.get
    eng = _crawl(
        spark,
        cfg,
        [f"http://localhost:{port}/p/0"],
        pd.DataFrame({"slot": ["127.0.0.1"], "delay_ms": [0], "concurrency": [8]}),
        resolver=resolver,
    )
    frontier = eng.store.read("frontier").toPandas()
    queued = frontier[frontier.url.str.contains("/p/")]
    assert len(queued) > 0
    assert set(queued.slot) == {"127.0.0.1"}
    assert set(queued.domain) == {"localhost"}  # domain stays the hostname
