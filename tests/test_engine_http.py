"""End-to-end REAL-NETWORK crawl: the full CrawlEngine (politeness,
robots gate, dedupe, priority pop, retries, resume store) driving the
``http`` fetch backend against a live loopback site — pages parsed from
actually-fetched HTML (C6/C7/C13), image payloads persisted byte-exact as
items (S9/S10), robots rules enforced (F2). This is the S2 'real fetch
path' gap from round 1, closed at the ENGINE level, not just the
operator level."""

from __future__ import annotations

import http.server
import threading

import pytest
from pyspark.sql import functions as F

from scrapy_spark.config import CrawlConfig
from scrapy_spark.functions.imaging import encode_image, phash64, synth_image
from scrapy_spark.sources.store import MemoryStore
from scrapy_spark.streaming.engine import CrawlEngine

N_PAGES = 12  # /p/0 .. /p/11, binary-tree links: i → 2i+1, 2i+2


class _Site(http.server.BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _html(self, markup: str) -> None:
        body = markup.encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path.startswith("/r/"):
            # /r/<code>/<i> → <code> redirect to /p/<i> (302/303/307/308
            # coverage: upstream RedirectMiddleware handles them all)
            _, _, code, i = self.path.split("/")
            self.send_response(int(code))
            self.send_header("Location", f"/p/{i}")
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        if self.path.startswith("/rbig/"):
            # <code> redirect whose BODY exceeds the test's
            # download_maxsize: with fail_on_dataloss the truncation is a
            # download failure upstream (raised before any middleware),
            # so the Location must NOT be followed
            _, _, code, i = self.path.split("/")
            body = b"B" * 4096
            self.send_response(int(code))
            self.send_header("Location", f"/p/{i}")
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        if self.path.startswith("/mr/"):
            # 200 HTML with an instant meta refresh: the page is REPLACED
            # by the redirect upstream, so its anchor must never be
            # followed (MetaRefreshMiddleware returns a Request)
            i = self.path.rsplit("/", 1)[1]
            self._html(
                '<html><head><meta http-equiv="refresh" '
                f'content="0; url=/p/{i}"></head>'
                '<body><a href="/p/99">must-not-follow</a></body></html>'
            )
            return
        if self.path.startswith("/mrslow/"):
            # delay ≥ METAREFRESH_MAXDELAY → NOT followed; the page is
            # delivered normally and its links are extracted
            self._html(
                '<html><head><meta http-equiv="refresh" '
                'content="300; url=/p/1"></head>'
                '<body><a href="/p/9">real-link</a></body></html>'
            )
            return
        if self.path.startswith("/mrns/"):
            # refresh only inside <noscript> → ignored per the upstream
            # METAREFRESH_IGNORE_TAGS default; links extracted normally
            self._html(
                '<html><head><noscript><meta http-equiv="refresh" '
                'content="0; url=/p/5"></noscript></head>'
                '<body><a href="/p/3">real-link</a></body></html>'
            )
            return
        if self.path.startswith("/big/"):
            body = b"A" * 4096  # larger than the test's download_maxsize
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        if self.path.startswith("/p/"):
            i = int(self.path.rsplit("/", 1)[1])
            kids = [c for c in (2 * i + 1, 2 * i + 2) if c < N_PAGES]
            links = "".join(f'<a href="/p/{c}">c</a>' for c in kids)
            body = (
                f"<html><body>{links}"
                f'<a href="/img/{i}">img</a>'
                f'<a href="/blocked/{i}">secret</a>'
                "</body></html>"
            ).encode()
            ctype = "text/html; charset=utf-8"
        elif self.path.startswith("/img/"):
            i = int(self.path.rsplit("/", 1)[1])
            body = encode_image(synth_image(f"img{i}"), "rawrgb")
            ctype = "application/octet-stream"
        elif self.path.startswith("/blocked/"):
            body = b"should never be fetched"
            ctype = "text/plain"
        else:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def site():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Site)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_engine_crawls_real_site(spark, site):
    import pandas as pd

    cfg = CrawlConfig(
        fetch_backend="http",
        epoch_budget=64,
        max_epochs=30,
        depth_limit=8,
        depth_priority=1,
        queue_order="fifo",
        download_timeout_s=10.0,
    )
    empty_urlmap = spark.createDataFrame([], "url_canon string, image_id string")
    empty_graph = spark.createDataFrame([], "src_canon string, dst_url string")
    robots = spark.createDataFrame(
        [("127.0.0.1", "User-agent: *\nDisallow: /blocked\n")],
        "domain string, rules string",
    )
    store = MemoryStore(spark)
    eng = CrawlEngine(
        spark, cfg, store,
        url_map=empty_urlmap, graph=empty_graph, robots=robots,
    )
    eng.bootstrap(
        pd.DataFrame({"url": [f"{site}/p/0"], "priority": [0]}),
        pd.DataFrame({"slot": ["127.0.0.1"], "delay_ms": [0], "concurrency": [8]}),
    )
    stats = eng.run()

    # terminated with an exhausted frontier
    assert stats[-1].queued_after == 0

    # every page and every image was actually fetched over HTTP
    log = store.read("fetch_log").toPandas()
    fetched_paths = {u.split(":", 2)[-1].split("/", 1)[1] for u in log.url_canon}
    assert {f"p/{i}" for i in range(N_PAGES)} <= fetched_paths
    assert {f"img/{i}" for i in range(N_PAGES)} <= fetched_paths
    assert (log.status == 200).all()
    assert not any(p.startswith("blocked/") for p in fetched_paths)

    # robots gate: all 12 /blocked/ links were denied, never fetched
    m = store.read("metrics").toPandas()
    denied = m[(m.partition_id == -1) & (m.key == "robotstxt/forbidden")]["value"].sum()
    assert denied == N_PAGES

    # items: the fetched image payloads, byte-exact vs the server's source
    items = store.read("items").toPandas()
    assert len(items) == N_PAGES
    for _, row in items.iterrows():
        i = int(row.image_id.rsplit("/", 1)[1])
        expected = encode_image(synth_image(f"img{i}"), "rawrgb")
        arr = synth_image(f"img{i}")
        assert bytes(row.bytes) == expected  # payload parity, bit-exact
        assert (row.w, row.h) == (arr.shape[1], arr.shape[0])
        assert row.fmt == "rawrgb" and row.phash == phash64(arr)

    # dupefilter: every URL fetched exactly once despite the tree linking
    # /img and /blocked from every page
    assert log.url_canon.is_unique

    # url_seen covers every discovered (non-seed) URL: 11 child pages +
    # 12 images + 12 blocked links (robots denial happens at pop time;
    # the links still enter the dupefilter, as upstream)
    assert store.read("url_seen").count() == 3 * N_PAGES - 1


def test_engine_http_retries_transient_errors(spark, site):
    """A dead port gives status 0 (connection error) → retried
    retry_times times then FAILED — the reference's connection-error
    retry path, observed through engine metrics."""
    import pandas as pd

    cfg = CrawlConfig(
        fetch_backend="http",
        epoch_budget=8,
        max_epochs=10,
        retry_times=2,
        queue_order="fifo",
        robotstxt_obey=False,
        download_timeout_s=3.0,
    )
    store = MemoryStore(spark)
    eng = CrawlEngine(
        spark, cfg, store,
        url_map=spark.createDataFrame([], "url_canon string, image_id string"),
        graph=spark.createDataFrame([], "src_canon string, dst_url string"),
        robots=spark.createDataFrame([], "domain string, rules string"),
    )
    eng.bootstrap(
        pd.DataFrame({"url": ["http://127.0.0.1:9/dead"], "priority": [0]}),
        pd.DataFrame({"slot": ["127.0.0.1"], "delay_ms": [0], "concurrency": [4]}),
    )
    eng.run()
    m = store.read("metrics").toPandas()
    agg = m[m.partition_id == -1].groupby("key")["value"].sum().to_dict()
    assert agg.get("retry/count", 0) == 2  # retried exactly retry_times
    assert agg.get("downloader/response_status_count/0", 0) == 3  # 1 + 2 retries


def test_engine_http_follows_all_redirect_codes(spark, site):
    """302/303/307/308 responses from a live server are re-queued as
    redirect children (J7) with C11 meta bookkeeping — not just the 301
    the synthetic fixtures exercise (upstream redirect.py allowed_status
    covers all five codes)."""
    import json

    import pandas as pd

    cfg = CrawlConfig(
        fetch_backend="http",
        epoch_budget=16,
        max_epochs=10,
        depth_limit=1,
        queue_order="fifo",
        robotstxt_obey=False,
        download_timeout_s=10.0,
        deny_url_patterns=(r"/img/", r"/blocked/", r"/p/[12]\b"),
    )
    store = MemoryStore(spark)
    eng = CrawlEngine(
        spark, cfg, store,
        url_map=spark.createDataFrame([], "url_canon string, image_id string"),
        graph=spark.createDataFrame([], "src_canon string, dst_url string"),
        robots=spark.createDataFrame([], "domain string, rules string"),
    )
    eng.bootstrap(
        pd.DataFrame(
            {"url": [f"{site}/r/{c}/0" for c in (302, 303, 307, 308)],
             "priority": [0, 0, 0, 0]}
        ),
        pd.DataFrame({"slot": ["127.0.0.1"], "delay_ms": [0], "concurrency": [8]}),
    )
    eng.run()

    log = store.read("fetch_log").toPandas()
    # all four chains converged on /p/0; the children inherit the seeds'
    # dont_filter (request.replace semantics) so each fetches — exactly 4
    # rows, one per HTTP fetch (the fp-keyed result join used to square
    # this into 16)
    p0 = log[log.url_canon.str.endswith("/p/0")]
    assert len(p0) == 4 and (p0.status == 200).all()
    # the 30x parents themselves are logged too, one per code
    assert sorted(log[log.status != 200].status) == [302, 303, 307, 308]

    m = store.read("metrics").toPandas()
    agg = m[m.partition_id == -1].groupby("key")["value"].sum().to_dict()
    assert agg.get("redirect/count", 0) == 4  # every code followed

    # the surviving child carried redirect meta through the frontier: the
    # winner's fetch-completed row is gone, so assert via a 1-epoch rerun
    store2 = MemoryStore(spark)
    eng2 = CrawlEngine(
        spark, cfg, store2,
        url_map=spark.createDataFrame([], "url_canon string, image_id string"),
        graph=spark.createDataFrame([], "src_canon string, dst_url string"),
        robots=spark.createDataFrame([], "domain string, rules string"),
    )
    eng2.bootstrap(
        pd.DataFrame({"url": [f"{site}/r/307/0"], "priority": [0]}),
        pd.DataFrame({"slot": ["127.0.0.1"], "delay_ms": [0], "concurrency": [8]}),
    )
    eng2.run(max_epochs=1)
    child = store2.read("frontier").toPandas()
    assert len(child) == 1 and child.url.iloc[0].endswith("/p/0")
    meta = json.loads(child.meta_json.iloc[0])
    assert json.loads(meta["redirect_urls"]) == [f"{site}/r/307/0"]
    assert json.loads(meta["redirect_reasons"]) == ["307"]
    assert meta["redirect_times"] == "1"


def test_engine_http_meta_refresh(spark, site):
    """MetaRefreshMiddleware parity (U21, redirect.py ≈L90): an instant
    ``<meta http-equiv=refresh>`` on a 200 HTML page re-queues the target
    like a redirect and SUPPRESSES the page's own links; a delay ≥
    maxdelay is ignored; a refresh inside <noscript> is ignored (upstream
    METAREFRESH_IGNORE_TAGS default) — all over a live loopback site."""
    import json

    import pandas as pd

    cfg = CrawlConfig(
        fetch_backend="http",
        epoch_budget=16,
        max_epochs=10,
        depth_limit=1,
        queue_order="fifo",
        robotstxt_obey=False,
        download_timeout_s=10.0,
        deny_url_patterns=(r"/img/", r"/blocked/"),
    )
    store = MemoryStore(spark)
    eng = CrawlEngine(
        spark, cfg, store,
        url_map=spark.createDataFrame([], "url_canon string, image_id string"),
        graph=spark.createDataFrame([], "src_canon string, dst_url string"),
        robots=spark.createDataFrame([], "domain string, rules string"),
    )
    eng.bootstrap(
        pd.DataFrame(
            {"url": [f"{site}/mr/7", f"{site}/mrslow/4", f"{site}/mrns/6"],
             "priority": [0, 0, 0]}
        ),
        pd.DataFrame({"slot": ["127.0.0.1"], "delay_ms": [0], "concurrency": [8]}),
    )
    eng.run()

    log = store.read("fetch_log").toPandas()
    fetched = {u.split(":", 2)[-1].split("/", 1)[1] for u in log.url_canon}
    # the refresh target was followed like a redirect
    assert "p/7" in fetched
    # the refreshing page's own anchor was NOT followed (page replaced)
    assert "p/99" not in fetched
    # delay 300 ≥ maxdelay 100: not followed; the page's links WERE
    assert "p/1" not in fetched and "p/9" in fetched
    # noscript-wrapped refresh ignored; the page's links extracted
    assert "p/5" not in fetched and "p/3" in fetched

    m = store.read("metrics").toPandas()
    agg = m[m.partition_id == -1].groupby("key")["value"].sum().to_dict()
    assert agg.get("redirect/count", 0) == 1  # exactly the /mr/7 hop

    # C11 bookkeeping: reason is the upstream literal "meta refresh"
    store2 = MemoryStore(spark)
    eng2 = CrawlEngine(
        spark, cfg, store2,
        url_map=spark.createDataFrame([], "url_canon string, image_id string"),
        graph=spark.createDataFrame([], "src_canon string, dst_url string"),
        robots=spark.createDataFrame([], "domain string, rules string"),
    )
    eng2.bootstrap(
        pd.DataFrame({"url": [f"{site}/mr/2"], "priority": [0]}),
        pd.DataFrame({"slot": ["127.0.0.1"], "delay_ms": [0], "concurrency": [8]}),
    )
    eng2.run(max_epochs=1)
    child = store2.read("frontier").toPandas()
    assert len(child) == 1 and child.url.iloc[0].endswith("/p/2")
    meta = json.loads(child.meta_json.iloc[0])
    assert json.loads(meta["redirect_urls"]) == [f"{site}/mr/2"]
    assert json.loads(meta["redirect_reasons"]) == ["meta refresh"]
    assert meta["redirect_times"] == "1"

    # metarefresh_enabled=False restores plain-200 delivery
    cfg_off = CrawlConfig(
        **{**cfg.__dict__, "metarefresh_enabled": False, "max_epochs": 2}
    )
    store3 = MemoryStore(spark)
    eng3 = CrawlEngine(
        spark, cfg_off, store3,
        url_map=spark.createDataFrame([], "url_canon string, image_id string"),
        graph=spark.createDataFrame([], "src_canon string, dst_url string"),
        robots=spark.createDataFrame([], "domain string, rules string"),
    )
    eng3.bootstrap(
        pd.DataFrame({"url": [f"{site}/mr/7"], "priority": [0]}),
        pd.DataFrame({"slot": ["127.0.0.1"], "delay_ms": [0], "concurrency": [8]}),
    )
    eng3.run()
    log3 = store3.read("fetch_log").toPandas()
    f3 = {u.split(":", 2)[-1].split("/", 1)[1] for u in log3.url_canon}
    assert "p/7" not in f3  # no refresh hop...
    assert "p/99" in f3  # ...and the page's anchor WAS followed


def _bare_engine(spark, cfg, store):
    return CrawlEngine(
        spark, cfg, store,
        url_map=spark.createDataFrame([], "url_canon string, image_id string"),
        graph=spark.createDataFrame([], "src_canon string, dst_url string"),
        robots=spark.createDataFrame([], "domain string, rules string"),
    )


@pytest.mark.parametrize("fail_on_dataloss", [True, False])
def test_engine_redirect_with_dataloss_body(spark, site, fail_on_dataloss):
    """A 301 whose body exceeds download_maxsize: with
    DOWNLOAD_FAIL_ON_DATALOSS (default) upstream raises in the
    downloader BEFORE RedirectMiddleware — the Location is never
    followed and the request retries; with the flag off the truncated
    response reaches the middlewares and the redirect IS followed."""
    import pandas as pd

    cfg = CrawlConfig(
        fetch_backend="http",
        epoch_budget=8,
        max_epochs=10,
        depth_limit=1,
        queue_order="fifo",
        robotstxt_obey=False,
        retry_times=1,
        download_timeout_s=10.0,
        download_maxsize=1024,
        download_fail_on_dataloss=fail_on_dataloss,
        deny_url_patterns=(r"/img/", r"/blocked/", r"/p/"),
    )
    store = MemoryStore(spark)
    eng = _bare_engine(spark, cfg, store)
    eng.bootstrap(
        pd.DataFrame({"url": [f"{site}/rbig/301/0"], "priority": [0]}),
        pd.DataFrame({"slot": ["127.0.0.1"], "delay_ms": [0], "concurrency": [8]}),
    )
    eng.run()
    log = store.read("fetch_log").toPandas()
    fetched = {u.split(":", 2)[-1].split("/", 1)[1] for u in log.url_canon}
    m = store.read("metrics").toPandas()
    agg = m[m.partition_id == -1].groupby("key")["value"].sum().to_dict()
    if fail_on_dataloss:
        # dataloss wins: retried then failed, Location never followed
        assert "p/0" not in fetched
        assert agg.get("retry/count", 0) == 1
        assert agg.get("redirect/count", 0) == 0
    else:
        # truncated response passes through → redirect followed; the
        # /p/0 child then dies on the deny filter, so only the hop counts
        assert agg.get("redirect/count", 0) == 1
        assert agg.get("retry/count", 0) == 0


def test_engine_closespider_errorcount(spark, site):
    """A7 CLOSESPIDER_ERRORCOUNT: the crawl closes once terminal
    failures reach the threshold, even with work still queued."""
    import pandas as pd

    cfg = CrawlConfig(
        fetch_backend="http",
        epoch_budget=16,
        max_epochs=30,
        depth_limit=4,
        queue_order="fifo",
        robotstxt_obey=False,
        retry_times=0,
        download_timeout_s=10.0,
        close_errorcount=1,
        deny_url_patterns=(r"/img/", r"/blocked/"),
    )
    store = MemoryStore(spark)
    eng = _bare_engine(spark, cfg, store)
    eng.bootstrap(
        pd.DataFrame({"url": [f"{site}/nope", f"{site}/p/0"], "priority": [0, 0]}),
        pd.DataFrame({"slot": ["127.0.0.1"], "delay_ms": [0], "concurrency": [8]}),
    )
    stats = eng.run()
    # both seeds popped in epoch 0; the 404 is one terminal failure →
    # closed right there with /p/0's children still queued
    assert len(stats) == 1
    assert stats[-1].queued_after > 0
    assert store.scalars.get("errors", 0) == 1


def test_engine_closespider_timeout_virtual_clock(spark, site):
    """A7 CLOSESPIDER_TIMEOUT on the deterministic virtual clock: 3
    simulated seconds at 1 s/epoch → exactly 3 epochs, frontier
    nonempty."""
    import pandas as pd

    cfg = CrawlConfig(
        fetch_backend="http",
        epoch_budget=1,
        max_epochs=30,
        depth_limit=8,
        queue_order="fifo",
        robotstxt_obey=False,
        download_timeout_s=10.0,
        epoch_quantum_ms=1000,
        close_timeout_s=3.0,
        deny_url_patterns=(r"/img/", r"/blocked/"),
    )
    store = MemoryStore(spark)
    eng = _bare_engine(spark, cfg, store)
    eng.bootstrap(
        pd.DataFrame({"url": [f"{site}/p/0"], "priority": [0]}),
        pd.DataFrame({"slot": ["127.0.0.1"], "delay_ms": [0], "concurrency": [8]}),
    )
    stats = eng.run()
    assert len(stats) == 3  # epochs 0,1,2 — then the clock cap fires
    assert stats[-1].queued_after > 0  # the tree was NOT exhausted


def test_engine_domain_page_budget(spark, site):
    """Per-domain page budget (beyond upstream — the Heritrix
    maxDocsPerHost analog): once a slot's cumulative pops reach the
    budget, its remaining frontier rows are dropped like robots denials
    (counted, deleted, crawl terminates) instead of starving forever.
    Epoch-granularity enforcement may overshoot by one epoch's pops."""
    import pandas as pd

    cfg = CrawlConfig(
        fetch_backend="http",
        epoch_budget=2,
        max_epochs=30,
        depth_limit=8,
        queue_order="fifo",
        robotstxt_obey=False,
        download_timeout_s=10.0,
        domain_page_budget=3,
        deny_url_patterns=(r"/img/", r"/blocked/"),
    )
    store = MemoryStore(spark)
    eng = _bare_engine(spark, cfg, store)
    eng.bootstrap(
        pd.DataFrame({"url": [f"{site}/p/0"], "priority": [0]}),
        pd.DataFrame({"slot": ["127.0.0.1"], "delay_ms": [0], "concurrency": [8]}),
    )
    stats = eng.run()
    total_popped = sum(s.popped for s in stats)
    # seed epoch pops 1, next epoch pops 2 (cumulative 3 = budget),
    # third epoch sees the exhausted slot and drops the rest — never
    # the full 12-page tree
    assert total_popped == 3
    assert stats[-1].queued_after == 0  # terminated, not starved
    m = store.read("metrics").toPandas()
    agg = m[m.partition_id == -1].groupby("key")["value"].sum().to_dict()
    assert agg.get("domain_budget/dropped", 0) > 0
    # the drops are visible in the conservation stats as denied rows
    assert sum(s.denied for s in stats) == agg["domain_budget/dropped"]


@pytest.mark.parametrize("fail_on_dataloss", [True, False])
def test_engine_http_dataloss_semantics(spark, site, fail_on_dataloss):
    """DOWNLOAD_FAIL_ON_DATALOSS: a maxsize-truncated body retries like a
    transport error (default True); with the flag off the partial
    response passes through as a normal 200."""
    import pandas as pd

    cfg = CrawlConfig(
        fetch_backend="http",
        epoch_budget=8,
        max_epochs=10,
        retry_times=2,
        queue_order="fifo",
        robotstxt_obey=False,
        download_timeout_s=10.0,
        download_maxsize=1024,
        download_fail_on_dataloss=fail_on_dataloss,
    )
    store = MemoryStore(spark)
    eng = CrawlEngine(
        spark, cfg, store,
        url_map=spark.createDataFrame([], "url_canon string, image_id string"),
        graph=spark.createDataFrame([], "src_canon string, dst_url string"),
        robots=spark.createDataFrame([], "domain string, rules string"),
    )
    eng.bootstrap(
        pd.DataFrame({"url": [f"{site}/big/0"], "priority": [0]}),
        pd.DataFrame({"slot": ["127.0.0.1"], "delay_ms": [0], "concurrency": [4]}),
    )
    eng.run()
    m = store.read("metrics").toPandas()
    agg = m[m.partition_id == -1].groupby("key")["value"].sum().to_dict()
    if fail_on_dataloss:
        # 1 + 2 retries, all truncated → terminal failure, never "done"
        assert agg.get("retry/count", 0) == 2
        assert agg.get("item_scraped_count", 0) == 0
    else:
        assert agg.get("retry/count", 0) == 0
        assert agg.get("item_scraped_count", 0) == 1  # partial body passed


# ------------------------------------------------ image+caption harvest
N_IMGS = 6


class _CaptionSite(http.server.BaseHTTPRequestHandler):
    """Pages embed LOSSY images via <img src alt>: the harvest mode the
    input_hint contracts — alt text becomes the persisted caption, the
    decoded payload must clear PSNR ≥ 40 dB vs the pristine source."""

    def log_message(self, *a):
        pass

    def do_GET(self):
        if self.path.startswith("/p/"):
            i = int(self.path.rsplit("/", 1)[1])
            nxt = f'<a href="/p/{i + 1}">next</a>' if i + 1 < N_IMGS else ""
            body = (
                f"<html><body>{nxt}"
                f'<img src="/img/{i}" alt="  caption   {i} &amp; co ">'
                "</body></html>"
            ).encode()
            ctype = "text/html; charset=utf-8"
        elif self.path.startswith("/img/"):
            i = int(self.path.rsplit("/", 1)[1])
            body = encode_image(synth_image(f"cap{i}"), "qrgb")  # lossy
            ctype = "application/octet-stream"
        else:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def test_engine_harvests_image_caption_pairs_lossy_psnr(spark):
    import math

    import pandas as pd

    from scrapy_spark.operators.images import validate_payload

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _CaptionSite)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    site = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        cfg = CrawlConfig(
            fetch_backend="http",
            robotstxt_obey=False,
            extract_img_links=True,
            epoch_budget=64,
            max_epochs=20,
            depth_limit=2 * N_IMGS,
            depth_priority=1,
            queue_order="fifo",
            download_timeout_s=10.0,
        )
        store = MemoryStore(spark)
        eng = CrawlEngine(
            spark, cfg, store,
            url_map=spark.createDataFrame([], "url_canon string, image_id string"),
            graph=spark.createDataFrame([], "src_canon string, dst_url string"),
            robots=spark.createDataFrame([], "domain string, rules string"),
        )
        eng.bootstrap(
            pd.DataFrame({"url": [f"{site}/p/0"], "priority": [0]}),
            pd.DataFrame(
                {"slot": ["127.0.0.1"], "delay_ms": [0], "concurrency": [8]}
            ),
        )
        eng.run()
    finally:
        srv.shutdown()

    items = store.read("items").toPandas()
    assert len(items) == N_IMGS
    # captions: alt text, whitespace-collapsed, entity-decoded
    got_caps = {
        int(r.image_id.rsplit("/", 1)[1]): r.caption
        for r in items.itertuples()
    }
    assert got_caps == {i: f"caption {i} & co" for i in range(N_IMGS)}

    # per-row invariant vs the pristine reference: lossy payloads decode
    # to PSNR ≥ 40 dB, captions match exactly (input_hint contract)
    ref = spark.createDataFrame(
        [
            (
                f"{site}/img/{i}",
                bytearray(encode_image(synth_image(f"cap{i}"), "rawrgb")),
                "qrgb",
                f"caption {i} & co",
            )
            for i in range(N_IMGS)
        ],
        "image_id string, bytes binary, fmt string, caption string",
    )
    verdict = validate_payload(
        store.read("items"), ref, psnr_floor_db=40.0
    ).toPandas()
    assert len(verdict) == N_IMGS
    assert verdict.payload_ok.all()
    assert verdict.caption_ok.all()
    # the lossy codec is actually lossy: PSNR finite (not bit-exact inf)
    assert all(
        p is not None and not math.isinf(p) and p >= 40.0
        for p in verdict.psnr_db
    )
    assert not verdict.bit_exact.any()
