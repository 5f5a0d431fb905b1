"""U2 user hook slots (ref: core/downloadermw.py ≈L20 — the
user-middleware positions of the downloader chain): a header-mutating
pre-fetch hook and a response-rewriting post-fetch hook installed
through ``CrawlConfig``, proven end-to-end against a live loopback
server — the mutated Referer arrives on the wire, and a 404 rewritten
to a 200 HTML page feeds the link pipeline like any real response."""

from __future__ import annotations

import http.server
import threading

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scrapy_spark.config import CrawlConfig
from scrapy_spark.sources.store import MemoryStore
from scrapy_spark.streaming.engine import CrawlEngine

HITS: dict[str, dict] = {}


class _Site(http.server.BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_GET(self):
        HITS[self.path] = dict(self.headers)
        if self.path == "/missing":
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        if self.path == "/start":
            body = b'<html><a href="/a">a</a><a href="/missing">m</a></html>'
        else:
            body = b"<html></html>"
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def site():
    HITS.clear()
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Site)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


@F.pandas_udf(T.StringType())
def _hook_referer(urls: pd.Series) -> pd.Series:
    return pd.Series(["https://hook.test/r"] * len(urls))


def _pre_hook(df):
    # process_request analog: overwrite the Referer the built-in
    # middleware computed (an Arrow pass, no driver loop)
    return df.withColumn("referer", _hook_referer(F.col("url")))


_REWRITE = b'<html><a href="/found">f</a></html>'


def _post_hook(df):
    # process_response analog: turn the 404 into a normal HTML page —
    # its links must flow through the pipeline like any fetched page
    is404 = F.col("status") == 404
    return (
        df.withColumn("body", F.when(is404, F.lit(_REWRITE)).otherwise(F.col("body")))
        .withColumn(
            "content_type",
            F.when(is404, F.lit("text/html; charset=utf-8")).otherwise(
                F.col("content_type")
            ),
        )
        .withColumn("status", F.when(is404, F.lit(200)).otherwise(F.col("status")))
    )


def test_hooks_mutate_headers_and_rewrite_responses(spark, site):
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
        pre_fetch_hook=_pre_hook,
        post_fetch_hook=_post_hook,
    )
    eng = CrawlEngine(
        spark,
        cfg,
        store,
        url_map=spark.createDataFrame([], "url_canon string, image_id string"),
        graph=spark.createDataFrame([], "src_canon string, dst_url string"),
        robots=spark.createDataFrame([], "domain string, rules string"),
    )
    eng.bootstrap(
        pd.DataFrame({"url": [f"{site}/start"], "priority": [0]}),
        pd.DataFrame({"slot": ["127.0.0.1"], "delay_ms": [0], "concurrency": [8]}),
    )
    eng.run()

    # pre-fetch hook: ITS Referer reached the wire, not the built-in one
    assert HITS["/a"].get("Referer") == "https://hook.test/r"
    assert HITS["/start"].get("Referer") == "https://hook.test/r"
    # post-fetch hook: the 404 became a done page whose injected link
    # was extracted, queued, and actually fetched the next epoch
    assert "/found" in HITS
    log = store.read("fetch_log").toPandas()
    missing = log[log.url_canon.str.endswith("/missing")]
    assert set(missing.status) == {200}  # rewritten before classification
