"""C4/F7 meta escape hatches through the engine: meta['download_slot']
overrides the politeness slot (get_slot_key ≈L105) for seeds AND across
redirect hops; meta['handle_httpstatus_list'] turns a listed status into
a normal spider-visible response (httperror.py ≈L40) instead of a
failure."""

from __future__ import annotations

import json

import pandas as pd
import pytest

from scrapy_spark.config import CrawlConfig
from scrapy_spark.sources.fixtures import CrawlFixture
from scrapy_spark.sources.store import MemoryStore
from scrapy_spark.streaming.engine import CrawlEngine

A, B = "a.example.com", "b.example.com"
SLOT_META = json.dumps({"download_slot": "joint"})


def _fixture(redirects=None, url_map_urls=None):
    urls = url_map_urls if url_map_urls is not None else [
        f"https://{A}/page/1",
        f"https://{B}/page/1",
    ]
    return CrawlFixture(
        seeds=pd.DataFrame(
            {
                "url": [f"https://{A}/page/1", f"https://{B}/page/1"],
                "priority": [0, 0],
                "meta_json": [SLOT_META, SLOT_META],
            }
        ),
        graph=pd.DataFrame(
            {"src_canon": ["https://unused.invalid/"],
             "dst_url": ["https://unused.invalid/x"]}
        ),
        url_map=pd.DataFrame(
            {"url_canon": urls, "image_id": [f"img-{i}" for i in range(len(urls))]}
        ),
        redirects=redirects
        if redirects is not None
        else pd.DataFrame({"src_canon": ["https://unused.invalid/r"],
                           "dst_url": ["https://unused.invalid/t"]}),
        robots=pd.DataFrame({"domain": [A, B], "rules": ["", ""],
                             "status": ["OK", "OK"]}),
        politeness=pd.DataFrame(
            {"slot": ["joint"], "delay_ms": [0], "concurrency": [1]}
        ),
        corpus=None,
        scale="unit",
        seed=0,
    )


_CFG = dict(
    robotstxt_obey=False,
    epoch_budget=16,
    queue_order="fifo",
    bloom_enabled=False,
)


def test_download_slot_meta_merges_two_domains_into_one_slot(spark):
    store = MemoryStore(spark)
    eng = CrawlEngine.from_fixture(
        spark, CrawlConfig(**_CFG), store, _fixture()
    )
    frontier = store.read("frontier").toPandas()
    assert set(frontier.slot) == {"joint"}  # both domains share the slot
    assert set(frontier.domain) == {A, B}  # domain itself is untouched
    eng.run(max_epochs=4)
    pops = store.read("pop_log").toPandas()
    # concurrency=1 on the shared slot: the two seeds CANNOT pop in the
    # same epoch — the override actually throttles them jointly
    assert len(pops) == 2
    assert pops.epoch.nunique() == 2
    assert set(pops.slot) == {"joint"}


def test_download_slot_survives_redirect_hop(spark):
    alias, target = f"https://{A}/r/1", f"https://{A}/page/9"
    fix = _fixture(
        redirects=pd.DataFrame({"src_canon": [alias], "dst_url": [target]}),
        url_map_urls=[f"https://{B}/page/1", target],
    )
    fix.seeds = pd.DataFrame(
        {"url": [alias], "priority": [0], "meta_json": [SLOT_META]}
    )
    store = MemoryStore(spark)
    eng = CrawlEngine.from_fixture(spark, CrawlConfig(**_CFG), store, fix)
    eng.run(max_epochs=1)
    child = store.read("frontier").toPandas()
    assert len(child) == 1 and child.url.iloc[0] == target
    assert child.slot.iloc[0] == "joint"  # meta_slot survived the hop
    meta = json.loads(child.meta_json.iloc[0])
    assert meta["download_slot"] == "joint"
    assert json.loads(meta["redirect_urls"]) == [alias]


def _url_with_synthetic_503():
    """Scan deterministic URLs for one whose fingerprint first byte < 5 —
    the synthetic fetcher's 503 rule (fixtures.fetch_status_for_fp)."""
    from scrapy_spark.functions.fingerprint import fingerprint

    for i in range(4000):
        url = f"https://{A}/page/{i}"
        if fingerprint(url)[0] < 5:
            return url
    raise AssertionError("no 503 URL found in 4000 candidates")


@pytest.mark.parametrize(
    "meta,expect_attempts,expect_done",
    [
        # no escape hatch: 503 retries, exhausts, fails
        (None, 2, 0),
        # handled 503: upstream RetryMiddleware has NO handle_httpstatus
        # early-out — it still retries first; the handled response is
        # delivered to the spider only when retries exhaust (ADVICE r3)
        (json.dumps({"handle_httpstatus_list": json.dumps(["503"])}), 2, 1),
        # dont_retry + handled: delivered immediately, single fetch
        (
            json.dumps(
                {
                    "handle_httpstatus_list": json.dumps(["503"]),
                    "dont_retry": "true",
                }
            ),
            1,
            1,
        ),
    ],
)
def test_handled_503_retries_before_delivery(spark, meta, expect_attempts, expect_done):
    url = _url_with_synthetic_503()
    fix = _fixture(url_map_urls=[url])
    fix.seeds = pd.DataFrame(
        {"url": [url], "priority": [0], "meta_json": [meta]}
    )
    fix.politeness = pd.DataFrame(
        {"slot": [A], "delay_ms": [0], "concurrency": [4]}
    )
    store = MemoryStore(spark)
    cfg = CrawlConfig(retry_times=1, **_CFG)
    eng = CrawlEngine.from_fixture(spark, cfg, store, fix)
    eng.run(max_epochs=4)
    log = store.read("fetch_log").toPandas()
    assert list(log.status) == [503] * expect_attempts
    m = store.read("metrics").toPandas()
    done = m[(m.partition_id == -1) & (m.key == "item_scraped_count")]["value"].sum()
    assert done == expect_done


@pytest.mark.parametrize(
    "meta,expect_done",
    [
        (None, 0),
        (json.dumps({"handle_httpstatus_list": json.dumps(["404"])}), 1),
        (json.dumps({"handle_httpstatus_all": "true"}), 1),
    ],
)
def test_handle_httpstatus_meta_gates_error_filter(spark, meta, expect_done):
    # a URL absent from url_map fetches as a synthetic 404: normally a
    # terminal failure, but a listed/handled status classifies as done
    fix = _fixture()
    fix.seeds = pd.DataFrame(
        {"url": [f"https://{A}/missing"], "priority": [0], "meta_json": [meta]}
    )
    fix.politeness = pd.DataFrame(
        {"slot": [A], "delay_ms": [0], "concurrency": [4]}
    )
    store = MemoryStore(spark)
    eng = CrawlEngine.from_fixture(spark, CrawlConfig(**_CFG), store, fix)
    eng.run(max_epochs=2)
    log = store.read("fetch_log").toPandas()
    assert list(log.status) == [404]  # fetched either way
    m = store.read("metrics").toPandas()
    done = m[(m.partition_id == -1) & (m.key == "item_scraped_count")]["value"].sum()
    assert done == expect_done
