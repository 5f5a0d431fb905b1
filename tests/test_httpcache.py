"""HTTP-cache operator (SURVEY §2.1 S6 / §2.3 J6; ref:
extensions/httpcache.py — replay stored 200s by fingerprint before the
downloader, no politeness delay consumed)."""

import pytest
from pyspark.sql import functions as F

from scrapy_spark.operators.httpcache import split_cache_hits


@pytest.fixture()
def frames(spark):
    popped = spark.createDataFrame(
        [
            (b"\x01" * 20, "http://a.example/1", "a.example"),
            (b"\x02" * 20, "http://a.example/2", "a.example"),
            (b"\x03" * 20, "http://b.example/3", "b.example"),
        ],
        "fp binary, url_canon string, slot string",
    )
    fetch_log = spark.createDataFrame(
        [
            # fp1: cached 200 twice — the epoch-3 (latest) row must win
            (b"\x01" * 20, "imgOLD", 200, 1),
            (b"\x01" * 20, "imgNEW", 200, 3),
            # fp2: only a 503 stored — NOT a cache hit
            (b"\x02" * 20, None, 503, 2),
        ],
        "fp binary, image_id string, status int, epoch int",
    )
    return popped, fetch_log


def test_split_cache_hits(frames):
    popped, log = frames
    hits, misses = split_cache_hits(popped, log, epoch_ts=7000)
    got = {bytes(r["fp"])[0]: r for r in hits.collect()}
    assert set(got) == {1}  # only the stored 200 replays
    assert got[1]["image_id"] == "imgNEW"  # latest epoch wins
    assert got[1]["status"] == 200
    assert got[1]["latency_ms"] == 0  # short-circuits the downloader
    assert got[1]["fetched_at"] == 7000
    miss_fps = {bytes(r["fp"])[0] for r in misses.collect()}
    assert miss_fps == {2, 3}


def test_no_log_means_all_miss(frames, spark):
    popped, _ = frames
    hits, misses = split_cache_hits(popped, None, epoch_ts=0)
    assert hits is None
    assert misses.count() == 3


def test_engine_cache_off_is_inert(spark):
    """Default-off path: the epoch loop with httpcache_enabled=False must
    emit no httpcache/hit metric rows (value-0 rows are dropped)."""
    from scrapy_spark.config import CrawlConfig
    from scrapy_spark.sources.fixtures import gen_crawl_fixture
    from scrapy_spark.sources.store import MemoryStore
    from scrapy_spark.streaming.engine import CrawlEngine

    fix = gen_crawl_fixture("tiny", seed=7, with_payload=False)
    cfg = CrawlConfig(
        epoch_budget=64,
        max_epochs=4,
        allowed_domains=("example",),
        depth_limit=2,
        queue_order="fifo",
    )
    store = MemoryStore(spark)
    CrawlEngine.from_fixture(spark, cfg, store, fix).run(max_epochs=4)
    m = store.read("metrics").toPandas()
    assert not (m["key"] == "httpcache/hit").any()
