"""Structured-Streaming monitor over the store's fetch_log (SURVEY §2.8
ST7/A2): the streaming windowed counts must equal the same aggregation
run as a batch query over the committed table."""

import pytest
from pyspark.sql import functions as F

from scrapy_spark.config import CrawlConfig
from scrapy_spark.sources.fixtures import gen_crawl_fixture
from scrapy_spark.sources.store import ParquetStore
from scrapy_spark.streaming.engine import CrawlEngine
from scrapy_spark.streaming.monitor import run_monitor_once

WINDOW_MS = 5_000


@pytest.fixture(scope="module")
def crawled_store(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("monitor_store")
    fix = gen_crawl_fixture("tiny", seed=42, with_payload=False)
    fix.politeness["concurrency"] = 8
    cfg = CrawlConfig(
        epoch_budget=128,
        max_epochs=6,
        allowed_domains=("example",),
        depth_limit=2,
        depth_priority=1,
        queue_order="fifo",
        epoch_quantum_ms=4000,
    )
    store = ParquetStore(spark, str(root))
    CrawlEngine.from_fixture(spark, cfg, store, fix).run(max_epochs=6)
    return store, str(root)


def test_streaming_counts_match_batch(crawled_store, spark):
    store, root = crawled_store
    got = run_monitor_once(spark, root, table_name="t_rates", window_ms=WINDOW_MS)

    batch = store.read("fetch_log")
    expected = (
        batch.withColumn("event_ts", F.timestamp_millis(F.col("fetched_at")))
        .groupBy(F.window("event_ts", f"{WINDOW_MS // 1000} seconds").alias("win"), "slot")
        .agg(
            F.count(F.lit(1)).alias("fetches"),
            F.sum(F.when(F.col("status") == 200, 1).otherwise(0)).alias("ok"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "slot",
            "fetches",
            "ok",
        )
    )
    g = {
        (r["window_start"], r["slot"]): (r["fetches"], r["ok"])
        for r in got.collect()
    }
    e = {
        (r["window_start"], r["slot"]): (r["fetches"], r["ok"])
        for r in expected.collect()
    }
    assert len(e) > 2  # several windows × slots actually exist
    assert g == e


def test_monitor_sees_new_epochs_on_redrive(crawled_store, spark):
    """availableNow drains everything committed at start time — a second
    drive over the same store is idempotent (same totals)."""
    store, root = crawled_store
    again = run_monitor_once(spark, root, table_name="t_rates2", window_ms=WINDOW_MS)
    total = again.agg(F.sum("fetches")).collect()[0][0]
    assert total == store.read("fetch_log").count()
