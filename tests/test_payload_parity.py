"""T4 payload parity end-to-end (SURVEY §5.2-T4, §2.3 J8; input_hint:
decoded-pixel PSNR ≥ 40 dB for lossy, bit-exact lossless, caption
equality — checked per row against the reference corpus)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from scrapy_spark.config import CrawlConfig
from scrapy_spark.functions.imaging import encode_image, synth_image
from scrapy_spark.operators.images import (
    min_size_filter,
    validate_payload,
    with_thumbnails,
)
from scrapy_spark.plans import schemas
from scrapy_spark.sources.fixtures import gen_crawl_fixture
from scrapy_spark.sources.store import MemoryStore
from scrapy_spark.streaming.engine import CrawlEngine


@pytest.fixture(scope="module")
def crawl_items(spark):
    fix = gen_crawl_fixture("tiny", seed=42, with_payload=True)
    cfg = CrawlConfig(
        epoch_budget=128,
        max_epochs=8,
        allowed_domains=("example",),
        depth_limit=2,
        depth_priority=1,
        queue_order="fifo",
    )
    store = MemoryStore(spark)
    CrawlEngine.from_fixture(spark, cfg, store, fix).run(max_epochs=8)
    corpus = spark.createDataFrame(fix.corpus, schema=schemas.CORPUS)
    return store.read("items"), corpus


def test_every_crawled_item_passes_payload_parity(crawl_items):
    items, corpus = crawl_items
    assert items is not None and items.count() > 0
    verdict = validate_payload(items, corpus)
    n = verdict.count()
    n_ok = verdict.filter("payload_ok").count()
    assert n_ok == n, verdict.filter(~F.col("payload_ok")).limit(5).collect()
    # both format classes must actually be exercised
    fmts = {r["ref_fmt"] for r in verdict.select("ref_fmt").distinct().collect()}
    assert "rawrgb" in fmts and "qrgb" in fmts


def test_validate_detects_corruption(spark, crawl_items):
    """A tampered payload or caption must fail the respective gate."""
    items, corpus = crawl_items
    one = items.limit(1)
    bad_bytes = one.withColumn(
        "bytes", F.concat(F.col("bytes"), F.lit(b"\x00\x01"))
    )
    bad_caption = one.withColumn("caption", F.lit("wrong caption"))
    assert validate_payload(bad_caption, corpus).filter("payload_ok").count() == 0
    v = validate_payload(bad_bytes, corpus).collect()[0]
    assert not v["payload_ok"]


def test_min_size_and_thumbs(spark):
    arrs = {
        "big": synth_image("img0000000001", min_px=32, max_px=32),
        "small": synth_image("img0000000002", min_px=8, max_px=8),
    }
    rows = [
        (k, encode_image(a, "rawrgb"), a.shape[1], a.shape[0])
        for k, a in arrs.items()
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, w int, h int")
    kept = min_size_filter(df, min_w=16, min_h=16)
    assert [r["image_id"] for r in kept.collect()] == ["big"]

    thumbed = with_thumbnails(df, {"s": 16}).collect()
    from scrapy_spark.functions.imaging import decode_image

    for r in thumbed:
        arr, fmt = decode_image(bytes(r["thumb_s"]))
        assert max(arr.shape[:2]) <= 16
        assert fmt == "rawrgb"
        # small image (8px) must not be upscaled
        if r["image_id"] == "small":
            assert arr.shape[:2] == (8, 8)
