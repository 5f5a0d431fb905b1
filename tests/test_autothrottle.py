"""AutoThrottle (SURVEY §2.4 A6; ref: scrapy/extensions/throttle.py::
AutoThrottle._adjust_delay ≈L55): ``delay ← (delay + latency/target)/2``
clamped to [DOWNLOAD_DELAY, AUTOTHROTTLE_MAX_DELAY]; only non-error
responses may shrink the delay; delay growth applies regardless."""

import pytest
from pyspark.sql import functions as F

from scrapy_spark.config import CrawlConfig
from scrapy_spark.operators.politeness import autothrottle


@pytest.fixture()
def dom(spark):
    return spark.createDataFrame(
        [
            ("a", 0, 1000, 8, None, None),  # slow responses → delay grows
            ("b", 0, 1000, 8, None, None),  # fast responses → delay shrinks
            ("c", 0, 1000, 8, None, None),  # errors only → must NOT shrink
            ("d", 0, 1000, 8, None, None),  # no traffic → unchanged
        ],
        "slot string, next_free_at long, delay_ms long, concurrency int,"
        "latency_ema double, robots_epoch int",
    )


def test_adjust_delay_formula_and_clamps(spark, dom):
    lat = spark.createDataFrame(
        [
            ("a", 9000.0, 3),  # (1000 + 9000)/2 = 5000 → grow
            ("b", 100.0, 3),  # (1000 + 100)/2 = 550 → shrink (has OKs)
            ("c", 100.0, 0),  # would shrink but 0 OKs → stays 1000
        ],
        "slot string, avg_latency_ms double, ok_count long",
    )
    cfg = CrawlConfig(download_delay_ms=200)
    out = {r["slot"]: r for r in autothrottle(dom, lat, cfg).collect()}
    assert out["a"]["delay_ms"] == 5000
    assert out["b"]["delay_ms"] == 550
    assert out["c"]["delay_ms"] == 1000  # error-only traffic never shrinks
    assert out["d"]["delay_ms"] == 1000  # untouched slot keeps state
    assert out["a"]["latency_ema"] == 9000.0  # first sample seeds the EMA


def test_clamped_to_floor_and_ceiling(spark, dom):
    lat = spark.createDataFrame(
        [("a", 10_000_000.0, 1), ("b", 0.0, 1)],
        "slot string, avg_latency_ms double, ok_count long",
    )
    cfg = CrawlConfig(download_delay_ms=400)
    out = {
        r["slot"]: r
        for r in autothrottle(dom, lat, cfg, max_delay_ms=8000).collect()
    }
    assert out["a"]["delay_ms"] == 8000  # AUTOTHROTTLE_MAX_DELAY ceiling
    assert out["b"]["delay_ms"] == 500  # (1000+0)/2, above the 400 floor


def test_engine_flag_changes_delays(spark):
    """autothrottle_enabled=True must actually move domain_state.delay_ms
    off the fixture values during a run (wiring check)."""
    from scrapy_spark.sources.fixtures import gen_crawl_fixture
    from scrapy_spark.sources.store import MemoryStore
    from scrapy_spark.streaming.engine import CrawlEngine

    fix = gen_crawl_fixture("tiny", seed=5, with_payload=False)
    fix.politeness["delay_ms"] = 1000
    cfg = CrawlConfig(
        epoch_budget=64,
        max_epochs=3,
        allowed_domains=("example",),
        depth_limit=2,
        queue_order="fifo",
        autothrottle_enabled=True,
    )
    store = MemoryStore(spark)
    CrawlEngine.from_fixture(spark, cfg, store, fix).run(max_epochs=3)
    delays = {
        r["slot"]: r["delay_ms"] for r in store.read("domain_state").collect()
    }
    assert any(v != 1000 for v in delays.values())
