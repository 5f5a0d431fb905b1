"""applyInPandasWithState autothrottle (SURVEY §2.4 A6 streaming variant;
ref throttle.py ≈L55): the streaming trajectory must equal a driver-side
sequential fold of the same events, regardless of micro-batching."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from scrapy_spark.config import CrawlConfig
from scrapy_spark.sources.fixtures import gen_crawl_fixture
from scrapy_spark.sources.store import ParquetStore
from scrapy_spark.streaming.engine import CrawlEngine
from scrapy_spark.streaming.monitor import fetch_log_stream
from scrapy_spark.streaming.stateful import adjust_delay, streaming_autothrottle

INIT_DELAY = 500.0


@pytest.fixture(scope="module")
def crawled_root(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("throttle_store")
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


def reference_fold(log: pd.DataFrame) -> dict:
    """Driver-side sequential fold of the same state machine."""
    out = {}
    for slot, g in log.groupby("slot"):
        delay, ema = INIT_DELAY, None
        for epoch, ge in g.sort_values(["epoch", "fp"]).groupby("epoch", sort=True):
            avg = float(ge["latency_ms"].mean())
            ok = bool((ge["status"] == 200).any())
            delay = adjust_delay(delay, avg, ok, target=1.0, floor=0.0, cap=60_000.0)
            ema = avg if ema is None else (ema + avg) / 2.0
            out[(slot, int(epoch))] = (round(delay, 6), round(ema, 6), len(ge))
    return out


def test_stateful_trajectory_matches_sequential_fold(crawled_root, spark):
    store, root = crawled_root
    stream = fetch_log_stream(spark, root)
    traj = streaming_autothrottle(stream, initial_delay_ms=INIT_DELAY)
    q = (
        traj.writeStream.format("memory")
        .queryName("t_throttle")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["slot"], r["epoch"]): (
            round(r["delay_ms"], 6),
            round(r["latency_ema"], 6),
            r["n_events"],
        )
        for r in spark.table("t_throttle").collect()
    }
    log = store.read("fetch_log").toPandas()
    log["fp"] = log["fp"].map(lambda b: bytes(b))
    expected = reference_fold(log)
    assert len(expected) > 5
    assert got == expected


def test_adjust_delay_semantics():
    # growth applies even on error-only epochs; shrink requires a 200
    assert adjust_delay(100.0, 1000.0, False, target=1.0, floor=0.0, cap=60000.0) == 550.0
    assert adjust_delay(1000.0, 100.0, False, target=1.0, floor=0.0, cap=60000.0) == 1000.0
    assert adjust_delay(1000.0, 100.0, True, target=1.0, floor=0.0, cap=60000.0) == 550.0
    # clamps
    assert adjust_delay(100.0, 1e9, True, target=1.0, floor=0.0, cap=5000.0) == 5000.0
    assert adjust_delay(400.0, 0.0, True, target=1.0, floor=300.0, cap=5000.0) == 300.0
