"""T3 crawl-semantics parity: the Spark engine must reproduce the pure-Python
discrete-event simulator bit-for-bit (SURVEY §5.2-T3; stands in for the
reference crawler per SURVEY §0). Asserts the north_star's parity surface:
identical pop order, identical final url_seen set, identical per-slot fetch
timelines in virtual time, matching metrics."""

import pandas as pd
import pytest

from scrapy_spark.config import CrawlConfig
from scrapy_spark.simulator import CrawlSimulator, pop_order_frame
from scrapy_spark.sources.fixtures import gen_crawl_fixture
from scrapy_spark.sources.store import MemoryStore
from scrapy_spark.streaming.engine import CrawlEngine


def relaxed_fixture():
    fix = gen_crawl_fixture("tiny", seed=42, with_payload=False)
    fix.politeness["concurrency"] = 8
    fix.politeness.loc[fix.politeness["delay_ms"] > 500, "delay_ms"] = 500
    return fix


FAST_CFG = dict(
    epoch_budget=256,
    max_epochs=100,
    allowed_domains=("example",),
    depth_limit=3,
    depth_priority=1,
    queue_order="fifo",
    epoch_quantum_ms=4000,
)


def run_both(spark, fix, cfg, max_epochs=None):
    sim = CrawlSimulator(fix, cfg).run()
    store = MemoryStore(spark)
    eng = CrawlEngine.from_fixture(spark, cfg, store, fix)
    eng.run(max_epochs=max_epochs)
    return sim, eng, store


def spark_pop_order(store) -> pd.DataFrame:
    df = store.read("pop_log").toPandas()
    df["fp_hex"] = df["fp"].apply(lambda b: bytes(b).hex())
    return (
        df[["epoch", "rank", "fp_hex", "url_canon", "slot"]]
        .sort_values(["epoch", "rank"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def parity_run(spark):
    fix = relaxed_fixture()
    cfg = CrawlConfig(**FAST_CFG)
    return fix, cfg, *run_both(spark, fix, cfg)


def test_pop_order_parity(parity_run):
    fix, cfg, sim, eng, store = parity_run
    expected = pop_order_frame(sim).sort_values(["epoch", "rank"]).reset_index(drop=True)
    got = spark_pop_order(store)
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)


def test_url_seen_parity(parity_run):
    fix, cfg, sim, eng, store = parity_run
    got = {bytes(r.fp).hex() for r in store.read("url_seen").select("fp").collect()}
    assert got == sim.url_seen


def test_timeline_parity(parity_run):
    fix, cfg, sim, eng, store = parity_run
    log = store.read("fetch_log").toPandas()
    log["fp_hex"] = log["fp"].apply(lambda b: bytes(b).hex())
    got = {
        slot: sorted(zip(g["fetched_at"], g["fp_hex"]))
        for slot, g in log.groupby("slot")
    }
    expected = {slot: sorted(t) for slot, t in sim.timeline.items()}
    assert got == expected


def test_metrics_parity(parity_run):
    fix, cfg, sim, eng, store = parity_run
    m = store.read("metrics").toPandas()
    got = m[m.partition_id == -1].groupby("key")["value"].sum().to_dict()
    for key, val in sim.metrics.items():
        assert got.get(key, 0.0) == pytest.approx(val), key


def test_redirects_exercised_and_match(parity_run):
    """J7 (ref redirect.py ≈L70): the fixture's 301 aliases must actually
    fire — guard against the semantics silently no-opping — and the engine
    count must equal the simulator's (also covered by metrics parity)."""
    fix, cfg, sim, eng, store = parity_run
    assert len(fix.redirects) > 0
    assert sim.metrics.get("redirect/count", 0) > 0
    m = store.read("metrics").toPandas()
    got = m[(m.partition_id == -1) & (m.key == "redirect/count")]["value"].sum()
    assert got == sim.metrics["redirect/count"]


def test_both_terminate_with_empty_frontier(parity_run):
    fix, cfg, sim, eng, store = parity_run
    assert store.read("frontier").count() == 0
    assert eng.stats_log[-1].queued_after == 0
    assert eng.stats_log[-1].epoch + 1 == sim.epochs_run


def test_allow_deny_link_patterns_parity(spark):
    """F8 LxmlLinkExtractor allow/deny URL regexes (ref: linkextractors/
    lxmlhtml.py::_link_allowed ≈L90): allow drops the /r/ redirect aliases,
    deny drops a /p/7* slice — pop order AND the allow//deny drop metrics
    must match the simulator exactly, and both filters must actually fire."""
    fix = relaxed_fixture()
    cfg = CrawlConfig(
        **{
            **FAST_CFG,
            "allow_url_patterns": (r"/p/", r"file\.zip"),
            "deny_url_patterns": (r"/p/7",),
        }
    )
    sim, eng, store = run_both(spark, fix, cfg)
    assert sim.metrics.get("allow/filtered", 0) > 0
    assert sim.metrics.get("deny/filtered", 0) > 0
    expected = pop_order_frame(sim).sort_values(["epoch", "rank"]).reset_index(drop=True)
    got = spark_pop_order(store)
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)
    m = store.read("metrics").toPandas()
    agg = m[m.partition_id == -1].groupby("key")["value"].sum().to_dict()
    assert agg.get("allow/filtered", 0) == sim.metrics["allow/filtered"]
    assert agg.get("deny/filtered", 0) == sim.metrics["deny/filtered"]


def test_full_politeness_parity_prefix(spark):
    """Original (strict) politeness table, LIFO + downloader-aware, crawl
    capped by page count — validates the politeness watermark + queue-order
    semantics on the harder config."""
    fix = gen_crawl_fixture("tiny", seed=42, with_payload=False)
    cfg = CrawlConfig(
        epoch_budget=64,
        max_epochs=30,
        allowed_domains=("example",),
        depth_limit=3,
        depth_priority=0,
        queue_order="lifo",
        epoch_quantum_ms=1000,
        close_pagecount=120,
    )
    sim, eng, store = run_both(spark, fix, cfg, max_epochs=30)
    n_epochs = min(sim.epochs_run, eng.stats_log[-1].epoch + 1)
    expected = pop_order_frame(sim)
    expected = (
        expected[expected["epoch"] < n_epochs]
        .sort_values(["epoch", "rank"])
        .reset_index(drop=True)
    )
    got = spark_pop_order(store)
    got = got[got["epoch"] < n_epochs].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)
