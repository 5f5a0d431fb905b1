"""Domains discovered AFTER bootstrap (no politeness-table row) must
still crawl — with default politeness — and match the simulator.

Regression for the r5 review finding: both domain_state updates
(mark_robots_fetched, update_next_free) LEFT-join onto domain_state and
preserve its row set, so before the fix a post-bootstrap domain never
got a state row: its frontier rows waited on robots_epoch forever (the
frontier never drained) and, with the robots gate off, its pops never
wrote a politeness watermark. The simulator has always handled unknown
slots (default delay/concurrency, robots stamped via dict), so the
parity suite is the spec here."""

from __future__ import annotations

import pandas as pd

from scrapy_spark.config import CrawlConfig
from scrapy_spark.sources.fixtures import gen_crawl_fixture
from tests.test_engine_parity import run_both, spark_pop_order
from scrapy_spark.simulator import pop_order_frame


def _fixture_with_unknown_domains():
    """Drop the last two domains' politeness rows: their URLs are only
    reachable via links (seeds live on low-numbered domains), so the
    engine meets them with no domain_state row. Politeness is relaxed
    (same as the parity suite's relaxed_fixture) so the crawl drains in
    a test-sized number of epochs."""
    fix = gen_crawl_fixture("tiny", seed=42, with_payload=False)
    fix.politeness["concurrency"] = 8
    fix.politeness.loc[fix.politeness["delay_ms"] > 500, "delay_ms"] = 500
    known = sorted(fix.politeness["slot"])
    dropped = known[-2:]
    fix.politeness = fix.politeness[
        ~fix.politeness["slot"].isin(dropped)
    ].reset_index(drop=True)
    return fix, dropped


def test_unknown_domains_crawl_and_match_simulator(spark):
    fix, dropped = _fixture_with_unknown_domains()
    cfg = CrawlConfig(
        epoch_budget=256,
        max_epochs=40,
        allowed_domains=("example",),
        depth_limit=3,
        depth_priority=1,
        queue_order="fifo",
        epoch_quantum_ms=4000,
    )
    sim, eng, store = run_both(spark, fix, cfg, max_epochs=40)
    got = spark_pop_order(store)
    # the dropped domains actually got crawled (previously: stuck in
    # the robots wait forever, frontier never drained)
    popped_slots = set(got["slot"])
    assert any(d in popped_slots for d in dropped), (
        f"none of {dropped} ever popped"
    )
    # and the whole pop order still matches the simulator exactly —
    # including the default-delay politeness on the unknown slots
    n_epochs = min(sim.epochs_run, eng.stats_log[-1].epoch + 1)
    expected = pop_order_frame(sim)
    expected = (
        expected[expected["epoch"] < n_epochs]
        .sort_values(["epoch", "rank"])
        .reset_index(drop=True)
    )
    got = got[got["epoch"] < n_epochs].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)
    # frontier drained (nothing permanently stuck in 'waiting')
    assert eng.stats_log[-1].queued_after == 0


def test_unknown_domains_drain_without_robots_gate(spark):
    """robots off: the failure mode was no politeness watermark (the
    pops of an unknown slot were dropped by update_next_free's left
    join). Parity with the simulator pins the watermark timing."""
    fix, dropped = _fixture_with_unknown_domains()
    cfg = CrawlConfig(
        epoch_budget=256,
        max_epochs=40,
        allowed_domains=("example",),
        robotstxt_obey=False,
        depth_limit=3,
        depth_priority=1,
        queue_order="fifo",
        epoch_quantum_ms=4000,
    )
    sim, eng, store = run_both(spark, fix, cfg, max_epochs=40)
    got = spark_pop_order(store)
    assert any(d in set(got["slot"]) for d in dropped)
    n_epochs = min(sim.epochs_run, eng.stats_log[-1].epoch + 1)
    expected = pop_order_frame(sim)
    expected = (
        expected[expected["epoch"] < n_epochs]
        .sort_values(["epoch", "rank"])
        .reset_index(drop=True)
    )
    got = got[got["epoch"] < n_epochs].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)
