"""Fixture determinism + simulator sanity (pre-Spark parity groundwork)."""

from scrapy_spark.config import CrawlConfig
from scrapy_spark.simulator import CrawlSimulator
from scrapy_spark.sources.fixtures import gen_crawl_fixture


def make_cfg(**kw) -> CrawlConfig:
    base = dict(
        epoch_budget=64,
        max_epochs=200,
        allowed_domains=("example",),
        depth_limit=4,
        depth_priority=1,  # BFS
        queue_order="fifo",
    )
    base.update(kw)
    return CrawlConfig(**base)


def test_fixture_deterministic():
    a = gen_crawl_fixture("tiny", seed=42)
    b = gen_crawl_fixture("tiny", seed=42)
    assert a.seeds.equals(b.seeds)
    assert a.graph.equals(b.graph)
    assert a.robots.equals(b.robots)
    assert a.corpus is not None and a.corpus["bytes"].equals(b.corpus["bytes"])
    c = gen_crawl_fixture("tiny", seed=7)
    assert not a.graph.equals(c.graph)


def test_fixture_injects_filter_cases():
    fix = gen_crawl_fixture("tiny", seed=42)
    dst = fix.graph["dst_url"]
    assert dst.str.contains(".external/").any()  # offsite
    assert (dst.str.len() > 2083).any()  # overlong
    assert dst.str.endswith(".zip").any()  # denied ext
    assert dst.str.contains("#frag").any()  # canon twin
    assert dst.str.startswith("HTTP://").any()  # canon twin (scheme case)


def test_simulator_runs_and_converges():
    fix = gen_crawl_fixture("tiny", seed=42)
    res = CrawlSimulator(fix, make_cfg()).run()
    assert res.epochs_run > 2
    assert len(res.pop_order) > 50
    assert res.metrics["item_scraped_count"] > 0
    assert res.metrics["dupefilter/filtered"] > 0
    assert res.metrics["offsite/filtered"] > 0
    assert res.metrics["urllength/filtered"] > 0
    assert res.metrics["ext/filtered"] > 0
    assert res.metrics["robotstxt/forbidden"] >= 0
    # every popped fp is unique per (fp, retries) but retried fps repeat:
    fps = [p[2] for p in res.pop_order]
    assert len(set(fps)) <= len(fps)


def test_simulator_deterministic():
    fix = gen_crawl_fixture("tiny", seed=42)
    r1 = CrawlSimulator(fix, make_cfg()).run()
    r2 = CrawlSimulator(fix, make_cfg()).run()
    assert r1.pop_order == r2.pop_order
    assert r1.url_seen == r2.url_seen
    assert r1.timeline == r2.timeline


def test_simulator_depth_priority_changes_order():
    fix = gen_crawl_fixture("tiny", seed=42)
    bfs = CrawlSimulator(fix, make_cfg(depth_priority=1)).run()
    dfs = CrawlSimulator(fix, make_cfg(depth_priority=-1)).run()
    assert bfs.pop_order != dfs.pop_order


def test_simulator_politeness_blocks_hot_domain():
    """A slot with delay d and k pops must not pop again before ts + k*d."""
    fix = gen_crawl_fixture("tiny", seed=42)
    cfg = make_cfg()
    res = CrawlSimulator(fix, cfg).run()
    delay = dict(zip(fix.politeness["slot"], fix.politeness["delay_ms"]))
    pops_by_slot_epoch: dict[str, list[int]] = {}
    for epoch, _, _, _, slot in res.pop_order:
        pops_by_slot_epoch.setdefault(slot, []).append(epoch)
    q = cfg.epoch_quantum_ms
    for slot, epochs in pops_by_slot_epoch.items():
        d = int(delay.get(slot, 0))
        if d == 0:
            continue
        # group consecutive: after an epoch with k pops, next pop epoch must
        # satisfy ts(next) >= ts(e) + k*d
        from collections import Counter

        cnt = Counter(epochs)
        es = sorted(cnt)
        for a, b in zip(es, es[1:]):
            assert b * q >= a * q + cnt[a] * d, (slot, a, b, cnt[a], d)


def test_simulator_robots_disallow_all_never_fetched():
    fix = gen_crawl_fixture("tiny", seed=42)
    blocked = set(
        fix.robots.loc[
            fix.robots["rules"].fillna("").str.contains(r"Disallow: /\n"), "domain"
        ]
    )
    res = CrawlSimulator(fix, make_cfg()).run()
    if blocked:
        for _, _, _, _, slot in res.pop_order:
            assert slot not in blocked
