"""Sharded cuckoo filter (operators/cuckoo.py) — the deletable half of
the north_rule's "partitioned bloom-filter/cuckoo-filter structure".

Covers: no false negatives, FPR bound, per-key deletion, distributed
shard-owner build ≡ driver-side insertion (membership-wise), absorb,
distributed delete, and an engine crawl with seen_filter="cuckoo"
producing the same dedupe behavior as the bloom run.
"""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from scrapy_spark.operators.cuckoo import ShardedCuckoo, build_cuckoo_from_df


def _fps(tag: str, n: int) -> list[bytes]:
    return [hashlib.sha1(f"{tag}-{i}".encode()).digest() for i in range(n)]


def test_insert_probe_no_false_negatives_and_fpr():
    cf = ShardedCuckoo(capacity=50_000)
    seen = _fps("in", 20_000)
    cf.add_many(seen)
    assert cf.maybe_contains(seen).all()  # zero false negatives, ever
    other = _fps("out", 20_000)
    fpr = cf.maybe_contains(other).mean()
    # theory: 2 buckets × 4 slots × 2^-16 ≈ 1.2e-4; allow 5× slack
    assert fpr <= 6e-4, fpr


def test_delete_removes_only_target_keys():
    cf = ShardedCuckoo(capacity=10_000)
    keep = _fps("keep", 2_000)
    drop = _fps("drop", 2_000)
    cf.add_many(keep + drop)
    assert cf.delete_many(drop) == len(drop)
    assert cf.maybe_contains(keep).all()  # untouched keys still present
    # deleted keys now miss (up to the FPR — bound it, don't demand zero)
    assert cf.maybe_contains(drop).mean() <= 6e-4
    assert cf.n_added == len(keep)
    # delete of a never-added key is a no-op miss
    assert cf.delete_many(_fps("ghost", 100)) <= 100 * 6e-4 * 100 + 1


def test_kick_eviction_path_still_exact():
    """Overfill a tiny filter to force cuckoo kicks; membership holds."""
    cf = ShardedCuckoo(capacity=1_024, shards=2)
    fps = _fps("kick", 1_500)  # > nominal capacity but under bucket space
    cf.add_many(fps)
    assert cf.maybe_contains(fps).all()


def test_distributed_build_matches_driver_insertion(spark):
    fps = _fps("dist", 30_000)
    df = spark.createDataFrame([(f,) for f in fps], "fp binary").repartition(8)
    built = build_cuckoo_from_df(df, capacity=50_000)
    assert built.n_added == len(fps)
    assert built.maybe_contains(fps).all()
    # same membership answers as a driver-side build for probes both ways
    local = ShardedCuckoo(capacity=50_000)
    local.add_many(fps)
    probes = _fps("probe", 5_000)
    np.testing.assert_array_equal(
        built.maybe_contains(fps), local.maybe_contains(fps)
    )
    # FP sets may differ slot-wise but both respect the bound
    assert built.maybe_contains(probes).mean() <= 6e-4


def test_splice_high_load_hits_overflow_buckets():
    """The vectorized bucket-merge splice at ~85% combined load: over-full
    buckets must take the kick path, and membership must stay exact for
    every key from BOTH sides (no false negatives), with deletes still
    finding one stored copy per key afterwards."""
    a = ShardedCuckoo(capacity=100_000, shards=8)
    fa = _fps("sp-a", 50_000)
    a.add_many(fa)
    b = ShardedCuckoo(capacity=100_000, shards=8)
    fb = _fps("sp-b", 35_000)
    b.add_many(fb)
    # combined per-bucket occupancy must exceed SLOTS somewhere, or the
    # test isn't exercising the overflow/kick branch
    occ = np.count_nonzero(a.tags, axis=2) + np.count_nonzero(b.tags, axis=2)
    assert (occ > ShardedCuckoo.SLOTS).any()
    a._splice(b)
    assert a.n_added == len(fa) + len(fb)
    assert a.maybe_contains(fa).all()
    assert a.maybe_contains(fb).all()
    assert a.maybe_contains(_fps("sp-miss", 10_000)).mean() <= 6e-4
    assert a.delete_many(fb[:2_000]) == 2_000


def test_absorb_df_and_delete_df(spark):
    cf = ShardedCuckoo(capacity=50_000)
    first = _fps("a", 5_000)
    cf.add_many(first)
    second = _fps("b", 5_000)
    df = spark.createDataFrame([(f,) for f in second], "fp binary")
    assert cf.absorb_df(df) == len(second)
    assert cf.maybe_contains(first).all() and cf.maybe_contains(second).all()
    # distributed delete of the first batch
    ddf = spark.createDataFrame([(f,) for f in first], "fp binary")
    assert cf.delete_df(ddf) == len(first)
    assert cf.maybe_contains(second).all()
    assert cf.maybe_contains(first).mean() <= 6e-4


def test_probe_udf_matches_local(spark):
    cf = ShardedCuckoo(capacity=20_000)
    seen = _fps("udf", 5_000)
    cf.add_many(seen)
    mixed = seen[:1000] + _fps("miss", 1000)
    df = spark.createDataFrame([(f,) for f in mixed], "fp binary")
    got = [
        r.m
        for r in df.select(cf.probe_udf(spark)(F.col("fp")).alias("m"))
        .collect()
    ]
    np.testing.assert_array_equal(np.array(got), cf.maybe_contains(mixed))


def _tiny_engine(spark, **cfg_kw):
    from scrapy_spark.config import CrawlConfig
    from scrapy_spark.sources.fixtures import gen_crawl_fixture
    from scrapy_spark.sources.store import MemoryStore
    from scrapy_spark.streaming.engine import CrawlEngine

    fix = gen_crawl_fixture("tiny", seed=7, with_payload=False)
    cfg = CrawlConfig(
        epoch_budget=64,
        max_epochs=4,
        allowed_domains=("example",),
        depth_limit=3,
        **cfg_kw,
    )
    store = MemoryStore(spark)
    return CrawlEngine.from_fixture(spark, cfg, store, fix), store


def test_expire_seen_full_and_partial(spark):
    """Recrawl/expiry maintenance: expire_seen drops url_seen rows by
    epoch_added, the cuckoo filter deletes the same keys in place, and
    the dedupe path treats expired URLs as fresh again."""
    from scrapy_spark.operators.dedupe import anti_join_seen

    eng, store = _tiny_engine(spark, seen_filter="cuckoo")
    eng.run(max_epochs=4)
    seen = store.read("url_seen")
    fps = [bytes(r.fp) for r in seen.collect()]
    assert len(fps) > 0
    epochs = sorted({r.epoch_added for r in store.read("url_seen").collect()})
    assert len(epochs) >= 2, "fixture too small to test partial expiry"

    # partial expiry: only rows older than the cut go
    cut = epochs[1]
    n_old = store.read("url_seen").filter(f"epoch_added < {cut}").count()
    assert eng.expire_seen(cut) == n_old
    left = store.read("url_seen")
    assert left.filter(f"epoch_added < {cut}").count() == 0
    assert left.count() == len(fps) - n_old
    assert eng.bloom.n_added == len(fps) - n_old

    # full expiry: seen set empties, probes flip, candidates all fresh
    assert eng.expire_seen(10**9) == len(fps) - n_old
    assert store.read("url_seen").count() == 0
    assert eng.bloom.n_added == 0
    assert eng.bloom.maybe_contains(fps).mean() <= 6e-4
    cands = spark.createDataFrame([(f,) for f in fps], "fp binary")
    fresh = anti_join_seen(cands, store.read("url_seen"), eng.bloom)
    assert fresh.count() == len(fps)

    # idempotent on an empty set
    assert eng.expire_seen(10**9) == 0


def test_seen_ttl_config_bounds_url_seen_age(spark):
    """seen_ttl_epochs=N keeps only the last N epochs' fps in url_seen."""
    eng, store = _tiny_engine(spark, seen_filter="cuckoo", seen_ttl_epochs=2)
    stats = eng.run(max_epochs=4)
    last = stats[-1].epoch
    seen = store.read("url_seen")
    if seen.count():
        assert seen.agg({"epoch_added": "min"}).collect()[0][0] >= last - 1
    # bloom path: same TTL semantics via rebuild-from-retained
    eng2, store2 = _tiny_engine(spark, seen_filter="bloom", seen_ttl_epochs=2)
    stats2 = eng2.run(max_epochs=4)
    seen2 = store2.read("url_seen")
    if seen2.count():
        assert (
            seen2.agg({"epoch_added": "min"}).collect()[0][0]
            >= stats2[-1].epoch - 1
        )


@pytest.mark.parametrize("seen_filter", ["cuckoo"])
def test_engine_crawl_with_cuckoo_matches_bloom(spark, seen_filter):
    """Full engine run with the cuckoo prefilter: identical EpochStats to
    the bloom run (the prefilter can only skip exact-join work, never
    change results)."""
    from scrapy_spark.config import CrawlConfig
    from scrapy_spark.sources.fixtures import gen_crawl_fixture
    from scrapy_spark.sources.store import MemoryStore
    from scrapy_spark.streaming.engine import CrawlEngine

    def run(sf):
        fix = gen_crawl_fixture("tiny", seed=7, with_payload=False)
        cfg = CrawlConfig(
            epoch_budget=64,
            max_epochs=4,
            allowed_domains=("example",),
            depth_limit=3,
            seen_filter=sf,
        )
        store = MemoryStore(spark)
        stats = CrawlEngine.from_fixture(spark, cfg, store, fix).run(
            max_epochs=4
        )
        return [(s.epoch, s.popped, s.fresh, s.queued_after) for s in stats]

    assert run("cuckoo") == run("bloom")


def test_cuckoo_resume_and_expiry_on_parquet_store(spark, tmp_path):
    """Persistent-store lifecycle under seen_filter='cuckoo': a resumed
    engine rebuilds the cuckoo from the committed url_seen (distributed
    build path), keeps filtering dupes, and expiry survives a store
    reopen (url_seen MOR deltas are durable)."""
    from scrapy_spark.config import CrawlConfig
    from scrapy_spark.sources.fixtures import gen_crawl_fixture
    from scrapy_spark.sources.store import ParquetStore
    from scrapy_spark.streaming.engine import CrawlEngine

    fix = gen_crawl_fixture("tiny", seed=7, with_payload=False)
    cfg = CrawlConfig(
        epoch_budget=64,
        max_epochs=2,
        allowed_domains=("example",),
        depth_limit=3,
        seen_filter="cuckoo",
    )
    root = str(tmp_path / "pq")
    store = ParquetStore(spark, root)
    CrawlEngine.from_fixture(spark, cfg, store, fix).run(max_epochs=2)
    seen_fps = [bytes(r.fp) for r in store.read("url_seen").collect()]
    assert seen_fps

    # resume: fresh store handle + fresh engine over the same root;
    # from_fixture's resume path rebuilds the filter from committed state
    store2 = ParquetStore(spark, root)
    eng2 = CrawlEngine.from_fixture(spark, cfg, store2, fix)
    assert isinstance(eng2.bloom, ShardedCuckoo)
    assert eng2.bloom.n_added == len(seen_fps)
    assert eng2.bloom.maybe_contains(seen_fps).all()
    stats2 = eng2.run(max_epochs=2)
    # the resumed epochs still dedupe against the committed seen set:
    # nothing already-seen re-enters as fresh
    fps_after = [bytes(r.fp) for r in store2.read("url_seen").collect()]
    assert len(fps_after) == len(set(fps_after))
    assert set(seen_fps) <= set(fps_after)

    # expire everything, then reopen the store cold: the deletion is
    # durable (manifest MOR deltas), not a driver-memory artifact
    n = eng2.expire_seen(10**9)
    assert n == len(fps_after)
    store3 = ParquetStore(spark, root)
    assert store3.read("url_seen").count() == 0


def test_absorb_failure_mid_epoch_recovers_by_rebuild(spark):
    """An absorb_df RuntimeError mid-epoch (over-capacity kicks, or a
    layout the splice can't absorb into) must not crash the epoch: the
    engine catches it, rebuilds at 2× over committed-seen ∪ the batch,
    and the crawl's stats match a bloom run exactly (the prefilter can
    only skip work, never change results). Pre-guard, run() died with
    RuntimeError on the first fresh batch here."""
    import numpy as np

    eng, store = _tiny_engine(spark, seen_filter="cuckoo")
    # plant a filter whose bucket layout absorb_df cannot splice into —
    # the first absorb with fresh rows raises, exercising the recovery
    broken = ShardedCuckoo(capacity=4, shards=2)
    broken.nbuckets = 128  # build_cuckoo_from_df(4, 2) yields 256
    broken.tags = np.zeros((2, 128, ShardedCuckoo.SLOTS), dtype=np.uint16)
    eng.bloom = broken
    stats = eng.run(max_epochs=4)
    got = [(s.epoch, s.popped, s.fresh, s.queued_after) for s in stats]

    eng2, store2 = _tiny_engine(spark, seen_filter="bloom")
    stats2 = eng2.run(max_epochs=4)
    assert got == [(s.epoch, s.popped, s.fresh, s.queued_after) for s in stats2]
    # the recovery replaced the planted filter and it tracks the seen set
    assert eng.bloom is not broken
    n_seen = store.read("url_seen").count()
    assert eng.bloom.n_added == n_seen
    assert eng.bloom.maybe_contains(
        [bytes(r.fp) for r in store.read("url_seen").collect()]
    ).all()


@pytest.mark.parametrize("store_kind", ["memory", "parquet"])
def test_expired_url_recrawled_reregisters_as_seen(spark, tmp_path, store_kind):
    """Generation-aware expiry (the store's composite-key delete): after
    expire_seen, a recrawled URL's fresh url_seen insert must SURVIVE the
    stale delete deltas — with bare-fp deletes the re-insert was silently
    anti-joined away, so the URL stayed 'fresh' forever (re-crawled every
    epoch, double-inserted into the cuckoo)."""
    from scrapy_spark.config import CrawlConfig
    from scrapy_spark.sources.fixtures import gen_crawl_fixture
    from scrapy_spark.sources.store import MemoryStore, ParquetStore
    from scrapy_spark.streaming.engine import CrawlEngine

    fix = gen_crawl_fixture("tiny", seed=7, with_payload=False)
    cfg = CrawlConfig(
        epoch_budget=64,
        max_epochs=8,
        allowed_domains=("example",),
        depth_limit=3,
        seen_filter="cuckoo",
    )
    store = (
        MemoryStore(spark)
        if store_kind == "memory"
        else ParquetStore(spark, str(tmp_path / "re"))
    )
    eng = CrawlEngine.from_fixture(spark, cfg, store, fix)
    eng.run(max_epochs=2)
    first_fps = {bytes(r.fp) for r in store.read("url_seen").collect()}
    assert first_fps
    assert eng.expire_seen(10**9) == len(first_fps)
    assert store.read("url_seen").count() == 0

    # continue the crawl: queued frontier rows link back to already-crawled
    # URLs, which now dedupe as fresh and are re-crawled → re-inserted.
    # run() returns the CUMULATIVE stats log — count only the post-expiry
    # epochs' fresh rows
    expire_epoch = store.epoch
    stats = eng.run(max_epochs=2)
    fresh_after = sum(s.fresh for s in stats if s.epoch > expire_epoch)
    rows = store.read("url_seen").collect()
    fps_now = [bytes(r.fp) for r in rows]
    # the re-inserts are readable (stale deltas must not match them) ...
    assert len(fps_now) == fresh_after > 0
    # ... unique (no fresh-forever double-insert loop) ...
    assert len(fps_now) == len(set(fps_now))
    # ... include genuinely re-crawled URLs, and the prefilter agrees
    assert set(fps_now) & first_fps
    assert eng.bloom.n_added == len(fps_now)
    assert eng.bloom.maybe_contains(fps_now).all()
