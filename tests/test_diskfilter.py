"""Executor-resident sharded cuckoo (operators/diskfilter.py): the
10^10-key url_seen probe design — shard files on shared storage, probe /
absorb / delete shard-owner-side, driver holds only the manifest. Must be
bit-identical in behavior to the driver-resident ShardedCuckoo (both are
built on the same shard-level ops)."""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pytest

from scrapy_spark.operators.cuckoo import ShardedCuckoo
from scrapy_spark.operators.diskfilter import (
    DiskShardedCuckoo,
    build_disk_cuckoo_from_df,
)


def _fps(n, salt=b""):
    return [hashlib.sha1(salt + str(i).encode()).digest() for i in range(n)]


def _df(spark, fps):
    return spark.createDataFrame([(f,) for f in fps], "fp binary")


def test_build_matches_driver_resident_filter(spark, tmp_path):
    fps = _fps(5000)
    disk = build_disk_cuckoo_from_df(
        spark, str(tmp_path), _df(spark, fps), capacity=20_000
    )
    mem = ShardedCuckoo(capacity=20_000)
    mem.add_many(fps)
    assert disk.n_added == mem.n_added == len(fps)
    assert disk.nbuckets == mem.nbuckets and disk.shards == mem.shards
    # no false negatives, and probe answers match the in-memory filter
    # exactly on both members and non-members
    others = _fps(5000, salt=b"x")
    got = disk.maybe_contains(fps + others)
    want = mem.maybe_contains(fps + others)
    assert got[: len(fps)].all()
    assert (got == want).all()


def test_driver_object_holds_no_tag_arrays(spark, tmp_path):
    """The whole point: the driver-side handle is manifest-only — no
    ndarray lives on it, regardless of filter size."""
    disk = build_disk_cuckoo_from_df(
        spark, str(tmp_path), _df(spark, _fps(2000)), capacity=10_000
    )
    for v in vars(disk).values():
        assert not isinstance(v, np.ndarray)
    # and the manifest is JSON-small: sizing + ≤shards path strings
    m = json.loads((disk.root / "manifest.json").read_text())
    assert set(m) == {"capacity", "shards", "nbuckets", "n_added", "files"}
    assert len(m["files"]) <= m["shards"]


def test_probe_udf_matches_driver_probe(spark, tmp_path):
    fps = _fps(3000)
    disk = build_disk_cuckoo_from_df(
        spark, str(tmp_path), _df(spark, fps), capacity=10_000
    )
    probe_in = disk.repartition_by_shard(_df(spark, fps + _fps(3000, b"y")))
    from pyspark.sql import functions as F

    rows = probe_in.withColumn(
        "hit", disk.probe_udf(spark)(F.col("fp"))
    ).collect()
    got = {bytes(r.fp): r.hit for r in rows}
    want = dict(
        zip(
            fps + _fps(3000, b"y"),
            disk.maybe_contains(fps + _fps(3000, b"y")),
        )
    )
    assert got == {k: bool(v) for k, v in want.items()}
    assert all(got[f] for f in fps)  # no false negatives through Spark


def test_absorb_is_incremental_and_path_stable(spark, tmp_path):
    """A second absorb touches only the shards its fps live in: untouched
    shards keep their exact file paths (the MOR path-stable property),
    and counts accumulate."""
    first = _fps(4000)
    disk = build_disk_cuckoo_from_df(
        spark, str(tmp_path), _df(spark, first), capacity=50_000
    )
    files_before = dict(disk._m["files"])
    # one fp → exactly one shard touched
    extra = [hashlib.sha1(b"lonely").digest()]
    assert disk.absorb_df(_df(spark, extra)) == 1
    assert disk.n_added == len(first) + 1
    files_after = dict(disk._m["files"])
    touched = {
        s for s in files_after if files_after[s] != files_before.get(s)
    }
    assert len(touched) == 1
    assert disk.maybe_contains(extra).all()
    assert disk.maybe_contains(first).all()


def test_delete_removes_only_targets_owner_side(spark, tmp_path):
    fps = _fps(2000)
    disk = build_disk_cuckoo_from_df(
        spark, str(tmp_path), _df(spark, fps), capacity=10_000
    )
    victims, keep = fps[:500], fps[500:]
    assert disk.delete_df(_df(spark, victims)) == 500
    assert disk.n_added == 1500
    assert disk.maybe_contains(keep).all()  # survivors: no false negatives
    # victims now mostly absent (collisions with survivors allowed at FPR)
    assert disk.maybe_contains(victims).mean() < 0.01


def test_manifest_reload_resumes_state(spark, tmp_path):
    fps = _fps(1000)
    disk = build_disk_cuckoo_from_df(
        spark, str(tmp_path), _df(spark, fps), capacity=10_000
    )
    reopened = DiskShardedCuckoo(spark, str(tmp_path), capacity=999)
    # existing manifest wins over the constructor's capacity hint
    assert reopened.capacity == 10_000
    assert reopened.n_added == 1000
    assert reopened.maybe_contains(fps).all()


def test_gc_prunes_unreferenced_files_with_one_generation_grace(
    spark, tmp_path
):
    """GC after each swap keeps the current manifest's files PLUS the
    immediately-previous generation (in-flight plans from the same
    epoch captured the pre-mutation file map — the engine overlaps the
    absorb with the stats action and the commit), and prunes everything
    older on the next swap."""
    fps = _fps(1000)
    disk = build_disk_cuckoo_from_df(
        spark, str(tmp_path), _df(spark, fps), capacity=10_000
    )
    gen0 = set(disk._m["files"].values())
    disk.absorb_df(_df(spark, _fps(200, b"a")))
    gen1 = set(disk._m["files"].values())
    on_disk = {f"data/{p.name}" for p in (disk.root / "data").glob("*.npy")}
    assert on_disk == gen0 | gen1  # previous generation still readable

    disk.delete_df(_df(spark, fps[:100]))
    gen2 = set(disk._m["files"].values())
    on_disk = {f"data/{p.name}" for p in (disk.root / "data").glob("*.npy")}
    assert on_disk == gen1 | gen2  # gen0-only files pruned, gen1 spared
    assert not (gen0 - gen1) & on_disk


def test_engine_crawl_with_disk_cuckoo_matches_bloom(spark):
    """Full engine run on seen_filter='cuckoo-disk': identical EpochStats
    to the bloom run (the prefilter can only skip work, never change
    results) — the engine-parity bar the executor-resident rewrite must
    clear."""
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
        eng = CrawlEngine.from_fixture(spark, cfg, store, fix)
        stats = eng.run(max_epochs=4)
        return (
            [(s.epoch, s.popped, s.fresh, s.queued_after) for s in stats],
            eng,
            store,
        )

    got, eng, store = run("cuckoo-disk")
    want, _, _ = run("bloom")
    assert got == want
    # the filter tracked the committed seen set, executor-resident
    seen_fps = [bytes(r.fp) for r in store.read("url_seen").collect()]
    assert eng.bloom.n_added == len(seen_fps)
    assert eng.bloom.maybe_contains(seen_fps).all()


def test_engine_expiry_and_resume_with_disk_cuckoo(spark, tmp_path):
    """Persistent-store lifecycle: seen-TTL expiry deletes shard-owner-
    side, and a resumed engine over the same root finds the filter state
    already on disk (manifest reload, no rebuild collect)."""
    import pandas as pd  # noqa: F401 — engine deps

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
        seen_filter="cuckoo-disk",
    )
    root = str(tmp_path / "pq")
    store = ParquetStore(spark, root)
    eng = CrawlEngine.from_fixture(spark, cfg, store, fix)
    eng.run(max_epochs=2)
    seen_fps = [bytes(r.fp) for r in store.read("url_seen").collect()]
    assert seen_fps and eng.bloom.n_added == len(seen_fps)

    # resume: a fresh engine over the same root reloads the filter from
    # its own manifest (shard files ARE the durable state — no url_seen
    # rescan) and keeps crawling with identical dedupe behavior
    store2 = ParquetStore(spark, root)
    eng2 = CrawlEngine.from_fixture(spark, cfg, store2, fix)
    assert eng2.bloom.n_added == len(seen_fps)
    assert eng2.bloom.maybe_contains(seen_fps).all()
    eng2.run(max_epochs=2)
    fps_after = [bytes(r.fp) for r in store2.read("url_seen").collect()]
    assert len(fps_after) == len(set(fps_after))  # no re-crawled dupes
    assert set(seen_fps) <= set(fps_after)
    eng, store = eng2, store2

    # expiry goes through delete_df (owner-side) — filter empties with
    # the table
    n = eng.expire_seen(10**9)
    assert n == len(fps_after)
    assert store.read("url_seen").count() == 0
    assert eng.bloom.n_added == 0
    assert eng.bloom.maybe_contains(fps_after).mean() <= 6e-4
