"""Unit tests for the scheduling-core operators in isolation (SURVEY §2.5
W1/W2, §4.3.1/§4.3.2): the salted pre-cut must never change the exact pop
result, the bloom must never produce a false negative, and the two
anti-join strategies must agree.
"""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from scrapy_spark.config import CrawlConfig
from scrapy_spark.operators.bloom import ShardedBloom
from scrapy_spark.operators.dedupe import anti_join_seen, with_bucket
from scrapy_spark.operators.pop import rank_and_pop, salted_pretrim


def eligible_frame(spark, n=3000, slots=7, seed=3):
    """Skewed eligible set: slot 's0' holds ~60% of rows (the hot-domain
    shape the pre-cut exists for)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        slot = "s0" if rng.random() < 0.6 else f"s{rng.randrange(1, slots)}"
        rows.append((slot, rng.randrange(-3, 4), i, rng.choice([2, 4])))
    return spark.createDataFrame(
        rows, "slot string, priority int, seq long, concurrency int"
    )


@pytest.mark.parametrize("order", ["fifo", "lifo"])
@pytest.mark.parametrize("aware", [True, False])
def test_salted_pretrim_never_changes_pop_result(spark, order, aware):
    cfg = CrawlConfig(queue_order=order, downloader_aware=aware)
    df = eligible_frame(spark)
    exact = rank_and_pop(df, cfg, budget=40, pretrim_cap=None)
    trimmed = rank_and_pop(df, cfg, budget=40, pretrim_cap=4)
    cols = ["rank", "slot", "priority", "seq", "slot_rank"]
    assert [tuple(r) for r in exact.select(cols).orderBy("rank").collect()] == [
        tuple(r) for r in trimmed.select(cols).orderBy("rank").collect()
    ]


def test_salted_pretrim_is_superset_of_per_slot_head(spark):
    cfg = CrawlConfig(queue_order="fifo")
    df = eligible_frame(spark)
    kept = salted_pretrim(df, cfg, max_cap=4).collect()
    kept_seqs = {r["seq"] for r in kept}
    # true per-slot top-4 under (priority desc, seq asc)
    rows = sorted(
        df.collect(), key=lambda r: (r["slot"], -r["priority"], r["seq"])
    )
    per_slot: dict[str, int] = {}
    for r in rows:
        c = per_slot.get(r["slot"], 0)
        if c < 4:
            assert r["seq"] in kept_seqs, "pre-cut dropped a true top-cap row"
        per_slot[r["slot"]] = c + 1


def test_bloom_no_false_negatives_and_bounded_fpr():
    rng = np.random.default_rng(9)
    added = [bytes(rng.integers(0, 256, 20, dtype=np.uint8)) for _ in range(20_000)]
    other = [bytes(rng.integers(0, 256, 20, dtype=np.uint8)) for _ in range(20_000)]
    bloom = ShardedBloom(capacity=50_000, fpr=1e-3)
    bloom.add_many(added)
    assert bloom.maybe_contains(added).all(), "false negative — would drop a URL"
    fp_rate = bloom.maybe_contains(other).mean()
    assert fp_rate < 0.01, f"fpr {fp_rate} far above target"


def test_anti_join_strategies_agree(spark):
    """Broadcast-inverted (small batch) vs shuffle (large batch) paths must
    return identical fresh sets; bloom on/off must not matter."""
    rng = np.random.default_rng(4)
    fps = [bytes(rng.integers(0, 256, 20, dtype=np.uint8)) for _ in range(400)]
    cand_rows = [
        (fp, f"http://x.example/{i}", f"http://x.example/{i}", i)
        for i, fp in enumerate(fps)
    ]
    cand = spark.createDataFrame(
        cand_rows, "fp binary, url string, url_canon string, parent_seq long"
    )
    seen = with_bucket(
        spark.createDataFrame([(fp,) for fp in fps[::3]], "fp binary")
    ).withColumn("epoch_added", F.lit(0))

    def fresh_set(**kw):
        return {
            bytes(r["fp"])
            for r in anti_join_seen(cand, seen, **kw).select("fp").collect()
        }

    expect = {fp for i, fp in enumerate(fps) if i % 3 != 0}
    bloom = ShardedBloom(capacity=10_000)
    bloom.add_many(fps[::3])
    assert fresh_set(n_candidates=400) == expect  # broadcast path
    assert fresh_set(n_candidates=10**9) == expect  # shuffle path
    assert fresh_set(bloom=bloom, n_candidates=400) == expect  # bloom prefilter


def test_distributed_bloom_build_matches_driver_build(spark):
    """SURVEY §4.3.2 cluster path: the treeReduce-built bloom must be
    bit-identical to driver-side add_many over the same fingerprints."""
    import numpy as np

    from scrapy_spark.operators.bloom import build_bloom_from_df

    rng = np.random.default_rng(17)
    fps = [bytes(rng.integers(0, 256, 20, dtype=np.uint8)) for _ in range(5000)]
    df = spark.createDataFrame([(fp,) for fp in fps], "fp binary").repartition(7)
    dist = build_bloom_from_df(df, capacity=100_000)
    local = ShardedBloom(capacity=100_000)
    local.add_many(fps)
    assert dist.n_added == 5000
    assert np.array_equal(dist.bits, local.bits)
    assert dist.maybe_contains(fps).all()

    empty = spark.createDataFrame([], "fp binary")
    assert build_bloom_from_df(empty, capacity=100_000).n_added == 0


def test_global_seq_matches_single_partition_window(spark):
    """global_seq ≡ the single-partition Window.orderBy rank it replaced,
    at every parallelism: same (key → seq) mapping, dense from `start`,
    including duplicate keys and nulls in the order columns."""
    from pyspark.sql import Window

    from scrapy_spark.operators.pop import global_seq

    random.seed(11)
    rows = [
        (
            random.choice([0, 1, 2]),
            random.choice([None, -1, 5, 17, 123456]),
            f"http://d{random.randrange(40)}.example/p/{random.randrange(500)}",
        )
        for _ in range(5_000)
    ]
    rows += rows[:50]  # exact duplicate rows: ties must stay harmless
    for parts in (1, 7, 32):
        df = spark.createDataFrame(
            rows, "kind int, parent_seq long, url string"
        ).repartition(parts)
        got = global_seq(df, ["kind", "parent_seq", "url"], start=1000)
        w = Window.orderBy(
            F.asc("kind"), F.asc("parent_seq"), F.asc("url")
        )
        want = df.withColumn(
            "seq", (F.row_number().over(w) + F.lit(999)).cast("long")
        )
        key = lambda r: (
            r["kind"],
            r["parent_seq"] if r["parent_seq"] is not None else -(1 << 62),
            r["url"],
            r["seq"],
        )
        assert sorted(map(key, got.collect())) == sorted(
            map(key, want.collect())
        )
