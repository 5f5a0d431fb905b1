"""Streaming exact dedup over the harvested items stream
(streaming/dedupe_stream.py): watermarked first-sighting-wins distinct
on the payload digest, drained with trigger(availableNow)."""

import pytest
from pyspark.sql import functions as F

from scrapy_spark.plans import schemas
from scrapy_spark.streaming.dedupe_stream import run_dedup_once


def _item(image_id, payload: bytes, epoch: int):
    return (image_id, payload, 4, 4, "rawrgb", f"cap {image_id}", 0,
            payload + b"fp", epoch)


@pytest.fixture()
def items_root(spark, tmp_path):
    """Three committed epochs; epochs 0 and 1 re-sight earlier payloads."""
    root = str(tmp_path / "store")
    epochs = {
        0: [_item("a", b"\x01\x02", 0), _item("b", b"\x03\x04", 0)],
        1: [_item("a2", b"\x01\x02", 1),  # dup of a by bytes
            _item("c", b"\x05\x06", 1)],
        2: [_item("b2", b"\x03\x04", 2),  # dup of b
            _item("d", b"\x07\x08", 2)],
    }
    for e, rows in epochs.items():
        spark.createDataFrame(rows, schemas.ITEMS).coalesce(1).write.parquet(
            f"{root}/data/items/e{e}"
        )
    return root


def test_streaming_exact_dedup_first_sighting_wins(spark, items_root):
    out = run_dedup_once(
        spark, items_root, table_name="t_dedup1", watermark_s=3600
    )
    rows = out.collect()
    # 6 items, 4 distinct payloads → 4 survivors
    assert len(rows) == 4
    assert {r.digest for r in rows} == {
        r.d for r in spark.createDataFrame(
            [(b"\x01\x02",), (b"\x03\x04",), (b"\x05\x06",), (b"\x07\x08",)],
            "b binary",
        ).select(F.md5("b").alias("d")).collect()
    }
    # the stream carries event time derived from the epoch virtual clock
    assert all(r.event_ts is not None for r in rows)


def test_streaming_dedup_matches_batch_exact_dedup(spark, items_root):
    """The streaming pass (within one horizon) keeps exactly one row per
    digest — the same digest set the batch exact-dedup tier computes."""
    out = run_dedup_once(
        spark, items_root, table_name="t_dedup2", watermark_s=3600
    )
    batch = (
        spark.read.option("recursiveFileLookup", "true")
        .schema(schemas.ITEMS)
        .parquet(f"{items_root}/data/items")
        .select(F.md5("bytes").alias("digest"))
        .distinct()
    )
    assert {r.digest for r in out.collect()} == {
        r.digest for r in batch.collect()
    }


def test_payloadless_items_are_not_collapsed(spark, tmp_path):
    """bytes is nullable (with_payload=False crawls) and
    dropDuplicatesWithinWatermark treats NULL keys as EQUAL — the digest
    must fall back to the per-item fp so distinct payload-less items all
    survive (the md5(NULL)=NULL form silently dropped every one after
    the first)."""
    root = str(tmp_path / "store")
    rows = [
        ("a", None, 4, 4, "rawrgb", "cap a", 0, b"fp-a", 0),
        ("b", None, 4, 4, "rawrgb", "cap b", 0, b"fp-b", 0),
        ("c", None, 4, 4, "rawrgb", "cap c", 0, b"fp-c", 0),
        # a true payload dup pair still collapses
        ("d", b"\x01\x02", 4, 4, "rawrgb", "cap d", 0, b"fp-d", 0),
        ("d2", b"\x01\x02", 4, 4, "rawrgb", "cap d2", 0, b"fp-d2", 0),
        # and a re-sighted fp (payload-less retry) collapses too
        ("a2", None, 4, 4, "rawrgb", "cap a2", 0, b"fp-a", 0),
    ]
    spark.createDataFrame(rows, schemas.ITEMS).coalesce(1).write.parquet(
        f"{root}/data/items/e0"
    )
    out = run_dedup_once(
        spark, root, table_name="t_dedup_null", watermark_s=3600
    )
    got = out.collect()
    assert len(got) == 4  # a-pair and d-pair collapse; b, c survive
    nulls = {r.image_id for r in got if r.bytes is None}
    assert len(nulls & {"a", "a2"}) == 1 and {"b", "c"} <= nulls
    assert all(r.digest is not None for r in got)
