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
