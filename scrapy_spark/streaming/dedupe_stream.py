"""Structured-Streaming exact dedup over the harvested item stream
(SURVEY §2.8 ST7 / §2.3 J5's streaming twin; ref:
scrapy/pipelines/media.py in-flight dedupe ≈L40 — upstream dedupes
media requests in flight inside one process; at cluster scale the same
guarantee over a CONTINUOUS harvest is a watermarked streaming
distinct).

The epoch loop appends one immutable parquet directory per epoch under
``<root>/data/items`` (the file-source contract, same as
streaming/monitor.py). This operator tails it as a stream, derives the
payload digest (md5 over the raw bytes — exact, content-addressed, the
same key ``datapipe/images.py exact_bytes_dedup_reps`` uses), stamps
event time from the epoch's virtual clock, and keeps the FIRST sighting
of each digest via ``dropDuplicatesWithinWatermark`` — state is bounded
by the watermark horizon instead of growing forever, which is what
makes this runnable indefinitely beside a 10^10-URL crawl (an unbounded
``dropDuplicates`` would accumulate one state row per distinct image
ever seen).

Semantics: two sightings of the same digest within the watermark
horizon collapse to the earlier one; a re-sighting AFTER the horizon
passes through (and is then caught by the batch-tier exact dedup —
the streaming pass is the cheap in-flight tier, the batch pass the
exact one, mirroring the bloom-prefilter/anti-join split of url_seen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import schemas


def items_stream(
    spark: SparkSession, store_root: str, epoch_quantum_ms: int = 1000
) -> DataFrame:
    """readStream over the store's items epoch directories, with payload
    digest + virtual-clock event time attached (all JVM built-ins)."""
    raw = (
        spark.readStream.schema(schemas.ITEMS)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(f"{store_root}/data/items")
    )
    # bytes is nullable (payload-less crawls run with_payload=False) and
    # dropDuplicatesWithinWatermark treats NULL keys as EQUAL — an md5
    # that passes NULL through would silently collapse every payload-less
    # item after the first. Fall back to the fp (itself content-derived
    # and unique per item) so such rows keep distinct digests.
    digest = F.when(
        F.col("bytes").isNotNull(), F.md5(F.col("bytes"))
    ).otherwise(F.concat(F.lit("fp:"), F.hex(F.col("fp"))))
    # anchor the virtual clock ABOVE the Unix epoch: Structured
    # Streaming's initial watermark is 1970-01-01T00:00:00, and rows
    # whose event time is not strictly greater are discarded as late —
    # epoch 0 of a fresh crawl would be silently dropped (caught by
    # test_payloadless_items_are_not_collapsed; the offset value itself
    # is arbitrary, dedup semantics only compare event times)
    return raw.withColumn("digest", digest).withColumn(
        "event_ts",
        F.timestamp_millis(
            F.lit(86_400_000)
            + F.col("epoch").cast("long") * epoch_quantum_ms
        ),
    )


def streaming_exact_dedup(
    stream: DataFrame, watermark_s: int = 60
) -> DataFrame:
    """First-sighting-wins exact dedup on the payload digest, state
    bounded by ``watermark_s`` of event time."""
    return stream.withWatermark(
        "event_ts", f"{watermark_s} seconds"
    ).dropDuplicatesWithinWatermark(["digest"])


def run_dedup_once(
    spark: SparkSession,
    store_root: str,
    table_name: str = "items_deduped",
    watermark_s: int = 60,
    epoch_quantum_ms: int = 1000,
) -> DataFrame:
    """Drain every committed items epoch through the streaming dedup into
    an in-memory sink (trigger availableNow — the batch-equivalent mode
    the tests use; a live deployment drops the trigger)."""
    deduped = streaming_exact_dedup(
        items_stream(spark, store_root, epoch_quantum_ms),
        watermark_s=watermark_s,
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)


__all__ = ["items_stream", "streaming_exact_dedup", "run_dedup_once"]
