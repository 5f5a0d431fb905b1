"""Structured-Streaming crawl monitor (SURVEY §2.8 ST7 / §2.4 A2; ref:
scrapy/extensions/logstats.py ≈L25 — pages/min sampled on a timer).

The epoch loop is the crawl's runtime (cyclic dataflow can't be a
Structured Streaming source/sink pair — SURVEY ST1), but its OUTPUT is a
textbook stream: ``ParquetStore`` appends one immutable parquet directory
per epoch under ``<root>/data/<table>/``, which is exactly the file-source
contract. The monitor tails ``fetch_log`` with ``readStream``, converts
the virtual-clock ``fetched_at`` (ms) to an event-time timestamp, applies
a watermark for late rows, and maintains tumbling per-slot windowed
counts — the LogStats rates as a live streaming aggregation that runs
beside (or after) the crawl without touching its state.

``trigger(availableNow=True)`` drains everything committed so far and
stops — the batch-equivalent mode used by the tests; a live deployment
drops that trigger and leaves the query running.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import schemas


def fetch_log_stream(spark: SparkSession, store_root: str) -> DataFrame:
    """readStream over the store's fetch_log epoch directories."""
    return (
        spark.readStream.schema(schemas.FETCH_LOG)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(f"{store_root}/data/fetch_log")
    )


def windowed_slot_rates(
    stream: DataFrame,
    window_ms: int = 5_000,
    watermark_ms: int = 10_000,
) -> DataFrame:
    """Tumbling per-slot fetch counts over virtual event time.

    ``fetched_at`` is virtual milliseconds (SEMANTICS clock); it becomes a
    real timestamp so the built-in watermark/window machinery applies —
    rows later than ``watermark_ms`` behind the max seen event time are
    dropped, exactly the reference's 'responses after close are discarded'
    behavior (ST4) expressed with the engine's native late-data tooling.
    """
    with_ts = stream.withColumn(
        "event_ts", F.timestamp_millis(F.col("fetched_at"))
    ).withWatermark("event_ts", f"{watermark_ms // 1000} seconds")
    return (
        with_ts.groupBy(
            F.window("event_ts", f"{window_ms // 1000} seconds").alias("win"),
            "slot",
        )
        .agg(
            F.count(F.lit(1)).alias("fetches"),
            F.sum(F.when(F.col("status") == 200, 1).otherwise(0)).alias("ok"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "slot",
            "fetches",
            "ok",
        )
    )


def run_monitor_once(
    spark: SparkSession,
    store_root: str,
    table_name: str = "crawl_rates",
    window_ms: int = 5_000,
) -> DataFrame:
    """Drain all committed fetch_log epochs through the streaming plan
    into an in-memory sink; returns the result table. Complete output
    mode: windowed aggregates re-emit as late epochs arrive."""
    rates = windowed_slot_rates(fetch_log_stream(spark, store_root), window_ms)
    q = (
        rates.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)
