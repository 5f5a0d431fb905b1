"""HTTP cache as an anti-join over fetch_log (SURVEY §2.1 S6, §2.3 J6;
ref: scrapy/extensions/httpcache.py::FilesystemCacheStorage ≈L200 /
HttpCacheMiddleware — responses stored by request fingerprint, replayed
before the request reaches the downloader).

The reference keys its cache by fingerprint; our ``fetch_log`` table IS
the cache: a popped request whose ``fp`` already has a stored 200
response is served from the log (latency 0 — the middleware short-
circuits before the downloader slot, so no politeness delay is consumed),
everything else proceeds to the fetch stage.

Join strategy mirrors the url_seen dedupe (operators/dedupe.py): the
popped batch is tiny, fetch_log is the 10^10-row side — fetch_log is
scanned streaming against a broadcast of the batch fps, never shuffled.

Disabled by default (``CrawlConfig.httpcache_enabled``): cache replay
changes the politeness/metrics surface, and the deterministic parity
fixtures never re-pop a fetched fp, so the parity contract (SEMANTICS.md)
is defined with the cache off — exactly like the reference, where
HTTPCACHE_ENABLED defaults to False.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def split_cache_hits(
    popped: DataFrame, fetch_log: DataFrame | None, epoch_ts: int
) -> tuple[DataFrame, DataFrame]:
    """→ (hits, misses).

    ``hits`` carries the popped row columns + replayed response columns
    (image_id, status, latency_ms=0, fetched_at=epoch_ts) from the most
    recent cached 200 for that fp; ``misses`` is the remainder of
    ``popped`` unchanged (→ the real fetch stage).
    """
    if fetch_log is None:
        return None, popped

    cached = (
        fetch_log.filter(F.col("status") == 200)
        .join(F.broadcast(popped.select("fp")), "fp", "left_semi")
        .select("fp", "image_id", "status", "epoch")
        # latest stored response wins (expiry = re-fetch after eviction;
        # ref FilesystemCacheStorage expiration ≈L230)
        .withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy("fp").orderBy(F.desc("epoch"))),
        )
        .filter(F.col("__rn") == 1)
        .select("fp", F.col("image_id").alias("c_image_id"), F.col("status").alias("c_status"))
    )
    hits = (
        popped.join(F.broadcast(cached), "fp", "inner")
        .withColumn("image_id", F.col("c_image_id"))
        .withColumn("status", F.col("c_status"))
        .withColumn("latency_ms", F.lit(0).cast("long"))
        .withColumn("fetched_at", F.lit(epoch_ts).cast("long"))
        .drop("c_image_id", "c_status")
    )
    misses = popped.join(F.broadcast(cached.select("fp")), "fp", "left_anti")
    return hits, misses
