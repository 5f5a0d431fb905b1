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

from .netfetch import is_image_response


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


def split_http_cache_hits(
    popped: DataFrame, http_cache: DataFrame | None, epoch_ts: int
) -> tuple[DataFrame | None, DataFrame]:
    """Cache replay for the REAL http backend (ref HttpCacheMiddleware —
    the whole point of the cache is short-circuiting network fetches).

    The ``http_cache`` table stores full 200 responses by fingerprint
    (fp, status, body, content_type, content_encoding, location, epoch).
    → (hits, misses): ``hits`` carries the popped row columns + the
    replayed response columns, already in the ``engine_fetch`` output
    shape (latency 0, fetched_at=epoch_ts, image_id re-derived from the
    cached content_type, redirect_to null — only 200s are cached — and
    ``from_cache=true`` so the engine never re-appends a replayed row to
    the cache); ``misses`` go to the network.

    Same join strategy as the fp-keyed synthetic split above: the popped
    batch broadcasts, the 10^10-row cache streams (left-semi shrink then
    broadcast-back), never shuffles."""
    if http_cache is None:
        return None, popped

    cached = (
        http_cache.filter(F.col("status") == 200)
        .join(F.broadcast(popped.select("fp")), "fp", "left_semi")
        .withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy("fp").orderBy(F.desc("epoch"))),
        )
        .filter(F.col("__rn") == 1)
        .select(
            "fp",
            F.col("status").alias("c_status"),
            F.col("body").alias("c_body"),
            F.col("content_type").alias("c_content_type"),
            F.col("content_encoding").alias("c_content_encoding"),
            F.col("location").alias("c_location"),
        )
    )
    hits = (
        popped.drop("status")
        .join(F.broadcast(cached), "fp", "inner")
        .withColumn("status", F.col("c_status"))
        .withColumn("body", F.col("c_body"))
        .withColumn("content_type", F.col("c_content_type"))
        .withColumn("content_encoding", F.col("c_content_encoding"))
        .withColumn("location", F.col("c_location"))
        .withColumn("latency_ms", F.lit(0).cast("long"))
        .drop(
            "c_status", "c_body", "c_content_type", "c_content_encoding", "c_location"
        )
        .withColumn("redirect_to", F.lit(None).cast("string"))
        .withColumn(
            "image_id",
            F.when(
                (F.col("status") == 200) & is_image_response(), F.col("url_canon")
            ),
        )
        .withColumn("fetched_at", F.lit(epoch_ts).cast("long"))
        .withColumn("from_cache", F.lit(True))
    )
    misses = popped.join(F.broadcast(cached.select("fp")), "fp", "left_anti")
    return hits, misses
