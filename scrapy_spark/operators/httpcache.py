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

    cached = _latest_cached(http_cache, popped).select(
        "fp", "c_status", "c_body", "c_content_type", "c_content_encoding",
        "c_location",
    )
    hits = _replay_hits(popped, cached, epoch_ts)
    misses = popped.join(F.broadcast(cached.select("fp")), "fp", "left_anti")
    return hits, misses


#: c_-prefixed response columns a replay/merge pulls from the cache table
_C_COLS = (
    "status", "body", "content_type", "content_encoding", "location",
    "etag", "last_modified", "fetched_wall", "fresh_until",
)


def _latest_cached(http_cache: DataFrame, popped: DataFrame) -> DataFrame:
    """Latest stored 200 per popped fp, response columns c_-prefixed.

    Legacy cache tables (written before the RFC2616 policy existed) lack
    the freshness columns — they surface as nulls, which the policy
    reads as "stale, no validators" (unconditional refetch)."""
    hc = http_cache
    for col, typ in (
        ("etag", "string"), ("last_modified", "string"),
        ("fetched_wall", "long"), ("fresh_until", "long"),
    ):
        if col not in hc.columns:
            hc = hc.withColumn(col, F.lit(None).cast(typ))
    return (
        hc.filter(F.col("status") == 200)
        .join(F.broadcast(popped.select("fp")), "fp", "left_semi")
        .withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy("fp").orderBy(F.desc("epoch"))),
        )
        .filter(F.col("__rn") == 1)
        .select("fp", *[F.col(c).alias(f"c_{c}") for c in _C_COLS])
    )


def _replay_hits(popped: DataFrame, cached: DataFrame, epoch_ts: int) -> DataFrame:
    """Shape cache rows into the ``engine_fetch`` output contract:
    popped row columns + replayed response columns, latency 0,
    ``from_cache=true`` (so the engine never re-appends a replay)."""
    hits = popped.drop("status").join(F.broadcast(cached), "fp", "inner")
    for c in ("status", "body", "content_type", "content_encoding", "location"):
        hits = hits.withColumn(c, F.col(f"c_{c}"))
    return (
        hits.withColumn("latency_ms", F.lit(0).cast("long"))
        .drop(*[c for c in hits.columns if c.startswith("c_")])
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


def split_rfc2616_cache(
    popped: DataFrame,
    http_cache: DataFrame | None,
    epoch_ts: int,
    now_wall: int,
) -> tuple[DataFrame | None, DataFrame, DataFrame | None]:
    """RFC2616Policy cache split (ref: extensions/httpcache.py::
    RFC2616Policy ≈L120 — HTTP RFC 9111 freshness instead of the
    DummyPolicy's replay-everything):

    → ``(hits, to_fetch, merge_src)``
    - **hits**: cached entries still FRESH at ``now_wall``
      (``fresh_until`` ahead of the wall clock) — replayed without
      touching the network, same shape as the dummy split.
    - **to_fetch**: everything else. Stale entries that stored
      validators carry ``cache_etag`` / ``cache_last_modified`` columns
      (null on plain misses) — ``engine_fetch`` turns non-null values
      into If-None-Match / If-Modified-Since conditional-GET headers.
    - **merge_src**: the stale cached rows (c_-prefixed response
      columns) ``merge_304`` needs to serve stored bodies for 304s.

    ``fresh_until == -1`` marks a ``no-store`` response: it must never
    be reused, so the row is treated as absent (can only exist in a
    cache written by the dummy policy). Null freshness (legacy table)
    reads as stale-without-validators → unconditional refetch.

    Join strategy matches the dummy split: popped broadcasts, the
    10^10-row cache streams (left-semi shrink, then the shrunken result
    broadcasts back) — the cache is never shuffled."""
    if http_cache is None:
        return None, popped, None

    cached = _latest_cached(http_cache, popped).filter(
        F.col("c_fresh_until").isNull() | (F.col("c_fresh_until") != -1)
    )
    is_fresh = F.col("c_fresh_until").isNotNull() & (
        F.col("c_fresh_until") > F.lit(int(now_wall))
    )
    fresh = cached.filter(is_fresh).select(
        "fp", "c_status", "c_body", "c_content_type", "c_content_encoding",
        "c_location",
    )
    hits = _replay_hits(popped, fresh, epoch_ts)

    stale = cached.filter(~is_fresh)
    validators = stale.filter(
        F.col("c_etag").isNotNull() | F.col("c_last_modified").isNotNull()
    ).select(
        "fp",
        F.col("c_etag").alias("cache_etag"),
        F.col("c_last_modified").alias("cache_last_modified"),
    )
    to_fetch = popped.join(
        F.broadcast(fresh.select("fp")), "fp", "left_anti"
    ).join(F.broadcast(validators), "fp", "left")
    return hits, to_fetch, stale


def merge_304(fetched: DataFrame, merge_src: DataFrame | None) -> DataFrame:
    """Fold 304 Not Modified revalidation responses back into the stored
    response (ref RFC2616Policy — on 304 the middleware returns the
    cached response, refreshed): the row keeps the revalidation fetch's
    latency/lineage but serves the cached status/body/content columns,
    re-derives image_id from the (merged) content type, and refreshes
    freshness per RFC 9111 §4.3.4 — a 304 that states its own freshness
    (``fresh_explicit``: max-age / no-cache / Expires) wins; a bare 304
    inherits the STORED entry's lifetime re-anchored at the
    revalidation time (stored headers persist unless overridden), so a
    minimal "304 Not Modified" does not demote an hour-fresh entry to
    revalidate-every-epoch. Validators coalesce cached ones. The merged
    row leaves with ``revalidated=true`` and ``from_cache`` unset, so
    the engine re-appends it to the cache — the latest-epoch-wins read
    makes that the RFC's "update the stored response" step."""
    if merge_src is None:
        return fetched.withColumn("revalidated", F.lit(False))
    out = fetched.join(F.broadcast(merge_src), "fp", "left").withColumn(
        "revalidated",
        (F.col("status") == 304) & F.col("c_status").isNotNull(),
    )
    rv = F.col("revalidated")
    inherited = F.col("fetched_wall") + (
        F.col("c_fresh_until") - F.col("c_fetched_wall")
    )
    out = out.withColumn(
        "fresh_until",
        F.when(
            rv
            & ~F.coalesce(F.col("fresh_explicit"), F.lit(False))
            & F.col("c_fetched_wall").isNotNull()
            & (F.col("c_fresh_until") >= F.col("c_fetched_wall")),
            F.greatest(F.col("fresh_until"), inherited),
        ).otherwise(F.col("fresh_until")),
    )
    for c in ("body", "content_type", "content_encoding"):
        out = out.withColumn(c, F.when(rv, F.col(f"c_{c}")).otherwise(F.col(c)))
    for c in ("etag", "last_modified"):
        out = out.withColumn(
            c, F.when(rv, F.coalesce(F.col(c), F.col(f"c_{c}"))).otherwise(F.col(c))
        )
    return (
        out.withColumn(
            "location", F.when(rv, F.lit(None).cast("string")).otherwise(F.col("location"))
        )
        .withColumn(
            "redirect_to",
            F.when(rv, F.lit(None).cast("string")).otherwise(F.col("redirect_to")),
        )
        .withColumn(
            "image_id",
            F.when(rv & is_image_response(), F.col("url_canon")).otherwise(
                F.col("image_id")
            ),
        )
        .withColumn("status", F.when(rv, F.col("c_status")).otherwise(F.col("status")))
        .drop(*[c for c in out.columns if c.startswith("c_")])
    )
