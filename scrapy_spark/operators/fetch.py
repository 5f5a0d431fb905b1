"""The fetch stage (SURVEY §2.1 S2; ref: scrapy/core/downloader/handlers/
http11.py::HTTP11DownloadHandler ≈L40).

In-sandbox there is no network (verified, SURVEY §0), so the fetcher is the
**synthetic fetcher**: a broadcast join of the popped batch against the
``url_map``/``corpus`` tables, with deterministic status/latency derived
from the fingerprint bytes (shared with the simulator via
``sources.fixtures.fetch_status_for_fp`` — SEMANTICS.md step 5).

Everything is JVM-side Column algebra: the fp's first two bytes come out of
``hex(fp)`` + ``conv``, no Python. On a real cluster the same stage swaps
the join for an aiohttp-based ``mapInArrow`` batch fetcher; the surrounding
dataflow (status/latency/payload columns, politeness bookkeeping) is
unchanged — that seam is this function's contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import CrawlConfig


def _fp_byte(n: int):
    """n-th byte of the binary fp as an int column (0-based) — JVM-side."""
    return F.conv(F.substring(F.hex(F.col("fp")), 1 + 2 * n, 2), 16, 10).cast("int")


def synthetic_fetch(
    popped: DataFrame,
    url_map: DataFrame,
    cfg: CrawlConfig,
    epoch_ts: int,
    redirect_map: DataFrame | None = None,
) -> DataFrame:
    """popped (tiny, broadcast side) ⋈ url_map (huge, streamed) → fetched.

    Adds: image_id (null = unknown URL), redirect_to, status, latency_ms,
    fetched_at. Status rule (SEMANTICS 5): url in redirect_map → 301;
    unknown URL → 404; fp[0] < 5 → 503; fp[0] < 10 → 404; else 200.
    """
    # Join-order note: Spark cannot broadcast the LEFT (preserved) side of a
    # left-outer join, and url_map is the 10^10-row side — so first shrink
    # url_map with a LEFT SEMI against broadcast(popped) (streamed scan, no
    # shuffle), then left-join the tiny result back, broadcast as the build
    # side. Same trick as the url_seen anti-join (operators/dedupe.py).
    relevant = url_map.join(
        F.broadcast(popped.select("url_canon")), "url_canon", "left_semi"
    )
    joined = popped.join(F.broadcast(relevant), "url_canon", "left")
    if redirect_map is not None:
        rmap = redirect_map.select(
            "url_canon" if "url_canon" in redirect_map.columns else F.col("src_canon").alias("url_canon"),
            F.col("dst_url").alias("redirect_to"),
        )
        rel_redir = rmap.join(
            F.broadcast(popped.select("url_canon")), "url_canon", "left_semi"
        )
        joined = joined.join(F.broadcast(rel_redir), "url_canon", "left")
    else:
        joined = joined.withColumn("redirect_to", F.lit(None).cast("string"))
    b0, b1 = _fp_byte(0), _fp_byte(1)
    return (
        joined.withColumn(
            "status",
            F.when(F.col("redirect_to").isNotNull(), F.lit(301))
            .when(F.col("image_id").isNull(), F.lit(404))
            .when(b0 < 5, F.lit(503))
            .when(b0 < 10, F.lit(404))
            .otherwise(F.lit(200)),
        )
        .withColumn("latency_ms", (F.lit(10) + b1 % 90).cast("long"))
        .withColumn("fetched_at", (F.lit(epoch_ts) + F.col("latency_ms")).cast("long"))
    )


def attach_payload(done: DataFrame, corpus: DataFrame | None) -> DataFrame:
    """200-rows ⋈ corpus → item rows with the image payload columns
    (ref: pipelines/files.py persistence; payload validation is a separate
    operator, operators/images.py)."""
    if corpus is None:
        return (
            done.withColumn("bytes", F.lit(None).cast("binary"))
            .withColumn("w", F.lit(None).cast("int"))
            .withColumn("h", F.lit(None).cast("int"))
            .withColumn("fmt", F.lit(None).cast("string"))
            .withColumn("caption", F.lit(None).cast("string"))
            .withColumn("phash", F.lit(None).cast("long"))
        )
    relevant = corpus.join(
        F.broadcast(done.select("image_id")), "image_id", "left_semi"
    )
    return done.join(F.broadcast(relevant), "image_id", "left")
