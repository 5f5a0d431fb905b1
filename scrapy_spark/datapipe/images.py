"""Image-corpus curation ops over the input_hint table shape
(image_id, bytes, w, h, fmt, caption, phash — BASELINE.json:input_hint).

The image-side twin of the text dedup stack: a 100 TB image+caption crawl
dedupes on the stored 64-bit perceptual hash (near-identical pixels →
near phash; re-encode/resize/quantize survive it — functions/imaging.py
``phash64``), NOT by decoding pixels again. Everything here is scan +
banded self-join on a long column: no Python, no decode, no shuffle of
the ``bytes`` payload — only (id, phash) and small metadata columns move.

- ``phash_near_dups``     — exact hamming ≤ k pairs via pigeonhole band
  blocking (shared machinery: datapipe/dedup.py
  ``hamming_near_dup_pairs``, same algorithm SimHash text dedup uses).
- ``phash_dedup_reps``    — pairs → connected components → one canonical
  keeper per duplicate cluster (datapipe/cluster.py), i.e. the
  keep/drop map a dedup job joins back against the corpus.
- ``image_stats_by_format`` — per-format size/byte profile (scan-only
  aggregate; the triage query before choosing decode/filter budgets).
- ``image_size_gate``     — min-dimension / aspect-ratio / byte-size
  filter on the METADATA columns (the cheap pre-decode gate; the
  post-decode gate on real pixels is multimodal.min_size_filter).

Ref: the reference's ImagesPipeline persists (checksum, w, h) per image
(scrapy/pipelines/images.py ≈L130) and dedupes downloads by request
fingerprint only — content-level near-dup detection is the LLM-pipeline
extension the build contract asks for beyond reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import hamming_near_dup_pairs, hamming_near_dup_pairs_mih


def phash_near_dups(
    corpus: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    max_hamming: int = 3,
    band_bits: int = 16,
    strategy: str = "bands",
) -> DataFrame:
    """→ (id_a, id_b, hamming) for every image pair whose stored phash
    differs in ≤ ``max_hamming`` of 64 bits. EXACT either way; decode-free.

    ``strategy``:

    - ``"bands"``  — 64/band_bits single-band keys (4×16-bit default).
      Right up to ~10^8 rows; beyond that every 16-bit bucket holds
      n/2^16 rows and the within-bucket self-join goes quadratic.
    - ``"blocks"`` — Manku-style block-combination keys
      (dedup.hamming_near_dup_pairs_mih): C(8,3)=56 keys of 40 bits,
      bucket size n/2^40 — the 10^10-row path, costing a wider explode.
    """
    if strategy == "blocks":
        return hamming_near_dup_pairs_mih(
            corpus, id_col=id_col, hash_col=phash_col, max_hamming=max_hamming
        )
    return hamming_near_dup_pairs(
        corpus,
        id_col=id_col,
        hash_col=phash_col,
        max_hamming=max_hamming,
        band_bits=band_bits,
    )


def phash_dedup_reps(
    corpus: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    max_hamming: int = 3,
    band_bits: int = 16,
) -> DataFrame:
    """→ (image_id, rep_id): every image in any near-dup pair, labeled
    with its cluster's canonical representative (minimum id, transitive —
    A~B, B~C groups all three even when A and C never share a band).
    Rows with image_id == rep_id are the keepers; the rest is the
    dedup-delete list to anti-join against the corpus."""
    from .cluster import cluster_representatives

    pairs = phash_near_dups(
        corpus,
        id_col=id_col,
        phash_col=phash_col,
        max_hamming=max_hamming,
        band_bits=band_bits,
    )
    return cluster_representatives(pairs).select(
        F.col("doc_id").alias(id_col), "rep_id"
    )


def image_stats_by_format(corpus: DataFrame) -> DataFrame:
    """Per-format corpus profile: row count, dimension and payload-size
    aggregates, caption-length mean. One hash-agg over metadata columns
    (the bytes column contributes only its LENGTH, computed in-scan —
    no payload shuffle)."""
    return (
        corpus.groupBy("fmt")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("w").alias("avg_w"),
            F.avg("h").alias("avg_h"),
            F.min(F.least("w", "h")).alias("min_side"),
            F.max(F.greatest("w", "h")).alias("max_side"),
            F.sum(F.length("bytes")).alias("total_bytes"),
            F.avg(F.length("caption")).alias("avg_caption_len"),
        )
        .orderBy("fmt")
    )


def image_size_gate(
    corpus: DataFrame,
    min_side: int = 8,
    max_aspect: float = 4.0,
    max_bytes: int = 16 * 1024 * 1024,
) -> DataFrame:
    """Pre-decode size gate on metadata columns only: both dimensions ≥
    ``min_side`` (IMAGES_MIN_WIDTH/HEIGHT analog, ref pipelines/images.py
    ≈L60), aspect ratio ≤ ``max_aspect`` (banner/sliver filter), payload
    ≤ ``max_bytes``. Catalyst pushes these into the parquet scan."""
    aspect = F.greatest("w", "h") / F.least("w", "h")
    return corpus.filter(
        (F.least("w", "h") >= min_side)
        & (aspect <= max_aspect)
        & (F.length("bytes") <= max_bytes)
    )


def caption_dup_pairs(
    corpus: DataFrame,
    id_col: str = "image_id",
    caption_col: str = "caption",
) -> DataFrame:
    """→ (id_a, id_b) STAR edges for exact-caption duplicate groups:
    captions are normalized (lowercase, trim, collapse whitespace) and
    every member of a group is paired with the group's MINIMUM id.

    Star edges instead of all-pairs is deliberate: a caption shared by
    10^5 scraped thumbnails would otherwise emit 10^10/2 pairs; the
    star is linear in group size and connectivity-equivalent, which is
    all downstream clustering consumes. One hash-agg + one equi-join —
    no caption text ever self-joins all-pairs."""
    norm = F.regexp_replace(
        F.trim(F.lower(F.col(caption_col))), r"\s+", " "
    ).alias("__cap")
    hubs = (
        corpus.select(F.col(id_col), norm)
        .groupBy("__cap")
        .agg(F.min(id_col).alias("id_a"), F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .drop("__n")
    )
    members = corpus.select(F.col(id_col).alias("id_b"), norm)
    return (
        hubs.join(members, "__cap")
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
    )


def joint_dedup_reps(
    corpus: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    caption_col: str = "caption",
    max_hamming: int = 3,
) -> DataFrame:
    """Joint image+text dedup keep/drop map: two images are duplicates
    if their PIXELS near-match (phash hamming ≤ ``max_hamming``) OR
    their CAPTIONS exactly match (normalized) — the union of both edge
    sets closed transitively, so a re-encoded mirror (phash edge) and a
    re-captioned re-post (caption edge) of the same photo all collapse
    into one cluster with one keeper.

    This is the multimodal step neither signal gives alone: phash links
    pixel twins across caption rewrites; captions link visually
    re-rendered copies (crops/filters past the hamming bound) that kept
    their alt-text. → (image_id, rep_id); keepers are rows with
    image_id == rep_id."""
    from .cluster import cluster_representatives

    ph = phash_near_dups(
        corpus, id_col=id_col, phash_col=phash_col, max_hamming=max_hamming
    ).select("id_a", "id_b")
    cap = caption_dup_pairs(corpus, id_col=id_col, caption_col=caption_col)
    edges = ph.unionByName(cap)
    return cluster_representatives(edges).select(
        F.col("doc_id").alias(id_col), "rep_id"
    )


# aspect-ratio training buckets: a SDXL-style ladder of target shapes;
# (name, aspect = w/h). Assignment is nearest-in-log-space, computed as
# threshold comparisons against the midpoints between adjacent rungs —
# pure Column algebra, mirrored verbatim in the DuckDB oracle.
ASPECT_BUCKETS: tuple[tuple[str, float], ...] = (
    ("tall_9x16", 9 / 16),
    ("portrait_3x4", 3 / 4),
    ("square_1x1", 1.0),
    ("landscape_4x3", 4 / 3),
    ("wide_16x9", 16 / 9),
)


def _aspect_bucket_expr(w_col: str = "w", h_col: str = "h"):
    """CASE-chain assigning the nearest ASPECT_BUCKETS rung by aspect
    ratio; cut points are geometric means of adjacent rungs (equivalent
    to nearest in log space). Returns a string Column."""
    import math

    aspect = F.col(w_col).cast("double") / F.col(h_col).cast("double")
    expr = F.lit(ASPECT_BUCKETS[-1][0])
    # walk from widest to narrowest so each WHEN overrides the tail
    for (name, a), (_nxt, b) in zip(
        reversed(ASPECT_BUCKETS[:-1]), reversed(ASPECT_BUCKETS[1:])
    ):
        cut = math.sqrt(a * b)  # geometric mean = log-space midpoint
        expr = F.when(aspect < F.lit(cut), F.lit(name)).otherwise(expr)
    return expr


def aspect_bucket_stats(
    corpus: DataFrame, w_col: str = "w", h_col: str = "h"
) -> DataFrame:
    """Aspect-ratio bucketing for batched image training (models train
    on fixed shape buckets; the loader groups samples by bucket): assign
    every image to its nearest ASPECT_BUCKETS rung, then profile each
    bucket — count, mean aspect, payload bytes. One scan + one hash-agg
    over metadata columns; the bytes column contributes only LENGTH."""
    return (
        corpus.withColumn("bucket", _aspect_bucket_expr(w_col, h_col))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # exact decimal sum of the per-row ratios, not
            # round(avg(double)): the per-row w/h double is deterministic,
            # but float SUMMATION is partial-agg-order-dependent and can
            # flip the last rounded digit between parallelism levels (the
            # r4 latency_ema_inputs contract flake). sum+n carries the
            # mean; decimal→double of the same exact value is bit-stable.
            F.sum(
                (F.col(w_col).cast("double") / F.col(h_col)).cast(
                    "decimal(30,10)"
                )
            )
            .cast("double")
            .alias("sum_aspect"),
            F.sum(F.length("bytes")).alias("total_bytes"),
        )
        .orderBy("bucket")
    )


def phash_near_dups_verified(
    corpus: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    bytes_col: str = "bytes",
    max_hamming: int = 3,
    min_psnr_db: float = 40.0,
) -> DataFrame:
    """phash near-dup pairs VERIFIED on decoded pixels — the two-tier
    structure the input_hint's per-row invariant implies (hash blocking,
    PSNR ≥ 40 dB confirmation): ``phash_near_dups`` proposes candidate
    pairs from the 64-bit hash alone, then ONLY the candidate pairs'
    payloads are joined in and decoded (mapInPandas), never the corpus
    at large — at 10^10 rows the decode tier touches the ~0.1% of rows
    that share a band, not the table.

    → (id_a, id_b, hamming, psnr_db, verified): ``verified`` is true
    when both payloads decode, shapes match, and PSNR ≥ ``min_psnr_db``
    (identical pixels → psnr_db = inf → verified). Shape-mismatched or
    undecodable candidates come back verified=false with NULL psnr —
    kept, not dropped, so callers can audit the hash tier's precision."""
    from typing import Iterator as _Iter

    import numpy as np
    import pandas as pd

    from ..functions.imaging import decode_image, psnr

    pairs = phash_near_dups(
        corpus, id_col=id_col, phash_col=phash_col, max_hamming=max_hamming
    )
    payload = corpus.select(F.col(id_col), F.col(bytes_col))
    joined = (
        pairs.join(
            payload.select(
                F.col(id_col).alias("id_a"), F.col(bytes_col).alias("__ba")
            ),
            "id_a",
        )
        .join(
            payload.select(
                F.col(id_col).alias("id_b"), F.col(bytes_col).alias("__bb")
            ),
            "id_b",
        )
    )
    id_t = corpus.schema[id_col].dataType.simpleString()
    out_schema = (
        f"id_a {id_t}, id_b {id_t}, hamming int, psnr_db double, "
        "verified boolean"
    )

    def _verify(batches: _Iter[pd.DataFrame]) -> _Iter[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ia, ib, ham, ba, bb in zip(
                pdf["id_a"], pdf["id_b"], pdf["hamming"],
                pdf["__ba"], pdf["__bb"],
            ):
                p, ok = None, False
                try:
                    arr_a, _ = decode_image(bytes(ba))
                    arr_b, _ = decode_image(bytes(bb))
                    if arr_a.shape == arr_b.shape:
                        p = float(psnr(arr_a, arr_b))
                        ok = p >= min_psnr_db
                except (ValueError, NotImplementedError):
                    pass
                rows.append((ia, ib, int(ham), p, ok))
            yield pd.DataFrame(
                rows,
                columns=["id_a", "id_b", "hamming", "psnr_db", "verified"],
            )

    return joined.mapInPandas(_verify, schema=out_schema)


def exact_bytes_dedup_reps(
    corpus: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Byte-identical payload dedup — the first, cheapest tier of every
    image-corpus dedup ladder (mirrors the crawl's FilesPipeline checksum
    dedupe, but corpus-wide): → (image_id, rep_id, content_md5) where
    rep_id is the group's minimum id; keepers satisfy image_id == rep_id.

    One JVM md5 scan + one hash-agg + one equi-join on the digest —
    uniform 128-bit keys, so the shuffle cannot skew regardless of how
    lopsided the duplicate groups are (a 10^6-copy hotlinked logo is one
    agg row). Runs BEFORE phash/caption tiers so near-dup blocking never
    pays for bit-identical copies."""
    h = corpus.select(
        F.col(id_col), F.md5(F.col(bytes_col)).alias("content_md5")
    )
    reps = h.groupBy("content_md5").agg(F.min(id_col).alias("rep_id"))
    return h.join(reps, "content_md5").select(id_col, "rep_id", "content_md5")


__all__ = [
    "phash_near_dups",
    "phash_dedup_reps",
    "exact_bytes_dedup_reps",
    "caption_dup_pairs",
    "joint_dedup_reps",
    "aspect_bucket_stats",
    "phash_near_dups_verified",
    "image_stats_by_format",
    "image_size_gate",
    "ASPECT_BUCKETS",
]
