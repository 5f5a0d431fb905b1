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


__all__ = [
    "phash_near_dups",
    "phash_dedup_reps",
    "image_stats_by_format",
    "image_size_gate",
]
