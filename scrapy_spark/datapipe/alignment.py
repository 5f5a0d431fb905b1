"""Image–text alignment gating (CLIP-score-style filter).

The canonical web-scale image-corpus op this family of pipelines runs
after crawling and dedup (LAION-5B's pipeline is the public blueprint:
keep an (image, caption) pair only when the cosine similarity of the
image embedding and the text embedding clears a threshold — ~0.28 for
CLIP ViT-B/32). Embeddings arrive as ``array<float>`` columns; this
module treats them as opaque vectors, so any encoder works.

Scale shape: every op here is a single scan + JVM Column algebra
(``zip_with`` + ``aggregate`` fold, shared with datapipe/similarity.py) —
no Python in the hot path, no shuffle except the histogram's one
hash-agg. At 10^10 rows the gate is embarrassingly parallel; the
histogram reduces to ~100 bins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import as_double, dot


def alignment_scores(
    pairs: DataFrame,
    img_col: str = "img_emb",
    txt_col: str = "txt_emb",
    round_dp: int = 4,
) -> DataFrame:
    """Per-row image↔caption cosine: adds ``align_cos`` (rounded to
    ``round_dp`` so thresholds and oracles agree at the rim), drops the
    embedding columns. Zero-norm vectors (dead encoder output) yield
    NULL, which every downstream gate treats as not-aligned."""
    vi, vt = as_double(F.col(img_col)), as_double(F.col(txt_col))
    ni, nt = F.sqrt(dot(vi, vi)), F.sqrt(dot(vt, vt))
    cos = F.when(
        (ni > 0) & (nt > 0), F.round(dot(vi, vt) / (ni * nt), round_dp)
    )
    return pairs.withColumn("align_cos", cos).drop(img_col, txt_col)


def alignment_gate(
    pairs: DataFrame,
    min_cos: float = 0.28,
    img_col: str = "img_emb",
    txt_col: str = "txt_emb",
) -> DataFrame:
    """Keep/drop flag per pair: ``kept`` = align_cos ≥ ``min_cos``
    (NULL-safe false). Returns every row with its score and verdict —
    materializing the verdict instead of filtering keeps the drop set
    auditable, which corpus curation always wants; callers chasing pure
    throughput filter on the flag (a plain pushed-down predicate)."""
    scored = alignment_scores(pairs, img_col=img_col, txt_col=txt_col)
    return scored.withColumn(
        "kept",
        F.coalesce(F.col("align_cos") >= F.lit(min_cos), F.lit(False)),
    )


def alignment_histogram(
    pairs: DataFrame,
    bin_width: float = 0.05,
    img_col: str = "img_emb",
    txt_col: str = "txt_emb",
) -> DataFrame:
    """Score distribution for threshold tuning: (bin_lo, n) with
    bin_lo = floor(align_cos / bin_width) · bin_width rounded to 4dp.
    One scan + one tiny hash-agg (≤ 2/bin_width + 1 groups); the curve
    is what you eyeball before committing a corpus-wide ``min_cos``."""
    scored = alignment_scores(pairs, img_col=img_col, txt_col=txt_col)
    bin_lo = F.round(
        F.floor(F.col("align_cos") / F.lit(bin_width)) * F.lit(bin_width), 4
    )
    return (
        scored.filter(F.col("align_cos").isNotNull())
        .groupBy(bin_lo.alias("bin_lo"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bin_lo")
    )


__all__ = ["alignment_scores", "alignment_gate", "alignment_histogram"]
