"""Benchmark-contamination detection — flag corpus documents that share
long n-grams with an evaluation set (the decontamination step every
serious training-data pipeline runs before training: eval questions that
leak into the corpus inflate benchmark scores).

Shape at 100 TB: the probe side (eval sets) is tiny — thousands of
documents — so its n-gram set BROADCASTS; the corpus side streams one
explode → broadcast-hash semi-join, no shuffle of corpus data at all.
N-grams are compared as md5-derived 64-bit hashes (the same
``md5_number_upper``-replicable family as the MinHash/winnowing ops), so
the join keys are fixed-width longs, not strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: token pattern shared with datapipe.text / the DuckDB oracles
_TOKEN_RE = "([a-z0-9]+)"


def _ngram_hashes(
    df: DataFrame, text_col: str, n: int, out: str
) -> DataFrame:
    """id-preserving explode: one row per n-gram, hashed to a signed
    64-bit long via md5 (bit-compatible with DuckDB md5_number_upper)."""
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '{_TOKEN_RE}', 1)")
    d = df.withColumn("__t", toks)
    grams = F.when(
        F.size("__t") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("__t") - (n - 1)),
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(F.col("__t"), i + k) for k in range(n)],
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # 2^63 as a decimal literal (exceeds LongType, so no F.lit(int))
    two63 = F.lit("9223372036854775808").cast("decimal(20,0)")
    gram_hash = (
        F.conv(F.substring(F.md5(F.col("__g")), 1, 16), 16, 10).cast(
            "decimal(20,0)"
        )
        - two63
    )
    return (
        d.withColumn("__g", F.explode(grams))
        .withColumn(out, gram_hash.cast("long"))
        .drop("__t", "__g")
    )


def contamination_flags(
    docs: DataFrame,
    probes: DataFrame,
    n: int = 8,
    doc_id: str = "doc_id",
    doc_text: str = "text",
    probe_id: str = "probe_id",
    probe_text: str = "text",
) -> DataFrame:
    """→ (doc_id, probe_id, n_shared): corpus docs sharing ≥1 token
    n-gram with an eval probe, with the count of distinct shared grams.
    Probe grams broadcast; corpus grams stream into the join. A doc can
    match several probes — one row each; filter ``n_shared`` against a
    threshold to tune precision."""
    pg = _ngram_hashes(
        probes.select(F.col(probe_id).alias("probe_id"), F.col(probe_text)),
        probe_text,
        n,
        "gh",
    ).select("probe_id", "gh").distinct()
    dg = _ngram_hashes(
        docs.select(F.col(doc_id).alias("doc_id"), F.col(doc_text)),
        doc_text,
        n,
        "gh",
    ).select("doc_id", "gh").distinct()
    return (
        dg.join(F.broadcast(pg), "gh")
        .groupBy("doc_id", "probe_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


__all__ = ["contamination_flags"]
