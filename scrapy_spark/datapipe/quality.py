"""Repetition-based quality signals — the Gopher-rules-style filters a
training-data pipeline runs per document (duplicate-line fraction,
most-frequent-bigram mass) to drop boilerplate/spam before dedup even
sees it.

All JVM-side Column algebra (split/transform/element_at + one explode
for the bigram mass) — no Python in the path; the explode is the same
shape as the shingle ops in dedup.py and holds at corpus scale (rows ×
tokens, map-side aggregated before the per-doc combine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (doc_id, n_lines, dup_line_frac, top_bigram_frac):

    - ``dup_line_frac``: 1 − distinct/total over trimmed non-empty lines
      (0 for ≤1 line) — catches copy-pasted boilerplate;
    - ``top_bigram_frac``: share of all token bigrams taken by the most
      frequent one (0 when <2 tokens) — catches keyword stuffing."""
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    n_lines = F.size(lines)
    dup_line_frac = F.when(n_lines <= 1, F.lit(0.0)).otherwise(
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(lines)).cast("double") / n_lines,
            4,
        )
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        n_lines.alias("n_lines"),
        dup_line_frac.alias("dup_line_frac"),
        F.expr(f"regexp_extract_all(lower({text_col}), '([a-z0-9]+)', 1)").alias(
            "__t"
        ),
    )
    grams = base.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("__t") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("__t") - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(F.col("__t"), i),
                        F.element_at(F.col("__t"), i + 1),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )
    gstats = (
        grams.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.max("c").cast("double") / F.sum("c"), 4
            ).alias("top_bigram_frac")
        )
    )
    return base.drop("__t").join(gstats, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        "dup_line_frac",
        F.coalesce(F.col("top_bigram_frac"), F.lit(0.0)).alias(
            "top_bigram_frac"
        ),
    )


__all__ = ["repetition_stats"]
