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


def heuristic_rules(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """C4/Gopher-style per-document heuristic filters (the public
    recipes' rule set, applied before any model-based scoring):

    - ``n_words``, ``mean_word_len`` — Gopher keeps docs with 50–100k
      words and mean word length 3–10;
    - ``frac_lines_end_punct`` — C4 drops pages whose lines don't end
      in terminal punctuation (kept as the raw fraction here);
    - ``symbol_word_ratio`` — (# of '#', '{', '}', '|' symbols) / words,
      Gopher drops > 0.1 (code/boilerplate tell);
    - ``has_blocklist`` — C4's exact-phrase tells ('lorem ipsum',
      '{'-heavy javascript boilerplate marker);
    - ``keep`` — the conjunction, one boolean per doc.

    Pure Column algebra over one scan (split/filter/aggregate) — no
    Python, no shuffle; ratios rounded to 4 so the DuckDB oracle can
    hash-match (per-row rounding of identical doubles, not aggregates).
    """
    stage1 = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("__text"),
        F.expr(
            f"filter(split({text_col}, '[ \\n\\t]+'), x -> x != '')"
        ).alias("__words"),
        F.expr(
            f"filter(transform(split({text_col}, '\\n'), x -> trim(x)),"
            " x -> x != '')"
        ).alias("__lines"),
    )
    n_words = F.size("__words")
    n_lines = F.size("__lines")
    mean_wl = F.when(n_words == 0, F.lit(0.0)).otherwise(
        F.round(
            F.aggregate(
                F.col("__words"),
                F.lit(0).cast("long"),
                lambda acc, w: acc + F.length(w),
            ).cast("double")
            / n_words,
            4,
        )
    )
    end_punct = F.when(n_lines == 0, F.lit(0.0)).otherwise(
        F.round(
            F.size(
                F.expr("filter(__lines, x -> x rlike '[.!?\"]$')")
            ).cast("double")
            / n_lines,
            4,
        )
    )
    n_symbols = (
        F.length("__text")
        - F.length(F.translate(F.col("__text"), "#{}|", ""))
    )
    sym_ratio = F.when(n_words == 0, F.lit(0.0)).otherwise(
        F.round(n_symbols.cast("double") / n_words, 4)
    )
    low = F.lower(F.col("__text"))
    blocklist = low.contains("lorem ipsum") | low.contains("javascript")
    out = stage1.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        end_punct.alias("frac_lines_end_punct"),
        sym_ratio.alias("symbol_word_ratio"),
        blocklist.alias("has_blocklist"),
    )
    keep = (
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100_000)
        & (F.col("mean_word_len") >= 3)
        & (F.col("mean_word_len") <= 10)
        & (F.col("symbol_word_ratio") <= 0.1)
        & ~F.col("has_blocklist")
    )
    return out.withColumn("keep", keep)


__all__ = ["repetition_stats", "heuristic_rules"]
