"""PII detection + redaction — the scrub pass every LLM training-data
pipeline runs before text leaves the pipeline (emails, phone numbers,
IP addresses), per the public C4/Dolma/FineWeb recipes.

All JVM-side Column algebra: ``regexp_extract_all``-based counts and a
chained ``regexp_replace`` redaction — no Python in the path, one scan,
embarrassingly parallel at any corpus size. Patterns are deliberately
kept inside the regex subset Java's engine and RE2 (DuckDB) agree on:
character classes, bounded repetition, alternation — no backrefs, no
lookaround — so the DuckDB oracle replays them verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (name, pattern, replacement) — ordered; redaction applies in order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
        "<EMAIL>",
    ),
    # international-format numbers: +country then 7-14 more digits with
    # optional single separators — conservative on purpose (precision
    # over recall: a scrub pass must not shred ordinary numbers)
    (
        "phone",
        r"\+[0-9]{1,3}[0-9 ().-]{6,14}[0-9]",
        "<PHONE>",
    ),
    (
        "ipv4",
        r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
        "<IP>",
    ),
]


def pii_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (doc_id, n_email, n_phone, n_ipv4, redacted) — per-doc match
    counts plus the redacted text (matches replaced by typed tokens, in
    PII_PATTERNS order so earlier redactions can't be re-matched)."""
    out = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text")
    )
    red = F.col("__text")
    for name, pat, repl in PII_PATTERNS:
        # Python-API regexp (F.lit pattern), NOT F.expr: a SQL string
        # literal would escape-process the pattern's backslashes
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(F.col("__text"), F.lit(pat), F.lit(0))),
        )
        red = F.regexp_replace(red, pat, repl)
    return out.select(
        "doc_id",
        *[f"n_{name}" for name, _, _ in PII_PATTERNS],
        red.alias("redacted"),
    )


def pii_oracle_sql(table: str = "documents") -> str:
    """DuckDB replica over the same patterns (RE2 dialect — identical
    semantics for this pattern subset)."""
    counts = ",\n                   ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    red = "text"
    for _, pat, repl in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return f"""
            SELECT doc_id,
                   {counts},
                   {red} AS redacted
            FROM {table}
        """


__all__ = ["pii_stats", "pii_oracle_sql", "PII_PATTERNS"]
