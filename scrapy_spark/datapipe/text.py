"""Text analysis over a documents table (doc_id, text, ...).

All tokenization-derived ops use one shared JVM-side token expression so
Spark results and the DuckDB oracles agree byte-for-byte:
``regexp_extract_all(lower(text), '[a-z0-9]+')``. No Python in the hot
path except the winnowing fingerprint sketch (Arrow-batched, numpy).

At 100 TB these are embarrassingly parallel map-only stages: no shuffle,
filters and projections push to the parquet scan, and every expression is
whole-stage-codegen eligible.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

TOKEN_RE = "[a-z0-9]+"
NON_PUNCT_RE = "[^.,;:!?]"  # strip these → what's left is the punctuation

# Tiny deterministic stopword profiles for the language-ID heuristic.
# Order matters: ties break toward the earlier language.
LANG_PROFILES: list[tuple[str, list[str]]] = [
    ("en", ["the", "a", "of", "and", "to", "is"]),
    ("de", ["der", "die", "das", "und", "ist", "nicht"]),
    ("fr", ["le", "la", "les", "et", "est", "une"]),
    ("es", ["el", "los", "las", "es", "una", "que"]),
]
EN_STOPWORDS = LANG_PROFILES[0][1]


def tokens(col: Column) -> Column:
    """Lowercase alnum tokens, JVM-side."""
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_RE), 0)


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc token counting: total, distinct, type-token ratio, mean
    token length — all built-in array functions (no UDF, no shuffle).

    Tokens are materialized into a column first (as in dedup.shingles):
    referencing the regexp expression from every derived column would
    re-run the extraction per reference."""
    df = df.withColumn("__toks", tokens(F.col(text_col)))
    t = F.col("__toks")
    n = F.size(t)
    total_len = F.aggregate(
        t, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_uniq_tokens"),
        F.round(
            F.when(n > 0, F.size(F.array_distinct(t)) / n).otherwise(F.lit(0.0)), 4
        ).alias("ttr"),
        F.round(
            F.when(n > 0, total_len / n).otherwise(F.lit(0.0)), 4
        ).alias("avg_token_len"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality score in [0,1]: length saturation + low
    punctuation density + stopword presence (the classic C4/Gopher-style
    cheap filters, composed deterministically)."""
    df = df.withColumn("__toks", tokens(F.col(text_col)))
    t = F.col("__toks")
    n = F.size(t)
    n_chars = F.length(F.col(text_col))
    punct = F.length(F.regexp_replace(F.col(text_col), NON_PUNCT_RE, ""))
    stop_hits = F.size(
        F.filter(t, lambda x: x.isin(*EN_STOPWORDS))
    )
    len_component = F.least(n / F.lit(100.0), F.lit(1.0))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n > 0, stop_hits / n).otherwise(F.lit(0.0))
    score = F.round(
        0.3 * len_component + 0.3 * (1.0 - punct_ratio) + 0.4 * F.least(stop_ratio * 5.0, F.lit(1.0)),
        4,
    )
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        score.alias("quality"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic stopword-profile language ID. Scores each profile by
    stopword hit count over the token list; argmax with fixed tie-break
    order (profile order), 'und' when nothing hits."""
    df = df.withColumn("__toks", tokens(F.col(text_col)))
    t = F.col("__toks")

    def _hits(words: list[str]) -> Column:
        return F.size(F.filter(t, lambda x: x.isin(*words)))

    scores = {lang: _hits(words) for lang, words in LANG_PROFILES}
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    # build CASE from last profile to first so earlier profiles win ties
    for lang, _ in reversed(LANG_PROFILES):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    sel = [F.col(id_col), pred.alias("pred_lang")]
    sel += [scores[lang].alias(f"score_{lang}") for lang, _ in LANG_PROFILES]
    return df.select(*sel)


# BPE-ish tokenization regex: GPT-2's pattern minus the lookahead clauses
# (RE2/DuckDB can't express lookahead, and the oracle must run the SAME
# pattern): contraction suffixes, space-prefixed letter runs, digit runs,
# punctuation runs. Counts track real BPE token counts closely enough for
# budget estimation — the standard cheap pre-tokenizer cost model.
BPE_ISH_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+"


def token_count_estimate(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Training-budget token counting (the brief's 'whitespace + BPE-ish
    regex'): whitespace tokens, BPE-ish subword tokens, and chars per
    subword token — all JVM regexp builtins, map-only, no UDF."""
    ws = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    n_ws = F.when(F.length(F.trim(F.col(text_col))) > 0, ws).otherwise(F.lit(0))
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_RE), 0))
    return df.select(
        F.col(id_col),
        n_ws.alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
        F.round(
            F.when(bpe > 0, F.length(F.col(text_col)) / bpe).otherwise(F.lit(0.0)),
            4,
        ).alias("chars_per_bpe_token"),
    )


# --------------------------------------------------------------- winnowing
_WINNOW_SCHEMA = T.ArrayType(T.LongType())


def _token_hash64(tok: str) -> int:
    d = hashlib.md5(tok.encode("utf-8")).digest()
    return int.from_bytes(d[:8], "little", signed=True)


def _winnow_one(text: str, k: int, w: int) -> list[int]:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD'03):
    hash every k-gram of tokens, slide a window of w hashes, keep the
    rightmost minimum per window; return sorted distinct fingerprints."""
    toks = _winnow_tokenize(text)
    if len(toks) < k:
        return []
    hashes = [
        _token_hash64(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)
    ]
    if len(hashes) <= w:
        return sorted({min(hashes)})
    out: set[int] = set()
    for i in range(len(hashes) - w + 1):
        window = hashes[i : i + w]
        m = min(window)
        # rightmost minimum (robust winnowing)
        idx = len(window) - 1 - window[::-1].index(m)
        out.add(hashes[i + idx])
    return sorted(out)


def _winnow_tokenize(text: str) -> list[str]:
    import re

    return re.findall(TOKEN_RE, text.lower())


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Per-doc winnowing fingerprint set as array<long> (Arrow-batched).
    Two docs sharing any fingerprint share a k-token span — the standard
    near-dup/plagiarism sketch; downstream candidate pairs = explode +
    self-join on fingerprint (same shape as dedup.jaccard_pairs)."""

    @pandas_udf(_WINNOW_SCHEMA)
    def _winnow(texts: pd.Series) -> pd.Series:
        return pd.Series([_winnow_one(t or "", k, w) for t in texts])

    return df.select(
        F.col(id_col), _winnow(F.col(text_col)).alias("fingerprints")
    )


def top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-document top-k characteristic terms — the TF-IDF shape
    (keyword extraction / topic tagging in a training-data pipeline):
    per-doc term frequency × corpus-level rarity, ranked per doc.

    Rarity is the EXACT integer surrogate ``score = tf × (N − df)``
    (N = corpus docs, df = document frequency) instead of the usual
    ``tf · log(N/df)``: same ordering behavior for ranking, but integer
    arithmetic end-to-end, so the DuckDB oracle matches bit-for-bit
    (libm ``log`` can differ across engines in the last ulp, which a
    rank boundary would amplify). Ties broken by term ascending —
    deterministic total order.

    Plan: token explode → (doc, term) hash-agg (tf) → term hash-agg
    (df, with map-side combine) → broadcast-or-shuffle join back →
    per-doc window top-k. The df table is |vocab|-sized — tiny relative
    to the corpus, broadcastable at any realistic scale."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(id_col).distinct().count()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(dfreq), "term").withColumn(
        "score", F.col("tf") * (F.lit(n_docs) - F.col("df"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "rank")
    )


def corpus_mix(
    df: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Corpus-composition report: per ``group_col`` bucket (source,
    domain, language, …) its document count, token count, token share in
    exact integer parts-per-million, and the cumulative token coverage
    in descending-token rank order — the "what fraction of the corpus do
    the top-N sources cover" table every dataset card publishes.

    Shares use integer division (n_tokens·10⁶ div total) so the output
    is bit-deterministic across engines — no float rounding boundary.

    Scale shape: one scan + map-side-combining hash-agg down to one row
    per bucket; the rank/cumsum windows then run over that aggregate
    (thousands of rows at web scale — the deliberate exception to the
    no-single-partition-window rule, on post-aggregation data only)."""
    agg = (
        df.select(F.col(group_col).alias("bucket"), tokens(F.col(text_col)).alias("__t"))
        .select("bucket", F.size("__t").cast("long").alias("__n"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").alias("n_tokens"),
        )
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_rank = Window.orderBy(F.desc("n_tokens"), F.asc("bucket"))
    return (
        agg.withColumn("__total", F.sum("n_tokens").over(w_all))
        .withColumn(
            "tok_ppm",
            # widen to decimal BEFORE the ×10⁶: bigint wraps (silently,
            # in non-ANSI mode) once a bucket passes ~9.2e12 tokens —
            # inside the 10^13-token design point. decimal(38,0) keeps
            # headroom to 10^32 tokens and DIV stays exact integer math.
            F.expr(
                "CAST(CAST(n_tokens AS DECIMAL(38,0)) * 1000000 "
                "DIV __total AS BIGINT)"
            ),
        )
        .withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .withColumn(
            "cum_tokens",
            F.sum("n_tokens")
            .over(w_rank.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        .select(
            "bucket", "n_docs", "n_tokens", "tok_ppm", "rank", "cum_tokens"
        )
    )




#: Unicode-script classes as EXPLICIT codepoint ranges (not named
#: properties): \x{...} range classes mean the same thing in Java regex
#: (Spark) and RE2 (the DuckDB oracle) regardless of either engine's
#: Unicode table version — named \p{Script=...} classes do not.
SCRIPT_RANGES: tuple[tuple[str, str], ...] = (
    ("latin", r"[A-Za-z\x{00C0}-\x{024F}]"),
    ("cyrillic", r"[\x{0400}-\x{04FF}]"),
    ("greek", r"[\x{0370}-\x{03FF}]"),
    ("arabic", r"[\x{0600}-\x{06FF}]"),
    ("hebrew", r"[\x{0590}-\x{05FF}]"),
    ("devanagari", r"[\x{0900}-\x{097F}]"),
    ("cjk", r"[\x{4E00}-\x{9FFF}]"),
    ("kana", r"[\x{3040}-\x{30FF}]"),
    ("hangul", r"[\x{AC00}-\x{D7AF}]"),
    ("digit", "[0-9]"),
)


def script_mix(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    r"""Per-document Unicode-script composition — the routing signal a
    multilingual pipeline uses before language-specific processing
    (which tokenizer/lang-id model to apply, whether to drop
    mixed-script spam): per-script character counts over
    ``SCRIPT_RANGES``, total characters, and the dominant script
    (most characters; ties and all-zero resolve to the alphabetically
    first name, deterministic across engines).

    All integers + one string — hash-safe for the DuckDB oracle, which
    replays the same \x{...} range regexes under RE2. One codegen'd
    scan, a dozen ``regexp_extract_all`` counts, no shuffle, no Python
    — map-only at any corpus size."""
    counts = {
        name: F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
        ).cast("long")
        for name, pat in SCRIPT_RANGES
    }
    out = df.select(
        id_col,
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        *[c.alias(n) for n, c in counts.items()],
    )
    # dominant: max count, ties by name — greatest(structs) compares
    # fields in order, so (count, NEGATED name-rank) picks the
    # alphabetically-first name among equals
    names = sorted(n for n, _ in SCRIPT_RANGES)
    dominant = F.greatest(
        *[
            F.struct(
                F.col(n).alias("c"),
                F.lit(-i).alias("nr"),
                F.lit(n).alias("name"),
            )
            for i, n in enumerate(names)
        ]
    )["name"]
    return out.withColumn("dominant_script", dominant)


__all__ = [
    "tokens",
    "token_stats",
    "corpus_mix",
    "script_mix",
    "quality_score",
    "lang_id",
    "token_count_estimate",
    "BPE_ISH_RE",
    "winnow_fingerprints",
    "LANG_PROFILES",
    "EN_STOPWORDS",
    "TOKEN_RE",
    "top_terms",
]
