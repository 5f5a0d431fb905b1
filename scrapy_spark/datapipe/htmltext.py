"""HTML → main-content text extraction (training-data pipeline op).

The crawl harvests raw HTML; a training corpus wants the article text
with chrome (nav bars, footers, scripts, cookie banners) removed. This
is the simplified jusText/trafilatura-style heuristic expressed as PURE
JVM column algebra — regexp chains + per-line array lambdas, zero
Python — so at 100 TB the extraction is one codegen'd scan:

1. drop <script>/<style> blocks and HTML comments;
2. mark anchor spans with \\x01…\\x02 sentinels (so link density
   survives tag stripping), turn block-level closers into newlines,
   strip every remaining tag, decode the common entities;
3. per line: collapse whitespace, measure link density from the
   sentinels, keep lines with ≥ ``min_words`` words and link density
   ≤ ``max_link_density`` — the classic boilerplate discriminators
   (nav/footer lines are short and link-dense, body prose is neither);
4. join the surviving lines.

Every regex is written to the RE2-compatible subset (no backreferences,
no lookarounds, explicit character classes) so the Spark (Java regex)
and DuckDB (RE2) pipelines produce BYTE-IDENTICAL output — the contract
oracle (``html_extract_text``) runs the full chain in both engines over
deterministically synthesized pages and hash-compares the extracted
text.

Reference anchor: a training-data-pipeline extension (SURVEY §2
"beyond-reference" family) — upstream Scrapy extracts links and leaves
body text to user spiders (parsel); this operator is the corpus-side
complement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: anchor-span sentinels (never occur in real text; stripped on output)
_A, _B = "\x01", "\x02"

#: (pattern, replacement) chain applied to the raw html — order matters
_STRIP_STEPS = [
    # script/style blocks (content is code, never prose) + comments
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    # mark anchor TEXT so per-line link density survives tag stripping
    (r"(?is)<a[ \t][^>]*>", _A),
    (r"(?is)</a>", _B),
    # block-level boundaries → line breaks (what jusText calls blocks)
    (r"(?i)</(p|div|li|h1|h2|h3|h4|h5|h6|tr|title|ul|ol|table)>", "\n"),
    (r"(?i)<(br|hr)[^>]*>", "\n"),
    # every remaining tag is inline chrome
    (r"<[^>]*>", " "),
]

#: entity decode (the handful that matter for text stats; &amp; LAST so
#: double-encoded entities do not double-decode)
_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
]


def _strip_html(html: Column) -> Column:
    out = html
    for pat, rep in _STRIP_STEPS:
        out = F.regexp_replace(out, pat, rep)
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def extract_text(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_words: int = 3,
    max_link_density: float = 0.33,
) -> DataFrame:
    """→ (id_col, text, n_lines, n_chars): main-content extraction.

    ``min_words`` / ``max_link_density`` are the two boilerplate
    discriminators: a line survives only with at least ``min_words``
    whitespace-separated words AND at most ``max_link_density`` of its
    characters inside anchor spans (nav/footer lines fail one or both).
    """
    stripped = _strip_html(F.col(html_col))

    def keep(line: Column) -> Column:
        # link chars = span content length (sentinel-bounded), markers
        # excluded; clean = line with sentinels removed + ws collapsed
        no_span = F.regexp_replace(line, f"{_A}[^{_B}]*{_B}", "")
        n_marks = F.length(line) - F.length(
            F.replace(line, F.lit(_A), F.lit(""))
        )
        link_chars = (
            F.length(line) - F.length(no_span) - F.lit(2) * n_marks
        )
        clean = F.trim(
            F.regexp_replace(
                F.replace(
                    F.replace(line, F.lit(_A), F.lit("")),
                    F.lit(_B), F.lit(""),
                ),
                "[ \t\r]+", " ",
            )
        )
        n_words = F.size(F.split(clean, " "))
        return F.when(
            (F.length(clean) > 0)
            & (n_words >= F.lit(min_words))
            & (
                link_chars.cast("double")
                <= F.lit(max_link_density) * F.length(clean)
            ),
            clean,
        )

    lines = F.filter(
        F.transform(F.split(stripped, "\n"), keep),
        lambda c: c.isNotNull(),
    )
    return df.select(
        F.col(id_col),
        F.array_join(lines, "\n").alias("text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.length(F.array_join(lines, "\n")).cast("long").alias("n_chars"),
    )


def synth_page(text: Column, doc_id: Column) -> Column:
    """Deterministic HTML page around a document's text — the fixture
    both the Spark query and the DuckDB oracle build identically (the
    testdata tables carry plain text, not HTML): title + link-dense nav,
    the text's lines as <p> blocks, a script, an entity-bearing aside,
    and a link-dense footer. Extraction must keep exactly the prose."""
    body = F.regexp_replace(text, "\n", "</p><p>")
    return F.concat(
        F.lit(
            "<html><head><title>Synthetic page for doc "
        ),
        doc_id.cast("string"),
        F.lit(
            "</title><style>p { margin: 0 }</style></head><body>"
            '<div id="nav"><a href="/">Home</a> <a href="/a">About</a> '
            '<a href="/c">Contact</a></div>'
            "<p>"
        ),
        body,
        F.lit(
            "</p><script>var tracker = 1;</script>"
            "<p>Tom &amp; Jerry say &quot;hello&quot; to doc "
        ),
        doc_id.cast("string"),
        F.lit(
            " &lt;here&gt;</p>"
            '<div id="footer"><a href="/tos">Terms of use</a> '
            "© 2026 Example</div></body></html>"
        ),
    )


__all__ = ["extract_text", "synth_page"]
