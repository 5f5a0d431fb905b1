"""HTML → main-content extraction (datapipe/htmltext.py): boilerplate
discriminators, entity decode, sentinel-based link density — all pure
JVM column algebra (the contract oracle `html_extract_text` proves
byte-parity with the DuckDB re-expression; these tests pin the
behaviors)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scrapy_spark.datapipe.htmltext import extract_text, synth_page


def _extract(spark, html: str, **kw) -> tuple[str, int]:
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    r = extract_text(df, **kw).collect()[0]
    return r.text, r.n_lines


def test_script_style_and_comments_removed(spark):
    text, n = _extract(
        spark,
        "<html><body><p>real prose with five words</p>"
        "<script>var x = 'not prose but code';</script>"
        "<style>body { color: red }</style>"
        "<!-- a comment with many words inside it --></body></html>",
    )
    assert text == "real prose with five words" and n == 1


def test_link_dense_nav_and_footer_dropped(spark):
    text, n = _extract(
        spark,
        '<div><a href="/">Home</a> <a href="/x">About us</a></div>'
        "<p>this paragraph is genuine readable content</p>"
        '<div><a href="/tos">Terms of service</a> © 2026</div>',
    )
    assert text == "this paragraph is genuine readable content" and n == 1


def test_short_lines_dropped_by_min_words(spark):
    text, n = _extract(
        spark,
        "<p>Menu</p><p>two words</p><p>three whole words</p>",
        min_words=3,
    )
    assert text == "three whole words" and n == 1


def test_entities_decoded_once(spark):
    text, _ = _extract(
        spark,
        "<p>Tom &amp; Jerry &lt;3 &quot;cheese&quot; &amp;amp; more</p>",
    )
    # &amp; decodes last, so the double-encoded &amp;amp; yields the
    # literal text "&amp;" — never a second decode pass
    assert text == 'Tom & Jerry <3 "cheese" &amp; more'


def test_block_boundaries_split_lines(spark):
    text, n = _extract(
        spark,
        "<p>first paragraph has words</p><p>second paragraph has "
        "words</p><div>a div block counts too</div>",
    )
    assert text.split("\n") == [
        "first paragraph has words",
        "second paragraph has words",
        "a div block counts too",
    ]
    assert n == 3


def test_inline_tags_do_not_split_or_survive(spark):
    text, n = _extract(
        spark,
        "<p>some <b>bold</b> and <em>emphasised</em> inline words</p>",
    )
    assert text == "some bold and emphasised inline words" and n == 1


def test_prose_with_moderate_links_survives(spark):
    # one short anchor inside a long sentence: density under the bar
    text, _ = _extract(
        spark,
        '<p>read the <a href="/d">docs</a> for the full and complete '
        "story of this operator</p>",
    )
    assert "read the docs for the full" in text


def test_synth_page_round_trip_keeps_exact_prose(spark):
    df = spark.createDataFrame(
        [(7, "alpha beta gamma delta epsilon\nzeta eta theta iota")],
        "doc_id long, text string",
    )
    pages = df.select(
        "doc_id", synth_page(F.col("text"), F.col("doc_id")).alias("html")
    )
    r = extract_text(pages).collect()[0]
    lines = r.text.split("\n")
    assert "alpha beta gamma delta epsilon" in lines
    assert "zeta eta theta iota" in lines
    # chrome is gone
    assert "Home" not in r.text and "Terms" not in r.text
    assert "tracker" not in r.text and "margin" not in r.text
