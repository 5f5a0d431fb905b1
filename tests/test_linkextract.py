"""C13 link extraction + S5 sitemap parsing (ref:
linkextractors/lxmlhtml.py ≈L40, spiders/sitemap.py ≈L15). Pure-Python
semantics plus the exploded Spark surface."""

from scrapy_spark.functions.linkextract import (
    explode_page_links,
    extract_links_from_html,
    parse_sitemap,
    sitemap_urls_from_robots,
)

PAGE = """
<html><head><base href="http://base.example/sub/"></head><body>
<a href="/abs">abs</a>
<a href="rel/page">rel</a>
<a href="http://other.example/x">other</a>
<a href="#frag">frag-only</a>
<a href="javascript:void(0)">js</a>
<a rel="nofollow" href="http://spam.example/">nofollow</a>
<area href="map/area">
<a href="/abs">dup</a>
</body></html>
"""


def test_extract_resolves_base_and_filters():
    links = extract_links_from_html(PAGE, "http://page.example/p/1")
    assert links == [
        "http://base.example/abs",  # <base> wins over page url
        "http://base.example/sub/rel/page",
        "http://other.example/x",
        "http://base.example/sub/map/area",  # <area> extracted too
    ]  # fragment-only, javascript:, nofollow, and the dup are gone


def test_extract_without_base_uses_page_url():
    links = extract_links_from_html('<a href="x">l</a>', "http://p.example/a/b")
    assert links == ["http://p.example/a/x"]


def test_extract_malformed_html_keeps_prefix():
    html = '<a href="http://ok.example/1">x</a><a href="http://ok.example/2"'
    assert "http://ok.example/1" in extract_links_from_html(html, "http://p/")


def test_parse_sitemap_urlset_and_index():
    urlset = """<?xml version="1.0"?>
    <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <url><loc>http://a.example/1</loc></url>
      <url><loc> http://a.example/2 </loc></url>
    </urlset>"""
    pages, children = parse_sitemap(urlset)
    assert pages == ["http://a.example/1", "http://a.example/2"]
    assert children == []
    index = """<sitemapindex>
      <sitemap><loc>http://a.example/sm1.xml</loc></sitemap>
    </sitemapindex>"""
    pages, children = parse_sitemap(index)
    assert pages == []
    assert children == ["http://a.example/sm1.xml"]
    assert parse_sitemap("not xml <<<") == ([], [])


def test_sitemap_lines_in_robots():
    txt = "User-agent: *\nDisallow: /x\nSitemap: http://a.example/sm.xml\nsitemap:http://b.example/s.xml\n"
    assert sitemap_urls_from_robots(txt) == [
        "http://a.example/sm.xml",
        "http://b.example/s.xml",
    ]


def test_explode_page_links_spark(spark):
    df = spark.createDataFrame(
        [
            (PAGE, "http://page.example/p/1"),
            ("<p>no links</p>", "http://page.example/p/2"),
        ],
        "html string, url_canon string",
    )
    out = explode_page_links(df)
    rows = [(r["url_canon"], r["dst_url"]) for r in out.collect()]
    assert ("http://page.example/p/1", "http://base.example/abs") in rows
    assert all(u != "http://page.example/p/2" for u, _ in rows)  # no-link page → 0 rows
    assert "html" not in out.columns
