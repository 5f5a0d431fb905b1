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


def test_restrict_css_subset():
    """F8 restrict_css analog (ref: lxmlhtml.py restrict_css ≈L150):
    only links under a matching ancestor are extracted; the documented
    selector subset is tag / .class / #id / tag.class / tag#id."""
    from scrapy_spark.functions.linkextract import extract_links_from_html

    html = """
    <html><body>
      <div class="nav boxed"><a href="/nav1">n</a><a href="/nav2">n</a></div>
      <div id="content"><p><a href="/story">s</a></p></div>
      <footer><a href="/foot">f</a></footer>
    </body></html>
    """
    base = "http://x.example/p"
    all_links = extract_links_from_html(html, base)
    assert len(all_links) == 4
    nav = extract_links_from_html(html, base, restrict_css=("div.nav",))
    assert nav == ["http://x.example/nav1", "http://x.example/nav2"]
    content = extract_links_from_html(html, base, restrict_css=("#content",))
    assert content == ["http://x.example/story"]
    both = extract_links_from_html(html, base, restrict_css=("div.nav", "footer"))
    assert both == [
        "http://x.example/nav1",
        "http://x.example/nav2",
        "http://x.example/foot",
    ]
    # the anchor itself can be the selected element
    direct = extract_links_from_html(
        '<a class="cta" href="/go">g</a><a href="/skip">s</a>',
        base,
        restrict_css=("a.cta",),
    )
    assert direct == ["http://x.example/go"]
