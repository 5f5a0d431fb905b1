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


# ---------------------------------------------------------- restrict_xpaths

RX_PAGE = """
<html><body>
  <div id="content"><section><a href="/c1">c</a></section></div>
  <div class="nav side"><ul><li><a href="/n1">n</a></li><li><a href="/n2">n</a></li></ul></div>
  <div><p><a href="/p1">p</a></p><span><a href="/s1">s</a></span></div>
  <footer><a href="/f1">f</a></footer>
</body></html>
"""

_B = "http://x.test"


def _rx(xpaths, css=()):
    return extract_links_from_html(
        RX_PAGE, _B + "/", restrict_css=css, restrict_xpaths=xpaths
    )


def test_restrict_xpaths_subset():
    """F8 restrict_xpaths (ref: lxmlhtml.py restrict_xpaths ≈L150) over
    the documented //tag / [@attr='v'] / contains() subset."""
    # descendant region by id — deep nesting included
    assert _rx(("//div[@id='content']",)) == [_B + "/c1"]
    # wildcard step with predicate
    assert _rx(("//*[@id='content']",)) == [_B + "/c1"]
    # contains() on a multi-class attribute
    assert _rx(("//div[contains(@class,'nav')]",)) == [_B + "/n1", _B + "/n2"]
    # child combinator: //div/p selects the p region, not the span
    assert _rx(("//div/p",)) == [_B + "/p1"]
    # absolute anchored path
    assert _rx(("/html/body/footer",)) == [_B + "/f1"]
    # absolute anchor that does NOT start at the root matches nothing
    assert _rx(("/body/footer",)) == []
    # union of several xpaths, document order preserved
    assert _rx(("//footer", "//div[@id='content']")) == [_B + "/c1", _B + "/f1"]
    # css and xpath regions union (upstream concatenates both)
    assert _rx(("//div/p",), css=("footer",)) == [_B + "/p1", _B + "/f1"]


def test_restrict_xpaths_unsupported_raises():
    import pytest

    with pytest.raises(ValueError):
        _rx(("//div[position()=1]",))
    with pytest.raises(ValueError):
        _rx(("",))


def test_engine_restrict_xpaths_e2e(spark):
    """F8 through the engine config: a real crawl only follows links in
    the restricted region."""
    import http.server
    import threading

    import pandas as pd

    from scrapy_spark.config import CrawlConfig
    from scrapy_spark.sources.store import MemoryStore
    from scrapy_spark.streaming.engine import CrawlEngine

    hits = set()

    class Site(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            hits.add(self.path)
            body = b"<html></html>"
            if self.path == "/start":
                body = (
                    b'<html><body><div id="content"><a href="/keep">k</a></div>'
                    b'<div><a href="/skip">s</a></div></body></html>'
                )
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Site)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        site = f"http://127.0.0.1:{srv.server_address[1]}"
        store = MemoryStore(spark)
        cfg = CrawlConfig(
            fetch_backend="http",
            robotstxt_obey=False,
            epoch_budget=64,
            max_epochs=4,
            depth_limit=3,
            depth_priority=1,
            queue_order="fifo",
            download_timeout_s=10.0,
            restrict_xpaths=("//div[@id='content']",),
        )
        eng = CrawlEngine(
            spark,
            cfg,
            store,
            url_map=spark.createDataFrame([], "url_canon string, image_id string"),
            graph=spark.createDataFrame([], "src_canon string, dst_url string"),
            robots=spark.createDataFrame([], "domain string, rules string"),
        )
        eng.bootstrap(
            pd.DataFrame({"url": [f"{site}/start"], "priority": [0]}),
            pd.DataFrame(
                {"slot": ["127.0.0.1"], "delay_ms": [0], "concurrency": [8]}
            ),
        )
        eng.run()
    finally:
        srv.shutdown()
    assert "/keep" in hits and "/skip" not in hits


# ---------------------------------------------------- captions (C13 × J8)
def test_link_entries_anchor_text_and_alt():
    from scrapy_spark.functions.linkextract import (
        extract_link_entries_from_html,
    )

    html = (
        "<html><body>"
        '<a href="/a">  click \n here  </a>'
        '<a href="/b"><img src="/t.png" alt="a brown fox"> ignored text</a>'
        '<a href="/c"></a>'
        '<map><area href="/d" alt="area caption"></map>'
        '<a href="/e" rel="nofollow">never</a>'
        "</body></html>"
    )
    got = extract_link_entries_from_html(html, "http://x/")
    assert got == [
        ("http://x/a", "click here"),  # whitespace collapsed
        ("http://x/b", "a brown fox"),  # img alt beats anchor text
        ("http://x/c", None),  # empty → None
        ("http://x/d", "area caption"),
        # nofollow dropped entirely
    ]


def test_link_entries_img_src_mode_and_first_caption_wins():
    from scrapy_spark.functions.linkextract import (
        extract_link_entries_from_html,
    )

    html = (
        '<img src="/i1.png" alt="standalone alt">'
        '<img src="/i2.png">'
        '<a href="/p">first words</a>'
        '<a href="/p">second words</a>'  # dup URL: first caption wins
    )
    # default: <img> is not a link source
    assert [u for u, _ in extract_link_entries_from_html(html, "http://x/")] == [
        "http://x/p"
    ]
    got = extract_link_entries_from_html(html, "http://x/", extract_imgs=True)
    assert got == [
        ("http://x/i1.png", "standalone alt"),
        ("http://x/i2.png", None),
        ("http://x/p", "first words"),
    ]


def test_link_entries_unclosed_anchor_and_imgs_inside_anchor():
    from scrapy_spark.functions.linkextract import (
        extract_link_entries_from_html,
    )

    # missing </a>: the next anchor implicitly closes it (browser rule)
    html = '<a href="/a">alpha <a href="/b">beta</a>'
    got = extract_link_entries_from_html(html, "http://x/")
    assert got == [("http://x/a", "alpha"), ("http://x/b", "beta")]
    # extract_imgs: the wrapped img is BOTH the anchor's caption and a link
    html2 = '<a href="/page"><img src="/pic.png" alt="wrapped"></a>'
    got2 = extract_link_entries_from_html(
        html2, "http://x/", extract_imgs=True
    )
    assert got2 == [("http://x/page", "wrapped"), ("http://x/pic.png", "wrapped")]


def test_explode_page_links_caption_column(spark):
    from scrapy_spark.functions.linkextract import explode_page_links

    pages = spark.createDataFrame(
        [
            (
                "http://x/p",
                '<a href="/u"><img src="/u.png" alt="the alt"></a>'
                '<a href="/v">plain</a>',
            )
        ],
        "url_canon string, html string",
    )
    rows = {
        r.dst_url: r.link_caption
        for r in explode_page_links(pages).collect()
    }
    assert rows == {"http://x/u": "the alt", "http://x/v": "plain"}


# ------------------------------------------------- meta refresh (U21)
def test_meta_refresh_target_matrix(spark):
    """JVM-side <meta http-equiv=refresh> extraction: both attribute
    orders, all three quoting styles, entity-decoded URLs, maxdelay
    gate (strict <), no-url and noscript-wrapped tags ignored — the
    w3lib.get_meta_refresh surface MetaRefreshMiddleware consumes."""
    from pyspark.sql import functions as F

    from scrapy_spark.functions.linkextract import meta_refresh_target

    cases = [
        ('<meta http-equiv="refresh" content="5; url=http://a/b">', "http://a/b"),
        ("<META CONTENT='0;URL=/rel' HTTP-EQUIV=REFRESH>", "/rel"),  # order B
        ("<meta http-equiv=refresh content=3;url=http://bare>", "http://bare"),
        ('<meta http-equiv="refresh" content="100; url=http://slow">', None),
        ('<meta http-equiv="refresh" content="99.5; url=http://ok">', "http://ok"),
        ('<meta http-equiv="refresh" content="5">', None),  # no url= part
        ('<noscript><meta http-equiv="refresh" content="0;url=/ns"></noscript>', None),
        ('<meta http-equiv="refresh" content="1;url=\'/q?a=1&amp;b=2\'">', "/q?a=1&b=2"),
        ('<meta name="x" content="y"><meta http-equiv="refresh" content="0;url=/second">', "/second"),
        # w3lib strips comments BEFORE matching: a commented-out refresh
        # must not be followed (the real page wins)
        ('<!-- <meta http-equiv="refresh" content="0;url=/old"> --><p>live</p>', None),
        # w3lib's interval regex is (\d*\.)?\d+ — bare fractions count
        ('<meta http-equiv="refresh" content=".5; url=/frac">', "/frac"),
        ("plain text", None),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, c) for i, (c, _) in enumerate(cases)], "i int, html string"
    )
    got = {
        r.i: r.mr
        for r in df.select(
            "i", meta_refresh_target(F.col("html")).alias("mr")
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_meta_refresh_ignore_tags_configurable(spark):
    from pyspark.sql import functions as F

    from scrapy_spark.functions.linkextract import meta_refresh_target

    html = '<script><meta http-equiv="refresh" content="0;url=/js"></script>'
    df = spark.createDataFrame([(html,)], "html string")
    # default ignore list is ("noscript",): script content IS scanned,
    # matching upstream's post-2.11.2 METAREFRESH_IGNORE_TAGS
    assert (
        df.select(meta_refresh_target(F.col("html")).alias("m")).first().m == "/js"
    )
    assert (
        df.select(
            meta_refresh_target(
                F.col("html"), ignore_tags=("script", "noscript")
            ).alias("m")
        ).first().m
        is None
    )
