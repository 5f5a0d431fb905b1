"""HTML link extraction + sitemap parsing (SURVEY §2.7 C13, §2.1 S5; ref:
scrapy/linkextractors/lxmlhtml.py::LxmlParserLinkExtractor ≈L40,
scrapy/spiders/sitemap.py::SitemapSpider ≈L15).

The reference extracts ``<a>``/``<area>`` hrefs with lxml and resolves
them against the response base URL; sitemaps are XML ``<loc>`` lists (or
``Sitemap:`` lines in robots.txt). lxml is not in this sandbox, so the
parsers are stdlib (``html.parser`` / ``xml.etree``) — deterministic,
pure-Python, vectorized per Arrow batch. The Spark surface is
``html:string → array<string>`` + ``explode`` feeding the identical
downstream pipeline as the fixture-graph join (operators/parse.py).

Reference predicate semantics carried over (F8 LinkExtractor):
``nofollow`` anchors dropped when ``strip_nofollow``, fragment-only and
non-http(s) schemes dropped, hrefs resolved with ``urljoin`` against the
page URL (honoring ``<base href>``), per-page uniqueness preserved in
document order (``unique=True`` default).

``restrict_css`` supports simple selectors (tag, .class, #id and tag-
qualified forms); ``restrict_xpaths`` supports the documented subset
``//step`` / ``/step`` chains where a step is ``tag`` or ``*`` with an
optional ``[@attr='v']`` / ``[contains(@attr,'v')]`` predicate — the
shapes upstream docs and real spiders overwhelmingly use. Both gate the
same ancestor-region check; full cssselect/XPath needs lxml (absent in
this container, SURVEY §0 documented-out).
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


def _selector_matches(sel: str, tag: str, d: dict) -> bool:
    """Simple-selector match: ``tag``, ``.class``, ``#id``, ``tag.class``,
    ``tag#id`` — the documented subset of restrict_css (no lxml/cssselect
    in this container; SURVEY §0 documented-out)."""
    want_tag, want_id, want_cls = sel, None, None
    if "#" in sel:
        want_tag, want_id = sel.split("#", 1)
    elif "." in sel:
        want_tag, want_cls = sel.split(".", 1)
    if want_tag and tag != want_tag:
        return False
    if want_id is not None and d.get("id") != want_id:
        return False
    if want_cls is not None and want_cls not in (d.get("class") or "").split():
        return False
    return True


def _compile_xpath(expr: str) -> list[tuple[bool, str, tuple[str, str, bool] | None]]:
    """``//div[@id='x']/p`` → [(anchored, tag, pred)] where ``anchored``
    means direct-child of the previous step (a single ``/``), ``tag`` is
    the element name or ``*``, and ``pred`` is (attr, value,
    is_contains) or None. Raises ValueError outside the documented
    subset so misuse fails loudly, as upstream does for bad XPaths."""
    import re

    steps = []
    pos = 0
    pat = re.compile(
        r"(/{1,2})"  # combinator
        r"([A-Za-z][\w-]*|\*)"  # tag or *
        r"(?:\[(?:@([\w-]+)='([^']*)'"  # [@attr='v']
        r"|contains\(@([\w-]+),\s*'([^']*)'\))\])?"  # [contains(@a,'v')]
    )
    while pos < len(expr):
        m = pat.match(expr, pos)
        if not m:
            raise ValueError(
                f"restrict_xpaths: unsupported expression {expr!r} at "
                f"offset {pos} (supported: //tag, /tag, *, [@attr='v'], "
                f"[contains(@attr,'v')])"
            )
        sep, tag, a1, v1, a2, v2 = m.groups()
        pred = None
        if a1 is not None:
            pred = (a1, v1, False)
        elif a2 is not None:
            pred = (a2, v2, True)
        steps.append((sep == "/", tag, pred))
        pos = m.end()
    if not steps:
        raise ValueError(f"restrict_xpaths: empty expression {expr!r}")
    return steps


def _xpath_matches(steps, path: list[tuple[str, dict]]) -> bool:
    """Does the open-element ``path`` (root → current) end on an element
    selected by the compiled xpath? Subsequence DP over combinators:
    ``ok[i]`` = step prefix matched ending exactly at path depth i."""

    def node_ok(step, node):
        _anch, tag, pred = step
        t, d = node
        if tag != "*" and t != tag:
            return False
        if pred is not None:
            attr, val, contains = pred
            got = d.get(attr)
            if got is None:
                return False
            if contains:
                return val in got
            return got == val
        return True

    n = len(path)
    prev: list[bool] | None = None  # ok[] for the previous step
    for si, step in enumerate(steps):
        anchored, _t, _p = step
        cur = [False] * n
        for i in range(n):
            if not node_ok(step, path[i]):
                continue
            if si == 0:
                cur[i] = (i == 0) if anchored else True
            elif anchored:
                cur[i] = i > 0 and prev[i - 1]
            else:
                cur[i] = any(prev[:i])
        prev = cur
    return bool(prev[n - 1])


class _LinkParser(HTMLParser):
    """Anchor extractor with an optional ``restrict_css`` region gate
    (F8, ref: linkextractors/lxmlhtml.py restrict_xpaths/restrict_css
    ≈L150): when selectors are given, only links with a matching OPEN
    ancestor element are kept. html.parser has no DOM, so the ancestor
    check runs on a live tag stack (void elements never push)."""

    def __init__(
        self,
        strip_nofollow: bool,
        restrict_css: tuple[str, ...] = (),
        restrict_xpaths: tuple[str, ...] = (),
        extract_imgs: bool = False,
    ):
        super().__init__(convert_charrefs=True)
        self.strip_nofollow = strip_nofollow
        self.restrict_css = restrict_css
        self._xpaths = [_compile_xpath(x) for x in restrict_xpaths]
        self._restricting = bool(restrict_css or restrict_xpaths)
        self.extract_imgs = extract_imgs
        self.base: str | None = None
        self.hrefs: list[str] = []
        # caption per href, aligned with self.hrefs: the link's img alt
        # text when present, else the anchor's visible text (the LAION
        # alt-text-harvest rule); None when both are empty
        self.caps: list[str | None] = []
        # open <a>: (caps index, text parts, img alt seen inside)
        self._open_a: tuple[int, list[str], list[str]] | None = None
        self._restrict_depth = 0  # open elements matching any selector
        self._stack: list[bool] = []  # per open element: matched?
        self._path: list[tuple[str, dict]] = []  # open (tag, attrs) chain

    def _finalize_anchor(self) -> None:
        if self._open_a is None:
            return
        idx, parts, alts = self._open_a
        self._open_a = None
        text = " ".join("".join(parts).split())
        alt = " ".join(alts[0].split()) if alts else ""
        self.caps[idx] = alt or text or None

    def _in_restricted(self) -> bool:
        return not self._restricting or self._restrict_depth > 0

    def handle_starttag(self, tag, attrs):
        d = dict(attrs)
        if self._restricting and tag not in _VOID_TAGS:
            self._path.append((tag, d))
            matched = any(
                _selector_matches(s, tag, d) for s in self.restrict_css
            ) or any(_xpath_matches(x, self._path) for x in self._xpaths)
            self._stack.append(matched)
            if matched:
                self._restrict_depth += 1
        if tag == "base" and self.base is None:
            if d.get("href"):
                self.base = d["href"]
        elif tag in ("a", "area"):
            # a new anchor implicitly closes a still-open one (real-world
            # HTML omits </a> constantly; browsers do the same)
            self._finalize_anchor()
            if not self._in_restricted():
                return
            href = d.get("href")
            if not href:
                return
            if self.strip_nofollow and "nofollow" in (d.get("rel") or "").lower():
                return
            self.hrefs.append(href)
            if tag == "a":
                self.caps.append(None)
                self._open_a = (len(self.caps) - 1, [], [])
            else:  # <area> has no text content; alt is its caption
                a = " ".join((d.get("alt") or "").split())
                self.caps.append(a or None)
        elif tag == "img":
            # an <img alt> inside the open anchor captions that link
            if self._open_a is not None and d.get("alt"):
                self._open_a[2].append(d["alt"])
            if self.extract_imgs and d.get("src"):
                # <img src> as a first-class link (upstream LinkExtractor
                # tags=['img'], attrs=['src']); caption = alt text — the
                # image+caption harvest rule
                if not self._in_restricted():
                    return
                self.hrefs.append(d["src"])
                a = " ".join((d.get("alt") or "").split())
                self.caps.append(a or None)

    def handle_data(self, data):
        if self._open_a is not None and data:
            self._open_a[1].append(data)

    def handle_endtag(self, tag):
        if tag == "a":
            self._finalize_anchor()
        if self._restricting and tag not in _VOID_TAGS and self._stack:
            if self._stack.pop():
                self._restrict_depth -= 1
            self._path.pop()

    def close(self):
        super().close()
        self._finalize_anchor()


def extract_link_entries_from_html(
    html: str,
    page_url: str,
    strip_nofollow: bool = True,
    restrict_css: tuple[str, ...] = (),
    restrict_xpaths: tuple[str, ...] = (),
    extract_imgs: bool = False,
) -> list[tuple[str, str | None]]:
    """→ (absolute http(s) URL, caption) pairs, unique by URL in document
    order (first caption wins, like the first Request wins upstream).
    Caption = the link's img alt text when present, else the anchor's
    visible text (the LAION-style alt-text harvest rule); None when
    empty. ``extract_imgs`` additionally treats ``<img src>`` as links
    (upstream LinkExtractor tags=['img'], attrs=['src'])."""
    if not html:
        return []
    parser = _LinkParser(
        strip_nofollow, restrict_css, restrict_xpaths, extract_imgs
    )
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        pass  # truncated/malformed HTML: keep what was parsed so far
    base = urljoin(page_url or "", parser.base) if parser.base else (page_url or "")
    seen: set[str] = set()
    out: list[tuple[str, str | None]] = []
    for href, cap in zip(parser.hrefs, parser.caps):
        href = href.strip()
        if not href or href.startswith("#"):
            continue
        absu = urljoin(base, href)
        if not absu.startswith(("http://", "https://")):
            continue
        if absu not in seen:
            seen.add(absu)
            out.append((absu, cap))
    return out


def extract_links_from_html(
    html: str,
    page_url: str,
    strip_nofollow: bool = True,
    restrict_css: tuple[str, ...] = (),
    restrict_xpaths: tuple[str, ...] = (),
) -> list[str]:
    """→ resolved absolute http(s) URLs, unique, in document order."""
    return [
        u
        for u, _cap in extract_link_entries_from_html(
            html, page_url, strip_nofollow, restrict_css, restrict_xpaths
        )
    ]


_SITEMAP_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"


def parse_sitemap(xml_text: str) -> tuple[list[str], list[str]]:
    """→ (page_urls, child_sitemap_urls) from <urlset>/<sitemapindex>
    (namespaced or not — real-world sitemaps are sloppy)."""
    if not xml_text:
        return [], []
    try:
        root = ElementTree.fromstring(xml_text)
    except ElementTree.ParseError:
        return [], []
    tag = root.tag.rsplit("}", 1)[-1]
    locs = [
        el.text.strip()
        for el in root.iter()
        if el.tag.rsplit("}", 1)[-1] == "loc" and el.text and el.text.strip()
    ]
    if tag == "sitemapindex":
        return [], locs
    return locs, []


def sitemap_urls_from_robots(robots_text: str) -> list[str]:
    """``Sitemap:`` lines in robots.txt (ref: sitemap.py ≈L60)."""
    out = []
    for line in (robots_text or "").splitlines():
        key, _, value = line.partition(":")
        if key.strip().lower() == "sitemap" and value.strip():
            out.append(value.strip())
    return out


@pandas_udf(T.ArrayType(T.StringType()))
def extract_links_udf(html: pd.Series, page_url: pd.Series) -> pd.Series:
    return pd.Series(
        [extract_links_from_html(h, u) for h, u in zip(html, page_url)]
    )


def make_extract_links_udf(
    strip_nofollow: bool = True,
    restrict_css: tuple[str, ...] = (),
    restrict_xpaths: tuple[str, ...] = (),
):
    """Parameterized variant of ``extract_links_udf`` (F8 region
    restriction through the engine config). XPaths compile once on the
    driver so a bad expression raises at plan time, not per batch."""
    for x in restrict_xpaths:
        _compile_xpath(x)  # fail fast
    css = tuple(restrict_css)
    xp = tuple(restrict_xpaths)

    @pandas_udf(T.ArrayType(T.StringType()))
    def _udf(html: pd.Series, page_url: pd.Series) -> pd.Series:
        return pd.Series(
            [
                extract_links_from_html(h, u, strip_nofollow, css, xp)
                for h, u in zip(html, page_url)
            ]
        )

    return _udf


@pandas_udf(T.ArrayType(T.StringType()))
def sitemap_locs_udf(xml_text: pd.Series) -> pd.Series:
    out = []
    for x in xml_text:
        pages, children = parse_sitemap(x)
        out.append(pages + children)
    return pd.Series(out)


_SITEMAP_PARTS = T.StructType(
    [
        T.StructField("pages", T.ArrayType(T.StringType())),
        T.StructField("children", T.ArrayType(T.StringType())),
    ]
)


@pandas_udf(_SITEMAP_PARTS)
def sitemap_parts_udf(xml_text: pd.Series) -> pd.DataFrame:
    """<urlset> locs → pages, <sitemapindex> locs → children — kept
    separate so the engine can route pages through the link-filter
    chain while child sitemaps bypass it (upstream SitemapSpider
    ``_parse_sitemap`` requests skip LinkExtractor predicates)."""
    rows = [parse_sitemap(x) for x in xml_text]
    return pd.DataFrame(rows, columns=["pages", "children"])


@pandas_udf(T.ArrayType(T.StringType()))
def robots_sitemap_urls_udf(rules: pd.Series) -> pd.Series:
    """``Sitemap:`` lines from fetched robots.txt rules (ref:
    spiders/sitemap.py ≈L60 — robots.txt as a sitemap source)."""
    return pd.Series([sitemap_urls_from_robots(r) for r in rules])


_LINK_ENTRY_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("caption", T.StringType()),
        ]
    )
)


def make_extract_link_entries_udf(
    strip_nofollow: bool = True,
    restrict_css: tuple[str, ...] = (),
    restrict_xpaths: tuple[str, ...] = (),
    extract_imgs: bool = False,
):
    """(url, caption)-struct variant of ``make_extract_links_udf`` —
    carries the link's alt/anchor text so image requests remember the
    caption of the page that discovered them (the image+caption pair the
    corpus persists). XPaths compile once on the driver (fail fast)."""
    for x in restrict_xpaths:
        _compile_xpath(x)
    css, xp = tuple(restrict_css), tuple(restrict_xpaths)

    @pandas_udf(_LINK_ENTRY_TYPE)
    def _udf(html: pd.Series, page_url: pd.Series) -> pd.Series:
        return pd.Series(
            [
                extract_link_entries_from_html(
                    h, u, strip_nofollow, css, xp, extract_imgs
                )
                for h, u in zip(html, page_url)
            ]
        )

    return _udf


def explode_page_links(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url_canon",
    restrict_css: tuple[str, ...] = (),
    restrict_xpaths: tuple[str, ...] = (),
    extract_imgs: bool = False,
) -> DataFrame:
    """pages(html, url_canon, …) → one row per extracted link (``dst_url``
    + its ``link_caption`` alt/anchor text, null when empty) — the C13
    surface that substitutes for the fixture-graph join when the crawl
    payload is real HTML."""
    udf = make_extract_link_entries_udf(
        True, restrict_css, restrict_xpaths, extract_imgs
    )
    return (
        pages.withColumn(
            "__l", F.explode(udf(F.col(html_col), F.col(url_col)))
        )
        .withColumn("dst_url", F.col("__l.url"))
        .withColumn("link_caption", F.col("__l.caption"))
        .drop(html_col, "__l")
    )


# --------------------------------------------------- meta refresh (U21)
def _strip_tag_spans(col, tag: str):
    return F.regexp_replace(
        col, f"(?is)<{tag}\\b[^>]*>.*?</{tag}\\s*>", " "
    )


def meta_refresh_target(
    html, max_delay: float = 100.0, ignore_tags: tuple[str, ...] = ("noscript",)
):
    """``<meta http-equiv="refresh" content="N; url=...">`` → the refresh
    URL as a Column, NULL when absent / delay ≥ ``max_delay`` / no
    explicit ``url=`` part (ref: downloadermiddlewares/redirect.py
    MetaRefreshMiddleware ≈L90 + w3lib.html.get_meta_refresh — the
    middleware follows only ``if url and interval < maxdelay``).

    Pure JVM Column algebra (regexp over the decoded html — no Python in
    the per-response hot path): spans inside ``ignore_tags`` are removed
    first (upstream METAREFRESH_IGNORE_TAGS, default ``["noscript"]``
    since the 2.11.2 security fix), the FIRST refresh meta tag wins
    (either attribute order), the content value may be double-/single-/
    un-quoted, and common HTML entities in it are decoded. The returned
    URL may be relative — resolve it against the request URL exactly
    like a Location header (netfetch ``_urljoin_udf``)."""
    # comments are stripped BEFORE matching, like w3lib's
    # remove_comments() — a commented-out refresh is not a redirect
    # (unterminated comments blank to end-of-document, as w3lib does)
    col = F.regexp_replace(html, "(?s)<!--.*?(?:-->|$)", " ")
    for tag in ignore_tags:
        col = _strip_tag_spans(col, tag)
    tag_expr = F.regexp_extract(
        col, "(?is)<meta\\b[^>]*http-equiv\\s*=\\s*[\"']?\\s*refresh\\b[^>]*>", 0
    )
    nz = lambda c: F.nullif(c, F.lit(""))  # noqa: E731
    content = F.coalesce(
        nz(F.regexp_extract(tag_expr, "(?is)content\\s*=\\s*\"([^\"]*)\"", 1)),
        nz(F.regexp_extract(tag_expr, "(?is)content\\s*=\\s*'([^']*)'", 1)),
        nz(F.regexp_extract(tag_expr, "(?is)content\\s*=\\s*([^\\s\"'>]+)", 1)),
    )
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&#x27;", "'"), ("&amp;", "&"),
    ):
        content = F.replace(content, F.lit(ent), F.lit(ch))
    # w3lib's interval pattern is (\d*\.)?\d+ — bare fractions count
    delay = nz(
        F.regexp_extract(content, "^\\s*((?:\\d*\\.)?\\d+)\\s*(?:;|$)", 1)
    ).cast("double")
    url = nz(
        F.trim(
            F.regexp_replace(
                F.regexp_extract(content, "(?i);\\s*url\\s*=\\s*(.+)$", 1),
                "^\\s*['\"]|['\"]\\s*$",
                "",
            )
        )
    )
    return F.when(delay < F.lit(float(max_delay)), url)
