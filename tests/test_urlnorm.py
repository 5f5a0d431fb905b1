"""C1 canonicalization invariants (SURVEY §5.2-T1; models the checks in the
reference's tests/test_utils_url.py + w3lib's suite)."""

from scrapy_spark.functions.urlnorm import (
    canonicalize_url,
    parse_domain,
    url_is_from_any_domain,
)


def test_query_param_order_collapses():
    a = canonicalize_url("http://x.example/p?b=2&a=1")
    b = canonicalize_url("http://x.example/p?a=1&b=2")
    assert a == b == "http://x.example/p?a=1&b=2"


def test_fragment_stripped_unless_kept():
    assert canonicalize_url("http://x.example/p#frag") == "http://x.example/p"
    assert (
        canonicalize_url("http://x.example/p#frag", keep_fragments=True)
        == "http://x.example/p#frag"
    )


def test_percent_encoding_case_normalized():
    a = canonicalize_url("http://x.example/a%2fb")
    b = canonicalize_url("http://x.example/a%2Fb")
    assert a == b
    assert "%2F" in a  # reserved escape survives, uppercased


def test_ports_and_host_lowercased():
    # w3lib does NOT strip default ports — only a bare trailing colon.
    assert canonicalize_url("HTTP://X.Example:80/p") == "http://x.example:80/p"
    assert canonicalize_url("http://x.example:/p") == "http://x.example/p"
    assert canonicalize_url("http://x.example:8080/p") == "http://x.example:8080/p"


# --- public w3lib canonicalize_url vectors (w3lib tests/test_url.py,
# CanonicalizeUrlTest) — these pin parity against the library the reference
# actually calls (scrapy/utils/request.py → w3lib.url.canonicalize_url).
W3LIB_VECTORS = [
    # simplest + sort query args
    ("http://www.example.com/", "http://www.example.com/"),
    ("http://www.example.com/do?a=1&b=2&c=3", "http://www.example.com/do?a=1&b=2&c=3"),
    ("http://www.example.com/do?c=1&b=2&a=3", "http://www.example.com/do?a=3&b=2&c=1"),
    ("http://www.example.com/do?&a=1", "http://www.example.com/do?a=1"),
    # spaces in query: %20, raw and '+' all normalize to '+'
    ("http://www.example.com/do?q=a space&a=1", "http://www.example.com/do?a=1&q=a+space"),
    ("http://www.example.com/do?q=a+space&a=1", "http://www.example.com/do?a=1&q=a+space"),
    ("http://www.example.com/do?q=a%20space&a=1", "http://www.example.com/do?a=1&q=a+space"),
    # missing path
    ("http://www.example.com", "http://www.example.com/"),
    # non-default port kept; empty port colon removed
    (
        "http://www.example.com:8888/do?a=1&b=2&c=3",
        "http://www.example.com:8888/do?a=1&b=2&c=3",
    ),
    (
        "http://www.example.com:/do?a=1&b=2&c=3",
        "http://www.example.com/do?a=1&b=2&c=3",
    ),
    # fragment dropped
    ("http://www.example.com/do?a=1#frag", "http://www.example.com/do?a=1"),
    # blank values kept (keep_blank_values=True default)
    ("http://www.example.com/do?b=&a=2", "http://www.example.com/do?a=2&b="),
    ("http://www.example.com/do?b=1&c&a=2", "http://www.example.com/do?a=2&b=1&c="),
    # safe characters in path are not converted
    (
        "http://www.simplybedrooms.com/White-Bedroom-Furniture/"
        "Bedroom-Mirror:-Josephine-Cheval-Mirror.html",
        "http://www.simplybedrooms.com/White-Bedroom-Furniture/"
        "Bedroom-Mirror:-Josephine-Cheval-Mirror.html",
    ),
    # non-ASCII path percent-encoded as UTF-8; escape case uppercased
    ("http://www.example.com/résumé", "http://www.example.com/r%C3%A9sum%C3%A9"),
    (
        "http://www.example.com/r%c3%a9sum%c3%a9",
        "http://www.example.com/r%C3%A9sum%C3%A9",
    ),
    # non-UTF8 percent-escape bytes preserved, hex uppercased
    ("http://www.example.com/a%a3do", "http://www.example.com/a%A3do"),
    ("http://www.example.com/do?k=b%a3", "http://www.example.com/do?k=b%A3"),
    # %2F in path is protected (not decoded into a real slash)
    ("http://www.example.com/a%2fdo", "http://www.example.com/a%2Fdo"),
    # query values that quote_plus escapes (w3lib plain urlencode)
    ("http://www.example.com/do?q=a!b", "http://www.example.com/do?q=a%21b"),
    # IDNA host
    ("http://www.bücher.de?q=r", "http://www.xn--bcher-kva.de/?q=r"),
]


def test_w3lib_public_vectors():
    for raw, expected in W3LIB_VECTORS:
        assert canonicalize_url(raw) == expected, raw


def test_empty_path_becomes_slash():
    assert canonicalize_url("http://x.example") == "http://x.example/"


def test_blank_query_values_kept():
    assert canonicalize_url("http://x.example/?a=&b=1") == "http://x.example/?a=&b=1"


def test_unicode_path_percent_encoded_deterministically():
    a = canonicalize_url("http://x.example/café")
    b = canonicalize_url("http://x.example/caf%C3%A9")
    assert a == b


def test_idempotent():
    urls = [
        "http://x.example/p?b=2&a=1#f",
        "https://User@Host.Example:443/A%2fB;p?x=%20",
        "http://x.example",
    ]
    for u in urls:
        once = canonicalize_url(u)
        assert canonicalize_url(once) == once


def test_parse_domain():
    assert parse_domain("http://User:pw@Sub.Host.Example:8080/p") == "sub.host.example"
    assert parse_domain("not a url") == ""


def test_url_is_from_any_domain():
    assert url_is_from_any_domain("http://a.b.example/x", ["b.example"])
    assert url_is_from_any_domain("http://b.example/x", ["b.example"])
    assert not url_is_from_any_domain("http://notb.example/x", ["b.example"])
    assert not url_is_from_any_domain("http://b.example.evil/x", ["b.example"])
