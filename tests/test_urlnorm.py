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


def test_default_port_stripped_and_host_lowercased():
    assert canonicalize_url("HTTP://X.Example:80/p") == "http://x.example/p"
    assert canonicalize_url("https://x.example:443/") == "https://x.example/"
    assert canonicalize_url("http://x.example:8080/p") == "http://x.example:8080/p"


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
