"""C3/C6/C7: URL helpers, encoding detection, decompression
(models w3lib tests/test_url.py + test_encoding.py and the reference's
tests/test_downloadermiddleware_httpcompression.py behavior)."""

import gzip
import zlib

import pytest

from scrapy_spark.functions.http import (
    add_or_replace_parameter,
    decode_content,
    decode_response_text,
    escape_ajax,
    html_body_declared_encoding,
    html_to_unicode,
    http_content_type_encoding,
    read_bom,
    resolve_encoding,
    strip_url,
)


# ------------------------------------------------------------------- C3
def test_add_or_replace_parameter():
    assert (
        add_or_replace_parameter("http://x.example/p?a=1&b=2", "b", "9")
        == "http://x.example/p?a=1&b=9"
    )
    assert (
        add_or_replace_parameter("http://x.example/p?a=1", "c", "3")
        == "http://x.example/p?a=1&c=3"
    )
    # first occurrence replaced, duplicate dropped (w3lib semantics)
    assert (
        add_or_replace_parameter("http://x.example/p?b=1&b=2&a=0", "b", "9")
        == "http://x.example/p?b=9&a=0"
    )


def test_escape_ajax():
    # the '#!' convention → _escaped_fragment_ (w3lib test vectors)
    assert (
        escape_ajax("http://www.example.com/ajax.html#!key=value")
        == "http://www.example.com/ajax.html?_escaped_fragment_=key%3Dvalue"
    )
    assert (
        escape_ajax("http://www.example.com/ajax.html?k=v#!key=value")
        == "http://www.example.com/ajax.html?k=v&_escaped_fragment_=key%3Dvalue"
    )
    # non-AJAX fragments untouched
    assert (
        escape_ajax("http://www.example.com/ajax.html#normal")
        == "http://www.example.com/ajax.html#normal"
    )


def test_strip_url():
    u = "http://user:pw@www.example.com:80/p;par?a=1#frag"
    assert strip_url(u) == "http://www.example.com/p;par?a=1"
    assert (
        strip_url(u, strip_credentials=False)
        == "http://user:pw@www.example.com/p;par?a=1"
    )
    assert (
        strip_url(u, strip_default_port=False)
        == "http://www.example.com:80/p;par?a=1"
    )
    assert strip_url(u, origin_only=True) == "http://www.example.com/"
    assert (
        strip_url(u, strip_fragment=False)
        == "http://www.example.com/p;par?a=1#frag"
    )
    # non-default port kept
    assert strip_url("https://h.example:8443/x") == "https://h.example:8443/x"


# ------------------------------------------------------------------- C6
def test_header_charset_wins():
    enc, text = html_to_unicode(
        "text/html; charset=iso-8859-1", "caf\xe9".encode("cp1252")
    )
    assert enc == "cp1252"  # latin-1 family served as cp1252 (w3lib rule)
    assert text == "café"


def test_bom_detection():
    assert read_bom(b"\xff\xfeab")[0] == "utf-16-le"
    assert read_bom(b"\xef\xbb\xbfhi")[0] == "utf-8"
    assert read_bom(b"plain")[0] is None
    enc, text = html_to_unicode(None, "﻿héllo".encode("utf-8"))
    assert enc == "utf-8" and text == "héllo"  # BOM stripped


def test_meta_declared_encoding():
    body = b'<html><head><meta charset="shift_jis"></head><body></body></html>'
    assert html_body_declared_encoding(body) == "shift_jis"
    xml = b"<?xml version='1.0' encoding='ISO-8859-7'?><root/>"
    assert html_body_declared_encoding(xml) == "iso8859-7"
    enc, _ = html_to_unicode(None, body)
    assert enc == "shift_jis"


def test_utf8_then_cp1252_fallback():
    enc, text = html_to_unicode(None, "héllo".encode("utf-8"))
    assert enc == "utf-8" and text == "héllo"
    enc, text = html_to_unicode(None, b"caf\xe9 au lait")  # invalid utf-8
    assert enc == "cp1252" and text == "café au lait"


def test_resolve_encoding_aliases():
    assert resolve_encoding("UTF8") == "utf-8"
    assert resolve_encoding("latin-1") == "cp1252"
    assert resolve_encoding("bogus-enc") is None
    assert http_content_type_encoding('text/html; charset="utf-8"') == "utf-8"


# ------------------------------------------------------------------- C7
def test_gzip_roundtrip_and_truncation():
    raw = b"<html>" + b"x" * 5000 + b"</html>"
    assert decode_content(gzip.compress(raw), "gzip") == raw
    # truncated gzip: return what decoded so far, never raise (ref utils/gz.py)
    trunc = gzip.compress(raw)[:-7]
    out = decode_content(trunc, "gzip")
    assert raw.startswith(out) and len(out) > 0


def test_deflate_both_flavors():
    raw = b"deflate me " * 100
    assert decode_content(zlib.compress(raw), "deflate") == raw  # zlib-wrapped
    rawstream = zlib.compressobj(wbits=-15)
    data = rawstream.compress(raw) + rawstream.flush()
    assert decode_content(data, "deflate") == raw  # raw stream


def test_encoding_chain_and_identity():
    raw = b"chained"
    double = gzip.compress(zlib.compress(raw))
    assert decode_content(double, "deflate, gzip") == raw  # reverse order
    assert decode_content(raw, "identity") == raw
    assert decode_content(raw, None) == raw


def test_brotli_gated():
    try:
        import brotli  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            decode_content(b"xx", "br")


def test_full_response_pipeline():
    html = '<html><meta charset="utf-8"><a href="/x">é</a></html>'.encode()
    body = gzip.compress(html)
    text = decode_response_text(body, "text/html", "gzip")
    assert 'href="/x"' in text and "é" in text


def test_zstd_gated_and_roundtrip():
    """zstd Content-Encoding (ref: httpcompression.py ≈L40): decoded when
    the optional 'zstandard' package is importable, NotImplementedError
    otherwise — never a silent wrong body."""
    try:
        import zstandard
    except ImportError:
        with pytest.raises(NotImplementedError):
            decode_content(b"xx", "zstd")
        pytest.skip("zstandard not installed in this container")
    raw = b"zstd-coded payload " * 64
    # one-shot frame (carries decoded size) AND a streamed frame (size
    # unknown — the case the stream_reader path exists for)
    assert decode_content(zstandard.ZstdCompressor().compress(raw), "zstd") == raw
    import io as _io

    buf = _io.BytesIO()
    with zstandard.ZstdCompressor().stream_writer(buf, closefd=False) as w:
        w.write(raw)
    assert decode_content(buf.getvalue(), "zstd") == raw


def test_accept_encoding_advertises_only_decodable_codings():
    """The fetch path must never advertise a coding it cannot decode
    (upstream builds ACCEPTED_ENCODINGS the same import-gated way)."""
    from scrapy_spark.functions.http import (
        _HAS_BROTLI,
        _HAS_ZSTD,
        accept_encoding_header,
    )

    adv = accept_encoding_header()
    assert "gzip" in adv and "deflate" in adv
    assert ("br" in adv.split(", ")) == _HAS_BROTLI
    assert ("zstd" in adv.split(", ")) == _HAS_ZSTD
