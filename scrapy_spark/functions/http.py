"""HTTP body handling: encoding detection (C6) + decompression (C7) and
the remaining C3 URL helpers.

Re-implements, from the public specification, the behavior the reference
gets from w3lib.encoding / w3lib.url and its HttpCompressionMiddleware
(ref: scrapy/http/response/text.py ≈L90 encoding resolution order;
downloadermiddlewares/httpcompression.py ≈L40 Content-Encoding chain;
w3lib/url.py escape_ajax ≈L120, strip_url ≈L160). Everything is pure
stdlib; brotli/zstd are import-gated exactly like the reference treats
their optional deps.

Encoding resolution order (TextResponse._declared_encoding then body
inference): 1) Content-Type header charset → 2) BOM → 3) XML/HTML meta
declaration in the first 4 KiB → 4) UTF-8 attempt → 5) cp1252 fallback
(never fails: errors='replace' at the last step).
"""

from __future__ import annotations

import codecs
import gzip
import io
import re
import zlib
from urllib.parse import (
    parse_qsl,
    urldefrag,
    urlencode,
    urlparse,
    urlsplit,
    urlunparse,
    urlunsplit,
)

try:  # optional, like the reference's brotli support
    import brotli  # type: ignore

    _HAS_BROTLI = True
except ImportError:  # pragma: no cover
    _HAS_BROTLI = False

try:  # optional, like the reference's zstandard support (2.x advertises
    # and decodes zstd only when the package is importable)
    import zstandard  # type: ignore

    _HAS_ZSTD = True
except ImportError:  # pragma: no cover
    _HAS_ZSTD = False


def accept_encoding_header() -> str:
    """The Accept-Encoding value the fetch path should advertise: stdlib
    codings always, br/zstd only when their decoder is importable (ref:
    httpcompression.py ≈L30 — ACCEPTED_ENCODINGS is built the same way)."""
    encs = ["gzip", "deflate"]
    if _HAS_BROTLI:
        encs.append("br")
    if _HAS_ZSTD:
        encs.append("zstd")
    return ", ".join(encs)

# ------------------------------------------------------------------ C3 url
_DEFAULT_PORTS = {("http", 80), ("https", 443), ("ftp", 21)}


def add_or_replace_parameter(url: str, name: str, new_value: str) -> str:
    """w3lib.url.add_or_replace_parameter: set/replace one query param,
    preserving the order of existing params (first occurrence replaced,
    later duplicates dropped)."""
    parsed = urlsplit(url)
    args = parse_qsl(parsed.query, keep_blank_values=True)
    new_args, replaced = [], False
    for k, v in args:
        if k != name:
            new_args.append((k, v))
        elif not replaced:
            new_args.append((k, new_value))
            replaced = True
    if not replaced:
        new_args.append((name, new_value))
    return urlunsplit(parsed._replace(query=urlencode(new_args)))


def escape_ajax(url: str) -> str:
    """AJAX-crawlable URL mapping (w3lib.url.escape_ajax; the Google
    '#!' convention Request.__init__ applies): ``#!fragment`` becomes
    ``?_escaped_fragment_=fragment``; other fragments pass through."""
    defrag, frag = urldefrag(url)
    if not frag.startswith("!"):
        return url
    return add_or_replace_parameter(defrag, "_escaped_fragment_", frag[1:])


def strip_url(
    url: str,
    strip_credentials: bool = True,
    strip_default_port: bool = True,
    origin_only: bool = False,
    strip_fragment: bool = True,
) -> str:
    """w3lib.url.strip_url: drop credentials / default ports / fragment,
    or reduce to the origin."""
    parsed = urlparse(url)
    netloc = parsed.netloc
    if (strip_credentials or origin_only) and (parsed.username or parsed.password):
        netloc = netloc.split("@")[-1]
    if strip_default_port and parsed.port:
        if (parsed.scheme, parsed.port) in _DEFAULT_PORTS:
            netloc = netloc.replace(f":{parsed.port}", "")
    return urlunparse(
        (
            parsed.scheme,
            netloc,
            "/" if origin_only else parsed.path,
            "" if origin_only else parsed.params,
            "" if origin_only else parsed.query,
            "" if strip_fragment else parsed.fragment,
        )
    )


# ------------------------------------------------------- C6 encoding detect
# w3lib DEFAULT_ENCODING_TRANSLATION flavor: the aliases that matter for
# web content — the latin-1 family is served as cp1252 in practice.
_ENCODING_TRANSLATION = {
    "ascii": "cp1252",
    "us-ascii": "cp1252",
    "iso-8859-1": "cp1252",
    "iso8859-1": "cp1252",
    "latin-1": "cp1252",
    "latin1": "cp1252",
    "macintosh": "mac-roman",
    "win-1251": "cp1251",
    "zh_cn": "gb18030",
}

_BOMS: list[tuple[bytes, str]] = [
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF8, "utf-8"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
]

_CTYPE_RE = re.compile(r";\s*charset\s*=\s*[\"']?([\w.:-]+)[\"']?", re.I)
# meta/xml declarations, matched over the first 4 KiB like w3lib
_XML_RE = re.compile(rb'<\?xml[^>]*encoding\s*=\s*["\']?([\w.:-]+)', re.I)
_META_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?([\w.:-]+)""", re.I
)


def resolve_encoding(name: str | None) -> str | None:
    """Alias-normalize an encoding label; None if Python can't decode it."""
    if not name:
        return None
    name = name.strip().lower()
    name = _ENCODING_TRANSLATION.get(name, name)
    try:
        return codecs.lookup(name).name
    except (LookupError, TypeError):
        return None


def http_content_type_encoding(content_type: str | None) -> str | None:
    """charset= parameter of a Content-Type header value."""
    if not content_type:
        return None
    m = _CTYPE_RE.search(content_type)
    return resolve_encoding(m.group(1)) if m else None


def read_bom(body: bytes) -> tuple[str | None, bytes]:
    """(encoding, BOM bytes) when the body starts with a BOM. UTF-32 is
    checked before UTF-16 (its BOMs are supersets)."""
    for bom, enc in _BOMS:
        if body.startswith(bom):
            return enc, bom
    return None, b""


def html_body_declared_encoding(body: bytes) -> str | None:
    """Encoding declared in an <?xml ?> decl or <meta charset>/<meta
    http-equiv Content-Type> within the first 4096 bytes."""
    chunk = body[:4096]
    for pat in (_XML_RE, _META_RE):
        m = pat.search(chunk)
        if m:
            enc = resolve_encoding(m.group(1).decode("ascii", "replace"))
            if enc:
                return enc
    return None


def html_to_unicode(
    content_type: str | None, body: bytes, default_encoding: str = "cp1252"
) -> tuple[str, str]:
    """(encoding_used, unicode_body) — the w3lib html_to_unicode contract:
    header charset, else BOM, else declared-in-body, else a clean UTF-8
    decode, else ``default_encoding``; never raises (errors='replace'
    except for the utf-8 trial)."""
    enc = http_content_type_encoding(content_type)
    bom_enc, bom = read_bom(body)
    if enc is None and bom_enc is not None:
        enc = bom_enc
    if body.startswith(bom):
        body = body[len(bom):]
    if enc is None:
        enc = html_body_declared_encoding(body)
    if enc is None:
        try:
            return "utf-8", body.decode("utf-8")
        except UnicodeDecodeError:
            enc = resolve_encoding(default_encoding) or "cp1252"
    return enc, body.decode(enc, errors="replace")


# -------------------------------------------------------- C7 decompression
def _gunzip(data: bytes) -> bytes:
    """Tolerant gunzip (ref: scrapy/utils/gz.py::gunzip ≈L20): truncated
    payloads return every byte decoded so far instead of raising."""
    f = gzip.GzipFile(fileobj=io.BytesIO(data))
    out = []
    while True:
        try:
            # read1 (not read): yields decompressed bytes as they come, so
            # a truncated member still surfaces its decoded prefix
            chunk = f.read1(8196)
        except (OSError, EOFError, zlib.error):
            if not out:
                raise
            break
        if not chunk:
            break
        out.append(chunk)
    return b"".join(out)


def _inflate(data: bytes) -> bytes:
    """deflate, accepting both zlib-wrapped and raw streams (ref:
    httpcompression.py ≈L80: 'some servers send raw deflate')."""
    try:
        return zlib.decompress(data)
    except zlib.error:
        return zlib.decompress(data, -15)


def decode_content(body: bytes, content_encoding: str | list[str] | None) -> bytes:
    """Apply the Content-Encoding chain in reverse order (last encoding
    applied first), exactly like HttpCompressionMiddleware.process_response.
    Unknown/'identity' codings pass through; brotli and zstd require
    their optional dep and raise NotImplementedError without it
    (import-gated, like the reference's optional br/zstd support)."""
    if not content_encoding:
        return body
    chain = (
        [content_encoding]
        if isinstance(content_encoding, str)
        else list(content_encoding)
    )
    for coding in reversed([c.strip().lower() for c in ",".join(chain).split(",")]):
        if coding in ("", "identity"):
            continue
        if coding in ("gzip", "x-gzip"):
            body = _gunzip(body)
        elif coding == "deflate":
            body = _inflate(body)
        elif coding == "br":
            if not _HAS_BROTLI:
                raise NotImplementedError(
                    "brotli Content-Encoding needs the optional 'brotli' "
                    "package (absent in this container)"
                )
            body = brotli.decompress(body)
        elif coding == "zstd":
            if not _HAS_ZSTD:
                raise NotImplementedError(
                    "zstd Content-Encoding needs the optional 'zstandard' "
                    "package (absent in this container)"
                )
            # stream decompress: zstd frames commonly omit the decoded
            # size, which the one-shot decompress() API refuses
            body = zstandard.ZstdDecompressor().stream_reader(
                io.BytesIO(body)
            ).read()
        # unknown codings pass through untouched (the middleware keeps the
        # body and lets the spider deal with it)
    return body


def decode_response_text(
    body: bytes,
    content_type: str | None = None,
    content_encoding: str | list[str] | None = None,
) -> str:
    """Full response-body pipeline: decompress (C7) then detect+decode
    (C6) — what a real fetch path runs before link extraction."""
    return html_to_unicode(content_type, decode_content(body, content_encoding))[1]


__all__ = [
    "accept_encoding_header",
    "add_or_replace_parameter",
    "escape_ajax",
    "strip_url",
    "resolve_encoding",
    "http_content_type_encoding",
    "read_bom",
    "html_body_declared_encoding",
    "html_to_unicode",
    "decode_content",
    "decode_response_text",
]
