"""URL canonicalization (SURVEY §2.7 C1/C3).

Re-implements, from the public specification, the canonicalization the
reference relies on via w3lib (``w3lib.url.canonicalize_url``, re-exported
through ``scrapy/utils/request.py ≈L70`` — see SURVEY.md §0 for the citation
convention; the reference mount was empty, so this is spec-derived and must
be re-pinned against the reference's vendored w3lib version when available).

Canonical form (exact public-w3lib algorithm, ``w3lib/url.py::canonicalize_url``):

1. IDNA-encode the netloc when possible, lowercase it, strip a bare trailing
   colon (empty port) — default ports are NOT stripped (w3lib keeps ``:80``),
2. percent-encoding normalization: decode percent-escapes in the path
   (protecting only ``%2F``/``%3F``, the w3lib set), re-encode with w3lib's
   ``_path_safe_chars``; raw non-UTF8 escape bytes survive and uppercase
   (``%a3`` → ``%A3``),
3. parse the query preserving raw bytes (w3lib ``parse_qsl_to_bytes``:
   splits on both ``&`` and ``;``, ``+`` means space), sort pairs, re-encode
   with plain ``urlencode`` (quote_plus: only alnum ``_.-~`` survive,
   space → ``+``),
4. drop the fragment (unless ``keep_fragments``),
5. empty path → ``/``.

The implementation is pure stdlib (``urllib.parse``) and deterministic — it
is THE parity-critical function: two URLs that differ only in param order,
escape case, or fragment must map to one canonical string, hence one
fingerprint (ref behavior: scrapy/dupefilters.py ≈L55 depends on it).
"""

from __future__ import annotations

import re
from functools import lru_cache
from urllib.parse import (
    quote,
    unquote_to_bytes,
    urlencode,
    urlparse,
    urlunparse,
)

# w3lib safe sets: RFC3986 reserved (gen-delims + sub-delims) + "|" + "%";
# the path set drops "#". (quote() additionally always keeps unreserved
# alnum and "_.-~".)
_SAFE_CHARS = ":/?#[]@!$&'()*+,;=|%"
_PATH_SAFE = ":/?[]@!$&'()*+,;=|%"


def _unquote_path_keep_reserved(path: str) -> bytes:
    """Percent-decode the path but protect the escapes w3lib protects
    (%2F '/', %3F '?') — decoding those would change URL structure
    (w3lib/url.py::_unquotepath)."""
    for reserved in ("2f", "2F", "3f", "3F"):
        path = path.replace(f"%{reserved}", f"%25{reserved.upper()}")
    return unquote_to_bytes(path)


def _parse_qsl_to_bytes(
    qs: str, keep_blank_values: bool
) -> list[tuple[bytes, bytes]]:
    """w3lib's ``parse_qsl_to_bytes``: like ``urllib.parse.parse_qsl`` but
    ``unquote_to_bytes`` keeps raw (possibly non-UTF8) escape bytes, and —
    matching the pre-3.10 stdlib behavior w3lib froze — ``;`` is also a
    pair separator."""
    pairs = [s2 for s1 in qs.split("&") for s2 in s1.split(";")]
    out: list[tuple[bytes, bytes]] = []
    for name_value in pairs:
        if not name_value:
            continue
        nv = name_value.split("=", 1)
        if len(nv) != 2:
            if not keep_blank_values:
                continue
            nv.append("")
        if nv[1] or keep_blank_values:
            # '%'/'+'-free pairs (the common case) skip unquote entirely
            k, v = nv[0], nv[1]
            name = (
                k.encode("ascii")
                if "%" not in k and "+" not in k and k.isascii()
                else unquote_to_bytes(k.replace("+", " "))
            )
            value = (
                v.encode("ascii")
                if "%" not in v and "+" not in v and v.isascii()
                else unquote_to_bytes(v.replace("+", " "))
            )
            out.append((name, value))
    return out


# --- already-canonical fast path ------------------------------------------
# A URL matching this shape is a FIXPOINT of the full algorithm below, so it
# can be returned as-is: lowercase scheme, lowercase ASCII host (no port, no
# userinfo, 1-63-char labels so IDNA passes it through), path of chars that
# quote(unquote(path)) leaves untouched (no '%' escapes, no ';' params
# split), optional query validated separately. Query chars are restricted to
# quote_plus survivors (alnum + "_.-~") because w3lib's plain urlencode
# escapes everything else. Equivalence fast==slow is property-tested
# (tests/test_urlnorm.py / test_identity_fastpath.py).
_FAST_RE = re.compile(
    r"^(?:https?|ftp|wss?)://"
    r"[a-z0-9](?:[a-z0-9.-]*[a-z0-9])?"
    r"(?:/[A-Za-z0-9_.~!*'()$&+,=:@/-]*)"
    r"(?:\?([A-Za-z0-9_.~=&-]+))?$"
)
_FAST_PAIR_RE = re.compile(r"^[A-Za-z0-9_.~-]+=[A-Za-z0-9_.~-]*$")


def _fast_canonical(url: str) -> bool:
    """True iff ``url`` is provably already in canonical form."""
    m = _FAST_RE.match(url)
    if not m:
        return False
    query = m.group(1)
    if query is None:
        return True
    pairs = query.split("&")
    if not all(_FAST_PAIR_RE.match(p) for p in pairs):
        return False
    keyvals = [tuple(p.split("=", 1)) for p in pairs]
    return keyvals == sorted(keyvals)


# --- slow-path accelerators (pure prechecks; semantics unchanged) ---------
# a string fully inside the safe+unreserved set passes quote() untouched —
# one C-regex fullmatch replaces a Python/quote round trip
_PATH_NOOP_RE = re.compile(r"[A-Za-z0-9_.~:/?\[\]@!$&'()*+,;=|%-]*\Z")
_SAFE_NOOP_RE = re.compile(r"[A-Za-z0-9_.~:/?#\[\]@!$&'()*+,;=|%-]*\Z")
# quote_plus leaves exactly alnum + "_.-~" alone (bytes → str verbatim)
_QPLUS_NOOP_RE = re.compile(rb"[A-Za-z0-9_.~-]*\Z")


def _quote_component(s: str, safe: str, noop_re) -> str:
    if noop_re.match(s):
        return s
    return quote(s.encode("utf-8"), safe=safe)


@lru_cache(maxsize=4096)
def _idna_netloc(netloc: str) -> str:
    """w3lib _safe_ParseResult netloc step, memoized — crawls hit the same
    handful of hosts millions of times. IDNA-encode when every label is
    encodable (pure-ASCII 1-63-char labels pass through unchanged); raw on
    UnicodeError (empty/overlong labels). Lowered + bare-colon-stripped."""
    try:
        out = netloc.encode("idna").decode("ascii")
    except UnicodeError:
        out = netloc
    return out.lower().rstrip(":")


def _urlencode_sorted(keyvals: list[tuple[bytes, bytes]]) -> str:
    """``urlencode`` over sorted bytes pairs with a quote_plus fast path
    for the all-safe common case (alnum keys/values) — same output."""
    out = []
    for k, v in keyvals:
        if _QPLUS_NOOP_RE.match(k) and _QPLUS_NOOP_RE.match(v):
            out.append(k.decode("ascii") + "=" + v.decode("ascii"))
        else:
            out.append(urlencode([(k, v)]))
    return "&".join(out)


def canonicalize_url(
    url: str,
    *,
    keep_blank_values: bool = True,
    keep_fragments: bool = False,
) -> str:
    """Return the canonical form of ``url``. Never raises on odd input —
    falls back to returning the input stripped, so a malformed URL still
    fingerprints deterministically (the crawl filters will drop it later)."""
    url = url.strip()
    if _fast_canonical(url):
        return url
    try:
        parts = urlparse(url)
    except ValueError:
        return url
    netloc = _idna_netloc(parts.netloc)
    # Each component is first made %-safe exactly as _safe_ParseResult does
    # (no-op precheck: all-safe strings skip the quote round trip).
    path = _quote_component(parts.path, _PATH_SAFE, _PATH_NOOP_RE)
    params = _quote_component(parts.params, _PATH_SAFE, _PATH_NOOP_RE)
    query = _quote_component(parts.query, _SAFE_CHARS, _SAFE_NOOP_RE)

    keyvals = _parse_qsl_to_bytes(query, keep_blank_values)
    keyvals.sort()
    query = _urlencode_sorted(keyvals)

    if "%" in path:
        path = quote(_unquote_path_keep_reserved(path), safe=_PATH_SAFE)
    path = path or "/"
    if keep_fragments:
        fragment = _quote_component(parts.fragment, _SAFE_CHARS, _SAFE_NOOP_RE)
    else:
        fragment = ""

    # w3lib lowercases the netloc and strips only a BARE trailing colon
    # (empty port) — default ports like :80 are preserved.
    return urlunparse((parts.scheme, netloc, path, params, query, fragment))


def parse_domain(url: str) -> str:
    """Lowercased host (no port, no userinfo) — the politeness slot key
    (ref: scrapy/core/downloader/__init__.py::get_slot_key ≈L105: slot =
    ``meta['download_slot']`` or the request host)."""
    try:
        netloc = urlparse(url).netloc
    except ValueError:
        return ""
    return netloc.rsplit("@", 1)[-1].split(":")[0].lower()


def url_is_from_any_domain(url: str, domains: list[str]) -> bool:
    """True if the url host equals or is a subdomain of any entry
    (ref: scrapy/utils/url.py::url_is_from_any_domain ≈L20; compiled as
    ``(^|.*\\.)domain$`` in spidermiddlewares/offsite.py ≈L60)."""
    host = parse_domain(url)
    if not host:
        return False
    return any(host == d.lower() or host.endswith("." + d.lower()) for d in domains)
