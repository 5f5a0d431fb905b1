"""URL canonicalization (SURVEY §2.7 C1/C3).

Re-implements, from the public specification, the canonicalization the
reference relies on via w3lib (``w3lib.url.canonicalize_url``, re-exported
through ``scrapy/utils/request.py ≈L70`` — see SURVEY.md §0 for the citation
convention; the reference mount was empty, so this is spec-derived and must
be re-pinned against the reference's vendored w3lib version when available).

Canonical form:

1. lowercase scheme and host; strip the scheme's default port,
2. percent-encoding normalization: decode unreserved percent-escapes in the
   path, re-encode everything outside the path-safe set, uppercase the hex
   of surviving escapes (``%3a`` → ``%3A``),
3. sort query parameters by (key, value); keep blank values,
4. drop the fragment (unless ``keep_fragments``),
5. empty path → ``/``.

The implementation is pure stdlib (``urllib.parse``) and deterministic — it
is THE parity-critical function: two URLs that differ only in param order,
escape case, or fragment must map to one canonical string, hence one
fingerprint (ref behavior: scrapy/dupefilters.py ≈L55 depends on it).
"""

from __future__ import annotations

import re
from urllib.parse import (
    parse_qsl,
    quote,
    unquote_to_bytes,
    urlencode,
    urlparse,
    urlunparse,
)

# Default ports stripped from the netloc (w3lib parity set).
DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21, "ws": 80, "wss": 443}

# Characters left unescaped when re-quoting the path. RFC 3986 pchar plus
# "/" — mirrors the reference's path-safe set.
_PATH_SAFE = "/;:@&+$,-_.!~*'()=%"
_QUERY_SAFE = "-_.!~*'()"


def _strip_default_port(netloc: str, scheme: str) -> str:
    host, sep, port = netloc.rpartition(":")
    if sep and port.isdigit() and DEFAULT_PORTS.get(scheme) == int(port):
        return host
    return netloc


def _unquote_path_keep_reserved(path: str) -> bytes:
    """Percent-decode the path but keep escapes whose decoding would change
    URL structure (%2F '/', %3F '?', %23 '#') — decoding those would merge
    distinct URLs, so their '%' is protected before the general unquote."""
    for reserved in ("2f", "2F", "3f", "3F", "23"):
        path = path.replace(f"%{reserved}", f"%25{reserved.upper()}")
    return unquote_to_bytes(path)


# --- already-canonical fast path ------------------------------------------
# A URL matching this shape is a FIXPOINT of the full algorithm below, so it
# can be returned as-is: lowercase scheme, lowercase ASCII host (no port, no
# userinfo), path of chars that quote(unquote(path)) leaves untouched (no
# '%' escapes, no ';' params split), optional query validated separately.
# Equivalence fast==slow is property-tested (tests/test_urlnorm.py).
_FAST_RE = re.compile(
    r"^(?:https?|ftp|wss?)://"
    r"[a-z0-9](?:[a-z0-9.-]*[a-z0-9])?"
    r"(?:/[A-Za-z0-9_.~!*'()$&+,=:@/-]*)"
    r"(?:\?([A-Za-z0-9_.~!*'()=&-]+))?$"
)
_FAST_PAIR_RE = re.compile(r"^[A-Za-z0-9_.~!*'()-]+=[A-Za-z0-9_.~!*'()-]*$")


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
        parts = urlparse(url.strip())
    except ValueError:
        return url.strip()
    scheme = parts.scheme.lower()
    netloc = _strip_default_port(parts.netloc.lower(), scheme)
    # IDNA hosts: keep as-is if already ASCII; encode non-ASCII hosts.
    host = netloc.rsplit("@", 1)[-1].split(":")[0]
    if host and not host.isascii():
        try:
            netloc = netloc.replace(host, host.encode("idna").decode("ascii"))
        except UnicodeError:
            pass

    path_bytes = _unquote_path_keep_reserved(parts.path)
    path = quote(path_bytes, safe=_PATH_SAFE) or "/"

    try:
        keyvals = parse_qsl(parts.query, keep_blank_values=keep_blank_values)
    except ValueError:
        keyvals = []
    keyvals.sort()
    query = urlencode(keyvals, safe=_QUERY_SAFE)

    fragment = parts.fragment if keep_fragments else ""
    # `params` (the ;-suffix of the last path segment) is carried verbatim.
    return urlunparse((scheme, netloc, path, parts.params, query, fragment))


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
