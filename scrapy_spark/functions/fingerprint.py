"""Request fingerprinting (SURVEY §2.7 C2).

Re-creates the reference's two fingerprint generations from the public
specification (ref: scrapy/utils/request.py::fingerprint ≈L75 and the legacy
``request_fingerprint`` — selected upstream by
``REQUEST_FINGERPRINTER_IMPLEMENTATION``; the fork's pinned default could not
be read because the mount was empty, so BOTH are implemented and the modern
'2.7' layout is the default, matching upstream ≥2.7):

- ``fingerprint()`` ('2.7'): SHA1 over a canonical JSON serialization of
  ``{method, canonical_url, body_hex[, headers]}`` with sorted keys →
  raw 20-byte digest.
- ``fingerprint_legacy()`` ('2.6'): SHA1 fed method / canonical_url / body
  (and optionally each included header line) as successive updates →
  raw 20-byte digest (upstream exposed the hex form).

Golden vectors in ``tests/vectors/fingerprints.jsonl`` are generated from
this implementation and cross-checked for the invariants the reference tests
assert (tests/test_utils_request.py, named in BASELINE.json north_star):
method sensitivity, body sensitivity, fragment insensitivity (unless
``keep_fragments``), header inclusion rules, query-order insensitivity.
"""

from __future__ import annotations

import hashlib
import json

from .urlnorm import canonicalize_url


def _normalize_headers(
    headers: dict[str, str | list[str]] | None,
    include_headers: list[str] | None,
) -> dict[str, list[str]] | None:
    """Case-insensitive header selection: names lowercased, values listed,
    only names in ``include_headers`` kept, emitted in sorted-name order
    (ref: Headers multimap semantics, scrapy/http/headers.py ≈L10)."""
    if not include_headers or not headers:
        return None
    wanted = {h.lower() for h in include_headers}
    lowered: dict[str, list[str]] = {}
    for name, value in headers.items():
        key = name.lower()
        if key in wanted:
            vals = value if isinstance(value, list) else [value]
            lowered.setdefault(key, []).extend(str(v) for v in vals)
    return {k: lowered[k] for k in sorted(lowered)} if lowered else None


def fingerprint_of_canonical(
    url_canon: str,
    method: str = "GET",
    body: bytes | None = None,
    headers: dict[str, str | list[str]] | None = None,
    include_headers: list[str] | None = None,
) -> bytes:
    """Fingerprint over an ALREADY-canonical URL — the digest payload embeds
    the given string verbatim, exactly as ``fingerprint`` embeds its own
    ``canonicalize_url(url)`` result, so
    ``fingerprint_of_canonical(canonicalize_url(u)) == fingerprint(u)``
    bit-for-bit by construction. The hot path (``with_request_identity``)
    uses this to canonicalize once per row instead of twice."""
    # Upstream ≥2.7 stores headers HEX-ENCODED in the JSON payload:
    # ``headers[header_name.hex()] = [v.hex() for v in getlist(header_name)]``
    # with header_name the lowercased bytes name (scrapy/utils/request.py
    # ::fingerprint ≈L90). The legacy path feeds the raw bytes instead.
    norm = _normalize_headers(headers, include_headers)
    hex_headers = (
        {
            k.encode().hex(): [v.encode("utf-8").hex() for v in vals]
            for k, vals in norm.items()
        }
        if norm
        else {}
    )
    data: dict[str, object] = {
        "method": method.upper(),
        "url": url_canon,
        "body": (body or b"").hex(),
        # Upstream ≥2.7 ALWAYS emits the headers key — an empty dict when no
        # include_headers matched (scrapy/utils/request.py::fingerprint ≈L95:
        # ``"headers": headers`` with ``headers: dict = {}`` initialized
        # unconditionally).
        "headers": hex_headers,
    }
    # Default json.dumps separators — (", ", ": ") — exactly as upstream:
    # ``json.dumps(fingerprint_data, sort_keys=True)``. Compact separators
    # would change every digest.
    payload = json.dumps(data, sort_keys=True)
    return hashlib.sha1(payload.encode("utf-8")).digest()


def fingerprint(
    url: str,
    method: str = "GET",
    body: bytes | None = None,
    headers: dict[str, str | list[str]] | None = None,
    include_headers: list[str] | None = None,
    keep_fragments: bool = False,
) -> bytes:
    """Modern ('2.7') fingerprint: 20-byte SHA1 digest."""
    return fingerprint_of_canonical(
        canonicalize_url(url, keep_fragments=keep_fragments),
        method,
        body,
        headers,
        include_headers,
    )


def fingerprint_legacy(
    url: str,
    method: str = "GET",
    body: bytes | None = None,
    headers: dict[str, str | list[str]] | None = None,
    include_headers: list[str] | None = None,
    keep_fragments: bool = False,
) -> bytes:
    """Legacy ('2.6') fingerprint: sequential SHA1 updates."""
    return fingerprint_legacy_of_canonical(
        canonicalize_url(url, keep_fragments=keep_fragments),
        method,
        body,
        headers,
        include_headers,
    )


def fingerprint_legacy_of_canonical(
    url_canon: str,
    method: str = "GET",
    body: bytes | None = None,
    headers: dict[str, str | list[str]] | None = None,
    include_headers: list[str] | None = None,
) -> bytes:
    """Legacy layout over an already-canonical URL (see
    ``fingerprint_of_canonical`` for the bit-exactness argument)."""
    h = hashlib.sha1()
    h.update(method.upper().encode("ascii"))
    h.update(url_canon.encode("utf-8"))
    h.update(body or b"")
    norm = _normalize_headers(headers, include_headers)
    if norm:
        for name, values in norm.items():
            h.update(name.encode("ascii"))
            for v in values:
                h.update(v.encode("utf-8"))
    return h.digest()


def fingerprint_hex(url: str, **kwargs) -> str:
    """Hex form — what the reference's seen-file stores one-per-line
    (ref: scrapy/dupefilters.py ≈L70 JOBDIR/requests.seen)."""
    return fingerprint(url, **kwargs).hex()
