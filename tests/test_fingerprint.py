"""C2 fingerprint invariants (models reference tests/test_utils_request.py,
named in BASELINE.json north_star). Exact digests are pinned as golden
vectors in tests/vectors/fingerprints.jsonl (generated from this
implementation — see SURVEY §0 re: empty reference mount)."""

import json
import pathlib

from scrapy_spark.functions.fingerprint import (
    fingerprint,
    fingerprint_hex,
    fingerprint_legacy,
)

VEC = pathlib.Path(__file__).parent / "vectors" / "fingerprints.jsonl"


def test_digest_shape():
    fp = fingerprint("http://x.example/p")
    assert isinstance(fp, bytes) and len(fp) == 20
    assert len(fingerprint_legacy("http://x.example/p")) == 20


def test_deterministic_and_url_equivalence():
    a = fingerprint("http://x.example/p?b=2&a=1")
    b = fingerprint("http://x.example/p?a=1&b=2")
    c = fingerprint("http://x.example/p?a=1&b=2#frag")
    assert a == b == c  # canonicalization collapses order + fragment


def test_keep_fragments_distinguishes():
    a = fingerprint("http://x.example/p#one", keep_fragments=True)
    b = fingerprint("http://x.example/p#two", keep_fragments=True)
    assert a != b


def test_method_and_body_sensitivity():
    base = fingerprint("http://x.example/p")
    assert fingerprint("http://x.example/p", method="POST") != base
    assert fingerprint("http://x.example/p", body=b"x=1") != base


def test_headers_ignored_unless_included():
    base = fingerprint("http://x.example/p")
    with_hdr = fingerprint("http://x.example/p", headers={"Accept": "text/html"})
    assert with_hdr == base  # headers excluded by default (ref semantics)
    included = fingerprint(
        "http://x.example/p",
        headers={"Accept": "text/html"},
        include_headers=["accept"],
    )
    assert included != base
    # case-insensitive header names
    included2 = fingerprint(
        "http://x.example/p",
        headers={"ACCEPT": "text/html"},
        include_headers=["Accept"],
    )
    assert included2 == included


def test_upstream_27_json_layout_literal():
    """The 2.7 digest must be SHA1 of the EXACT upstream payload: sorted
    keys, default json separators, and a headers key that is always present
    (empty object when no include_headers) — scrapy/utils/request.py
    ``json.dumps(fingerprint_data, sort_keys=True)``."""
    import hashlib

    payload = (
        '{"body": "", "headers": {}, "method": "GET", '
        '"url": "http://x.example/p"}'
    )
    assert fingerprint("http://x.example/p") == hashlib.sha1(payload.encode()).digest()

    # headers are HEX-encoded in the upstream payload:
    # "accept".encode().hex() == "616363657074",
    # "text/html".encode().hex() == "746578742f68746d6c"
    payload_hdr = (
        '{"body": "783d31", "headers": {"616363657074": ["746578742f68746d6c"]}, '
        '"method": "POST", "url": "http://x.example/p"}'
    )
    got = fingerprint(
        "http://x.example/p",
        method="POST",
        body=b"x=1",
        headers={"Accept": "text/html"},
        include_headers=["Accept"],
    )
    assert got == hashlib.sha1(payload_hdr.encode()).digest()


def test_legacy_differs_from_modern():
    url = "http://x.example/p"
    assert fingerprint(url) != fingerprint_legacy(url)


def test_golden_vectors_pinned():
    """Digests must never drift: any change to canonicalization or the
    serialization layout breaks resume compatibility of url_seen tables."""
    assert VEC.exists(), "run tests/gen_vectors.py to (re)generate"
    for line in VEC.read_text().splitlines():
        rec = json.loads(line)
        got = fingerprint_hex(
            rec["url"],
            method=rec["method"],
            body=bytes.fromhex(rec["body_hex"]) or None,
            headers=rec["headers"] or None,
            include_headers=rec["include_headers"] or None,
            keep_fragments=rec["keep_fragments"],
        )
        assert got == rec["expected_fp_hex"], rec["url"]
