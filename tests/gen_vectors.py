"""Generate golden fingerprint vectors (FIXTURES §A.6).

Expected digests are computed by ``_upstream_fingerprint`` below — a
straight-line transcription of public Scrapy ≥2.7
``scrapy/utils/request.py::fingerprint`` (headers key always present,
``json.dumps(..., sort_keys=True)`` with DEFAULT separators) — NOT by
calling the package's own ``fingerprint``, so the vectors cross-check the
serialization layout against the upstream spec instead of pinning whatever
the package happens to do. URL canonicalization itself is verified
separately against public w3lib vectors (tests/test_urlnorm.py).

When the reference mount is re-pinned, vectors from the reference's
tests/test_utils_request.py replace these verbatim (SURVEY §7 task 0).

Run: python tests/gen_vectors.py
"""

import hashlib
import json
import pathlib

from scrapy_spark.functions.urlnorm import canonicalize_url


def _upstream_fingerprint(
    url: str,
    method: str = "GET",
    body: bytes = b"",
    headers: dict | None = None,
    include_headers: list[str] | None = None,
    keep_fragments: bool = False,
) -> str:
    """Verbatim upstream Scrapy ≥2.7 fingerprint layout (utils/request.py):
    lowercase header names sorted, list-valued; headers dict ALWAYS emitted;
    default json separators."""
    hdrs: dict[str, list[str]] = {}
    if include_headers and headers:
        lowered = {k.lower(): v for k, v in headers.items()}
        for name in sorted(h.lower() for h in include_headers):
            if name in lowered:
                v = lowered[name]
                vals = v if isinstance(v, list) else [str(v)]
                # upstream: headers[header_name.hex()] = [value.hex(), ...]
                # with bytes names/values (utils/request.py ≈L90)
                hdrs[name.encode().hex()] = [
                    str(x).encode("utf-8").hex() for x in vals
                ]
    fingerprint_data = {
        "method": method,
        "url": canonicalize_url(url, keep_fragments=keep_fragments),
        "body": (body or b"").hex(),
        "headers": hdrs,
    }
    fingerprint_json = json.dumps(fingerprint_data, sort_keys=True)
    return hashlib.sha1(fingerprint_json.encode()).hexdigest()

CASES = [
    dict(url="http://www.example.com/", method="GET", body=b""),
    dict(url="http://www.example.com/query?id=111&cat=222", method="GET", body=b""),
    dict(url="http://www.example.com/query?cat=222&id=111", method="GET", body=b""),
    dict(url="http://www.example.com/page.html#fragment", method="GET", body=b""),
    dict(
        url="http://www.example.com/page.html#fragment",
        method="GET",
        body=b"",
        keep_fragments=True,
    ),
    dict(url="http://www.example.com/", method="POST", body=b"request body"),
    dict(
        url="http://www.example.com/members/offers.html",
        method="GET",
        body=b"",
        headers={"SESSIONID": "somehash"},
        include_headers=["SESSIONID"],
    ),
    dict(
        url="http://www.example.com/",
        method="GET",
        body=b"",
        headers={"Accept-Language": "en", "SESSIONID": "somehash"},
        include_headers=["Accept-Language", "SESSIONID"],
    ),
    dict(url="http://www.example.com:80/", method="GET", body=b""),
    dict(url="HTTP://WWW.Example.com/", method="GET", body=b""),
    dict(url="http://www.example.com/café", method="GET", body=b""),
    dict(url="http://www.example.com/a%2fb?x=%20y", method="GET", body=b""),
]


def main() -> None:
    out = pathlib.Path(__file__).parent / "vectors" / "fingerprints.jsonl"
    lines = []
    for case in CASES:
        rec = {
            "url": case["url"],
            "method": case.get("method", "GET"),
            "body_hex": case.get("body", b"").hex(),
            "headers": case.get("headers"),
            "include_headers": case.get("include_headers"),
            "keep_fragments": case.get("keep_fragments", False),
        }
        rec["expected_fp_hex"] = _upstream_fingerprint(
            rec["url"],
            method=rec["method"],
            body=bytes.fromhex(rec["body_hex"]),
            headers=rec["headers"],
            include_headers=rec["include_headers"],
            keep_fragments=rec["keep_fragments"],
        )
        lines.append(json.dumps(rec, sort_keys=True))
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {len(lines)} vectors → {out}")


if __name__ == "__main__":
    main()
