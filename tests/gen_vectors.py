"""Generate golden fingerprint vectors (FIXTURES §A.6).

When the reference mount is re-pinned, vectors from the reference's
tests/test_utils_request.py replace these verbatim (SURVEY §7 task 0).
Until then the vectors pin OUR digests so drift is caught.

Run: python tests/gen_vectors.py
"""

import json
import pathlib

from scrapy_spark.functions.fingerprint import fingerprint_hex

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
        rec["expected_fp_hex"] = fingerprint_hex(
            rec["url"],
            method=rec["method"],
            body=bytes.fromhex(rec["body_hex"]) or None,
            headers=rec["headers"],
            include_headers=rec["include_headers"],
            keep_fragments=rec["keep_fragments"],
        )
        lines.append(json.dumps(rec, sort_keys=True))
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {len(lines)} vectors → {out}")


if __name__ == "__main__":
    main()
