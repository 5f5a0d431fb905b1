"""Per-scheme handlers (SURVEY §2.1 S4; ref: DownloadHandlers registry
≈L20, datauri.py ≈L15)."""

from scrapy_spark.operators.handlers import (
    decode_data_uri,
    fetch_data_uris,
    with_scheme,
)


def test_decode_data_uri_variants():
    assert decode_data_uri("data:,hello%20world") == (b"hello world", "text/plain")
    assert decode_data_uri("data:text/html,<b>x</b>") == (b"<b>x</b>", "text/html")
    b64 = decode_data_uri("data:image/png;base64,aGVsbG8")  # unpadded b64
    assert b64 == (b"hello", "image/png")
    assert decode_data_uri("data:nope") == (None, "")  # no comma
    assert decode_data_uri("data:;base64,!!!") == (None, "")  # bad b64
    assert decode_data_uri("http://x/") == (None, "")


def test_scheme_dispatch_and_data_fetch(spark):
    df = spark.createDataFrame(
        [
            ("http://a.example/p",),
            ("HTTPS://b.example/q",),
            ("data:text/plain;base64,aGk=",),
            ("no-scheme-here",),
        ],
        "url string",
    )
    schemed = with_scheme(df)
    got = {r["url"]: r["scheme"] for r in schemed.collect()}
    assert got["http://a.example/p"] == "http"
    assert got["HTTPS://b.example/q"] == "https"  # lowercased
    assert got["data:text/plain;base64,aGk="] == "data"
    assert got["no-scheme-here"] == ""

    data_rows = schemed.filter("scheme = 'data'")
    fetched = fetch_data_uris(data_rows, epoch_ts=5000).collect()
    (r,) = fetched
    assert bytes(r["bytes"]) == b"hi"
    assert r["status"] == 200
    assert r["latency_ms"] == 0 and r["fetched_at"] == 5000
