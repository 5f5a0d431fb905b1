"""S3 HTTP/2 transport: HPACK (RFC 7541) unit coverage, h2c frame/client/
server e2e over a live loopback socket, the Spark ``http_fetch`` operator
on transport="h2c", and a full-engine crawl over h2 — asserting the S3
payoff: many requests, ONE connection per authority."""

from __future__ import annotations

import threading

import pytest

from scrapy_spark.functions.hpack import (
    Decoder,
    Encoder,
    STATIC_TABLE,
    decode_int,
    encode_int,
)
from scrapy_spark.operators.http2 import H2Connection, H2Pool, H2Server


# ------------------------------------------------------------------ HPACK
def test_hpack_integer_codec_boundaries():
    # RFC 7541 §C.1 semantics: below prefix limit, at limit, multi-byte
    for value, prefix in [(10, 5), (31, 5), (1337, 5), (0, 7), (127, 7), (300, 7)]:
        enc = encode_int(value, prefix)
        got, pos = decode_int(enc, 0, prefix)
        assert (got, pos) == (value, len(enc))


def test_hpack_static_table_exact_hits_are_one_byte():
    enc = Encoder()
    block = enc.encode([(":method", "GET"), (":path", "/")])
    assert block == bytes([0x80 | 2, 0x80 | 4])  # indexed: static 2 and 4
    assert Decoder().decode(block) == [(":method", "GET"), (":path", "/")]


def test_hpack_dynamic_table_reuse_across_blocks():
    enc, dec = Encoder(), Decoder()
    headers = [(":status", "200"), ("x-custom", "abc"), ("server", "h2test")]
    b1 = enc.encode(headers)
    assert dec.decode(b1) == headers
    b2 = enc.encode(headers)  # now fully indexed from the dynamic table
    assert dec.decode(b2) == headers
    assert len(b2) < len(b1)
    assert all(b & 0x80 for b in b2)  # every field an indexed reference


def test_hpack_eviction_keeps_decoding_correct():
    enc, dec = Encoder(max_table_size=64), Decoder(max_table_size=64)
    for i in range(20):  # each entry ≈ 32+len overhead → constant eviction
        hs = [("x-h", f"value-{i}")]
        assert dec.decode(enc.encode(hs)) == hs


def test_hpack_huffman_rfc_vectors():
    """RFC 7541 Appendix C.4/C.6 Huffman strings, both directions."""
    from scrapy_spark.functions.hpack import huffman_decode, huffman_encode

    vectors = [
        ("www.example.com", "f1e3c2e5f23a6ba0ab90f4ff"),
        ("no-cache", "a8eb10649cbf"),
        ("custom-key", "25a849e95ba97d7f"),
        ("custom-value", "25a849e95bb8e8b4bf"),
        ("302", "6402"),
        ("private", "aec3771a4b"),
        ("Mon, 21 Oct 2013 20:13:21 GMT",
         "d07abe941054d444a8200595040b8166e082a62d1bff"),
        ("https://www.example.com", "9d29ad171863c78f0b97c8e9ae82ae43d3"),
        ("gzip", "9bd9ab"),
        ("foo=ASDJKHQKBZXOQWEOPIUAXQWEOIU; max-age=3600; version=1",
         "94e7821dd7f2e6c7b335dfdfcd5b3960d5af27087f3672c1ab270fb5291f9587"
         "316065c003ed4ee5b1063d5007"),
    ]
    for s, hexs in vectors:
        assert huffman_encode(s.encode()).hex() == hexs
        assert huffman_decode(bytes.fromhex(hexs)) == s.encode()
    every = bytes(range(256))
    assert huffman_decode(huffman_encode(every)) == every


def test_hpack_huffman_roundtrip_property():
    """Any byte string round-trips; the encoding is never longer than
    the 30-bit worst case and pads to a whole byte."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from scrapy_spark.functions.hpack import huffman_decode, huffman_encode

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=256))
    def check(raw):
        enc = huffman_encode(raw)
        assert huffman_decode(enc) == raw
        assert len(enc) <= (30 * len(raw) + 7) // 8

    check()


def test_hpack_huffman_malformed_padding_rejected():
    from scrapy_spark.functions.hpack import huffman_decode

    # 0xFF alone: 8 bits of padding (>7) — must be rejected per §5.2
    with pytest.raises(ValueError):
        huffman_decode(b"\xff")
    # 'a' is the 5-bit code 00011 + 3 pad bits; 0x1e pads with 110,
    # which is not the all-ones EOS prefix
    assert huffman_decode(b"\x1f") == b"a"
    with pytest.raises(ValueError):
        huffman_decode(b"\x1e")
    # explicit EOS symbol inside the string (30 bits of 1s + pad)
    with pytest.raises(ValueError):
        huffman_decode(b"\xff\xff\xff\xff")


def test_hpack_decodes_huffman_coded_fields():
    """A full header block with H=1 strings (what real servers emit)
    decodes identically to the plain coding, including dynamic-table
    effects; plain-only encoders interoperate unchanged."""
    enc_h = Encoder(huffman=True)
    enc_p = Encoder(huffman=False)
    headers = [(":status", "200"), ("x-custom", "hello world"),
               ("server", "h2test/1.0")]
    bh, bp = enc_h.encode(headers), enc_p.encode(headers)
    assert bh != bp and len(bh) < len(bp)
    assert Decoder().decode(bh) == headers
    assert Decoder().decode(bp) == headers
    # second block: both sides now fully indexed, identical bytes
    assert enc_h.encode(headers) == enc_p.encode(headers)


def test_hpack_encoder_resize_emits_size_update():
    # RFC 7541 §4.2/§6.3: after the peer lowers SETTINGS_HEADER_TABLE_SIZE
    # the next encoded block must OPEN with a dynamic-table size update so
    # the peer's decoder evicts in lockstep
    enc, dec = Encoder(), Decoder()
    assert dec.decode(enc.encode([("x-a", "1")])) == [("x-a", "1")]
    enc.resize(64)
    block = enc.encode([("x-b", "2")])
    assert block[0] & 0xE0 == 0x20  # §6.3 opcode first
    assert dec.decode(block) == [("x-b", "2")]
    assert enc.table.max_size == 64 and dec.table.max_size == 64
    # one-shot: the following block carries no further update
    block2 = enc.encode([("x-b", "2")])
    assert block2[0] & 0xE0 != 0x20
    assert dec.decode(block2) == [("x-b", "2")]


def test_hpack_literal_without_indexing_and_table_size_update():
    # hand-built block: size-update(0), literal-without-indexing with
    # static name ref 38 (host), plain value
    block = bytes([0x20, 0x0F, 0x17]) + bytes([0x04]) + b"a:80"
    # 0x20|0 size update → resize(0); 0x0F,0x17 = 4-bit prefix int 15+23=38
    out = Decoder().decode(block)
    assert out == [("host", "a:80")]
    assert STATIC_TABLE[37] == ("host", "")


# ----------------------------------------------------------- client/server
def _handler(path, headers):
    if path.startswith("/echo/"):
        return 200, {"content-type": "text/plain", "x-ua": headers.get("user-agent", "")}, path.split("/", 2)[2].encode()
    if path == "/redir":
        return 302, {"location": "/echo/after"}, b""
    if path == "/cookies":
        return 200, {"set-cookie": "a=1; Path=/"}, b"ok"
    return 404, {}, b"nope"


@pytest.fixture()
def h2srv():
    srv = H2Server(_handler)
    yield srv
    srv.close()


def test_h2_multiplexed_requests_one_connection(h2srv):
    conn = H2Connection("127.0.0.1", h2srv.port, timeout_s=10.0)
    results = {}

    def go(i):
        results[i] = conn.request(f"/echo/{i}", f"127.0.0.1:{h2srv.port}")

    threads = [threading.Thread(target=go, args=(i,)) for i in range(24)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(24):
        status, body, headers, sc, err = results[i]
        assert err is None and status == 200
        assert body == str(i).encode()
        assert headers["content-type"] == "text/plain"
    assert h2srv.connections == 1  # the S3 claim: 24 streams, 1 connection
    assert h2srv.requests == 24
    conn.close()


def test_h2_pool_fetch_contract(h2srv):
    pool = H2Pool(timeout_s=10.0)
    base = f"http://127.0.0.1:{h2srv.port}"
    status, body, headers, sc, truncated, err = pool.fetch(
        f"{base}/echo/hello", {"user-agent": "ua-x"}
    )
    assert (status, body, err, truncated) == (200, b"hello", None, False)
    assert headers["x-ua"] == "ua-x"  # request headers actually arrived
    status, body, headers, sc, truncated, err = pool.fetch(f"{base}/redir")
    assert status == 302 and headers["location"] == "/echo/after"
    status, body, headers, sc, truncated, err = pool.fetch(f"{base}/cookies")
    assert sc == ["a=1; Path=/"]
    status, *_rest, err = pool.fetch("http://127.0.0.1:1/dead")
    assert status == 0 and err  # connect error → retryable row
    assert h2srv.connections == 1
    pool.close()


def test_h2_over_tls_alpn_end_to_end(spark, tmp_path):
    """h2-over-TLS (RFC 9113 §3.1): verified handshake + ALPN "h2"
    against an ssl-wrapped loopback H2Server — multiplexing, the https
    :scheme pseudo-header, and verification enforcement all hold.

    One bounded retry: the loopback server is a GIL-bound Python thread,
    and a fully saturated host can starve the handshake into an SSL EOF
    (observed only in full-suite runs concurrent with bench sessions;
    always green alone) — a timing artifact of the test harness, not of
    the transport under test."""
    pytest.importorskip("cryptography")
    import time as _time

    last = None
    for attempt in range(2):
        try:
            _tls_e2e_once(spark, tmp_path / f"try{attempt}")
            return
        except (AssertionError, OSError) as e:  # noqa: PERF203
            last = e
            _time.sleep(3)
    raise last


def _tls_e2e_once(spark, tmp_path):
    from tests.test_tls_proxy_auth import _make_self_signed

    from scrapy_spark.operators.netfetch import http_fetch

    # TLS paths use 30s timeouts: the loopback server is a GIL-bound
    # Python thread, and a fully saturated 32-core host can starve the
    # handshake past 10s (observed once in a full-suite run concurrent
    # with a bench session — SSL EOF at _ssl.c:2580, passes alone).
    tmp_path.mkdir(parents=True, exist_ok=True)
    cert_pem, key_pem = _make_self_signed(tmp_path)
    srv = H2Server(_handler, tls=(cert_pem, key_pem))
    try:
        import ssl as _ssl

        ctx = _ssl.create_default_context(cafile=cert_pem)
        ctx.set_alpn_protocols(["h2"])
        conn = H2Connection(
            "127.0.0.1", srv.port, timeout_s=30.0, ssl_context=ctx
        )
        assert conn.scheme == "https"
        status, body, headers, sc, err = conn.request(
            "/echo/tls", f"127.0.0.1:{srv.port}"
        )
        assert (status, body, err) == (200, b"tls", None)
        conn.close()

        # pool + Spark operator path: https scheme routes through TLS,
        # still ONE connection for many rows
        pool = H2Pool(timeout_s=30.0, ca_file=cert_pem)
        base = f"https://127.0.0.1:{srv.port}"
        status, body, *_r, err = pool.fetch(f"{base}/echo/pool")
        assert (status, body, err) == (200, b"pool", None)
        pool.close()

        reqs = spark.createDataFrame(
            [(str(i).encode(), f"{base}/echo/{i}", "127.0.0.1")
             for i in range(8)],
            "fp binary, url string, slot string",
        ).coalesce(1)
        out = http_fetch(
            reqs, transport="h2c", timeout_s=30.0, ca_file=cert_pem
        ).collect()
        assert all(r.status == 200 and bytes(r.body) == bytes(r.fp)
                   for r in out)

        # verification is enforced: no CA file → handshake refused, and
        # the pool surfaces it as a retryable error row
        pool_bad = H2Pool(timeout_s=10.0, ca_file=None)
        status, *_r, err = pool_bad.fetch(f"{base}/echo/x")
        assert status == 0 and "CERTIFICATE_VERIFY_FAILED" in (err or "")
        pool_bad.close()
    finally:
        srv.close()


def test_http_fetch_operator_over_h2c(spark, h2srv):
    from pyspark.sql import functions as F

    from scrapy_spark.operators.netfetch import http_fetch

    base = f"http://127.0.0.1:{h2srv.port}"
    reqs = spark.createDataFrame(
        [(str(i).encode(), f"{base}/echo/{i}", "127.0.0.1") for i in range(12)],
        "fp binary, url string, slot string",
    ).coalesce(1)  # one partition → one worker → one pooled connection
    out = http_fetch(reqs, transport="h2c", timeout_s=10.0).collect()
    assert len(out) == 12
    for row in out:
        assert row.status == 200 and row.error is None
        assert bytes(row.body) == bytes(row.fp)
    assert h2srv.connections == 1  # multiplexing held through Spark


# ------------------------------------------------- scripted-frame servers
def _scripted_server(respond):
    """Single-connection raw h2 server: accepts one peer, reads the
    preface, sends the given SETTINGS payload, then calls
    ``respond(sock, sid)`` per client HEADERS frame. Returns
    (listen_sock, port, serve_fn)."""
    import socket as _socket

    from scrapy_spark.operators.http2 import (
        FLAG_ACK,
        HEADERS,
        PREFACE,
        SETTINGS,
        pack_frame,
        read_exact,
        read_frame,
    )

    lsock = _socket.socket(_socket.AF_INET, _socket.SOCK_STREAM)
    lsock.setsockopt(_socket.SOL_SOCKET, _socket.SO_REUSEADDR, 1)
    lsock.bind(("127.0.0.1", 0))
    lsock.listen(1)
    port = lsock.getsockname()[1]

    def serve(initial_settings: bytes):
        conn, _ = lsock.accept()
        try:
            read_exact(conn, len(PREFACE))
            conn.sendall(pack_frame(SETTINGS, 0, 0, initial_settings))
            while True:
                ftype, flags, sid, payload = read_frame(conn)
                if ftype == SETTINGS and not flags & FLAG_ACK:
                    conn.sendall(pack_frame(SETTINGS, FLAG_ACK, 0, b""))
                elif ftype == HEADERS:
                    respond(conn, sid)
        except (ConnectionError, OSError):
            pass
        finally:
            conn.close()

    return lsock, port, serve


def test_h2_end_stream_latched_across_continuation():
    """A header-only response whose HEADERS frame carries END_STREAM but
    defers END_HEADERS to a CONTINUATION (which can never carry
    END_STREAM, RFC 9113 §6.10) must complete — not hang to timeout."""
    from scrapy_spark.operators.http2 import (
        CONTINUATION,
        FLAG_END_HEADERS,
        FLAG_END_STREAM,
        HEADERS,
        H2Connection,
        pack_frame,
    )

    enc = Encoder()

    def respond(conn, sid):
        block = enc.encode([(":status", "204"), ("x-a", "1"), ("x-b", "2")])
        half = max(1, len(block) // 2)
        conn.sendall(
            pack_frame(HEADERS, FLAG_END_STREAM, sid, block[:half])
            + pack_frame(CONTINUATION, FLAG_END_HEADERS, sid, block[half:])
        )

    lsock, port, serve = _scripted_server(respond)
    t = threading.Thread(target=serve, args=(b"",), daemon=True)
    t.start()
    try:
        cl = H2Connection("127.0.0.1", port, timeout_s=5.0)
        status, body, headers, sc, err = cl.request("/", f"127.0.0.1:{port}")
        assert (status, body, err) == (204, b"", None)
        assert headers == {"x-a": "1", "x-b": "2"}
        cl.close()
    finally:
        lsock.close()


def test_h2_server_settings_shrink_limiter_and_encoder_table():
    """SETTINGS_MAX_CONCURRENT_STREAMS below our default must shrink the
    stream limiter; SETTINGS_HEADER_TABLE_SIZE must cap our HPACK encoder
    (emitting the §6.3 size update the server's decoder consumes)."""
    from scrapy_spark.operators.http2 import (
        FLAG_END_HEADERS,
        FLAG_END_STREAM,
        HEADERS,
        H2Connection,
        pack_frame,
        settings_payload,
    )

    enc = Encoder()

    def respond(conn, sid):
        block = enc.encode([(":status", "200")])
        conn.sendall(
            pack_frame(HEADERS, FLAG_END_HEADERS | FLAG_END_STREAM, sid, block)
        )

    import struct

    lsock, port, serve = _scripted_server(respond)
    # SETTINGS_HEADER_TABLE_SIZE (0x1) = 128 alongside the stream cap
    init = settings_payload(max_concurrent_streams=2) + struct.pack(
        "!HI", 0x1, 128
    )
    t = threading.Thread(target=serve, args=(init,), daemon=True)
    t.start()
    try:
        cl = H2Connection("127.0.0.1", port, timeout_s=5.0)
        s1, *_r1, e1 = cl.request("/a", f"127.0.0.1:{port}")
        assert (s1, e1) == (200, None)
        # server SETTINGS arrived before its response: limiter + encoder
        assert cl.max_concurrent == 2 and cl._sem.limit == 2
        # next header block opens with the size update and the table caps
        s2, *_r2, e2 = cl.request("/b", f"127.0.0.1:{port}")
        assert (s2, e2) == (200, None)
        assert cl.encoder.table.max_size == 128
        cl.close()
    finally:
        lsock.close()


def test_dyn_limiter_shrinks_below_inflight():
    from scrapy_spark.operators.http2 import _DynLimiter

    lim = _DynLimiter(4)
    lim.__enter__()
    lim.__enter__()
    lim.set_limit(1)  # below current in-flight: existing finish, new wait
    blocked = threading.Event()
    entered = threading.Event()

    def go():
        blocked.set()
        with lim:
            entered.set()

    t = threading.Thread(target=go, daemon=True)
    t.start()
    blocked.wait(2.0)
    assert not entered.wait(0.2)  # gated while 2 ≥ limit 1
    lim.__exit__(None, None, None)
    assert not entered.wait(0.2)  # still 1 ≥ limit 1
    lim.__exit__(None, None, None)
    assert entered.wait(2.0)  # 0 < 1 → admitted
    t.join(2.0)


def test_h2_pool_dead_host_does_not_serialize_other_authorities(h2srv, monkeypatch):
    """A blocking connect to one dead authority must not stall fetches to
    other authorities (the pool-global lock only guards dict state)."""
    import time

    from scrapy_spark.operators import http2 as h2mod

    real_conn = h2mod.H2Connection
    slow_started = threading.Event()

    class SlowConn:
        def __new__(cls, host, port, timeout_s=30.0, ssl_context=None,
                    server_hostname=None):
            if port == 9:  # the dead authority
                slow_started.set()
                time.sleep(1.5)
                raise ConnectionError("dead host")
            return real_conn(host, port, timeout_s, ssl_context,
                             server_hostname)

    monkeypatch.setattr(h2mod, "H2Connection", SlowConn)
    pool = h2mod.H2Pool(timeout_s=5.0)
    results = {}

    def slow():
        results["slow"] = pool.fetch("http://127.0.0.1:9/x")

    t = threading.Thread(target=slow, daemon=True)
    t.start()
    slow_started.wait(2.0)
    t0 = time.monotonic()
    status, body, *_rest, err = pool.fetch(
        f"http://127.0.0.1:{h2srv.port}/echo/fast"
    )
    live_elapsed = time.monotonic() - t0
    assert (status, body, err) == (200, b"fast", None)
    assert live_elapsed < 1.0  # not serialized behind the 1.5 s dead connect
    t.join(5.0)
    assert results["slow"][0] == 0 and results["slow"][-1]
    pool.close()


@pytest.mark.parametrize("tls", [False, True], ids=["h2c", "h2-tls"])
def test_engine_crawl_over_h2c(spark, tmp_path, tls):
    """Full CrawlEngine run with transport="h2c": pages crawled from
    live h2 responses, links followed, dedupe/politeness as usual —
    every response arrived over multiplexed h2 streams. The TLS variant
    serves the same site over a verified ALPN-h2 handshake (https seeds,
    cfg.tls_ca_file) — the open-web S3 shape end to end."""
    import pandas as pd

    from scrapy_spark.config import CrawlConfig
    from scrapy_spark.sources.store import MemoryStore
    from scrapy_spark.streaming.engine import CrawlEngine

    N = 6

    def site(path, headers):
        if path.startswith("/p/"):
            i = int(path.rsplit("/", 1)[1])
            kids = [c for c in (2 * i + 1, 2 * i + 2) if c < N]
            links = "".join(f'<a href="/p/{c}">x</a>' for c in kids)
            body = f"<html><body>{links}</body></html>".encode()
            return 200, {"content-type": "text/html; charset=utf-8"}, body
        return 404, {}, b""

    ca_file = None
    scheme = "http"
    if tls:
        pytest.importorskip("cryptography")
        from tests.test_tls_proxy_auth import _make_self_signed

        cert_pem, key_pem = _make_self_signed(tmp_path)
        srv = H2Server(site, tls=(cert_pem, key_pem))
        ca_file, scheme = cert_pem, "https"
    else:
        srv = H2Server(site)
    try:
        cfg = CrawlConfig(
            fetch_backend="http",
            transport="h2c",
            robotstxt_obey=False,
            epoch_budget=16,
            max_epochs=10,
            depth_limit=5,
            queue_order="fifo",
            download_timeout_s=10.0,
            tls_ca_file=ca_file,
        )
        store = MemoryStore(spark)
        eng = CrawlEngine(
            spark, cfg, store,
            url_map=spark.createDataFrame([], "url_canon string, image_id string"),
            graph=spark.createDataFrame([], "src_canon string, dst_url string"),
            robots=spark.createDataFrame([], "domain string, rules string"),
        )
        eng.bootstrap(
            pd.DataFrame({"url": [f"{scheme}://127.0.0.1:{srv.port}/p/0"],
                          "priority": [0]}),
            pd.DataFrame({"slot": ["127.0.0.1"], "delay_ms": [0],
                          "concurrency": [8]}),
        )
        eng.run()
        log = store.read("fetch_log").toPandas()
        assert len(log) == N and (log.status == 200).all()
        assert srv.requests == N
        # ≤ one connection per fetch epoch (worker processes differ across
        # epochs in local mode); per-epoch multiplexing is asserted by
        # test_h2_multiplexed_requests_one_connection
        assert srv.connections <= 3
    finally:
        srv.close()
