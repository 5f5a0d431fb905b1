"""Per-scheme handlers (SURVEY §2.1 S4; ref: DownloadHandlers registry
≈L20, datauri.py ≈L15, ftp.py ≈L40 — the FTP download side, tested
against a live loopback FTP server speaking USER/PASS/TYPE/PASV/RETR)."""

from __future__ import annotations

import socket
import threading

import pytest

from scrapy_spark.operators.handlers import (
    decode_data_uri,
    fetch_data_uris,
    ftp_fetch_one,
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


# ----------------------------------------------------------------- ftp e2e
class _MiniFTP:
    """Loopback FTP server: enough of RFC 959 for ftplib's RETR flow
    (USER/PASS/TYPE/PASV/RETR/QUIT), serving an in-memory file dict.
    Wrong credentials → 530; missing path → 550 (the upstream
    CODE_MAPPING case that must surface as a 404 response row)."""

    def __init__(self, files: dict[str, bytes], user="u", pw="p"):
        self.files, self.user, self.pw = files, user, pw
        self.srv = socket.create_server(("127.0.0.1", 0))
        self.port = self.srv.getsockname()[1]
        self.seen_users: list[str] = []
        threading.Thread(target=self._accept, daemon=True).start()

    def _accept(self):
        while True:
            try:
                conn, _ = self.srv.accept()
            except OSError:
                return
            threading.Thread(
                target=self._session, args=(conn,), daemon=True
            ).start()

    def _session(self, conn):
        f = conn.makefile("rwb")

        def send(line):
            f.write(line.encode() + b"\r\n")
            f.flush()

        send("220 mini-ftp ready")
        authed = False
        data_srv = None
        while True:
            line = f.readline()
            if not line:
                break
            cmd, _, arg = line.decode().rstrip("\r\n").partition(" ")
            cmd = cmd.upper()
            if cmd == "USER":
                self.seen_users.append(arg)
                send("331 need password")
            elif cmd == "PASS":
                if self.seen_users[-1:] == [self.user] and arg == self.pw:
                    authed = True
                    send("230 logged in")
                else:
                    send("530 login incorrect")
            elif cmd == "TYPE":
                send("200 type set")
            elif cmd == "PASV":
                data_srv = socket.create_server(("127.0.0.1", 0))
                p = data_srv.getsockname()[1]
                send(f"227 entering passive (127,0,0,1,{p >> 8},{p & 0xFF})")
            elif cmd == "RETR":
                if not authed:
                    send("530 not logged in")
                elif arg not in self.files:
                    send("550 no such file")
                elif data_srv is None:
                    send("425 use PASV first")
                else:
                    send("150 opening data connection")
                    d, _ = data_srv.accept()
                    d.sendall(self.files[arg])
                    d.close()
                    data_srv.close()
                    data_srv = None
                    send("226 transfer complete")
            elif cmd == "QUIT":
                send("221 bye")
                break
            else:
                send("502 not implemented")
        conn.close()

    def close(self):
        self.srv.close()


@pytest.fixture(scope="module")
def ftp_site():
    srv = _MiniFTP({"/pub/a.bin": b"\x00\x01ftp-payload", "/pub/big.bin": b"B" * 100})
    yield f"ftp://u:p@127.0.0.1:{srv.port}"
    srv.close()


def test_ftp_fetch_one_retrieves_bytes(ftp_site):
    status, body, truncated, error = ftp_fetch_one(
        f"{ftp_site}/pub/a.bin", timeout_s=10.0, maxsize=1 << 20
    )
    assert (status, body, truncated, error) == (
        200, b"\x00\x01ftp-payload", False, None,
    )


def test_ftp_fetch_one_maps_550_to_404_and_auth_to_403(ftp_site):
    status, body, truncated, error = ftp_fetch_one(
        f"{ftp_site}/pub/missing.bin", timeout_s=10.0, maxsize=1 << 20
    )
    assert status == 404 and error is None
    bad = ftp_site.replace("u:p@", "u:wrong@")
    status, _, _, error = ftp_fetch_one(
        f"{bad}/pub/a.bin", timeout_s=10.0, maxsize=1 << 20
    )
    assert status == 403 and error is None  # 530 login → permanent error


def test_ftp_fetch_one_maxsize_truncates(ftp_site):
    status, body, truncated, _ = ftp_fetch_one(
        f"{ftp_site}/pub/big.bin", timeout_s=10.0, maxsize=10
    )
    assert status == 200 and body == b"B" * 10 and truncated


def test_ftp_rows_flow_through_http_fetch_operator(spark, ftp_site):
    """S4 e2e: ftp URLs ride the SAME http_fetch mapInPandas stage (and
    therefore the engine's fetch_log) as http rows — scheme dispatch
    happens inside _fetch_one."""
    from scrapy_spark.operators.netfetch import http_fetch

    df = spark.createDataFrame(
        [
            (b"f1", f"{ftp_site}/pub/a.bin", "127.0.0.1"),
            (b"f2", f"{ftp_site}/pub/missing.bin", "127.0.0.1"),
        ],
        "fp binary, url string, slot string",
    )
    out = {bytes(r.fp): r for r in http_fetch(df, timeout_s=10.0).collect()}
    assert out[b"f1"].status == 200
    assert bytes(out[b"f1"].body) == b"\x00\x01ftp-payload"
    assert out[b"f2"].status == 404 and out[b"f2"].error is None


def test_ftp_dispatch_precedes_h2c_transport(spark, ftp_site):
    """Scheme dispatch must run BEFORE the transport split: under
    transport='h2c' an ftp URL still reaches the FTP handler instead of
    being dialed as a bogus cleartext h2 peer (which surfaced as a
    status-0 transport error the engine would retry forever)."""
    from scrapy_spark.operators.netfetch import http_fetch

    df = spark.createDataFrame(
        [(b"f1", f"{ftp_site}/pub/a.bin", "127.0.0.1")],
        "fp binary, url string, slot string",
    )
    out = http_fetch(df, timeout_s=10.0, transport="h2c").collect()
    assert out[0].status == 200
    assert bytes(out[0].body) == b"\x00\x01ftp-payload"


def test_proxy_under_h2c_surfaces_error_row_not_direct(spark):
    """Proxy routing is h1-only (no CONNECT tunneling in the h2 client):
    a proxied request under transport='h2c' must come back as an error
    row, never silently bypass the proxy."""
    from scrapy_spark.operators.netfetch import http_fetch

    df = spark.createDataFrame(
        [(b"p1", "http://127.0.0.1:1/x", "127.0.0.1")],
        "fp binary, url string, slot string",
    )
    out = http_fetch(
        df, timeout_s=5.0, transport="h2c", proxy="http://127.0.0.1:2"
    ).collect()
    assert out[0].status == 0
    assert "ProxyUnsupported" in out[0].error
